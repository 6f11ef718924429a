"""Parity vs the reference's OWN executable torch modules (VERDICT r2 #1).

Unlike test_reference_parity.py (an independent torch re-implementation,
kept as a second opinion), this suite imports `/root/reference/src`'s
`embedding`, `model`, `render_rays` and `loss` modules directly and asserts
our JAX stack against THEIR outputs:

  * state-dict schema: our exporter's CodeNeRF/OccupancyMap/PE dicts load
    into the real reference modules with `strict=True` (this is what caught
    the `shape_latent_layer_{j+1}` 1-indexed-singular naming, which our
    exporter had been writing as a plural 0-indexed name),
  * forward parity: UniDirsEmbed -> CodeNeRF and OccupancyMap to ~1e-5,
  * loss parity: `loss.step_batch_loss` + `loss.step_batch_loss_reg`
    (executed against duck-typed category stubs) vs ops/losses,
  * gradient parity for every parameter, mapped back through
    `codenerf_params_from_state_dict` (so the importer is grad-tested too),
  * optimizer parity: torch.optim.AdamW with the reference's param groups
    (ref: train.py:40,54-64) vs our optax multi_transform chain, 12 steps,
  * sampler parity: the reference's `stratified_bins` /
    `normal_bins_sampling` / `sample_3d_points` (self-contained torch,
    ref: src/scene_cateogries.py:51-96,453-546 — extracted by AST source
    because the module's top-level imports need skimage/imgviz) vs
    ops/sampling, both structurally and distributionally.

The reference dir is read-only public content; only these pure-torch pieces
are executed, nothing is imported at module scope.
"""

from __future__ import annotations

import ast
import os
import sys
import textwrap
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from catnerf_tpu.models import codenerf, embedding, occupancy  # noqa: E402
from catnerf_tpu.ops import losses, sampling  # noqa: E402
from catnerf_tpu.train.checkpoint import (  # noqa: E402
    _codenerf_state_dict,
    _occupancy_state_dict,
    codenerf_params_from_state_dict,
)
from catnerf_tpu.train.state import make_optimizer  # noqa: E402

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference checkout not available")

EMB1, EMB2 = 87, 42
LATENT = 256   # production latent size (configs/*/config_*.json net_hyperparams)
W = 32
SCALE = 2.0
N_CLS = 3
N_OBJ = 2
N_RAYS = 48
N_BINS = 12
REG_SCALING = 5e-4  # ref: train.py:166


@pytest.fixture(scope="module")
def ref():
    """Import the reference's pure-torch modules from /root/reference/src."""
    saved = {k: sys.modules.get(k)
             for k in ("embedding", "model", "render_rays", "loss", "cfg")}
    sys.path.insert(0, REF_SRC)
    try:
        import embedding as ref_embedding  # noqa: F401
        import model as ref_model
        import render_rays as ref_render_rays
        import loss as ref_loss
    finally:
        sys.path.remove(REF_SRC)
        # Don't leave generic module names pointing at the reference for
        # unrelated later imports in this pytest process.
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return SimpleNamespace(embedding=ref_embedding, model=ref_model,
                           render_rays=ref_render_rays, loss=ref_loss)


# ---------------------------------------------------------------------------
# Shared fixture: one set of weights + one batch, crossed via the exporter
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup(ref):
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, N_CLS + 2)
    fc_params = [codenerf.init_params(ks[i], latent_dim=LATENT, W=W)
                 for i in range(N_CLS)]
    pe_params = [embedding.init_params() for _ in range(N_CLS)]
    pe_params = [
        {"B": p["B"] + 0.01 * jax.random.normal(k, p["B"].shape)}
        for p, k in zip(pe_params, jax.random.split(ks[N_CLS], N_CLS))
    ]

    rng = np.random.default_rng(5)
    shape_codes = rng.normal(0, 0.2, (N_CLS, N_OBJ, LATENT)).astype(np.float32)
    tex_codes = rng.normal(0, 0.2, (N_CLS, N_OBJ, LATENT)).astype(np.float32)

    batch = {
        "pts": rng.uniform(-1.2, 1.2,
                           (N_CLS, N_RAYS, N_BINS, 3)).astype(np.float32),
        "z_vals": np.sort(rng.uniform(
            0.1, 3.0, (N_CLS, N_RAYS, N_BINS)).astype(np.float32), -1),
        "gt_depth": rng.uniform(0.5, 2.5, (N_CLS, N_RAYS)).astype(np.float32),
        "gt_color": rng.uniform(0, 1, (N_CLS, N_RAYS, 3)).astype(np.float32),
        "sem": np.concatenate(
            [np.full((N_CLS, 12), 0), np.full((N_CLS, 24), 1),
             np.full((N_CLS, 12), 2)], axis=1).astype(np.int32),
        "mask_depth": (rng.uniform(size=(N_CLS, N_RAYS)) > 0.2),
        "obj_idx": rng.integers(0, N_OBJ, (N_CLS, N_RAYS)).astype(np.int32),
    }

    # Build the REAL reference modules and load our exported weights
    # strictly — any key-name or shape mismatch fails here.
    ref_models, ref_pes = [], []
    for c in range(N_CLS):
        m = ref.model.CodeNeRF(EMB1, EMB2, W=W, latent_dim=LATENT)
        sd = _codenerf_state_dict(torch, fc_params[c])
        m.load_state_dict(sd, strict=True)
        ref_models.append(m)
        pe = ref.embedding.UniDirsEmbed(max_deg=5, scale=SCALE)
        pe.load_state_dict(
            {"B_layer.weight": torch.tensor(np.asarray(pe_params[c]["B"])),
             "scale": torch.tensor(SCALE)}, strict=True)
        ref_pes.append(pe)

    return SimpleNamespace(
        fc=fc_params, pe=pe_params, shape_codes=shape_codes,
        tex_codes=tex_codes, batch=batch, ref_models=ref_models,
        ref_pes=ref_pes)


def _ref_forward(s, requires_grad=False):
    """Reference-executed PE -> CodeNeRF over the batch, per category."""
    sct = torch.tensor(s.shape_codes).requires_grad_(requires_grad)
    tct = torch.tensor(s.tex_codes).requires_grad_(requires_grad)
    alphas, colors = [], []
    for c in range(N_CLS):
        pts = torch.tensor(s.batch["pts"][c])
        emb = s.ref_pes[c](pts)
        idx = torch.tensor(s.batch["obj_idx"][c], dtype=torch.long)
        sc = sct[c].index_select(0, idx)[:, None, :]
        tc = tct[c].index_select(0, idx)[:, None, :]
        sigma, rgb = s.ref_models[c](emb, sc, tc)
        alphas.append(sigma)
        colors.append(rgb)
    return torch.stack(alphas), torch.stack(colors), sct, tct


def _jax_forward(s):
    emb = jax.vmap(lambda p, x: embedding.apply(p, x, scale=SCALE))(
        jax.tree.map(lambda *xs: jnp.stack(xs), *s.pe),
        jnp.asarray(s.batch["pts"]))
    fc = jax.tree.map(lambda *xs: jnp.stack(xs), *s.fc)
    sc = jax.vmap(lambda c, i: jnp.take(c, i, axis=0))(
        jnp.asarray(s.shape_codes), jnp.asarray(s.batch["obj_idx"]))
    tc = jax.vmap(lambda c, i: jnp.take(c, i, axis=0))(
        jnp.asarray(s.tex_codes), jnp.asarray(s.batch["obj_idx"]))
    alpha, color = jax.vmap(codenerf.apply)(
        fc, emb, sc[:, :, None, :], tc[:, :, None, :])
    return alpha, color, emb


def test_pe_forward_matches_reference_module(setup):
    s = setup
    for c in range(N_CLS):
        pts = s.batch["pts"][c]
        t_emb = s.ref_pes[c](torch.tensor(pts)).detach().numpy()
        j_emb = np.asarray(embedding.apply(s.pe[c], jnp.asarray(pts),
                                           scale=SCALE))
        # atol 1e-5: our polynomial sinpi vs torch's transcendental sin
        # differ at f32 ulp scale near sin(x) ~ 0.
        np.testing.assert_allclose(j_emb, t_emb, rtol=1e-4, atol=1e-5)


def test_codenerf_forward_matches_reference_module(setup):
    t_alpha, t_color, _, _ = _ref_forward(setup)
    alpha, color, _ = _jax_forward(setup)
    np.testing.assert_allclose(np.asarray(alpha), t_alpha.detach().numpy(),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(color), t_color.detach().numpy(),
                               rtol=1e-4, atol=2e-5)


def test_occupancy_forward_matches_reference_module(ref):
    key = jax.random.PRNGKey(3)
    params = occupancy.init_params(key, hidden_size=128)
    m = ref.model.OccupancyMap(EMB1, EMB2, hidden_size=128)
    m.load_state_dict(_occupancy_state_dict(torch, params), strict=True)

    rng = np.random.default_rng(0)
    emb = rng.normal(0, 1, (40, 7, EMB1 + EMB2)).astype(np.float32)
    t_alpha, t_color = m(torch.tensor(emb))
    j_alpha, j_color = occupancy.apply(params, jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(j_alpha), t_alpha.detach().numpy(),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_color), t_color.detach().numpy(),
                               rtol=1e-4, atol=2e-5)


def _make_cls_dict(ref, sct, tct):
    """Duck-typed cls_dict driving the reference's step_batch_loss_reg
    (ref: src/loss.py:5-15) with our code tables as live nn.Embeddings."""
    cls_dict = {}
    for c in range(N_CLS):
        trainer = SimpleNamespace(
            n_obj=N_OBJ,
            shape_codes=lambda ids, c=c: sct[c].index_select(0, ids),
            texture_codes=lambda ids, c=c: tct[c].index_select(0, ids),
        )
        cls_dict[c + 1] = SimpleNamespace(
            trainer=trainer, obj_ids=list(range(N_OBJ)),
            training_device="cpu")
    return cls_dict


def _ref_total_loss(ref, s, requires_grad=False):
    t_alpha, t_color, sct, tct = _ref_forward(s, requires_grad)
    b = s.batch
    total, loss_dict, loss_col = ref.loss.step_batch_loss(
        t_alpha, t_color, torch.tensor(b["gt_depth"]),
        torch.tensor(b["gt_color"]), torch.tensor(b["sem"]),
        torch.tensor(b["mask_depth"]), torch.tensor(b["z_vals"]))
    cls_dict = _make_cls_dict(ref, sct, tct)
    cls_ids = torch.arange(N_CLS)
    reg_s, reg_t = ref.loss.step_batch_loss_reg(cls_dict, cls_ids)
    total = total + REG_SCALING * (reg_s + reg_t).sum()
    return total, loss_dict, loss_col, sct, tct


def _jax_total_loss(s):
    alpha, color, _ = _jax_forward(s)
    b = s.batch
    breakdown = losses.step_batch_loss(
        alpha[..., 0], color, jnp.asarray(b["gt_depth"]),
        jnp.asarray(b["gt_color"]), jnp.asarray(b["sem"]),
        jnp.asarray(b["mask_depth"]), jnp.asarray(b["z_vals"]))
    obj_mask = jnp.ones((N_CLS, N_OBJ), dtype=bool)
    reg_s, reg_t = losses.code_reg_loss(
        jnp.asarray(s.shape_codes), jnp.asarray(s.tex_codes), obj_mask)
    return breakdown.total + REG_SCALING * (reg_s + reg_t).sum(), breakdown


def test_step_loss_matches_reference_module(ref, setup):
    t_total, t_dict, t_col, _, _ = _ref_total_loss(ref, setup)
    total, breakdown = _jax_total_loss(setup)
    np.testing.assert_allclose(float(total), float(t_total.detach()),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(breakdown.depth),
                               t_dict["depth"].detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(breakdown.color),
                               t_dict["color"].detach().numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(breakdown.opacity),
                               t_dict["opacity"].detach().numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(breakdown.psnr_color),
                               t_col.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_gradients_match_reference_module(ref, setup):
    s = setup
    for m in s.ref_models:
        m.zero_grad(set_to_none=True)
        for p in m.parameters():
            p.requires_grad_(True)
    for pe in s.ref_pes:
        pe.zero_grad(set_to_none=True)
        pe.B_layer.weight.requires_grad_(True)

    t_total, _, _, sct, tct = _ref_total_loss(ref, s, requires_grad=True)
    t_total.backward()

    params = {
        "fc": jax.tree.map(lambda *xs: jnp.stack(xs), *s.fc),
        "pe": jax.tree.map(lambda *xs: jnp.stack(xs), *s.pe),
        "shape_codes": jnp.asarray(s.shape_codes),
        "texture_codes": jnp.asarray(s.tex_codes),
    }

    def loss_of(p):
        s2 = SimpleNamespace(
            fc=[jax.tree.map(lambda x: x[c], p["fc"]) for c in range(N_CLS)],
            pe=[{"B": p["pe"]["B"][c]} for c in range(N_CLS)],
            shape_codes=p["shape_codes"], tex_codes=p["texture_codes"],
            batch=s.batch)
        return _jax_total_loss(s2)[0]

    grads = jax.grad(loss_of)(params)

    np.testing.assert_allclose(np.asarray(grads["shape_codes"]),
                               sct.grad.numpy(), rtol=1e-3, atol=1e-4,
                               err_msg="shape_codes")
    np.testing.assert_allclose(np.asarray(grads["texture_codes"]),
                               tct.grad.numpy(), rtol=1e-3, atol=1e-4,
                               err_msg="texture_codes")
    for c in range(N_CLS):
        np.testing.assert_allclose(
            np.asarray(grads["pe"]["B"][c]),
            s.ref_pes[c].B_layer.weight.grad.numpy(),
            rtol=1e-3, atol=1e-4, err_msg=f"pe.B[{c}]")
        # Map the reference module's per-parameter grads back through the
        # IMPORTER, then tree-compare — checks every FC layer and the
        # importer's name mapping in one shot.
        grad_sd = {name: p.grad for name, p in
                   s.ref_models[c].named_parameters()}
        t_grads = codenerf_params_from_state_dict(grad_sd)
        j_grads = jax.tree.map(lambda x: np.asarray(x[c]), grads["fc"])
        flat_t, _ = jax.tree_util.tree_flatten_with_path(t_grads)
        flat_j, _ = jax.tree_util.tree_flatten_with_path(j_grads)
        assert len(flat_t) == len(flat_j) and len(flat_t) > 0
        for (path_t, gt), (path_j, gj) in zip(flat_t, flat_j):
            assert path_t == path_j
            np.testing.assert_allclose(
                gj, gt, rtol=1e-3, atol=1e-4,
                err_msg=f"fc[{c}] {jax.tree_util.keystr(path_t)}")


# ---------------------------------------------------------------------------
# Optimizer-step parity: torch.optim.AdamW (reference param groups) vs our
# optax multi_transform chain (VERDICT r2 item #1b).
# ---------------------------------------------------------------------------


def test_adamw_updates_match_torch_reference_groups():
    # Reference hyperparams: configs/*/config_*.json optimizer.args
    # (lr=1e-3, weight_decay=0.013, code_lr=1e-3, code_weight_decay=0.013);
    # wired per train.py:40,54-64. Use distinct code values so a group mixup
    # cannot cancel out.
    cfg = SimpleNamespace(learning_rate=1e-3, weight_decay=0.013,
                          code_learning_rate=3e-3, code_weight_decay=0.05)

    rng = np.random.default_rng(2)
    leaves = {
        "w": rng.normal(0, 0.3, (16, 8)).astype(np.float32),
        "b": rng.normal(0, 0.3, (8,)).astype(np.float32),
        "codes": rng.normal(0, 0.2, (2, 4, 16)).astype(np.float32),
    }
    params = {"cat_fc": {"w": jnp.asarray(leaves["w"]),
                         "b": jnp.asarray(leaves["b"])},
              "codes": {"all": jnp.asarray(leaves["codes"])}}

    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    t_params = {k: torch.tensor(v, requires_grad=True)
                for k, v in leaves.items()}
    # Mirror the reference's construction: dummy init + add_param_group
    # (ref: train.py:40,54-64).
    opt = torch.optim.AdamW([torch.zeros(1, requires_grad=True)],
                            lr=cfg.learning_rate,
                            weight_decay=cfg.weight_decay)
    opt.add_param_group({"params": [t_params["w"], t_params["b"]],
                         "lr": cfg.learning_rate,
                         "weight_decay": cfg.weight_decay})
    opt.add_param_group({"params": [t_params["codes"]],
                         "lr": cfg.code_learning_rate,
                         "weight_decay": cfg.code_weight_decay})

    def grad_at(step, arr):
        # Deterministic, step- and position-dependent pseudo-gradients.
        idx = np.arange(arr.size, dtype=np.float32).reshape(arr.shape)
        return (0.1 * np.cos(0.7 * step + 0.13 * idx)).astype(np.float32)

    for step in range(12):
        g = {k: grad_at(step, v) for k, v in leaves.items()}
        grads = {"cat_fc": {"w": jnp.asarray(g["w"]),
                            "b": jnp.asarray(g["b"])},
                 "codes": {"all": jnp.asarray(g["codes"])}}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        opt.zero_grad(set_to_none=True)
        for k in t_params:
            t_params[k].grad = torch.tensor(g[k])
        opt.step()

    np.testing.assert_allclose(np.asarray(params["cat_fc"]["w"]),
                               t_params["w"].detach().numpy(),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["cat_fc"]["b"]),
                               t_params["b"].detach().numpy(),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["codes"]["all"]),
                               t_params["codes"].detach().numpy(),
                               rtol=1e-6, atol=5e-7)


# ---------------------------------------------------------------------------
# Sampler parity vs the reference's own sampler source (VERDICT r2 item #1c).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_samplers():
    """Extract stratified_bins / normal_bins_sampling / sample_3d_points
    from scene_cateogries.py by AST (whole-module import needs skimage)."""
    path = os.path.join(REF_SRC, "scene_cateogries.py")
    src = open(path).read()
    tree = ast.parse(src)
    pieces = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in (
                "stratified_bins", "normal_bins_sampling"):
            pieces[node.name] = ast.get_source_segment(src, node)
        if isinstance(node, ast.ClassDef) and node.name == "sceneCategory":
            for sub in node.body:
                if isinstance(sub, ast.FunctionDef) and \
                        sub.name == "sample_3d_points":
                    pieces["sample_3d_points"] = textwrap.dedent(
                        ast.get_source_segment(src, sub))
    assert set(pieces) == {"stratified_bins", "normal_bins_sampling",
                           "sample_3d_points"}
    ns = {"torch": torch, "np": np}
    for name in ("stratified_bins", "normal_bins_sampling",
                 "sample_3d_points"):
        exec(pieces[name], ns)  # noqa: S102 — vetted reference source
    return ns


def test_stratified_bins_distribution_matches_reference(ref_samplers):
    n_rays, n_bins = 20000, 10
    lo, hi = 0.2, 2.6
    torch.manual_seed(0)
    t_z = ref_samplers["stratified_bins"](
        lo, hi, n_bins, n_rays, device="cpu").numpy()
    j_z = np.asarray(sampling.stratified_bins(
        jax.random.PRNGKey(0), jnp.full((n_rays,), lo),
        jnp.full((n_rays,), hi), n_bins))

    bin_len = (hi - lo) / n_bins
    lowers = lo + bin_len * np.arange(n_bins)
    for z in (t_z, j_z):
        assert z.shape == (n_rays, n_bins)
        assert (z >= lowers[None, :] - 1e-6).all()
        assert (z <= lowers[None, :] + bin_len + 1e-6).all()
    # Per-bin mean/std agree between the two samplers (SE of mean
    # ~ bin_len/sqrt(12)/sqrt(n) ~ 5e-4; tolerance 4x that).
    np.testing.assert_allclose(t_z.mean(0), j_z.mean(0), atol=4e-3)
    np.testing.assert_allclose(t_z.std(0), j_z.std(0), atol=4e-3)


def test_normal_bins_distribution_matches_reference(ref_samplers):
    n_rays, n_bins = 20000, 10
    depth_val, eps = 1.5, 0.1
    torch.manual_seed(1)
    t_z = ref_samplers["normal_bins_sampling"](
        torch.full((n_rays,), depth_val), n_bins, n_rays, eps,
        device="cpu").numpy()
    j_z = np.asarray(sampling.normal_bins_sampling(
        jax.random.PRNGKey(1), jnp.full((n_rays,), depth_val), n_bins, eps))

    for z in (t_z, j_z):
        assert z.shape == (n_rays, n_bins)
        assert (np.diff(z, axis=-1) >= -1e-6).all()   # sorted
        assert (z >= depth_val - eps - 1e-6).all()
        assert (z <= depth_val + eps + 1e-6).all()
    # Order-statistic-wise mean/std parity (sorted columns align the
    # distributions' k-th order statistics).
    np.testing.assert_allclose(t_z.mean(0), j_z.mean(0), atol=2e-3)
    np.testing.assert_allclose(t_z.std(0), j_z.std(0), atol=2e-3)


def test_sample_3d_points_matches_reference(ref_samplers):
    n_rays = 9000
    n_c2s, n_bins = 4, 10
    min_bound, eps, stop_eps = 0.07, 0.1, 0.05
    rng = np.random.default_rng(9)

    depth = rng.uniform(0.5, 2.5, n_rays).astype(np.float32)
    depth[:1500] = 0.0                      # invalid depth
    states = rng.integers(0, 3, n_rays).astype(np.int32)
    rgbs = rng.uniform(0, 255, (n_rays, 3)).astype(np.float32)
    origins = rng.normal(0, 0.5, (n_rays, 3)).astype(np.float32)
    dirs = rng.normal(0, 1, (n_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    self_stub = SimpleNamespace(
        n_bins_cam2surface=n_c2s, n_bins=n_bins, surface_eps=eps,
        stop_eps=stop_eps, min_bound=min_bound, data_device="cpu",
        this_obj=1)
    torch.manual_seed(2)
    sampled_rgbs = torch.tensor(
        np.concatenate([rgbs, states[:, None].astype(np.float32)], axis=-1))
    t_rgb, t_depth, t_valid, t_labels, t_pcs, t_z = ref_samplers[
        "sample_3d_points"](self_stub, sampled_rgbs, torch.tensor(depth),
                            torch.tensor(origins), torch.tensor(dirs))
    t_z = t_z.numpy()

    out = sampling.sample_3d_points(
        jax.random.PRNGKey(2), jnp.asarray(rgbs), jnp.asarray(states),
        jnp.asarray(depth), jnp.asarray(origins), jnp.asarray(dirs),
        n_bins_cam2surface=n_c2s, n_bins=n_bins, min_depth=min_bound,
        surface_eps=eps, stop_eps=stop_eps)
    j_z = np.asarray(out.z_vals)

    # Non-random outputs must match the reference exactly.
    np.testing.assert_allclose(np.asarray(out.gt_rgb), t_rgb.numpy())
    np.testing.assert_array_equal(np.asarray(out.valid_depth_mask),
                                  t_valid.numpy())
    np.testing.assert_array_equal(np.asarray(out.obj_labels),
                                  t_labels.numpy().astype(np.int32))

    invalid = depth <= min_bound
    valid = ~invalid
    this_obj = (states == 1) & valid
    other = (states != 1) & valid
    max_bound = depth.max()

    for z in (t_z, j_z):
        # Structure: invalid rays span [min_bound, max_bound] on ALL bins.
        zi = z[invalid]
        assert (zi >= min_bound - 1e-6).all() and \
            (zi <= max_bound + 1e-6).all()
        # Valid rays: cam->surface block inside [min_bound, d - eps].
        zc = z[valid][:, :n_c2s]
        d = depth[valid][:, None]
        assert (zc >= min_bound - 1e-6).all() and (zc <= d - eps + 1e-6).all()
        # This-object rays: sorted normal within +-eps of depth.
        zs = z[this_obj][:, n_c2s:]
        d = depth[this_obj][:, None]
        assert (np.abs(zs - d) <= eps + 1e-6).all()
        assert (np.diff(zs, axis=-1) >= -1e-6).all()
        # Other rays: stratified in [d - eps, d + stop_eps].
        zo = z[other][:, n_c2s:]
        d = depth[other][:, None]
        assert (zo >= d - eps - 1e-6).all() and \
            (zo <= d + stop_eps + 1e-6).all()

    # Distributional parity per ray group: compare column-wise means of the
    # depth-relative offsets (both samplers draw from the same law; the SE
    # at these counts is < 1.5e-3).
    np.testing.assert_allclose(t_z[invalid].mean(0), j_z[invalid].mean(0),
                               atol=8e-3)
    d = depth[valid][:, None]
    np.testing.assert_allclose((t_z[valid][:, :n_c2s] / np.maximum(d - eps, 1e-3)).mean(0),
                               (j_z[valid][:, :n_c2s] / np.maximum(d - eps, 1e-3)).mean(0),
                               atol=5e-3)
    d = depth[this_obj][:, None]
    np.testing.assert_allclose((t_z[this_obj][:, n_c2s:] - d).mean(0),
                               (j_z[this_obj][:, n_c2s:] - d).mean(0),
                               atol=2e-3)
    d = depth[other][:, None]
    np.testing.assert_allclose((t_z[other][:, n_c2s:] - d).mean(0),
                               (j_z[other][:, n_c2s:] - d).mean(0),
                               atol=2e-3)

    # Point positions follow o + d*z exactly in both.
    np.testing.assert_allclose(
        np.asarray(out.input_pcs),
        origins[:, None, :] + dirs[:, None, :] * j_z[..., None],
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        t_pcs.numpy(),
        origins[:, None, :] + dirs[:, None, :] * t_z[..., None],
        rtol=1e-5, atol=1e-6)
