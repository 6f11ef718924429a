"""Step-level golden parity vs an independent torch implementation.

VERDICT r1 item #1: the strongest dataset-free check against silent numeric
divergence. An independent torch implementation of the reference's CodeNeRF
forward (spec: src/model.py:56-84), UniDirsEmbed PE (src/embedding.py:43-92),
rendering math (src/render_rays.py:3-95) and full `step_batch_loss` +
code-norm regularisation (src/loss.py:5-74, train.py:154-167) is fed the SAME
weights and the SAME ray batch as our JAX step-loss path, and we assert:

  * CodeNeRF forward (sigma, rgb) matches to ~1e-5,
  * total loss + per-category loss vectors + loss dict match to ~1e-5,
  * gradients wrt EVERY parameter (PE basis, all CodeNeRF layers, latent
    code tables) match to <=1e-4.

The torch side is written from the architecture spec, not copied; weights
cross the framework boundary through `_codenerf_state_dict` (the exporter in
train/checkpoint.py), so this also locks the reference-checkpoint schema.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from catnerf_tpu.models import codenerf, embedding  # noqa: E402
from catnerf_tpu.ops import losses  # noqa: E402
from catnerf_tpu.train.checkpoint import _codenerf_state_dict  # noqa: E402

N_CLS = 3
N_OBJ = 2       # instances per category (>1 so code reg is active)
N_RAYS = 24
N_BINS = 10
LATENT = 32
W = 32
EMB1, EMB2 = 87, 42
SCALE = 2.0
REG_SCALING = 5e-4  # ref: train.py:165


# ---------------------------------------------------------------------------
# Independent torch implementation (from the reference spec, not our code)
# ---------------------------------------------------------------------------


def torch_pe(B, x, scale):
    """UniDirsEmbed spec: project scaled xyz through the 21-dir basis,
    scale by bands 2^0..2^5, sin(pi*.), prepend raw scaled xyz."""
    t = x / scale
    proj = t @ B.t()
    bands = 2.0 ** torch.arange(6, dtype=torch.float32)
    xb = (proj[..., None, :] * bands[:, None]).reshape(*proj.shape[:-1], -1)
    return torch.cat([t, torch.sin(np.pi * xb)], dim=-1)


def torch_codenerf(sd, emb, shape_latent, texture_latent):
    """CodeNeRF forward per src/model.py:56-84 (shape_blocks=2,
    texture_blocks=1). sd maps reference state-dict names -> tensors."""

    def lin(prefix, v):
        return v @ sd[f"{prefix}.weight"].t() + sd[f"{prefix}.bias"]

    def lin_relu(prefix, v):
        return torch.relu(lin(prefix, v))

    x1, x2 = emb[..., :EMB1], emb[..., EMB1:]
    y = lin_relu("encoding_xyz.0", x1)
    for j in range(2):
        if j == 1:
            y = y + lin_relu("cat_latent_layer.0", shape_latent)
            y = torch.cat(
                [y, x1.expand(*y.shape[:-1], EMB1)], dim=-1)
            y = lin_relu("cat_layer.0", y)
        y = y + lin_relu(f"shape_latent_layer_{j + 1}.0", shape_latent)
        y = lin_relu(f"shape_layer_{j + 1}.0", y)
    y = lin("encoding_shape", y)
    sigma = lin("sigma.0", y) * 10.0
    y = torch.cat([y, x2.expand(*y.shape[:-1], EMB2)], dim=-1)
    y = lin_relu("encoding_viewdir.0", y)
    y = y + lin_relu("texture_latent_layer_1.0", texture_latent)
    y = lin_relu("texture_layer_1.0", y)
    rgb = torch.sigmoid(lin("rgb.2", torch.relu(lin("rgb.0", y))))
    return sigma, rgb


def torch_step_batch_loss(alpha, color, gt_depth, gt_color, sem, mask_depth,
                          z_vals):
    """Full step loss per src/loss.py:18-74 + src/render_rays.py:25-95."""
    mask_obj = sem != 0
    mask_sem = sem != 2
    occ = torch.sigmoid(alpha)
    first = torch.ones_like(occ[..., :1])
    free = torch.cat([first, (1.0 - occ + 1e-10)[..., :-1]], dim=-1)
    term = occ * torch.cumprod(free, dim=-1)

    render_depth = (term * z_vals).sum(-1)
    var = (term * (z_vals - render_depth[..., None]) ** 2).sum(-1).detach()
    render_color = (term[..., None] * color).sum(-2)
    render_opacity = term.sum(-1)

    def reduce(loss_mat, mask, var=None):
        if var is not None:
            loss_mat = loss_mat / (torch.sqrt(var) + 1e-4)
        return loss_mat.sum(-1) / (mask.sum(-1) + 1e-10)

    m_d = mask_depth & mask_obj
    loss_depth = reduce((render_depth - gt_depth).abs() * m_d, m_d, var)
    loss_col = reduce((render_color - gt_color).abs().sum(-1) * mask_obj,
                      mask_obj)
    loss_opac = reduce((render_opacity - mask_obj.float()).abs() * mask_sem,
                       mask_sem)
    total = (loss_depth + 5.0 * loss_col + 10.0 * loss_opac).sum()
    return total, loss_depth, loss_col, loss_opac


# ---------------------------------------------------------------------------
# Shared fixtures: identical weights + identical batch both ways
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, N_CLS + 4)

    fc_params = [
        codenerf.init_params(ks[i], latent_dim=LATENT, W=W)
        for i in range(N_CLS)
    ]
    fc_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *fc_params)
    pe_stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[embedding.init_params() for _ in range(N_CLS)],
    )
    # Perturb each category's PE basis so categories are not identical.
    pe_stacked = {
        "B": pe_stacked["B"]
        + 0.01 * jax.random.normal(ks[N_CLS], pe_stacked["B"].shape)
    }

    rng = np.random.default_rng(3)
    shape_codes = rng.normal(0, 0.2, (N_CLS, N_OBJ, LATENT)).astype(np.float32)
    tex_codes = rng.normal(0, 0.2, (N_CLS, N_OBJ, LATENT)).astype(np.float32)

    batch = {
        "pts": rng.uniform(-1.2, 1.2, (N_CLS, N_RAYS, N_BINS, 3)).astype(np.float32),
        "z_vals": np.sort(
            rng.uniform(0.1, 3.0, (N_CLS, N_RAYS, N_BINS)).astype(np.float32), -1),
        "gt_depth": rng.uniform(0.5, 2.5, (N_CLS, N_RAYS)).astype(np.float32),
        "gt_color": rng.uniform(0, 1, (N_CLS, N_RAYS, 3)).astype(np.float32),
        # Pixel states 0/1/2 with every mask non-empty per category.
        "sem": np.concatenate(
            [np.full((N_CLS, 6), 0), np.full((N_CLS, 12), 1),
             np.full((N_CLS, 6), 2)], axis=1).astype(np.int32),
        "mask_depth": (rng.uniform(size=(N_CLS, N_RAYS)) > 0.2),
        "obj_idx": rng.integers(0, N_OBJ, (N_CLS, N_RAYS)).astype(np.int32),
    }
    return fc_stacked, pe_stacked, shape_codes, tex_codes, batch


def jax_total_loss(params, batch):
    """Our PE -> CodeNeRF -> step loss -> +code-reg chain, mirroring
    train/step.py's loss_fn minus point sampling (points fed directly)."""
    pe_fn = lambda p, x: embedding.apply(p, x, scale=SCALE)
    emb = jax.vmap(pe_fn)(params["pe"], batch["pts"])
    sc = jax.vmap(lambda c, i: jnp.take(c, i, axis=0))(
        params["shape_codes"], batch["obj_idx"])
    tc = jax.vmap(lambda c, i: jnp.take(c, i, axis=0))(
        params["texture_codes"], batch["obj_idx"])
    alpha, color = jax.vmap(codenerf.apply)(
        params["fc"], emb, sc[:, :, None, :], tc[:, :, None, :])
    breakdown = losses.step_batch_loss(
        alpha[..., 0], color, batch["gt_depth"], batch["gt_color"],
        batch["sem"], batch["mask_depth"], batch["z_vals"])
    obj_mask = jnp.ones((N_CLS, N_OBJ), dtype=bool)
    reg_s, reg_t = losses.code_reg_loss(
        params["shape_codes"], params["texture_codes"], obj_mask)
    total = breakdown.total + REG_SCALING * (reg_s + reg_t).sum()
    return total, breakdown


def torch_params_from_jax(fc_stacked, pe_stacked, shape_codes, tex_codes,
                          requires_grad=False):
    """Cross the framework boundary via the reference-schema exporter."""
    sds, pes = [], []
    for c in range(N_CLS):
        fc_c = jax.tree.map(lambda x: np.asarray(x[c]), fc_stacked)
        sd = _codenerf_state_dict(torch, fc_c)
        sd = {k: v.clone().requires_grad_(requires_grad) for k, v in sd.items()}
        sds.append(sd)
        B = torch.tensor(np.asarray(pe_stacked["B"][c])).requires_grad_(
            requires_grad)
        pes.append(B)
    sc = torch.tensor(shape_codes).requires_grad_(requires_grad)
    tc = torch.tensor(tex_codes).requires_grad_(requires_grad)
    return sds, pes, sc, tc


def torch_total_loss(sds, pes, sc_table, tc_table, batch):
    alphas, colors = [], []
    for c in range(N_CLS):
        pts = torch.tensor(batch["pts"][c])
        emb = torch_pe(pes[c], pts, SCALE)
        idx = torch.tensor(batch["obj_idx"][c], dtype=torch.long)
        sc = sc_table[c].index_select(0, idx)[:, None, :]
        tc = tc_table[c].index_select(0, idx)[:, None, :]
        sigma, rgb = torch_codenerf(sds[c], emb, sc, tc)
        alphas.append(sigma[..., 0])
        colors.append(rgb)
    alpha = torch.stack(alphas)
    color = torch.stack(colors)
    total, l_d, l_c, l_o = torch_step_batch_loss(
        alpha, color, torch.tensor(batch["gt_depth"]),
        torch.tensor(batch["gt_color"]), torch.tensor(batch["sem"]),
        torch.tensor(batch["mask_depth"]), torch.tensor(batch["z_vals"]))
    # Code reg (src/loss.py:5-15, scaled at train.py:165): all categories
    # here have N_OBJ=2 > 1 instances, so all contribute.
    reg = (torch.norm(sc_table, dim=-1).sum()
           + torch.norm(tc_table, dim=-1).sum())
    total = total + REG_SCALING * reg
    return total, l_d, l_c, l_o, alpha, color


def test_codenerf_forward_matches_torch(setup):
    fc, pe, sc, tc, batch = setup
    sds, pes, sct, tct = torch_params_from_jax(fc, pe, sc, tc)
    _, _, _, _, t_alpha, t_color = torch_total_loss(sds, pes, sct, tct, batch)

    params = {"fc": fc, "pe": pe, "shape_codes": jnp.asarray(sc),
              "texture_codes": jnp.asarray(tc)}
    pe_fn = lambda p, x: embedding.apply(p, x, scale=SCALE)
    emb = jax.vmap(pe_fn)(params["pe"], jnp.asarray(batch["pts"]))
    scr = jax.vmap(lambda c, i: jnp.take(c, i, axis=0))(
        params["shape_codes"], jnp.asarray(batch["obj_idx"]))
    tcr = jax.vmap(lambda c, i: jnp.take(c, i, axis=0))(
        params["texture_codes"], jnp.asarray(batch["obj_idx"]))
    alpha, color = jax.vmap(codenerf.apply)(
        params["fc"], emb, scr[:, :, None, :], tcr[:, :, None, :])

    np.testing.assert_allclose(
        np.asarray(alpha[..., 0]), t_alpha.detach().numpy(),
        rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(color), t_color.detach().numpy(), rtol=1e-4, atol=2e-5)


def test_step_loss_matches_torch(setup):
    fc, pe, sc, tc, batch = setup
    sds, pes, sct, tct = torch_params_from_jax(fc, pe, sc, tc)
    t_total, t_d, t_c, t_o, _, _ = torch_total_loss(sds, pes, sct, tct, batch)

    params = {"fc": fc, "pe": pe, "shape_codes": jnp.asarray(sc),
              "texture_codes": jnp.asarray(tc)}
    total, breakdown = jax_total_loss(params, batch)

    np.testing.assert_allclose(float(total), float(t_total),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(breakdown.depth),
                               t_d.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(breakdown.color),
                               t_c.detach().numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(breakdown.opacity),
                               t_o.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_step_gradients_match_torch(setup):
    fc, pe, sc, tc, batch = setup
    sds, pes, sct, tct = torch_params_from_jax(fc, pe, sc, tc,
                                               requires_grad=True)
    t_total, *_ = torch_total_loss(sds, pes, sct, tct, batch)
    t_total.backward()

    params = {"fc": fc, "pe": pe, "shape_codes": jnp.asarray(sc),
              "texture_codes": jnp.asarray(tc)}
    grads = jax.grad(lambda p: jax_total_loss(p, batch)[0])(params)

    def check(jax_g, torch_t, name):
        tg = torch_t.grad
        assert tg is not None, f"no torch grad for {name}"
        np.testing.assert_allclose(
            np.asarray(jax_g), tg.numpy(), rtol=1e-3, atol=1e-4,
            err_msg=f"gradient mismatch: {name}")

    check(grads["shape_codes"], sct, "shape_codes")
    check(grads["texture_codes"], tct, "texture_codes")
    for c in range(N_CLS):
        check(grads["pe"]["B"][c], pes[c], f"pe.B[{c}]")
        gfc = jax.tree.map(lambda x: x[c], grads["fc"])
        # Reference-name mapping mirrors _codenerf_state_dict; torch Linear
        # weights are (out, in) so jax grads are transposed to compare.
        pairs = [
            ("encoding_xyz", "encoding_xyz.0"),
            ("cat_layer", "cat_layer.0"),
            ("cat_latent_layer", "cat_latent_layer.0"),
            ("encoding_shape", "encoding_shape"),
            ("sigma", "sigma.0"),
            ("encoding_viewdir", "encoding_viewdir.0"),
            ("rgb_0", "rgb.0"),
            ("rgb_1", "rgb.2"),
        ]
        for ours, theirs in pairs:
            np.testing.assert_allclose(
                np.asarray(gfc[ours]["w"]).T,
                sds[c][f"{theirs}.weight"].grad.numpy(),
                rtol=1e-3, atol=1e-4, err_msg=f"fc[{c}].{ours}.w")
            np.testing.assert_allclose(
                np.asarray(gfc[ours]["b"]),
                sds[c][f"{theirs}.bias"].grad.numpy(),
                rtol=1e-3, atol=1e-4, err_msg=f"fc[{c}].{ours}.b")
        for j in range(2):
            for ours, theirs in [("shape_latent_layers",
                                  "shape_latent_layer"),
                                 ("shape_layers", "shape_layer")]:
                np.testing.assert_allclose(
                    np.asarray(gfc[ours][j]["w"]).T,
                    sds[c][f"{theirs}_{j + 1}.0.weight"].grad.numpy(),
                    rtol=1e-3, atol=1e-4, err_msg=f"fc[{c}].{ours}[{j}].w")
                np.testing.assert_allclose(
                    np.asarray(gfc[ours][j]["b"]),
                    sds[c][f"{theirs}_{j + 1}.0.bias"].grad.numpy(),
                    rtol=1e-3, atol=1e-4, err_msg=f"fc[{c}].{ours}[{j}].b")
        for ours, theirs in [("texture_latent_layers",
                              "texture_latent_layer_1"),
                             ("texture_layers", "texture_layer_1")]:
            np.testing.assert_allclose(
                np.asarray(gfc[ours][0]["w"]).T,
                sds[c][f"{theirs}.0.weight"].grad.numpy(),
                rtol=1e-3, atol=1e-4, err_msg=f"fc[{c}].{ours}.w")
            np.testing.assert_allclose(
                np.asarray(gfc[ours][0]["b"]),
                sds[c][f"{theirs}.0.bias"].grad.numpy(),
                rtol=1e-3, atol=1e-4, err_msg=f"fc[{c}].{ours}.b")


def test_psnr_proxy_matches_torch(setup):
    fc, pe, sc, tc, batch = setup
    sds, pes, sct, tct = torch_params_from_jax(fc, pe, sc, tc)
    _, _, t_c, _, _, _ = torch_total_loss(sds, pes, sct, tct, batch)
    t_psnr = -10 * np.log(t_c.detach().numpy()) / np.log(10)

    params = {"fc": fc, "pe": pe, "shape_codes": jnp.asarray(sc),
              "texture_codes": jnp.asarray(tc)}
    _, breakdown = jax_total_loss(params, batch)
    psnr = losses.psnr_from_l1(breakdown.psnr_color)
    np.testing.assert_allclose(np.asarray(psnr), t_psnr, rtol=1e-4)
