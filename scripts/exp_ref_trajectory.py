"""Reference-executed training trajectory A/B (VERDICT r2 item #6).

Drives a full multi-iteration training loop THROUGH THE REFERENCE'S OWN
torch modules — UniDirsEmbed -> CodeNeRF/OccupancyMap forward
(src/embedding.py, src/model.py), `loss.step_batch_loss` +
`step_batch_loss_reg` (src/loss.py), the reference's 3D samplers
(src/scene_cateogries.py:51-96,453-546, AST-extracted), and
`torch.optim.AdamW` with the reference param groups (train.py:40,54-64) —
and compares the loss/PSNR trajectory against our JAX parity path
(`TrainingSession.step_once`).

Both sides start from IDENTICAL initial parameters (exported through the
reference-schema checkpoint bridge) and consume IDENTICAL per-step pixel
batches (two sessions with the same seed produce the same host batch
stream). The z/bin sampling RNG necessarily differs (torch vs threefry),
so the comparison is on smoothed trajectories, not per-step values.

This is the strongest dataset-free end-to-end equivalence statement
available in this environment: if our field/loss/optimizer semantics
diverged from the reference's, the two training curves would separate.

With --mesh (VERDICT r3 item #8), both endpoints are additionally MESHED
and scored against the analytic synthetic GT: the torch endpoint's
parameters travel back through the reference-schema checkpoint importer
(train/checkpoint.py) into our mesher, so trajectory parity becomes
converged-ARTIFACT parity — reference-executed weights and our parity
path must reconstruct the same surfaces to the same accuracy.

Usage:
  PYTHONPATH=/root/repo python scripts/exp_ref_trajectory.py \
      [--iters 200] [--json /tmp/out.json] [--mesh] [--grid-dim 64]
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys
import textwrap
import time
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_SRC = "/root/reference/src"
REG_SCALING = 5e-4  # ref: train.py:166


def import_reference_modules():
    saved = {k: sys.modules.get(k)
             for k in ("embedding", "model", "render_rays", "loss")}
    sys.path.insert(0, REF_SRC)
    try:
        import embedding as ref_embedding  # noqa: F401
        import model as ref_model
        import render_rays as ref_render_rays  # noqa: F401
        import loss as ref_loss
    finally:
        sys.path.remove(REF_SRC)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return SimpleNamespace(embedding=ref_embedding, model=ref_model,
                           loss=ref_loss)


def extract_reference_samplers(torch):
    src = open(os.path.join(REF_SRC, "scene_cateogries.py")).read()
    tree = ast.parse(src)
    ns = {"torch": torch, "np": np}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in (
                "stratified_bins", "normal_bins_sampling"):
            exec(ast.get_source_segment(src, node), ns)  # noqa: S102
        if isinstance(node, ast.ClassDef) and node.name == "sceneCategory":
            for sub in node.body:
                if isinstance(sub, ast.FunctionDef) and \
                        sub.name == "sample_3d_points":
                    exec(textwrap.dedent(  # noqa: S102
                        ast.get_source_segment(src, sub)), ns)
    return ns


def build_torch_trainer(ref, torch, sess, cfg):
    """Reference modules initialised from OUR session's initial params via
    the reference-schema exporter, plus the reference AdamW param groups."""
    from catnerf_tpu.train.checkpoint import (_codenerf_state_dict,
                                              _occupancy_state_dict)
    import jax

    latent = cfg.net_hyperparams.latent_dim
    params = jax.device_get(sess.state.params)
    n_cls = len(sess.cls_ids)

    opt = torch.optim.AdamW([torch.zeros(1, requires_grad=True)],
                            lr=cfg.learning_rate,
                            weight_decay=cfg.weight_decay)

    models, pes, shape_codes, tex_codes = [], [], [], []
    for c in range(n_cls):
        fc_c = jax.tree.map(lambda x: np.asarray(x[c]), params["cat_fc"])
        m = ref.model.CodeNeRF(87, 42, W=cfg.net_hyperparams.W,
                               latent_dim=latent)
        m.load_state_dict(_codenerf_state_dict(torch, fc_c), strict=True)
        pe = ref.embedding.UniDirsEmbed(max_deg=cfg.n_unidir_funcs,
                                        scale=cfg.obj_scale)
        pe.load_state_dict(
            {"B_layer.weight": torch.tensor(
                np.asarray(params["cat_pe"]["B"][c])),
             "scale": torch.tensor(float(cfg.obj_scale))}, strict=True)
        n_obj = params["codes"]["shape"].shape[1]
        sc = torch.nn.Embedding(n_obj, latent)
        sc.weight.data = torch.tensor(np.asarray(params["codes"]["shape"][c]))
        tc = torch.nn.Embedding(n_obj, latent)
        tc.weight.data = torch.tensor(
            np.asarray(params["codes"]["texture"][c]))
        models.append(m)
        pes.append(pe)
        shape_codes.append(sc)
        tex_codes.append(tc)
        # ref: train.py:54-64 — model+PE at (lr, wd); codes at (code_lr,
        # code_wd)
        opt.add_param_group({"params": m.parameters(),
                             "lr": cfg.learning_rate,
                             "weight_decay": cfg.weight_decay})
        opt.add_param_group({"params": pe.parameters(),
                             "lr": cfg.learning_rate,
                             "weight_decay": cfg.weight_decay})
        opt.add_param_group({"params": sc.parameters(),
                             "lr": cfg.code_learning_rate,
                             "weight_decay": cfg.code_weight_decay})
        opt.add_param_group({"params": tc.parameters(),
                             "lr": cfg.code_learning_rate,
                             "weight_decay": cfg.code_weight_decay})

    bg_model = bg_pe = None
    if sess.background is not None:
        fc_bg = jax.tree.map(np.asarray, params["bg_fc"])
        bg_model = ref.model.OccupancyMap(
            87, 42, hidden_size=cfg.hidden_feature_size_bg)
        bg_model.load_state_dict(_occupancy_state_dict(torch, fc_bg),
                                 strict=True)
        bg_pe = ref.embedding.UniDirsEmbed(max_deg=cfg.n_unidir_funcs,
                                           scale=cfg.bg_scale)
        bg_pe.load_state_dict(
            {"B_layer.weight": torch.tensor(np.asarray(params["bg_pe"]["B"])),
             "scale": torch.tensor(float(cfg.bg_scale))}, strict=True)
        opt.add_param_group({"params": bg_model.parameters(),
                             "lr": cfg.learning_rate,
                             "weight_decay": cfg.weight_decay})
        opt.add_param_group({"params": bg_pe.parameters(),
                             "lr": cfg.learning_rate,
                             "weight_decay": cfg.weight_decay})

    return SimpleNamespace(models=models, pes=pes, shape_codes=shape_codes,
                           tex_codes=tex_codes, bg_model=bg_model,
                           bg_pe=bg_pe, opt=opt)


def torch_step(tr, samplers, ref, torch, cfg, cat_np, bg_np, obj_masks):
    """One reference-semantics optimizer step on the given host batch."""
    n_cls = len(tr.models)

    cat_stub = SimpleNamespace(
        n_bins_cam2surface=cfg.n_bins_cam2surface, n_bins=cfg.n_bins,
        surface_eps=cfg.surface_eps, stop_eps=cfg.stop_eps,
        min_bound=cfg.min_depth, data_device="cpu", this_obj=1)
    bg_stub = SimpleNamespace(
        n_bins_cam2surface=cfg.n_bins_cam2surface_bg, n_bins=cfg.n_bins,
        surface_eps=cfg.surface_eps, stop_eps=cfg.stop_eps,
        min_bound=cfg.min_depth, data_device="cpu", this_obj=1)

    alphas, colors, depths, rgbs, sems, dmasks, zs = ([] for _ in range(7))
    for c in range(n_cls):
        rgbst = torch.tensor(
            np.concatenate([cat_np["rgbs"][c],
                            cat_np["states"][c][:, None].astype(np.float32)],
                           axis=-1))
        _, _, valid, labels, pcs, z = samplers["sample_3d_points"](
            cat_stub, rgbst, torch.tensor(cat_np["depth"][c]),
            torch.tensor(cat_np["origins"][c]),
            torch.tensor(cat_np["dirs"][c]))
        emb = tr.pes[c](pcs)
        idx = torch.tensor(cat_np["obj_indices"][c], dtype=torch.long)
        sc = tr.shape_codes[c](idx)[:, None, :]
        tc = tr.tex_codes[c](idx)[:, None, :]
        sigma, rgb = tr.models[c](emb, sc, tc)
        alphas.append(sigma)
        colors.append(rgb)
        depths.append(torch.tensor(cat_np["depth"][c]))
        rgbs.append(torch.tensor(cat_np["rgbs"][c]))
        sems.append(torch.tensor(cat_np["states"][c].astype(np.int64)))
        dmasks.append(valid)
        zs.append(z)

    total, loss_dict, loss_col = ref.loss.step_batch_loss(
        torch.stack(alphas), torch.stack(colors), torch.stack(depths),
        torch.stack(rgbs), torch.stack(sems), torch.stack(dmasks),
        torch.stack(zs), color_scaling=cfg.color_scaling,
        opacity_scaling=cfg.opacity_scaling)

    # code regularisation through the reference's own loop
    cls_dict = {}
    for c in range(n_cls):
        n_real = int(obj_masks[c].sum())
        trainer = SimpleNamespace(
            n_obj=n_real,
            shape_codes=tr.shape_codes[c],
            texture_codes=tr.tex_codes[c])
        cls_dict[c + 1] = SimpleNamespace(
            trainer=trainer, obj_ids=list(range(n_real)),
            training_device="cpu")
    reg_s, reg_t = ref.loss.step_batch_loss_reg(
        cls_dict, torch.arange(n_cls))
    total = total + REG_SCALING * (reg_s + reg_t).sum()

    bg_psnr = None
    if tr.bg_model is not None and bg_np is not None:
        rgbst = torch.tensor(
            np.concatenate([bg_np["rgbs"],
                            bg_np["states"][:, None].astype(np.float32)],
                           axis=-1))
        _, _, valid, labels, pcs, z = samplers["sample_3d_points"](
            bg_stub, rgbst, torch.tensor(bg_np["depth"]),
            torch.tensor(bg_np["origins"]), torch.tensor(bg_np["dirs"]))
        emb = tr.bg_pe(pcs)
        alpha, color = tr.bg_model(emb)
        bg_total, _, bg_col = ref.loss.step_batch_loss(
            alpha[None], color[None],
            torch.tensor(bg_np["depth"])[None],
            torch.tensor(bg_np["rgbs"])[None],
            torch.tensor(bg_np["states"].astype(np.int64))[None],
            valid[None], z[None], color_scaling=cfg.color_scaling,
            opacity_scaling=cfg.opacity_scaling)
        total = total + bg_total
        bg_psnr = float(-10 * np.log10(max(float(bg_col[0].detach()), 1e-12)))

    tr.opt.zero_grad(set_to_none=True)
    total.backward()
    tr.opt.step()

    psnr = [-10 * np.log10(max(float(v), 1e-12)) for v in loss_col]
    return float(total.detach()), psnr, bg_psnr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--json", default="")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mesh", action="store_true",
                    help="mesh both endpoints (torch params via the "
                         "checkpoint importer -> our mesher) and score "
                         "against the analytic GT")
    ap.add_argument("--grid-dim", type=int, default=64,
                    help="mesh grid cap for --mesh (CPU run: keep small)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import torch

    from catnerf_tpu.config import Config
    from catnerf_tpu.data.synthetic import make_scene
    from catnerf_tpu.train.loop import TrainingSession

    torch.manual_seed(args.seed)

    cfg = Config()
    cfg.net_hyperparams.latent_dim = 32
    cfg.seed = args.seed
    cfg.grid_dim = args.grid_dim
    scene = make_scene(n_frames=8, width=96, height=72, n_categories=2,
                       insts_per_cat=2, seed=args.seed)

    # JAX parity path
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    t0 = time.time()
    jax_tot, jax_psnr = [], []
    for _ in range(args.iters):
        m = sess.step_once()
        jax_tot.append(float(m.total))
        jax_psnr.append(np.asarray(m.cat_psnr).tolist())
    sess.release_prefetch()
    t_jax = time.time() - t0
    jax_psnr = np.asarray(jax_psnr)

    # Reference-executed torch path: same init, same batch stream
    ref = import_reference_modules()
    samplers = extract_reference_samplers(torch)
    sess2 = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                            cam=scene.cam)
    tr = build_torch_trainer(ref, torch, sess2, cfg)
    obj_masks = np.asarray(sess2.obj_mask)

    t0 = time.time()
    t_tot, t_psnr = [], []
    for _ in range(args.iters):
        cat_np, bg_np = sess2.batcher.next_batch(sess2.n_per_cls,
                                                 cfg.n_per_optim_bg)
        tot, psnr, _ = torch_step(tr, samplers, ref, torch, cfg, cat_np,
                                  bg_np, obj_masks)
        t_tot.append(tot)
        t_psnr.append(psnr)
    t_torch = time.time() - t0
    t_psnr = np.asarray(t_psnr)

    # Smoothed comparison: mean over trailing windows.
    def windows(x, w=25):
        x = np.asarray(x, np.float64)
        n = (len(x) // w) * w
        return x[:n].reshape(-1, w).mean(axis=1)

    mesh_result = None
    if args.mesh:
        import tempfile

        import jax.numpy as jnp

        from catnerf_tpu.mesher.mesh import load_mesh
        from catnerf_tpu.mesher.meshing import mesh_scene
        from catnerf_tpu.metrics.synthetic_eval import score_shape
        from catnerf_tpu.train.checkpoint import (
            codenerf_params_from_state_dict,
            occupancy_params_from_state_dict)

        def score_session(sess_x, tag):
            out_dir = tempfile.mkdtemp(prefix=f"ref_traj_{tag}_")
            written = mesh_scene(sess_x, out_dir, args.iters)
            per_obj, accs, comps, ratios = {}, [], [], []
            for s in scene.spheres:
                path = written.get(s.inst_id)
                if path is None:
                    per_obj[s.inst_id] = None
                    continue
                m, per_obj[s.inst_id] = score_shape(load_mesh(path), s)
                accs.append(m["accuracy"])
                comps.append(m["completion"])
                ratios.append(m["completion_ratio"])
            return {
                "mean_accuracy_cm": round(float(np.mean(accs)), 3),
                "mean_completion_cm": round(float(np.mean(comps)), 3),
                "mean_completion_ratio_pct": round(float(np.mean(ratios)),
                                                   2),
                "n_meshed": len(accs),
                "per_object": per_obj,
            }

        t0 = time.time()
        parity_scores = score_session(sess, "parity")

        # Reference-executed endpoint: torch weights -> reference-schema
        # importer -> our parameter tree -> our mesher.
        template = jax.device_get(sess2.state.params)
        fc_trees = [codenerf_params_from_state_dict(m_.state_dict())
                    for m_ in tr.models]
        new_params = dict(template)
        new_params["cat_fc"] = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *fc_trees)
        new_params["cat_pe"] = {"B": jnp.stack(
            [jnp.asarray(pe.B_layer.weight.detach().numpy())
             for pe in tr.pes])}
        new_params["codes"] = {
            "shape": jnp.stack(
                [jnp.asarray(sc.weight.detach().numpy())
                 for sc in tr.shape_codes]),
            "texture": jnp.stack(
                [jnp.asarray(tc.weight.detach().numpy())
                 for tc in tr.tex_codes]),
        }
        if tr.bg_model is not None:
            new_params["bg_fc"] = jax.tree.map(
                jnp.asarray,
                occupancy_params_from_state_dict(tr.bg_model.state_dict()))
            new_params["bg_pe"] = {"B": jnp.asarray(
                tr.bg_pe.B_layer.weight.detach().numpy())}
        sess2.state = sess2.state._replace(params=new_params)
        ref_scores = score_session(sess2, "ref")
        mesh_result = {
            "parity_endpoint": parity_scores,
            "reference_executed_endpoint": ref_scores,
            "accuracy_diff_cm": round(
                ref_scores["mean_accuracy_cm"]
                - parity_scores["mean_accuracy_cm"], 3),
            "ratio_diff_pct": round(
                ref_scores["mean_completion_ratio_pct"]
                - parity_scores["mean_completion_ratio_pct"], 2),
            "mesh_wall_s": round(time.time() - t0, 1),
        }
        print(f"mesh endpoints: parity={parity_scores['mean_accuracy_cm']}"
              f"/{parity_scores['mean_completion_ratio_pct']}% "
              f"ref-executed={ref_scores['mean_accuracy_cm']}"
              f"/{ref_scores['mean_completion_ratio_pct']}%",
              file=sys.stderr)

    w_tot_j, w_tot_t = windows(jax_tot), windows(t_tot)
    psnr_j, psnr_t = windows(jax_psnr.mean(axis=1)), windows(t_psnr.mean(axis=1))
    result = {
        "iters": args.iters,
        "jax_wall_s": round(t_jax, 1),
        "torch_wall_s": round(t_torch, 1),
        "windowed_total_jax": [round(v, 2) for v in w_tot_j],
        "windowed_total_torch": [round(v, 2) for v in w_tot_t],
        "windowed_psnr_jax": [round(v, 3) for v in psnr_j],
        "windowed_psnr_torch": [round(v, 3) for v in psnr_t],
        "final_window_total_ratio": round(float(w_tot_j[-1] / w_tot_t[-1]), 4),
        "final_window_psnr_diff_db": round(float(psnr_j[-1] - psnr_t[-1]), 3),
        "max_window_psnr_diff_db": round(
            float(np.max(np.abs(psnr_j - psnr_t))), 3),
    }
    if mesh_result is not None:
        result["mesh"] = mesh_result
    print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
