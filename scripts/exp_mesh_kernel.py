"""Measure: do the Pallas fused field kernels win at MESH-EVAL shapes?

VERDICT r1 #9: the kernels lose at train shapes (~2k rows/category — per-op
overhead beats XLA's HBM round trips there, see scripts/exp_kernel*.py), but
mesh extraction evaluates 262,144-point tiles (mesher/meshing.py eval_points
chunk), where each [262k, 32] f32 intermediate is a 33 MB HBM round trip in
the XLA graph. This script times the production XLA chunked eval against a
fused-kernel variant at exactly the mesh-eval shapes.

Measurement notes (hard-won):
  * On the axon TPU platform, block_until_ready can return BEFORE the
    computation finishes — only a device->host transfer is an honest sync.
    Every timed program therefore reduces its outputs to one scalar
    in-graph, and the timer syncs via np.asarray(scalar).
  * The production eval_points pulls occ+rgb (33 MB per 2.1M-pt grid) over
    the tunnel at ~134 MB/s — that D2H (~0.25 s) dwarfs device compute
    (~0.04 s) and is identical for both kernel choices, so it is excluded.
  * XLA's default f32 matmuls truncate inputs to bf16; the Pallas kernels
    are exact f32. The observed |dOcc| ~1e-3 (CodeNeRF) / ~3e-2
    (OccupancyMap, hidden=128) between the two paths is that truncation,
    not a bug (CLAUDE.md "hard-won performance facts").

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/exp_mesh_kernel.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from catnerf_tpu.config import Config
from catnerf_tpu.models import codenerf, embedding, occupancy
from catnerf_tpu.experimental import fused_field
from catnerf_tpu.ops import render as render_ops

CHUNK = 262144
N_TILES = 8  # one 128^3 grid = 2.1M points = 8 tiles


def timeit(fn, *args, n=10):
    np.asarray(fn(*args))  # compile + honest sync
    np.asarray(fn(*args))  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        s = fn(*args)
    np.asarray(s)  # programs run sequentially; syncing the last syncs all
    return (time.perf_counter() - t0) / n


def main():
    cfg = Config()
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    nh = cfg.net_hyperparams
    pe = embedding.init_params()
    fc = codenerf.init_params(k2, latent_dim=nh.latent_dim, W=nh.W,
                              shape_blocks=nh.shape_blocks,
                              texture_blocks=nh.texture_blocks)
    sc = jax.random.normal(k3, (nh.latent_dim,))
    tc = jax.random.normal(k4, (nh.latent_dim,))
    pts = jax.random.uniform(key, (N_TILES * CHUNK, 3), minval=-1, maxval=1)

    # --- production XLA path (the _eval_codenerf_chunked graph) -----------
    def xla_chunks(p):
        def eval_chunk(tile):
            emb = embedding.apply(pe, tile, scale=cfg.obj_scale,
                                  max_deg=cfg.n_unidir_funcs)
            sigma, rgb = codenerf.apply(fc, emb, sc, tc)
            return render_ops.occupancy_activation(sigma[..., 0]), rgb

        occ, rgb = jax.lax.map(eval_chunk, p.reshape(-1, CHUNK, 3))
        return occ, rgb

    # --- fused kernel path (C=1 ensemble, per-chunk constant injections) --
    fc_s = jax.tree.map(lambda x: x[None], fc)
    pe_s = jax.tree.map(lambda x: x[None], pe)

    def fused_chunks(p):
        sc1 = sc[None, None]  # [C=1, R=1, latent]
        tc1 = tc[None, None]

        # local copy of the pre-one-hot step helper (removed from
        # train/step.py when injections moved to codenerf.project_codes)
        def _batched_linear_relu(p, x):
            y = jnp.einsum("cri,cio->cro", x, p["w"]) + p["b"][:, None, :]
            return jax.nn.relu(y)

        zs0 = _batched_linear_relu(fc_s["shape_latent_layers"][0], sc1)
        zc = _batched_linear_relu(fc_s["cat_latent_layer"], sc1)
        zs1 = _batched_linear_relu(fc_s["shape_latent_layers"][1], sc1)
        zt0 = _batched_linear_relu(fc_s["texture_latent_layers"][0], tc1)

        def one_tile(tile):
            def bc(z):
                return jnp.broadcast_to(z[:, 0, None, :], (1, CHUNK, 32))

            sigma, rgb = fused_field.codenerf_fused_apply(
                fc_s, pe_s, tile[None], bc(zs0), bc(zc), bc(zs1), bc(zt0),
                scale=cfg.obj_scale)
            return (render_ops.occupancy_activation(sigma[0]), rgb[0])

        occ, rgb = jax.lax.map(one_tile, p.reshape(-1, CHUNK, 3))
        return occ, rgb

    @jax.jit
    def xla_scalar(p):
        occ, rgb = xla_chunks(p)
        return occ.sum() + rgb.sum()

    @jax.jit
    def fused_scalar(p):
        occ, rgb = fused_chunks(p)
        return occ.sum() + rgb.sum()

    t_xla = timeit(xla_scalar, pts)
    t_fused = timeit(fused_scalar, pts)

    @jax.jit
    def diff_cn(p):
        o1, _ = xla_chunks(p)
        o2, _ = fused_chunks(p)
        return jnp.abs(o1 - o2).max()

    err = float(np.asarray(diff_cn(pts)))

    # --- background OccupancyMap ------------------------------------------
    bg_fc = occupancy.init_params(k2, hidden_size=128)
    bg_pe = embedding.init_params()

    def xla_bg_chunks(p):
        def eval_chunk(tile):
            emb = embedding.apply(bg_pe, tile, scale=cfg.bg_scale,
                                  max_deg=cfg.n_unidir_funcs)
            alpha, rgb = occupancy.apply(bg_fc, emb)
            return render_ops.occupancy_activation(alpha[..., 0]), rgb

        occ, rgb = jax.lax.map(eval_chunk, p.reshape(-1, CHUNK, 3))
        return occ, rgb

    def fused_bg_chunks(p):
        def one_tile(tile):
            a, rgb = fused_field.occupancy_fused_apply(
                bg_fc, bg_pe, tile, scale=cfg.bg_scale)
            return render_ops.occupancy_activation(a), rgb

        occ, rgb = jax.lax.map(one_tile, p.reshape(-1, CHUNK, 3))
        return occ, rgb

    @jax.jit
    def xla_bg_scalar(p):
        occ, rgb = xla_bg_chunks(p)
        return occ.sum() + rgb.sum()

    @jax.jit
    def fused_bg_scalar(p):
        occ, rgb = fused_bg_chunks(p)
        return occ.sum() + rgb.sum()

    t_bg_xla = timeit(xla_bg_scalar, pts)
    t_bg_fused = timeit(fused_bg_scalar, pts)

    @jax.jit
    def diff_bg(p):
        o1, _ = xla_bg_chunks(p)
        o2, _ = fused_bg_chunks(p)
        return jnp.abs(o1 - o2).max()

    err_bg = float(np.asarray(diff_bg(pts)))

    n_pts = N_TILES * CHUNK
    print(f"codenerf mesh-eval ({n_pts} pts): xla {t_xla*1e3:.2f} ms "
          f"({n_pts/t_xla/1e6:.0f} Mpts/s)  fused {t_fused*1e3:.2f} ms "
          f"({n_pts/t_fused/1e6:.0f} Mpts/s)  speedup x{t_xla/t_fused:.2f} "
          f"max|dOcc|={err:.2e}")
    print(f"occupancy mesh-eval ({n_pts} pts): xla {t_bg_xla*1e3:.2f} ms "
          f"({n_pts/t_bg_xla/1e6:.0f} Mpts/s)  fused {t_bg_fused*1e3:.2f} ms "
          f"({n_pts/t_bg_fused/1e6:.0f} Mpts/s)  "
          f"speedup x{t_bg_xla/t_bg_fused:.2f} max|dOcc|={err_bg:.2e}")


if __name__ == "__main__":
    main()
