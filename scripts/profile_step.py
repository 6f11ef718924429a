"""Break down superstep time: sampling / forward / fwd+bwd / optimizer.

Each phase is measured as a lax.scan over N_INNER iterations of just that
piece (same dispatch amortisation as the production superstep), so the
numbers are directly comparable to bench.py's steps_per_sec_superstep.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

from catnerf_tpu.config import Config
from catnerf_tpu.data.device_buffer import build_device_store, make_superstep, sample_batch
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.train.loop import TrainingSession
from catnerf_tpu.train.step import make_train_step, category_forward, background_forward
from catnerf_tpu.ops import sampling, losses

N_INNER = 20
N_DISPATCH = 30


def timed_scan(fn, carry, name, n_dispatch=N_DISPATCH):
    @jax.jit
    def scanned(c, key):
        keys = jax.random.split(key, N_INNER)
        c, out = jax.lax.scan(fn, c, keys)
        return c, out

    key = jax.random.PRNGKey(0)
    c = carry
    for _ in range(2):
        key, k = jax.random.split(key)
        c, out = scanned(c, k)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        key, k = jax.random.split(key)
        c, out = scanned(c, k)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    us = dt / (n_dispatch * N_INNER) * 1e6
    print(f"{name:34s} {us:9.1f} us/step")
    return us


def main():
    cfg = Config()
    cfg.seed = 0
    scene = make_scene(n_frames=4, width=96, height=72, n_categories=8,
                       insts_per_cat=3, seed=0)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    r = sess.n_per_cls
    r_bg = cfg.n_per_optim_bg
    store = build_device_store(sess.categories, sess.background,
                               window_pad=sess.n_per_cls,
                               bg_window_pad=cfg.n_per_optim_bg)
    state0 = jax.tree.map(jnp.copy, sess.state)

    def n_leaves(tree):
        return len(jax.tree.leaves(tree))

    print(f"n_cls={len(sess.cls_ids)} rays/cat={r} bg={r_bg} "
          f"param_leaves={n_leaves(state0.params)} "
          f"opt_leaves={n_leaves(state0.opt_state)}")

    # ---- 0. batch draw from device store (production windowed path +
    # the legacy scattered gather for comparison)
    def f_sample_window(carry, key):
        cat, bg = sample_batch(store, key, r, r_bg, window=True)
        return carry, (cat.rgbs.sum() + bg.rgbs.sum())
    timed_scan(f_sample_window, 0.0, "batch draw (window, production)")

    def f_sample_batch(carry, key):
        cat, bg = sample_batch(store, key, r, r_bg)
        return carry, (cat.rgbs.sum() + bg.rgbs.sum())
    timed_scan(f_sample_batch, 0.0, "batch gather (legacy)")

    # ---- fixed batch for the pieces below
    key0 = jax.random.PRNGKey(1)
    cat, bg = jax.jit(partial(sample_batch, store, n_per_cls=r, n_bg=r_bg))(key0)

    # ---- 1. 3D point sampling only
    def f_sampling(carry, key):
        k1, k2 = jax.random.split(key)
        n_cls = cat.rgbs.shape[0]
        keys = jax.random.split(k1, n_cls)
        sample_fn = partial(
            sampling.sample_3d_points,
            n_bins_cam2surface=cfg.n_bins_cam2surface, n_bins=cfg.n_bins,
            min_depth=cfg.min_depth, surface_eps=cfg.surface_eps,
            stop_eps=cfg.stop_eps)
        rays = jax.vmap(sample_fn)(keys, cat.rgbs, cat.states, cat.depth,
                                   cat.origins, cat.dirs)
        rays_bg = sampling.sample_3d_points(
            k2, bg.rgbs, bg.states, bg.depth, bg.origins, bg.dirs,
            n_bins_cam2surface=cfg.n_bins_cam2surface_bg, n_bins=cfg.n_bins,
            min_depth=cfg.min_depth, surface_eps=cfg.surface_eps,
            stop_eps=cfg.stop_eps)
        return carry, (rays.input_pcs.sum() + rays_bg.input_pcs.sum())
    timed_scan(f_sampling, 0.0, "3d point sampling (cat+bg)")

    # ---- 2. forward only (includes sampling)
    def f_forward(carry, key):
        k1, k2 = jax.random.split(key)
        a, c_, rays = category_forward(state0.params, cat, k1, cfg)
        ab, cb, rb = background_forward(state0.params, bg, k2, cfg)
        return carry, (a.sum() + c_.sum() + ab.sum() + cb.sum())
    timed_scan(f_forward, 0.0, "forward (sampling+PE+MLP)")

    # ---- 3. forward + loss
    def f_loss(params, key):
        k1, k2 = jax.random.split(key)
        a, c_, rays = category_forward(params, cat, k1, cfg)
        cat_loss = losses.step_batch_loss(
            a, c_, rays.gt_depth, rays.gt_rgb, rays.obj_labels,
            rays.valid_depth_mask, rays.z_vals,
            color_scaling=cfg.color_scaling,
            opacity_scaling=cfg.opacity_scaling)
        ab, cb, rb = background_forward(params, bg, k2, cfg)
        bg_loss = losses.step_batch_loss(
            ab[None], cb[None], rb.gt_depth[None], rb.gt_rgb[None],
            rb.obj_labels[None], rb.valid_depth_mask[None], rb.z_vals[None],
            color_scaling=cfg.color_scaling,
            opacity_scaling=cfg.opacity_scaling)
        return cat_loss.total + bg_loss.total

    def f_fwdloss(carry, key):
        return carry, f_loss(state0.params, key)
    timed_scan(f_fwdloss, 0.0, "forward + loss")

    # ---- 4. fwd + bwd (no optimizer)
    grad_fn = jax.grad(f_loss)
    def f_bwd(carry, key):
        g = grad_fn(state0.params, key)
        return carry, jax.tree.reduce(
            lambda acc, x: acc + x.sum(), g, jnp.zeros(()))
    timed_scan(f_bwd, 0.0, "forward + backward")

    # ---- 5. full step, fixed batch (isolates optimizer cost vs 4)
    inner_fixed = make_train_step(cfg, sess.obj_mask, jit=False)
    def f_step_fixed(state, key):
        state, m = inner_fixed(state, cat, bg, key)
        return state, m.total
    timed_scan(f_step_fixed, jax.tree.map(jnp.copy, state0),
               "full step (fixed batch)")

    # ---- 6. production superstep (batch gather + full step)
    inner = make_train_step(cfg, sess.obj_mask, jit=False)
    superstep = make_superstep(inner, store, n_per_cls=r, n_bg=r_bg,
                               n_inner=N_INNER, window=True)
    state = jax.tree.map(jnp.copy, state0)
    key = jax.random.PRNGKey(0)
    for _ in range(2):
        key, k = jax.random.split(key)
        state, m = superstep(state, k)
    jax.block_until_ready(m.total)
    t0 = time.perf_counter()
    for _ in range(N_DISPATCH):
        key, k = jax.random.split(key)
        state, m = superstep(state, k)
    jax.block_until_ready(m.total)
    dt = time.perf_counter() - t0
    print(f"{'production superstep':34s} {dt / (N_DISPATCH * N_INNER) * 1e6:9.1f} us/step")


if __name__ == "__main__":
    main()
