"""Experiment: does a bf16 matmul path speed up the fwd+bwd hot loop?

Caveat: the monkeypatch only reaches layers that resolve `linear` via the
layers-module globals (i.e. linear_relu); the six direct `linear` heads stay
f32 in the 'bf16' variant. linear_relu dominates the op count, and the
conclusion (no speedup — TPU default matmul precision already truncates f32
inputs to bf16) was separately confirmed by the HIGHEST-precision drift
measurement in the fused-kernel work.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

from catnerf_tpu.config import Config
from catnerf_tpu.data.device_buffer import build_device_store, sample_batch
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.train.loop import TrainingSession
from catnerf_tpu.train.step import category_forward, background_forward
from catnerf_tpu.ops import losses
from catnerf_tpu.models import layers

N_INNER = 20
N_DISPATCH = 30


def timed_scan(fn, carry, name):
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
    for _ in range(N_DISPATCH):
        key, k = jax.random.split(key)
        c, out = scanned(c, k)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / (N_DISPATCH * N_INNER) * 1e6
    print(f"{name:40s} {us:9.1f} us/step", flush=True)
    return us


def main():
    cfg = Config()
    cfg.seed = 0
    scene = make_scene(n_frames=4, width=96, height=72, n_categories=8,
                       insts_per_cat=3, seed=0)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    r, r_bg = sess.n_per_cls, cfg.n_per_optim_bg
    store = build_device_store(sess.categories, sess.background)
    params = sess.state.params
    cat, bg = jax.jit(partial(sample_batch, store, n_per_cls=r, n_bg=r_bg))(
        jax.random.PRNGKey(1))

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

    linear_f32 = layers.linear

    def linear_bf16(p, x):
        y = jnp.matmul(x.astype(jnp.bfloat16), p["w"].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return y + p["b"]

    for name, lin in [("f32", linear_f32), ("bf16", linear_bf16)]:
        layers.linear = lin

        def f_fwd(carry, key):
            return carry, f_loss(params, key)

        grad_fn = jax.grad(f_loss)

        def f_bwd(carry, key):
            g = grad_fn(params, key)
            return carry, jax.tree.reduce(lambda a, x: a + x.sum(), g,
                                          jnp.zeros(()))

        timed_scan(f_fwd, 0.0, f"forward+loss [{name}]")
        timed_scan(f_bwd, 0.0, f"forward+backward [{name}]")

    layers.linear = linear_f32


if __name__ == "__main__":
    main()
