"""A/B: scattered-row gather vs cyclic-window dynamic_slice batch draw."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from catnerf_tpu.config import Config
from catnerf_tpu.data.device_buffer import build_device_store, make_superstep
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.train.loop import TrainingSession
from catnerf_tpu.train.step import make_train_step

N_INNER = 100
N_DISPATCH = 12


def run(window: bool) -> float:
    cfg = Config()
    cfg.seed = 0
    scene = make_scene(n_frames=4, width=96, height=72, n_categories=8,
                       insts_per_cat=3, seed=0)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    r, r_bg = sess.n_per_cls, cfg.n_per_optim_bg
    store = build_device_store(sess.categories, sess.background,
                               window_pad=r if window else 0,
                               bg_window_pad=r_bg if window else 0)
    inner = make_train_step(cfg, sess.obj_mask, jit=False)
    superstep = make_superstep(inner, store, n_per_cls=r, n_bg=r_bg,
                               n_inner=N_INNER, window=window)
    state = jax.tree.map(jnp.copy, sess.state)
    key = jax.random.PRNGKey(0)
    for _ in range(2):
        key, k = jax.random.split(key)
        state, m = superstep(state, k)
    float(m.total)
    t0 = time.perf_counter()
    for _ in range(N_DISPATCH):
        key, k = jax.random.split(key)
        state, m = superstep(state, k)
    float(m.total)
    us = (time.perf_counter() - t0) / (N_DISPATCH * N_INNER) * 1e6
    print(f"window={window}  {us:9.1f} us/step  final_loss={float(m.total):.2f}")
    return us


if __name__ == "__main__":
    for window in (False, True, False, True):
        run(window)
