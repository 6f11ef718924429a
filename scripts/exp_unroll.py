"""A/B: lax.scan unroll factor for the superstep body.

The per-op trace shows 406 us/step of leaf device ops vs ~470 us/step of
wall time — ~60 us/step of scheduling gaps inside the while loop.
Unrolling the scan body lets XLA overlap independent work across
consecutive optimizer steps (the next step's batch draw/PE forward with
the current step's backward) and halves/quarters the loop bookkeeping.
Numerics are unchanged (same ops, same order per step).

Variants: unroll = 1 (production), 2, 4.

Measured (v5e, 2026-08-19): unroll=1 464.4/468.6, unroll=2 503.0/506.6
(+8%), unroll=4 472.3/464.7 (neutral) us/step — NEGATIVE. The gaps are
not loop bookkeeping: the unrolled body's bigger fusion scope reshuffles
scheduling without overlapping anything new (the step's dependency chain
is serial). Production stays unroll=1; do not re-try.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from catnerf_tpu.config import Config
from catnerf_tpu.data import device_buffer
from catnerf_tpu.data.device_buffer import build_device_store, make_superstep
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.train.loop import TrainingSession
from catnerf_tpu.train.step import make_train_step
from catnerf_tpu.utils import enable_compilation_cache

N_INNER = 100
N_DISPATCH = 12


def run(unroll: int) -> float:
    cfg = Config()
    cfg.seed = 0
    scene = make_scene(n_frames=4, width=96, height=72, n_categories=8,
                       insts_per_cat=3, seed=0)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    r, r_bg = sess.n_per_cls, cfg.n_per_optim_bg
    store = build_device_store(sess.categories, sess.background,
                               window_pad=r, bg_window_pad=r_bg)
    inner = make_train_step(cfg, sess.obj_mask, jit=False)
    superstep = make_superstep(inner, store, n_per_cls=r, n_bg=r_bg,
                               n_inner=N_INNER, window=True, unroll=unroll)
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
    print(f"unroll={unroll}  {us:9.1f} us/step  "
          f"final_loss={float(m.total):.4f}", flush=True)
    return us


if __name__ == "__main__":
    enable_compilation_cache()
    for u in (1, 2, 4, 1, 2, 4):
        run(u)
