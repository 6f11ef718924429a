"""Measurement backing the packed one-transfer parity staging (r2).

Same-process A/B of the per-step host-staged loop (the reference's
execution shape, ref: train.py:98-201): per-field `jnp.asarray` staging
(~11 H2D transfers/step) vs `train/packing.py`'s single flat-f32-buffer
transfer, both pipelined one step ahead on a worker thread.

Result on the v5e via the axon tunnel (2026-08, 3 trials):
  per-field  10.1 - 13.1 ms/step
  packed      5.7 -  6.5 ms/step   (~1.8x; adopted in TrainingSession)
Pre-staged dispatch ceiling is ~2.4 ms (bench.py steps_per_sec_parity);
the residual is transfer/dispatch serialization on the tunnel — a deeper
prefetch queue does not remove it. Single-process absolute readings vary
~2x with tunnel state; only same-process A/Bs are comparable.

Usage: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/exp_packed_staging.py
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp

from catnerf_tpu.config import Config
from catnerf_tpu.utils import enable_compilation_cache

enable_compilation_cache()
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.train import packing
from catnerf_tpu.train.loop import TrainingSession
from catnerf_tpu.train.step import BackgroundBatch, CategoryBatch

N = 150


def main():
    cfg = Config()
    cfg.seed = 0
    scene = make_scene(n_frames=4, width=96, height=72, n_categories=8,
                       insts_per_cat=3, seed=0)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    pool = ThreadPoolExecutor(max_workers=1)

    def stage_fields():
        cat_np, bg_np = sess.batcher.next_batch(sess.n_per_cls,
                                                cfg.n_per_optim_bg)
        return (CategoryBatch(**{k: jnp.asarray(v) for k, v in cat_np.items()}),
                BackgroundBatch(**{k: jnp.asarray(v) for k, v in bg_np.items()}))

    def stage_packed():
        cat_np, bg_np = sess.batcher.next_batch(sess.n_per_cls,
                                                cfg.n_per_optim_bg)
        return jax.device_put(packing.pack(sess._pack_spec, cat_np, bg_np))

    def run_loop(stage, step, state, unpacks):
        fut = pool.submit(stage)
        key = sess.base_key
        m = None
        for _ in range(5):  # warm: compile + tunnel settle
            batch, fut = fut.result(), pool.submit(stage)
            state, m = step(state, *(batch if unpacks else (batch,)), key)
        float(m.total)  # honest sync (CLAUDE.md: block_until_ready lies here)
        t0 = time.perf_counter()
        for _ in range(N):
            batch, fut = fut.result(), pool.submit(stage)
            state, m = step(state, *(batch if unpacks else (batch,)), key)
        float(m.total)
        dt = (time.perf_counter() - t0) / N * 1e3
        fut.result()
        return dt

    state0 = jax.tree.map(jnp.copy, sess.state)
    packed_step = sess._build_packed_step()
    for trial in range(3):
        d_f = run_loop(stage_fields, sess.step_fn,
                       jax.tree.map(jnp.copy, state0), unpacks=True)
        d_p = run_loop(stage_packed, packed_step,
                       jax.tree.map(jnp.copy, state0), unpacks=False)
        print(f"trial {trial}: per-field {d_f:6.2f} ms/step | "
              f"packed {d_p:6.2f} ms/step")


if __name__ == "__main__":
    main()
