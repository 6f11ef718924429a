"""Throughput benchmark: ray-samples/sec through the full jitted training
step (in-jit 3D sampling + vmapped PE/CodeNeRF fwd+bwd + background model +
AdamW) on one chip.

Baseline: the BASELINE.md north-star target of 10M ray-samples/sec/chip
(the reference publishes no throughput numbers — SURVEY.md §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RAY_SAMPLES_PER_SEC = 10e6


def main():
    from catnerf_tpu.config import Config
    from catnerf_tpu.data.synthetic import make_scene
    from catnerf_tpu.train.loop import TrainingSession
    from catnerf_tpu.train.step import BackgroundBatch, CategoryBatch

    # Replica-room_0-scale workload: 8 categories, 3 instances each,
    # reference ray budget (n_per_optim=120 -> 360 rays/cat/step, 1200 bg).
    cfg = Config()
    cfg.seed = 0
    scene = make_scene(n_frames=4, width=96, height=72, n_categories=8,
                       insts_per_cat=3, seed=0)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)

    n_cls = len(sess.cls_ids)
    r = sess.n_per_cls
    r_bg = cfg.n_per_optim_bg
    samples_per_step = (
        n_cls * r * cfg.bins_per_ray_obj + r_bg * cfg.bins_per_ray_bg
    )

    # Pre-stage a rotation of device batches so host gather isn't timed as
    # part of steady-state device throughput (the buffers live on device in
    # the production loop design).
    batches = []
    for _ in range(8):
        cat_np, bg_np = sess.batcher.next_batch(r, r_bg)
        batches.append((
            CategoryBatch(**{k: jnp.asarray(v) for k, v in cat_np.items()}),
            BackgroundBatch(**{k: jnp.asarray(v) for k, v in bg_np.items()}),
        ))

    key = sess.base_key
    state = sess.state
    # warmup / compile
    for i in range(3):
        cat, bg = batches[i % len(batches)]
        state, metrics = sess.step_fn(state, cat, bg, key)
    jax.block_until_ready(metrics.total)

    n_iters = 200
    t0 = time.perf_counter()
    for i in range(n_iters):
        cat, bg = batches[i % len(batches)]
        state, metrics = sess.step_fn(state, cat, bg, key)
    jax.block_until_ready(metrics.total)
    dt = time.perf_counter() - t0

    steps_per_sec = n_iters / dt
    ray_samples_per_sec = steps_per_sec * samples_per_step

    print(json.dumps({
        "metric": "train_ray_samples_per_sec",
        "value": round(ray_samples_per_sec),
        "unit": "ray-samples/s/chip",
        "vs_baseline": round(ray_samples_per_sec / BASELINE_RAY_SAMPLES_PER_SEC, 3),
        "detail": {
            "steps_per_sec": round(steps_per_sec, 2),
            "samples_per_step": samples_per_step,
            "n_cls": n_cls,
            "rays_per_cat": r,
            "bg_rays": r_bg,
            "device": str(jax.devices()[0]),
            "final_loss": float(metrics.total),
        },
    }))


if __name__ == "__main__":
    main()
