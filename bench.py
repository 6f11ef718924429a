"""Throughput benchmark: ray-samples/sec through the full training step on
one chip (in-jit 3D sampling + vmapped PE/CodeNeRF fwd+bwd + background
model + AdamW).

Two modes are measured:
  * parity   — per-dispatch single step with host-staged batches (the
               reference's execution shape, ref: train.py:98-201)
  * superstep — production fast path: device-resident ray buffers, on-device
               batch sampling, lax.scan over inner steps (one dispatch per
               N steps)

Headline metric = superstep mode. Baseline: the BASELINE.md north-star of
10M ray-samples/sec/chip (the reference publishes no throughput numbers —
SURVEY.md §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax

BASELINE_RAY_SAMPLES_PER_SEC = 10e6
N_INNER = 100  # matches train.py's production dispatch shape (log_iter)


def main():
    from catnerf_tpu.config import Config
    from catnerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from catnerf_tpu.data.synthetic import make_scene
    from catnerf_tpu.train.loop import TrainingSession

    # Replica-room_0-scale workload: 8 categories, 3 instances each,
    # reference ray budget (n_per_optim=120, 1200 bg rays).
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

    # ---------------- superstep (device buffers, scan over inner steps)
    # Each mode gets its own copy of the initial state: the jitted steps
    # donate their state argument, which would delete sess.state's buffers
    # out from under the other mode.
    import jax.numpy as jnp

    state0 = jax.tree.map(jnp.copy, sess.state)
    # measure the PRODUCTION fast path, not a re-assembled copy of it: a
    # drift in the store/superstep recipe must show up in the benchmark
    sess.enable_fast_path(N_INNER)
    superstep = sess._superstep
    state = jax.tree.map(jnp.copy, state0)
    key = sess.base_key
    for i in range(2):  # compile + warmup
        key, k = jax.random.split(key)
        state, metrics = superstep(state, k)
    float(metrics.total)  # honest sync: on the axon platform
    # block_until_ready can return before the computation finishes
    # (CLAUDE.md); only a device->host transfer is a reliable barrier

    n_dispatch = 8
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        key, k = jax.random.split(key)
        state, metrics = superstep(state, k)
    float(metrics.total)
    dt = time.perf_counter() - t0
    steps_per_sec = n_dispatch * N_INNER / dt
    ray_samples_per_sec = steps_per_sec * samples_per_step

    # ---------------- parity mode (host-staged single-step dispatches)
    from catnerf_tpu.train.step import BackgroundBatch, CategoryBatch

    batches = []
    for _ in range(8):
        cat_np, bg_np = sess.batcher.next_batch(r, r_bg)
        batches.append((
            CategoryBatch(**{k2: jnp.asarray(v) for k2, v in cat_np.items()}),
            BackgroundBatch(**{k2: jnp.asarray(v) for k2, v in bg_np.items()}),
        ))
    pstate = jax.tree.map(jnp.copy, state0)
    for i in range(3):
        cat, bg = batches[i % 8]
        pstate, pm = sess.step_fn(pstate, cat, bg, key)
    float(pm.total)
    n_iters = 100
    t0 = time.perf_counter()
    for i in range(n_iters):
        cat, bg = batches[i % 8]
        pstate, pm = sess.step_fn(pstate, cat, bg, key)
    float(pm.total)
    parity_sps = n_iters / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "train_ray_samples_per_sec",
        "value": round(ray_samples_per_sec),
        "unit": "ray-samples/s/chip",
        "vs_baseline": round(ray_samples_per_sec / BASELINE_RAY_SAMPLES_PER_SEC, 3),
        "detail": {
            "steps_per_sec_superstep": round(steps_per_sec, 2),
            "steps_per_sec_parity": round(parity_sps, 2),
            "samples_per_step": samples_per_step,
            "n_cls": n_cls,
            "rays_per_cat": r,
            "bg_rays": r_bg,
            "n_inner": N_INNER,
            "device": str(jax.devices()[0]),
            "final_loss": float(metrics.total),
        },
    }))


if __name__ == "__main__":
    main()
