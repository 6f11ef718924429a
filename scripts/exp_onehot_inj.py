"""Experiment: one-hot-matmul vs gather for the per-ray latent injections.

The per-op trace (exp_trace_ops.py) showed the transpose of the injection
gathers — an XLA scatter-add of [c*r, 96]/[c*r, 32] gradient rows into the
[c, max_obj, w] tables — costing 43 us of the ~521 us step (fusion.1024 +
fusion.1031, kCustom scatter with 524 KB scoped memory). Replacing
jnp.take with a one-hot einsum turns that transpose into a tiny MXU
matmul. Forward values are bit-identical (one 1.0 per row, HIGHEST
precision); bf16-mode gradients accumulate in f32 instead of bf16
scatter-adds (more accurate, goldens regenerated).

Variants:
  take    — jnp.take per-ray gather (r1/r2 production)
  onehot  — one-hot einsum (train/step.py::_gather_injections)

Same-process A/B on the production superstep shape.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from catnerf_tpu.config import Config
from catnerf_tpu.data.device_buffer import build_device_store, make_superstep
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.train import step as step_mod
from catnerf_tpu.train.loop import TrainingSession
from catnerf_tpu.train.step import make_train_step
from catnerf_tpu.utils import enable_compilation_cache

N_INNER = 100
N_DISPATCH = 8

_ONEHOT = step_mod._gather_injections


def _gather_take(inj_s_inst, inj_t_inst, obj_indices):
    take = jax.vmap(lambda z, i: jnp.take(z, i, axis=0))
    return take(inj_s_inst, obj_indices), take(inj_t_inst, obj_indices)


def main():
    enable_compilation_cache()
    cfg = Config()
    cfg.seed = 0
    scene = make_scene(n_frames=4, width=96, height=72, n_categories=8,
                       insts_per_cat=3, seed=0)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    store = build_device_store(sess.categories, sess.background,
                               window_pad=sess.n_per_cls,
                               bg_window_pad=cfg.n_per_optim_bg)
    state0 = jax.tree.map(jnp.copy, sess.state)

    results = {}
    for name, fn in [("take", _gather_take), ("onehot", _ONEHOT)]:
        step_mod._gather_injections = fn
        inner = make_train_step(cfg, sess.obj_mask, jit=False)
        superstep = make_superstep(inner, store, n_per_cls=sess.n_per_cls,
                                   n_bg=cfg.n_per_optim_bg, n_inner=N_INNER,
                                   window=True)
        state = jax.tree.map(jnp.copy, state0)
        key = jax.random.PRNGKey(0)
        for _ in range(3):
            key, k = jax.random.split(key)
            state, m = superstep(state, k)
        float(m.total)  # honest sync (axon: block_until_ready lies)
        t0 = time.perf_counter()
        for _ in range(N_DISPATCH):
            key, k = jax.random.split(key)
            state, m = superstep(state, k)
        final_loss = float(m.total)
        dt = time.perf_counter() - t0
        us = dt / (N_DISPATCH * N_INNER) * 1e6
        results[name] = us
        print(f"{name:7s} {us:8.1f} us/step   loss@{(3+N_DISPATCH)*N_INNER}"
              f"steps = {final_loss:.6f}", flush=True)

    step_mod._gather_injections = _ONEHOT
    base = results["take"]
    print(f"onehot  {100*(base-results['onehot'])/base:+.1f}% vs take")


if __name__ == "__main__":
    main()
