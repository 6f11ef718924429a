"""Experiment: bf16 STORAGE of inter-fusion activations (not matmul precision).

exp_bf16.py showed bf16 matmul inputs gain nothing — XLA's default f32 matmul
already truncates inputs to bf16 in-fusion. But the step is per-sample
HBM-traffic-bound (CLAUDE.md), and the f32 activations/embeddings are that
traffic: each fusion boundary writes f32 and the next reads f32. Storing the
PE output and the ReLU activations in bf16 halves that boundary traffic while
the next matmul would truncate to bf16 anyway (only extra cost: one double
rounding). Params, code tables, sigma/rgb heads, render math and losses stay
f32.

Variants:
  f32            — production baseline
  emb_bf16       — embedding.apply output cast to bf16
  act_bf16       — linear_relu outputs cast to bf16
  emb+act_bf16   — both

Reports us/step on the production superstep shape + final loss (drift check).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from catnerf_tpu.config import Config
from catnerf_tpu.data.device_buffer import build_device_store, make_superstep
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.models import codenerf, embedding, occupancy
from catnerf_tpu.models.layers import linear_relu as _linear_relu_f32
from catnerf_tpu.train.loop import TrainingSession
from catnerf_tpu.train.step import make_train_step
from catnerf_tpu.utils import enable_compilation_cache

N_INNER = 100
N_DISPATCH = 8

_EMB_APPLY_F32 = embedding.apply


def _linear_relu_bf16(p, x):
    return _linear_relu_f32(p, x).astype(jnp.bfloat16)


def _emb_apply_bf16(*a, **k):
    return _EMB_APPLY_F32(*a, **k).astype(jnp.bfloat16)


def set_variant(emb_bf16: bool, act_bf16: bool):
    # patch the names each consumer module resolved at import time
    lr = _linear_relu_bf16 if act_bf16 else _linear_relu_f32
    codenerf.linear_relu = lr
    occupancy.linear_relu = lr
    embedding.apply = _emb_apply_bf16 if emb_bf16 else _EMB_APPLY_F32
    import catnerf_tpu.train.step as step_mod
    step_mod.embedding.apply = embedding.apply


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
    for name, emb_b, act_b in [
        ("f32", False, False),
        ("emb_bf16", True, False),
        ("act_bf16", False, True),
        ("emb+act_bf16", True, True),
    ]:
        set_variant(emb_b, act_b)
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
        print(f"{name:14s} {us:8.1f} us/step   loss@{(3+N_DISPATCH)*N_INNER}"
              f"steps = {final_loss:.6f}", flush=True)

    base = results["f32"]
    for k, v in results.items():
        if k != "f32":
            print(f"{k:14s} {100*(base-v)/base:+.1f}% vs f32")
    set_variant(False, False)


if __name__ == "__main__":
    main()
