"""Experiment: bf16 STORAGE of the sinpi backward residual (cospi).

After bf16 activation storage (exp_bf16_store.py), the largest remaining f32
tensor in the train step is the sinpi custom-JVP's backward residual: the
forward-computed cospi(x) of shape [..., 126] that reverse mode saves to
multiply against the cotangent. exp_band_sinpi.py showed REMATERIALIZING
cospi in the backward loses (op time > saved traffic); this tries the other
trade — keep the single forward computation but store the residual in bf16
(2B instead of 4B per element, no extra ops). Gradient perturbation is
~2^-9 relative on the PE-sin path, the same order as the (gate-neutral)
bf16 activation storage.

Variants:
  f32res   — production sinpi (custom_jvp, f32 cospi residual)
  bf16res  — custom_vjp storing cospi as bf16

Reports us/step on the production superstep shape + final loss (drift check).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from catnerf_tpu.config import Config
from catnerf_tpu.data.device_buffer import build_device_store, make_superstep
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.models import embedding
from catnerf_tpu.train.loop import TrainingSession
from catnerf_tpu.train.step import make_train_step
from catnerf_tpu.utils import enable_compilation_cache

N_INNER = 100
N_DISPATCH = 8

_SINPI_F32 = embedding.sinpi


@jax.custom_vjp
def sinpi_bf16res(x):
    return _SINPI_F32(x)


def _fwd(x):
    r, sign = embedding._reduce_half(x)
    u = r * r
    s0, s1, s2, s3, s4 = embedding._SINPI_C
    c0, c1, c2, c3, c4 = embedding._COSPI_C
    sin = sign * r * (s0 + u * (s1 + u * (s2 + u * (s3 + u * s4))))
    cos = sign * (c0 + u * (c1 + u * (c2 + u * (c3 + u * c4))))
    return sin, cos.astype(jnp.bfloat16)


def _bwd(res, g):
    return ((jnp.pi * res.astype(jnp.float32)) * g,)


sinpi_bf16res.defvjp(_fwd, _bwd)


def set_variant(bf16res: bool):
    embedding.sinpi = sinpi_bf16res if bf16res else _SINPI_F32


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
    for name, bf16res in [("f32res", False), ("bf16res", True)]:
        set_variant(bf16res)
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
        print(f"{name:9s} {us:8.1f} us/step   loss@{(3+N_DISPATCH)*N_INNER}"
              f"steps = {final_loss:.6f}", flush=True)

    base = results["f32res"]
    print(f"bf16res   {100*(base-results['bf16res'])/base:+.1f}% vs f32res")
    set_variant(False)


if __name__ == "__main__":
    main()
