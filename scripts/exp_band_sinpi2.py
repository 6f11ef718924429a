"""A/B (NEGATIVE result, kept as the record): band_sinpi custom_vjp that
KEEPS the cospi residual but contracts the backward straight to [..., 21].

Measured (v5e, 2026-08-19): fused 716.1/712.6 us/step vs production
470.5/464.9 — 52% SLOWER. The custom_vjp boundary forces the forward to
materialise BOTH big tensors (sin [..,126] bf16-cast downstream + the
pi*bands*cospi residual [..,6,21] f32) as fusion outputs and blocks XLA
from interleaving the PE forward with its consumers; that costs far more
than the 27.5 us layout copy it was meant to save. With exp_band_sinpi
(remat) and exp_sinpi_res (bf16 residual) this settles the PE backward
from all three directions — the custom_jvp + XLA default is the optimum.
Do not re-try.

exp_band_sinpi.py (negative) rematerialised cospi in the backward to
shrink the residual — remat op time beat the saved traffic. This variant
attacks the OTHER side of the chain, keeping the forward identical:

  production backward: mul fusion writes pi*cospi*g as f32 [..., 126]
  (36 us), XLA inserts a 27.5 us LAYOUT COPY of that tensor, then a
  multiply-reduce contracts it to [..., 21]. ~4 x 14.5 MB of avoidable
  HBM round-trips per step.

  here: residual = pi*bands*cospi(xb) (f32 [..., 126], already computed
  by the forward linearisation today), backward = one fused
  multiply-reduce (res * g -> sum over the 6 freqs) emitting [..., 21]
  directly — nothing 126-wide is materialised in the backward.

Variants:
  prod    — embedding.apply as shipped (sinpi custom_jvp)
  fusedbw — band_sinpi_res custom_vjp (this experiment)
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
N_DISPATCH = 12


def _band_expand(proj, bands):
    xb = proj[..., None, :] * bands[:, None]
    return xb.reshape(*proj.shape[:-1], bands.shape[0] * proj.shape[-1])


@jax.custom_vjp
def band_sinpi_res(proj, bands):
    return embedding.sinpi(_band_expand(proj, bands))


def _fwd(proj, bands):
    xb = proj[..., None, :] * bands[:, None]
    r, sign = embedding._reduce_half(xb)
    u = r * r
    s0, s1, s2, s3, s4 = embedding._SINPI_C
    c0, c1, c2, c3, c4 = embedding._COSPI_C
    sin = sign * r * (s0 + u * (s1 + u * (s2 + u * (s3 + u * s4))))
    cos = sign * (c0 + u * (c1 + u * (c2 + u * (c3 + u * c4))))
    res = (jnp.pi * bands[:, None]) * cos  # [..., n_freqs, 21]
    flat = sin.reshape(*proj.shape[:-1], -1)
    return flat, res


def _bwd(res, dy):
    n_freqs, d = res.shape[-2:]
    dyr = dy.reshape(*dy.shape[:-1], n_freqs, d)
    return (res * dyr).sum(axis=-2), None


band_sinpi_res.defvjp(_fwd, _bwd)

_orig_apply = embedding.apply


def fused_apply(params, x, *, scale, max_deg=embedding.DEFAULT_MAX_DEG,
                act_dtype=None):
    t = x / scale
    proj = jnp.dot(t, params["B"].T, precision=jax.lax.Precision.HIGHEST)
    bands = embedding.frequency_bands(0, max_deg).astype(proj.dtype)
    emb = jnp.concatenate([t, band_sinpi_res(proj, bands)], axis=-1)
    return emb if act_dtype is None else emb.astype(act_dtype)


def run(fused: bool) -> float:
    embedding.apply = fused_apply if fused else _orig_apply
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
                               n_inner=N_INNER, window=True)
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
    print(f"fusedbw={fused}  {us:9.1f} us/step  "
          f"final_loss={float(m.total):.4f}", flush=True)
    return us


if __name__ == "__main__":
    enable_compilation_cache()
    for fused in (False, True, False, True):
        run(fused)
