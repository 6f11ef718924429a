"""A/B (NEGATIVE result, kept as the record): fused band_sinpi custom_vjp
vs the production sinpi custom_jvp on the production windowed superstep.

Hypothesis: under reverse-mode AD the sinpi custom_jvp makes XLA carry a
full-width residual ([..., (max_deg+1)*21] f32, ~23 MB/step at bench scale;
the fwd residual copy traced at ~27 us/step at embedding.py:122), so a
custom_vjp over the whole band expansion that saves only the [..., 21]
projection (6x smaller) and rematerialises xb + cospi inside the backward
fusion should cut ~50-80 us/step.

Measured (v5e, 2026-08-18): fused 597.6/595.3 us/step vs unfused
592.1/591.9 — the "fix" is ~0.7% SLOWER. The step is op-count-bound, not
residual-traffic-bound (consistent with the jax.checkpoint negative in
CLAUDE.md): XLA already overlaps the residual copy, and the rematerialised
band-expand + cospi in the backward adds more op time than the saved HBM
traffic. Do not re-try.
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

N_INNER = 100
N_DISPATCH = 12


def _band_expand(proj, bands):
    xb = proj[..., None, :] * bands[:, None]
    return xb.reshape(*proj.shape[:-1], bands.shape[0] * proj.shape[-1])


@jax.custom_vjp
def band_sinpi(proj, bands):
    return embedding.sinpi(_band_expand(proj, bands))


def _band_sinpi_fwd(proj, bands):
    return band_sinpi(proj, bands), (proj, bands)


def _band_sinpi_bwd(res, dy):
    proj, bands = res
    dyr = dy.reshape(*proj.shape[:-1], bands.shape[0], proj.shape[-1])
    xb = proj[..., None, :] * bands[:, None]
    d = (jnp.pi * bands[:, None]) * embedding.cospi(xb) * dyr
    return d.sum(axis=-2), jnp.zeros_like(bands)


band_sinpi.defvjp(_band_sinpi_fwd, _band_sinpi_bwd)

_orig_apply = embedding.apply


def fused_apply(params, x, *, scale, max_deg=embedding.DEFAULT_MAX_DEG):
    t = x / scale
    proj = jnp.dot(t, params["B"].T, precision=jax.lax.Precision.HIGHEST)
    bands = embedding.frequency_bands(0, max_deg).astype(proj.dtype)
    return jnp.concatenate([t, band_sinpi(proj, bands)], axis=-1)


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
    print(f"band_sinpi_fused={fused}  {us:9.1f} us/step  "
          f"final_loss={float(m.total):.4f}")
    return us


if __name__ == "__main__":
    for fused in (False, True, False, True):
        run(fused)
