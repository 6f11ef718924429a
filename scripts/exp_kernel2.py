"""Isolate fused-kernel slowness: tile size vs in-kernel PE relayouts."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from catnerf_tpu.models import codenerf, embedding
from catnerf_tpu.experimental import fused_field

C, N = 8, 2100
N_INNER = 50
N_DISPATCH = 20


def timed(fn, name):
    @jax.jit
    def scanned(_):
        def body(c, _):
            out = fn()
            s = jax.tree.reduce(lambda a, x: a + x.sum(), out, jnp.zeros(()))
            return c + s, ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=N_INNER)
        return c

    for _ in range(2):
        out = scanned(0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N_DISPATCH):
        out = scanned(0)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / (N_DISPATCH * N_INNER) * 1e6
    print(f"{name:46s} {us:9.1f} us", flush=True)
    return us


def main():
    key = jax.random.PRNGKey(0)
    ps = [codenerf.init_params(k, latent_dim=32)
          for k in jax.random.split(key, C)]
    fc = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
    pe = {"B": jnp.stack([embedding.init_params()["B"]] * C)}
    pts = jax.random.normal(key, (C, N, 3))
    zs = tuple(
        jax.nn.relu(jax.random.normal(jax.random.fold_in(key, i), (C, N, 32)))
        for i in range(4))

    # --- variant A: current kernel, default tile (~424)
    f = fused_field._make_codenerf_fused(2.0, False)
    timed(lambda: f(fc, pe["B"], pts, *zs), "fused fwd tile~424 (grid 8x5)")

    # --- variant B: single tile per category (grid 8x1)
    orig = fused_field._pick_tile
    fused_field._make_codenerf_fused.cache_clear()
    fused_field._pick_tile = lambda n, target=512: -(-(-(-n // 2)) // 8) * 8
    fB = fused_field._make_codenerf_fused(2.0, False)
    timed(lambda: fB(fc, pe["B"], pts, *zs), "fused fwd tile=N/2 (grid 8x2)")
    fused_field._pick_tile = orig
    fused_field._make_codenerf_fused.cache_clear()

    # --- variant C: MLP-only kernel (emb precomputed in XLA, aligned slices)
    T = 424
    Np = -(-N // T) * T
    nt = Np // T

    Wl, bl = fused_field._cn_param_arrays(fc)

    def mlp_kernel(*refs):
        refs = iter(refs)
        emb1 = next(refs)[0]
        emb2p = next(refs)[0]  # [T, 48] (42 padded to 48)
        zs0, zc, zs1, zt0 = (next(refs)[0] for _ in range(4))
        W = {k: next(refs)[0] for k in fused_field._CN_WKEYS}
        b = {k: next(refs)[:].reshape(1, -1) for k in fused_field._CN_WKEYS}
        out_ref = next(refs)
        emb2 = emb2p[:, :42]
        sg, color, _ = fused_field._codenerf_chain(
            emb1, emb2, zs0, zc, zs1, zt0, W, b)
        out_ref[0] = jnp.concatenate([sg, color], axis=1)

    def row_spec(f):
        return pl.BlockSpec((1, T, f), lambda c, t: (c, t, 0),
                            memory_space=pltpu.VMEM)

    def par_spec(a):
        return pl.BlockSpec((1,) + a.shape[1:],
                            lambda c, t: (c,) + (0,) * (a.ndim - 1),
                            memory_space=pltpu.VMEM)

    def mlp_only(fc, pts, zs):
        emb = jax.vmap(lambda p, x: embedding.apply(p, x, scale=2.0))(pe, pts)
        emb1 = emb[..., :87]
        emb2 = jnp.pad(emb[..., 87:], ((0, 0), (0, 0), (0, 6)))
        emb1 = fused_field._pad_rows(emb1, Np)
        emb2 = fused_field._pad_rows(emb2, Np)
        zsp = [fused_field._pad_rows(z, Np) for z in zs]
        Wl, bl = fused_field._cn_param_arrays(fc)
        out = pl.pallas_call(
            mlp_kernel,
            grid=(C, nt),
            in_specs=([row_spec(87), row_spec(48)] + [row_spec(32)] * 4 +
                      [par_spec(w) for w in Wl] + [par_spec(b) for b in bl]),
            out_specs=row_spec(4),
            out_shape=jax.ShapeDtypeStruct((C, Np, 4), jnp.float32),
        )(emb1, emb2, *zsp, *Wl, *bl)
        return out[:, :N, 0], out[:, :N, 1:]

    timed(lambda: mlp_only(fc, pts, zs), "xla-PE + fused MLP (grid 8x5)")


if __name__ == "__main__":
    main()
