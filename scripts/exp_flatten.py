"""Does flattening the bin axis before PE+MLP avoid XLA's transposed-layout
churn on the 4D tensors?"""
from __future__ import annotations
import time
import jax
import jax.numpy as jnp
from catnerf_tpu.models import codenerf, embedding, occupancy
from catnerf_tpu.models.layers import linear, linear_relu

C, R, B = 8, 360, 10
RB, BB = 1200, 14
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
    print(f"{name:42s} {us:9.1f} us", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    ps = [codenerf.init_params(k, latent_dim=256)
          for k in jax.random.split(key, C)]
    fc = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
    pe = {"B": jnp.stack([embedding.init_params()["B"]] * C)}
    pts4 = jax.random.normal(key, (C, R, B, 3))
    sc = jax.random.normal(jax.random.fold_in(key, 1), (C, R, 256))
    tc = jax.random.normal(jax.random.fold_in(key, 2), (C, R, 256))
    bg_fc = occupancy.init_params(jax.random.PRNGKey(3), hidden_size=128)
    bg_pe = embedding.init_params()
    bg_pts3 = jax.random.normal(jax.random.PRNGKey(4), (RB, BB, 3))

    def fwd_4d(fc, pe, pts4, sc, tc, bg_fc, bg_pe, bg_pts3):
        pe_fn = lambda p, x: embedding.apply(p, x, scale=2.0)
        emb = jax.vmap(pe_fn)(pe, pts4)
        a, c = jax.vmap(codenerf.apply)(fc, emb, sc[:, :, None, :],
                                        tc[:, :, None, :])
        bemb = embedding.apply(bg_pe, bg_pts3, scale=5.0)
        ba, bc = occupancy.apply(bg_fc, bemb)
        return a.sum() + c.sum() + ba.sum() + bc.sum()

    def fwd_flat(fc, pe, pts4, sc, tc, bg_fc, bg_pe, bg_pts3):
        pts3 = pts4.reshape(C, R * B, 3)
        pe_fn = lambda p, x: embedding.apply(p, x, scale=2.0)
        emb = jax.vmap(pe_fn)(pe, pts3)
        scp = jnp.repeat(sc, B, axis=1)
        tcp = jnp.repeat(tc, B, axis=1)
        a, c = jax.vmap(codenerf.apply)(fc, emb, scp, tcp)
        bpts = bg_pts3.reshape(RB * BB, 3)
        bemb = embedding.apply(bg_pe, bpts, scale=5.0)
        ba, bc = occupancy.apply(bg_fc, bemb)
        return a.sum() + c.sum() + ba.sum() + bc.sum()

    args = (fc, pe, pts4, sc, tc, bg_fc, bg_pe, bg_pts3)
    timed(lambda: fwd_4d(*args), "fwd 4D shapes")
    timed(lambda: fwd_flat(*args), "fwd flattened")
    g4 = jax.grad(fwd_4d, argnums=(0, 1, 5, 6))
    gf = jax.grad(fwd_flat, argnums=(0, 1, 5, 6))
    timed(lambda: g4(*args), "fwd+bwd 4D shapes")
    timed(lambda: gf(*args), "fwd+bwd flattened")


if __name__ == "__main__":
    main()
