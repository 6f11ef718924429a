"""Background OccupancyMap: fused v1 kernel vs XLA, fwd and fwd+bwd."""
from __future__ import annotations
import time
import jax
import jax.numpy as jnp
from catnerf_tpu.models import embedding, occupancy
from catnerf_tpu.experimental import fused_field

N = 16800
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


def main():
    fc = occupancy.init_params(jax.random.PRNGKey(0), hidden_size=128)
    pe = embedding.init_params()
    pts = jax.random.normal(jax.random.PRNGKey(1), (N, 3)) * 2.0

    def xla_fwd(fc, pts):
        emb = embedding.apply(pe, pts, scale=5.0)
        a, c = occupancy.apply(fc, emb)
        return a[..., 0], c

    def fused_fwd(fc, pts):
        return fused_field.occupancy_fused_apply(fc, pe, pts, scale=5.0)

    timed(lambda: xla_fwd(fc, pts), "xla bg forward")
    timed(lambda: fused_fwd(fc, pts), "fused bg forward (v1)")

    def loss_x(fc, pts):
        a, c = xla_fwd(fc, pts)
        return jnp.sum(a * a) + jnp.sum(c)

    def loss_f(fc, pts):
        a, c = fused_fwd(fc, pts)
        return jnp.sum(a * a) + jnp.sum(c)

    gx = jax.grad(loss_x)
    gf = jax.grad(loss_f)
    timed(lambda: gx(fc, pts), "xla bg fwd+bwd")
    timed(lambda: gf(fc, pts), "fused bg fwd+bwd (v1)")


if __name__ == "__main__":
    main()
