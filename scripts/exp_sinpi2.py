"""Variants of fast sinpi: sign via mod/select vs bitwise xor vs
half-angle (no sign logic, higher-degree poly)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from catnerf_tpu.models.embedding import sinpi

C = (3.1415925801, -5.1677068823, 2.5500314321,
     -5.9804549862e-01, 7.7220761261e-02)


def sinpi_bits(x):
    n = jnp.round(x)
    r = x - n
    u = r * r
    c0, c1, c2, c3, c4 = C
    p = c0 + u * (c1 + u * (c2 + u * (c3 + u * c4)))
    y = r * p
    parity = jnp.bitwise_and(n.astype(jnp.int32), 1)
    bits = jax.lax.bitcast_convert_type(y, jnp.int32)
    bits = jnp.bitwise_xor(bits, parity << 31)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


# sin(2*pi*s) on s in [-1/2, 1/2], odd degree 15 (fit below)
def fit_half():
    s = np.linspace(1e-9, 0.5, 40001)
    u = s * s
    A = np.stack([s * u**k for k in range(8)], axis=1)
    y = np.sin(2 * np.pi * s)
    w = np.ones_like(s)
    for _ in range(80):
        c, *_ = np.linalg.lstsq(A * w[:, None], y * w, rcond=None)
        err = A @ c - y
        w *= (1e-12 + np.abs(err)) ** 0.5
        w /= w.max()
    c, *_ = np.linalg.lstsq(A * w[:, None], y * w, rcond=None)
    print("half-angle deg15 max err:", np.abs(A @ c - y).max())
    return c


C2 = fit_half()


def sinpi_half(x):
    h = 0.5 * x
    s = h - jnp.round(h)
    u = s * s
    p = C2[7]
    for k in range(6, -1, -1):
        p = C2[k] + u * p
    return s * p


def bench(fn, x, name, n=200):
    f = jax.jit(lambda x: fn(x).sum())
    g = jax.jit(jax.grad(lambda x: fn(x).sum()))
    float(f(x)); float(g(x).sum())
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(x)
    float(y)
    fwd = (time.perf_counter() - t0) / n * 1e6
    t0 = time.perf_counter()
    for _ in range(n):
        y = g(x)
    float(y.sum())
    bwd = (time.perf_counter() - t0) / n * 1e6
    err = float(jnp.abs(fn(x) - jnp.sin(jnp.pi * x)).max())
    print(f"{name:22s} fwd {fwd:8.1f} us   grad {bwd:8.1f} us   maxerr {err:.2e}")


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (45600, 126), minval=-64.0, maxval=64.0)
    bench(lambda v: jnp.sin(jnp.pi * v), x, "jnp.sin(pi*x)")
    bench(sinpi, x, "sinpi (mod/select)")
    bench(sinpi_bits, x, "sinpi (bitwise sign)")
    bench(sinpi_half, x, "sinpi (half-angle d15)")


if __name__ == "__main__":
    main()
