"""Microbenchmark: XLA sin(pi*x) vs range-reduced odd-polynomial sinpi.

The PE embedding evaluates ~5.7M sin(pi * band * proj) per train step
(fwd + the cos in bwd); the trace shows those fusions are ~40% of step
time. sin(pi*x) admits exact range reduction (r = x - round(x), sign by
parity) + a degree-9 minimax polynomial (max err 3.4e-9), far cheaper
than XLA's general-argument sin.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from catnerf_tpu.models.embedding import sinpi  # the candidate


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
    print(f"{name:22s} fwd {fwd:8.1f} us   grad {bwd:8.1f} us")


def main():
    key = jax.random.PRNGKey(0)
    # step-shaped: 45.6k points x 126 band-projections, args up to ~2^5*2
    x = jax.random.uniform(key, (45600, 126), minval=-64.0, maxval=64.0)
    bench(lambda v: jnp.sin(jnp.pi * v), x, "jnp.sin(pi*x)")
    bench(sinpi, x, "poly sinpi")
    # accuracy
    d = jnp.abs(sinpi(x) - jnp.sin(jnp.pi * x.astype(jnp.float64) if False else jnp.pi * x))
    print("max |poly - xla sin| on step-shaped args:", float(d.max()))


if __name__ == "__main__":
    main()
