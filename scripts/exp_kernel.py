"""Microbench: fused pallas kernels vs XLA chains, forward and backward."""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

from catnerf_tpu.models import codenerf, embedding
from catnerf_tpu.models.layers import linear, linear_relu
from catnerf_tpu.experimental import fused_field

C, N = 8, 2100
N_INNER = 50
N_DISPATCH = 20


def timed(fn, args, name):
    @jax.jit
    def scanned(args):
        def body(c, _):
            out = fn(*args)
            s = jax.tree.reduce(lambda a, x: a + x.sum(), out, jnp.zeros(()))
            return c + s, ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=N_INNER)
        return c

    for _ in range(2):
        out = scanned(args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N_DISPATCH):
        out = scanned(args)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / (N_DISPATCH * N_INNER) * 1e6
    print(f"{name:44s} {us:9.1f} us", flush=True)
    return us


def xla_forward(fc, pe, pts, zs):
    zs0, zc, zs1, zt0 = zs
    emb = jax.vmap(lambda p, x: embedding.apply(p, x, scale=2.0))(pe, pts)

    def one(p, e, z0, z1, z2, z3):
        x1, x2 = e[..., :87], e[..., 87:]
        y = linear_relu(p["encoding_xyz"], x1)
        y = y + z0
        y = linear_relu(p["shape_layers"][0], y)
        y = y + z1
        y = linear_relu(p["cat_layer"], jnp.concatenate([y, x1], axis=-1))
        y = y + z2
        y = linear_relu(p["shape_layers"][1], y)
        y = linear(p["encoding_shape"], y)
        sigma = linear(p["sigma"], y)[..., 0] * 10.0
        y = jnp.concatenate([y, x2], axis=-1)
        y = linear_relu(p["encoding_viewdir"], y)
        y = y + z3
        y = linear_relu(p["texture_layers"][0], y)
        rgb = jax.nn.sigmoid(
            linear(p["rgb_1"], jax.nn.relu(linear(p["rgb_0"], y))))
        return sigma, rgb

    return jax.vmap(one)(fc, emb, zs0, zc, zs1, zt0)


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

    fused = partial(fused_field.codenerf_fused_apply, scale=2.0)

    timed(lambda: xla_forward(fc, pe, pts, zs), (), "xla forward")
    timed(lambda: fused(fc, pe, pts, *zs), (), "fused forward (T~512)")

    def loss_x(fc, pts, zs):
        s, r = xla_forward(fc, pe, pts, zs)
        return jnp.sum(s) + jnp.sum(r)

    def loss_f(fc, pts, zs):
        s, r = fused(fc, pe, pts, *zs)
        return jnp.sum(s) + jnp.sum(r)

    gx = jax.grad(loss_x)
    gf = jax.grad(loss_f)
    timed(lambda: gx(fc, pts, zs), (), "xla fwd+bwd")
    timed(lambda: gf(fc, pts, zs), (), "fused fwd+bwd")


if __name__ == "__main__":
    main()
