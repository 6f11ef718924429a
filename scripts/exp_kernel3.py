"""Packed-ensemble kernel vs XLA, forward and fwd+bwd, on TPU."""
from __future__ import annotations
import time
import jax
import jax.numpy as jnp
from catnerf_tpu.models import codenerf, embedding
from catnerf_tpu.models.layers import linear, linear_relu
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


def xla_forward(fc, pe, pts, zs):
    zs0, zc, zs1, zt0 = zs
    emb = jax.vmap(lambda p, x: embedding.apply(p, x, scale=2.0))(pe, pts)
    def one(p, e, z0, z1, z2, z3):
        x1, x2 = e[..., :87], e[..., 87:]
        y = linear_relu(p["encoding_xyz"], x1)
        y = y + z0; y = linear_relu(p["shape_layers"][0], y)
        y = y + z1
        y = linear_relu(p["cat_layer"], jnp.concatenate([y, x1], axis=-1))
        y = y + z2; y = linear_relu(p["shape_layers"][1], y)
        y = linear(p["encoding_shape"], y)
        sigma = linear(p["sigma"], y)[..., 0] * 10.0
        y = jnp.concatenate([y, x2], axis=-1)
        y = linear_relu(p["encoding_viewdir"], y)
        y = y + z3; y = linear_relu(p["texture_layers"][0], y)
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
    pts_p = jnp.swapaxes(pts, 0, 1).reshape(N, C * 3)
    zs_p = tuple(jnp.swapaxes(z, 0, 1).reshape(N, C * 32) for z in zs)

    timed(lambda: xla_forward(fc, pe, pts, zs), "xla forward")
    for T in (128, 256, 384):
        timed(lambda T=T: fused_field.codenerf_packed_apply(
            fc, pe, pts_p, *zs_p, scale=2.0, tile=T),
            f"packed forward T={T}")

    def loss_x(fc, pts, zs):
        s, r = xla_forward(fc, pe, pts, zs)
        return jnp.sum(s * s) + jnp.sum(r)

    def loss_p(fc, pts_p, zs_p, T):
        s, r = fused_field.codenerf_packed_apply(
            fc, pe, pts_p, *zs_p, scale=2.0, tile=T)
        return jnp.sum(s * s) + jnp.sum(r)

    gx = jax.grad(loss_x)
    timed(lambda: gx(fc, pts, zs), "xla fwd+bwd")
    for T in (128, 256, 384):
        gp = jax.grad(lambda fc, T=T: loss_p(fc, pts_p, zs_p, T))
        timed(lambda gp=gp: gp(fc), f"packed fwd+bwd T={T}")


if __name__ == "__main__":
    main()
