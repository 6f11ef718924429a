"""Does avoiding the PE's 129-dim concat (feeding t and sin banks as
separate matmul operands with split weights) beat the materialized concat?

Trade: removes the concat copy (~27 us fwd + bwd slices) but adds 4-6
extra smaller matmuls per forward (encoding_xyz, cat_layer, viewdir split
into per-operand parts). The step is op-count-bound, so this can backfire;
measure fwd+bwd of the category branch at production shapes both ways.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

from catnerf_tpu.config import Config
from catnerf_tpu.models import codenerf, embedding
from catnerf_tpu.models.embedding import EMB_SIZE1
from catnerf_tpu.models.layers import linear, linear_relu

C, R, B = 8, 360, 10
LATENT = 256
W = 32


def split_apply(params, t, s, shape_inj, texture_inj):
    """codenerf.apply_with_injections on (t [...,3], s [...,126]) without
    materializing the 129 concat. x1 = [t, s[:84]], x2 = s[84:]."""
    s_low, s_high = s[..., :84], s[..., 84:]
    shape_blocks = len(params["shape_layers"])

    def lin2(p, n_first, a, b, relu=True):
        # p: weights for concat([a(n_first), b]) -> split matmul
        y = (jnp.einsum("...i,io->...o", a, p["w"][:n_first])
             + jnp.einsum("...i,io->...o", b, p["w"][n_first:]) + p["b"])
        return jax.nn.relu(y) if relu else y

    # encoding_xyz: [t(3) | s_low(84)]
    y = lin2(params["encoding_xyz"], 3, t, s_low)
    for j in range(shape_blocks):
        if j == 1:
            y = y + shape_inj[..., shape_blocks * W:]
            # cat_layer: [y(W) | t(3) | s_low(84)]
            p = params["cat_layer"]
            y = jax.nn.relu(
                jnp.einsum("...i,io->...o", y, p["w"][:W])
                + jnp.einsum("...i,io->...o", t, p["w"][W:W + 3])
                + jnp.einsum("...i,io->...o", s_low, p["w"][W + 3:])
                + p["b"])
        y = y + shape_inj[..., j * W:(j + 1) * W]
        y = linear_relu(params["shape_layers"][j], y)
    y = linear(params["encoding_shape"], y)
    sigma = linear(params["sigma"], y) * 10.0
    # viewdir: [y(W) | s_high(42)]
    y = lin2(params["encoding_viewdir"], W, y, s_high)
    for j in range(len(params["texture_layers"])):
        y = y + texture_inj[..., j * W:(j + 1) * W]
        y = linear_relu(params["texture_layers"][j], y)
    rgb = jax.nn.sigmoid(linear(params["rgb_1"], jax.nn.relu(linear(params["rgb_0"], y))))
    return sigma, rgb


def pe_split(params, x, scale):
    t = x / scale
    proj = jnp.dot(t, params["B"].T, precision=jax.lax.Precision.HIGHEST)
    bands = embedding.frequency_bands(0, 5).astype(proj.dtype)
    xb = (proj[..., None, :] * bands[:, None]).reshape(*proj.shape[:-1], -1)
    return t, embedding.sinpi(xb)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    pe_p = jax.vmap(lambda k: embedding.init_params())(ks)
    fc_p = jax.vmap(lambda k: codenerf.init_params(k, latent_dim=LATENT))(ks)
    pts = jax.random.uniform(ks[0], (C, R, B, 3), minval=-1, maxval=1)
    inj_s = jax.random.uniform(ks[1], (C, R, 1, 3 * W))
    inj_t = jax.random.uniform(ks[2], (C, R, 1, W))

    def loss_concat(fc_p, pts):
        emb = jax.vmap(partial(embedding.apply, scale=2.0))(pe_p, pts)
        a, c = jax.vmap(codenerf.apply_with_injections)(fc_p, emb, inj_s, inj_t)
        return a.sum() + c.sum()

    def loss_split(fc_p, pts):
        t, s = jax.vmap(partial(pe_split, scale=2.0))(pe_p, pts)
        a, c = jax.vmap(split_apply)(fc_p, t, s, inj_s, inj_t)
        return a.sum() + c.sum()

    # equivalence
    d = abs(float(loss_concat(fc_p, pts)) - float(loss_split(fc_p, pts)))
    print("abs loss diff:", d)

    for name, fn in (("concat", loss_concat), ("split", loss_split)):
        g = jax.jit(jax.grad(fn))
        r = g(fc_p, pts)
        jax.block_until_ready(r)
        float(jax.tree.reduce(lambda a, x: a + x.sum(), r, jnp.zeros(())))
        t0 = time.perf_counter()
        n = 300
        for _ in range(n):
            r = g(fc_p, pts)
        float(jax.tree.reduce(lambda a, x: a + x.sum(), r, jnp.zeros(())))
        dt = (time.perf_counter() - t0) / n * 1e6
        print(f"{name:8s} fwd+bwd {dt:8.1f} us")


if __name__ == "__main__":
    main()
