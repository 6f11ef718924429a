"""Fused Pallas PE+MLP kernels vs the pure-XLA reference modules.

Runs in interpret mode on the CPU test mesh; the same kernels compile for
TPU in production (bench.py exercises that path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catnerf_tpu.config import Config
from catnerf_tpu.models import codenerf, embedding, occupancy
from catnerf_tpu.experimental import fused_field
from catnerf_tpu.train.step import (
    CategoryBatch, BackgroundBatch, category_forward, background_forward,
)


def _stack_params(key, n, init_fn):
    ps = [init_fn(k) for k in jax.random.split(key, n)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *ps)


@pytest.fixture(scope="module")
def cn_setup():
    key = jax.random.PRNGKey(0)
    C, N, L = 3, 100, 64
    fc = _stack_params(
        key, C, lambda k: codenerf.init_params(k, latent_dim=L))
    pe = {"B": jnp.stack([embedding.init_params()["B"]] * C)}
    kp, kz = jax.random.split(jax.random.PRNGKey(1))
    pts = jax.random.normal(kp, (C, N, 3))
    zs = [jax.nn.relu(jax.random.normal(jax.random.fold_in(kz, i),
                                        (C, N, 32)))
          for i in range(4)]
    return fc, pe, pts, zs


def _xla_codenerf(fc, pe, pts, zs, scale):
    """Reference chain with externally supplied latent injections: replicate
    codenerf.apply but adding the given z's (so both paths share them)."""
    zs0, zc, zs1, zt0 = zs
    emb = jax.vmap(lambda p, x: embedding.apply(p, x, scale=scale))(pe, pts)
    from catnerf_tpu.models.layers import linear, linear_relu

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


def test_codenerf_fused_forward_matches_xla(cn_setup):
    fc, pe, pts, zs = cn_setup
    sig_f, rgb_f = fused_field.codenerf_fused_apply(
        fc, pe, pts, *zs, scale=2.0, interpret=True)
    sig_x, rgb_x = _xla_codenerf(fc, pe, pts, zs, 2.0)
    np.testing.assert_allclose(sig_f, sig_x, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(rgb_f, rgb_x, rtol=1e-5, atol=1e-5)


def test_codenerf_fused_grads_match_xla(cn_setup):
    fc, pe, pts, zs = cn_setup

    def loss_fused(fc, peB, pts, zs):
        s, r = fused_field.codenerf_fused_apply(
            fc, {"B": peB}, pts, *zs, scale=2.0, interpret=True)
        return jnp.sum(jnp.sin(s)) + jnp.sum(r * r)

    def loss_xla(fc, peB, pts, zs):
        s, r = _xla_codenerf(fc, {"B": peB}, pts, zs, 2.0)
        return jnp.sum(jnp.sin(s)) + jnp.sum(r * r)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(fc, pe["B"], pts, zs)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(fc, pe["B"], pts, zs)

    # latent-layer grads are zero in the fused path by construction (they
    # flow through the XLA-side z projections); exclude them.
    def strip(g):
        g = dict(g)
        for k in ("shape_latent_layers", "texture_latent_layers",
                  "cat_latent_layer"):
            g.pop(k)
        return g

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4),
        (strip(gf[0]), *gf[1:]), (strip(gx[0]), *gx[1:]))


def test_occupancy_fused_matches_xla():
    key = jax.random.PRNGKey(2)
    fc = occupancy.init_params(key, hidden_size=128)
    pe = embedding.init_params()
    pts = jax.random.normal(jax.random.PRNGKey(3), (77, 3)) * 2.0

    def fused(fc, pe, pts):
        a, c = fused_field.occupancy_fused_apply(
            fc, pe, pts, scale=5.0, interpret=True)
        return a, c

    def xla(fc, pe, pts):
        emb = embedding.apply(pe, pts, scale=5.0)
        a, c = occupancy.apply(fc, emb)
        return a[..., 0], c

    af, cf = fused(fc, pe, pts)
    ax, cx = xla(fc, pe, pts)
    np.testing.assert_allclose(af, ax, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(cf, cx, rtol=1e-5, atol=1e-5)

    def lf(fc, B, pts):
        a, c = fused_field.occupancy_fused_apply(
            fc, {"B": B}, pts, scale=5.0, interpret=True)
        return jnp.sum(jnp.tanh(a)) + jnp.sum(c)

    def lx(fc, B, pts):
        emb = embedding.apply({"B": B}, pts, scale=5.0)
        a, c = occupancy.apply(fc, emb)
        return jnp.sum(jnp.tanh(a[..., 0])) + jnp.sum(c)

    gf = jax.grad(lf, argnums=(0, 1, 2))(fc, pe["B"], pts)
    gx = jax.grad(lx, argnums=(0, 1, 2))(fc, pe["B"], pts)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4),
        gf, gx)


def test_step_forward_fused_vs_xla_paths():
    """category_forward/background_forward agree between fused and XLA paths
    (same RNG key -> identical sampling)."""
    from catnerf_tpu.data.synthetic import make_scene
    from catnerf_tpu.train.loop import TrainingSession

    cfg_f = Config()
    cfg_f.use_fused_kernels = True
    cfg_f.bf16_activations = False  # the fused kernels are exact f32
    cfg_f.net_hyperparams.latent_dim = 32
    cfg_f.hidden_feature_size_bg = 64  # ineligible for bg kernel: exercises mix
    cfg_x = Config(**{**cfg_f.__dict__})
    cfg_x.use_fused_kernels = False

    scene = make_scene(n_frames=2, width=48, height=36, n_categories=2,
                       insts_per_cat=2, seed=0)
    sess = TrainingSession(cfg_f, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    cat_np, bg_np = sess.batcher.next_batch(32, 48)
    cat = CategoryBatch(**{k: jnp.asarray(v) for k, v in cat_np.items()})
    bg = BackgroundBatch(**{k: jnp.asarray(v) for k, v in bg_np.items()})
    key = jax.random.PRNGKey(7)

    # 1e-4: the kernel computes sin(pi*2^f*(t@B^T)) while the XLA path
    # folds the bands into the basis (t@(B^T*w)) — same math, different f32
    # association.
    a_f, c_f, _ = category_forward(sess.state.params, cat, key, cfg_f)
    a_x, c_x, _ = category_forward(sess.state.params, cat, key, cfg_x)
    np.testing.assert_allclose(a_f, a_x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(c_f, c_x, rtol=1e-4, atol=1e-4)

    ab_f, cb_f, _ = background_forward(sess.state.params, bg, key, cfg_f)
    ab_x, cb_x, _ = background_forward(sess.state.params, bg, key, cfg_x)
    np.testing.assert_allclose(ab_f, ab_x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(cb_f, cb_x, rtol=1e-4, atol=1e-4)


def _to_packed(x):
    """[C, N, k] -> [N, C*k]."""
    C, N, k = x.shape
    return jnp.swapaxes(x, 0, 1).reshape(N, C * k)


def test_codenerf_packed_forward_matches_xla(cn_setup):
    fc, pe, pts, zs = cn_setup
    C, N, _ = pts.shape
    sig_p, rgb_p = fused_field.codenerf_packed_apply(
        fc, pe, _to_packed(pts), *[_to_packed(z) for z in zs],
        scale=2.0, tile=32, interpret=True)
    sig_x, rgb_x = _xla_codenerf(fc, pe, pts, zs, 2.0)
    np.testing.assert_allclose(jnp.swapaxes(sig_p, 0, 1), sig_x,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(jnp.swapaxes(rgb_p, 0, 1), rgb_x,
                               rtol=1e-5, atol=1e-5)


def test_codenerf_packed_grads_match_xla(cn_setup):
    fc, pe, pts, zs = cn_setup

    def loss_packed(fc, peB, pts, zs):
        s, r = fused_field.codenerf_packed_apply(
            fc, {"B": peB}, _to_packed(pts), *[_to_packed(z) for z in zs],
            scale=2.0, tile=32, interpret=True)
        return jnp.sum(jnp.sin(s)) + jnp.sum(r * r)

    def loss_xla(fc, peB, pts, zs):
        s, r = _xla_codenerf(fc, {"B": peB}, pts, zs, 2.0)
        return jnp.sum(jnp.sin(s)) + jnp.sum(r * r)

    gp = jax.grad(loss_packed, argnums=(0, 1, 2, 3))(fc, pe["B"], pts, zs)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(fc, pe["B"], pts, zs)

    def strip(g):
        g = dict(g)
        for k in ("shape_latent_layers", "texture_latent_layers",
                  "cat_latent_layer"):
            g.pop(k)
        return g

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4),
        (strip(gp[0]), *gp[1:]), (strip(gx[0]), *gx[1:]))
