"""Packed one-transfer batch staging (train/packing.py).

The packed parity path must be VALUE-IDENTICAL to per-field staging: the
loss-curve golden (tests/test_loss_curve_pin.py) pins the end-to-end
numerics; these tests pin the mechanism."""

import jax
import jax.numpy as jnp
import numpy as np

from catnerf_tpu.config import Config
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.train import packing
from catnerf_tpu.train.loop import TrainingSession
from catnerf_tpu.train.step import BackgroundBatch, CategoryBatch


def _session():
    cfg = Config()
    cfg.seed = 0
    scene = make_scene(n_frames=2, width=48, height=36, n_categories=2,
                       insts_per_cat=2, seed=0)
    return TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)


def test_pack_unpack_roundtrip_is_exact():
    sess = _session()
    cat_np, bg_np = sess.batcher.next_batch(
        sess.n_per_cls, sess.cfg.n_per_optim_bg)
    flat = packing.pack(sess._pack_spec, cat_np, bg_np)
    assert flat.dtype == np.float32 and flat.ndim == 1

    cat, bg = jax.jit(lambda f: packing.unpack(sess._pack_spec, f))(flat)
    ref_cat = CategoryBatch(**{k: jnp.asarray(v) for k, v in cat_np.items()})
    ref_bg = BackgroundBatch(**{k: jnp.asarray(v) for k, v in bg_np.items()})
    for got, want in zip(cat, ref_cat):
        assert got.dtype == want.dtype and got.shape == want.shape
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(bg, ref_bg):
        assert got.dtype == want.dtype and got.shape == want.shape
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_packed_step_matches_plain_step():
    sess = _session()
    cat_np, bg_np = sess.batcher.next_batch(
        sess.n_per_cls, sess.cfg.n_per_optim_bg)

    # plain path (per-field staging through the public jitted step)
    state0 = jax.tree.map(jnp.copy, sess.state)
    cat = CategoryBatch(**{k: jnp.asarray(v) for k, v in cat_np.items()})
    bg = BackgroundBatch(**{k: jnp.asarray(v) for k, v in bg_np.items()})
    plain_state, plain_m = sess.step_fn(state0, cat, bg, sess.base_key)

    # packed path
    flat = jax.device_put(packing.pack(sess._pack_spec, cat_np, bg_np))
    packed = sess._build_packed_step()
    packed_state, packed_m = packed(
        jax.tree.map(jnp.copy, sess.state), flat, sess.base_key)

    np.testing.assert_allclose(float(packed_m.total), float(plain_m.total),
                               rtol=1e-6)
    leaves_a = jax.tree_util.tree_leaves(plain_state.params)
    leaves_b = jax.tree_util.tree_leaves(packed_state.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_spec_without_background():
    spec = packing.make_spec(3, 10, 7, with_background=False)
    assert spec.bg_fields == ()
    cat_np = {
        "rgbs": np.random.rand(3, 10, 3).astype(np.float32),
        "states": np.arange(30, dtype=np.int64).reshape(3, 10),
        "depth": np.random.rand(3, 10).astype(np.float64),
        "origins": np.random.randn(3, 10, 3).astype(np.float32),
        "dirs": np.random.randn(3, 10, 3).astype(np.float32),
        "obj_indices": np.ones((3, 10), np.int32),
    }
    flat = packing.pack(spec, cat_np, None)
    cat, bg = packing.unpack(spec, jnp.asarray(flat))
    assert bg is None
    np.testing.assert_array_equal(np.asarray(cat.states),
                                  cat_np["states"].astype(np.int32))
    np.testing.assert_allclose(np.asarray(cat.depth),
                               cat_np["depth"].astype(np.float32))
