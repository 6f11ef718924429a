"""Multi-device sharding tests on the virtual 8-CPU-device mesh:
the sharded train step compiles, executes, and matches the single-device
step numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catnerf_tpu.config import Config
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.models import codes as codes_mod
from catnerf_tpu.parallel import mesh as mesh_mod, sharding
from catnerf_tpu.train.loop import TrainingSession
from catnerf_tpu.train.state import init_train_state
from catnerf_tpu.train.step import BackgroundBatch, CategoryBatch, make_train_step


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _cfg():
    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    return cfg


def test_make_mesh():
    m = mesh_mod.make_mesh(n_data=4, n_model=2)
    assert m.shape == {"data": 4, "model": 2}
    m2 = mesh_mod.make_mesh(n_model=2)
    assert m2.shape == {"data": 4, "model": 2}


def _make_batches(cfg, n_cls=2, r=32, r_bg=64, seed=0):
    scene = make_scene(n_frames=3, width=48, height=36, n_categories=n_cls,
                       insts_per_cat=2, seed=seed)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict, cam=scene.cam)
    cat_np, bg_np = sess.batcher.next_batch(r, r_bg)
    cat = CategoryBatch(**{k: jnp.asarray(v) for k, v in cat_np.items()})
    bg = BackgroundBatch(**{k: jnp.asarray(v) for k, v in bg_np.items()})
    return sess, cat, bg


def test_sharded_step_matches_single_device():
    cfg = _cfg()
    sess, cat, bg = _make_batches(cfg)
    n_cls = 2
    m = mesh_mod.make_mesh(n_data=4, n_model=2)

    obj_mask = codes_mod.obj_validity_mask([2, 2])
    key = jax.random.PRNGKey(0)
    state = init_train_state(jax.random.PRNGKey(1), cfg, [2, 2])

    # single-device reference
    step1 = make_train_step(cfg, obj_mask, donate=False)
    s1, m1 = step1(state, cat, bg, key)

    # sharded
    sharded_state = sharding.shard_state(state, m, n_cls)
    cat_s, bg_s = sharding.shard_batches(cat, bg, m)
    stepN = sharding.make_sharded_train_step(cfg, obj_mask, m, state, n_cls)
    sN, mN = stepN(sharded_state, cat_s, bg_s, key)

    np.testing.assert_allclose(float(m1.total), float(mN.total), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(m1.cat_psnr), np.asarray(mN.cat_psnr), rtol=1e-4)
    # parameters agree after one update
    l1 = jax.tree_util.tree_leaves(s1.params)
    lN = jax.tree_util.tree_leaves(jax.device_get(sN.params))
    for a, b in zip(l1, lN):
        # Different device counts compile to different fusion/rounding
        # choices (TPU-default bf16 matmul truncation among them), so a few
        # elements drift ~1e-4 after one optimizer step. Tolerate that tail
        # but bound the MEAN drift tightly — a systematic gradient
        # mis-scaling or wrong reduction would move every element.
        a = np.asarray(a)
        b = np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=2e-4)
        assert np.mean(np.abs(a - b)) < 2e-5, np.mean(np.abs(a - b))


def test_sharded_state_placement():
    cfg = _cfg()
    m = mesh_mod.make_mesh(n_data=4, n_model=2)
    state = init_train_state(jax.random.PRNGKey(0), cfg, [2, 2])
    sharded = sharding.shard_state(state, m, 2)
    # stacked category leaf is sharded over 'model'
    b = sharded.params["cat_pe"]["B"]
    assert len(b.sharding.device_set) == 8
    spec = b.sharding.spec
    assert spec[0] == mesh_mod.MODEL_AXIS
    # background params replicated
    bg_w = sharded.params["bg_fc"]["in_layer"]["w"]
    assert bg_w.sharding.is_fully_replicated


def test_multi_step_training_sharded():
    cfg = _cfg()
    sess, cat, bg = _make_batches(cfg)
    m = mesh_mod.make_mesh(n_data=4, n_model=2)
    obj_mask = codes_mod.obj_validity_mask([2, 2])
    state = sharding.shard_state(
        init_train_state(jax.random.PRNGKey(1), cfg, [2, 2]), m, 2)
    stepN = sharding.make_sharded_train_step(cfg, obj_mask, m, state, 2)
    cat_s, bg_s = sharding.shard_batches(cat, bg, m)
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        state, metrics = stepN(state, cat_s, bg_s, key)
    assert np.isfinite(float(metrics.total))


def test_sharded_superstep_trains_and_matches_shapes():
    """Production fast path over the 8-device mesh: store sharded over
    'model' by category, scan of full steps inside one jitted dispatch."""
    import jax
    import numpy as np

    from catnerf_tpu.config import Config
    from catnerf_tpu.data.device_buffer import build_device_store
    from catnerf_tpu.data.synthetic import make_scene
    from catnerf_tpu.parallel import mesh as mesh_mod, sharding
    from catnerf_tpu.train.loop import TrainingSession

    mesh = mesh_mod.make_mesh(n_data=4, n_model=2)
    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    scene = make_scene(n_frames=3, width=48, height=36, n_categories=2,
                       insts_per_cat=2, seed=5)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    store = build_device_store(sess.categories, sess.background)
    n_cls = len(sess.cls_ids)

    state = sharding.shard_state(sess.state, mesh, n_cls)
    superstep = sharding.make_sharded_superstep(
        cfg, sess.obj_mask, mesh, sess.state, n_cls, store,
        n_per_cls=16, n_bg=32, n_inner=4)

    key = jax.random.PRNGKey(0)
    m1 = None
    for i in range(5):
        key, k = jax.random.split(key)
        state, m = superstep(state, k)
        if m1 is None:
            m1 = m
    assert int(state.step) == 20
    assert np.isfinite(float(m.total))
    assert float(m.cat_opacity.mean()) < float(m1.cat_opacity.mean()) * 1.5
