"""End-to-end training tests on the synthetic scene: one jitted step runs,
gradients flow to every parameter group, and short training reduces loss /
raises PSNR (the reference's only quality signal, ref: src/loss.py:94-102)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catnerf_tpu.config import Config
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.train.loop import TrainingSession


@pytest.fixture(scope="module")
def small_cfg():
    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.net_hyperparams.W = 32
    cfg.hidden_feature_size_bg = 32
    cfg.n_per_optim = 24
    cfg.n_per_optim_bg = 96
    cfg.seed = 0
    return cfg


@pytest.fixture(scope="module")
def session(small_cfg):
    scene = make_scene(n_frames=4, width=64, height=48, n_categories=2,
                       insts_per_cat=2, seed=1)
    return TrainingSession(small_cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)


def test_session_setup(session):
    assert session.cls_ids == [80, 81]
    assert session.batcher.n_objs_per_cls == [2, 2]
    assert session.background is not None
    # rays/category/step = n_objs_total * n_per_optim // n_cls
    assert session.n_per_cls == 4 * 24 // 2


def test_single_step_runs_and_updates(session):
    params_before = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), session.state.params)
    m = session.step_once()
    assert np.isfinite(float(m.total))
    assert m.cat_depth.shape == (2,)
    # every param group received an update
    leaves_before = jax.tree_util.tree_leaves(params_before)
    leaves_after = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, session.state.params))
    changed = [
        not np.allclose(a, b) for a, b in zip(leaves_before, leaves_after)
    ]
    assert all(changed), f"{sum(changed)}/{len(changed)} leaves changed"
    assert int(session.state.step) == session.iteration


def test_loss_decreases_over_training(session):
    """Color + opacity losses fall with training. (The *total* is not
    monotone: the depth term's 1/sqrt(var) information weight grows as the
    field sharpens — same behavior as the reference weighting,
    ref: src/render_rays.py:73-80.)"""
    first = session.metrics_to_dict(session.step_once())
    hist = session.run(120, callback_every=40)
    last = hist[-1]
    assert last["cls_80/color"] < first["cls_80/color"]
    assert last["cls_80/opacity"] < first["cls_80/opacity"]
    assert np.isfinite(last["bg_psnr"])


def test_psnr_improves(session):
    # NB: `session` is module-scoped and has trained in the preceding
    # tests; assertions below are RELATIVE to this run's own start so the
    # test also holds in isolation / under reordering.
    start = session.metrics_to_dict(session.step_once())
    hist = session.run(120, callback_every=40)
    psnrs = [h["cls_80/psnr"] for h in hist]
    assert np.mean(psnrs[-2:]) > np.mean(psnrs[:2]) - 0.5  # noisy proxy
    # opacity loss clearly shrinks within THIS run
    assert hist[-1]["cls_80/opacity"] < start["cls_80/opacity"]


def test_category_params_extraction(session):
    p = session.category_params(81)
    assert p["shape_codes"].shape == (2, 16)
    assert p["pe"]["B"].shape == (21, 3)
    bg = session.background_params()
    assert bg is not None and "fc" in bg


def test_metrics_dict_keys(session):
    m = session.step_once()
    d = session.metrics_to_dict(m)
    for key in ["cls_80/psnr", "cls_81/depth", "background/color", "total"]:
        assert key in d


def test_onehot_injection_lookup_matches_take():
    """_gather_injections (one-hot einsum) must equal the plain gather it
    replaced, bitwise, in both storage dtypes (the einsum has exactly one
    1.0 per row and runs at HIGHEST precision — no truncation, no summing
    of rounded terms)."""
    from catnerf_tpu.train.step import _gather_injections

    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    for dtype in (jnp.float32, jnp.bfloat16):
        inj_s = jax.random.normal(k1, (4, 3, 96)).astype(dtype)
        inj_t = jax.random.normal(k2, (4, 3, 32)).astype(dtype)
        idx = jax.random.randint(k3, (4, 25), 0, 3)
        got_s, got_t = _gather_injections(inj_s, inj_t, idx)
        want = jax.vmap(lambda z, i: jnp.take(z, i, axis=0))
        np.testing.assert_array_equal(np.asarray(got_s),
                                      np.asarray(want(inj_s, idx)))
        np.testing.assert_array_equal(np.asarray(got_t),
                                      np.asarray(want(inj_t, idx)))
        assert got_s.dtype == dtype and got_t.dtype == dtype
