"""Golden-value tests for the rendering math (ref: src/render_rays.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from catnerf_tpu.ops import render as R


def test_occupancy_activation_is_sigmoid():
    x = jnp.array([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(R.occupancy_activation(x)),
        1.0 / (1.0 + np.exp(-np.array([-2.0, 0.0, 3.0]))),
        rtol=1e-5, atol=1e-7,
    )


def test_termination_hand_computed():
    # occ = [0.5, 0.5, 1.0]: term = [0.5, 0.5*0.5, 1.0*0.5*0.5] (+eps terms)
    occ = jnp.array([[0.5, 0.5, 1.0]])
    term = R.occupancy_to_termination(occ)
    expected = np.array([
        0.5,
        0.5 * (1 - 0.5 + 1e-10),
        1.0 * (1 - 0.5 + 1e-10) ** 2,
    ])
    np.testing.assert_allclose(np.asarray(term[0]), expected, rtol=1e-6)


def test_termination_batch_shapes():
    occ = jax.random.uniform(jax.random.PRNGKey(0), (4, 7, 10))
    term = R.occupancy_to_termination(occ)
    assert term.shape == occ.shape
    # termination sums are <= 1 + small epsilon slack
    assert float(jnp.max(jnp.sum(term, -1))) <= 1.0 + 1e-5


def test_termination_matches_reference_loop():
    """Cross-check against a direct loop transcription of the reference
    formula (ref: src/render_rays.py:25-44)."""
    rng = np.random.default_rng(0)
    occ = rng.uniform(size=(5, 8)).astype(np.float32)
    term = np.asarray(R.occupancy_to_termination(jnp.asarray(occ)))
    for i in range(5):
        acc = 1.0
        for j in range(8):
            expected = occ[i, j] * acc
            np.testing.assert_allclose(term[i, j], expected, rtol=1e-5)
            acc *= 1.0 - occ[i, j] + 1e-10


def test_render_composite():
    term = jnp.array([[0.25, 0.25, 0.5]])
    vals = jnp.array([[1.0, 2.0, 4.0]])
    np.testing.assert_allclose(R.render(term, vals), [2.75], rtol=1e-6)


def test_render_loss_l1_l2():
    r = jnp.array([1.0, 2.0])
    gt = jnp.array([0.0, 4.0])
    np.testing.assert_allclose(R.render_loss(r, gt, "L1"), [1.0, 2.0])
    np.testing.assert_allclose(R.render_loss(r, gt, "L2"), [1.0, 4.0])
    with pytest.raises(NotImplementedError):
        R.render_loss(r, gt, "huber")


def test_reduce_batch_loss_masked_mean():
    loss = jnp.array([[1.0, 2.0, 3.0], [4.0, 6.0, 0.0]])
    mask = jnp.array([[True, True, False], [True, True, False]])
    out = R.reduce_batch_loss(loss * mask, mask=mask)
    np.testing.assert_allclose(np.asarray(out), [1.5, 5.0], rtol=1e-6)


def test_reduce_batch_loss_empty_mask_zeroes_batch():
    """Reference quirk: any model with an empty mask zeroes the whole batch
    (ref: src/render_rays.py:67-72)."""
    loss = jnp.ones((2, 3))
    mask = jnp.array([[True, True, True], [False, False, False]])
    out = R.reduce_batch_loss(loss, mask=mask)
    np.testing.assert_allclose(np.asarray(out), [0.0, 0.0])


def test_reduce_batch_loss_variance_weighting():
    loss = jnp.array([[2.0, 2.0]])
    var = jnp.array([[4.0, 4.0]])
    mask = jnp.ones((1, 2), bool)
    out = R.reduce_batch_loss(loss, var=var, mask=mask)
    np.testing.assert_allclose(np.asarray(out), [2.0 / (2.0 + 1e-4)], rtol=1e-5)


def test_make_3d_grid_identity():
    g = R.make_3d_grid(dim=3)
    assert g.shape == (3, 3, 3, 3)
    np.testing.assert_allclose(np.asarray(g[0, 0, 0]), [-1, -1, -1])
    np.testing.assert_allclose(np.asarray(g[2, 2, 2]), [1, 1, 1])
    np.testing.assert_allclose(np.asarray(g[1, 1, 1]), [0, 0, 0], atol=1e-7)


def test_make_3d_grid_scale_transform():
    scale = jnp.array([2.0, 3.0, 4.0])
    T = jnp.eye(4).at[:3, 3].set(jnp.array([1.0, 0.0, -1.0]))
    g = R.make_3d_grid(dim=2, scale=scale, transform=T)
    np.testing.assert_allclose(np.asarray(g[0, 0, 0]), [-1.0, -3.0, -5.0])
    np.testing.assert_allclose(np.asarray(g[1, 1, 1]), [3.0, 3.0, 3.0])
