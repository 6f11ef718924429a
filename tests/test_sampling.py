"""Tests for the branchless ray->3D point sampler (ref:
src/scene_cateogries.py:51-96,453-546)."""

import jax
import jax.numpy as jnp
import numpy as np

from catnerf_tpu.ops import sampling as S


def test_stratified_bins_bounds_and_strata():
    key = jax.random.PRNGKey(0)
    lo = jnp.full((100,), 1.0)
    hi = jnp.full((100,), 3.0)
    z = S.stratified_bins(key, lo, hi, 4)
    assert z.shape == (100, 4)
    z = np.asarray(z)
    assert (z >= 1.0).all() and (z <= 3.0).all()
    # each sample stays inside its stratum
    edges = np.linspace(1.0, 3.0, 5)
    for b in range(4):
        assert (z[:, b] >= edges[b]).all() and (z[:, b] <= edges[b + 1]).all()
    # monotone along bins
    assert (np.diff(z, axis=1) > 0).all()


def test_normal_bins_sampling_sorted_clipped_centered():
    key = jax.random.PRNGKey(1)
    depth = jnp.full((2000,), 5.0)
    z = S.normal_bins_sampling(key, depth, 9, delta=0.1)
    assert z.shape == (2000, 9)
    z = np.asarray(z)
    assert (np.diff(z, axis=1) >= 0).all()
    assert (z >= 5.0 - 0.1 - 1e-6).all() and (z <= 5.0 + 0.1 + 1e-6).all()
    # std of the flattened samples ~ delta/3 (clipping slightly shrinks it)
    assert abs(z.std() - 0.1 / 3.0) < 0.01
    assert abs(z.mean() - 5.0) < 1e-3


def _make_rays(n, states, depths):
    rgbs = jnp.ones((n, 3))
    origins = jnp.zeros((n, 3))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    return rgbs, jnp.asarray(states), jnp.asarray(depths, jnp.float32), origins, dirs


def test_sample_3d_points_this_obj_near_surface():
    n = 64
    rgbs, states, depth, origins, dirs = _make_rays(
        n, [S.THIS_OBJ] * n, [4.0] * n)
    out = S.sample_3d_points(
        jax.random.PRNGKey(0), rgbs, states, depth, origins, dirs,
        n_bins_cam2surface=1, n_bins=9, min_depth=0.0,
        surface_eps=0.1, stop_eps=0.05)
    assert out.z_vals.shape == (n, 10)
    assert out.input_pcs.shape == (n, 10, 3)
    z = np.asarray(out.z_vals)
    # first bin: camera->surface, [0, depth-eps]
    assert (z[:, 0] >= 0).all() and (z[:, 0] <= 4.0 - 0.1 + 1e-6).all()
    # remaining bins: within +-eps of surface
    assert (np.abs(z[:, 1:] - 4.0) <= 0.1 + 1e-6).all()
    assert np.asarray(out.valid_depth_mask).all()
    # points lie along +z from origin
    pcs = np.asarray(out.input_pcs)
    np.testing.assert_allclose(pcs[..., 2], z, rtol=1e-6)
    np.testing.assert_allclose(pcs[..., :2], 0.0, atol=1e-7)


def test_sample_3d_points_other_obj_past_surface():
    n = 64
    rgbs, states, depth, origins, dirs = _make_rays(
        n, [S.OTHER_OBJ] * n, [4.0] * n)
    out = S.sample_3d_points(
        jax.random.PRNGKey(0), rgbs, states, depth, origins, dirs,
        n_bins_cam2surface=1, n_bins=9, min_depth=0.0,
        surface_eps=0.1, stop_eps=0.05)
    z = np.asarray(out.z_vals)
    # near-surface bins stratified in [d-eps, d+stop_eps]
    assert (z[:, 1:] >= 4.0 - 0.1 - 1e-6).all()
    assert (z[:, 1:] <= 4.0 + 0.05 + 1e-6).all()


def test_sample_3d_points_invalid_depth_full_range():
    n = 32
    # half invalid (depth 0), half valid at 6.0 -> max_bound = 6.0
    states = [S.THIS_OBJ] * n
    depths = [0.0] * (n // 2) + [6.0] * (n // 2)
    rgbs, states, depth, origins, dirs = _make_rays(n, states, depths)
    out = S.sample_3d_points(
        jax.random.PRNGKey(2), rgbs, states, depth, origins, dirs,
        n_bins_cam2surface=5, n_bins=9, min_depth=0.0,
        surface_eps=0.1, stop_eps=0.05)
    z = np.asarray(out.z_vals)
    vm = np.asarray(out.valid_depth_mask)
    assert (~vm[: n // 2]).all() and vm[n // 2:].all()
    # invalid rays: full [0, 6] range, all 14 bins
    assert (z[: n // 2] >= 0).all() and (z[: n // 2] <= 6.0).all()
    # spread across the full range (stratified over 14 bins)
    assert z[: n // 2, 0].max() < 1.0 and z[: n // 2, -1].min() > 5.0


def test_sample_3d_points_deterministic_under_same_key():
    n = 8
    rgbs, states, depth, origins, dirs = _make_rays(n, [1] * n, [2.0] * n)
    kwargs = dict(n_bins_cam2surface=1, n_bins=9, min_depth=0.0,
                  surface_eps=0.1, stop_eps=0.05)
    a = S.sample_3d_points(jax.random.PRNGKey(7), rgbs, states, depth, origins, dirs, **kwargs)
    b = S.sample_3d_points(jax.random.PRNGKey(7), rgbs, states, depth, origins, dirs, **kwargs)
    np.testing.assert_array_equal(np.asarray(a.z_vals), np.asarray(b.z_vals))
    c = S.sample_3d_points(jax.random.PRNGKey(8), rgbs, states, depth, origins, dirs, **kwargs)
    assert not np.array_equal(np.asarray(a.z_vals), np.asarray(c.z_vals))


def test_sampler_is_jittable_fixed_shape():
    n = 16
    rgbs, states, depth, origins, dirs = _make_rays(n, [1] * n, [2.0] * n)
    f = jax.jit(lambda k: S.sample_3d_points(
        k, rgbs, states, depth, origins, dirs,
        n_bins_cam2surface=1, n_bins=9, min_depth=0.0,
        surface_eps=0.1, stop_eps=0.05))
    out = f(jax.random.PRNGKey(0))
    assert out.z_vals.shape == (n, 10)


def test_sorted_normal_finite_at_rounding_edges():
    """Regression: a tiny edge gap makes cs/(cs+e_last) round to exactly
    0.0/1.0 in f32, sending erfinv to +-inf and poisoning the depth render
    as 0*inf = NaN (hit ~0.5% of 10k-step runs at production ray counts
    before the clamp). Construct uniforms that trigger both edges."""
    import jax.numpy as jnp

    from catnerf_tpu.ops.sampling import _sorted_normal_from_u

    n_bins = 9
    # last gap ~0: u[..., -1] ~ 1 => e_last ~ 0 => u_sorted[-1] rounds to 1
    u_hi = np.full((1, n_bins + 1), 0.5, np.float32)
    u_hi[0, -1] = np.float32(1.0) - np.float32(1.2e-7)
    # first gap ~0 relative to the sum: u[0] ~ 1 => cs[0] ~ 0 => rounds to 0
    u_lo = np.full((1, n_bins + 1), 1e-12, np.float32)
    u_lo[0, 0] = np.float32(1.0) - np.float32(1.2e-7)
    depth = jnp.asarray([2.0], jnp.float32)
    for u in (u_hi, u_lo):
        z = _sorted_normal_from_u(jnp.asarray(u), depth, 0.1 / 3.0, 0.1)
        assert np.isfinite(np.asarray(z)).all(), u
        assert (np.abs(np.asarray(z) - 2.0) <= 0.1 + 1e-6).all()
