"""Model architecture tests: embedding dims, parameter counts vs the
reference architecture, ensemble vmap equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from catnerf_tpu.models import codenerf, codes, embedding, ensemble, occupancy


def test_embedding_shape_and_split():
    p = embedding.init_params()
    x = jnp.ones((5, 10, 3))
    emb = embedding.apply(p, x, scale=2.0)
    assert emb.shape == (5, 10, embedding.EMB_SIZE_TOTAL)
    assert embedding.EMB_SIZE1 == 87
    assert embedding.EMB_SIZE2 == 42


def test_embedding_golden_value():
    """Hand-compute the embedding for one point against the reference formula
    (ref: src/embedding.py:82-92)."""
    p = embedding.init_params()
    x = np.array([[0.3, -0.7, 1.1]], dtype=np.float32)
    scale = 2.0
    emb = np.asarray(embedding.apply(p, jnp.asarray(x), scale=scale))

    t = x / scale
    proj = t @ embedding.ICOSAHEDRON_DIRS.T  # (1, 21)
    bands = 2.0 ** np.arange(6)
    xb = (proj[:, None, :] * bands[None, :, None]).reshape(1, -1)
    expected = np.concatenate([t, np.sin(xb * np.pi)], axis=-1)
    np.testing.assert_allclose(emb, expected, rtol=1e-4, atol=2e-5)
    # raw xyz occupies dims 0..2
    np.testing.assert_allclose(emb[0, :3], t[0], rtol=1e-6)


def test_sinpi_cospi_accuracy_and_grad():
    """The fast range-reduced polynomial sin(pi*x) (embedding.sinpi) must
    match the transcendental to within its fitted bound across the full
    band-scaled argument range (|x| up to 2^5 * |proj| ~ 64), including
    half-integers (reduction boundaries), and its custom JVP must equal
    pi*cos(pi*x)."""
    x = np.concatenate([
        np.linspace(-64.0, 64.0, 20001, dtype=np.float32),
        np.arange(-8, 8, dtype=np.float32) + 0.5,  # reduction boundaries
        np.arange(-8, 8, dtype=np.float32),
    ])
    got = np.asarray(embedding.sinpi(jnp.asarray(x)))
    want = np.sin(np.pi * x.astype(np.float64))
    # absolute error: poly bound 3.4e-9 + f32 rounding of band-scaled args
    assert np.abs(got - want).max() < 3e-5
    gotc = np.asarray(embedding.cospi(jnp.asarray(x)))
    wantc = np.cos(np.pi * x.astype(np.float64))
    assert np.abs(gotc - wantc).max() < 3e-5

    g = np.asarray(jax.vmap(jax.grad(embedding.sinpi))(jnp.asarray(x)))
    wantg = np.pi * np.cos(np.pi * x.astype(np.float64))
    assert np.abs(g - wantg).max() < 1e-4


def test_embedding_scale_invariance_property():
    """Doubling scale must equal halving the input."""
    p = embedding.init_params()
    x = jnp.array([[0.5, 0.25, -0.125]])
    e1 = embedding.apply(p, x, scale=4.0)
    e2 = embedding.apply(p, x / 2.0, scale=2.0)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-6)


def _count_params(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def test_codenerf_param_count_matches_reference_architecture():
    """Layer-by-layer parameter budget of the reference CodeNeRF
    (ref: src/model.py:22-54) with W=32, latent=256, 2 shape + 1 texture."""
    W, L, e1, e2 = 32, 256, 87, 42
    expected = 0
    expected += (e1 + 1) * W            # encoding_xyz
    expected += 2 * ((L + 1) * W)       # shape_latent_layer_{1,2}
    expected += 2 * ((W + 1) * W)       # shape_layer_{1,2}
    expected += (W + e1 + 1) * W        # cat_layer
    expected += (L + 1) * W             # cat_latent_layer
    expected += (W + 1) * W             # encoding_shape
    expected += (W + 1) * 1             # sigma
    expected += (W + e2 + 1) * W        # encoding_viewdir
    expected += (W + 1) * W             # texture_layer_1
    expected += (L + 1) * W             # texture_latent_layer_1
    expected += (W + 1) * (W // 2) + (W // 2 + 1) * 3  # rgb head

    p = codenerf.init_params(jax.random.PRNGKey(0), W=W, latent_dim=L)
    assert _count_params(p) == expected


def test_codenerf_forward_shapes_and_ranges():
    key = jax.random.PRNGKey(1)
    p = codenerf.init_params(key, W=32, latent_dim=16)
    emb = jax.random.normal(key, (7, 10, 129))
    sc = jax.random.normal(key, (7, 1, 16))
    tc = jax.random.normal(key, (7, 1, 16))
    sigma, rgb = codenerf.apply(p, emb, sc, tc)
    assert sigma.shape == (7, 10, 1)
    assert rgb.shape == (7, 10, 3)
    assert float(jnp.min(rgb)) >= 0.0 and float(jnp.max(rgb)) <= 1.0


def test_occupancy_param_count_matches_reference_architecture():
    """OccupancyMap budget (ref: src/model.py:86-122), hidden=128."""
    h, e1, e2 = 128, 87, 42
    expected = (
        (e1 + 1) * h + (h + 1) * h + (h + e1 + 1) * h + (h + 1) * h
        + (h + 1) * 1 + (e2 + h + 1) * h + (h + 1) * 3
    )
    p = occupancy.init_params(jax.random.PRNGKey(0), hidden_size=h)
    assert _count_params(p) == expected


def test_occupancy_forward():
    p = occupancy.init_params(jax.random.PRNGKey(0), hidden_size=32)
    emb = jax.random.normal(jax.random.PRNGKey(2), (11, 129))
    alpha, color = occupancy.apply(p, emb)
    assert alpha.shape == (11, 1)
    assert color.shape == (11, 3)
    alpha2, color2 = occupancy.apply(p, emb, do_color=False)
    assert color2 is None
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(alpha2))


def test_ensemble_vmap_matches_individual_forward():
    """vmapped stacked forward == per-model forward (the functorch
    combine_state_for_ensemble replacement, ref: train.py:154-155)."""
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    params_list = [codenerf.init_params(k, W=32, latent_dim=8) for k in keys]
    stacked = ensemble.stack_params(params_list)

    emb = jax.random.normal(jax.random.PRNGKey(4), (3, 6, 5, 129))
    sc = jax.random.normal(jax.random.PRNGKey(5), (3, 6, 1, 8))
    tc = jax.random.normal(jax.random.PRNGKey(6), (3, 6, 1, 8))

    v_sigma, v_rgb = jax.vmap(codenerf.apply)(stacked, emb, sc, tc)
    for i in range(3):
        s_i, r_i = codenerf.apply(params_list[i], emb[i], sc[i], tc[i])
        np.testing.assert_allclose(np.asarray(v_sigma[i]), np.asarray(s_i), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v_rgb[i]), np.asarray(r_i), rtol=2e-5, atol=1e-6)

    back = ensemble.unstack_params(stacked, 3)
    for orig, rec in zip(params_list, back):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            orig, rec)


def test_codes_init_and_mask():
    c = codes.init_stacked_codes(jax.random.PRNGKey(0), [3, 1, 2], 16)
    assert c["shape"].shape == (3, 3, 16)
    assert c["texture"].shape == (3, 3, 16)
    # init std ~ 1/sqrt(D/2)
    std = float(jnp.std(c["shape"]))
    assert abs(std - (1.0 / np.sqrt(8.0))) < 0.05

    mask = codes.obj_validity_mask([3, 1, 2])
    np.testing.assert_array_equal(
        np.asarray(mask),
        [[True, True, True], [True, False, False], [True, True, False]],
    )


def test_code_lookup():
    c = jnp.arange(12.0).reshape(4, 3)
    out = codes.lookup(c, jnp.array([2, 0, 2]))
    np.testing.assert_allclose(np.asarray(out), [[6, 7, 8], [0, 1, 2], [6, 7, 8]])
