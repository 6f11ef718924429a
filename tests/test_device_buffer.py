"""Device-resident buffer + superstep tests."""

import jax
import numpy as np

from catnerf_tpu.config import Config
from catnerf_tpu.data.device_buffer import (
    build_device_store,
    make_superstep,
    sample_batch,
)
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.train.loop import TrainingSession
from catnerf_tpu.train.step import make_train_step


def _session():
    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    scene = make_scene(n_frames=3, width=48, height=36, n_categories=2,
                       insts_per_cat=2, seed=5)
    return TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)


def test_device_store_shapes_and_sampling():
    sess = _session()
    store = build_device_store(sess.categories, sess.background)
    n_cls = len(sess.categories)
    assert store.packed.shape[0] == n_cls
    # rows are stored FLAT (12 floats per ray) to avoid TPU tile-padding
    # blowup on a [.., max_len, 12] minor dim (device_buffer.DeviceRayStore)
    assert store.packed.shape[1] == 12 * max(
        c.buffer.n for c in sess.categories)
    np.testing.assert_array_equal(
        np.asarray(store.lengths), [c.buffer.n for c in sess.categories])

    cat, bg = sample_batch(store, jax.random.PRNGKey(0), 32, 64)
    assert cat.rgbs.shape == (n_cls, 32, 3)
    assert bg.depth.shape == (64,)
    assert float(cat.rgbs.max()) <= 1.0
    # sampled depths exist in source buffers (col 9 = depth)
    d0 = np.asarray(cat.depth[0])
    rows0 = np.asarray(store.packed[0]).reshape(-1, 12)
    src = rows0[: int(store.lengths[0]), 9]
    assert np.isin(np.round(d0, 5), np.round(src, 5)).all()


def test_superstep_trains():
    sess = _session()
    store = build_device_store(sess.categories, sess.background)
    inner = make_train_step(sess.cfg, sess.obj_mask, jit=False)
    superstep = make_superstep(inner, store, n_per_cls=32, n_bg=64,
                               n_inner=4, donate=False)
    state = sess.state
    key = jax.random.PRNGKey(0)
    state, m1 = superstep(state, key)
    assert int(state.step) == 4
    for _ in range(10):
        key, k = jax.random.split(key)
        state, m = superstep(state, k)
    assert int(state.step) == 44
    assert np.isfinite(float(m.total))
    # training signal: opacity loss genuinely FALLS vs the first superstep
    # (measured ~4x drop over these 40 steps; 0.5x leaves margin — the old
    # * 1.5 bound passed even for a 49% RISE)
    assert float(m.cat_opacity.mean()) < float(m1.cat_opacity.mean()) * 0.5


def test_windowed_sampling_cyclic_and_uniform():
    """window=True: rows are a contiguous cyclic window of the valid rows —
    within-step without replacement, wraparound pad equals the buffer head,
    and every source row is reachable (uniform inclusion)."""
    sess = _session()
    n, n_bg = 32, 64
    store = build_device_store(sess.categories, sess.background,
                               window_pad=n, bg_window_pad=n_bg)
    # pad rows replicate the head of each category's valid rows
    packed3d = [np.asarray(store.packed[c]).reshape(-1, 12)
                for c in range(store.packed.shape[0])]
    for c in range(store.packed.shape[0]):
        L = int(store.lengths[c])
        np.testing.assert_array_equal(
            packed3d[c][L:L + n],
            packed3d[c][:n] if L >= n
            else np.resize(packed3d[c][:L], (n, 12)))

    seen = [set() for _ in range(store.packed.shape[0])]
    for s in range(40):
        cat, bg = sample_batch(store, jax.random.PRNGKey(s), n, n_bg,
                               window=True)
        for c in range(store.packed.shape[0]):
            L = int(store.lengths[c])
            rows = np.asarray(cat.depth[c])
            src = packed3d[c][:L, 9]
            # every sampled row comes from the valid set
            assert np.isin(np.round(rows, 5), np.round(src, 5)).all()
            # contiguity: the window matches src at some cyclic offset
            ext = np.concatenate([src, src[:n]])
            offsets = [
                o for o in range(L)
                if np.allclose(ext[o:o + n], rows)
            ]
            assert offsets, f"window not contiguous-cyclic (cat {c}, step {s})"
            seen[c].update((offsets[0] + np.arange(n)) % L)
        assert bg.depth.shape == (n_bg,)
    # over 40 draws of 32 from small buffers, coverage should be near-total
    for c, s in enumerate(seen):
        L = int(store.lengths[c])
        assert len(s) > 0.8 * min(L, 40 * n), (c, len(s), L)


def test_windowed_superstep_trains():
    sess = _session()
    store = build_device_store(sess.categories, sess.background,
                               window_pad=32, bg_window_pad=64)
    inner = make_train_step(sess.cfg, sess.obj_mask, jit=False)
    superstep = make_superstep(inner, store, n_per_cls=32, n_bg=64,
                               n_inner=4, donate=False, window=True)
    state = sess.state
    key = jax.random.PRNGKey(0)
    state, m = superstep(state, key)
    assert int(state.step) == 4
    assert np.isfinite(float(m.total))


def test_window_draw_requires_matching_pad():
    """A window draw larger than the store's window_pad must raise loudly:
    the dynamic_slice would otherwise clamp into the zero padding and
    training would silently consume all-zero rays (origin=dir=rgb=0)."""
    import pytest

    from catnerf_tpu.data.device_buffer import (build_device_store,
                                                sample_batch)

    sess = _session()
    store = build_device_store(sess.categories, sess.background,
                               window_pad=8, bg_window_pad=8)
    key = jax.random.PRNGKey(0)
    sample_batch(store, key, 8, 8, window=True)  # exact pad: fine
    with pytest.raises(ValueError, match="window_pad"):
        sample_batch(store, key, 32, 8, window=True)
    with pytest.raises(ValueError, match="bg_window_pad"):
        sample_batch(store, key, 8, 64, window=True)

    # want_bg=False skips the background draw entirely
    cat, bg = sample_batch(store, key, 8, 8, window=True, want_bg=False)
    assert bg is None and cat.origins.shape[1] == 8


def test_superstep_embeds_no_large_constants():
    """Regression pin for the closure-constant anti-pattern: a jitted
    program that closes over a device buffer embeds it as an MLIR constant,
    which lowering pulls device->host (~0.6 MB/s over the axon tunnel —
    254 s of a 305 s field-pretrain run, 2026-08) and ships back inside the
    binary. The ray store must be a jit ARGUMENT: the lowered superstep may
    not contain any constant within 100x of the store's size."""
    import re

    sess = _session()
    store = build_device_store(sess.categories, sess.background)
    inner = make_train_step(sess.cfg, sess.obj_mask, jit=False)
    superstep = make_superstep(inner, store, n_per_cls=32, n_bg=64,
                               n_inner=4, donate=False)
    txt = superstep.lower(sess.state, jax.random.PRNGKey(0)).as_text()
    store_bytes = store.packed.size * 4
    # hex-encoded dense blobs are the only way multi-KB constants appear
    biggest = max((len(m) // 2 for m in
                   re.findall(r'dense<"0x([0-9A-Fa-f]+)"', txt)), default=0)
    assert biggest < max(store_bytes // 100, 4096), (
        f"lowered superstep embeds a {biggest}-byte constant "
        f"(store is {store_bytes} B): a device buffer leaked into a "
        "closure — pass it as a jit argument")
