"""Seeded loss-curve regression pin (VERDICT r1 item #10).

A 200-iteration synthetic training run is pinned against a golden trace
(tests/golden/loss_curve_seed0.json, generated on the CPU backend this
suite runs on). Any silent numerics drift in the hot path — sampling, PE,
CodeNeRF, rendering, losses, optimizer — moves the curve and fails this
test. Tolerances leave room for XLA fusion-order noise but not for
semantic changes (a wrong mask, scale, or RNG stream shifts PSNR by >1).

Regenerate the golden (only after an INTENDED semantic change, with the
same config below): see the generation snippet in git history / this file.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from catnerf_tpu.config import Config
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.train.loop import TrainingSession

_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
# Two pins per path: the production default (bf16 activation storage) and
# the strict-parity f32 numerics (cfg.bf16_activations = false).
_VARIANTS = {
    "f32": ("loss_curve_seed0.json", False),
    "bf16": ("loss_curve_seed0_bf16.json", True),
}


@pytest.mark.parametrize("variant", sorted(_VARIANTS))
def test_loss_curve_matches_golden(variant):
    fname, bf16 = _VARIANTS[variant]
    cfg = Config()
    cfg.bf16_activations = bf16
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    cfg.n_per_optim = 48
    cfg.n_per_optim_bg = 128
    scene = make_scene(n_frames=4, width=64, height=48, n_categories=2,
                       insts_per_cat=2, seed=0)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    total, cat_psnr, bg_psnr = [], [], []
    for i in range(200):
        m = sess.step_once()
        if (i + 1) % 10 == 0:
            total.append(float(m.total))
            cat_psnr.append(float(m.cat_psnr.mean()))
            bg_psnr.append(float(m.bg_psnr))

    golden = json.load(open(os.path.join(_GOLDEN_DIR, fname)))
    d_psnr = np.abs(np.asarray(cat_psnr) - np.asarray(golden["cat_psnr"]))
    d_bg = np.abs(np.asarray(bg_psnr) - np.asarray(golden["bg_psnr"]))
    rel_total = np.abs(np.asarray(total) / np.asarray(golden["total"]) - 1.0)
    assert d_psnr.max() < 0.35, (cat_psnr, golden["cat_psnr"])
    assert d_psnr.mean() < 0.1
    assert d_bg.max() < 0.35
    assert rel_total.max() < 0.08 and rel_total.mean() < 0.02


_VARIANTS_FAST = {
    "f32": ("loss_curve_fast_seed0.json", False),
    "bf16": ("loss_curve_fast_seed0_bf16.json", True),
}


@pytest.mark.parametrize("variant", sorted(_VARIANTS_FAST))
def test_fast_path_loss_curve_matches_golden(variant):
    """Same pin for the PRODUCTION path (superstep + cyclic-window device
    draws): catches numerics drift in the device store, windowed sampling,
    and the scanned step that the parity-path pin cannot see."""
    fname, bf16 = _VARIANTS_FAST[variant]
    cfg = Config()
    cfg.bf16_activations = bf16
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 32
    cfg.n_per_optim = 48
    cfg.n_per_optim_bg = 128
    scene = make_scene(n_frames=4, width=64, height=48, n_categories=2,
                       insts_per_cat=2, seed=0)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    sess.enable_fast_path(n_inner=10)
    total, cat_psnr = [], []
    for _ in range(20):
        m = sess.run_fast(10)
        total.append(float(m.total))
        cat_psnr.append(float(m.cat_psnr.mean()))

    golden = json.load(open(os.path.join(_GOLDEN_DIR, fname)))
    d_psnr = np.abs(np.asarray(cat_psnr) - np.asarray(golden["cat_psnr"]))
    rel_total = np.abs(np.asarray(total) / np.asarray(golden["total"]) - 1.0)
    assert d_psnr.max() < 0.35, (cat_psnr, golden["cat_psnr"])
    assert rel_total.max() < 0.08 and rel_total.mean() < 0.02
