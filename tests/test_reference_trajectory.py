"""Pinned reference-executed training-trajectory A/B (VERDICT r2 item #6).

Runs scripts/exp_ref_trajectory.py's harness at reduced scale: identical
init + identical per-step pixel batches through (a) our parity-path
train step and (b) a torch loop built ENTIRELY from the reference's own
modules (UniDirsEmbed/CodeNeRF/OccupancyMap forward, step_batch_loss(+reg),
the reference 3D samplers, torch AdamW with the reference param groups).
Bin-sampling RNG differs, so windowed means are compared.

Calibration (scripts/exp_ref_trajectory.py, 50 and 200 iters, full gate
batch sizes): windowed mean PSNR curves agree to 0.02-0.03 dB; windowed
total-loss ratio settles in [0.85, 1.15]. The bands below are ~10x those
readings — they catch semantic divergence (wrong loss term, optimizer
mis-group, sampler law), not noise.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_SRC = "/root/reference/src"
SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference checkout not available")


def test_training_trajectory_tracks_reference():
    sys.path.insert(0, SCRIPTS)
    try:
        import exp_ref_trajectory as traj
    finally:
        sys.path.remove(SCRIPTS)

    from catnerf_tpu.config import Config
    from catnerf_tpu.data.synthetic import make_scene
    from catnerf_tpu.train.loop import TrainingSession

    torch.manual_seed(0)
    iters, window = 40, 20

    cfg = Config()
    cfg.net_hyperparams.latent_dim = 32
    # Half the production batch: cuts CPU wall-clock, keeps the dynamics.
    cfg.n_per_optim, cfg.n_per_optim_bg = 60, 600
    cfg.seed = 0
    scene = make_scene(n_frames=6, width=80, height=60, n_categories=2,
                       insts_per_cat=2, seed=0)

    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    jax_tot, jax_psnr = [], []
    for _ in range(iters):
        m = sess.step_once()
        jax_tot.append(float(m.total))
        jax_psnr.append(float(np.asarray(m.cat_psnr).mean()))
    sess.release_prefetch()

    ref = traj.import_reference_modules()
    samplers = traj.extract_reference_samplers(torch)
    sess2 = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                            cam=scene.cam)
    tr = traj.build_torch_trainer(ref, torch, sess2, cfg)
    obj_masks = np.asarray(sess2.obj_mask)

    t_tot, t_psnr = [], []
    for _ in range(iters):
        cat_np, bg_np = sess2.batcher.next_batch(sess2.n_per_cls,
                                                 cfg.n_per_optim_bg)
        tot, psnr, _ = traj.torch_step(tr, samplers, ref, torch, cfg,
                                       cat_np, bg_np, obj_masks)
        t_tot.append(tot)
        t_psnr.append(float(np.mean(psnr)))

    def windows(x):
        x = np.asarray(x, np.float64)
        return x.reshape(-1, window).mean(axis=1)

    w_j, w_t = windows(jax_tot), windows(t_tot)
    p_j, p_t = windows(jax_psnr), windows(t_psnr)

    # Both sides actually train (loss drops hard from window 0 to 1).
    assert w_j[-1] < 0.5 * w_j[0], (w_j[0], w_j[-1])
    assert w_t[-1] < 0.5 * w_t[0], (w_t[0], w_t[-1])
    # The curves track each other.
    ratio = w_j[-1] / w_t[-1]
    assert 0.6 < ratio < 1.6, f"final windowed total ratio {ratio:.3f}"
    assert np.max(np.abs(p_j - p_t)) < 0.6, (
        f"windowed PSNR diverged: jax {p_j} vs torch {p_t}")
