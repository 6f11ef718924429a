"""Room_0-scale stress gate (VERDICT r2 item #3).

One synthetic run at the reference workload shape
(configs/Replica/config_replica_room0.json): 1200x680 camera, >=20
categories / >=40 instances, >=100 keyframes, 10k training iterations,
mesh-all at grid-dim up to 256. Records what the toy gates never
exercised: scene/loader wall-clock, host ray-buffer and device-store
bytes against the 16 GB v5e HBM, sustained training samples/s at scale,
and mesh-all wall-clock. Prints ONE JSON line.

Usage:
  python scripts/stress_scale.py                      # full scale (TPU)
  python scripts/stress_scale.py --frames 20 --width 400 --height 300 \
      --categories 6 --iters 500 --grid-dim 128       # reduced smoke
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1200)
    ap.add_argument("--height", type=int, default=680)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--categories", type=int, default=20)
    ap.add_argument("--insts", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10000)
    ap.add_argument("--grid-dim", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--shapes", choices=("sphere", "asym", "mixed"),
                    default="sphere",
                    help="sphere ray casting is closed-form; asym shapes "
                         "march numerically (slower scene build)")
    ap.add_argument("--mesh-objects", type=int, default=0,
                    help="mesh only the first N objects (0 = all)")
    ap.add_argument("--cap-rays", type=int, default=2_000_000,
                    help="max device-store rays per category (0 = all; "
                         "uncapped at full scale OOMs the 16 GB HBM — "
                         "measured RESOURCE_EXHAUSTED)")
    ap.add_argument("--cap-bg", type=int, default=12_000_000,
                    help="max background store rays (0 = all)")
    args = ap.parse_args()

    from catnerf_tpu.config import Config
    from catnerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from catnerf_tpu.data.synthetic import make_scene
    from catnerf_tpu.mesher.meshing import mesh_scene
    from catnerf_tpu.train.loop import TrainingSession

    result = {"metric": "room0_scale_stress", "width": args.width,
              "height": args.height, "frames": args.frames,
              "categories": args.categories,
              "instances": args.categories * args.insts,
              "iters": args.iters, "grid_dim": args.grid_dim,
              "shapes": args.shapes}

    t0 = time.time()
    scene = make_scene(n_frames=args.frames, width=args.width,
                       height=args.height, n_categories=args.categories,
                       insts_per_cat=args.insts, seed=args.seed,
                       shape_family=args.shapes)
    result["scene_build_s"] = round(time.time() - t0, 1)
    frame_bytes = sum(d["image"].nbytes + d["depth"].nbytes
                      + d["obj_mask"].nbytes
                      for d in scene.sample_dict.values())
    result["frame_store_gb"] = round(frame_bytes / 1e9, 3)

    cfg = Config()
    cfg.net_hyperparams.latent_dim = 32
    cfg.grid_dim = args.grid_dim
    cfg.seed = args.seed
    cfg.max_store_rays_per_cat = args.cap_rays
    cfg.max_store_rays_bg = args.cap_bg
    result["cap_rays_per_cat"] = args.cap_rays
    result["cap_rays_bg"] = args.cap_bg

    # Loader/session build = ray-cache construction for every instance +
    # background over all keyframes (the reference's sceneCategory setup,
    # src/scene_cateogries.py:119-260).
    t0 = time.time()
    from catnerf_tpu.utils import phase_timings, reset_phase_timings

    reset_phase_timings()
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    result["session_build_s"] = round(time.time() - t0, 1)
    result["session_phase_s"] = phase_timings("session")
    result["n_categories_loaded"] = len(sess.cls_ids)

    cat_rays = sum(c.buffer.n for c in sess.categories)
    bg_rays = sess.background.buffer.n if sess.background else 0
    host_bytes = sum(
        sum(a.nbytes for a in c.buffer.arrays.values())
        for c in sess.categories)
    if sess.background:
        host_bytes += sum(a.nbytes
                          for a in sess.background.buffer.arrays.values())
    result["cat_rays_total"] = int(cat_rays)
    result["bg_rays_total"] = int(bg_rays)
    result["host_ray_buffer_gb"] = round(host_bytes / 1e9, 3)

    # Device store upload (the superstep fast path's resident buffers).
    t0 = time.time()
    sess.enable_fast_path(n_inner=100)
    import jax

    jax.block_until_ready(sess._store.packed)
    result["fast_path_setup_s"] = round(time.time() - t0, 1)
    fp = dict(phase_timings("fast_path"))
    # the block_until_ready above is the store-upload WAIT: total setup
    # minus the attributed host phases
    fp["store_upload_wait"] = round(
        result["fast_path_setup_s"] - sum(fp.values()), 2)
    result["fast_phase_s"] = fp
    store = sess._store
    dev_bytes = store.packed.nbytes + (
        store.bg_packed.nbytes if store.bg_packed is not None else 0)
    result["device_store_gb"] = round(dev_bytes / 1e9, 3)

    # Training at the reference budget.
    iters = max(100, args.iters // 100 * 100)
    n_cls = len(sess.cls_ids)
    samples_per_step = (
        sess.n_per_cls * n_cls * (cfg.n_bins + cfg.n_bins_cam2surface)
        + cfg.n_per_optim_bg * (cfg.n_bins + cfg.n_bins_cam2surface_bg))
    t0 = time.time()
    m = sess.run_fast(100)           # includes compile
    result["first_100_iters_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    psnr = None
    for _ in range((iters - 100) // 100):
        m = sess.run_fast(100)
    import jax.numpy as jnp  # noqa: F401

    psnr = float(np.asarray(m.cat_psnr).mean())
    total = float(np.asarray(m.total))   # device->host sync = honest timing
    train_s = time.time() - t0
    result["train_iters_s"] = round(train_s, 1)
    result["steps_per_sec"] = round((iters - 100) / train_s, 1)
    result["samples_per_sec"] = round(
        (iters - 100) * samples_per_step / train_s / 1e6, 1)
    result["samples_per_step"] = int(samples_per_step)
    result["final_psnr"] = round(psnr, 2)
    result["final_total"] = round(total, 1)
    assert np.isfinite(total), "non-finite loss at scale"

    # Mesh-all at the requested grid cap.
    out_dir = tempfile.mkdtemp(prefix="stress_mesh_")
    t0 = time.time()
    if args.mesh_objects:
        only = [s.inst_id for s in scene.spheres[:args.mesh_objects]]
    else:
        only = None
    from catnerf_tpu.mesher import meshing as _meshing

    _meshing.reset_mesh_timings()
    written = mesh_scene(sess, out_dir, iters, only_objects=only)
    result["mesh_all_s"] = round(time.time() - t0, 1)
    result["mesh_phase_s"] = _meshing.mesh_timings()
    result["n_meshed"] = len(written)
    result["peak_host_rss_gb"] = round(rss_gb(), 2)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
