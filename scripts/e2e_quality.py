"""End-to-end quality gate: train on a synthetic scene, mesh every object,
and score reconstructions against the analytic ground truth.

The synthetic scene is made of spheres with known centers/radii, so GT
surface points are exact. Prints one JSON line with per-object and mean
accuracy / completion (cm) and completion ratio (<5 cm, %), mirroring the
reference's eval protocol (ref: metric/eval_3D_obj.py:28-34).

With --registered, the scene is first serialized to an on-disk Replica
layout and loaded through the REAL pipeline — dataset loader, point-cloud
accumulation, self-pretrained uncertainty fields, TEASER-style multi-init
alignment, subcategorization — so training uses ESTIMATED object poses
instead of ground truth. This validates registration quality end-to-end:
mesh errors then include any pose misalignment.

Usage: python scripts/e2e_quality.py [--iters 10000] [--grid-dim 128] [--registered]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10000)
    ap.add_argument("--grid-dim", type=int, default=128)
    ap.add_argument("--out", default="")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--registered", action="store_true",
                    help="run the full registration pipeline (estimated "
                         "poses) instead of using ground-truth object poses")
    ap.add_argument("--parity", action="store_true",
                    help="train with the reference's sampling semantics "
                         "(per-epoch shuffle cursor, one dispatch per step) "
                         "instead of the superstep fast path, to measure "
                         "fast-vs-parity convergence equivalence")
    ap.add_argument("--strict-parity", action="store_true",
                    help="composite head-to-head mode: apply the full "
                         "strict-parity flag set (Config.apply_strict_parity "
                         "— every algorithmic-improvement flag off, "
                         "reference semantics) AND parity dispatch; records "
                         "the joint reference-semantics gate result next to "
                         "the default-path numbers (VERDICT r2 item #4)")
    ap.add_argument("--flag", action="append", default=[],
                    metavar="NAME=VALUE",
                    help="Config override applied AFTER --strict-parity "
                         "(repeatable), e.g. --flag seg_propagation_rounds=3 "
                         "— the strict->+flag attribution matrix flips one "
                         "divergence flag ON at a time from the strict "
                         "baseline (VERDICT r3 item #1). Bools as 0/1.")
    ap.add_argument("--dispatch", choices=("parity", "fast"), default=None,
                    help="override the dispatch mode implied by "
                         "--parity/--strict-parity (lets the attribution "
                         "matrix measure fast dispatch from the strict "
                         "baseline)")
    ap.add_argument("--no-refined-mask", action="store_true",
                    help="scannet only: skip the geometric-segmentation "
                         "mask refinement (raw instance masks)")
    ap.add_argument("--fit-holdout", action="store_true",
                    help="hold one instance OUT of training, then run the "
                         "full new-instance path on it: register its cloud "
                         "to the trained category's canonical union "
                         "(registration.register_new_instance), fit only "
                         "latent codes (+ sim(3) pose) against the frozen "
                         "MLP (catnerf_tpu/fit.py), and score its mesh with "
                         "the standard protocol. Uses 3 instances/category "
                         "so the held-out category stays multi-instance.")
    ap.add_argument("--shapes", choices=("sphere", "asym", "mixed"),
                    default="sphere",
                    help="synthetic shape families: sphere (original "
                         "rotation-invariant gate), asym (ellipsoid/blob/"
                         "notched-box with real rotations — registration "
                         "rotation error observable), mixed (both)")
    ap.add_argument("--dataset", choices=("replica", "scannet"),
                    default="replica",
                    help="on-disk layout + loader for --registered: replica "
                         "(unprojection accumulation) or scannet (TSDF "
                         "fusion, geometric-segmentation mask refinement, "
                         "inf-pose skipping; ref: src/dataset.py:188-439)")
    args = ap.parse_args()

    from catnerf_tpu.config import Config
    from catnerf_tpu.data.scene import OrientedBBox
    from catnerf_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from catnerf_tpu.data.synthetic import make_scene
    from catnerf_tpu.mesher.mesh import TriMesh, load_mesh
    from catnerf_tpu.mesher.meshing import mesh_scene
    from catnerf_tpu.metrics.metrics3d import calc_3d_metric
    from catnerf_tpu.native.lib import geomlib
    from catnerf_tpu.train.loop import TrainingSession

    def gt_shape_mesh(shape, n=64):
        """Analytic GT surface for any synthetic shape: marching cubes on
        the object-frame SDF (sigmoid-occupancy, same recipe and numerics
        the sphere-only gate used), vertices posed into the world. For a
        Sphere this reproduces the original gt_sphere_mesh exactly."""
        ext = np.asarray(shape.object_extent, np.float64)
        axes = [np.linspace(-0.65 * e, 0.65 * e, n) for e in ext]
        X, Y, Z = np.meshgrid(*axes, indexing="ij")
        p = np.stack([X, Y, Z], -1).reshape(-1, 3)
        sdf = shape.sdf_obj(p).reshape(n, n, n)
        sref = float(np.max(ext)) / 2.0
        occ = 1.0 / (1.0 + np.exp(sdf * 40.0 / sref))
        v, f = geomlib.marching_cubes(occ.astype(np.float32), 0.5)
        v = v / (n - 1) * 1.3 * ext - 0.65 * ext
        v = v @ np.asarray(shape.R, np.float64).T + np.asarray(shape.center)
        return TriMesh(v, f)

    def score_sphere(rec_mesh, sp):
        """GT-shape eval under the reference protocol (accuracy on the
        rec mesh cropped to the GT OBB, ref: metric/eval_3D_obj.py:15-27)
        — the ONE scoring recipe for trained and fitted meshes, so the two
        paths cannot silently diverge. Returns (raw metrics, rounded
        JSON dict)."""
        obb = OrientedBBox(center=np.asarray(sp.center, np.float64),
                           R=np.asarray(sp.R, np.float64),
                           extent=1.1 * np.asarray(sp.object_extent,
                                                   np.float64))
        m = calc_3d_metric(rec_mesh, gt_shape_mesh(sp), ref_obb=obb)
        return m, {"accuracy_cm": round(m["accuracy"], 3),
                   "completion_cm": round(m["completion"], 3),
                   "completion_ratio_pct": round(m["completion_ratio"], 2)}

    cfg = Config()
    cfg.net_hyperparams.latent_dim = 32
    cfg.grid_dim = args.grid_dim  # live_voxel_size stays 5 mm; the cap rules
    if args.strict_parity:
        cfg.apply_strict_parity()
        args.parity = True  # strict parity implies parity dispatch
    for ov in args.flag:
        name, _, val = ov.partition("=")
        if not hasattr(cfg, name):
            raise SystemExit(f"--flag: Config has no attribute {name!r}")
        cur = getattr(cfg, name)
        if isinstance(cur, bool):
            setattr(cfg, name, bool(int(val)))
        elif isinstance(cur, int):
            setattr(cfg, name, int(val))
        elif isinstance(cur, float):
            setattr(cfg, name, float(val))
        else:
            setattr(cfg, name, val)
    if args.dispatch is not None:
        args.parity = args.dispatch == "parity"

    scene = make_scene(n_frames=24, width=160, height=120, n_categories=3,
                       insts_per_cat=3 if args.fit_holdout else 2,
                       seed=args.seed, shape_family=args.shapes)

    held_out = None
    if args.fit_holdout:
        import copy

        held_cls = sorted(c for c in scene.inst_dict if c != 0)[0]
        held_out = sorted(scene.inst_dict[held_cls])[-1]
        inst_dict_train = copy.deepcopy(scene.inst_dict)
        del inst_dict_train[held_cls][held_out]
        print(f"holding out instance {held_out} of category {held_cls}",
              file=sys.stderr)
    # loader-frame ids of the held-out instance/category (the ScanNet
    # loader remaps inst +1 / cls + CLS_OFFSET); updated below
    held_out_l = held_out
    held_cls_l = held_cls if held_out is not None else None
    data_full = None   # full-layout loader (registered fit-holdout)

    if args.registered:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
        data_dir = tempfile.mkdtemp(prefix=f"e2e_registered_{args.dataset}_")
        cfg.dataset_dir = data_dir
        cfg.width, cfg.height = 160, 120
        cfg.fx = cfg.fy = scene.cam.fx
        cfg.cx, cfg.cy = scene.cam.cx, scene.cam.cy
        cfg.load_pretrained = False   # self-pretrained uncertainty fields
        # Registered fit-holdout (VERDICT r4 item #7): the held-out
        # instance is erased from the TRAINING layout's instance masks
        # (the loader never sees it — it takes no part in registration,
        # canonical-frame establishment, or training), while a second
        # FULL layout provides its loader-grade observations (eroded-mask
        # clouds + bbox crops) for the new-instance path.
        scene_train = scene
        if held_out is not None:
            import copy as _copy

            scene_train = _copy.deepcopy(scene)
            for s_ in scene_train.sample_dict.values():
                m = s_["obj_mask"]
                m[m == held_out] = 0
        if args.dataset == "scannet":
            from test_scannet_fixture import CLS_OFFSET, write_scannet_layout

            from catnerf_tpu.data.scannet import ScanNet

            cfg.dataset_format = "ScanNet"
            cfg.mw = cfg.mh = 4            # edge crop (ref: cfg mw=10)
            cfg.use_refined_mask = not args.no_refined_mask
            write_scannet_layout(scene_train, data_dir, cfg.depth_scale)
            # corrupt one pose to exercise inf-pose frame skipping
            # (ref: src/dataset.py:295-301)
            inf_frame = max(scene.sample_dict.keys())
            np.savetxt(os.path.join(data_dir, "pose", f"{inf_frame}.txt"),
                       np.full((4, 4), np.inf))
            print("running full ScanNet registration pipeline...",
                  file=sys.stderr)
            data = ScanNet(cfg)
            if held_out is not None:
                import copy as _copy

                full_dir = tempfile.mkdtemp(prefix="e2e_fitreg_full_")
                write_scannet_layout(scene, full_dir, cfg.depth_scale)
                np.savetxt(os.path.join(full_dir, "pose",
                                        f"{inf_frame}.txt"),
                           np.full((4, 4), np.inf))
                cfg_full = _copy.deepcopy(cfg)
                cfg_full.dataset_dir = full_dir
                data_full = ScanNet(cfg_full, run_registration=False)
                held_out_l = held_out + 1
                held_cls_l = held_cls + CLS_OFFSET
            # loader remaps: inst +1, cls + CLS_OFFSET; remap eval targets
            for s in scene.spheres:
                s.inst_id += 1
                s.cls_id += CLS_OFFSET
        else:
            from test_replica_fixture import write_replica_layout

            from catnerf_tpu.data.replica import Replica

            write_replica_layout(scene_train, data_dir, cfg.depth_scale)
            print("running full registration pipeline...", file=sys.stderr)
            data = Replica(cfg)
            if held_out is not None:
                import copy as _copy

                full_dir = tempfile.mkdtemp(prefix="e2e_fitreg_full_")
                write_replica_layout(scene, full_dir, cfg.depth_scale)
                cfg_full = _copy.deepcopy(cfg)
                cfg_full.dataset_dir = full_dir
                data_full = Replica(cfg_full, run_registration=False)
        inst_dict, sample_dict = data.inst_dict, data.sample_dict
        sess = TrainingSession(cfg, inst_dict, sample_dict)
    else:
        sess = TrainingSession(
            cfg, inst_dict_train if held_out is not None else scene.inst_dict,
            scene.sample_dict, cam=scene.cam)
    import time as _time

    iters = max(100, args.iters // 100 * 100)  # superstep granularity
    psnr_hist = []
    t_train = _time.time()
    if args.parity:
        def step_100():
            m = None
            for _ in range(100):
                m = sess.step_once()
            return m
    else:
        sess.enable_fast_path(n_inner=100)

        def step_100():
            return sess.run_fast(100)
    # ONE chunk loop for both modes: the --parity vs fast comparison must
    # read identical telemetry
    for chunk in range(iters // 100):
        m = step_100()
        psnr_hist.append(round(float(m.cat_psnr.mean()), 2))
        if chunk == 0:
            print(f"first 100 iters (incl. compile): "
                  f"{_time.time() - t_train:.1f}s", file=sys.stderr)
    print(f"trained {iters} iters in {_time.time() - t_train:.1f}s",
          file=sys.stderr)
    print(f"psnr trajectory (per 100 iters): {psnr_hist}", file=sys.stderr)

    out_dir = args.out or tempfile.mkdtemp(prefix="e2e_quality_")
    written = mesh_scene(sess, out_dir, iters)

    per_obj = {}
    accs, comps, ratios = [], [], []
    for s in scene.spheres:
        if held_out is not None and s.inst_id == held_out_l:
            continue  # scored separately through the fit path below
        path = written.get(s.inst_id)
        if path is None:
            per_obj[s.inst_id] = None
            continue
        m, per_obj[s.inst_id] = score_sphere(load_mesh(path), s)
        accs.append(m["accuracy"])
        comps.append(m["completion"])
        ratios.append(m["completion_ratio"])

    # Image-space readout: composite ALL trained fields from two dataset
    # poses (catnerf_tpu.render_views) and score true MSE PSNR against the
    # GT frames — appearance fidelity, complementing the mesh metrics (and a
    # regression check on the renderer itself).
    from catnerf_tpu.render_views import render_scene_view, scene_far

    render_psnrs = []
    far = scene_far(sess)
    rframes = sorted(sess.sample_dict.keys())
    for fr in {rframes[0], rframes[len(rframes) // 2]}:
        T = np.asarray(sess.sample_dict[fr]["T"], np.float32)
        img, _, _ = render_scene_view(sess, T, sess.cam, near=0.1, far=far,
                                      n_bins=64)
        gt = np.asarray(sess.sample_dict[fr]["image"], np.float32) / 255.0
        mse = float(np.mean((img - gt) ** 2))
        render_psnrs.append(round(-10.0 * np.log10(max(mse, 1e-10)), 2))

    fit_result = None
    if held_out is not None:
        from catnerf_tpu.fit import fit_instance
        from catnerf_tpu.geometry.pointcloud import accumulate_pointcloud
        from catnerf_tpu.geometry.registration import register_new_instance
        from catnerf_tpu.mesher.meshing import adaptive_grid_dim, mesh_field

        t_fit = _time.time()
        if args.registered:
            # Registered path (VERDICT r4 item #7): templates are the
            # TRAINED instances' loader-grade (eroded-mask) clouds with
            # their ESTIMATED sim(3) poses; the held-out cloud and bbox
            # crops come from the full-layout loader. These are the
            # new-instance flow's hardest inputs: nothing here touches GT.
            from catnerf_tpu.native.lib import geomlib

            def _loader_cloud(oid):
                info_f = data_full.inst_dict[held_cls_l][oid]
                pcs = info_f.get("pcs")
                if pcs is None:
                    return accumulate_pointcloud(
                        oid, info_f["frame_info"], data_full.sample_dict,
                        sess.cam)
                # same 0.01 voxel grid get_all_poses feeds registration
                return geomlib.voxel_downsample(
                    np.asarray(pcs, np.float32), 0.01)

            trained = data.inst_dict.get(held_cls_l, {})
            if held_cls_l not in sess.cls_ids or len(trained) < 1:
                raise SystemExit(
                    f"fit-holdout: category {held_cls_l} was split or "
                    f"dropped during registration (trained ids "
                    f"{sorted(data.inst_dict)}); no trained multi-"
                    f"instance category to adopt into")
            registered = [(_loader_cloud(oid), info_o["T_obj"])
                          for oid, info_o in sorted(trained.items())]
            pcs_new = _loader_cloud(held_out_l)
            fi_new = data_full.inst_dict[held_cls_l][held_out_l][
                "frame_info"]
            sdict_fit = data_full.sample_dict
        else:
            registered = []
            for oid in sorted(scene.inst_dict[held_cls]):
                if oid == held_out:
                    continue
                info_o = scene.inst_dict[held_cls][oid]
                registered.append((accumulate_pointcloud(
                    oid, info_o["frame_info"], scene.sample_dict, sess.cam),
                    info_o["T_obj"]))
            info_gt = scene.inst_dict[held_cls][held_out]
            pcs_new = accumulate_pointcloud(
                held_out, info_gt["frame_info"], scene.sample_dict,
                sess.cam)
            fi_new = info_gt["frame_info"]
            sdict_fit = scene.sample_dict
        T_est, reg_cd = register_new_instance(registered, pcs_new)
        T_gt = np.asarray(scene.inst_dict[held_cls][held_out]["T_obj"],
                          np.float64)
        s_gt = abs(np.linalg.det(T_gt[:3, :3])) ** (1 / 3)

        res = fit_instance(sess, held_cls_l, fi_new,
                           sdict_fit, sess.cam, T_est, held_out_l,
                           steps=1000, optimize_pose=True)
        params = sess.category_params(held_cls_l)
        dim = adaptive_grid_dim(res.extent, cfg.live_voxel_size,
                                cfg.grid_dim)
        fmesh = mesh_field(params, cfg, grid_dim=dim, is_background=False,
                           shape_code=res.shape_code,
                           texture_code=res.texture_code, extent=res.extent)
        fit_metrics = None
        if fmesh is not None:
            # canonical -> scene: one affine (apply_transform is a general
            # affine multiply; no need to split scale and rigid parts)
            fmesh.apply_transform(np.asarray(res.T_obj, np.float64))
            sp = next(s for s in scene.spheres if s.inst_id == held_out_l)
            _, fit_metrics = score_sphere(fmesh, sp)
        fit_result = {
            "held_out": held_out_l,
            "path": "registered" if args.registered else "gt_pose",
            "registration_chamfer": round(reg_cd, 4),
            "pose_center_err_cm": round(100.0 * float(
                np.linalg.norm(res.T_obj[:3, 3] - T_gt[:3, 3])), 3),
            "pose_scale_err_pct": round(100.0 * abs(
                abs(np.linalg.det(res.T_obj[:3, :3])) ** (1 / 3) - s_gt)
                / s_gt, 2),
            "fit_steps": res.steps,
            "psnr_prior_init": round(res.init_psnr, 2),
            "psnr_after_fit": round(res.final_psnr, 2),
            "mesh": fit_metrics,
            "wall_s": round(_time.time() - t_fit, 1),
        }
        print(f"fit-holdout: {fit_result}", file=sys.stderr)

    result = {
        "metric": (("e2e_synthetic_quality_registered"
                    + ("_scannet" if args.dataset == "scannet" else ""))
                   if args.registered else
                   ("e2e_fit_holdout" if held_out is not None
                    else "e2e_synthetic_quality")),
        "iters": iters,
        "final_psnr": psnr_hist[-1] if psnr_hist else None,
        "mean_accuracy_cm": round(float(np.mean(accs)), 3) if accs else None,
        "mean_completion_cm": round(float(np.mean(comps)), 3) if comps else None,
        "mean_completion_ratio_pct": (round(float(np.mean(ratios)), 2)
                                      if ratios else None),
        "n_meshed": len(accs),
        "n_objects": len(scene.spheres),
        "per_object": per_obj,
        "render_psnr": render_psnrs,
        "seed": args.seed,
        "shapes": args.shapes,
        "sampling": ("strict-parity" if args.strict_parity
                     else "parity" if args.parity else "fast"),
        "flag_overrides": args.flag,
        "dispatch_override": args.dispatch,
        "mesh_dir": out_dir,
    }
    if fit_result is not None:
        result["fit_holdout"] = fit_result
    print(json.dumps(result))
    n_trained = len(scene.spheres) - (1 if held_out is not None else 0)
    ok = (len(accs) == n_trained
          and result["mean_accuracy_cm"] < 5.0
          and result["mean_completion_cm"] < 5.0
          and result["mean_completion_ratio_pct"] > 80.0)
    if fit_result is not None:
        ok = (ok and fit_result["mesh"] is not None
              and fit_result["mesh"]["accuracy_cm"] < 5.0
              and fit_result["psnr_after_fit"] > fit_result["psnr_prior_init"])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
