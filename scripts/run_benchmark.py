"""Benchmark-suite driver: train + mesh + eval every reference scene.

The reference's workflow is manual (train each scene, then run
metric/eval_3D_obj.py per dataset — README.md:60-78). This driver automates
it over the shipped configs. Scene names are derived from each config's
dataset path (e.g. Datasets/Replica/room_0/sequences -> room_0), matching
the layout catnerf_tpu.metrics.eval_scene expects
(<log_root>/<dataset>/<scene>/scene_mesh and <data_root>/<dataset>/<scene>/habitat).

  python scripts/run_benchmark.py --dataset Replica --data_root Datasets \
      --log_root logs [--scenes room_0 office_0] [--max-iter 2001]

All subprocesses run with cwd at the repo root; relative dataset paths in
the configs resolve from there.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def scene_name(cfg_path: str) -> str:
    """Scene dir name from the config's dataset path
    (…/<scene>/sequences -> <scene>; …/<scene> -> <scene>)."""
    with open(cfg_path) as f:
        ds_path = json.load(f)["dataset"]["path"].rstrip("/")
    parts = ds_path.split("/")
    return parts[-2] if parts[-1] == "sequences" else parts[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["Replica", "ScanNet"],
                    default="Replica")
    ap.add_argument("--data_root", required=True,
                    help="root holding <dataset>/<scene> data dirs")
    ap.add_argument("--log_root", default="logs")
    ap.add_argument("--scenes", nargs="*", default=None,
                    help="scene names, e.g. room_0 scene0013_02 "
                         "(default: all configs)")
    ap.add_argument("--max-iter", type=int, default=None,
                    help="shorten training; meshing and eval follow "
                         "(mesh at max_iter-1)")
    args = ap.parse_args()

    configs = sorted(glob.glob(
        os.path.join(REPO, "configs", args.dataset, "*.json")))
    pairs = [(scene_name(c), c) for c in configs]
    if args.scenes:
        available = {s for s, _ in pairs}
        missing = [s for s in args.scenes if s not in available]
        if missing:
            # a typo'd scene must not silently shrink the suite
            sys.exit(f"unknown scene(s) {missing} under configs/"
                     f"{args.dataset} (available: {sorted(available)})")
        pairs = [(s, c) for s, c in pairs if s in set(args.scenes)]
    if not pairs:
        sys.exit(f"no configs found under configs/{args.dataset}")

    mesh_iter = (args.max_iter - 1) if args.max_iter is not None else 10000

    def rebase_config(cfg_path: str, scene: str, logdir: str) -> str:
        """Re-anchor the config's dataset path at --data_root so training
        and eval read the SAME data (the shipped configs hardcode
        repo-relative Datasets/...)."""
        with open(cfg_path) as f:
            raw = json.load(f)
        parts = raw["dataset"]["path"].rstrip("/").split("/")
        tail = parts[parts.index(scene) + 1:] if scene in parts else []
        raw["dataset"]["path"] = os.path.join(
            args.data_root, args.dataset, scene, *tail)
        out = os.path.join(logdir, os.path.basename(cfg_path))
        os.makedirs(logdir, exist_ok=True)
        with open(out, "w") as f:
            json.dump(raw, f, indent=1)
        return out

    for scene, cfg_path in pairs:
        logdir = os.path.join(args.log_root, args.dataset, scene)
        cfg_path = rebase_config(cfg_path, scene, logdir)
        cmd = [sys.executable, os.path.join(REPO, "train.py"),
               "--config", cfg_path, "--logdir", logdir]
        if args.max_iter is not None:
            cmd += ["--max-iter", str(args.max_iter),
                    "--mesh-it", str(mesh_iter)]
        print("==>", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True, cwd=REPO)

    eval_cmd = [sys.executable, "-m", "catnerf_tpu.metrics.eval_scene",
                "--data_dir", os.path.join(args.data_root, args.dataset),
                "--log_dir", os.path.join(args.log_root, args.dataset),
                "--iteration", str(mesh_iter),
                "--scenes", *[s for s, _ in pairs]]
    print("==>", " ".join(eval_cmd), flush=True)
    subprocess.run(eval_cmd, check=True, cwd=REPO)


if __name__ == "__main__":
    main()
