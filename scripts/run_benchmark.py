"""Benchmark-suite driver: train + mesh + eval every reference scene.

The reference's workflow is manual (train each scene, then run
metric/eval_3D_obj.py per dataset — README.md:60-78). This driver automates
it over the 12 shipped configs:

  python scripts/run_benchmark.py --dataset Replica --data_root Datasets \
      --log_root logs [--scenes room_0 office_0] [--max-iter 10001]

Emits per-scene eval JSON via catnerf_tpu.metrics.eval_scene at the end.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["Replica", "ScanNet"],
                    default="Replica")
    ap.add_argument("--data_root", required=True,
                    help="root holding the scene data dirs")
    ap.add_argument("--log_root", default="logs")
    ap.add_argument("--scenes", nargs="*", default=None,
                    help="scene names (default: all configs)")
    ap.add_argument("--max-iter", type=int, default=None)
    args = ap.parse_args()

    configs = sorted(glob.glob(
        os.path.join(REPO, "configs", args.dataset, "*.json")))
    if args.scenes:
        configs = [c for c in configs
                   if any(s in os.path.basename(c) for s in args.scenes)]
    if not configs:
        sys.exit(f"no configs matched under configs/{args.dataset}")

    for cfg_path in configs:
        scene = os.path.basename(cfg_path).replace("config_", "")\
            .replace(".json", "")
        logdir = os.path.join(args.log_root, args.dataset, scene)
        cmd = [sys.executable, os.path.join(REPO, "train.py"),
               "--config", cfg_path, "--logdir", logdir]
        if args.max_iter is not None:
            cmd += ["--max-iter", str(args.max_iter)]
        print("==>", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True)

    eval_cmd = [sys.executable, "-m", "catnerf_tpu.metrics.eval_scene",
                "--data_dir", args.data_root,
                "--log_dir", os.path.join(args.log_root, args.dataset)]
    print("==>", " ".join(eval_cmd), flush=True)
    subprocess.run(eval_cmd, check=True)


if __name__ == "__main__":
    main()
