"""Strict-parity attribution matrix driver (VERDICT r3 item #1).

From the strict-parity baseline on the registered gates (seed-matched),
flip each divergence flag ON one at a time and record the recovery, so the
composite strict-parity result (r3: ScanNet 3.335 cm / 62.91%, Replica
1.352 / 90.54%) decomposes into known per-flag effects. Any residual that
the per-flag effects cannot explain is either a strict-mode interaction
bug (fix) or a compounding effect (explain in BASELINE.md).

Reference semantics attributed: the PARITY.md divergence table —
rigid-only registration (src/category_registration.py:257-267), hard mask
relabel (src/dataset.py:330-360), single-hop propagation
(src/utils.py:643-671), raw iso-surface meshing (src/trainer.py:62-151).

Runs sequentially on the one TPU chip; each result JSON is cached in
--workdir so the matrix is restartable. ~10 min per run x 14 runs.

Usage: python scripts/attribution_matrix.py [--workdir /tmp/attr_matrix]
       [--only scannet|replica] [--seed 0]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_runs(seed: int, only: str | None):
    runs = []
    for ds in ("scannet", "replica"):
        if only and ds != only:
            continue
        flags = ["scale_aware_registration=1", "mesh_fill_interior=1",
                 "mesh_adaptive_bounds=1", "mesh_space_carving=1"]
        if ds == "scannet":
            # segmentation flags only exist on the ScanNet path
            flags += ["refined_mask_unknown=1", "seg_propagation_rounds=3"]
        runs.append((f"{ds}_strict_baseline", ds, []))
        for f in flags:
            runs.append((f"{ds}_plus_{f.split('=')[0]}", ds, ["--flag", f]))
        runs.append((f"{ds}_plus_fast_dispatch", ds, ["--dispatch", "fast"]))
        # Combination rows: test the interaction hypothesis that the
        # segmentation flags GATE the others (scale-aware registration on
        # rim-eroded strict clouds measured 7.5 cm vs 3.3 strict baseline)
        if ds == "scannet":
            seg = ["--flag", "refined_mask_unknown=1",
                   "--flag", "seg_propagation_rounds=3"]
            runs.append((f"{ds}_combo_seg", ds, seg))
            runs.append((f"{ds}_combo_seg_scale", ds,
                         seg + ["--flag", "scale_aware_registration=1"]))
            runs.append((f"{ds}_combo_seg_scale_mesh", ds,
                         seg + ["--flag", "scale_aware_registration=1",
                                "--flag", "mesh_fill_interior=1",
                                "--flag", "mesh_adaptive_bounds=1",
                                "--flag", "mesh_space_carving=1"]))
        else:
            runs.append((f"{ds}_combo_scale_mesh", ds,
                         ["--flag", "scale_aware_registration=1",
                          "--flag", "mesh_fill_interior=1",
                          "--flag", "mesh_adaptive_bounds=1",
                          "--flag", "mesh_space_carving=1"]))
    return runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/attr_matrix")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--only", choices=("scannet", "replica"), default=None)
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-run timeout (s); generous for axon tunnel "
                         "compile stalls")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    runs = build_runs(args.seed, args.only)
    results = {}
    for name, ds, extra in runs:
        out_path = os.path.join(args.workdir, f"{name}.json")
        log_path = os.path.join(args.workdir, f"{name}.log")
        if os.path.exists(out_path):
            with open(out_path) as f:
                results[name] = json.load(f)
            print(f"[cached] {name}: acc={results[name]['mean_accuracy_cm']} "
                  f"ratio={results[name]['mean_completion_ratio_pct']}",
                  flush=True)
            continue
        cmd = [sys.executable, os.path.join(REPO, "scripts/e2e_quality.py"),
               "--registered", "--dataset", ds, "--strict-parity",
               "--seed", str(args.seed)] + extra
        t0 = time.time()
        print(f"[run] {name}: {' '.join(cmd[1:])}", flush=True)
        with open(log_path, "w") as lf:
            proc = subprocess.run(cmd, stdout=subprocess.PIPE, stderr=lf,
                                  timeout=args.timeout, cwd=REPO)
        # gate exit code is its own pass/fail (the strict baseline FAILS
        # its gate by design); the JSON line is the measurement
        line = proc.stdout.decode().strip().splitlines()
        try:
            rec = json.loads(line[-1]) if line else None
        except json.JSONDecodeError:
            rec = None
        if rec is None:
            print(f"[FAIL] {name}: no JSON output (see {log_path})",
                  flush=True)
            continue
        rec["gate_exit"] = proc.returncode
        rec["wall_s"] = round(time.time() - t0, 1)
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)
        results[name] = rec
        print(f"[done] {name}: acc={rec['mean_accuracy_cm']} "
              f"comp={rec['mean_completion_cm']} "
              f"ratio={rec['mean_completion_ratio_pct']} "
              f"({rec['wall_s']}s)", flush=True)

    # summary table
    print("\n=== strict->+flag attribution matrix ===")
    for ds in ("scannet", "replica"):
        rows = {k: v for k, v in results.items() if k.startswith(ds)}
        if not rows:
            continue
        base = rows.get(f"{ds}_strict_baseline")
        print(f"\n{ds} (strict baseline: "
              f"{base['mean_accuracy_cm'] if base else '?'} cm / "
              f"{base['mean_completion_ratio_pct'] if base else '?'}%):")
        for k, v in sorted(rows.items()):
            d_acc = (round(v["mean_accuracy_cm"] - base["mean_accuracy_cm"],
                           3) if base else None)
            d_rat = (round(v["mean_completion_ratio_pct"]
                           - base["mean_completion_ratio_pct"], 2)
                     if base else None)
            print(f"  {k:45s} acc={v['mean_accuracy_cm']:7.3f} "
                  f"ratio={v['mean_completion_ratio_pct']:6.2f} "
                  f"d_acc={d_acc} d_ratio={d_rat}")
    summary = os.path.join(args.workdir, "summary.json")
    with open(summary, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {summary}")


if __name__ == "__main__":
    main()
