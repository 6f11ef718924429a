"""Format the strict-parity attribution matrix into the BASELINE table.

Reads the per-run JSONs from scripts/attribution_matrix.py's workdir and
prints a markdown table per dataset: strict baseline, each strict+flag
row with its recovery delta, and the known default-path composite for
comparison — so the composite strict-parity failure decomposes into
measured per-flag effects (VERDICT r3 item #1).

Usage: python scripts/attribution_report.py [--workdir /tmp/attr_matrix]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

# default-path composites (all flags ON, fast dispatch) for reference,
# from BASELINE.md round-3 rows
DEFAULT_COMPOSITE = {
    "scannet": (1.006, 0.984, 100.0),
    "replica": (0.923, 0.946, 100.0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/attr_matrix")
    args = ap.parse_args()

    rows = {}
    for path in glob.glob(os.path.join(args.workdir, "*.json")):
        name = os.path.splitext(os.path.basename(path))[0]
        if name == "summary":
            continue
        with open(path) as f:
            rows[name] = json.load(f)

    for ds in ("scannet", "replica"):
        base = rows.get(f"{ds}_strict_baseline")
        if base is None:
            continue
        b_acc = base["mean_accuracy_cm"]
        b_com = base["mean_completion_cm"]
        b_rat = base["mean_completion_ratio_pct"]
        print(f"\n### {ds} (strict baseline {b_acc} cm / {b_com} cm / "
              f"{b_rat}%)\n")
        print("| strict + flag | acc (cm) | comp (cm) | ratio (%) | "
              "d_acc | d_ratio |")
        print("|---|---|---|---|---|---|")
        for name in sorted(rows):
            if not name.startswith(f"{ds}_plus_"):
                continue
            r = rows[name]
            flag = name[len(f"{ds}_plus_"):]
            print(f"| {flag} | {r['mean_accuracy_cm']} | "
                  f"{r['mean_completion_cm']} | "
                  f"{r['mean_completion_ratio_pct']} | "
                  f"{round(r['mean_accuracy_cm'] - b_acc, 3)} | "
                  f"{round(r['mean_completion_ratio_pct'] - b_rat, 2)} |")
        d_acc, d_com, d_rat = DEFAULT_COMPOSITE[ds]
        print(f"| ALL flags (default path, r3 row) | {d_acc} | {d_com} | "
              f"{d_rat} | {round(d_acc - b_acc, 3)} | "
              f"{round(d_rat - b_rat, 2)} |")


if __name__ == "__main__":
    main()
