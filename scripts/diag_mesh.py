"""Per-object mesh vertex-error analysis against the synthetic analytic GT.

Takes an e2e_quality gate result (the JSON line it prints, or a log file
containing it) and reports, per exported object mesh, the signed-distance
distribution of its vertices to the GT sphere: median/p99/max absolute
error, the worst OUTWARD error (floaters / spurious geometry) and the
worst INWARD error (craters / holes in never-observed regions), and the
fraction of vertices beyond 3 cm.

This is the diagnostic that localized the ScanNet gate's 1.75 cm outlier
to 21 cm inward craters (fixed by the >=4-axis visual-hull fill): mean
accuracy numbers say *that* an object is bad; the inward/outward split
says *why*.

  python scripts/diag_mesh.py /tmp/gate_xyz.log [--seed 0]
  python scripts/diag_mesh.py '<gate json line>'
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("gate", help="gate log file or the JSON line itself")
    ap.add_argument("--seed", type=int, default=None,
                    help="scene seed (default: the gate JSON's seed)")
    args = ap.parse_args()

    text = (open(args.gate).read() if os.path.exists(args.gate)
            else args.gate)
    line = [l for l in text.strip().splitlines() if l.startswith("{")][-1]
    gate = json.loads(line)
    mesh_dir = gate["mesh_dir"]
    seed = args.seed if args.seed is not None else gate.get("seed", 0)
    iters = gate["iters"]
    scannet = "scannet" in gate["metric"]

    from catnerf_tpu.data.synthetic import make_scene
    from catnerf_tpu.mesher.mesh import load_mesh

    # the gate's scene recipe (scripts/e2e_quality.py)
    scene = make_scene(n_frames=24, width=160, height=120, n_categories=3,
                       insts_per_cat=2, seed=seed,
                       shape_family=gate.get("shapes", "sphere"))
    shapes = {s.inst_id: s for s in scene.spheres}

    print(f"{'obj':>5} {'verts':>7} {'p50':>6} {'p99':>6} {'max':>6} "
          f"{'out_max':>8} {'in_max':>7} {'>3cm':>7}   (cm)")
    for obj_key in sorted(gate["per_object"], key=int):
        fid = int(obj_key)
        path = os.path.join(mesh_dir, f"iteration_{iters}_obj{fid}.obj")
        if not os.path.exists(path):
            print(f"{fid:>5} missing mesh {path}")
            continue
        # ScanNet loader ids are raw instance ids + 1
        gt_id = fid - 1 if scannet else fid
        if gt_id not in shapes:
            print(f"{fid:>5} no GT shape for id {gt_id}")
            continue
        m = load_mesh(path)
        d = shapes[gt_id].sdf(m.vertices)
        a = np.abs(d)
        print(f"{fid:>5} {len(m.vertices):>7} {np.percentile(a, 50)*100:6.2f} "
              f"{np.percentile(a, 99)*100:6.2f} {a.max()*100:6.1f} "
              f"{d.max()*100:8.1f} {-d.min()*100:7.1f} "
              f"{np.mean(a > 0.03):7.4f}")


if __name__ == "__main__":
    main()
