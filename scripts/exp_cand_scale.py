"""A/B the candidate sim(3)-scale statistics on rim-eroded partial clouds.

Reproduces the r4 asym-ScanNet failure class on CPU (VERDICT r4 items 1+2):
TSDF accumulation + eroded segmentation masks drop the points near each
view's occluding contour (grazing incidence), so a partially observed
cloud is missing its rim bands. The r4 "obb" candidate statistic
(geometric-mean OBB half-extent, registration.py) under-measures such
clouds by 10-28%, pushing the acceptance chamfer past eta2 and
subcategorizing every instance (BASELINE.md:165).

For each asym family x seed x erosion severity this script builds a
well-observed template cloud and a rim-eroded source cloud of a DIFFERENT
instance with a known true relative scale, then prints the candidate-scale
ratio error of a panel of estimators.

Run: PYTHONPATH=. python scripts/exp_cand_scale.py
"""

import numpy as np

from catnerf_tpu.data.synthetic import _make_asym_shape
from catnerf_tpu.geometry.obb import get_pose_from_pointcloud


def eroded_view_cloud(shape, rng, n_views, graze_cos, band=None,
                      rays_per_view=6000):
    """Surface cloud from n_views viewpoints, dropping grazing-incidence
    hits (|cos| < graze_cos) — each view loses a band at its occluding
    contour, the 3D signature of TSDF + mask rim erosion. `band` restricts
    viewpoints to a latitude band (lo, hi) in [-1, 1] of the z direction,
    mimicking a camera trajectory that never sees the object's poles."""
    pts = []
    for _ in range(n_views):
        u = rng.normal(size=3)
        if band is not None:
            u[2] = 0.0
            u /= max(np.linalg.norm(u), 1e-9)
            z = rng.uniform(*band)
            u = np.array([u[0] * np.sqrt(1 - z * z),
                          u[1] * np.sqrt(1 - z * z), z])
        else:
            u /= max(np.linalg.norm(u), 1e-9)
        eye = shape.center + 2.5 * shape.bound_radius * u
        targets = shape.center + rng.uniform(
            -0.45, 0.45, (rays_per_view, 3)) * shape.bound_radius
        dirs = targets - eye
        t = shape.ray_cast(np.broadcast_to(eye, dirs.shape).copy(), dirs)
        hit = np.isfinite(t)
        if not hit.any():
            continue
        p = eye + t[hit, None] * dirs[hit]
        nrm = shape.normal(p)
        vd = p - eye
        vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
        cosi = -np.sum(nrm * vd, axis=-1)
        pts.append(p[cosi > graze_cos])
    return np.concatenate(pts) if pts else np.zeros((0, 3))


EROSIONS = {
    # (n_views, graze_cos, band) for the SOURCE cloud
    "mild": (8, 0.25, None),
    "medium": (5, 0.35, (0.0, 0.7)),
    "harsh": (3, 0.45, (0.1, 0.6)),
}


def make_pair(fam, seed, erosion, same_shape=True):
    """same_shape=True (default): the pair is the SAME shape at two
    size_factors, so the true ratio of ANY size statistic is exactly the
    size ratio and estimator error isolates EROSION robustness — the r4
    failure mechanism. same_shape=False keeps the original different-
    instance pairing, but then k_true (a max-extent ratio) is obb's own
    statistic by construction and the comparison is biased toward obb;
    kept only to show cross-shape spread."""
    rng = np.random.default_rng(seed)
    tmpl = _make_asym_shape(fam, rng, center=np.zeros(3),
                            color=np.full(3, 0.5), inst_id=1, cls_id=9,
                            k=0, size_factor=1.0)
    rng2 = np.random.default_rng(seed)  # same draws -> same shape
    src = _make_asym_shape(fam, rng2 if same_shape else rng,
                           center=np.array([1.4, -0.3, 0.5]),
                           color=np.full(3, 0.5), inst_id=2, cls_id=9,
                           k=0 if same_shape else 1,
                           size_factor=1.35 if same_shape else 1.0)
    c_tmpl = eroded_view_cloud(tmpl, rng, n_views=10, graze_cos=0.15)
    nv, gc, band = EROSIONS[erosion]
    c_src = eroded_view_cloud(src, rng, n_views=nv, graze_cos=gc, band=band)
    s_t = float(np.max(tmpl.object_extent)) / 2.0
    s_s = float(np.max(src.object_extent)) / 2.0
    return c_tmpl, c_src, s_t / s_s


def _vox(pts, vox):
    from catnerf_tpu.native.lib import geomlib

    return geomlib.voxel_downsample(np.asarray(pts, np.float32), vox)


def _radii(p):
    return np.sqrt(((p - p.mean(0)) ** 2).sum(-1))


def _obb_extents(pts):
    """Sorted (desc) OBB half-extents of a cloud."""
    T, _ = get_pose_from_pointcloud(pts)
    R = T[:3, :3]
    s = abs(np.linalg.det(R)) ** (1 / 3)
    # extents: project onto OBB axes
    A = R / s
    q = (pts - T[:3, 3]) @ A
    ext = (q.max(0) - q.min(0)) / 2.0
    return np.sort(ext)[::-1], s


def estimators(c_tmpl, c_src):
    """dict name -> k estimate (template_scale / source_scale)."""
    ext_t, s_obb_t = _obb_extents(c_tmpl)
    ext_s, s_obb_s = _obb_extents(c_src)
    vox = 0.02 * s_obb_t
    pt, ps = _vox(c_tmpl, vox), _vox(c_src, vox)
    rt, rs = _radii(pt), _radii(ps)
    out = {
        "obb": s_obb_t / s_obb_s,                      # r4 default
        "rms_vox": float(np.sqrt((rt ** 2).mean())
                         / np.sqrt((rs ** 2).mean())),
        "p95": float(np.quantile(rt, 0.95) / np.quantile(rs, 0.95)),
        "p99": float(np.quantile(rt, 0.99) / np.quantile(rs, 0.99)),
        "top2pct": float(np.sort(rt)[-max(1, len(rt) // 50):].mean()
                         / np.sort(rs)[-max(1, len(rs) // 50):].mean()),
        # median of per-rank OBB axis-extent ratios: erosion usually
        # guts ONE axis (the unseen poles); the median of three rank-
        # matched ratios drops the worst axis
        "med_axis": float(np.median(ext_t / ext_s)),
        "max_axis": float((ext_t / ext_s)[0]),
    }
    return out


if __name__ == "__main__":
    names = None
    for erosion in EROSIONS:
        errs = {}
        for fam in ("ellipsoid", "blob", "box"):
            for seed in (0, 1, 2):
                c_tmpl, c_src, k_true = make_pair(fam, seed, erosion)
                est = estimators(c_tmpl, c_src)
                if names is None:
                    names = list(est)
                row = " ".join(
                    f"{n}={100 * (est[n] / k_true - 1):+5.1f}%"
                    for n in names)
                print(f"[{erosion:6s}] {fam:9s} s{seed}: "
                      f"k={k_true:.3f} {row} [{len(c_src)} src pts]")
                for n in names:
                    errs.setdefault(n, []).append(
                        abs(est[n] / k_true - 1))
        print(f"[{erosion:6s}] SUMMARY " + " ".join(
            f"{n}:{100 * np.mean(errs[n]):.1f}/{100 * np.max(errs[n]):.1f}%"
            for n in names) + "  (mean/max |err|)")
