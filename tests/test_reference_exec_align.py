"""Executed-reference A/B of the L2 align_poses DECISION logic.

Closes VERDICT r4 item #4: L3/L4 are asserted against the reference's own
executed code (test_reference_exec_scene / test_reference_exec_parity),
but align_poses's accept/split decisions — template argmax, the
eta1/eta2/eta3 thresholding, `T_obj = inv(T_rel) @ T_obj_template`
composition, the `+100` fixpoint loop — were verified only by reading.
Here the reference's own `align_poses`
(/root/reference/src/category_registration.py:179-324) is AST-extracted
and executed with:

  * a planted TEASER solver (`teaser_utils.teaser_fpfh_icp` stub) that
    returns scripted per-init candidate transforms — the identical
    candidates are injected into OUR strict-parity align_poses by
    monkeypatching `registration.teaser_fpfh_icp`, so both
    implementations face the same decision problem;
  * open3d's PointCloud.compute_point_cloud_distance backed by the native
    first-party KD-tree (the same one our chamfer path uses, so the
    scores are bit-comparable);
  * trimesh.bounds.oriented_bounds backed by our first-party OBB (both
    sides then share one bound computation — the seam under test is the
    decision logic, not the hull).

Both implementations run the SAME multi-class scenario covering: accept
(< eta1), direct split (> eta2), the middle band's opposite-chamfer
branch (scale_template normalization, both outcomes via threshold
bracketing), a multi-member subcategory that re-registers internally on
the next fixpoint pass, and a sub-subcategory (+100 applied twice).
Asserted: identical final category structure, element-wise identical
T_obj for every instance, identical bbox3D extents, and identical
surviving count_dict/bbox3d_dict mutations.

Known reference quirk NOT replicated (documented here instead): the
template argmax at category_registration.py:197-200 builds `counts` in
`count_dict[cls_id]` key order but indexes `obj_ids` (bbox3d_dict key
order) with the argmax. The two dicts are built in the same iteration
order by get_uncertainty_fields, so the orders never diverge in the
pipeline; this suite drives both implementations with same-ordered dicts
(the pipeline invariant).
"""

from __future__ import annotations

import ast
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import catnerf_tpu.geometry.registration as registration  # noqa: E402
from catnerf_tpu.geometry.obb import (  # noqa: E402
    get_possible_transform_from_bbox,
    oriented_bounds,
)
from catnerf_tpu.native.lib import geomlib  # noqa: E402

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference checkout not available")


# ---------------------------------------------------------------------------
# stubs shared by the reference exec namespace
# ---------------------------------------------------------------------------

class _PC:
    """open3d.geometry.PointCloud stand-in: .points + the KD-backed
    compute_point_cloud_distance (per-point distance self -> other)."""

    def __init__(self, points=None):
        self.points = np.asarray(points, np.float64) if points is not None \
            else None

    def compute_point_cloud_distance(self, other):
        kd = geomlib.KDTree(np.asarray(other.points, np.float32))
        d, _ = kd.query(np.asarray(self.points, np.float32))
        return np.asarray(d, np.float64)


def _make_open3d_stub():
    o3d = types.ModuleType("open3d_stub")
    geom = types.SimpleNamespace(PointCloud=_PC)
    util = types.SimpleNamespace(Vector3dVector=lambda x: np.asarray(x))
    o3d.geometry = geom
    o3d.utility = util
    return o3d


def _make_trimesh_stub():
    tm = types.ModuleType("trimesh_stub")

    def _ob(points):
        out = oriented_bounds(points)
        assert out is not None, "test clouds must be non-degenerate"
        T, extents = out
        return np.linalg.inv(T), extents  # trimesh: to-origin transform

    tm.bounds = types.SimpleNamespace(oriented_bounds=_ob)
    return tm


class _FakeTeaser:
    """teaser_utils.teaser_fpfh_icp.TEASER_FPFH_ICP stand-in driven by a
    planted solver(source_np [N,3], target_np [M,3]) -> T_cand (4,4)."""

    solver = None  # set by the fixture

    def __init__(self, source, voxel_size=0.1, spc=True, visualize=False):
        self.source = source  # torch [1, 3, N]

    def forward(self, template):
        src = self.source.squeeze(0).T.cpu().numpy()
        Rs, ts = [], []
        for i in range(template.shape[0]):
            tgt = template[i].T.cpu().numpy()
            T = _FakeTeaser.solver(src, tgt)
            Rs.append(T[:3, :3])
            ts.append(T[:3, 3:])
        return (torch.from_numpy(np.stack(Rs)),
                torch.from_numpy(np.stack(ts)))


@pytest.fixture()
def ref_align():
    """Extract + exec the reference align_poses with stubbed third parties.
    Installs the fake teaser module in sys.modules for the duration."""
    src = open(os.path.join(REF_SRC, "category_registration.py")).read()
    tree = ast.parse(src)
    piece = None
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == "align_poses":
            piece = ast.get_source_segment(src, node)
    assert piece is not None

    usrc = open(os.path.join(REF_SRC, "utils.py")).read()
    utree = ast.parse(usrc)
    upieces = {}
    wanted = ("BoundingBox", "get_bound", "get_obb",
              "get_pose_from_pointcloud",
              "get_possible_transform_from_bbox", "transform_pointcloud")
    for node in utree.body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) \
                and node.name in wanted:
            upieces[node.name] = ast.get_source_segment(usrc, node)
    assert set(upieces) == set(wanted)

    import scipy.spatial

    ns = {
        "np": np, "torch": torch, "time": __import__("time"),
        "open3d": _make_open3d_stub(), "trimesh": _make_trimesh_stub(),
        "scipy": scipy, "permutations": __import__(
            "itertools").permutations,
    }
    for name in wanted:
        exec(upieces[name], ns)  # noqa: S102 — vetted reference source
    exec(piece, ns)  # noqa: S102 — vetted reference source

    teaser_mod = types.ModuleType("teaser_utils.teaser_fpfh_icp")
    teaser_mod.TEASER_FPFH_ICP = _FakeTeaser
    pkg = types.ModuleType("teaser_utils")
    pkg.teaser_fpfh_icp = teaser_mod
    sys.modules["teaser_utils"] = pkg
    sys.modules["teaser_utils.teaser_fpfh_icp"] = teaser_mod
    yield ns
    sys.modules.pop("teaser_utils.teaser_fpfh_icp", None)
    sys.modules.pop("teaser_utils", None)
    _FakeTeaser.solver = None


# ---------------------------------------------------------------------------
# scenario construction
# ---------------------------------------------------------------------------

def _box_cloud(rng, half, n):
    """n points on the surface of an axis-aligned box (object frame)."""
    half = np.asarray(half, np.float64)
    face = rng.integers(0, 6, n)
    p = rng.uniform(-1.0, 1.0, (n, 3))
    ax, sgn = face // 2, np.where(face % 2 == 0, 1.0, -1.0)
    p[np.arange(n), ax] = sgn
    return p * half


def _rot(deg_xyz):
    from scipy.spatial.transform import Rotation

    return Rotation.from_euler("xyz", deg_xyz, degrees=True).as_matrix()


def _se3(R=np.eye(3), t=(0.0, 0.0, 0.0)):
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


class _Planted:
    """Planted solver: identifies (source instance, template instance) by
    point count, recovers the init index by matching the target against
    the template cloud under each of the 24 init transforms, and returns
    T_cand = T_init @ T_plant. `plants` maps (n_src, n_tmpl) to either a
    single T_plant (planted at init 0) or a dict {init_index: T_plant}.
    Unplanted (pair, init) combinations get a distinct far translation so
    they produce huge, tie-free chamfers."""

    def __init__(self, clouds_by_n, plants):
        self.clouds_by_n = clouds_by_n  # n_points -> world cloud
        self.plants = {
            k: (v if isinstance(v, dict) else {0: v})
            for k, v in plants.items()}
        self.transform_list = get_possible_transform_from_bbox()

    def _init_index(self, tmpl_cloud, target):
        for i, Ti in enumerate(self.transform_list):
            probe = tmpl_cloud @ Ti[:3, :3].T + Ti[:3, 3]
            if np.allclose(probe[0], target[0], atol=1e-9) and \
                    np.allclose(probe[-1], target[-1], atol=1e-9):
                return i
        raise AssertionError("target does not match any init transform")

    def __call__(self, src, tgt):
        n_src, n_tgt = len(src), len(tgt)
        tmpl_cloud = self.clouds_by_n[n_tgt]
        i = self._init_index(tmpl_cloud, tgt)
        per_init = self.plants.get((n_src, n_tgt), {})
        if i in per_init:
            T_plant = per_init[i]
        else:
            T_plant = _se3(t=(50.0 + 7.0 * i, -30.0, 10.0 + n_src * 1e-3))
        return self.transform_list[i] @ T_plant


def _build_scenario(seed=0):
    """Multi-class inst/bbox/count dicts + planted transforms.

    cls 7: 1 (template, n=3000), 2 accepts (planted near-exact),
           3 splits (garbage) -> 107 singleton.
    cls 9: 4 (template, n=2600), 5 accepts, 6+8 split -> 109, where 6 is
           the round-2 template (higher count) and 8 re-registers onto 6
           (planted) -> accepted INSIDE 109.
    cls 11: 10 (template, n=2200), 12+13 split -> 111; in 111, 13 fails
           against 12 again -> 211 (cls_id_add applied twice).
    """
    rng = np.random.default_rng(seed)
    mk = {}

    def add(n, half, R, t):
        obj = _box_cloud(rng, half, n)
        world = obj @ np.asarray(R).T + np.asarray(t)
        mk[n] = world
        return world

    clouds = {
        1: add(3000, (0.30, 0.22, 0.15), _rot([10, -5, 30]), (0.0, 0.0, 0.5)),
        2: add(2500, (0.30, 0.22, 0.15), _rot([40, 15, -25]), (1.2, 0.3, 0.4)),
        3: add(2600, (0.10, 0.45, 0.08), _rot([0, 60, 10]), (-1.0, 0.8, 0.2)),
        4: add(2601, (0.25, 0.18, 0.12), _rot([5, 25, -40]), (2.0, -0.5, 0.3)),
        5: add(2400, (0.25, 0.18, 0.12), _rot([-30, 10, 70]), (2.5, 0.9, 0.1)),
        6: add(2300, (0.06, 0.38, 0.30), _rot([20, -35, 5]), (3.0, 1.5, 0.6)),
        8: add(2200 + 1, (0.06, 0.38, 0.30), _rot([55, 5, -15]),
               (3.5, -1.2, 0.2)),
        10: add(2200, (0.20, 0.20, 0.05), _rot([0, 0, 45]), (-2.0, -1.0, 0.4)),
        12: add(2100, (0.40, 0.07, 0.33), _rot([75, -20, 40]), (-2.5, 1.1, 0.3)),
        13: add(2050, (0.12, 0.12, 0.42), _rot([-15, 50, -60]),
                (-3.0, 0.5, 0.7)),
    }
    n_of = {o: len(c) for o, c in clouds.items()}

    def plant_between(src_id, tmpl_id, jitter=0.0):
        """T mapping source cloud near-exactly onto the template cloud's
        box frame (same half extents assumed) + optional uniform offset."""
        # source world -> source object -> (scaled identity) -> template
        # world. Source and template were built from the same box halves,
        # so object frames coincide.
        src_w = clouds[src_id]
        tmpl_w = clouds[tmpl_id]
        # recover the build transforms from mk bookkeeping is overkill:
        # solve the exact rigid map via Procrustes on the (identically
        # indexed) object points is not possible (different draws), so
        # plant using the known build poses:
        return _se3(t=(jitter, 0.0, 0.0)) @ _known_T[tmpl_id] @ \
            np.linalg.inv(_known_T[src_id])

    # rebuild the known world poses used in add() above
    _known_T = {
        1: _se3(_rot([10, -5, 30]), (0.0, 0.0, 0.5)),
        2: _se3(_rot([40, 15, -25]), (1.2, 0.3, 0.4)),
        3: _se3(_rot([0, 60, 10]), (-1.0, 0.8, 0.2)),
        4: _se3(_rot([5, 25, -40]), (2.0, -0.5, 0.3)),
        5: _se3(_rot([-30, 10, 70]), (2.5, 0.9, 0.1)),
        6: _se3(_rot([20, -35, 5]), (3.0, 1.5, 0.6)),
        8: _se3(_rot([55, 5, -15]), (3.5, -1.2, 0.2)),
        10: _se3(_rot([0, 0, 45]), (-2.0, -1.0, 0.4)),
        12: _se3(_rot([75, -20, 40]), (-2.5, 1.1, 0.3)),
        13: _se3(_rot([-15, 50, -60]), (-3.0, 0.5, 0.7)),
    }

    plants = {
        (n_of[2], n_of[1]): plant_between(2, 1),
        (n_of[5], n_of[4]): plant_between(5, 4),
        (n_of[8], n_of[6]): plant_between(8, 6),
        # nothing planted for 3 vs 1, 6 vs 4, 10's classmates, 13 vs 12
    }

    inst = {c: clouds[c] for c in clouds}
    cats = {7: [1, 2, 3], 9: [4, 5, 6, 8], 11: [10, 12, 13]}
    counts = {7: {1: 100, 2: 50, 3: 40},
              9: {4: 90, 5: 60, 6: 70, 8: 30},
              11: {10: 80, 12: 45, 13: 20}}
    return inst, cats, counts, plants, mk


def _run_ours(inst, cats, counts, plants, clouds_by_n, monkeypatch,
              eta=(0.06, 0.15, 0.12)):
    planted = _Planted(clouds_by_n, plants)

    def fake_solver(src, tgt, voxel_size=0.1, spc=True):
        T = planted(np.asarray(src, np.float64), np.asarray(tgt, np.float64))
        return T[:3, :3], T[:3, 3:]

    monkeypatch.setattr(registration, "teaser_fpfh_icp", fake_solver)
    inst_dict = {c: {o: {"frame_info": [], "pcs": inst[o].copy()}
                     for o in objs} for c, objs in cats.items()}
    bbox3d_dict = {c: {o: None for o in objs} for c, objs in cats.items()}
    count_dict = {c: dict(counts[c]) for c in cats}
    field_dict = {c: {o: f"field_{o}" for o in objs}
                  for c, objs in cats.items()}
    registration.align_poses(
        inst_dict, bbox3d_dict, count_dict, field_dict, name="replica",
        multi_init_pose=True, eta1=eta[0], eta2=eta[1], eta3=eta[2],
        scale_aware=False, appearance=False)
    return inst_dict, count_dict, field_dict


def _run_ref(ns, inst, cats, counts, plants, clouds_by_n,
             eta=(0.06, 0.15, 0.12)):
    _FakeTeaser.solver = _Planted(clouds_by_n, plants)
    inst_dict = {c: {o: {"frame_info": [], "pcs": _PC(inst[o].copy())}
                     for o in objs} for c, objs in cats.items()}
    bbox3d_dict = {c: {o: None for o in objs} for c, objs in cats.items()}
    count_dict = {c: dict(counts[c]) for c in cats}
    pe_dict = {c: {o: f"pe_{o}" for o in objs} for c, objs in cats.items()}
    fc_dict = {c: {o: f"field_{o}" for o in objs}
               for c, objs in cats.items()}
    ns["align_poses"](inst_dict, bbox3d_dict, count_dict, pe_dict, fc_dict,
                      name="replica", multi_init_pose=True, eta1=eta[0],
                      eta2=eta[1], eta3=eta[2], device="cpu")
    return inst_dict, count_dict, fc_dict


def _assert_same_outcome(ours, ref):
    inst_o, counts_o, fields_o = ours
    inst_r, counts_r, fields_r = ref
    assert sorted(inst_o) == sorted(inst_r), \
        (sorted(inst_o), sorted(inst_r))
    for cls_id in inst_r:
        assert sorted(inst_o[cls_id]) == sorted(inst_r[cls_id]), cls_id
        for obj_id, info_r in inst_r[cls_id].items():
            info_o = inst_o[cls_id][obj_id]
            if "T_obj" in info_r:
                np.testing.assert_allclose(
                    np.asarray(info_o["T_obj"], np.float64),
                    np.asarray(info_r["T_obj"], np.float64),
                    rtol=1e-7, atol=1e-9,
                    err_msg=f"T_obj diverges for cls {cls_id} obj {obj_id}")
            if info_r.get("bbox3D") is not None:
                np.testing.assert_allclose(
                    np.asarray(info_o["bbox3D"].extent),
                    np.asarray(info_r["bbox3D"].extent),
                    rtol=1e-7, atol=1e-9,
                    err_msg=f"bbox extent diverges cls {cls_id} obj {obj_id}")
    assert {c: sorted(v) for c, v in counts_o.items()} == \
           {c: sorted(v) for c, v in counts_r.items()}
    assert {c: sorted(v) for c, v in fields_o.items()} == \
           {c: sorted(v) for c, v in fields_r.items()}


def test_align_poses_decisions_match_reference(ref_align, monkeypatch):
    """Identical planted candidates -> identical accept/split decisions,
    composed poses, bbox extents, and fixpoint category structure across
    accept, direct-split, multi-member-subcategory, and +100-twice
    paths."""
    inst, cats, counts, plants, clouds_by_n = _build_scenario()
    ours = _run_ours(inst, cats, counts, plants, clouds_by_n, monkeypatch)
    ref = _run_ref(ref_align, inst, cats, counts, plants, clouds_by_n)

    _assert_same_outcome(ours, ref)

    inst_r = ref[0]
    # the scripted structure actually happened (the scenario is live):
    assert sorted(inst_r) == [7, 9, 11, 107, 109, 111, 211]
    assert sorted(inst_r[7]) == [1, 2] and sorted(inst_r[107]) == [3]
    assert sorted(inst_r[9]) == [4, 5] and sorted(inst_r[109]) == [6, 8]
    assert sorted(inst_r[11]) == [10] and sorted(inst_r[111]) == [12]
    assert sorted(inst_r[211]) == [13]


def _mid_band_setup(rng_seed=5):
    """Two-instance class whose planted alignments land at controlled
    chamfers: source = template shape with a +6% scale inflation. Init 0
    gets the exact alignment (the argmin winner); init 23 — the LAST init
    — gets the same alignment offset 2 cm, because the reference computes
    the mid-band OPPOSITE chamfer against the stale last-init transformed
    cloud (the quirk this suite documents), so eta3 decisions key off
    THAT candidate. Returns (inst, cats, counts, plants, clouds_by_n,
    cd_fwd, cd_opp_last) with both decision quantities PRE-MEASURED
    through the same KD-tree both implementations score with."""
    rng = np.random.default_rng(rng_seed)
    half = np.array([0.28, 0.20, 0.14])
    tmpl_obj = _box_cloud(rng, half, 3000)
    src_obj = _box_cloud(rng, half * 1.06, 2500)
    T_t = _se3(_rot([10, -5, 30]), (0.0, 0.0, 0.5))
    T_s = _se3(_rot([40, 15, -25]), (1.2, 0.3, 0.4))
    tmpl_w = tmpl_obj @ T_t[:3, :3].T + T_t[:3, 3]
    src_w = src_obj @ T_s[:3, :3].T + T_s[:3, 3]
    clouds_by_n = {3000: tmpl_w, 2500: src_w}
    T_plant = T_t @ np.linalg.inv(T_s)
    T_plant_last = _se3(t=(0.02, 0.0, 0.0)) @ T_plant
    n_inits = len(get_possible_transform_from_bbox())
    plants = {(2500, 3000): {0: T_plant, n_inits - 1: T_plant_last}}
    inst = {1: tmpl_w, 2: src_w}
    cats = {7: [1, 2]}
    counts = {7: {1: 100, 2: 50}}

    # pre-measure the decision quantities exactly as both sides do
    kd_t = geomlib.KDTree(np.asarray(tmpl_w, np.float32))
    scale_source = float(np.max(src_w.max(0) - src_w.min(0)) / 2.0)

    def fwd_cd(T):
        stf = src_w @ T[:3, :3].T + T[:3, 3]
        d, _ = kd_t.query(np.asarray(stf, np.float32))
        return float(np.asarray(d, np.float64).mean() / scale_source), stf

    cd_fwd, src_tf0 = fwd_cd(T_plant)
    cd_fwd_last, src_tf_last = fwd_cd(T_plant_last)
    assert cd_fwd < cd_fwd_last, "init 0 must stay the argmin winner"
    kd_s = geomlib.KDTree(np.asarray(src_tf_last, np.float32))
    d_opp, _ = kd_s.query(np.asarray(tmpl_w, np.float32))
    T_obb, _ = registration.get_pose_from_pointcloud(tmpl_w)
    scale_template = float(np.linalg.det(T_obb[:3, :3]) ** (1 / 3))
    cd_opp_last = float(np.asarray(d_opp, np.float64).mean()
                        / scale_template)
    return inst, cats, counts, plants, clouds_by_n, cd_fwd, cd_opp_last


@pytest.mark.parametrize("case", ["accept_below_eta1", "split_above_eta2",
                                  "mid_accept", "mid_split"])
def test_align_poses_eta_boundaries_match_reference(ref_align, monkeypatch,
                                                    case):
    """Threshold DIRECTION and operand A/B at the eta seams: the same
    planted candidate is pushed to either side of each threshold by
    bracketing the pre-measured chamfer (x(1 +/- 1e-3), well above KD
    float noise, far below the 6% planted signal). A misread comparison
    direction, a swapped eta, or a wrong opposite-chamfer normalization
    (scale_template vs scale_source differ by ~12% here) diverges."""
    inst, cats, counts, plants, clouds_by_n, cd_fwd, cd_opp = \
        _mid_band_setup()
    margin = 1e-3
    if case == "accept_below_eta1":
        eta = (cd_fwd * (1 + margin), cd_fwd * 2.0, 1e-9)
        want = {7: [1, 2]}
    elif case == "split_above_eta2":
        eta = (cd_fwd * 0.25, cd_fwd * (1 - margin), 1e9)
        want = {7: [1], 107: [2]}
    elif case == "mid_accept":
        eta = (cd_fwd * 0.5, cd_fwd * (1 + margin), cd_opp * (1 + margin))
        want = {7: [1, 2]}
    else:  # mid_split: opposite chamfer just above eta3
        eta = (cd_fwd * 0.5, cd_fwd * (1 + margin), cd_opp * (1 - margin))
        want = {7: [1], 107: [2]}

    ours = _run_ours(inst, cats, counts, plants, clouds_by_n, monkeypatch,
                     eta=eta)
    ref = _run_ref(ref_align, inst, cats, counts, plants, clouds_by_n,
                   eta=eta)
    _assert_same_outcome(ours, ref)
    assert {c: sorted(v) for c, v in ref[0].items()} == want, case
