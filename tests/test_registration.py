"""Registration pipeline tests on synthetic clouds with known transforms
(SURVEY.md §4: 'registration tests on synthetic transformed point clouds')."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from catnerf_tpu.config import Config
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.geometry import obb as obb_mod
from catnerf_tpu.geometry.pointcloud import (
    accumulate_pointcloud,
    chamfer_unidirectional,
)
from catnerf_tpu.geometry.registration import (
    align_poses,
    coverage_score,
    get_all_poses,
    run_registration,
)
from catnerf_tpu.geometry.teaser import teaser_fpfh_icp
from catnerf_tpu.ops.sim3 import transform_pointcloud_np


def _box_cloud(rng, n=2000, extents=(0.8, 0.5, 0.3)):
    """Points on the surface of a box (distinct extents -> unique OBB)."""
    ex = np.asarray(extents)
    pts = []
    for axis in range(3):
        for sign in (-1, 1):
            m = n // 6
            p = (rng.random((m, 3)) - 0.5) * ex
            p[:, axis] = sign * ex[axis] / 2
            pts.append(p)
    return np.concatenate(pts)


def test_oriented_bounds_recovers_box():
    rng = np.random.default_rng(0)
    base = _box_cloud(rng)
    R = Rotation.from_euler("xyz", [20, 40, -30], degrees=True).as_matrix()
    t = np.array([1.0, -0.5, 2.0])
    pts = base @ R.T + t
    out = obb_mod.oriented_bounds(pts)
    assert out is not None
    T, extents = out
    np.testing.assert_allclose(sorted(extents), [0.3, 0.5, 0.8], atol=0.02)
    np.testing.assert_allclose(T[:3, 3], t, atol=0.03)
    # rotation maps box axes onto +-R axes in some permutation
    M = np.abs(R.T @ T[:3, :3])
    perm_ok = np.allclose(np.sort(M.max(0)), [1, 1, 1], atol=0.02)
    assert perm_ok


def test_oriented_bounds_degenerate():
    assert obb_mod.oriented_bounds(np.zeros((3, 3))) is None


def test_get_pose_from_pointcloud_sim3():
    rng = np.random.default_rng(1)
    pts = _box_cloud(rng) + np.array([2.0, 0.0, 1.0])
    T_obj, bbox3d = obb_mod.get_pose_from_pointcloud(pts)
    s = np.linalg.det(T_obj[:3, :3]) ** (1 / 3)
    np.testing.assert_allclose(s, np.max(bbox3d.extent) / 2, rtol=1e-5)
    np.testing.assert_allclose(T_obj[:3, 3], bbox3d.center, atol=1e-8)


def test_possible_transforms_are_24_rotations():
    Ts = obb_mod.get_possible_transform_from_bbox()
    assert len(Ts) == 24
    mats = np.round(np.stack([T[:3, :3] for T in Ts]), 6)
    # all proper rotations, all distinct
    for R in mats:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) > 0.99
    assert len(np.unique(mats.reshape(24, -1), axis=0)) == 24


def test_teaser_pipeline_recovers_rigid_transform():
    rng = np.random.default_rng(2)
    src = _box_cloud(rng, n=3000)
    R = Rotation.from_euler("xyz", [10, -15, 25], degrees=True).as_matrix()
    t = np.array([0.3, 0.2, -0.4])
    target = src @ R.T + t + rng.normal(0, 0.003, src.shape)
    R_est, t_est = teaser_fpfh_icp(src, target, voxel_size=0.1, spc=True)
    src_tf = src @ R_est.T + t_est[:, 0]
    cd = chamfer_unidirectional(src_tf, target)
    # spc protocol (0.1 m voxels, 0.01 ICP gate — the reference's own
    # parameters, teaser_fpfh_icp.py:70,85) resolves to ~half a voxel
    assert cd < 0.05, cd


def test_teaser_fpfh_mode():
    rng = np.random.default_rng(3)
    src = _box_cloud(rng, n=3000)
    R = Rotation.from_euler("xyz", [8, 12, -5], degrees=True).as_matrix()
    t = np.array([0.1, -0.1, 0.2])
    target = src @ R.T + t
    R_est, t_est = teaser_fpfh_icp(src, target, voxel_size=0.05, spc=False)
    src_tf = src @ R_est.T + t_est[:, 0]
    assert chamfer_unidirectional(src_tf, target) < 0.03


def test_coverage_score_full_vs_partial():
    rng = np.random.default_rng(4)
    full = rng.standard_normal((5000, 3))
    full /= np.linalg.norm(full, axis=-1, keepdims=True)
    partial = full[full[:, 2] > 0]  # half sphere
    s_full = coverage_score(full)
    s_partial = coverage_score(partial)
    assert s_full > 1.6 * s_partial


def _registration_inputs(seed=0):
    scene = make_scene(n_frames=6, width=80, height=60, n_categories=2,
                       insts_per_cat=2, seed=seed, unknown_band=False)
    inst_dict = {}
    for cls_id, d in scene.inst_dict.items():
        if cls_id == 0:
            inst_dict[0] = {"frame_info": d["frame_info"]}
        else:
            inst_dict[cls_id] = {
                iid: {"frame_info": info["frame_info"]}
                for iid, info in d.items()
            }
    return scene, inst_dict


def test_full_registration_pipeline_synthetic():
    """End-to-end run_registration on the synthetic scene with the
    first-party coverage score (no pretrained fields)."""
    scene, inst_dict = _registration_inputs()
    cfg = Config()
    cfg.load_pretrained = False
    run_registration(inst_dict, scene.sample_dict, scene.cam, cfg,
                     name="replica")

    # background got an OBB covering the room
    assert inst_dict[0]["bbox3D"] is not None
    assert np.max(inst_dict[0]["bbox3D"].extent) > 4.0

    # every surviving instance has pose + bbox
    for cls_id, d in inst_dict.items():
        if cls_id == 0:
            continue
        for iid, info in d.items():
            assert "T_obj" in info, (cls_id, iid)
            assert "bbox3D" in info, (cls_id, iid)
            s = np.linalg.det(np.asarray(info["T_obj"])[:3, :3]) ** (1 / 3)
            assert 0.05 < s < 2.0
            # canonical cloud is normalized: points inside unit-ish ball
            pts_o = transform_pointcloud_np(
                np.asarray(info["pcs"]), np.linalg.inv(info["T_obj"]))
            assert np.abs(pts_o).max() < 1.6

    # spheres of the same category should NOT subcategorize (they align):
    # no cls_id + 100 subcategories may appear
    assert 80 in inst_dict and 81 in inst_dict
    assert 180 not in inst_dict and 181 not in inst_dict, sorted(inst_dict)


def test_subcategorization_on_mismatched_shapes():
    """Two incompatible shapes in one class split into a subcategory
    (ref: src/category_registration.py:276-313)."""
    rng = np.random.default_rng(5)
    sphere = rng.standard_normal((3000, 3))
    sphere = sphere / np.linalg.norm(sphere, axis=-1, keepdims=True) * 0.3
    rod = _box_cloud(rng, n=3000, extents=(1.6, 0.08, 0.08)) + np.array([2, 0, 0])

    inst_dict = {7: {1: {"frame_info": [], "pcs": sphere},
                     2: {"frame_info": [], "pcs": rod}}}
    count_dict = {7: {1: 100, 2: 50}}
    bbox3d_dict = {7: {1: None, 2: None}}
    align_poses(inst_dict, bbox3d_dict, count_dict, {}, name="replica")
    # rod cannot align to the sphere -> moved to 7 + 100
    assert 107 in inst_dict
    assert 2 in inst_dict[107]
    assert 2 not in inst_dict[7]


def test_scale_aware_registration_absorbs_size_variation():
    """Same shape at 1.45x the size: rigid-only registration cannot absorb
    the size difference (normalized Chamfer ~0.2 > eta2 -> wrong split into
    a singleton subcategory, losing category-level field sharing);
    scale-aware registration accepts it and recovers the relative scale in
    the sim(3) T_obj."""
    rng = np.random.default_rng(8)
    box = _box_cloud(rng, n=4000, extents=(0.8, 0.5, 0.3))
    small = box + np.array([0.0, 0.0, 0.0])
    from scipy.spatial.transform import Rotation

    R = Rotation.from_euler("xyz", [0, 35, 0], degrees=True).as_matrix()
    big = (box * 1.45) @ R.T + np.array([2.0, 0.1, -0.5])

    def run(scale_aware):
        inst_dict = {9: {1: {"frame_info": [], "pcs": small.copy()},
                         2: {"frame_info": [], "pcs": big.copy()}}}
        count_dict = {9: {1: 100, 2: 50}}
        bbox3d_dict = {9: {1: None, 2: None}}
        align_poses(inst_dict, bbox3d_dict, count_dict, {}, name="replica",
                    scale_aware=scale_aware)
        return inst_dict

    # rigid-only: wrongly subcategorized
    rigid = run(scale_aware=False)
    assert 109 in rigid and 2 in rigid[109]

    # scale-aware: accepted into the category; canonical clouds overlap
    sa = run(scale_aware=True)
    assert 109 not in sa and 2 in sa[9]
    T1, T2 = sa[9][1]["T_obj"], sa[9][2]["T_obj"]
    s1 = np.linalg.det(T1[:3, :3]) ** (1 / 3)
    s2 = np.linalg.det(T2[:3, :3]) ** (1 / 3)
    assert abs(s2 / s1 - 1.45) < 0.1, (s1, s2)
    c1 = transform_pointcloud_np(small, np.linalg.inv(T1))
    c2 = transform_pointcloud_np(big, np.linalg.inv(T2))
    from catnerf_tpu.geometry.pointcloud import chamfer_unidirectional

    assert chamfer_unidirectional(c1, c2) < 0.05  # shared canonical frame


def test_complementarity_tie_break_on_symmetric_shapes():
    """Registration of rotation-symmetric shapes is ambiguous; the pure
    Chamfer winner aligns the two instances' OBSERVED domes, stacking their
    blind spots at the same canonical direction (measured 84% vs 100%
    completion ratio downstream). The accept-band complementarity
    tie-break must instead produce a canonical frame where the combined
    coverage exceeds what either dome provides alone."""
    from catnerf_tpu.geometry.registration import _coverage_bins

    rng = np.random.default_rng(3)

    def dome(radius, center, open_dir, cos_cap=0.55, n=6000):
        u = rng.normal(size=(n, 3))
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        keep = u @ np.asarray(open_dir) < cos_cap  # cap around open_dir missing
        pts = center + radius * u[keep]
        return pts + rng.normal(0, 0.002, pts.shape)

    # two spheres, caps missing in ~opposite world directions
    a = dome(0.5, np.array([0.0, 0.0, 0.0]), [1.0, 0.0, 0.0])
    b = dome(0.5, np.array([2.0, 0.0, 0.0]), [-0.8, 0.6, 0.0])

    inst_dict = {9: {1: {"frame_info": [], "pcs": a},
                     2: {"frame_info": [], "pcs": b}}}
    count_dict = {9: {1: 100, 2: 50}}
    bbox3d_dict = {9: {1: None, 2: None}}
    align_poses(inst_dict, bbox3d_dict, count_dict, {}, name="replica",
                scale_aware=True)
    assert 109 not in inst_dict and 2 in inst_dict[9]

    c1 = transform_pointcloud_np(a, np.linalg.inv(inst_dict[9][1]["T_obj"]))
    c2 = transform_pointcloud_np(b, np.linalg.inv(inst_dict[9][2]["T_obj"]))
    b1, b2 = _coverage_bins(c1), _coverage_bins(c2)
    # each dome alone leaves a hole; together they must cover (nearly) all
    # directions that either could — i.e., the blind spots do NOT coincide
    union = (b1 | b2).sum()
    assert union >= b1.sum() + 0.5 * (b1.size - b1.sum()), (
        union, b1.sum(), b2.sum())


def test_tie_break_rejects_hole_direction_slide():
    """Regression for the obj-5 gate failure (diag_registration, seed 0):
    with partial spheres of DIFFERENT radii, the forward masked Chamfer is
    blind to a candidate that inflates the scale and slides the source
    along the template's hole direction (the displaced points land in the
    masked-out region) — it accepted +18.6% scale / 9.3 cm center error at
    masked cd 0.010. The symmetric masked score must reject that family
    and recover the true relative scale and concentric placement."""
    rng = np.random.default_rng(5)

    def dome(radius, center, open_dir, cos_cap=0.55, n=6000):
        u = rng.normal(size=(n, 3))
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        keep = u @ np.asarray(open_dir) < cos_cap
        pts = center + radius * u[keep]
        return pts + rng.normal(0, 0.002, pts.shape)

    def fit_sphere(pts):
        """Algebraic least-squares sphere fit: ||p||^2 = 2 c.p + k."""
        A = np.concatenate([2 * pts, np.ones((len(pts), 1))], axis=1)
        b = (pts**2).sum(axis=1)
        sol, *_ = np.linalg.lstsq(A, b, rcond=None)
        c = sol[:3]
        r = np.sqrt(sol[3] + (c**2).sum())
        return c, r

    # template r=0.6 (higher count -> template), source r=0.5, holes in
    # different world directions (the obj-5 geometry)
    tmpl = dome(0.6, np.array([0.0, 0.0, 0.0]), [0.0, 0.0, 1.0])
    src = dome(0.5, np.array([2.0, 0.0, 0.0]), [0.3, -0.5, -0.8])

    inst_dict = {7: {1: {"frame_info": [], "pcs": tmpl},
                     2: {"frame_info": [], "pcs": src}}}
    count_dict = {7: {1: 100, 2: 50}}
    bbox3d_dict = {7: {1: None, 2: None}}
    align_poses(inst_dict, bbox3d_dict, count_dict, {}, name="replica",
                scale_aware=True)
    assert 107 not in inst_dict and 2 in inst_dict[7]

    c1 = transform_pointcloud_np(tmpl,
                                 np.linalg.inv(inst_dict[7][1]["T_obj"]))
    c2 = transform_pointcloud_np(src,
                                 np.linalg.inv(inst_dict[7][2]["T_obj"]))
    ctr1, r1 = fit_sphere(c1)
    ctr2, r2 = fit_sphere(c2)
    # concentric in the shared canonical frame, radii normalized to match
    assert np.linalg.norm(ctr1 - ctr2) < 0.08 * r1, (ctr1, ctr2, r1)
    assert abs(r1 - r2) / r1 < 0.06, (r1, r2)


def test_recenter_canonical_frame():
    """The union-recentering pass must move the shared canonical origin to
    the union-cloud bbox center WITHOUT changing any instance's world
    geometry or sim(3) scale (it only re-expresses the same map)."""
    from catnerf_tpu.geometry.registration import _recenter_canonical_frame

    rng = np.random.default_rng(7)
    R1 = Rotation.from_euler("xyz", [0.3, -0.2, 0.5]).as_matrix()
    R2 = Rotation.from_euler("xyz", [-0.1, 0.4, 0.2]).as_matrix()

    # two instances of a unit sphere, canonical origin deliberately offset
    off = np.array([0.0, 0.0, 0.4])
    u = rng.normal(size=(3000, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    canon = u + off  # canonical cloud centered at +0.4 z

    def make(T_R, s, t):
        T = np.eye(4)
        T[:3, :3] = s * T_R
        T[:3, 3] = t
        return {"T_obj": T, "pcs": transform_pointcloud_np(canon, T)}

    cls = {1: make(R1, 0.5, np.array([1.0, 0.0, 0.0])),
           2: make(R2, 0.8, np.array([-2.0, 1.0, 0.5]))}
    world_before = {o: cls[o]["pcs"].copy() for o in cls}
    scales_before = {o: np.linalg.det(cls[o]["T_obj"][:3, :3]) ** (1 / 3)
                     for o in cls}

    _recenter_canonical_frame(cls)

    for o in cls:
        T = cls[o]["T_obj"]
        s = np.linalg.det(T[:3, :3]) ** (1 / 3)
        assert abs(s - scales_before[o]) < 1e-9  # scale untouched
        np.testing.assert_allclose(cls[o]["pcs"], world_before[o])
        c = transform_pointcloud_np(world_before[o], np.linalg.inv(T))
        # canonical cloud now centered: the +0.4 offset is gone
        mid = (c.min(0) + c.max(0)) / 2.0
        assert np.linalg.norm(mid) < 1e-6, mid
        # extent recomputed about the new origin
        np.testing.assert_allclose(cls[o]["bbox3D"].extent,
                                   2.0 * scales_before[o], rtol=0.01)


def test_field_pretrain_and_uncertainty_score():
    """Self-contained pretraining mode (the reference raises
    NotImplementedError for load_pretrained=False): fields learn the object
    surface and the uncertainty score counts most directions reliable for a
    fully observed synthetic sphere."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from catnerf_tpu.config import Config
    from catnerf_tpu.data.synthetic import make_scene
    from catnerf_tpu.geometry.field_pretrain import pretrain_object_fields
    from catnerf_tpu.geometry.uncertainty import uncertainty_score
    from catnerf_tpu.models import embedding, occupancy

    from catnerf_tpu.geometry.registration import get_all_poses

    cfg = Config()
    scene = make_scene(n_frames=6, width=64, height=48, n_categories=1,
                       insts_per_cat=1, seed=3)
    s = scene.spheres[0]
    get_all_poses(scene.inst_dict, scene.sample_dict, scene.cam)
    info = scene.inst_dict[s.cls_id][s.inst_id]
    assert info.get("pcs") is not None and len(info["pcs"]) > 100

    fields = pretrain_object_fields(
        [(s.inst_id, info["frame_info"], info["pcs"])],
        scene.sample_dict, scene.cam, cfg, steps=800, n_rays=512,
        n_inner=100, key=jax.random.PRNGKey(0))
    field = fields[0]

    # The field is supervised in a crust around the surface (vMAP sampling):
    # occupancy just inside the surface >> occupancy outside.
    def occ_at(pts):
        x = (jnp.asarray(pts, jnp.float32)
             - jnp.asarray(field["center"], jnp.float32))
        emb = embedding.apply(field["pe"], x, scale=field["obj_scale"])
        a, _ = occupancy.apply(field["fc"], emb, do_color=False)
        return np.asarray(jax.nn.sigmoid(a[..., 0]))

    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(200, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    inside = occ_at(s.center + 0.85 * s.radius * dirs)
    outside = occ_at(s.center + 1.5 * s.radius * dirs)
    assert inside.mean() > 0.55, (inside.mean(), outside.mean())
    assert outside.mean() < 0.2, (inside.mean(), outside.mean())

    count, entropies, metric = uncertainty_score(field, info["pcs"])
    assert entropies.shape == (10000,)
    # a well-observed sphere: the vast majority of directions reliable
    assert count > 5000, count


def test_field_pretrain_drops_zero_ray_objects():
    """An object whose every bbox crop is degenerate (0 ray rows) must come
    back as None (caller falls back to coverage scoring) instead of drawing
    randint(0, 0) indices and training on zero-padding."""
    import jax

    from catnerf_tpu.config import Config
    from catnerf_tpu.data.synthetic import make_scene
    from catnerf_tpu.geometry.field_pretrain import pretrain_object_fields
    from catnerf_tpu.geometry.registration import get_all_poses

    cfg = Config()
    scene = make_scene(n_frames=4, width=64, height=48, n_categories=1,
                       insts_per_cat=1, seed=3)
    s = scene.spheres[0]
    get_all_poses(scene.inst_dict, scene.sample_dict, scene.cam)
    info = scene.inst_dict[s.cls_id][s.inst_id]

    fid = info["frame_info"][0]["frame"]
    degenerate = [{"frame": fid, "bbox": (5, 5, 3, 7)}]  # w0 == w1 -> 0 px
    fields = pretrain_object_fields(
        [(s.inst_id, info["frame_info"], info["pcs"]),
         (s.inst_id + 1, degenerate, info["pcs"])],
        scene.sample_dict, scene.cam, cfg, steps=100, n_rays=128,
        n_inner=50, key=jax.random.PRNGKey(0))
    assert fields[0] is not None and fields[1] is None

    # all-degenerate batch: every slot None, no training attempted
    fields = pretrain_object_fields(
        [(s.inst_id + 1, degenerate, info["pcs"])],
        scene.sample_dict, scene.cam, cfg, steps=100, n_rays=128,
        n_inner=50, key=jax.random.PRNGKey(0))
    assert fields == [None]


def test_uncertainty_fields_empty_frame_info_falls_back():
    """An object with a point cloud but no frame_info (e.g. a ScanNet
    instance surviving only through TSDF accumulation) must take the
    coverage_score fallback instead of crashing field pretraining
    (ADVICE r1 finding)."""
    import numpy as np

    from catnerf_tpu.config import Config
    from catnerf_tpu.data.synthetic import make_scene
    from catnerf_tpu.geometry.registration import (
        get_all_poses, get_uncertainty_fields)

    cfg = Config()
    cfg.load_pretrained = False
    cfg.pretrain_steps = 100
    cfg.pretrain_rays = 128
    scene = make_scene(n_frames=4, width=64, height=48, n_categories=1,
                       insts_per_cat=2, seed=1)
    get_all_poses(scene.inst_dict, scene.sample_dict, scene.cam)
    cls_id = scene.spheres[0].cls_id
    objs = sorted(scene.inst_dict[cls_id])
    # strip one object's frame_info, keep its cloud
    scene.inst_dict[cls_id][objs[1]]["frame_info"] = []

    count_dict, bbox3d_dict, field_dict = {}, {}, {}
    get_uncertainty_fields(scene.inst_dict, bbox3d_dict, count_dict,
                           field_dict, cfg, load_pretrained=False,
                           sample_dict=scene.sample_dict, cam=scene.cam)
    # both objects scored; the stripped one via the geometric fallback
    assert count_dict[cls_id][objs[0]] > 0
    assert count_dict[cls_id][objs[1]] > 0
    assert objs[0] in field_dict[cls_id]
    assert objs[1] not in field_dict[cls_id]


def test_align_poses_skips_unregistrable_instances():
    """Regression: instances whose point cloud is None or empty (ScanNet
    objects missing from the refined segmentation) must be skipped with a
    default pose, not crash align_poses on max() of None (found in
    review)."""
    rng = np.random.default_rng(9)
    sphere = rng.standard_normal((3000, 3))
    sphere = sphere / np.linalg.norm(sphere, axis=-1, keepdims=True) * 0.3
    sphere2 = sphere * 1.02 + np.array([1.5, 0, 0])

    inst_dict = {7: {1: {"frame_info": [], "pcs": sphere},
                     2: {"frame_info": [], "pcs": sphere2},
                     3: {"frame_info": [], "pcs": None},
                     4: {"frame_info": [], "pcs": np.zeros((0, 3))}}}
    count_dict = {7: {1: 100, 2: 50, 3: 0, 4: 0}}
    bbox3d_dict = {7: {1: None, 2: None, 3: None, 4: None}}
    align_poses(inst_dict, bbox3d_dict, count_dict, {}, name="replica")
    # the two real instances registered
    assert "T_obj" in inst_dict[7][1] and "T_obj" in inst_dict[7][2]
    # the unregistrable ones got a default pose and were not subcategorized
    np.testing.assert_array_equal(inst_dict[7][3]["T_obj"], np.eye(4))
    np.testing.assert_array_equal(inst_dict[7][4]["T_obj"], np.eye(4))
    assert 107 not in inst_dict or 3 not in inst_dict.get(107, {})


def test_icp_does_not_mutate_init():
    """Regression: geomlib.icp wrote its result into the caller's init
    matrix (np.ascontiguousarray aliases contiguous float64), defeating
    teaser.py's restore-pre-ICP-pose fallback on degenerate solves."""
    from catnerf_tpu.native.lib import geomlib

    rng = np.random.default_rng(3)
    src = rng.standard_normal((500, 3)).astype(np.float32)
    dst = src + np.array([0.05, 0.0, 0.0], np.float32)
    init = np.eye(4)
    T, _, _ = geomlib.icp(src, dst, max_corr_dist=0.2, init=init)
    assert T is not init
    np.testing.assert_array_equal(init, np.eye(4))
    assert abs(T[0, 3] - 0.05) < 0.02  # and the solve itself worked


def _asym_shape_cloud(fam, n=4000, seed=3):
    """Surface cloud of an asymmetric synthetic shape (world frame), via
    ray casting from random outside viewpoints."""
    from catnerf_tpu.data.synthetic import _make_asym_shape

    rng = np.random.default_rng(seed)
    shape = _make_asym_shape(
        fam, rng, center=np.zeros(3), color=np.full(3, 0.5), inst_id=1,
        cls_id=9, k=0, size_factor=1.0)
    pts = []
    total = 0
    while total < n:
        eyes = rng.normal(size=(2 * n, 3))
        eyes = 2.5 * shape.bound_radius * \
            eyes / np.linalg.norm(eyes, axis=-1, keepdims=True)
        dirs = rng.uniform(-0.35, 0.35, (2 * n, 3)) * shape.bound_radius \
            - eyes
        t = shape.ray_cast(eyes, dirs)
        hit = np.isfinite(t)
        p = eyes[hit] + t[hit, None] * dirs[hit]
        pts.append(p)
        total += len(p)
    return np.concatenate(pts)[:n]


@pytest.mark.parametrize("fam", ["blob", "box"])
def test_asym_shape_rotation_recovery_exact_shape(fam):
    """Same-shape self-registration with a known large rotation must
    recover the rotation to a few degrees. This isolates ALGORITHMIC
    rotation error from the cross-instance shape-variation ambiguity seen
    in the asym gates (diag_registration rot_err_deg includes both)."""
    cloud = _asym_shape_cloud(fam)
    R = Rotation.from_euler("xyz", [25, 40, 10], degrees=True).as_matrix()
    moved = cloud @ R.T + np.array([1.5, 0.2, -0.4])

    inst_dict = {9: {1: {"frame_info": [], "pcs": cloud.copy()},
                     2: {"frame_info": [], "pcs": moved.copy()}}}
    count_dict = {9: {1: 100, 2: 50}}
    bbox3d_dict = {9: {1: None, 2: None}}
    align_poses(inst_dict, bbox3d_dict, count_dict, {}, name="replica")
    assert 109 not in inst_dict and 2 in inst_dict[9]

    T1 = np.asarray(inst_dict[9][1]["T_obj"], np.float64)
    T2 = np.asarray(inst_dict[9][2]["T_obj"], np.float64)
    s1 = np.linalg.det(T1[:3, :3]) ** (1 / 3)
    s2 = np.linalg.det(T2[:3, :3]) ** (1 / 3)
    assert abs(s2 / s1 - 1.0) < 0.05, (s1, s2)  # identical shape, same scale
    # canon->world rotations; moved = R @ cloud + t  =>  R2 == R @ R1
    R_est = (T2[:3, :3] / s2) @ np.linalg.inv(T1[:3, :3] / s1)
    dR = R_est @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 3.0, f"{fam}: rotation recovered {ang:.2f} deg off"


def _jittered_box_cloud(rng, n=4000):
    """Notched box with the gate's per-instance half-extent jitter,
    identity orientation, surface cloud via ray casting."""
    from catnerf_tpu.data.synthetic import NotchedBox

    half = np.array([0.26, 0.19, 0.14]) * rng.uniform(0.9, 1.1, 3)
    shape = NotchedBox(np.zeros(3), np.eye(3), np.full(3, 0.5), 1, 9,
                       half=half, notch_center=half * np.array([0.9, 0.85,
                                                                0.95]),
                       notch_half=half * np.array([0.55, 0.5, 0.65]))
    pts, total = [], 0
    while total < n:
        eyes = rng.normal(size=(2 * n, 3))
        eyes = 2.5 * shape.bound_radius * \
            eyes / np.linalg.norm(eyes, axis=-1, keepdims=True)
        dirs = rng.uniform(-0.35, 0.35, (2 * n, 3)) * shape.bound_radius \
            - eyes
        t = shape.ray_cast(eyes, dirs)
        hit = np.isfinite(t)
        pts.append(eyes[hit] + t[hit, None] * dirs[hit])
        total += int(hit.sum())
    return np.concatenate(pts)[:n]


@pytest.mark.parametrize("seed", [0, 3])
def test_jittered_box_flip_resolved_by_appearance(seed):
    """Cross-instance notched boxes (per-instance half-extent jitter, a
    real 30/-20/55-deg relative rotation): geometry alone picks the
    180-degree flip (the reference's geometric registration shares this
    limit; r3 measured the true alignment beating the flip by only 13%
    Chamfer), but the appearance tie-break on planted octant colors
    resolves it to <15 deg. Also guards the r4 rotation-invariant
    candidate-scale fix: with the world-AABB scale ratio the rotated
    source composed a ~25% shrink and these pairs subcategorized or
    flipped even WITH color."""
    rng1 = np.random.default_rng(100 + seed)
    rng2 = np.random.default_rng(200 + seed)
    c1 = _jittered_box_cloud(rng1)
    c2o = _jittered_box_cloud(rng2)
    R_true = Rotation.from_euler("xyz", [30, -20, 55],
                                 degrees=True).as_matrix()
    c2 = c2o @ R_true.T + np.array([1.1, -0.3, 0.6])

    def tex(p):
        return (0.25 + 0.5 * np.stack(
            [p[:, 0] > 0, p[:, 1] > 0, p[:, 2] > 0], -1)).astype(np.float32)

    inst_dict = {9: {1: {"frame_info": [], "pcs": c1.copy(),
                         "pcs_rgb": tex(c1)},
                     2: {"frame_info": [], "pcs": c2.copy(),
                         "pcs_rgb": tex(c2o)}}}
    align_poses(inst_dict, {9: {1: None, 2: None}}, {9: {1: 100, 2: 50}},
                {}, name="replica", appearance=True)
    assert 109 not in inst_dict and 2 in inst_dict[9], \
        "jittered same-family pair must not subcategorize"

    T1 = np.asarray(inst_dict[9][1]["T_obj"], np.float64)
    T2 = np.asarray(inst_dict[9][2]["T_obj"], np.float64)
    s1 = np.linalg.det(T1[:3, :3]) ** (1 / 3)
    s2 = np.linalg.det(T2[:3, :3]) ** (1 / 3)
    # jitter bounds the true relative scale to [0.9/1.1, 1.1/0.9]
    assert 0.75 < s2 / s1 < 1.35, (s1, s2)
    R_est = (T2[:3, :3] / s2) @ np.linalg.inv(T1[:3, :3] / s1)
    dR = R_est @ R_true.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 15.0, f"seed {seed}: flip not resolved ({ang:.1f} deg)"


def test_appearance_subordinate_to_coverage_adversarial_texture():
    """Pin of the r4 Replica-sphere regression mechanism (BASELINE.md r4:
    a whole-band color pre-filter regressed the sphere gate 0.94 ->
    1.24 cm / 98.8%): when instance textures don't encode the true
    relative pose, color evidence can actively prefer a coverage-LOSING
    candidate — here both domes carry the SAME world-frame checker, so
    the blind-spot-stacking identity-rotation candidate gets near-perfect
    color agreement while the complementary coverage winner mismatches.
    Color may only discriminate among candidates within 2 union-bins of
    the max coverage (registration.py tie-break subordination).
    Mutation-verified: color-filtering the whole accept band keeps only
    the identity-rotation candidates, stacks the two domes' blind spots,
    and fails the union assertion."""
    from catnerf_tpu.geometry.registration import _coverage_bins

    rng = np.random.default_rng(3)

    def dome(radius, center, open_dir, cos_cap=0.55, n=6000):
        u = rng.normal(size=(n, 3))
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        keep = u @ np.asarray(open_dir) < cos_cap
        pts = center + radius * u[keep]
        return pts + rng.normal(0, 0.002, pts.shape)

    def grad(pts, center, M=np.eye(3)):
        # smooth direction-gradient texture, optionally pre-rotated by M:
        # a candidate rotating the source by R gets near-zero color
        # disagreement iff R ~ M (see the color-model comment below)
        u = (pts - center) @ M.T
        u = u / np.linalg.norm(u, axis=-1, keepdims=True)
        return (0.5 + 0.45 * u).astype(np.float32)

    # the complementarity test's geometry...
    ctr_a, ctr_b = np.zeros(3), np.array([2.0, 0.0, 0.0])
    v_a, v_b = np.array([1.0, 0.0, 0.0]), np.array([-0.8, 0.6, 0.0])
    v_b = v_b / np.linalg.norm(v_b)
    a = dome(0.5, ctr_a, v_a)
    b = dome(0.5, ctr_b, v_b)
    # ...plus the adversarial texture: the source's gradient is pre-rotated
    # by R_stack (the rotation mapping b's hole direction onto a's), so
    # color agreement is maximal exactly for the hole-STACKING candidate —
    # the pure-Chamfer winner the coverage tie-break exists to reject.
    # Color and chamfer both prefer R_stack; only the coverage-union
    # objective resists, so subordination is the single line of defense.
    axis = np.cross(v_b, v_a)
    axis = axis / np.linalg.norm(axis)
    ang = np.arccos(np.clip(v_b @ v_a, -1, 1))
    R_stack = Rotation.from_rotvec(ang * axis).as_matrix()

    inst_dict = {9: {1: {"frame_info": [], "pcs": a,
                         "pcs_rgb": grad(a, ctr_a)},
                     2: {"frame_info": [], "pcs": b,
                         "pcs_rgb": grad(b, ctr_b, R_stack)}}}
    align_poses(inst_dict, {9: {1: None, 2: None}}, {9: {1: 100, 2: 50}},
                {}, name="replica", scale_aware=True, appearance=True)
    assert 109 not in inst_dict and 2 in inst_dict[9]

    c1 = transform_pointcloud_np(a, np.linalg.inv(inst_dict[9][1]["T_obj"]))
    c2 = transform_pointcloud_np(b, np.linalg.inv(inst_dict[9][2]["T_obj"]))
    b1, b2 = _coverage_bins(c1), _coverage_bins(c2)
    union = (b1 | b2).sum()
    # blind spots must not coincide: the union recovers at least half of
    # what the template alone is missing (same bar as the color-free
    # complementarity test)
    assert union >= b1.sum() + 0.5 * (b1.size - b1.sum()), (
        union, b1.sum(), b2.sum())


def _eroded_view_cloud(shape, rng, n_views, graze_cos, band=None,
                       rays_per_view=2500):
    """Partial surface cloud dropping grazing-incidence hits — each view
    loses a band at its occluding contour, the 3D signature of the rim
    erosion TSDF fusion + eroded masks produce (see
    scripts/exp_cand_scale.py for the estimator panel on this model)."""
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
    return np.concatenate(pts)


@pytest.mark.parametrize("fam", ["blob", "ellipsoid"])
def test_rim_eroded_pair_registers_without_subcategorization(fam):
    """Rim-erosion acceptance guard (VERDICT r4 item #2, premise
    corrected): the r4 'universal subcategorization from OBB scale
    underestimates' diagnosis was an artifact of diag_registration's
    broken ScanNet subcategorized flag (cls_id >= 100 vs loader classes
    CLS_OFFSET+k >= 100) — at HEAD, rim-eroded asym-ScanNet instances
    register WITHOUT splitting under every candidate-scale statistic, and
    the r3 code exhibits the same accepted-pose errors. What must hold
    (and this pins): a rim-eroded SAME-shape pair at a known size ratio
    is accepted into one category with the relative scale recovered, so
    future acceptance-path changes cannot silently reintroduce
    erosion-driven splits."""
    from catnerf_tpu.data.synthetic import _make_asym_shape

    rng = np.random.default_rng(7)
    tmpl = _make_asym_shape(fam, rng, center=np.zeros(3),
                            color=np.full(3, 0.5), inst_id=1, cls_id=9,
                            k=0, size_factor=1.0)
    rng2 = np.random.default_rng(7)  # same draws -> same shape...
    src = _make_asym_shape(fam, rng2, center=np.array([1.6, -0.4, 0.3]),
                           color=np.full(3, 0.5), inst_id=2, cls_id=9,
                           k=0, size_factor=1.3)  # ...at 1.3x the size
    k_true = 1.3

    c_tmpl = _eroded_view_cloud(tmpl, rng, n_views=7, graze_cos=0.15)
    c_src = _eroded_view_cloud(src, rng, n_views=4, graze_cos=0.35,
                               band=(0.0, 0.7))
    assert len(c_tmpl) > 2000 and len(c_src) > 1000

    inst_dict = {9: {1: {"frame_info": [], "pcs": c_tmpl},
                     2: {"frame_info": [], "pcs": c_src}}}
    align_poses(inst_dict, {9: {1: None, 2: None}}, {9: {1: 100, 2: 50}},
                {}, name="scannet")
    assert 10009 not in inst_dict and 2 in inst_dict[9], \
        f"{fam}: rim-eroded same-shape pair spuriously subcategorized"

    T1 = np.asarray(inst_dict[9][1]["T_obj"], np.float64)
    T2 = np.asarray(inst_dict[9][2]["T_obj"], np.float64)
    s1 = np.linalg.det(T1[:3, :3]) ** (1 / 3)
    s2 = np.linalg.det(T2[:3, :3]) ** (1 / 3)
    assert abs(s2 / s1 - k_true) / k_true < 0.12, (s1, s2, s2 / s1)
    # shared canonical frame: the clouds overlay
    c1 = transform_pointcloud_np(c_tmpl, np.linalg.inv(T1))
    c2 = transform_pointcloud_np(c_src, np.linalg.inv(T2))
    from catnerf_tpu.geometry.pointcloud import chamfer_unidirectional

    assert chamfer_unidirectional(c1, c2) < 0.12
