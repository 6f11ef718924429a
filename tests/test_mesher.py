"""Mesher + metrics tests, ending in the full L0-L6 slice: train on the
synthetic scene, extract meshes, evaluate 3D metrics against the analytic
ground truth."""

import os

import numpy as np
import pytest

from catnerf_tpu.config import Config
from catnerf_tpu.data.synthetic import make_scene
from catnerf_tpu.mesher.mesh import TriMesh, load_mesh
from catnerf_tpu.mesher import meshing
from catnerf_tpu.metrics import metrics3d
from catnerf_tpu.native.lib import geomlib
from catnerf_tpu.train.loop import TrainingSession


def _unit_sphere_mesh(radius=1.0, center=(0, 0, 0), n=48):
    t = np.linspace(-1.5 * radius, 1.5 * radius, n)
    X, Y, Z = np.meshgrid(t, t, t, indexing="ij")
    d = np.sqrt(X**2 + Y**2 + Z**2)
    occ = 1.0 / (1.0 + np.exp((d - radius) * 30 / radius))
    verts, tris = geomlib.marching_cubes(occ.astype(np.float32), 0.5)
    verts = verts / (n - 1) * (3 * radius) - 1.5 * radius + np.asarray(center)
    return TriMesh(verts, tris)


def test_trimesh_sample_surface():
    m = TriMesh(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0.0]]),
                np.array([[0, 1, 2]]))
    pts = m.sample_surface(500)
    assert pts.shape == (500, 3)
    assert (pts[:, 2] == 0).all()
    assert (pts[:, 0] >= 0).all() and (pts[:, 1] >= 0).all()
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-9).all()
    np.testing.assert_allclose(m.area, 0.5)


def test_trimesh_export_load_roundtrip(tmp_path):
    m = _unit_sphere_mesh(0.5)
    m.vertex_colors = np.full((len(m.vertices), 3), 128, np.uint8)
    for ext in ("obj", "ply"):
        path = os.path.join(tmp_path, f"m.{ext}")
        m.export(path)
        m2 = load_mesh(path)
        np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-5)
        np.testing.assert_array_equal(m2.faces, m.faces)
        np.testing.assert_array_equal(m2.vertex_colors, m.vertex_colors)


def test_trimesh_crop_to_obb():
    m = _unit_sphere_mesh(1.0)
    half = m.crop_to_obb(center=[0, 0, 0], R=np.eye(3), extent=[2, 2, 1])
    # crop keeps faces with |z| <= 0.5
    assert len(half.faces) < len(m.faces)
    centroids = half.vertices[half.faces].mean(1)
    assert (np.abs(centroids[:, 2]) <= 0.52).all()


def test_metrics_identical_and_shifted():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((2000, 3))
    assert metrics3d.accuracy(pts, pts) == 0.0
    assert metrics3d.completion(pts, pts) == 0.0
    assert metrics3d.completion_ratio(pts, pts) == 1.0
    shifted = pts + np.array([0.03, 0, 0])
    acc = metrics3d.accuracy(pts, shifted)
    assert 0.0 < acc <= 0.03 + 1e-6
    assert metrics3d.completion_ratio(pts, shifted, 0.05) > 0.95
    assert metrics3d.chamfer(pts, shifted) > 0


def test_calc_3d_metric_sphere_vs_itself():
    m = _unit_sphere_mesh(0.5)
    res = metrics3d.calc_3d_metric(m, m, n_samples=5000)
    # independent surface samples of the same mesh: mean NN distance ~ the
    # sampling spacing (~1.3 cm at 5k samples on a 0.5 m sphere)
    assert res["accuracy"] < 2.5  # cm
    assert res["completion"] < 2.5
    assert res["completion_ratio"] > 99.0


@pytest.fixture(scope="module")
def trained_session():
    cfg = Config()
    cfg.net_hyperparams.latent_dim = 16
    cfg.hidden_feature_size_bg = 64
    cfg.n_per_optim = 120
    cfg.n_per_optim_bg = 600
    scene = make_scene(n_frames=6, width=80, height=60, n_categories=1,
                       insts_per_cat=2, seed=2)
    sess = TrainingSession(cfg, scene.inst_dict, scene.sample_dict,
                           cam=scene.cam)
    sess.run(600, callback_every=200)
    return sess, scene


def test_mesh_field_and_eval(trained_session, tmp_path):
    sess, scene = trained_session
    written = meshing.mesh_scene(sess, str(tmp_path), iteration=600)
    # background + both instances meshed
    assert 0 in written
    sphere_ids = [sp.inst_id for sp in scene.spheres]
    meshed = [i for i in sphere_ids if i in written]
    assert len(meshed) >= 1, f"no object meshes written: {written}"

    for iid in meshed:
        sp = next(s for s in scene.spheres if s.inst_id == iid)
        rec = load_mesh(written[iid])
        gt = _unit_sphere_mesh(sp.radius, sp.center)
        res = metrics3d.calc_3d_metric(rec, gt, n_samples=3000)
        # coarse CPU training: just require the mesh to be in the right
        # place at roughly the right size (accuracy/completion < 15 cm)
        assert res["accuracy"] < 15.0, res
        assert res["completion"] < 15.0, res


def test_mesh_object_matches_mesh_scene_and_serves(trained_session,
                                                   tmp_path):
    """mesh_object (the per-object extraction /mesh serves) produces
    byte-identical .obj content to the mesh_scene export, over HTTP too."""
    import json
    import threading
    import urllib.error
    import urllib.request

    from catnerf_tpu.serve import SceneServer, serve

    sess, scene = trained_session
    written = meshing.mesh_scene(sess, str(tmp_path), iteration=601)
    assert written

    server = SceneServer(sess)
    httpd = serve(sess, port=0, scene_server=server)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        for obj_id, path in written.items():
            with open(path, "rb") as f:
                on_disk = f.read()
            url = f"http://127.0.0.1:{port}/mesh?id={obj_id}"
            with urllib.request.urlopen(url, timeout=300) as r:
                assert r.headers["Content-Type"] == "model/obj"
                assert r.read() == on_disk
            # second request is a cache hit (same bytes object)
            assert server.mesh_obj(obj_id) is server.mesh_obj(obj_id)

        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/mesh?id=424242", timeout=60)
            raise AssertionError("unknown id should 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "unknown object" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()


def test_adaptive_grid_dim():
    # 1.0 // 0.005 = 199 in binary float (the reference's formula has the
    # same behavior, train.py:220)
    assert meshing.adaptive_grid_dim([1.0, 0.5, 0.2], 0.005, 256) == 224  # 200 rounded to /32
    assert meshing.adaptive_grid_dim([10, 10, 10], 0.005, 256) == 256


def test_mesh_fill_interior_removes_inner_shell():
    """A crust-profile occupancy (high at the surface band, decaying inside)
    yields TWO marching-cubes shells; with mesh_fill_interior the enclosed
    cavity is raised above the level and only the outer surface remains."""
    import numpy as np
    from scipy import ndimage
    from catnerf_tpu.native.lib import geomlib

    n = 64
    t = np.linspace(-1.0, 1.0, n)
    X, Y, Z = np.meshgrid(t, t, t, indexing="ij")
    d = np.sqrt(X**2 + Y**2 + Z**2)
    # crust around r=0.6 of width ~0.15: occ ~0.9 in crust, ~0.1 elsewhere
    occ = 0.1 + 0.8 * np.exp(-((d - 0.6) / 0.1) ** 2)
    occ = occ.astype(np.float32)

    v_raw, f_raw = geomlib.marching_cubes(occ, 0.5)
    r_raw = np.linalg.norm(v_raw / (n - 1) * 2 - 1, axis=1)
    assert (r_raw < 0.55).sum() > 100  # inner shell present

    solid = occ > 0.5
    cavity = ndimage.binary_fill_holes(solid) & ~solid
    occ_filled = np.where(cavity, np.float32(0.51), occ)
    v_f, f_f = geomlib.marching_cubes(occ_filled, 0.5)
    r_f = np.linalg.norm(v_f / (n - 1) * 2 - 1, axis=1)
    assert (r_f < 0.55).sum() == 0  # inner shell gone
    assert abs(np.median(r_f) - np.median(r_raw[r_raw > 0.55])) < 0.02


def test_mesh_adaptive_bounds_recovers_clipped_surface(monkeypatch):
    """An analytic sphere field whose true surface exceeds the given OBB
    (the observed-cloud-underestimates-extent failure measured by
    scripts/diag_registration.py) is clipped without adaptive bounds and
    fully enclosed with them."""
    from catnerf_tpu.data.scene import OrientedBBox

    sphere_c = np.array([0.1, 0.0, 0.25])  # offset along z like the diag
    sphere_r = 0.5

    def occ_of(points):
        d = np.linalg.norm(np.asarray(points) - sphere_c, axis=-1)
        return (1.0 / (1.0 + np.exp((d - sphere_r) * 60.0))).astype(
            np.float32)

    def fake_grid(params, cfg, sc, tc, *, grid_dim, scale_np, transform_np,
                  **kw):
        pts = meshing.host_grid_points(grid_dim, scale_np, transform_np)
        return occ_of(pts), None

    def fake_eval(points, params, cfg, sc=None, tc=None, *, is_background,
                  chunk=262144, want_color=True, device_mesh=None, **kw):
        return occ_of(points), np.zeros((len(points), 3), np.float32)

    monkeypatch.setattr(meshing, "_grid_occ_seen", fake_grid)
    monkeypatch.setattr(meshing, "eval_points", fake_eval)  # vertex colors
    cfg = Config()
    # OBB from the "observed" cloud: z-extent 30% short, center biased low
    bound = OrientedBBox(center=np.array([0.1, 0.0, 0.1]), R=np.eye(3),
                         extent=np.array([1.0, 1.0, 0.7]))

    def max_gt_dist(mesh):
        rng = np.random.default_rng(0)
        u = rng.normal(size=(4000, 3))
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        gt = sphere_c + sphere_r * u
        from catnerf_tpu.native.lib import geomlib as g

        kd = g.KDTree(mesh.vertices.astype(np.float32))
        dist, _ = kd.query(gt.astype(np.float32))
        return dist.max()

    cfg.mesh_adaptive_bounds = False
    clipped = meshing.mesh_field({}, cfg, grid_dim=64, is_background=False,
                                 shape_code=0, texture_code=0, bound=bound)
    assert clipped is not None and max_gt_dist(clipped) > 0.15  # top cap gone

    cfg.mesh_adaptive_bounds = True
    full = meshing.mesh_field({}, cfg, grid_dim=64, is_background=False,
                              shape_code=0, texture_code=0, bound=bound)
    assert full is not None and max_gt_dist(full) < 0.03  # surface enclosed


def test_mesh_adaptive_bounds_canonical_frame(monkeypatch):
    """Growth also works on the canonical-frame (extent) path used by
    multi-instance categories, where the grid gains a translation."""
    sphere_c = np.array([0.0, 0.0, 0.3])
    sphere_r = 0.8

    def occ_of(points):
        d = np.linalg.norm(np.asarray(points) - sphere_c, axis=-1)
        return (1.0 / (1.0 + np.exp((d - sphere_r) * 60.0))).astype(
            np.float32)

    def fake_grid(params, cfg, sc, tc, *, grid_dim, scale_np, transform_np,
                  **kw):
        pts = meshing.host_grid_points(grid_dim, scale_np, transform_np)
        return occ_of(pts), None

    def fake_eval(points, params, cfg, sc=None, tc=None, *, is_background,
                  chunk=262144, want_color=True, device_mesh=None, **kw):
        return occ_of(points), np.zeros((len(points), 3), np.float32)

    monkeypatch.setattr(meshing, "_grid_occ_seen", fake_grid)
    monkeypatch.setattr(meshing, "eval_points", fake_eval)  # vertex colors
    cfg = Config()
    cfg.mesh_adaptive_bounds = True
    mesh = meshing.mesh_field({}, cfg, grid_dim=64, is_background=False,
                              shape_code=0, texture_code=0,
                              extent=np.array([1.6, 1.6, 1.2]))
    assert mesh is not None
    r = np.linalg.norm(mesh.vertices - sphere_c, axis=-1)
    assert abs(np.median(r) - sphere_r) < 0.03
    # the +z cap (beyond the original grid top at z=1.2/0.9/2=0.67) exists
    assert (mesh.vertices[:, 2] > sphere_c[2] + 0.9 * sphere_r).any()


def test_interior_fill_respects_observed_free_concavity():
    """Regression: the >=5-axis visual-hull interior fill must not re-mark
    voxels the space carve proved free — an open cup's interior is blocked
    on 5 of 6 axes and was being clobbered back to solid, deleting the
    observed concavity (found in review; order was carve THEN fill)."""
    occ = np.full((16, 16, 16), 0.1, np.float32)
    occ[4:12, 4:12, 4:12] = 0.9          # solid block
    cavity = np.zeros_like(occ, bool)
    cavity[6:10, 6:10, 6:12] = True      # interior channel, open at +z
    occ[cavity] = 0.1

    filled = meshing._fill_unobservable_interior(occ.copy())
    assert (filled[cavity] > 0.5).all(), "sanity: fill does close the cup"

    kept = meshing._fill_unobservable_interior(occ.copy(),
                                               observed_free=cavity)
    assert (kept[cavity] <= 0.5).all(), \
        "observed-free voxels must survive the interior fill"
    # fill still works elsewhere: a fully enclosed bubble gets closed
    occ2 = occ.copy()
    bubble = np.zeros_like(occ, bool)
    bubble[5, 5, 5] = True
    occ2[bubble] = 0.1
    kept2 = meshing._fill_unobservable_interior(occ2, observed_free=cavity)
    assert (kept2[bubble] > 0.5).all()


def test_load_obj_fan_triangulates_quads(tmp_path):
    """Regression: quad faces lost one of their two triangles (review)."""
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n")
    m = load_mesh(str(p))
    assert m.faces.shape == (2, 3)
    # the two triangles cover the unit square: total area 1
    a = 0.0
    for f in m.faces:
        v = m.vertices[f]
        a += 0.5 * np.linalg.norm(np.cross(v[1] - v[0], v[2] - v[0]))
    np.testing.assert_allclose(a, 1.0, rtol=1e-6)


def test_load_ply_binary_int_list_counts(tmp_path):
    """Regression: binary PLY face parsing hardcoded uchar counts + int32
    indices instead of honoring the declared 'property list' types."""
    import struct

    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 2\n"
        "property list int int vertex_indices\n"
        "end_header\n")
    body = verts.astype("<f4").tobytes()
    for tri in ([0, 1, 2], [0, 2, 3]):
        body += struct.pack("<i", 3) + struct.pack("<3i", *tri)
    p = tmp_path / "intlist.ply"
    p.write_bytes(header.encode() + body)
    m = load_mesh(str(p))
    np.testing.assert_array_equal(m.faces, [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_allclose(m.vertices, verts, atol=1e-7)

    # and a quad face with ushort counts exercises the loop path
    header2 = header.replace("element face 2", "element face 1").replace(
        "property list int int", "property list ushort uint")
    body2 = verts.astype("<f4").tobytes() + struct.pack("<H", 4) + \
        struct.pack("<4I", 0, 1, 2, 3)
    p2 = tmp_path / "quadlist.ply"
    p2.write_bytes(header2.encode() + body2)
    m2 = load_mesh(str(p2))
    assert m2.faces.shape == (2, 3)


def test_load_ply_crlf_header_and_truncated(tmp_path):
    """Regression: a CRLF-terminated header parsed as header_end=10 (the
    find() miss made every count 0) and silently returned an EMPTY mesh;
    a file with no end_header must be a loud error, not an empty mesh."""
    import pytest
    import struct

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    header = (
        "ply\r\nformat binary_little_endian 1.0\r\n"
        "element vertex 3\r\n"
        "property float x\r\nproperty float y\r\nproperty float z\r\n"
        "element face 1\r\n"
        "property list uchar int vertex_indices\r\n"
        "end_header\r\n")
    body = verts.astype("<f4").tobytes() + struct.pack("<B3i", 3, 0, 1, 2)
    p = tmp_path / "crlf.ply"
    p.write_bytes(header.encode() + body)
    m = load_mesh(str(p))
    np.testing.assert_allclose(m.vertices, verts, atol=1e-7)
    np.testing.assert_array_equal(m.faces, [[0, 1, 2]])

    bad = tmp_path / "noheader.ply"
    bad.write_bytes(b"ply\nformat ascii 1.0\nelement vertex 3\n")
    with pytest.raises(ValueError, match="end_header"):
        load_mesh(str(bad))


def test_device_grid_program_matches_host_path():
    """The r4 device-resident grid program (canonical grid + in-graph
    affine + in-graph space carve) must reproduce the host path: host
    grid build + eval_points + space_carve_mask."""
    import jax

    from catnerf_tpu.data.camera import CameraInfo
    from catnerf_tpu.models import codenerf

    cfg = Config()
    key = jax.random.PRNGKey(4)
    params = {
        "pe": {"B": jax.random.normal(key, (21, 3)) * 5.0},
        "fc": codenerf.init_params(jax.random.PRNGKey(5), latent_dim=8,
                                   W=16),
    }
    sc = np.zeros(8, np.float32)
    tc = np.zeros(8, np.float32)

    cam = CameraInfo(32, 24, 30.0, 30.0, 16.0, 12.0)
    rng = np.random.default_rng(0)
    depths = rng.uniform(0.5, 3.0, (3, 32, 24)).astype(np.float32)
    depths[0, :4] = 0.0
    T_wc = np.stack([np.eye(4, dtype=np.float32) for _ in range(3)])
    T_wc[1][:3, 3] = [0.3, -0.2, -1.5]
    T_wc[2][:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]],
                               np.float32)
    carve = (depths, T_wc, cam)
    Tw = np.eye(4)
    Tw[:3, 3] = [0.1, 0.0, 1.2]

    dim, chunk = 32, 4096
    scale_np = np.array([0.8, 0.7, 0.9])
    transform_np = np.eye(4, dtype=np.float32)
    transform_np[:3, 3] = [0.05, -0.1, 0.2]
    voxel_w = float(np.max(scale_np)) * 2.0 / (dim - 1)

    occ_d, seen_d = meshing._grid_occ_seen(
        params, cfg, sc, tc, grid_dim=dim, scale_np=scale_np,
        transform_np=transform_np, world_transform=Tw, carve=carve,
        is_background=False, voxel_w=voxel_w, device_mesh=None,
        chunk=chunk)

    pts = meshing.host_grid_points(dim, scale_np, transform_np)
    occ_h, _ = meshing.eval_points(pts, params, cfg, sc, tc,
                                   is_background=False, chunk=chunk,
                                   want_color=False)
    pts_w = pts @ Tw[:3, :3].T + Tw[:3, 3]
    seen_h = meshing.space_carve_mask(pts_w, depths, T_wc, cam,
                                      margin=3.0 * voxel_w)

    # the device program zeroes carved voxels in-graph; mirror on host
    occ_h = np.where(seen_h, np.float32(0.0), occ_h)
    assert seen_d is not None
    agree = seen_d == seen_h
    mism = (~agree).mean()
    assert mism < 1e-3, f"carve mask mismatch fraction {mism}"
    # the device program ships occupancy uint8-quantized (half a quantum
    # = 1/510 max dequantization error; MC only interpolates the 0.5
    # crossing)
    np.testing.assert_allclose(occ_d[agree], occ_h[agree], atol=1.0 / 509)
    assert seen_h.any() and (~seen_h).any()  # the fixture exercises both


def test_native_interior_cavity_matches_scipy():
    """The C++ interior_cavity_mask must reproduce the scipy/numpy fill
    recipe exactly — structured crust + random fields, with and without
    an observed-free mask."""
    rng = np.random.default_rng(7)

    def check(occ, free):
        a = meshing._fill_unobservable_interior(occ.copy(),
                                                observed_free=free)
        b = meshing._fill_unobservable_interior_py(occ.copy(),
                                                   observed_free=free)
        np.testing.assert_array_equal(a, b)

    # structured: crust sphere with an open channel (the cup fixture)
    n = 48
    t = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(t, t, t, indexing="ij")
    d = np.sqrt(X**2 + Y**2 + Z**2)
    occ = (0.1 + 0.8 * np.exp(-((d - 0.6) / 0.1) ** 2)).astype(np.float32)
    check(occ, None)
    check(occ, d > 0.8)

    # random blobs (exercises hole/border topology + all 6 sweeps)
    for _ in range(3):
        occ = rng.uniform(0, 1, (24, 20, 28)).astype(np.float32)
        occ = np.where(occ > 0.7, 0.9, 0.1).astype(np.float32)
        check(occ, None)
        check(occ, rng.uniform(size=occ.shape) > 0.8)
