"""Tests for the first-party C++ geometry library (replaces skimage /
scipy.cKDTree / Open3D / TEASER++, SURVEY.md §2.3)."""

import numpy as np
import pytest
from scipy.spatial import cKDTree
from scipy.spatial.transform import Rotation

from catnerf_tpu.native.lib import geomlib


def _sphere_grid(n=48, r=0.6, smooth=True):
    t = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(t, t, t, indexing="ij")
    d = np.sqrt(X**2 + Y**2 + Z**2)
    if smooth:
        # occupancy-like smooth field crossing 0.5 at radius r
        return 1.0 / (1.0 + np.exp((d - r) * 40.0)), t
    return (d < r).astype(np.float32), t


def test_marching_cubes_sphere_accuracy():
    n = 48
    occ, t = _sphere_grid(n)
    out = geomlib.marching_cubes(occ.astype(np.float32), 0.5)
    assert out is not None
    verts, tris = out
    assert len(verts) > 500 and len(tris) > 500
    assert tris.min() >= 0 and tris.max() < len(verts)
    # map grid-index units -> [-1, 1]
    pts = verts / (n - 1) * 2.0 - 1.0
    r = np.linalg.norm(pts, axis=-1)
    # smooth field -> sub-voxel accuracy
    assert abs(r.mean() - 0.6) < 0.01
    assert np.abs(r - 0.6).max() < 0.05


def test_marching_cubes_empty_returns_none():
    occ = np.zeros((8, 8, 8), np.float32)
    assert geomlib.marching_cubes(occ, 0.5) is None
    occ = np.ones((8, 8, 8), np.float32)
    assert geomlib.marching_cubes(occ, 0.5) is None


def test_marching_cubes_watertight_orientation():
    """Signed volume of the closed sphere mesh ~ 4/3 pi r^3 with positive
    orientation (normals outward from the occupied region)."""
    n = 40
    occ, _ = _sphere_grid(n, r=0.5)
    verts, tris = geomlib.marching_cubes(occ.astype(np.float32), 0.5)
    pts = verts / (n - 1) * 2.0 - 1.0
    v0, v1, v2 = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
    vol = np.sum(np.einsum("ij,ij->i", v0, np.cross(v1, v2))) / 6.0
    expected = 4.0 / 3.0 * np.pi * 0.5**3
    assert abs(abs(vol) - expected) / expected < 0.05
    assert vol > 0  # outward orientation


def test_kdtree_matches_scipy():
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    q = rng.standard_normal((100, 3)).astype(np.float32)
    tree = geomlib.KDTree(pts)
    dist, idx = tree.query(q)
    sd, si = cKDTree(pts).query(q)
    np.testing.assert_allclose(dist, sd, rtol=1e-5)
    np.testing.assert_array_equal(idx, si)


def test_kdtree_radius_counts():
    pts = np.array([[0, 0, 0], [1, 0, 0], [0.5, 0, 0]], np.float32)
    tree = geomlib.KDTree(pts)
    counts = tree.radius_counts(np.array([[0, 0, 0]], np.float32), 0.6)
    assert counts[0] == 2  # self + (0.5,0,0)


def test_voxel_downsample_centroids():
    pts = np.array([
        [0.01, 0.01, 0.01], [0.03, 0.03, 0.03],  # same voxel (0.1)
        [0.55, 0.0, 0.0],
    ], np.float32)
    out = geomlib.voxel_downsample(pts, 0.1)
    assert out.shape == (2, 3)
    out = out[np.argsort(out[:, 0])]
    np.testing.assert_allclose(out[0], [0.02, 0.02, 0.02], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.55, 0.0, 0.0], atol=1e-6)


def test_radius_outlier_removal():
    rng = np.random.default_rng(1)
    cluster = rng.normal(0, 0.05, (200, 3)).astype(np.float32)
    outliers = np.array([[5, 5, 5], [-4, 2, 9]], np.float32)
    pts = np.concatenate([cluster, outliers])
    kept, mask = geomlib.remove_radius_outliers(pts, nb_points=10, radius=0.2)
    assert mask[:200].all()
    assert not mask[200:].any()


def test_estimate_normals_plane():
    rng = np.random.default_rng(2)
    xy = rng.uniform(-1, 1, (300, 2))
    pts = np.concatenate([xy, np.zeros((300, 1))], -1).astype(np.float32)
    normals = geomlib.estimate_normals(pts, radius=0.3, max_nn=30)
    nz = np.abs(normals[:, 2])
    assert (nz > 0.99).mean() > 0.95


def test_icp_recovers_transform():
    rng = np.random.default_rng(3)
    src = rng.uniform(-1, 1, (400, 3)).astype(np.float32)
    R = Rotation.from_euler("xyz", [5, -8, 3], degrees=True).as_matrix()
    t = np.array([0.05, -0.03, 0.08])
    dst = (src @ R.T + t).astype(np.float32)
    T, fitness, rmse = geomlib.icp(src, dst, max_corr_dist=0.4)
    np.testing.assert_allclose(T[:3, :3], R, atol=1e-3)
    np.testing.assert_allclose(T[:3, 3], t, atol=1e-3)
    assert fitness > 0.99 and rmse < 1e-3


def test_gnc_tls_robust_to_outliers():
    """Known R,t recovery with 40% gross outlier correspondences —
    the TEASER robustness property (ref: teaser_fpfh_icp.py:77-82)."""
    rng = np.random.default_rng(4)
    n, n_out = 120, 80
    src = rng.uniform(-1, 1, (n + n_out, 3)).astype(np.float32)
    R = Rotation.from_euler("xyz", [40, -25, 70], degrees=True).as_matrix()
    t = np.array([0.4, -0.2, 0.9])
    dst = (src @ R.T + t).astype(np.float32)
    dst[:n] += rng.normal(0, 0.005, (n, 3))  # inlier noise
    dst[n:] = rng.uniform(-2, 2, (n_out, 3))  # gross outliers
    # shuffle
    perm = rng.permutation(n + n_out)
    src, dst = src[perm], dst[perm]

    clique = geomlib.max_clique(src, dst, noise_bound=0.02)
    assert len(clique) >= n * 0.8
    T, inliers = geomlib.gnc_tls(src[clique], dst[clique], noise_bound=0.02)
    np.testing.assert_allclose(T[:3, :3], R, atol=0.02)
    np.testing.assert_allclose(T[:3, 3], t, atol=0.02)


def _brute_force_max_clique(adj: np.ndarray) -> int:
    """Exact max-clique size by subset enumeration (test oracle, n <= ~20)."""
    n = adj.shape[0]
    best = 0
    for mask in range(1, 1 << n):
        size = bin(mask).count("1")
        if size <= best:
            continue
        members = [i for i in range(n) if mask >> i & 1]
        ok = all(adj[i, j] for k, i in enumerate(members)
                 for j in members[k + 1:])
        if ok:
            best = size
    return best


def test_max_clique_exact_vs_brute_force():
    """The B&B solver is exact: matches subset-enumeration on random
    graphs across densities (parity target: PMC exact, helpers.py:62-64)."""
    rng = np.random.default_rng(11)
    for density in (0.2, 0.5, 0.8):
        for trial in range(6):
            n = int(rng.integers(8, 17))
            adj = rng.uniform(size=(n, n)) < density
            adj = np.triu(adj, 1)
            adj = (adj | adj.T).astype(np.uint8)
            clique = geomlib.max_clique_graph(adj)
            # returned set is a clique
            for a in range(len(clique)):
                for b in range(a + 1, len(clique)):
                    assert adj[clique[a], clique[b]]
            assert len(clique) == _brute_force_max_clique(adj), (
                f"density={density} trial={trial}")


def test_max_clique_beats_greedy_trap():
    """A graph engineered so greedy expansion from high-degree seeds finds
    a smaller clique than the true maximum: a hidden K6 among low-degree
    vertices, plus a high-degree star-of-triangles decoy. The exact solver
    must find the K6 (the r1 greedy solver returned the decoy triangle)."""
    K, n_decoy = 6, 30
    n = K + 1 + n_decoy
    adj = np.zeros((n, n), np.uint8)
    # hidden clique on vertices 0..K-1 (each has degree K-1 = 5)
    for i in range(K):
        for j in range(i + 1, K):
            adj[i, j] = adj[j, i] = 1
    # decoy hub (vertex K) connected to all decoy leaves, leaves paired into
    # triangles with the hub -> hub degree 30, clique through hub is only 3
    hub = K
    for leaf in range(K + 1, n):
        adj[hub, leaf] = adj[leaf, hub] = 1
    for leaf in range(K + 1, n - 1, 2):
        adj[leaf, leaf + 1] = adj[leaf + 1, leaf] = 1
    clique = geomlib.max_clique_graph(adj)
    assert len(clique) == K
    assert set(clique.tolist()) == set(range(K))


def test_max_clique_large_registration_graph():
    """6000-node consistency graph (the production clique budget): a 300-
    strong inlier clique among 5700 noise vertices solves exactly and fast."""
    import time

    rng = np.random.default_rng(7)
    n_in, n_out = 300, 5700
    src = rng.uniform(-1, 1, (n_in + n_out, 3)).astype(np.float32)
    R = Rotation.from_euler("xyz", [33, -50, 12], degrees=True).as_matrix()
    dst = (src @ R.T + np.array([0.3, 0.1, -0.2])).astype(np.float32)
    dst[:n_in] += rng.normal(0, 0.003, (n_in, 3))
    dst[n_in:] = rng.uniform(-2, 2, (n_out, 3))
    perm = rng.permutation(n_in + n_out)
    src, dst = src[perm], dst[perm]
    t0 = time.time()
    clique = geomlib.max_clique(src, dst, noise_bound=0.01)
    elapsed = time.time() - t0
    inlier_ids = set(np.nonzero(perm < n_in)[0].tolist())
    assert len(clique) >= n_in * 0.95
    assert len(inlier_ids & set(clique.tolist())) >= n_in * 0.95
    assert elapsed < 60, f"clique solve too slow: {elapsed:.1f}s"


def test_gnc_tls_degenerate():
    T, m = geomlib.gnc_tls(np.zeros((2, 3), np.float32),
                           np.zeros((2, 3), np.float32), 0.01)
    assert T is None and m is None


def test_fpfh_invariance_and_discrimination():
    """FPFH is rotation-invariant and distinguishes plane vs sphere."""
    rng = np.random.default_rng(5)
    xy = rng.uniform(-1, 1, (400, 2))
    plane = np.concatenate([xy, np.zeros((400, 1))], -1).astype(np.float32)
    sph = rng.standard_normal((400, 3))
    sph = (sph / np.linalg.norm(sph, axis=-1, keepdims=True)).astype(np.float32)

    def fpfh(pts):
        nrm = geomlib.estimate_normals(pts, radius=0.4, max_nn=40)
        return geomlib.compute_fpfh(pts, nrm, radius=0.5, max_nn=50)

    f_plane = fpfh(plane)
    f_sph = fpfh(sph)
    R = Rotation.from_euler("xyz", [30, 60, -45], degrees=True).as_matrix()
    f_plane_rot = fpfh((plane @ R.T.astype(np.float32)))

    mean_plane = f_plane.mean(0)
    mean_rot = f_plane_rot.mean(0)
    mean_sph = f_sph.mean(0)
    # rotation invariance: rotated plane's mean descriptor stays close
    d_rot = np.linalg.norm(mean_plane - mean_rot)
    d_shape = np.linalg.norm(mean_plane - mean_sph)
    assert d_rot < 0.5 * d_shape


def test_tsdf_fusion_sphere():
    """Fuse synthetic depth of a sphere from several views; extracted points
    must lie on the surface."""
    from catnerf_tpu.data.synthetic import make_scene

    scene = make_scene(n_frames=6, width=80, height=60, n_categories=1,
                       insts_per_cat=1, unknown_band=False)
    sp = scene.spheres[0]
    vol = geomlib.TSDFVolume(voxel_length=0.02, sdf_trunc=0.08)
    cam = scene.cam
    for f, s in scene.sample_dict.items():
        depth = np.where(s["obj_mask"] == sp.inst_id, s["depth"], 0.0)
        T_CW = np.linalg.inv(np.asarray(s["T"]))
        vol.integrate(depth.astype(np.float32), s["image"], cam.fx, cam.fy,
                      cam.cx, cam.cy, T_CW, max_depth=8.0)
    pts, cols = vol.extract_point_cloud()
    assert len(pts) > 200
    d = np.linalg.norm(pts - sp.center, axis=-1)
    # surface within ~a voxel
    assert np.median(np.abs(d - sp.radius)) < 0.02
    assert np.percentile(np.abs(d - sp.radius), 90) < 0.04


def test_voxel_downsample_exact_cells():
    """One output point per DISTINCT occupied voxel: the cell key must be
    exact (the old scalar-hash key let distinct voxels collide and merge
    into bogus mid-air centroids at ~1e-3 probability per 100k voxels)."""
    rng = np.random.default_rng(7)
    pts = rng.uniform(-40.0, 40.0, (200_000, 3)).astype(np.float32)
    voxel = 0.25
    ds = geomlib.voxel_downsample(pts, voxel)
    # replicate the C kernel's exact double-precision cell formula
    p64 = pts.astype(np.float64)
    minc = p64.min(0)
    cells = ((p64 - minc) / voxel).astype(np.int64)
    n_cells = len(np.unique(cells, axis=0))
    assert len(ds) == n_cells, (len(ds), n_cells)
    # every centroid lies inside its own voxel's bounds
    dcells = ((ds.astype(np.float64) - minc) / voxel).astype(np.int64)
    assert len(np.unique(dcells, axis=0)) == n_cells
