"""Iso-surface extraction A/B bounds (VERDICT r1 item #4).

The reference extracts meshes with skimage.measure.marching_cubes
(ref: src/vis.py:8-9); our mesher defaults to first-party TABLE-DRIVEN
classic marching cubes (native/src/geomlib.cpp::marching_cubes_classic,
table from scripts/gen_mc_table.py) which reproduces skimage's vertex
semantics exactly — vertices on sign-change cube edges at linear-interp
positions — with crack-free connectivity; the 6-tetrahedra decomposition
is kept as a second, independent extraction. skimage is NOT importable in
this environment, so parity is established structurally (the vertex-set
semantics test below) and the triangulation deviation bounded two more
independent ways:

  1. against the ANALYTIC iso-surface of known shapes (sphere, torus,
     two-sphere union with a concave neck), and
  2. against an INDEPENDENT extraction — a surface-nets polygonizer
     implemented here in numpy (one vertex per sign-change cell at the
     centroid of its edge crossings, quads across crossing faces).

Asserted bound: accuracy/completion between the extractions and vs the
analytic surface stay under 1 voxel and under 1% of the object scale — the
eval protocol (10k sampled surface points, metric/eval_3D_obj.py) cannot
distinguish triangulations below that.
"""

from __future__ import annotations

import numpy as np
import pytest

from catnerf_tpu.mesher.mesh import TriMesh
from catnerf_tpu.metrics import metrics3d
from catnerf_tpu.native.lib import geomlib

N = 64  # grid resolution; voxel = 2/(N-1) in [-1,1] coords


def _grid():
    t = np.linspace(-1.0, 1.0, N)
    return np.meshgrid(t, t, t, indexing="ij")


def _occ_from_sdf(d, sharp=50.0):
    return (1.0 / (1.0 + np.exp(d * sharp))).astype(np.float32)


def sphere_field():
    X, Y, Z = _grid()
    d = np.sqrt(X**2 + Y**2 + Z**2) - 0.62
    return _occ_from_sdf(d), lambda p: np.abs(
        np.linalg.norm(p, axis=-1) - 0.62)


def torus_field():
    X, Y, Z = _grid()
    q = np.sqrt(X**2 + Y**2) - 0.55
    d = np.sqrt(q**2 + Z**2) - 0.24

    def dist(p):
        q = np.sqrt(p[:, 0] ** 2 + p[:, 1] ** 2) - 0.55
        return np.abs(np.sqrt(q**2 + p[:, 2] ** 2) - 0.24)

    return _occ_from_sdf(d), dist


def union_field():
    X, Y, Z = _grid()
    d1 = np.sqrt((X - 0.28) ** 2 + Y**2 + Z**2) - 0.45
    d2 = np.sqrt((X + 0.28) ** 2 + Y**2 + Z**2) - 0.45
    d = np.minimum(d1, d2)

    def dist(p):
        d1 = np.abs(np.linalg.norm(p - [0.28, 0, 0], axis=-1) - 0.45)
        d2 = np.abs(np.linalg.norm(p + [0.28, 0, 0], axis=-1) - 0.45)
        # distance to the union surface: min over both, but points inside
        # the other sphere are not on the union surface; for sampled
        # surface points of a correct mesh this is ~min(d1, d2).
        return np.minimum(d1, d2)

    return _occ_from_sdf(d), dist


def surface_nets(occ: np.ndarray, level: float = 0.5) -> TriMesh:
    """Independent naive surface-nets extraction (numpy): a vertex per cell
    containing a crossing, placed at the centroid of the cell's edge
    crossings; two triangles per crossing grid face."""
    inside = occ > level
    nx, ny, nz = occ.shape

    # edge crossings along each axis with linear interpolation
    def crossings(axis):
        a = occ
        sl0 = [slice(None)] * 3
        sl1 = [slice(None)] * 3
        sl0[axis] = slice(0, -1)
        sl1[axis] = slice(1, None)
        v0, v1 = a[tuple(sl0)], a[tuple(sl1)]
        cut = (v0 > level) != (v1 > level)
        t = np.where(cut, (level - v0) / np.where(cut, v1 - v0, 1.0), 0.0)
        return cut, t

    # cell -> accumulated crossing centroid
    acc = np.zeros((nx - 1, ny - 1, nz - 1, 3))
    cnt = np.zeros((nx - 1, ny - 1, nz - 1))
    for axis in range(3):
        cut, t = crossings(axis)
        idx = np.argwhere(cut)
        pts = idx.astype(np.float64)
        pts[:, axis] += t[cut]
        # each edge borders up to 4 cells: offsets over the other two axes
        o1, o2 = [a for a in range(3) if a != axis]
        for d1 in (0, -1):
            for d2 in (0, -1):
                c = idx.copy()
                c[:, o1] += d1
                c[:, o2] += d2
                ok = ((c[:, 0] >= 0) & (c[:, 0] < nx - 1)
                      & (c[:, 1] >= 0) & (c[:, 1] < ny - 1)
                      & (c[:, 2] >= 0) & (c[:, 2] < nz - 1))
                np.add.at(acc, (c[ok, 0], c[ok, 1], c[ok, 2]), pts[ok])
                np.add.at(cnt, (c[ok, 0], c[ok, 1], c[ok, 2]), 1.0)

    has_v = cnt > 0
    vid = -np.ones((nx - 1, ny - 1, nz - 1), np.int64)
    vid[has_v] = np.arange(has_v.sum())
    verts = acc[has_v] / cnt[has_v][:, None]

    tris = []
    for axis in range(3):
        cut, _ = crossings(axis)
        o1, o2 = [a for a in range(3) if a != axis]
        idx = np.argwhere(cut)
        for e in idx:
            cells = []
            for d1 in (-1, 0):
                for d2 in (-1, 0):
                    c = e.copy()
                    c[o1] += d1
                    c[o2] += d2
                    if (0 <= c[0] < nx - 1 and 0 <= c[1] < ny - 1
                            and 0 <= c[2] < nz - 1):
                        cells.append(vid[c[0], c[1], c[2]])
            if len(cells) == 4 and all(v >= 0 for v in cells):
                a, b, c_, d = cells  # (-1,-1), (-1,0), (0,-1), (0,0)
                tris.append([a, b, d])
                tris.append([a, d, c_])
    return TriMesh(verts, np.asarray(tris, np.int64))


@pytest.mark.parametrize("method", ["mc", "tetra"])
@pytest.mark.parametrize("field_fn", [sphere_field, torus_field, union_field])
def test_tetra_vs_surface_nets_and_analytic(field_fn, method):
    occ, dist_fn = field_fn()
    voxel = 2.0 / (N - 1)

    out = geomlib.marching_cubes(occ, 0.5, method=method)
    assert out is not None
    v, f = out
    tetra = TriMesh(v.astype(np.float64) / (N - 1) * 2.0 - 1.0, f)
    nets = surface_nets(occ)
    nets.vertices = nets.vertices / (N - 1) * 2.0 - 1.0

    rng = np.random.default_rng(0)
    p_tet = tetra.sample_surface(20000, rng)
    p_net = nets.sample_surface(20000, rng)

    # both extractions sit on the analytic surface to well under a voxel
    for pts, name in ((p_tet, "tetra"), (p_net, "nets")):
        d = dist_fn(pts)
        assert d.mean() < 0.35 * voxel, f"{name} mean {d.mean():.4f}"
        assert np.quantile(d, 0.99) < voxel, f"{name} p99"

    # cross-extraction metric deltas: < 1 voxel and < 1% of object scale
    acc = metrics3d.accuracy(p_net, p_tet)
    comp = metrics3d.completion(p_net, p_tet)
    assert acc < voxel and comp < voxel
    assert acc < 0.01 * 1.24 and comp < 0.01 * 1.24  # diameter ~1.24
    # completion ratio at the eval protocol's 5 cm threshold is trivially
    # 100% here; assert at a 1-voxel threshold instead
    ratio = metrics3d.completion_ratio(p_net, p_tet, dist_th=voxel)
    assert ratio > 0.995


# ---------------------------------------------------------------------------
# Table-driven classic marching cubes (mc_table.h / marching_cubes_classic)
# ---------------------------------------------------------------------------


def test_mc_vertices_are_skimage_edge_semantics():
    """Classic MC vertices lie on sign-change CUBE edges at linearly
    interpolated positions — the exact vertex set
    skimage.measure.marching_cubes produces (ref: src/vis.py:8-9). Exactly
    one coordinate per vertex is fractional; the fractional value equals
    the analytic linear-interp crossing."""
    occ, _ = sphere_field()
    v, _ = geomlib.marching_cubes(occ, 0.5, method="mc")
    frac = np.abs(v - np.round(v))
    n_frac = (frac > 1e-6).sum(axis=1)
    assert (n_frac <= 1).all()  # on a grid edge (or exactly a grid node)

    # spot-verify interpolation values against the field
    rng = np.random.default_rng(0)
    for idx in rng.choice(len(v), size=200, replace=False):
        p = v[idx]
        axis = int(np.argmax(frac[idx]))
        if frac[idx, axis] <= 1e-6:
            continue
        lo = p.copy()
        lo[axis] = np.floor(p[axis])
        hi = lo.copy()
        hi[axis] += 1
        va = occ[int(lo[0]), int(lo[1]), int(lo[2])]
        vb = occ[int(hi[0]), int(hi[1]), int(hi[2])]
        t_expected = (0.5 - va) / (vb - va)
        assert abs((p[axis] - lo[axis]) - t_expected) < 1e-5

    # the tetrahedra decomposition does NOT have this property (vertices on
    # cell diagonals) — the MC kernel is the one with skimage semantics
    vt, _ = geomlib.marching_cubes(occ, 0.5, method="tetra")
    fract = np.abs(vt - np.round(vt))
    assert ((fract > 1e-6).sum(axis=1) > 1).any()


def test_mc_crack_free_all_256_cases():
    """Random binary grids exercise every one of the 256 cube cases
    (including the ambiguous faces where classic Lorensen tables crack);
    the extraction must be watertight away from the grid boundary."""
    rng = np.random.default_rng(0)
    cases_seen = set()
    corners = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
               (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
    for trial in range(30):
        g = (rng.random((6, 6, 6)) > 0.5).astype(np.float32)
        for i in range(5):
            for j in range(5):
                for k in range(5):
                    m = 0
                    for c, (dx, dy, dz) in enumerate(corners):
                        if g[i + dx, j + dy, k + dz] > 0.5:
                            m |= 1 << c
                    cases_seen.add(m)
        out = geomlib.marching_cubes(g, 0.5, method="mc")
        if out is None:
            continue
        v, f = out
        e = np.sort(np.concatenate(
            [f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1)
        uniq, counts = np.unique(e, axis=0, return_counts=True)
        assert (counts <= 2).all(), trial
        # boundary-count-1 edges must touch the open grid boundary
        open_edges = uniq[counts == 1]
        if len(open_edges):
            pts = v[open_edges.ravel()].reshape(-1, 2, 3)
            on_boundary = ((pts <= 0.0) | (pts >= 5.0)).any(axis=(1, 2))
            assert on_boundary.all(), trial
    assert len(cases_seen) == 256


def test_mc_vs_tetra_metric_ab():
    """Cross-extraction A/B through the eval metric: the two first-party
    extractions agree to well under a voxel (and mc is the sharper one
    vs the analytic surface)."""
    occ, dist_fn = sphere_field()
    voxel = 2.0 / (N - 1)
    meshes = {}
    for m in ("mc", "tetra"):
        v, f = geomlib.marching_cubes(occ, 0.5, method=m)
        meshes[m] = TriMesh(v.astype(np.float64) / (N - 1) * 2.0 - 1.0, f)
    rng = np.random.default_rng(1)
    p_mc = meshes["mc"].sample_surface(20000, rng)
    p_tet = meshes["tetra"].sample_surface(20000, rng)
    assert metrics3d.accuracy(p_mc, p_tet) < 0.5 * voxel
    assert metrics3d.completion(p_mc, p_tet) < 0.5 * voxel
    # mc interpolates only on grid edges -> sharper than tet diagonals
    assert dist_fn(p_mc).mean() <= dist_fn(p_tet).mean()


def test_mc_table_header_matches_generator():
    """The committed mc_table.h is exactly what scripts/gen_mc_table.py
    produces (determinism + no hand edits)."""
    import importlib.util
    import os
    import tempfile

    root = os.path.join(os.path.dirname(__file__), "..")
    spec = importlib.util.spec_from_file_location(
        "gen_mc_table", os.path.join(root, "scripts", "gen_mc_table.py"))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)

    header = os.path.join(root, "catnerf_tpu", "native", "src", "mc_table.h")
    with open(header) as fh:
        committed = fh.read()

    table = [gen.triangles_for_case(c) for c in range(256)]
    max_tris = gen.verify_tables(table)
    assert max_tris == 5  # the classic MC bound
    # regenerate into a temp dir and compare byte-for-byte
    with tempfile.TemporaryDirectory() as td:
        fake_scripts = os.path.join(td, "scripts")
        os.makedirs(os.path.join(td, "catnerf_tpu", "native", "src"))
        os.makedirs(fake_scripts)
        import unittest.mock as mock
        with mock.patch.object(gen.os.path, "dirname",
                               return_value=fake_scripts):
            gen.main()
        with open(os.path.join(td, "catnerf_tpu", "native", "src",
                               "mc_table.h")) as fh:
            regenerated = fh.read()
    assert regenerated == committed
