"""Generate the 256-case marching-cubes triangulation table (mc_table.h).

Parity target: skimage.measure.marching_cubes semantics (ref: src/vis.py:8-9)
— surface vertices on sign-change CUBE edges at linear-interpolated
positions, triangle connectivity per the classic 256-case cube table.

The table is derived from first principles rather than copied: for each of
the 256 inside/outside corner configurations, the iso-surface's intersection
with the cube boundary is traced as closed loops — each cut face contributes
segments between its crossing edges (ambiguous 4-crossing faces use the
face-local "separate the inside corners" pairing, so adjacent cells always
agree and the extracted surface is crack-free, unlike classic Lorensen) —
and each loop is fan-triangulated. Loops are wound so triangle normals point
away from the inside (> level) region, matching marching_tetrahedra's
orientation convention in geomlib.cpp.

Writes catnerf_tpu/native/src/mc_table.h. Deterministic; run once, commit
the header. Verified here by exhaustive structural checks over all cases.
"""

from __future__ import annotations

import os

import numpy as np

# Cube corner offsets (x, y, z) — must match CORNER[] in geomlib.cpp.
CORNERS = [
    (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
    (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
]

# The 12 cube edges as corner-index pairs. This ordering is the contract
# with the C++ kernel (EDGE_CORNERS[] in geomlib.cpp).
EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]
EDGE_INDEX = {frozenset(e): i for i, e in enumerate(EDGES)}

# The 6 faces as cyclically-ordered corner quadruples.
FACES = [
    (0, 1, 2, 3),  # z = 0
    (4, 7, 6, 5),  # z = 1
    (0, 4, 5, 1),  # y = 0
    (1, 5, 6, 2),  # x = 1
    (2, 6, 7, 3),  # y = 1
    (3, 7, 4, 0),  # x = 0
]


def midpoint(edge_id: int) -> np.ndarray:
    a, b = EDGES[edge_id]
    return (np.asarray(CORNERS[a], float) + np.asarray(CORNERS[b], float)) / 2


def face_segments(face, inside):
    """Segments (pairs of crossing-edge ids) the iso-surface cuts on a face."""
    cyc = list(face)
    cross = []  # (position-in-cycle, edge_id)
    for i in range(4):
        a, b = cyc[i], cyc[(i + 1) % 4]
        if inside[a] != inside[b]:
            cross.append((i, EDGE_INDEX[frozenset((a, b))]))
    if not cross:
        return []
    if len(cross) == 2:
        return [(cross[0][1], cross[1][1])]
    # Ambiguous face: corners alternate in/out around the cycle. Pair each
    # inside corner with its two adjacent crossing edges so the inside
    # corners stay separated. Face-local and value-deterministic, hence
    # consistent between the two cells sharing the face (crack-free).
    assert len(cross) == 4
    segs = []
    for i in range(4):
        if inside[cyc[i]]:
            e_prev = EDGE_INDEX[frozenset((cyc[i - 1], cyc[i]))]
            e_next = EDGE_INDEX[frozenset((cyc[i], cyc[(i + 1) % 4]))]
            segs.append((e_prev, e_next))
    assert len(segs) == 2
    return segs


def loops_for_case(case: int):
    inside = [(case >> c) & 1 == 1 for c in range(8)]
    segs = []
    for f in FACES:
        segs.extend(face_segments(f, inside))
    if not segs:
        return []
    # Every crossing edge appears in exactly 2 segments -> disjoint cycles.
    adj: dict[int, list[int]] = {}
    for a, b in segs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for e, nbrs in adj.items():
        assert len(nbrs) == 2, (case, e, nbrs)
    unvisited = set(adj)
    loops = []
    while unvisited:
        start = min(unvisited)
        loop = [start]
        unvisited.remove(start)
        prev, cur = None, start
        while True:
            nxt = [n for n in adj[cur] if n != prev]
            # Two identical neighbours (loop of length 2 impossible; a
            # degenerate back-and-forth would mean a repeated segment).
            nxt = nxt[0] if nxt else adj[cur][0]
            if nxt == start:
                break
            loop.append(nxt)
            unvisited.remove(nxt)
            prev, cur = cur, nxt
        assert len(loop) >= 3, (case, loop)
        loops.append(loop)

    # Orient each loop: normal (Newell) must point away from the inside
    # corners nearest the loop.
    oriented = []
    ins_pts = np.array([CORNERS[c] for c in range(8) if inside[c]], float)
    for loop in loops:
        pts = np.stack([midpoint(e) for e in loop])
        normal = np.zeros(3)
        for i in range(len(pts)):
            p, q = pts[i], pts[(i + 1) % len(pts)]
            normal += np.cross(p, q)
        centroid = pts.mean(axis=0)
        d = np.linalg.norm(ins_pts - centroid[None], axis=1)
        near_in = ins_pts[d <= d.min() + 1.0]  # inside corners this loop cuts off
        outward = centroid - near_in.mean(axis=0)
        if float(normal @ outward) < 0:
            loop = loop[::-1]
        oriented.append(loop)
    return oriented


def triangles_for_case(case: int):
    tris = []
    for loop in loops_for_case(case):
        for i in range(1, len(loop) - 1):
            tris.append((loop[0], loop[i], loop[i + 1]))
    return tris


def verify_tables(table):
    # 1. Crossing-edge coverage: every sign-change edge appears in the
    #    triangulation; no other edge does.
    for case in range(256):
        inside = [(case >> c) & 1 == 1 for c in range(8)]
        crossing = {i for i, (a, b) in enumerate(EDGES) if inside[a] != inside[b]}
        used = {e for tri in table[case] for e in tri}
        assert used == crossing, (case, used, crossing)
    # 2. Watertightness within a case: every undirected vertex pair used by
    #    the triangulation lies on either a shared fan edge (count 2) or the
    #    loop boundary (count 1, closed by the neighbouring cell's face
    #    segment — checked globally by the C++ tests on random grids).
    # 3. Face consistency (crack-freeness): two cells sharing a face must
    #    induce the SAME segments on it, each computed in its own cube frame.
    #    Simulate cube A at origin and cube B shifted +x: A's x=1 face
    #    (corners 1,5,6,2) is B's x=0 face (corners 0,4,7,3). For every
    #    value pattern on the 4 shared corners, compare the two cells'
    #    segments as geometric midpoint pairs in GLOBAL coordinates. This
    #    would fail for any pairing rule keyed on cycle position rather
    #    than corner values (the two frames traverse the face in opposite
    #    winding), e.g. classic Lorensen's case-orientation-based rule.
    face_a = FACES[3]                      # (1, 5, 6, 2): x = 1 in cube A
    face_b = FACES[5]                      # (3, 7, 4, 0): x = 0 in cube B
    a_to_b = {1: 0, 5: 4, 6: 7, 2: 3}      # shared corner ids A -> B
    b_shift = np.array([1.0, 0.0, 0.0])    # cube B's origin offset

    def geom_segs(face, inside, shift):
        out = set()
        for e1, e2 in face_segments(face, inside):
            p1 = tuple(np.round(midpoint(e1) + shift, 6))
            p2 = tuple(np.round(midpoint(e2) + shift, 6))
            out.add(frozenset((p1, p2)))
        return out

    for pattern in range(16):
        inside_a = [False] * 8
        inside_b = [False] * 8
        for bit, ca in enumerate(face_a):
            val = (pattern >> bit) & 1 == 1
            inside_a[ca] = val
            inside_b[a_to_b[ca]] = val
        segs_a = geom_segs(face_a, inside_a, np.zeros(3))
        segs_b = geom_segs(face_b, inside_b, b_shift)
        assert segs_a == segs_b, (pattern, segs_a, segs_b)
    n_tri = [len(t) for t in table]
    return max(n_tri)


def main():
    table = [triangles_for_case(c) for c in range(256)]
    max_tris = verify_tables(table)
    width = max_tris * 3 + 1  # -1 terminator
    lines = [
        "// Auto-generated by scripts/gen_mc_table.py — do not edit.",
        "// 256-case marching-cubes triangulation table. Entries are cube-edge",
        "// ids (EDGE_CORNERS order), -1 terminated. Derived from first",
        "// principles (face-loop tracing, crack-free ambiguous-face rule);",
        "// see the generator for the construction and its verification.",
        "#pragma once",
        "",
        f"static const int MC_MAX_TRIS = {max_tris};",
        f"static const int MC_ROW = {width};",
        "static const signed char MC_EDGE_CORNERS[12][2] = {",
        "    " + ", ".join("{%d, %d}" % e for e in EDGES) + ",",
        "};",
        f"static const signed char MC_TRI_TABLE[256][{width}] = {{",
    ]
    for case in range(256):
        flat = [e for tri in table[case] for e in tri]
        flat.append(-1)
        flat += [-1] * (width - len(flat))
        lines.append("    {" + ", ".join(str(v) for v in flat) + "},")
    lines.append("};")
    out = os.path.join(os.path.dirname(__file__), "..", "catnerf_tpu",
                       "native", "src", "mc_table.h")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    n_cases_with_tris = sum(1 for t in table if t)
    print(f"wrote {out}: max {max_tris} tris/case, "
          f"{n_cases_with_tris} non-empty cases")


if __name__ == "__main__":
    main()
