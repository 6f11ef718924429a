"""Geometric segmentation for ScanNet instance-mask refinement.

Parity target: `geometry_segmentation` / `refine_inst_data`
(ref: src/utils.py:561-721). Depth-discontinuity + surface-convexity edge
detection, contour labeling, edge-pixel label propagation by 3D proximity,
small-segment rejection; refined masks assign each geometric segment to the
instance with the highest overlap.

Operates in standard (H, W) image layout internally (cv2 convention); the
caller transposes at the boundary like the reference does
(ref: src/dataset.py:404-407).
"""

from __future__ import annotations

import numpy as np

from catnerf_tpu.native.lib import geomlib


def _unproject_hw(depth_hw: np.ndarray, fx, fy, cx, cy) -> np.ndarray:
    """(H, W) depth -> (H, W, 3) camera-frame point map (0 where invalid)."""
    H, W = depth_hw.shape
    u = np.arange(W, dtype=np.float32)[None, :]
    v = np.arange(H, dtype=np.float32)[:, None]
    x = (u - cx) / fx * depth_hw
    y = (v - cy) / fy * depth_hw
    return np.stack([x, y, depth_hw], axis=-1)


def geometry_segmentation(rgb: np.ndarray, depth: np.ndarray, fx, fy, cx, cy,
                          min_segment_px: int = 500,
                          th_convex: float = 0.9,
                          propagation_rounds: int = 3):
    """Returns (normal_image, label_map, segment_masks) for an (H, W) frame
    (ref: src/utils.py:561-694)."""
    import cv2

    valid_mask = depth > 0
    depth_map = _unproject_hw(depth.astype(np.float32), fx, fy, cx, cy)
    depth_map[~valid_mask] = 0

    # normals from the camera-frame cloud (ref: src/utils.py:568-572)
    pts = depth_map[valid_mask].reshape(-1, 3)
    normal_image = np.zeros_like(depth_map)
    if len(pts) >= 3:
        normals = geomlib.estimate_normals(pts, radius=0.1, max_nn=100)
        normals = np.where(normals[:, 2:] > 0, -normals, normals)
        normal_image[valid_mask] = normals
    H, W = depth.shape

    # depth discontinuities (ref: src/utils.py:575-583)
    element = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
    erosion = depth - cv2.erode(depth, element)
    dilatation = cv2.dilate(depth, element) - depth
    ratio = np.zeros_like(depth)
    ratio[valid_mask] = np.maximum(erosion, dilatation)[valid_mask] / depth[valid_mask]
    discontinuity = (ratio > 0.01).astype(np.float32)

    # convexity map over 5x5 neighborhood offsets (ref: src/utils.py:586-604)
    min_convexity_map = 10.0 * np.ones_like(depth)
    for i in range(25):
        if i == 12:
            continue
        kernel = np.zeros((5, 5), np.float32)
        kernel[2, 2] = -1.0
        kernel[i // 5, i % 5] = 1.0
        difference_map = cv2.filter2D(depth_map, -1, kernel)
        dot = np.sum(difference_map * (-normal_image), axis=-1)
        convexity_mask = (dot > -0.0005).astype(np.float32)
        concavity_mask = 1.0 - convexity_mask
        normal_kernel = np.zeros((5, 5), np.float32)
        normal_kernel[i // 5, i % 5] = 1.0
        filtered_normals = cv2.filter2D(normal_image, -1, normal_kernel)
        nproj = np.sum(normal_image * filtered_normals, axis=-1) * concavity_mask
        min_convexity_map = np.minimum(min_convexity_map,
                                       convexity_mask + nproj)

    convex_map = (min_convexity_map > th_convex).astype(np.float32)
    element2 = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3), anchor=(1, 1))
    convex_map = cv2.morphologyEx(convex_map, cv2.MORPH_OPEN, element2)
    convex_map[depth == 0] = 0

    # edge map (ref: src/utils.py:613-617)
    disc_closed = cv2.morphologyEx(discontinuity, cv2.MORPH_CLOSE, element2)
    edge_map = np.clip(convex_map - disc_closed, 0, None)
    edge_map[depth == 0] = 0
    edge_u8 = edge_map.astype(np.uint8)

    # connected-component labels of the edge regions
    # (the reference uses findContours hierarchies, ref: src/utils.py:620-641;
    # connected components give the same segment partition of edge pixels)
    n_labels, cc = cv2.connectedComponents(edge_u8, connectivity=8)
    output_labels = cc.astype(np.int32) - 1  # -1 = non-edge
    output_labels[edge_u8 == 0] = -1

    # propagate labels to nearby non-edge pixels by 3D proximity
    # (ref: src/utils.py:643-671): 9x9 window, keep the closest labeled
    # neighbor within 5 cm. Each round sources ONLY the previous round's
    # labels (the reference's `~filter_is_edge` gate restricts sources to
    # original edge pixels = exactly 1 round, max 4 px reach); extra rounds
    # grow segments a further ~4 px each, order-independently. Default 3:
    # measured on the ScanNet registered gate, the denser refined masks
    # keep TSDF object clouds intact (1.96 cm/94% at 1 round, 1.32/99.0
    # at 2, 1.10 cm/99.99% at 3); strict parity sets
    # cfg.seg_propagation_rounds=1.
    min_dists = 0.05 * np.ones_like(depth)
    unlabeled = (edge_u8 == 0) & (depth > 0)
    for _ in range(max(1, propagation_rounds)):
        src_labels = output_labels.copy()
        changed = False
        for dy in range(-4, 5):
            for dx in range(-4, 5):
                if dx == 0 and dy == 0:
                    continue
                shifted_labels = np.full_like(output_labels, -1)
                shifted_pts = np.zeros_like(depth_map)
                ys0, ys1 = max(0, dy), min(H, H + dy)
                xs0, xs1 = max(0, dx), min(W, W + dx)
                yd0, yd1 = max(0, -dy), min(H, H - dy)
                xd0, xd1 = max(0, -dx), min(W, W - dx)
                shifted_labels[yd0:yd1, xd0:xd1] = src_labels[ys0:ys1,
                                                              xs0:xs1]
                shifted_pts[yd0:yd1, xd0:xd1] = depth_map[ys0:ys1, xs0:xs1]
                dists = np.linalg.norm(depth_map - shifted_pts, axis=-1)
                take = unlabeled & (shifted_labels >= 0) & (dists < min_dists)
                if take.any():
                    output_labels[take] = shifted_labels[take]
                    min_dists[take] = dists[take]
                    changed = True
        if not changed:
            break

    # collect segments, dropping small ones (ref: src/utils.py:676-692)
    segment_masks = []
    for label in np.unique(output_labels):
        if label < 0:
            continue
        m = output_labels == label
        if m.sum() < min_segment_px:
            output_labels[m] = -1
            continue
        segment_masks.append(m)

    return normal_image, output_labels, segment_masks


def refine_inst_data(inst_data: np.ndarray, segment_masks: list[np.ndarray],
                     threshold: float = 0.7) -> np.ndarray:
    """Assign each geometric segment to the instance with > threshold overlap
    (ref: src/utils.py:696-721)."""
    from scipy.ndimage import binary_fill_holes

    refined = np.zeros_like(inst_data)
    obj_ids = [i for i in np.unique(inst_data) if i not in (0, -1)]
    if not obj_ids:
        return refined
    for seg in segment_masks:
        seg = binary_fill_holes(seg)
        seg_sum = seg.sum()
        if seg_sum == 0:
            continue
        rates = np.array([
            (seg & (inst_data == oid)).sum() / seg_sum for oid in obj_ids
        ])
        if rates.max() > threshold:
            refined[seg] = obj_ids[int(np.argmax(rates))]
    return refined
