"""Image-space transforms (ref: src/image_transforms.py:5-60)."""

from __future__ import annotations

import numpy as np


def depth_scale(depth: np.ndarray, scale: float) -> np.ndarray:
    """Raw depth units -> meters (ref: src/image_transforms.py:5-17)."""
    return depth.astype(np.float32) * scale


def depth_filter(depth: np.ndarray, max_depth: float) -> np.ndarray:
    """Zero out far depth (ref: src/image_transforms.py:20-30)."""
    out = depth.copy()
    out[out > max_depth] = 0.0
    return out


def bgr_to_rgb(image: np.ndarray) -> np.ndarray:
    """(ref: src/image_transforms.py:33-40)."""
    return image[..., ::-1].copy()


class Undistort:
    """Plumb-bob undistortion via a precomputed rectify map
    (ref: src/image_transforms.py:43-59; unused in the reference's shipped
    configs but part of its transform surface)."""

    def __init__(self, K: np.ndarray, distortion: np.ndarray,
                 width: int, height: int):
        import cv2

        self.map1, self.map2 = cv2.initUndistortRectifyMap(
            K, distortion, np.eye(3), K, (width, height), cv2.CV_32FC1
        )

    def __call__(self, image: np.ndarray) -> np.ndarray:
        import cv2

        return cv2.remap(image, self.map1, self.map2,
                         interpolation=cv2.INTER_LINEAR)
