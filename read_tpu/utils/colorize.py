"""Visualization color maps.

Parity targets: ``colorize`` viridis mapping for 1-channel tensorboard
images (``READ/utils/train.py:79-111``) and the KITTI 9-class
segmentation palette (``src/READ/utils/train.py:15-38``;
``src/train.py:601-606``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["colorize", "KITTI_COLORS", "label_to_color"]

# 9-class driving palette (road, car, vegetation, ... — the src tree's
# hardcoded KITTI map).
KITTI_COLORS = np.array([
    [0, 0, 0],          # 0: void / ignore
    [128, 64, 128],     # 1: road
    [244, 35, 232],     # 2: sidewalk
    [70, 70, 70],       # 3: building
    [107, 142, 35],     # 4: vegetation
    [70, 130, 180],     # 5: sky
    [220, 20, 60],      # 6: person
    [0, 0, 142],        # 7: car
    [119, 11, 32],      # 8: cyclist
], np.uint8)


def label_to_color(labels: np.ndarray,
                   palette: np.ndarray = KITTI_COLORS) -> np.ndarray:
    """Map ``[H, W]`` int labels to an RGB uint8 image."""
    labels = np.clip(np.asarray(labels, np.int64), 0,
                     len(palette) - 1)
    return palette[labels]


def colorize(x: np.ndarray, cmap: str = "viridis",
             vmin=None, vmax=None) -> np.ndarray:
    """1-channel array -> RGB float image via a matplotlib colormap."""
    import matplotlib.cm as cm
    x = np.asarray(x, np.float64)
    vmin = np.nanmin(x) if vmin is None else vmin
    vmax = np.nanmax(x) if vmax is None else vmax
    xn = (x - vmin) / max(vmax - vmin, 1e-12)
    return cm.get_cmap(cmap)(np.clip(xn, 0, 1))[..., :3].astype(
        np.float32)
