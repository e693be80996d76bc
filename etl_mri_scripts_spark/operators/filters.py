"""Background/dark-patch predicates (SURVEY.md §2.5 F2-F3).

Two equivalent thresholds: uint8 (pixel < 20, ref filters.py:4-10) and
float-in-[0,1] (pixel < 20/255, NaN-aware, optional border trim, ref
v2/patch_utils.py:58-99). Empty/NaN-only patches count as dark — they gate
all downstream LR work (HR-gates-LR ordering, §7 hard parts).
"""

from __future__ import annotations

import numpy as np

DARK_THRESHOLD_U8 = 20
DARK_THRESHOLD_01 = 20.0 / 255.0
DARK_FRACTION = 0.7


def is_predominantly_dark_u8(
    img: np.ndarray, threshold: int = DARK_THRESHOLD_U8, percentage: float = DARK_FRACTION
) -> bool:
    """uint8 variant; 3-channel inputs are grayscale-averaged first."""
    if img.ndim == 3:
        img = img.mean(axis=2)
    return float((img < threshold).mean()) > percentage


def patch_is_dark(
    patch01: np.ndarray,
    thr01: float = DARK_THRESHOLD_01,
    percentage: float = DARK_FRACTION,
    ignore_nan: bool = True,
    border: int = 0,
) -> bool:
    """float-[0,1] variant: NaN-aware, optional border trim; an empty or
    all-NaN patch is dark."""
    p = patch01
    if border > 0 and min(p.shape[:2]) > 2 * border:
        p = p[border:-border, border:-border]
    vals = p[~np.isnan(p)] if ignore_nan else np.nan_to_num(p, nan=0.0)
    if vals.size == 0:
        return True
    return float((vals < thr01).mean()) > percentage
