"""Patch (sub-image) extraction: crop grids, keys, padding, LR derivation
(SURVEY.md §2.3 P8-P11, §2.11 T1-T4).

The grid/key arithmetic is deliberately split from pixel work: grids and
keys are computed as Catalyst expressions (optimizer-visible — prunable,
joinable, partitionable), while the crop itself happens inside the Arrow
UDF that already holds the slice pixels. This is the §4 design rule: keys
and predicates in columns, pixels in opaque payloads.
"""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# --- pure-Python reference semantics (used inside UDFs + tests) -----------


def make_crop_spaces(
    h: int, w: int, crop: int, step: int, thresh_size: int = 0
) -> tuple[list[int], list[int]]:
    """Crop-origin grids with the trailing-edge rule: regular starts
    arange(0, dim-crop+1, step), plus a final dim-crop start if the
    remainder past the last window exceeds thresh_size
    (ref: v2/patch_utils.py:36-46, extract_subimages.py:55-60)."""

    def axis(dim: int) -> list[int]:
        last_regular = max(dim - crop, 0)
        starts = list(range(0, last_regular + 1, step))
        if dim - (starts[-1] + crop) > thresh_size:
            starts.append(dim - crop)
        return starts

    return axis(h), axis(w)


def crop_with_edge_pad(img: np.ndarray, y: int, x: int, crop: int) -> np.ndarray:
    """crop x crop window at (y, x), edge-padded when it overruns the
    border (ref: v2/nii_to_lmdb.py:247-250)."""
    h, w = img.shape
    tile = img[y : min(y + crop, h), x : min(x + crop, w)]
    py, px = crop - tile.shape[0], crop - tile.shape[1]
    if py or px:
        tile = np.pad(tile, ((0, py), (0, px)), mode="edge")
    return tile


KEY_NORM_RE = re.compile(r"__(HR|LRx\d+)_(s\d+)$")


def normalize_key(key: str) -> str:
    """Strip the resolution tag: ..__HR_s003 -> ..__s003
    (ref: v2/patch_utils.py:48-50)."""
    return KEY_NORM_RE.sub(r"__\2", key)


def slice_key(base: str, orient: str, i: int) -> str:
    return f"{base}__{orient}__slice_{i:03d}"


def patch_key(base: str, orient: str, i: int, tag: str, idx: int) -> str:
    """1-based patch index in h-then-w scan order
    (ref: v2/nii_to_lmdb.py:256, extract_subimages.py:62-69)."""
    return f"{base}__{orient}__slice_{i:03d}__{tag}_s{idx:03d}"


def lr_origin(x: int, y: int, scale: int) -> tuple[int, int]:
    """LR crop origin derived from the HR grid — never recomputed — which
    is what guarantees HR/LR key parity (ref: v2/nii_to_lmdb.py:271,
    280-282)."""
    return x // scale, y // scale


# --- Catalyst expression builders ----------------------------------------


def crop_space_col(dim: Column, crop: int, step: int, thresh_size: int = 0) -> Column:
    """make_crop_spaces as an array<int> column expression, so the patch
    fan-out is a posexplode the optimizer can see and repartition after."""
    regular = F.sequence(F.lit(0), F.greatest(dim - crop, F.lit(0)), F.lit(step))
    last = F.element_at(regular, -1)
    need_tail = (dim - (last + F.lit(crop))) > F.lit(thresh_size)
    return F.when(need_tail, F.concat(regular, F.array(dim - crop))).otherwise(regular)


def normalize_key_col(key: Column) -> Column:
    return F.regexp_replace(key, r"__(HR|LRx\d+)_(s\d+)$", "__$2")


def patch_key_col(base: Column, orient: Column, i: Column, tag: Column, idx: Column) -> Column:
    return F.format_string("%s__%s__slice_%03d__%s_s%03d", base, orient, i, tag, idx)
