"""Patch-grid, key, padding, and dark-filter semantics (FIXTURES.md §3):
the non-standard rules the reference pins down (trailing-edge crop, key
regex, crop_lr = crop_hr // scale, NaN-aware dark filter)."""

from __future__ import annotations

import numpy as np
import pytest

from etl_mri_scripts_spark.operators.filters import is_predominantly_dark_u8, patch_is_dark
from etl_mri_scripts_spark.operators.patches import (
    crop_with_edge_pad,
    lr_origin,
    make_crop_spaces,
    normalize_key,
    patch_key,
    slice_key,
)


def test_grid_exact_fit():
    h_space, w_space = make_crop_spaces(16, 16, 8, 4)
    assert h_space == [0, 4, 8] and w_space == [0, 4, 8]


def test_grid_trailing_edge_rule():
    # dim 18, crop 8, step 4: starts 0,4,8,10? regular = 0,4,8 (last<=10),
    # remainder 18-(8+8)=2 > 0 -> append 18-8=10
    h_space, _ = make_crop_spaces(18, 18, 8, 4)
    assert h_space == [0, 4, 8, 10]
    # with thresh_size >= remainder no tail is added
    h_space2, _ = make_crop_spaces(18, 18, 8, 4, thresh_size=2)
    assert h_space2 == [0, 4, 8]


def test_grid_small_dim():
    # dim < crop: single origin at 0 (pad fills the rest)
    h_space, _ = make_crop_spaces(6, 6, 8, 4)
    assert h_space == [0]


def test_edge_pad():
    img = np.arange(36, dtype=np.float32).reshape(6, 6)
    tile = crop_with_edge_pad(img, 4, 4, 4)
    assert tile.shape == (4, 4)
    # bottom-right corner replicated
    assert tile[-1, -1] == img[-1, -1]
    np.testing.assert_array_equal(tile[2:, 2:], np.full((2, 2), img[-1, -1]))


def test_keys_and_normalization():
    assert slice_key("sub-001_T1w", "axial", 7) == "sub-001_T1w__axial__slice_007"
    fk = patch_key("sub-001_T1w", "axial", 7, "HR", 3)
    assert fk == "sub-001_T1w__axial__slice_007__HR_s003"
    assert normalize_key(fk) == "sub-001_T1w__axial__slice_007__s003"
    lk = patch_key("sub-001_T1w", "axial", 7, "LRx2", 3)
    assert normalize_key(lk) == normalize_key(fk)  # J1 pairing invariant
    # non-tagged keys unchanged
    assert normalize_key("abc__s001") == "abc__s001"


def test_lr_origin_integer_arithmetic():
    assert lr_origin(5, 7, 2) == (2, 3)  # floor division, per reference
    assert lr_origin(0, 0, 4) == (0, 0)


def test_dark_filter_u8():
    dark = np.zeros((8, 8), dtype=np.uint8)
    assert is_predominantly_dark_u8(dark)
    bright = np.full((8, 8), 200, dtype=np.uint8)
    assert not is_predominantly_dark_u8(bright)
    rgb = np.zeros((8, 8, 3), dtype=np.uint8)
    assert is_predominantly_dark_u8(rgb)


def test_dark_filter_float():
    assert patch_is_dark(np.zeros((8, 8), dtype=np.float32))
    assert not patch_is_dark(np.full((8, 8), 0.5, dtype=np.float32))
    # threshold equivalence: 20/255 boundary
    just_below = np.full((8, 8), 19.0 / 255.0, dtype=np.float32)
    just_above = np.full((8, 8), 21.0 / 255.0, dtype=np.float32)
    assert patch_is_dark(just_below)
    assert not patch_is_dark(just_above)


def test_dark_filter_nan_handling():
    p = np.full((8, 8), np.nan, dtype=np.float32)
    assert patch_is_dark(p)  # all-NaN == dark
    mixed = np.full((8, 8), 0.5, dtype=np.float32)
    mixed[:2] = np.nan
    assert not patch_is_dark(mixed, ignore_nan=True)
    # with ignore_nan=False NaNs count as 0 (dark votes)
    mostly_nan = np.full((10, 10), np.nan, dtype=np.float32)
    mostly_nan[0, :5] = 0.9
    assert not patch_is_dark(mostly_nan, ignore_nan=True)
    assert patch_is_dark(mostly_nan, ignore_nan=False)


def test_dark_filter_border_trim():
    p = np.zeros((12, 12), dtype=np.float32)
    p[2:-2, 2:-2] = 0.5  # bright interior, dark frame
    # fraction dark = 1 - (8*8)/144 = 0.555 < 0.7 -> not dark even untrimmed
    assert not patch_is_dark(p)
    assert not patch_is_dark(p, border=2)  # interior only: bright
    q = np.zeros((12, 12), dtype=np.float32)
    q[4:-4, 4:-4] = 0.5  # small interior: 4*4/144 = 11% bright -> dark
    assert patch_is_dark(q)
    assert not patch_is_dark(q, border=4)  # trimmed to the bright interior


def test_crop_space_col_matches_python(spark):
    # the Catalyst expression and the in-UDF Python grid must agree exactly
    # (same trailing-edge rule) — sampled sweep over dims and configs
    from pyspark.sql import functions as F

    from etl_mri_scripts_spark.operators.patches import crop_space_col

    dims = spark.range(1, 400, 7).select(F.col("id").cast("int").alias("dim"))
    for crop, step, thr in [(8, 4, 0), (32, 16, 0), (128, 64, 8), (480, 240, 0)]:
        got = {
            r["dim"]: list(r["space"])
            for r in dims.select(
                "dim", crop_space_col(F.col("dim"), crop, step, thr).alias("space")
            ).collect()
        }
        for d, space in got.items():
            assert space == make_crop_spaces(d, d, crop, step, thr)[0], (d, crop, step, thr)
