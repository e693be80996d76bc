"""K9/P3 viz operators: triptych render + display rotation, verified on
real PNG bytes end-to-end through Spark."""

from __future__ import annotations

import glob

import numpy as np
import pytest

from etl_mri_scripts_spark.operators.viz import (
    compose_triptych,
    pnorm_uint8,
    render_triptychs,
    rot90_display,
    write_triptych_tree,
)
from etl_mri_scripts_spark.sources.codecs import decode_png


def test_pnorm_uint8_matches_reference_semantics():
    rng = np.random.default_rng(2)
    x = rng.random((20, 30)) * 500
    out = pnorm_uint8(x)
    assert out.dtype == np.uint8
    vmin, vmax = np.nanpercentile(x, 1.0), np.nanpercentile(x, 99.0)
    expect = (np.clip((x - vmin) / (vmax - vmin), 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(out, expect)


def test_pnorm_uint8_constant_image_guard():
    # vmax <= vmin + eps branch (viz_degradation.py:24-25): no div-by-zero
    out = pnorm_uint8(np.full((4, 4), 7.0))
    assert out.shape == (4, 4) and out.dtype == np.uint8


def test_rot90_display_is_np_rot90():
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    np.testing.assert_array_equal(rot90_display(img), np.rot90(img))


def test_compose_triptych_edge_pads_to_tallest():
    a = np.full((4, 3), 1, np.uint8)
    b = np.full((6, 2), 2, np.uint8)
    c = np.full((5, 4), 3, np.uint8)
    trip = compose_triptych([a, b, c])
    assert trip.shape == (6, 9)
    # edge padding repeats the last row, never zeros
    np.testing.assert_array_equal(trip[:, :3], np.full((6, 3), 1))
    np.testing.assert_array_equal(trip[4:, 5:], np.full((2, 4), 3))


@pytest.fixture(scope="module")
def rendered(spark):
    from etl_mri_scripts_spark.sources.volumes import synthetic_volumes

    vols = synthetic_volumes(spark, n_volumes=2, shape=(24, 24, 6))
    return render_triptychs(vols, axis="axial", seed=123).collect()


def test_render_triptychs_produces_decodable_pngs(rendered):
    assert len(rendered) == 2
    for r in rendered:
        assert r["slice_idx"] == 3  # middle of 6
        hr = decode_png(bytes(r["hr_png"]))
        lr3 = decode_png(bytes(r["lr3_png"]))
        lr15 = decode_png(bytes(r["lr15_png"]))
        trip = decode_png(bytes(r["triptych_png"]))
        assert hr.shape == (24, 24)
        # 3tFlash/1.5Flash presets downsample by 2 (keep_size=False)
        assert lr3.shape == lr15.shape == (12, 12)
        assert trip.shape == (r["height"], r["width"])
        assert trip.shape[1] == hr.shape[1] + lr3.shape[1] + lr15.shape[1]
        # left panel of the triptych IS the HR panel
        np.testing.assert_array_equal(trip[: hr.shape[0], : hr.shape[1]], hr)
        # HR panel content is not degenerate
        assert hr.max() == 255 and hr.min() == 0


def test_render_triptychs_deterministic_under_seed(spark):
    from etl_mri_scripts_spark.sources.volumes import synthetic_volumes

    vols = synthetic_volumes(spark, n_volumes=1, shape=(16, 16, 4))
    a = render_triptychs(vols, seed=7).collect()[0]
    b = render_triptychs(vols, seed=7).collect()[0]
    assert bytes(a["triptych_png"]) == bytes(b["triptych_png"])


def test_write_triptych_tree_reference_naming(spark, tmp_path, rendered):
    df = spark.createDataFrame(rendered)
    out = str(tmp_path / "viz")
    write_triptych_tree(df, out)
    files = sorted(f.rsplit("/", 1)[-1] for f in glob.glob(f"{out}/*.png"))
    assert len(files) == 8  # 2 volumes x 4 files
    assert "sub-000_T1w__axial__s003__HR.png" in files
    assert "sub-000_T1w__axial__s003__HR_3T_1p5T_triptych.png" in files
    assert "sub-001_T1w__axial__s003__1p5T.png" in files
    assert "sub-001_T1w__axial__s003__3T.png" in files
