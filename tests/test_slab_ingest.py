"""Slab-wise volume ingest (round 6): volumes too large for a single Arrow
cell enter as bounded SLAB_SCHEMA rows and must produce BIT-IDENTICAL slice
and patch output vs the monolithic VOLUME_SCHEMA path.

Why slabs exist at all: Spark's python-runner stream buffer doubles its
direct buffer only until 1 GiB — past that `capacity << 1` overflows int and
growth degenerates to a full-buffer copy per chunk write (O(n^2) memcpy;
observed live as a 400+ s straggler serializing a (960,840,640) float32
volume). sources/volumes.py MAX_ARROW_CELL_BYTES documents the cliff.
"""

from __future__ import annotations

import numpy as np
import pytest

from etl_mri_scripts_spark.operators.pipeline import (
    PipelineConfig,
    explode_slab_slices,
    explode_slices,
    run_pipeline,
)
from etl_mri_scripts_spark.sources import volumes as V

SHAPE = (24, 20, 12)  # (sx, sy, sz): 12+12+20 = 44 slices across 3 orients
CFG = PipelineConfig(crop_hr=8, step_hr=8, scales=(2,), preset="3tFlash")


def _collect_slices(df):
    rows = df.collect()
    return {
        r["slice_id"]: (
            r["orient"], r["slice_i"], r["h"], r["w"],
            round(r["vmin"], 9), round(r["vmax"], 9), bytes(r["pixels"]),
        )
        for r in rows
    }


@pytest.fixture(scope="module")
def small_slab_bytes():
    # one z-slice of SHAPE is 24*20*4 = 1920 B; 4000 B -> 2 slices/slab,
    # forcing many slabs so boundary handling is actually exercised
    return 4000


def test_slab_rows_tile_and_bound(spark, small_slab_bytes):
    slabs = V.synthetic_volume_slabs(
        spark, 2, SHAPE, seed=3, max_slab_bytes=small_slab_bytes
    ).collect()
    sx, sy, sz = SHAPE
    by_vol_axis: dict = {}
    for r in slabs:
        by_vol_axis.setdefault((r["base"], r["slab_axis"]), []).append((r["lo"], r["hi"]))
        # payload bound holds whenever a single slice fits the budget
        assert len(r["voxels"]) <= small_slab_bytes + 128  # +npy header
    for (base, axis), ranges in by_vol_axis.items():
        ranges.sort()
        extent = sz if axis == "z" else sy
        assert ranges[0][0] == 0 and ranges[-1][1] == extent
        for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
            assert hi1 == lo2, f"gap/overlap in {axis} slabs of {base}"


def test_slab_explode_bit_identical_to_monolithic(spark, small_slab_bytes):
    mono = _collect_slices(
        explode_slices(V.synthetic_volumes(spark, 2, SHAPE, seed=3), CFG)
    )
    slab = _collect_slices(
        explode_slab_slices(
            V.synthetic_volume_slabs(
                spark, 2, SHAPE, seed=3,
                pmin=CFG.pmin, pmax=CFG.pmax, max_slab_bytes=small_slab_bytes,
            ),
            CFG,
        )
    )
    assert mono.keys() == slab.keys()
    for k in mono:
        assert mono[k] == slab[k], f"slice {k} differs between paths"


def test_run_pipeline_slab_patches_match_monolithic(spark, small_slab_bytes):
    mono = run_pipeline(spark, V.synthetic_volumes(spark, 1, SHAPE, seed=9), CFG)
    slab = run_pipeline(
        spark,
        None,
        CFG,
        slabs=V.synthetic_volume_slabs(
            spark, 1, SHAPE, seed=9,
            pmin=CFG.pmin, pmax=CFG.pmax, max_slab_bytes=small_slab_bytes,
        ),
    )
    m = {r["full_key"]: (r["key"], r["resolution"], r["split"], bytes(r["value"]))
         for r in mono.collect()}
    s = {r["full_key"]: (r["key"], r["resolution"], r["split"], bytes(r["value"]))
         for r in slab.collect()}
    assert m == s


def test_run_pipeline_unions_volumes_and_slabs(spark, small_slab_bytes):
    # 1 monolithic + 1 slab-ingested volume == 2 monolithic volumes
    both_mono = run_pipeline(spark, V.synthetic_volumes(spark, 2, SHAPE, seed=3), CFG)
    v0 = V.synthetic_volumes(spark, 2, SHAPE, seed=3).filter("base = 'sub-000_T1w'")
    s1 = V.synthetic_volume_slabs(
        spark, 2, SHAPE, seed=3,
        pmin=CFG.pmin, pmax=CFG.pmax, max_slab_bytes=small_slab_bytes,
    ).filter("base = 'sub-001_T1w'")
    mixed = run_pipeline(spark, v0, CFG, slabs=s1)
    assert sorted(r["full_key"] for r in both_mono.collect()) == sorted(
        r["full_key"] for r in mixed.collect()
    )


def test_oversize_cell_guard(monkeypatch):
    # unit-level: the guard runs inside executor workers, where a driver
    # monkeypatch can't reach — exercise the function directly
    monkeypatch.setattr(V, "MAX_ARROW_CELL_BYTES", 1000)
    assert V._check_cell_size(b"x" * 1000, "ok") == b"x" * 1000
    with pytest.raises(ValueError, match="slab-wise"):
        V._check_cell_size(b"x" * 1001, "too-big")


def test_slab_rows_refuse_oversize_single_slice(monkeypatch):
    # the step floors at 1 slice, and slab rows bypass _check_cell_size —
    # a giant in-plane shape must fail loudly, not silently re-enter the
    # Arrow transport cliff (r6 verdict demand #7)
    import numpy as np

    monkeypatch.setattr(V, "MAX_ARROW_CELL_BYTES", 4 * 40 * 40 - 1)
    vol = np.zeros((40, 40, 3), dtype=np.float32)  # z-slice = 6400 B > limit
    with pytest.raises(ValueError, match="even a 1-slice slab"):
        list(
            V.volume_to_slab_rows(
                vol, base="b", path="p", zooms=(1.0, 1.0, 1.0)
            )
        )
    # just under the limit is fine
    monkeypatch.setattr(V, "MAX_ARROW_CELL_BYTES", 4 * 40 * 40)
    rows = list(
        V.volume_to_slab_rows(vol, base="b", path="p", zooms=(1.0, 1.0, 1.0))
    )
    assert rows


def test_decode_nifti_slabs_by_path_matches_content(spark, tmp_path):
    # the LARGE-file path: path-only scan, bytes read inside the task —
    # must produce identical slab rows to the content-carrying scan
    from etl_mri_scripts_spark.sources.codecs import encode_nifti1

    vol = V._synth_vol(77, (10, 8, 6))
    (tmp_path / "anat").mkdir()
    (tmp_path / "anat" / "sub-x_T1w.nii").write_bytes(
        encode_nifti1(vol, zooms=(0.2, 0.2, 1.0))
    )
    by_path_scan = V.scan_nifti_paths(spark, str(tmp_path))
    assert by_path_scan.columns == ["path", "length"]  # content pruned out
    key = lambda r: (r["slab_axis"], r["lo"])
    by_path = sorted(
        V.decode_nifti_slabs(by_path_scan, max_slab_bytes=700).collect(), key=key
    )
    by_content = sorted(
        V.decode_nifti_slabs(
            V.scan_nifti(spark, str(tmp_path)), max_slab_bytes=700
        ).collect(),
        key=key,
    )
    assert len(by_path) > 2
    assert [r.asDict() for r in by_path] == [r.asDict() for r in by_content]


def test_ingest_nifti_auto_routes_by_length(spark, tmp_path):
    """Auto-routing (r6 verdict demand #4): with a synthetic threshold
    between two file sizes, one file takes the monolithic branch and one
    the slab branch, and the union is bit-identical to running EITHER
    single path over all files."""
    from etl_mri_scripts_spark.operators.pipeline import ingest_nifti
    from etl_mri_scripts_spark.sources.codecs import encode_nifti1

    (tmp_path / "anat").mkdir()
    small_vol = V._synth_vol(7, (8, 6, 4))
    big_vol = V._synth_vol(9, (16, 12, 8))
    small_b = encode_nifti1(small_vol, zooms=(1.0, 1.0, 1.0))
    big_b = encode_nifti1(big_vol, zooms=(1.0, 1.0, 1.0))
    (tmp_path / "anat" / "sub-a_T1w.nii").write_bytes(small_b)
    (tmp_path / "anat" / "sub-b_T1w.nii").write_bytes(big_b)
    assert len(small_b) < len(big_b)
    thr = (len(small_b) + len(big_b)) // 2

    cfg = CFG
    routed = ingest_nifti(
        spark, str(tmp_path), config=cfg, route_threshold_bytes=thr,
        max_slab_bytes=700,
    )
    # both branches actually taken: the routing predicate splits 1/1
    listing = V.scan_nifti_paths(spark, str(tmp_path))
    assert listing.filter(f"length <= {thr}").count() == 1
    assert listing.filter(f"length > {thr}").count() == 1
    # the monolithic branch's length filter reaches the binaryFile scan
    plan = routed._sc._jvm.PythonSQLUtils.explainString(
        routed._jdf.queryExecution(), "formatted"
    )
    assert f"LessThanOrEqual(length,{thr})" in plan  # mono branch scan
    assert f"GreaterThan(length,{thr})" in plan  # slab branch scan

    all_mono = explode_slices(V.decode_nifti(V.scan_nifti(spark, str(tmp_path))), cfg)
    all_slab = explode_slab_slices(
        V.decode_nifti_slabs(
            V.scan_nifti_paths(spark, str(tmp_path)), max_slab_bytes=700
        ),
        cfg,
    )
    got = _collect_slices(routed)
    assert got == _collect_slices(all_mono)
    assert got == _collect_slices(all_slab)


def test_local_path_uri_handling():
    assert V._local_path("file:/a/b.nii") == "/a/b.nii"
    assert V._local_path("file:///a/b.nii") == "/a/b.nii"
    assert V._local_path("/a/b.nii") == "/a/b.nii"
    with pytest.raises(NotImplementedError, match="local filesystem"):
        V._local_path("s3://bucket/b.nii")


def test_volume_to_slab_rows_values_roundtrip():
    # slab bytes reassemble to the exact source volume (both families)
    vol = V._synth_vol(123, SHAPE)
    rows = list(
        V.volume_to_slab_rows(
            vol, base="b", path="p", zooms=(1, 1, 1), max_slab_bytes=4000
        )
    )
    sx, sy, sz = SHAPE
    rebuilt_z = np.zeros(SHAPE, dtype=np.float32)
    rebuilt_y = np.zeros(SHAPE, dtype=np.float32)
    for r in rows:
        part = V.npy_bytes_to_np(r["voxels"])
        if r["slab_axis"] == "z":
            rebuilt_z[:, :, r["lo"]:r["hi"]] = part
        else:
            rebuilt_y[:, r["lo"]:r["hi"], :] = part
    np.testing.assert_array_equal(rebuilt_z, vol)
    np.testing.assert_array_equal(rebuilt_y, vol)
    # carried stats equal the whole-volume percentiles
    pcts = np.nanpercentile(vol, [1.0, 99.0])
    assert rows[0]["vmin"] == float(pcts[0]) and rows[0]["vmax"] == float(pcts[1])
