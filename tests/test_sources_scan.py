"""S1-S3 source scan semantics: recursive binaryFile lookup, glob suffix
filter, path-regex predicate, and the gated NIfTI decode (S4)."""

from __future__ import annotations

import os

import pytest


def _touch(path: str, payload: bytes = b"\x1f\x8b fake") -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(payload)


def test_scan_filters_by_glob_and_regex(spark, tmp_path):
    from etl_mri_scripts_spark.sources.volumes import scan_nifti

    root = str(tmp_path / "bids")
    # matches: nested under anat/, .nii.gz or .nii
    _touch(f"{root}/sub-01/anat/sub-01_T1w.nii.gz")
    _touch(f"{root}/sub-02/deep/anat/sub-02_T1w.nii")
    # non-matches: wrong dir (func/), wrong suffix (.json), nii not in anat
    _touch(f"{root}/sub-01/func/sub-01_bold.nii.gz")
    _touch(f"{root}/sub-01/anat/sub-01_T1w.json")

    got = {os.path.basename(r["path"]) for r in scan_nifti(spark, root).collect()}
    assert got == {"sub-01_T1w.nii.gz", "sub-02_T1w.nii"}


def test_scan_custom_regex(spark, tmp_path):
    from etl_mri_scripts_spark.sources.volumes import scan_nifti

    root = str(tmp_path / "flat")
    _touch(f"{root}/anat/a_T1w.nii.gz")
    _touch(f"{root}/anat/b_T2w.nii.gz")
    got = {
        os.path.basename(r["path"])
        for r in scan_nifti(spark, root, path_regex=r".*T1w\.nii(\.gz)?$").collect()
    }
    assert got == {"a_T1w.nii.gz"}


def test_decode_fails_loudly_on_invalid_nifti(spark, tmp_path):
    # The decode path is real (pure-numpy NIfTI-1 reader when nibabel is
    # absent): a non-NIfTI payload must fail the job loudly at execution,
    # never yield silent garbage rows.
    from etl_mri_scripts_spark.sources.volumes import decode_nifti, scan_nifti

    root = str(tmp_path / "bids")
    _touch(f"{root}/anat/sub_T1w.nii.gz")  # empty file: truncated payload
    with pytest.raises(Exception) as exc:
        decode_nifti(scan_nifti(spark, root)).collect()
    # the decode error (codec ValueError / gzip EOFError, depending on the
    # garbage) must propagate out of the Python worker and abort the job
    assert "Python worker" in str(exc.value) or "NIfTI" in str(exc.value)
