"""End-to-end CLI parity: each reference entry-point command runs against a
real .nii.gz tree (built with the engine's NIfTI codec) and produces the
reference's artifact shape."""

from __future__ import annotations

import glob

import numpy as np
import pytest

from etl_mri_scripts_spark.cli import main
from etl_mri_scripts_spark.sources.codecs import decode_png, encode_nifti1


@pytest.fixture(scope="module")
def bids_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("bids")
    rng = np.random.default_rng(31)
    for i in range(2):
        anat = root / f"sub-{i:02d}" / "anat"
        anat.mkdir(parents=True)
        vol = (rng.random((40, 40, 8)) * 800).astype(np.float32)
        (anat / f"sub-{i:02d}_T1w.nii.gz").write_bytes(
            encode_nifti1(vol, zooms=(0.2, 0.2, 1.0))
        )
    return str(root)


def test_cli_nii_to_lmdb_writes_partitioned_dataset(spark, bids_tree, tmp_path, capsys):
    out = str(tmp_path / "ds")
    rc = main([
        "nii-to-lmdb", "--input_dir", bids_tree, "--output_dir", out,
        "--crop_hr", "16", "--step_hr", "8", "--scales", "2",
    ])
    assert rc == 0
    # reference store layout: partitioned by (resolution, split)
    parts = glob.glob(f"{out}/resolution=*/split=*/*.parquet")
    assert parts, "no partitioned parquet written"
    back = spark.read.parquet(out)
    assert back.count() > 0
    assert {"key", "value", "meta_line"} <= set(back.columns)


def test_cli_viz_degradation_writes_triptychs(bids_tree, tmp_path):
    out = str(tmp_path / "viz")
    rc = main(["viz-degradation", "--nii_dir", bids_tree, "--out", out])
    assert rc == 0
    trips = glob.glob(f"{out}/*HR_3T_1p5T_triptych.png")
    assert len(trips) == 2
    img = decode_png(open(trips[0], "rb").read())
    # triptych is 3 panels wide: HR (40) + two LR (20) = 80 columns
    assert img.shape == (40, 80)


def test_cli_create_sample_writes_pngs(bids_tree, tmp_path):
    out = str(tmp_path / "samples")
    rc = main([
        "create-sample", "--input_dir", bids_tree, "--output_dir", out,
        "--num_slices", "4",
    ])
    assert rc == 0
    files = glob.glob(f"{out}/*.png")
    # 2 volumes x 4 middle axial slices
    assert len(files) == 8
    img = decode_png(open(files[0], "rb").read())
    assert img.dtype == np.uint8 and img.shape == (40, 40)


def test_cli_estimate_snr_prints_report(bids_tree, tmp_path, capsys):
    rc = main(["estimate-snr", "--input_dir", bids_tree])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(lines) == 2  # one JSON row per volume
    import json

    row = json.loads(lines[0])
    assert "base" in row and any("snr" in k.lower() for k in row)


def test_cli_show_images_writes_contact_sheets(bids_tree, tmp_path, capsys):
    out = str(tmp_path / "sheets")
    rc = main(["show-images", "--input_dir", bids_tree, "--output_dir", out,
               "--every_k", "2"])
    assert rc == 0
    pngs = glob.glob(f"{out}/**/*.png", recursive=True)
    # 2 volumes x 3 orientations = 6 contact sheets
    assert len(pngs) == 6, pngs
    img = decode_png(open(pngs[0], "rb").read())
    assert img.ndim == 2 and img.shape[0] >= 40  # grid of >= one slice


def test_cli_test_filter_writes_verdict_sheet(bids_tree, tmp_path, capsys):
    out = str(tmp_path / "verdicts")
    rc = main(["test-filter", "--input_dir", bids_tree, "--output_dir", out,
               "--crop", "20", "--step", "20"])
    assert rc == 0
    report = capsys.readouterr().out.strip().splitlines()[-1]
    import json as _json

    rep = _json.loads(report)
    pngs = glob.glob(f"{out}/**/*.png", recursive=True)
    assert rep["n_patches"] == len(pngs) > 0
    keeps = [p for p in pngs if "KEEP__" in p]
    discards = [p for p in pngs if "DISCARD__" in p]
    assert len(discards) == rep["n_dark"]
    assert len(keeps) == rep["n_patches"] - rep["n_dark"]
