"""SNR analytics fixtures (FIXTURES.md §8): synthetic bright-blob volume
with known background sigma; Otsu/mask sanity; moment corrections."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_mri_scripts_spark.operators.snr import (
    binary_dilate,
    binary_erode,
    brain_air_masks,
    compute_snr_volume,
    estimate_phase_sigma_from_repeats,
    otsu_threshold,
    sigma_from_background_std,
    snr_metrics,
)

TRUE_SIGMA = 5.0


def make_volume(seed=0, shape=(32, 32, 16), signal=1000.0):
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    brain = (xx**2 + yy**2 + zz**2) < 0.45
    vol = np.zeros(shape, dtype=np.float64)
    vol[brain] = signal
    # Rayleigh background: |complex gaussian|
    nr = rng.normal(0, TRUE_SIGMA, shape)
    ni = rng.normal(0, TRUE_SIGMA, shape)
    vol = np.sqrt((vol + nr) ** 2 + ni**2)
    return vol.astype(np.float32), brain


def test_otsu_separates_bimodal():
    vol, brain = make_volume()
    thr = otsu_threshold(vol)
    # Otsu's between-class variance plateaus in the empty region between the
    # two modes; nanargmax takes the first bin, so the threshold sits just
    # above the noise mode — anywhere separating noise (<=~25) from signal.
    assert 10 < thr < 950
    vol_fg = vol > thr
    assert 0.05 < vol_fg.mean() < 0.35


def test_morphology_basics():
    m = np.zeros((7, 7), dtype=bool)
    m[3, 3] = True
    d = binary_dilate(m, 1)
    assert d.sum() == 5  # plus-shaped neighborhood
    e = binary_erode(d, 1)
    assert e.sum() == 1 and e[3, 3]
    # erosion kills the border
    full = np.ones((5, 5), dtype=bool)
    assert binary_erode(full, 1).sum() == 9


def test_masks_cover_expected_regions():
    vol, brain_true = make_volume()
    brain, air, _thr = brain_air_masks(vol)
    # Otsu-based brain should mostly agree with the planted blob
    recall = (brain & brain_true).sum() / brain_true.sum()
    precision = (brain & brain_true).sum() / max(brain.sum(), 1)
    assert recall > 0.5  # erode(2) shrinks the blob; that's the semantics
    assert precision > 0.9
    assert not (brain & air).any()


def test_sigma_correction_rayleigh_formula_unbiased():
    # formula check on a FULL Rayleigh sample (no mask truncation):
    rng = np.random.default_rng(3)
    mag = np.sqrt(rng.normal(0, TRUE_SIGMA, 200_000) ** 2
                  + rng.normal(0, TRUE_SIGMA, 200_000) ** 2)
    est = sigma_from_background_std(float(mag.std(ddof=1)), "rayleigh")
    assert abs(est - TRUE_SIGMA) / TRUE_SIGMA < 0.02


def test_sigma_correction_on_volume_masks():
    # with the reference's p5 air mask the sample is truncated, so the
    # corrected sigma underestimates truth but stays positive and finite;
    # the Rayleigh correction INFLATES sigma (std/sqrt(2-pi/2)), so
    # corrected SNR is strictly below naive
    vol, _ = make_volume(seed=3)
    m = compute_snr_volume(vol, mode="rayleigh", n_coils=1)
    assert 0 < m["sigma_corrected"] <= TRUE_SIGMA * 1.2
    assert 0 < m["snr_corrected"] < m["snr_naive"]


def test_sigma_correction_formula_limits():
    # Rayleigh closed form: std = sigma*sqrt(2 - pi/2)
    s = sigma_from_background_std(1.0, "rayleigh")
    assert abs(s - 1.0 / math.sqrt(2 - math.pi / 2)) < 1e-9
    # gaussian passthrough
    assert sigma_from_background_std(2.5, "gaussian") == 2.5
    # chi with many coils: correction factor grows with k but stays finite
    assert 0 < sigma_from_background_std(1.0, "chi", 32) < 2.0


def test_phase_sigma_from_repeats():
    base, _ = make_volume(seed=1)
    reps = []
    rng = np.random.default_rng(42)
    for _ in range(4):
        reps.append(base + rng.normal(0, 2.0, base.shape).astype(np.float32))
    r = estimate_phase_sigma_from_repeats(reps)
    assert abs(r["sigma_global"] - 2.0) / 2.0 < 0.1
    assert r["sigma_map"].shape == base.shape
    with pytest.raises(ValueError):
        estimate_phase_sigma_from_repeats([base])


def test_snr_metrics_spark_surface(spark):
    from etl_mri_scripts_spark.sources.volumes import synthetic_volumes

    vols = synthetic_volumes(spark, 2, (24, 24, 8), seed=5)
    m = snr_metrics(vols, mode="chi", n_coils=8)
    rows = m.collect()
    assert len(rows) == 2
    for r in rows:
        assert r["snr_corrected"] > 0
        assert 0 < r["brain_frac"] < 1
        assert r["noise_mode"] == "chi"


def test_degenerate_volumes_no_nan():
    # zero/constant volumes (real at scan edges) must not produce NaN or
    # crash: zero-noise SNR is the inf sentinel, everything else finite
    import numpy as np

    from etl_mri_scripts_spark.operators.snr import compute_snr_volume

    for vol in (np.zeros((16, 16, 8), np.float32), np.full((16, 16, 8), 3.0, np.float32)):
        m = compute_snr_volume(vol, mode="chi", n_coils=8)
        assert m["snr_naive"] == float("inf") and m["snr_corrected"] == float("inf")
        for k in ("otsu_threshold", "brain_frac", "air_frac", "mean_signal", "std_air"):
            assert np.isfinite(m[k]), k


def test_degradation_degenerate_slices_finite():
    import numpy as np

    from etl_mri_scripts_spark.operators.degradation import degrade_slice_preset

    for img in (np.zeros((32, 32), np.float32), np.full((32, 32), 0.5, np.float32)):
        for preset in ("3tFlash", "3T_T1W"):
            r = degrade_slice_preset(img, preset, seed=1, fator_reducao=2)
            assert np.isfinite(r["hr"]).all() and np.isfinite(r["lr"]).all()


def test_phase_sigma_grouped_map_matches_local(spark):
    # applyInPandas grouped-map: repeats of each volume co-locate; the
    # distributed result must equal the plain-Python helper per volume.
    import numpy as np

    from etl_mri_scripts_spark.operators.snr import (
        estimate_phase_sigma_from_repeats,
        phase_sigma_by_volume,
    )
    from etl_mri_scripts_spark.sources.volumes import np_to_npy_bytes

    rng = np.random.default_rng(7)
    rows, local = [], {}
    for base in ["volA", "volB"]:
        truth = rng.random((12, 12, 6)).astype(np.float32) * 100
        vols = [truth + rng.normal(0, 2.5, truth.shape).astype(np.float32) for _ in range(4)]
        local[base] = estimate_phase_sigma_from_repeats(vols)["sigma_global"]
        rows += [(base, i, np_to_npy_bytes(v)) for i, v in enumerate(vols)]
    df = spark.createDataFrame(rows, "base string, repeat_i int, voxels binary")
    got = {r["base"]: (r["n_repeats"], r["sigma_global"]) for r in phase_sigma_by_volume(df).collect()}
    for base in local:
        assert got[base][0] == 4
        assert abs(got[base][1] - local[base]) < 1e-6
        # std across repeats should recover the injected noise scale
        assert 1.5 < got[base][1] < 3.5
