"""Golden/invariant tests for the degradation kernels (FIXTURES.md §7):
determinism, shape arithmetic, physics sanity, validation errors."""

from __future__ import annotations

import numpy as np
import pytest

from etl_mri_scripts_spark.operators.degradation import (
    DegradationParams,
    PRESETS_BRAIN,
    add_chi_noise_multicoil,
    add_rician_noise,
    apply_bias_field,
    apply_motion,
    degrade_slice,
    degrade_slice_preset,
    fourier_shift_subpixel,
    kspace_lowpass,
    parse_field_target,
    prescan_normalize,
    robust_rescale,
    scale_relaxation_for_field,
    snr_target_from_field,
    spgr_signal,
    synth_coil_sensitivities,
    window2d,
)


@pytest.fixture()
def img():
    rng = np.random.default_rng(123)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 64), np.linspace(-1, 1, 64), indexing="ij")
    blob = np.clip(1 - (xx**2 + yy**2) / 0.5, 0, None)
    return (blob * (0.8 + 0.1 * rng.standard_normal((64, 64)))).astype(np.float32)


def test_window2d_shapes_and_kinds():
    w = window2d((8, 12), "hamming")
    assert w.shape == (8, 12)
    assert window2d((8, 12), "none").min() == 1.0
    assert 0 < window2d((8, 12), "hann").max() <= 1.0
    with pytest.raises(ValueError):
        window2d((4, 4), "blackman")


def test_kspace_lowpass_physical_downsample(img):
    out = kspace_lowpass(img, (0.5, 0.5))
    assert out.shape == (32, 32)
    # mean brightness preserved to a few percent (windowing losses aside)
    assert abs(float(out.mean()) - float(img.mean())) / float(img.mean()) < 0.25
    # high-frequency energy reduced: variance of Laplacian proxy drops
    assert float(np.abs(np.diff(out, axis=0)).mean()) <= float(np.abs(np.diff(img, axis=0)).mean()) * 1.5


def test_kspace_lowpass_keep_size(img):
    out = kspace_lowpass(img, (0.5, 0.5), keep_size=True)
    assert out.shape == img.shape


def test_kspace_lowpass_factors(img):
    for f in (2, 3, 4):
        out = kspace_lowpass(img, (1.0 / f, 1.0 / f))
        assert out.shape == (64 // f, 64 // f)


def test_fourier_shift_translates(img):
    out = fourier_shift_subpixel(img, (0.0, 0.0))
    np.testing.assert_allclose(out, np.abs(img), rtol=1e-5, atol=1e-5)
    shifted = fourier_shift_subpixel(img, (3.0, 0.0))
    # integer shift ~ roll (up to wraparound edges)
    np.testing.assert_allclose(shifted[8:-8, 8:-8], np.roll(img, 3, axis=0)[8:-8, 8:-8], atol=1e-4)


def test_motion_deterministic(img):
    a = apply_motion(img, rng=np.random.default_rng(5))
    b = apply_motion(img, rng=np.random.default_rng(5))
    np.testing.assert_array_equal(a, b)
    c = apply_motion(img, rng=np.random.default_rng(6))
    assert not np.array_equal(a, c)


def test_bias_field_range(img):
    strength = 0.3
    out = apply_bias_field(np.ones_like(img), strength=strength, rng=np.random.default_rng(2))
    assert out.min() >= 1 - strength / 2 - 1e-5
    assert out.max() <= 1 + strength / 2 + 1e-5


def test_coil_maps_rss_mean_one():
    maps = synth_coil_sensitivities((32, 32), n_coils=8)
    assert maps.shape == (8, 32, 32)
    rss = np.sqrt((maps**2).sum(axis=0))
    assert abs(float(rss.mean()) - 1.0) < 1e-5


def test_snr_target_scaling():
    # quadratic voxel factor (v2) vs linear (v1)
    s3 = snr_target_from_field(3.0, snr_7t=153.03, voxel_factor=2.0, quadratic_voxel=True)
    assert abs(s3 - 153.03 * (3 / 7) * 4) < 1e-6
    s3l = snr_target_from_field(3.0, snr_7t=40.0, voxel_factor=2.0, quadratic_voxel=False)
    assert abs(s3l - 40.0 * (3 / 7) * 2) < 1e-6


def test_noise_models_deterministic_and_noisy(img):
    r1 = add_rician_noise(img, 30.0, np.random.default_rng(1))
    r2 = add_rician_noise(img, 30.0, np.random.default_rng(1))
    np.testing.assert_array_equal(r1, r2)
    assert float(np.abs(r1 - img).mean()) > 0
    maps = synth_coil_sensitivities(img.shape, 8)
    c1 = add_chi_noise_multicoil(img, 30.0, maps, np.random.default_rng(1))
    assert c1.shape == img.shape and c1.min() >= 0
    with pytest.raises(ValueError):
        add_chi_noise_multicoil(img, 30.0, synth_coil_sensitivities((16, 16), 4))


def test_lower_snr_means_more_noise(img):
    lo = add_rician_noise(img, 5.0, np.random.default_rng(3))
    hi = add_rician_noise(img, 500.0, np.random.default_rng(3))
    assert float(np.abs(lo - img).mean()) > float(np.abs(hi - img).mean())


def test_prescan_flattens_profile(img):
    maps = synth_coil_sensitivities(img.shape, 8)
    rss_img = img * np.sqrt((maps**2).sum(axis=0))
    flat = prescan_normalize(rss_img, maps)
    # profile-corrected image closer to original than the shaded one
    assert np.abs(flat - img).mean() < np.abs(rss_img - img).mean() * 1.2


def test_robust_rescale_recovers_gain(img):
    ref = img + 0.1
    out = robust_rescale(ref * 0.9, ref)
    med_mask = ref > np.percentile(ref, 60)
    assert abs(float(np.median(out[med_mask]) / np.median(ref[med_mask])) - 1.0) < 0.05


def test_spgr_and_relaxation_scaling(img):
    t1_3t, t2s_3t = scale_relaxation_for_field(2100.0, 27.0, 3.0)
    assert abs(t1_3t - 2100 * 0.8) < 1e-6 and abs(t2s_3t - 27 * 1.4) < 1e-6
    t1_15, t2s_15 = scale_relaxation_for_field(2100.0, 27.0, 1.5)
    assert abs(t1_15 - 2100 * 0.7) < 1e-6 and abs(t2s_15 - 27 * 1.8) < 1e-6
    # interpolated point between 3T and 7T
    t1_5, _ = scale_relaxation_for_field(2100.0, 27.0, 5.0)
    assert 2100 * 0.8 < t1_5 < 2100 * 1.0
    sig = spgr_signal(img, t1_3t, t2s_3t)
    assert sig.shape == img.shape and float(sig.max()) < float(img.max())


def test_parse_field_target():
    assert parse_field_target("3T") == 3.0
    assert parse_field_target("1,5T") == 1.5
    assert parse_field_target("7t") == 7.0
    assert parse_field_target("bogus") == 3.0
    assert parse_field_target(1.5) == 1.5


@pytest.mark.parametrize("preset", sorted(PRESETS_BRAIN))
def test_presets_run_and_shapes(img, preset):
    res = degrade_slice_preset(img, preset, seed=123)
    assert res["hr"].shape == (64, 64)
    assert res["lr"].shape == (32, 32)  # default factor 2
    assert res["lr"].dtype == np.float32
    assert res["meta"]["fator_reducao"] == "2"


def test_degrade_determinism_and_seed_sensitivity(img):
    a = degrade_slice_preset(img, "3tFlash", seed=123)
    b = degrade_slice_preset(img, "3tFlash", seed=123)
    np.testing.assert_array_equal(a["lr"], b["lr"])
    c = degrade_slice_preset(img, "3tFlash", seed=124)
    assert not np.array_equal(a["lr"], c["lr"])


def test_degrade_validation(img):
    with pytest.raises(ValueError):
        degrade_slice(np.zeros((4, 4, 4), dtype=np.float32))
    with pytest.raises(ValueError):
        degrade_slice(img, DegradationParams(fator_reducao=5))
    with pytest.raises(KeyError):
        degrade_slice_preset(img, "nope")


def test_degrade_factor_shapes(img):
    for f in (2, 3, 4):
        res = degrade_slice(img, DegradationParams(fator_reducao=f, noise_model="none",
                                                   robust_rescale=False, prescan_norm=False))
        assert res["lr"].shape == (64 // f, 64 // f)


def test_meta_contents(img):
    res = degrade_slice_preset(img, "1.5Flash", seed=9)
    m = res["meta"]
    assert m["field_target_tesla"] == "1.5"
    assert m["noise_model"] == "chi"
    assert m["n_coils"] == "32"
    assert m["hr_shape"] == "64x64" and m["lr_shape"] == "32x32"


def test_degradation_kernels_do_not_mutate_input():
    """degrade_slice reuses the clean low-pass (clean_lr) as the
    robust-rescale reference AFTER motion/bias/noise have been applied to
    the same array object — valid only while every kernel returns a fresh
    array. Pin that invariant so a future in-place optimization of any
    kernel fails here instead of silently corrupting the reference."""
    import numpy as np

    from etl_mri_scripts_spark.operators.degradation import (
        add_chi_noise_multicoil,
        add_rician_noise,
        apply_bias_field,
        apply_motion,
        prescan_normalize,
        synth_coil_sensitivities,
    )

    rng = np.random.default_rng(7)
    img = rng.random((32, 28), dtype=np.float32)
    snapshot = img.copy()
    maps = synth_coil_sensitivities(img.shape, 4, 0.35)

    apply_motion(img, 0.5, 0.02, np.random.default_rng(1))
    apply_bias_field(img, 0.2, 0.12, np.random.default_rng(2))
    add_rician_noise(img, 20.0, np.random.default_rng(3))
    add_chi_noise_multicoil(img, 20.0, maps, np.random.default_rng(4))
    prescan_normalize(img, maps)
    np.testing.assert_array_equal(img, snapshot)
