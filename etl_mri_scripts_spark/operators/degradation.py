"""Physics-based MRI degradation operator (SURVEY.md §2.4, D1-D15).

Re-implements the reference's lower-field-scanner simulation as pure NumPy
kernels (reference behavior: transform_lower_tesla.py:334-509 /
v2/degradation_function_v2.py:330-455 — studied for semantics, written
fresh, NumPy-only since scipy is unavailable here):

slice -> k-space low-pass + physical downsample -> motion artifact ->
bias field -> multi-coil Chi (or single-coil Rician) noise at an SNR target
derived from field strength -> optional prescan-normalize + robust rescale.

In the engine these kernels run inside one Arrow pandas UDF
(spark_udfs.degrade_map_in_pandas); everything here is deterministic given
(array, params, seed) — the seed is a COLUMN derived from the record key
(xxhash64), never executor-local RNG, so Spark retries/speculation cannot
change results (SURVEY.md §4 determinism requirement).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from functools import lru_cache

import numpy as np

# --------------------------------------------------------------------------
# D1: separable 2D apodization window
# --------------------------------------------------------------------------


def window2d(shape: tuple[int, int], kind: str = "hamming") -> np.ndarray:
    """Outer product of 1D windows (ref: transform_lower_tesla.py:35-49)."""
    h, w = shape
    if kind == "none" or kind is None:
        return np.ones((h, w), dtype=np.float32)
    if kind == "hamming":
        wy, wx = np.hamming(h), np.hamming(w)
    elif kind == "hann":
        wy, wx = np.hanning(h), np.hanning(w)
    else:
        raise ValueError(f"unknown window kind: {kind}")
    return np.outer(wy, wx).astype(np.float32)


# --------------------------------------------------------------------------
# D2: k-space low-pass + physical downsample
# --------------------------------------------------------------------------


def kspace_lowpass(
    img: np.ndarray,
    crop_factors: tuple[float, float] = (0.5, 0.5),
    window_kind: str = "hamming",
    keep_size: bool = False,
) -> np.ndarray:
    """Truncate the outer k-space (ref: transform_lower_tesla.py:51-89).

    fft2(ortho) -> fftshift -> central crop to int(H*fy) x int(W*fx) ->
    apodize -> either zero-fill back to full size (keep_size, v1 option) or
    inverse transform on the small grid (physical downsample). The output is
    rescaled by sqrt(fy*fx) so mean brightness is preserved across grid
    sizes (DC term bookkeeping under ortho normalization).
    """
    if img.ndim != 2:
        raise ValueError("kspace_lowpass expects a 2D slice")
    h, w = img.shape
    fy, fx = crop_factors
    nh, nw = max(int(h * fy), 1), max(int(w * fx), 1)
    k = np.fft.fftshift(np.fft.fft2(img.astype(np.float32), norm="ortho"))
    y0, x0 = (h - nh) // 2, (w - nw) // 2
    kc = k[y0 : y0 + nh, x0 : x0 + nw] * window2d((nh, nw), window_kind)
    if keep_size:
        kf = np.zeros_like(k)
        kf[y0 : y0 + nh, x0 : x0 + nw] = kc
        out = np.abs(np.fft.ifft2(np.fft.ifftshift(kf), norm="ortho"))
    else:
        out = np.abs(np.fft.ifft2(np.fft.ifftshift(kc), norm="ortho"))
        out *= math.sqrt((nh * nw) / (h * w))
    return out.astype(np.float32)


# --------------------------------------------------------------------------
# D3: sub-pixel Fourier shift
# --------------------------------------------------------------------------


def fourier_shift_subpixel(img: np.ndarray, shift: tuple[float, float]) -> np.ndarray:
    """Translate by (dy, dx) via a k-space phase ramp
    (ref: transform_lower_tesla.py:95-108)."""
    dy, dx = shift
    h, w = img.shape
    ky = np.fft.fftfreq(h)[:, None]
    kx = np.fft.fftfreq(w)[None, :]
    k = np.fft.fft2(img)
    ramp = np.exp(-2j * np.pi * (ky * dy + kx * dx))
    return np.abs(np.fft.ifft2(k * ramp)).astype(np.float32)


# --------------------------------------------------------------------------
# D4: motion artifact
# --------------------------------------------------------------------------


def apply_motion(
    img: np.ndarray,
    max_shift: float = 0.5,
    line_jitter: float = 0.02,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """One rigid sub-pixel shift + per-k-space-line Gaussian phase jitter
    (ref: transform_lower_tesla.py:110-141)."""
    rng = rng or np.random.default_rng(0)
    dy, dx = rng.uniform(-max_shift, max_shift, size=2)
    moved = fourier_shift_subpixel(img, (float(dy), float(dx)))
    k = np.fft.fftshift(np.fft.fft2(moved))
    phases = rng.normal(0.0, line_jitter, size=img.shape[0])
    k = k * np.exp(1j * phases)[:, None]
    return np.abs(np.fft.ifft2(np.fft.ifftshift(k))).astype(np.float32)


# --------------------------------------------------------------------------
# D5: multiplicative bias field (NumPy-only separable Gaussian blur)
# --------------------------------------------------------------------------


def _gaussian_blur2d(x: np.ndarray, sigma: float) -> np.ndarray:
    """Separable Gaussian with reflect padding; replaces
    scipy.ndimage.gaussian_filter (unavailable in this environment)."""
    if sigma <= 0:
        return x.astype(np.float32)
    r = max(int(3.0 * sigma), 1)
    t = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (t / sigma) ** 2)
    k /= k.sum()

    def conv_axis(a: np.ndarray, axis: int) -> np.ndarray:
        a = np.moveaxis(a, axis, 0)
        pad = np.pad(a, ((r, r),) + ((0, 0),) * (a.ndim - 1), mode="reflect")
        # vectorized: each output element is the same k-length dot product
        # the per-row loop produced (bit-identical), via a strided view
        win = np.lib.stride_tricks.sliding_window_view(pad, 2 * r + 1, axis=0)
        return np.moveaxis(win @ k, 0, axis)

    return conv_axis(conv_axis(x.astype(np.float64), 0), 1).astype(np.float32)


def apply_bias_field(
    img: np.ndarray,
    strength: float = 0.2,
    scale_rel: float = 0.12,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Smooth multiplicative receive-coil shading: blurred white noise
    normalized to [1-s/2, 1+s/2] (ref: transform_lower_tesla.py:143-166)."""
    rng = rng or np.random.default_rng(0)
    h, w = img.shape
    sigma = max(4.0, min(h, w) * scale_rel)
    noise = rng.standard_normal((h, w))
    fld = _gaussian_blur2d(noise, sigma)
    lo, hi = fld.min(), fld.max()
    fld = (fld - lo) / (hi - lo + 1e-12)
    fld = (1.0 - strength / 2.0) + strength * fld
    return (img * fld).astype(np.float32)


# --------------------------------------------------------------------------
# D6: synthetic coil sensitivity maps
# --------------------------------------------------------------------------


@lru_cache(maxsize=16)
def _coil_maps_cached(
    shape: tuple[int, int], n_coils: int, sigma_rel: float, ring_radius: float
) -> np.ndarray:
    h, w = shape
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij")
    maps = np.empty((n_coils, h, w), dtype=np.float32)
    s2 = 2.0 * (sigma_rel**2)
    for c in range(n_coils):
        ang = 2.0 * np.pi * c / n_coils
        cy, cx = ring_radius * np.sin(ang), ring_radius * np.cos(ang)
        maps[c] = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / s2)
    rss = np.sqrt((maps**2).sum(axis=0))
    maps /= max(float(rss.mean()), 1e-12)
    maps.flags.writeable = False  # shared across slices; callers must copy to mutate
    return maps


def synth_coil_sensitivities(
    shape: tuple[int, int], n_coils: int = 8, sigma_rel: float = 0.45, ring_radius: float = 1.12
) -> np.ndarray:
    """Nc Gaussian lobes centered on a circle just outside the FOV,
    RSS-normalized to mean 1 (ref: transform_lower_tesla.py:172-199,
    v2 ring radius 1.12). Deterministic per (shape, Nc, sigma, radius), so
    the map is computed once per slice GEOMETRY and shared read-only across
    every slice of a volume (the reference recomputes it per call;
    per-slice cost here was ~10% of the kernel)."""
    return _coil_maps_cached(
        (int(shape[0]), int(shape[1])), int(n_coils), float(sigma_rel), float(ring_radius)
    )


# --------------------------------------------------------------------------
# D7: SNR target from field strength
# --------------------------------------------------------------------------

SNR_7T_EMPIRICAL = 153.03  # chi, Nc=32, FLASH TR=40ms TE=14.2ms FA=20 deg
# (anchor measured by the reference's estimate_snr analytics,
#  v2/degradation_function_v2.py:17-22)


def snr_target_from_field(
    b0: float,
    snr_7t: float = SNR_7T_EMPIRICAL,
    alpha: float = 1.0,
    voxel_factor: float = 1.0,
    quadratic_voxel: bool = True,
) -> float:
    """SNR_target = SNR_7T * (B0/7)^alpha * f or f^2 — v1 scales linearly
    with the downsample factor, v2 quadratically (2D voxel area)
    (ref: v2/degradation_function_v2.py:186-198, 407-413)."""
    vf = voxel_factor**2 if quadratic_voxel else voxel_factor
    return snr_7t * (b0 / 7.0) ** alpha * vf


# --------------------------------------------------------------------------
# D8/D9: noise models
# --------------------------------------------------------------------------


def add_rician_noise(
    img: np.ndarray, snr: float, rng: np.random.Generator | None = None
) -> np.ndarray:
    """Single-coil magnitude noise: sqrt((img+n_r)^2 + n_i^2),
    sigma = mean/SNR (ref: transform_lower_tesla.py:237-246)."""
    rng = rng or np.random.default_rng(0)
    sigma = np.float32(float(img.mean()) / max(snr, 1e-9))
    # float32 generation + arithmetic end to end: statistically identical,
    # ~2x faster draw and half the memory traffic (RNG was ~46% of the
    # whole kernel in float64)
    nr = rng.standard_normal(img.shape, dtype=np.float32) * sigma
    ni = rng.standard_normal(img.shape, dtype=np.float32) * sigma
    img32 = img.astype(np.float32, copy=False)
    return np.sqrt((img32 + nr) ** 2 + ni**2).astype(np.float32)


def add_chi_noise_multicoil(
    img: np.ndarray,
    snr: float,
    coil_maps: np.ndarray,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Multi-coil acquisition: per-coil complex Gaussian noise then
    root-sum-of-squares combine; sigma = mean/(SNR*sqrt(Nc))
    (ref: transform_lower_tesla.py:248-268)."""
    rng = rng or np.random.default_rng(0)
    n_coils = coil_maps.shape[0]
    if coil_maps.shape[1:] != img.shape:
        raise ValueError("coil map shape mismatch")
    sigma = np.float32(float(img.mean()) / (max(snr, 1e-9) * math.sqrt(n_coils)))
    # all-float32 path over the (Nc, H, W) stack: the two Gaussian draws
    # dominated the whole degradation kernel in float64 (~46%); float32
    # generation is ~2x faster and the squared-sum combine halves its
    # memory traffic. Distribution and determinism are unchanged.
    sig = img[None, :, :].astype(np.float32, copy=False) * coil_maps
    nr = rng.standard_normal(sig.shape, dtype=np.float32) * sigma
    ni = rng.standard_normal(sig.shape, dtype=np.float32) * sigma
    rss = np.sqrt(((sig + nr) ** 2 + ni**2).sum(axis=0))
    return rss.astype(np.float32)


# --------------------------------------------------------------------------
# D10: prescan normalize (v2)
# --------------------------------------------------------------------------


def prescan_normalize(
    rss_img: np.ndarray, coil_maps: np.ndarray, beta: float = 1.0, blur_sigma: float = 8.0
) -> np.ndarray:
    """Flatten the receive profile: divide by the blurred RSS coil envelope
    raised to beta (ref: v2/degradation_function_v2.py:28-41)."""
    envelope = np.sqrt((coil_maps**2).sum(axis=0))
    envelope = _gaussian_blur2d(envelope, blur_sigma) ** beta
    return (rss_img / (envelope + 1e-6)).astype(np.float32)


# --------------------------------------------------------------------------
# D11: robust two-step rescale (v2)
# --------------------------------------------------------------------------


def robust_rescale(
    out: np.ndarray, ref: np.ndarray
) -> np.ndarray:
    """Re-anchor intensities to the reference: median gain (clip 0.85-1.15)
    then p98 highlight gain (clip 0.85-1.10), both over the ref>p60
    foreground mask (ref: v2/degradation_function_v2.py:266-283)."""
    mask = ref > np.percentile(ref, 60)
    if not mask.any():
        return out
    med_ref = float(np.median(ref[mask]))
    med_out = float(np.median(out[mask]))
    g1 = np.clip(med_ref / max(med_out, 1e-9), 0.85, 1.15)
    out = out * g1
    p98_ref = float(np.percentile(ref[mask], 98))
    p98_out = float(np.percentile(out[mask], 98))
    g2 = np.clip(p98_ref / max(p98_out, 1e-9), 0.85, 1.10)
    return (out * g2).astype(np.float32)


# --------------------------------------------------------------------------
# D12/D13: SPGR signal synthesis + relaxation-time field scaling
# --------------------------------------------------------------------------


def spgr_signal(
    pd_map: np.ndarray,
    t1_ms: float,
    t2s_ms: float,
    tr_ms: float = 40.0,
    te_ms: float = 14.2,
    flip_deg: float = 20.0,
    b1_scale: float = 1.0,
) -> np.ndarray:
    """SPGR/FLASH steady-state: S = PD*sin(a)*(1-E1)/(1-E1*cos(a))*exp(-TE/T2*)
    with E1 = exp(-TR/T1), a = B1-scaled flip angle
    (ref: transform_lower_tesla.py:277-305)."""
    a = math.radians(flip_deg * b1_scale)
    e1 = math.exp(-tr_ms / max(t1_ms, 1e-9))
    factor = math.sin(a) * (1.0 - e1) / (1.0 - e1 * math.cos(a)) * math.exp(
        -te_ms / max(t2s_ms, 1e-9)
    )
    return (pd_map * factor).astype(np.float32)


_T_SCALE_POINTS = ((1.5, 0.70, 1.80), (3.0, 0.80, 1.40), (7.0, 1.00, 1.00))


def scale_relaxation_for_field(t1_7t_ms: float, t2s_7t_ms: float, b0: float) -> tuple[float, float]:
    """7T relaxation times rescaled to the target field: anchored factors at
    1.5T/3T/7T, linear interpolation between
    (ref: transform_lower_tesla.py:307-328)."""
    pts = _T_SCALE_POINTS
    b0 = min(max(b0, pts[0][0]), pts[-1][0])
    for (b_lo, f1_lo, f2_lo), (b_hi, f1_hi, f2_hi) in zip(pts, pts[1:]):
        if b_lo <= b0 <= b_hi:
            t = (b0 - b_lo) / (b_hi - b_lo) if b_hi > b_lo else 0.0
            f1 = f1_lo + t * (f1_hi - f1_lo)
            f2 = f2_lo + t * (f2_hi - f2_lo)
            return t1_7t_ms * f1, t2s_7t_ms * f2
    return t1_7t_ms, t2s_7t_ms


# --------------------------------------------------------------------------
# D14/D15: orchestrator + presets
# --------------------------------------------------------------------------


def parse_field_target(field: str | float) -> float:
    """'3T'/'1,5T'/'7t' -> tesla float, fallback 3.0
    (ref: transform_lower_tesla.py:390-395)."""
    if isinstance(field, (int, float)):
        return float(field)
    try:
        return float(str(field).lower().replace("t", "").replace(",", "."))
    except ValueError:
        return 3.0


@dataclass(frozen=True)
class DegradationParams:
    field_target: str | float = "3T"
    fator_reducao: int = 2
    window_kind: str = "hamming"
    keep_size: bool = False
    motion_max_shift: float = 0.4
    motion_line_jitter: float = 0.015
    bias_strength: float = 0.2
    bias_scale_rel: float = 0.12
    n_coils: int = 32
    coil_sigma_rel: float = 0.45
    noise_model: str = "chi"  # chi | rician | none
    snr_7t: float = SNR_7T_EMPIRICAL
    snr_alpha: float = 1.0
    quadratic_voxel: bool = True
    prescan_norm: bool = True
    prescan_beta: float = 1.0
    robust_rescale: bool = True
    use_spgr: bool = False
    t1_7t_ms: float = 2100.0
    t2s_7t_ms: float = 27.0
    tr_ms: float = 40.0
    te_ms: float = 14.2
    flip_deg: float = 20.0
    extra: dict = field(default_factory=dict)


PRESETS_BRAIN: dict[str, DegradationParams] = {
    # v2-style empirical-SNR FLASH presets (v2/degradation_function_v2.py:461-497)
    "3tFlash": DegradationParams(field_target="3T", noise_model="chi", n_coils=32),
    "1.5Flash": DegradationParams(field_target="1.5T", noise_model="chi", n_coils=32),
    # v1-style presets (transform_lower_tesla.py:515-581): linear voxel-SNR,
    # single-coil Rician, no prescan/rescale
    "3T_T1W": DegradationParams(
        field_target="3T", noise_model="rician", quadratic_voxel=False,
        prescan_norm=False, robust_rescale=False, snr_7t=40.0,
    ),
    "15T_T1W": DegradationParams(
        field_target="1.5T", noise_model="rician", quadratic_voxel=False,
        prescan_norm=False, robust_rescale=False, snr_7t=40.0,
    ),
    "3T_T2STAR": DegradationParams(
        field_target="3T", noise_model="rician", quadratic_voxel=False,
        prescan_norm=False, robust_rescale=False, snr_7t=40.0, use_spgr=True,
    ),
    "3T_fMRI": DegradationParams(
        field_target="3T", noise_model="rician", quadratic_voxel=False,
        prescan_norm=False, robust_rescale=False, snr_7t=35.0,
        motion_max_shift=0.8, motion_line_jitter=0.03,
    ),
}


def degrade_slice(
    img: np.ndarray, params: DegradationParams = DegradationParams(), seed: int = 0
) -> dict:
    """The flagship operator: 2D HR slice -> {'hr', 'lr', 'meta'}
    (ref orchestrators: transform_lower_tesla.py:334-509,
    v2/degradation_function_v2.py:330-455).

    Deterministic in (img, params, seed). Validates 2D input and
    fator_reducao in {2,3,4} exactly like the reference.
    """
    img = np.asarray(img, dtype=np.float32)
    if img.ndim != 2:
        raise ValueError("degrade_slice expects a 2D image")
    f = int(params.fator_reducao)
    if f not in (2, 3, 4):
        raise ValueError("fator_reducao must be one of {2, 3, 4}")
    rng = np.random.default_rng(seed & 0x7FFFFFFF)
    b0 = parse_field_target(params.field_target)

    hr = img
    work = hr
    if params.use_spgr:
        t1, t2s = scale_relaxation_for_field(params.t1_7t_ms, params.t2s_7t_ms, b0)
        work = spgr_signal(work, t1, t2s, params.tr_ms, params.te_ms, params.flip_deg)

    lr = kspace_lowpass(work, (1.0 / f, 1.0 / f), params.window_kind, params.keep_size)
    clean_lr = lr  # the robust-rescale reference below is THIS array
    lr = apply_motion(lr, params.motion_max_shift, params.motion_line_jitter, rng)
    lr = apply_bias_field(lr, params.bias_strength, params.bias_scale_rel, rng)

    snr = snr_target_from_field(
        b0, params.snr_7t, params.snr_alpha, float(f), params.quadratic_voxel
    )
    coil_maps = None
    if params.noise_model == "chi":
        coil_maps = synth_coil_sensitivities(lr.shape, params.n_coils, params.coil_sigma_rel)
        lr = add_chi_noise_multicoil(lr, snr, coil_maps, rng)
        if params.prescan_norm:
            lr = prescan_normalize(lr, coil_maps, params.prescan_beta)
    elif params.noise_model == "rician":
        lr = add_rician_noise(lr, snr, rng)
    elif params.noise_model != "none":
        raise ValueError(f"unknown noise model {params.noise_model}")

    if params.robust_rescale:
        # reuse the pre-motion/bias/noise low-pass computed above — a
        # second identical kspace_lowpass call doubled the FFT cost of
        # every slice on the default presets (r5 review). Safe because
        # apply_motion/bias/noise all return new arrays (clean_lr is
        # never mutated) — asserted by
        # tests/test_degradation.py::test_degradation_kernels_do_not_mutate_input.
        lr = robust_rescale(lr, clean_lr)

    meta = {
        "field_target_tesla": f"{b0:g}",
        "fator_reducao": str(f),
        "snr_target": f"{snr:.4f}",
        "noise_model": params.noise_model,
        "n_coils": str(params.n_coils if params.noise_model == "chi" else 1),
        "window": params.window_kind,
        "seed": str(seed & 0x7FFFFFFF),
        "hr_shape": f"{hr.shape[0]}x{hr.shape[1]}",
        "lr_shape": f"{lr.shape[0]}x{lr.shape[1]}",
    }
    return {"hr": hr, "lr": lr.astype(np.float32), "meta": meta}



def degrade_slice_preset(
    img: np.ndarray, preset: str = "3tFlash", seed: int = 0, **overrides
) -> dict:
    """Preset wrapper (ref: funcao_degradacao_brain
    transform_lower_tesla.py:583-608 / lower_field_degradation
    v2/degradation_function_v2.py:499-519)."""
    if preset not in PRESETS_BRAIN:
        raise KeyError(f"unknown preset {preset}; have {sorted(PRESETS_BRAIN)}")
    params = PRESETS_BRAIN[preset]
    if overrides:
        params = replace(params, **overrides)
    return degrade_slice(img, params, seed)
