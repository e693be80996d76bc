"""SNR analytics (SURVEY.md §2 A5-A7, F6-F7; ref v2/estimate_snr.py —
semantics studied, implementation fresh and NumPy-only).

Per-volume metrics (Otsu foreground, brain/air masks, naive + moment-
corrected SNR for Rician/Chi magnitude statistics) exposed as a grouped-map
over the volumes DataFrame: one metrics row per volume, computed where the
voxels already live — the UDAF-shaped analytics surface of §2.13.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..sources.volumes import npy_bytes_to_np

SNR_METRICS_SCHEMA = (
    "base string, otsu_threshold double, brain_frac double, air_frac double, "
    "mean_signal double, std_air double, sigma_corrected double, "
    "snr_naive double, snr_corrected double, n_coils int, noise_mode string"
)


# --- F6: Otsu threshold ----------------------------------------------------


def otsu_threshold(
    x: np.ndarray, bins: int = 256, clip_percentiles: tuple[float, float] = (1.0, 99.0)
) -> float:
    """Histogram inter-class-variance argmax (ref: v2/estimate_snr.py:23-42).
    Intensities are clipped to robust percentiles before binning."""
    v = x[np.isfinite(x)].ravel()
    if v.size == 0:
        return 0.0
    lo, hi = np.percentile(v, clip_percentiles)
    if hi <= lo:
        return float(lo)
    v = np.clip(v, lo, hi)
    hist, edges = np.histogram(v, bins=bins)
    p = hist.astype(np.float64) / max(hist.sum(), 1)
    centers = (edges[:-1] + edges[1:]) / 2.0
    w0 = np.cumsum(p)
    w1 = 1.0 - w0
    mu = np.cumsum(p * centers)
    mu_t = mu[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b2 = (mu_t * w0 - mu) ** 2 / (w0 * w1)
    k = int(np.nanargmax(sigma_b2))
    return float(centers[k])


# --- F7: morphological masks (NumPy-only 3x3 dilate/erode) ----------------


def _shifted(mask: np.ndarray, axis: int, d: int, border: bool) -> np.ndarray:
    shifted = np.roll(mask, d, axis=axis)
    sl = [slice(None)] * mask.ndim
    sl[axis] = 0 if d == 1 else -1
    shifted[tuple(sl)] = border
    return shifted


def binary_dilate(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    """Plus-shaped (face-connected) structuring element, matching the
    reference's generate_binary_structure(ndim, 1)."""
    out = mask.astype(bool)
    for _ in range(iterations):
        acc = out.copy()
        for axis in range(out.ndim):
            for d in (1, -1):
                acc |= _shifted(out, axis, d, border=False)
        out = acc
    return out


def binary_erode(mask: np.ndarray, iterations: int = 1) -> np.ndarray:
    """Out-of-bounds counts as background (scipy border_value=0), so border
    pixels always erode."""
    out = mask.astype(bool)
    for _ in range(iterations):
        acc = out.copy()
        for axis in range(out.ndim):
            for d in (1, -1):
                acc &= _shifted(out, axis, d, border=False)
        out = acc
    return out


def brain_air_masks(vol: np.ndarray) -> tuple[np.ndarray, np.ndarray, float]:
    """(brain, air, otsu_thr): brain = erode(dilate(otsu-fg, 1), 2);
    air = (vol < p5) & ~dilate(brain, 2), with p70/p5 fallbacks when a
    mask degenerates (ref: v2/estimate_snr.py:44-68). The threshold that
    actually built the masks is returned so reports stay consistent with
    the mask stats (a separate otsu_threshold(vol) call uses different
    clip percentiles and yields a different number)."""
    thr = otsu_threshold(vol, clip_percentiles=(0.5, 99.5))
    fg = vol > thr
    brain = binary_erode(binary_dilate(fg, 1), 2)
    p5 = np.nanpercentile(vol, 5)
    air = (vol < p5) & ~binary_dilate(brain, 2)
    if not brain.any():
        brain = vol > np.nanpercentile(vol, 70)
    if not air.any():
        air = vol < p5
    return brain, air, float(thr)


# --- A7: background-sigma de-bias -----------------------------------------


def sigma_from_background_std(std_air: float, mode: str = "rayleigh", n_coils: int = 1) -> float:
    """Magnitude background noise is Rayleigh (1 coil) / Chi (Nc coils,
    k = 2*Nc DOF); invert the chi std moment to the underlying Gaussian
    sigma (ref: v2/estimate_snr.py:74-95). Uses lgamma for large k."""
    if mode == "gaussian":
        return std_air
    if mode in ("rayleigh", "rician"):
        # single-coil magnitude background: Rayleigh (k = 2) — 'rician'
        # is the degradation module's name for the same single-coil model
        k = 2
    elif mode == "chi":
        k = 2 * int(n_coils)
    else:
        # an unrecognized mode previously fell through to the chi branch,
        # silently applying a multi-coil correction (~7% sigma error for
        # 'rician'/n_coils=32) while the metrics row reported n_coils=1
        raise ValueError(f"unknown noise mode {mode!r}")
    ratio = math.exp(math.lgamma((k + 1) / 2.0) - math.lgamma(k / 2.0))
    denom = math.sqrt(max(k - 2.0 * ratio * ratio, 1e-12))
    return std_air / denom


def snr_from_roi(
    vol: np.ndarray,
    brain: np.ndarray,
    air: np.ndarray,
    mode: str = "rayleigh",
    n_coils: int = 1,
) -> dict:
    """mean/std(ddof=1)/second-moment ROI stats + naive and corrected SNR
    (ref: v2/estimate_snr.py:97-116)."""
    sig = float(vol[brain].mean()) if brain.any() else 0.0
    std_air = float(vol[air].std(ddof=1)) if air.sum() > 1 else 0.0
    sigma = sigma_from_background_std(std_air, mode, n_coils)
    return {
        "mean_signal": sig,
        "std_air": std_air,
        "sigma_corrected": sigma,
        "snr_naive": sig / std_air if std_air > 0 else float("inf"),
        "snr_corrected": sig / sigma if sigma > 0 else float("inf"),
    }


def compute_snr_volume(vol: np.ndarray, mode: str = "chi", n_coils: int = 32) -> dict:
    """Volume -> full metrics dict (ref surface: compute_snr_volume_7t /
    compute_snr_flash7t, v2/estimate_snr.py:118-178,197-288)."""
    if vol.ndim != 3:
        raise ValueError("compute_snr_volume expects a 3D volume")
    brain, air, thr = brain_air_masks(vol)
    stats = snr_from_roi(vol, brain, air, mode, n_coils)
    return {
        "otsu_threshold": thr,
        "brain_frac": float(brain.mean()),
        "air_frac": float(air.mean()),
        **stats,
        "n_coils": int(n_coils if mode == "chi" else 1),
        "noise_mode": mode,
    }


def estimate_phase_sigma_from_repeats(vols: list[np.ndarray]) -> dict:
    """Voxelwise std(ddof=1) across repeated acquisitions + masked mean
    (ref: v2/estimate_snr.py:303-334)."""
    if len(vols) < 2:
        raise ValueError("need >= 2 repeats")
    stack = np.stack(vols, axis=0)
    sigma_map = stack.std(axis=0, ddof=1)
    brain, _, _ = brain_air_masks(stack.mean(axis=0))
    return {
        "sigma_map": sigma_map.astype(np.float32),
        "sigma_global": float(sigma_map[brain].mean()) if brain.any() else float(sigma_map.mean()),
    }


# --- Spark surface ---------------------------------------------------------


def snr_metrics(volumes: DataFrame, mode: str = "chi", n_coils: int = 32) -> DataFrame:
    """Grouped-map analytics: one metrics row per volume row. Runs where
    the voxels live; the result is a tiny dimension table."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                vol = npy_bytes_to_np(r.voxels).astype(np.float32)
                m = compute_snr_volume(vol, mode, n_coils)
                rows.append({"base": r.base, **m})
            yield pd.DataFrame(rows)

    return volumes.mapInPandas(gen, schema=SNR_METRICS_SCHEMA)


def phase_sigma_by_volume(repeats: DataFrame) -> DataFrame:
    """A11 as a Spark grouped-map (applyInPandas): repeated acquisitions of
    each volume are co-located by the groupBy — the one operator family
    where rows of a group genuinely must meet in one place (voxelwise std
    across repeats can't decompose into partial aggregates without
    shipping sum/sumsq maps). The shuffle moves each volume's repeats
    once; output is one metrics row per volume (tiny dimension table).
    Contrast with snr_metrics (mapInPandas): per-row analytics need no
    grouping, so they skip the shuffle entirely."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # A volume with a lone acquisition has no defined repeat-sigma;
        # emit a NULL metrics row instead of raising — one bad group
        # must not abort a corpus-wide analytics job (the estimator
        # raises ValueError on < 2 repeats, and applyInPandas fails the
        # whole query on any group's exception).
        if len(pdf) < 2:
            return pd.DataFrame(
                [
                    {
                        "base": pdf["base"].iloc[0],
                        "n_repeats": len(pdf),
                        "sigma_global": None,
                    }
                ]
            )
        vols = [
            npy_bytes_to_np(bytes(b)).astype(np.float32)
            for b in pdf.sort_values("repeat_i")["voxels"]
        ]
        if len({v.shape for v in vols}) > 1:
            # mismatched repeat dimensions (truncated/corrupt re-scan):
            # no defined voxelwise std — NULL row, same rationale as the
            # lone-acquisition guard above (one bad group must not abort
            # the corpus job; np.stack would raise inside applyInPandas)
            return pd.DataFrame(
                [
                    {
                        "base": pdf["base"].iloc[0],
                        "n_repeats": len(vols),
                        "sigma_global": None,
                    }
                ]
            )
        m = estimate_phase_sigma_from_repeats(vols)
        return pd.DataFrame(
            [
                {
                    "base": pdf["base"].iloc[0],
                    "n_repeats": len(vols),
                    "sigma_global": m["sigma_global"],
                }
            ]
        )

    return repeats.groupBy("base").applyInPandas(
        fn, "base string, n_repeats int, sigma_global double"
    )
