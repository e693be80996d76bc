"""K9 + P3: visualization renders as engine operators.

The reference renders degradation triptychs (HR | 3T | 1.5T side-by-side
PNG, v2/viz_degradation.py:30-91) and rotates slices for standard display
(create_sample.py:62 np.rot90). Both are pure pixel transforms, so the
engine implements them as distributed operators: one Arrow-batched
mapInPandas over volumes, PNG bytes produced by the zero-dependency codec
(sources/codecs.py) — no matplotlib/imageio required, and rendering scales
with the cluster instead of a notebook.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..sources.codecs import encode_png
from ..sources.volumes import npy_bytes_to_np

# Viewer orientations (v2/viz_degradation.py:14-18). NOTE: these are the
# VIEWER's axes — deliberately distinct from the pipeline's slice-generator
# orientations (operators/pipeline.py), which carry the coronal-uses-sz
# quirk; the viewer has its own convention and we preserve each faithfully.
ORIENT_VIEW = {
    "axial": lambda vol: vol,  # (X, Y, Z)
    "coronal": lambda vol: np.transpose(vol, (1, 0, 2)),  # (Y, X, Z)
    "sagittal": lambda vol: np.transpose(vol, (2, 0, 1)),  # (Z, X, Y)
}

TRIPTYCH_SCHEMA = (
    "base string, axis string, slice_idx int, "
    "hr_png binary, lr3_png binary, lr15_png binary, triptych_png binary, "
    "height int, width int"
)


def pnorm_uint8(x: np.ndarray, pmin: float = 1.0, pmax: float = 99.0) -> np.ndarray:
    """Percentile-window normalize to uint8 for display
    (ref: v2/viz_degradation.py:20-28, incl. the vmin==vmax epsilon guard)."""
    x = np.asarray(x, dtype=np.float32)
    pcts = np.nanpercentile(x, [pmin, pmax])  # one pass, both tails
    vmin, vmax = float(pcts[0]), float(pcts[1])
    if vmax <= vmin + 1e-8:
        vmax = vmin + 1e-8
    y = np.clip((x - vmin) / (vmax - vmin), 0.0, 1.0)
    # NaN voxels survive clip (clip(NaN) = NaN) and a NaN->uint8 cast is
    # undefined, making rendered PNG bytes platform-dependent; render
    # NaN as black instead.
    return (np.nan_to_num(y, nan=0.0) * 255.0).astype(np.uint8)


def rot90_display(img: np.ndarray) -> np.ndarray:
    """P3: rotate a slice to standard display orientation
    (ref: create_sample.py:62 np.rot90 before PNG write)."""
    return np.rot90(img)


def _pad_to_h(img: np.ndarray, h: int) -> np.ndarray:
    """Edge-pad a panel to common height (ref: viz_degradation.py:78-85)."""
    if img.shape[0] == h:
        return img
    return np.pad(img, ((0, h - img.shape[0]), (0, 0)), mode="edge")


def compose_triptych(panels: list[np.ndarray]) -> np.ndarray:
    """Side-by-side composition with edge padding to the tallest panel
    (ref: viz_degradation.py:77-88)."""
    h_max = max(p.shape[0] for p in panels)
    return np.concatenate([_pad_to_h(p, h_max) for p in panels], axis=1)


def render_triptychs(
    volumes: DataFrame,
    axis: str = "axial",
    slice_idx: int | None = None,
    seed: int = 123,
    rot90: bool = False,
) -> DataFrame:
    """K9: per-volume degradation triptych (HR | 3T | 1.5T) as real PNG
    payload columns. One row in, one row out — a narrow Arrow map, so
    Catalyst treats it like any other projection; PNG bytes never enter
    keys. ``slice_idx=None`` takes the middle slice (viz_degradation.py:50).
    """
    if axis not in ORIENT_VIEW:
        raise KeyError(f"axis must be one of {sorted(ORIENT_VIEW)}")

    def gen(batches):
        # heavy import inside the task: executors pay it once per worker
        from .degradation import degrade_slice_preset

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                vol = npy_bytes_to_np(bytes(r.voxels)).astype(np.float32)
                vol = ORIENT_VIEW[axis](vol)
                z = vol.shape[2]
                idx = z // 2 if slice_idx is None else max(0, min(z - 1, slice_idx))
                sl = vol[:, :, idx]
                if rot90:
                    sl = rot90_display(sl)
                hr_vis = pnorm_uint8(sl)
                lr3_vis = pnorm_uint8(degrade_slice_preset(sl, "3tFlash", seed=seed)["lr"])
                lr15_vis = pnorm_uint8(degrade_slice_preset(sl, "1.5Flash", seed=seed)["lr"])
                trip = compose_triptych([hr_vis, lr3_vis, lr15_vis])
                rows.append(
                    dict(
                        base=r.base,
                        axis=axis,
                        slice_idx=idx,
                        hr_png=encode_png(hr_vis),
                        lr3_png=encode_png(lr3_vis),
                        lr15_png=encode_png(lr15_vis),
                        triptych_png=encode_png(trip),
                        height=int(trip.shape[0]),
                        width=int(trip.shape[1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "base", "axis", "slice_idx", "hr_png", "lr3_png",
                    "lr15_png", "triptych_png", "height", "width",
                ],
            )

    return volumes.select("base", "voxels").mapInPandas(gen, schema=TRIPTYCH_SCHEMA)


def write_triptych_tree(df: DataFrame, out_dir: str) -> None:
    """Write the four PNGs per volume with the reference's file-name scheme
    (viz_degradation.py:72-89): <base>__<axis>__s<idx:03d>__{HR,3T,1p5T,
    HR_3T_1p5T_triptych}.png. Executor-parallel, driver moves no pixels."""

    def write_partition(rows):
        import os

        os.makedirs(out_dir, exist_ok=True)
        for r in rows:
            stem = f"{r['base']}__{r['axis']}__s{r['slice_idx']:03d}"
            for suffix, col in (
                ("HR", "hr_png"),
                ("3T", "lr3_png"),
                ("1p5T", "lr15_png"),
                ("HR_3T_1p5T_triptych", "triptych_png"),
            ):
                with open(os.path.join(out_dir, f"{stem}__{suffix}.png"), "wb") as f:
                    f.write(bytes(r[col]))

    df.foreachPartition(write_partition)
