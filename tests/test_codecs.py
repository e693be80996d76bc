"""Real-bytes coverage for the engine's NIfTI-1 and PNG codecs
(VERDICT r1 next-round items 6-7): the decode paths formerly gated behind
nibabel/cv2 now run on hand-built spec-conformant payloads, both as pure
functions and end-to-end through the Spark binaryFile scan."""

from __future__ import annotations

import gzip
import struct
import zlib

import numpy as np
import pytest

from etl_mri_scripts_spark.sources.codecs import (
    decode_nifti1,
    decode_png,
    encode_nifti1,
    encode_png,
)

# ---------------------------------------------------------------------------
# NIfTI-1
# ---------------------------------------------------------------------------


def _hand_built_nifti(
    vol: np.ndarray,
    zooms=(0.5, 0.75, 2.0),
    slope=1.0,
    inter=0.0,
    endian="<",
    gzipped=False,
) -> bytes:
    """Build NIfTI-1 bytes from the public spec, independently of
    encode_nifti1, so decoder tests are not round-trip tautologies."""
    hdr = bytearray(348)
    struct.pack_into(endian + "i", hdr, 0, 348)
    struct.pack_into(endian + "8h", hdr, 40, 3, *vol.shape, 1, 1, 1, 1)
    code = {np.uint8: 2, np.int16: 4, np.int32: 8, np.float32: 16, np.float64: 64}[
        vol.dtype.type
    ]
    struct.pack_into(endian + "h", hdr, 70, code)
    struct.pack_into(endian + "h", hdr, 72, vol.dtype.itemsize * 8)
    struct.pack_into(endian + "8f", hdr, 76, 1.0, *zooms, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into(endian + "f", hdr, 108, 352.0)
    struct.pack_into(endian + "2f", hdr, 112, slope, inter)
    hdr[344:348] = b"n+1\x00"
    body = (
        bytes(hdr)
        + b"\x00" * 4
        + vol.astype(vol.dtype.newbyteorder(endian)).tobytes(order="F")
    )
    return gzip.compress(body) if gzipped else body


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32, np.float32, np.float64])
def test_nifti_decode_dtypes(dtype):
    rng = np.random.default_rng(3)
    vol = (rng.random((5, 4, 3)) * 100).astype(dtype)
    got, zooms = decode_nifti1(_hand_built_nifti(vol))
    assert got.dtype == np.float32
    assert got.shape == (5, 4, 3)
    np.testing.assert_allclose(got, vol.astype(np.float32), rtol=1e-6)
    assert zooms == (0.5, 0.75, 2.0)


def test_nifti_decode_gzip_and_fortran_order():
    # value at [x, y, z] must come back at the same index: Fortran order
    vol = np.arange(2 * 3 * 4, dtype=np.float32).reshape((2, 3, 4))
    got, _ = decode_nifti1(_hand_built_nifti(vol, gzipped=True))
    np.testing.assert_array_equal(got, vol)


def test_nifti_decode_big_endian():
    vol = np.arange(24, dtype=np.int16).reshape((2, 3, 4))
    got, zooms = decode_nifti1(_hand_built_nifti(vol, endian=">"))
    np.testing.assert_array_equal(got, vol.astype(np.float32))
    assert zooms == (0.5, 0.75, 2.0)


def test_nifti_decode_scl_slope_inter():
    vol = np.arange(8, dtype=np.int16).reshape((2, 2, 2))
    got, _ = decode_nifti1(_hand_built_nifti(vol, slope=2.5, inter=-3.0))
    np.testing.assert_allclose(got, vol * 2.5 - 3.0, rtol=1e-6)


def test_nifti_decode_slope_zero_means_unscaled():
    vol = np.arange(8, dtype=np.float32).reshape((2, 2, 2))
    got, _ = decode_nifti1(_hand_built_nifti(vol, slope=0.0, inter=99.0))
    np.testing.assert_array_equal(got, vol)


def test_nifti_encode_decode_roundtrip():
    rng = np.random.default_rng(11)
    vol = rng.standard_normal((7, 6, 5)).astype(np.float32)
    got, zooms = decode_nifti1(encode_nifti1(vol, zooms=(0.2, 0.2, 1.0)))
    np.testing.assert_array_equal(got, vol)
    np.testing.assert_allclose(zooms, (0.2, 0.2, 1.0), rtol=1e-6)


def test_nifti_rejects_garbage():
    with pytest.raises(ValueError):
        decode_nifti1(b"\x00" * 400)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(6, 5), (6, 5, 3), (6, 5, 4)])
def test_png_roundtrip(shape):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    for level in (0, 1, 9):
        got = decode_png(encode_png(img, compression=level))
        np.testing.assert_array_equal(got, img)


def _hand_built_png(img: np.ndarray, filters: list[int]) -> bytes:
    """Independent PNG writer exercising arbitrary per-scanline filters so
    decode_png's unfilter paths are tested against the spec, not against
    encode_png (which only emits filter 0)."""
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    px = img.reshape(h, w * c).astype(np.int16)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int16)
    for y in range(h):
        ft = filters[y % len(filters)]
        line = px[y].copy()
        out = np.empty_like(line)
        for i in range(w * c):
            left = line[i - c] if i >= c else 0
            up = prev[i]
            ul = prev[i - c] if i >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (int(left) + int(up)) >> 1
            else:  # Paeth
                p = int(left) + int(up) - int(ul)
                pa, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc_ else (up if pb <= pc_ else ul)
            out[i] = (int(line[i]) - int(pred)) & 0xFF
        raw += bytes([ft]) + bytes(out.astype(np.uint8).tobytes())
        prev = line
    color = {1: 0, 3: 2, 4: 6}[c]
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


@pytest.mark.parametrize("channels", [1, 3])
def test_png_decode_all_filter_types(channels):
    rng = np.random.default_rng(9)
    shape = (10, 7) if channels == 1 else (10, 7, channels)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    blob = _hand_built_png(img, filters=[0, 1, 2, 3, 4])
    np.testing.assert_array_equal(decode_png(blob), img)


def test_png_rejects_non_png():
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")


# ---------------------------------------------------------------------------
# End-to-end through Spark: scan -> decode -> write -> rescan
# ---------------------------------------------------------------------------


def test_nifti_scan_decode_end_to_end(spark, tmp_path):
    from etl_mri_scripts_spark.sources.volumes import (
        decode_nifti,
        npy_bytes_to_np,
        scan_nifti,
    )

    anat = tmp_path / "sub-001" / "anat"
    anat.mkdir(parents=True)
    rng = np.random.default_rng(17)
    vols = {}
    for i in range(3):
        v = (rng.random((8, 7, 6)) * 1000).astype(np.float32)
        vols[f"sub-{i:03d}_T1w"] = v
        (anat / f"sub-{i:03d}_T1w.nii.gz").write_bytes(
            encode_nifti1(v, zooms=(0.2, 0.2, 1.0))
        )
    out = decode_nifti(scan_nifti(spark, str(tmp_path))).collect()
    assert len(out) == 3
    for r in out:
        assert (r["sx"], r["sy"], r["sz"]) == (8, 7, 6)
        assert (r["zoom_x"], r["zoom_y"]) == pytest.approx((0.2, 0.2))
        np.testing.assert_array_equal(npy_bytes_to_np(bytes(r["voxels"])), vols[r["base"]])


def test_png_write_read_end_to_end(spark, tmp_path):
    from etl_mri_scripts_spark.sources.multimodal import scan_png_tree, write_png_tree
    from etl_mri_scripts_spark.sources.volumes import np_to_npy_bytes, npy_bytes_to_np

    rng = np.random.default_rng(23)
    imgs = {f"patch_{i:04d}": rng.integers(0, 256, (12, 9, 3), dtype=np.uint8) for i in range(5)}
    df = spark.createDataFrame(
        [(k, bytearray(np_to_npy_bytes(v, "uint8"))) for k, v in imgs.items()],
        "key string, payload binary",
    )
    out_dir = str(tmp_path / "pngs")
    write_png_tree(df, out_dir, compression=4)

    back = scan_png_tree(spark, out_dir).collect()
    assert len(back) == 5
    assert all(r["width"] == 9 and r["height"] == 12 and r["channels"] == 3 for r in back)
    # pixel-exact round trip (PNG is lossless)
    decoded = sorted(
        (npy_bytes_to_np(bytes(r["payload"])) for r in back),
        key=lambda a: a.sum(),
    )
    expected = sorted(imgs.values(), key=lambda a: a.sum())
    for g, e in zip(decoded, expected):
        np.testing.assert_array_equal(g, e)
