"""Pure-Python/NumPy codecs for the two binary formats the reference
pipeline actually reads and writes: NIfTI-1 volumes (ref:
slice_generator.py:69-70 via nibabel) and PNG images (ref:
extract_subimages.py:52 cv2.imread, :86 cv2.imwrite with
IMWRITE_PNG_COMPRESSION).

Both formats have small public specs, so rather than stubbing decode behind
missing third-party libraries, the engine carries minimal spec-compliant
implementations with zero dependencies beyond numpy + zlib/gzip:

* NIfTI-1: 348-byte header + raw Fortran-order voxel block, optionally
  gzip-wrapped (.nii.gz). Handles both endiannesses, the common dtype codes,
  and scl_slope/scl_inter scaling with nibabel's get_fdata() semantics.
* PNG: 8-bit greyscale / RGB / RGBA, non-interlaced — the subset every
  training-image pipeline emits. Decoder implements all five scanline
  filters; encoder writes filter-0 rows with a selectable zlib level
  (the K2 compression knob).

When nibabel / cv2 / PIL are installed, callers may prefer them; these
routines are the always-available fallback the tests exercise on real bytes.
"""

from __future__ import annotations

import gzip
import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# NIfTI-1
# ---------------------------------------------------------------------------

# public dtype codes (nifti1.h): code -> numpy dtype char
_NIFTI_DTYPES = {
    2: "u1",  # DT_UNSIGNED_CHAR
    4: "i2",  # DT_SIGNED_SHORT
    8: "i4",  # DT_SIGNED_INT
    16: "f4",  # DT_FLOAT
    64: "f8",  # DT_DOUBLE
    256: "i1",  # DT_INT8
    512: "u2",  # DT_UINT16
    768: "u4",  # DT_UINT32
}

_GZIP_MAGIC = b"\x1f\x8b"


def decode_nifti1(content: bytes) -> tuple[np.ndarray, tuple[float, float, float]]:
    """Decode a .nii / .nii.gz byte blob to (float32 volume, (zx, zy, zz)).

    Matches nibabel ``img.get_fdata()`` + ``header.get_zooms()[:3]`` for the
    3-D single-file case: voxels are Fortran-ordered (x fastest), scaled by
    scl_slope/scl_inter when slope is finite and nonzero.
    """
    if content[:2] == _GZIP_MAGIC:
        content = gzip.decompress(content)
    if len(content) < 352:
        raise ValueError("truncated NIfTI-1 payload")

    # endianness is discovered from sizeof_hdr (must read as 348)
    for end in ("<", ">"):
        (sizeof_hdr,) = struct.unpack_from(end + "i", content, 0)
        if sizeof_hdr == 348:
            break
    else:
        raise ValueError("not a NIfTI-1 file (sizeof_hdr != 348)")

    magic = content[344:348]
    if magic[:2] not in (b"n+", b"ni"):
        raise ValueError(f"bad NIfTI-1 magic {magic!r}")

    dim = struct.unpack_from(end + "8h", content, 40)
    ndim = dim[0]
    if not 1 <= ndim <= 7:
        raise ValueError(f"bad ndim {ndim}")
    if ndim > 3 and any(int(d) > 1 for d in dim[4 : 1 + ndim]):
        # refuse rather than silently truncate to timepoint 0 — the
        # nibabel path would return the full 4D array here, and the two
        # environments must not decode the same file differently (the
        # slice pipeline is 3-D only either way)
        raise ValueError(
            f"decode_nifti1 supports 3-D volumes only (file is {ndim}-D, "
            f"dim={tuple(dim[1:1 + ndim])})"
        )
    shape = tuple(max(int(d), 1) for d in dim[1 : 1 + max(ndim, 3)][:3])

    (datatype,) = struct.unpack_from(end + "h", content, 70)
    if datatype not in _NIFTI_DTYPES:
        raise ValueError(f"unsupported NIfTI datatype code {datatype}")
    dt = np.dtype(end + _NIFTI_DTYPES[datatype])

    pixdim = struct.unpack_from(end + "8f", content, 76)
    zooms = tuple(float(abs(z)) for z in pixdim[1:4])

    (vox_offset,) = struct.unpack_from(end + "f", content, 108)
    offset = int(vox_offset) if vox_offset >= 352 else 352
    scl_slope, scl_inter = struct.unpack_from(end + "2f", content, 112)

    n_vox = int(np.prod(shape))
    raw = np.frombuffer(content, dtype=dt, count=n_vox, offset=offset)
    vol = raw.reshape(shape, order="F").astype(np.float32)
    # nibabel get_fdata semantics: apply scaling when slope is finite and
    # nonzero (slope 0 / NaN means "unscaled")
    if np.isfinite(scl_slope) and scl_slope != 0.0:
        inter = np.float32(scl_inter) if np.isfinite(scl_inter) else np.float32(0.0)
        if scl_slope != 1.0 or inter != 0.0:
            vol = vol * np.float32(scl_slope) + inter
    return vol, zooms


def encode_nifti1(
    vol: np.ndarray,
    zooms: tuple[float, float, float] = (1.0, 1.0, 1.0),
    gzipped: bool = True,
) -> bytes:
    """Encode a 3-D array as a single-file NIfTI-1 blob (test fixture twin
    of decode_nifti1; also lets the engine round-trip volumes without
    nibabel)."""
    vol = np.asarray(vol)
    if vol.ndim != 3:
        raise ValueError("encode_nifti1 expects a 3-D volume")
    code = {np.dtype("u1"): 2, np.dtype("i2"): 4, np.dtype("i4"): 8,
            np.dtype("f4"): 16, np.dtype("f8"): 64}.get(vol.dtype.newbyteorder("="))
    if code is None:
        vol = vol.astype(np.float32)
        code = 16
    # The header below is little-endian; the payload must match it. A
    # big-endian input array (e.g. decoded from a BE NIfTI) would
    # otherwise serialize byte-swapped relative to its declared dtype.
    vol = vol.astype(vol.dtype.newbyteorder("<"), copy=False)
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 3, *vol.shape, 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, code)
    struct.pack_into("<h", hdr, 72, vol.dtype.itemsize * 8)  # bitpix
    struct.pack_into("<8f", hdr, 76, 1.0, *zooms, 1.0, 1.0, 1.0, 1.0)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<2f", hdr, 112, 1.0, 0.0)  # slope, inter
    hdr[344:348] = b"n+1\x00"
    body = bytes(hdr) + b"\x00" * 4 + vol.tobytes(order="F")
    return gzip.compress(body, compresslevel=1) if gzipped else body


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}  # grey, RGB, RGBA


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode_png(img: np.ndarray, compression: int = 6) -> bytes:
    """Encode uint8 (h, w) / (h, w, 3) / (h, w, 4) as PNG. ``compression``
    is the zlib level 0-9 — the same knob the reference passes to
    cv2.imwrite as IMWRITE_PNG_COMPRESSION (extract_subimages.py:86)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if img.ndim == 2:
        color, channels = 0, 1
        img = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        channels = img.shape[2]
        color = 2 if channels == 3 else 6
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, compression)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(content: bytes) -> np.ndarray:
    """Decode 8-bit non-interlaced grey/RGB/RGBA PNG to uint8 ndarray of
    shape (h, w) or (h, w, c). Implements scanline filters 0-4."""
    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        tag = content[pos + 4 : pos + 8]
        payload = content[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color not in _COLOR_CHANNELS:
                raise ValueError(f"unsupported PNG: depth={depth} color={color}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            channels = _COLOR_CHANNELS[color]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (int(line[i]) + int(line[i - bpp])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (line[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = int(line[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = line
        prev = out[y]
    img = out.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img
