"""Property-based tests (hypothesis) for the pure kernels whose exact
semantics the reference pins down (SURVEY.md §7 hard-parts watch list):
trailing-edge crop grids, key normalization, edge padding, dark filter,
npy round-trip. Each property cross-checks against an independent
re-implementation of the reference rule, not against the impl itself."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_mri_scripts_spark.operators.filters import is_predominantly_dark_u8, patch_is_dark
from etl_mri_scripts_spark.operators.patches import (
    crop_with_edge_pad,
    make_crop_spaces,
    normalize_key,
    patch_key,
)
from etl_mri_scripts_spark.sources.volumes import np_to_npy_bytes, npy_bytes_to_np

dims = st.integers(min_value=1, max_value=600)
crops = st.integers(min_value=1, max_value=128)
steps = st.integers(min_value=1, max_value=128)
threshes = st.integers(min_value=0, max_value=32)


def _ref_grid(dim: int, crop: int, step: int, thresh: int) -> list[int]:
    # independent transcription of v2/patch_utils.py:36-46: regular starts
    # arange(0, dim-crop+1, step) (guarded to [0] when dim <= crop), then a
    # final dim-crop start if the uncovered tail exceeds thresh.
    starts = list(np.arange(0, max(dim - crop, 0) + 1, step))
    if dim - (starts[-1] + crop) > thresh:
        starts.append(dim - crop)
    return [int(s) for s in starts]


@settings(max_examples=300)
@given(h=dims, w=dims, crop=crops, step=steps, thresh=threshes)
def test_grid_matches_reference_rule(h, w, crop, step, thresh):
    h_space, w_space = make_crop_spaces(h, w, crop, step, thresh)
    assert h_space == _ref_grid(h, crop, step, thresh)
    assert w_space == _ref_grid(w, crop, step, thresh)


@settings(max_examples=300)
@given(dim=dims, crop=crops, step=steps, thresh=threshes)
def test_grid_invariants(dim, crop, step, thresh):
    space, _ = make_crop_spaces(dim, dim, crop, step, thresh)
    # non-empty, starts at 0, strictly increasing
    assert space and space[0] == 0 and all(a < b for a, b in zip(space, space[1:]))
    # every start stays in-bounds for the padded crop
    assert all(0 <= s <= max(dim - crop, 0) for s in space)
    # coverage: the uncovered tail past the last window never exceeds thresh
    assert dim - (space[-1] + crop) <= thresh


key_parts = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="-"),
    min_size=1,
    max_size=16,
)


@settings(max_examples=200)
@given(base=key_parts, i=st.integers(0, 999), idx=st.integers(1, 999),
       scale=st.integers(2, 4), orient=st.sampled_from(["axial", "coronal", "sagittal"]))
def test_key_normalization_pairs_hr_lr(base, i, idx, scale, orient):
    hr = patch_key(base, orient, i, "HR", idx)
    lr = patch_key(base, orient, i, f"LRx{scale}", idx)
    # J1 pairing invariant: HR and LR of one patch normalize identically...
    assert normalize_key(hr) == normalize_key(lr) == f"{base}__{orient}__slice_{i:03d}__s{idx:03d}"
    # ...and normalization is idempotent (T1 regex anchored at the tag)
    assert normalize_key(normalize_key(hr)) == normalize_key(hr)


@settings(max_examples=200)
@given(
    h=st.integers(2, 40), w=st.integers(2, 40),
    y=st.integers(0, 48), x=st.integers(0, 48), crop=st.integers(1, 16),
    data=st.integers(0, 2**31 - 1),
)
def test_edge_pad_shape_and_interior(h, w, y, x, crop, data):
    rng = np.random.default_rng(data)
    img = rng.random((h, w)).astype(np.float32)
    y, x = min(y, h - 1), min(x, w - 1)
    tile = crop_with_edge_pad(img, y, x, crop)
    # always exactly crop x crop (P9)
    assert tile.shape == (crop, crop)
    # the in-bounds region is a verbatim copy
    ih, iw = min(crop, h - y), min(crop, w - x)
    np.testing.assert_array_equal(tile[:ih, :iw], img[y : y + ih, x : x + iw])
    # padded cells replicate the edge (never zeros, never wrap)
    if ih < crop:
        np.testing.assert_array_equal(tile[ih:, :iw], np.tile(tile[ih - 1, :iw], (crop - ih, 1)))


@settings(max_examples=200)
@given(
    level=st.integers(0, 255),
    seed=st.integers(0, 2**31 - 1),
    frac_dark=st.floats(0.0, 1.0),
)
def test_dark_filter_u8_float_equivalence(level, seed, frac_dark):
    # F2 (uint8, threshold 20) and F3 (float 0..1, threshold 20/255) must
    # agree on the same image content (SURVEY §7: threshold equivalence).
    rng = np.random.default_rng(seed)
    img = np.full((12, 12), level, dtype=np.uint8)
    mask = rng.random((12, 12)) < frac_dark
    img[mask] = rng.integers(0, 20, size=int(mask.sum()), dtype=np.uint8)
    as_float = img.astype(np.float32) / 255.0
    assert is_predominantly_dark_u8(img) == patch_is_dark(as_float)


@settings(max_examples=100)
@given(
    h=st.integers(1, 32), w=st.integers(1, 32),
    dtype=st.sampled_from(["float32", "float16", "uint8"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_npy_roundtrip(h, w, dtype, seed):
    rng = np.random.default_rng(seed)
    arr = (rng.random((h, w)) * 100).astype(dtype)
    back = npy_bytes_to_np(np_to_npy_bytes(arr, dtype))
    assert back.dtype == np.dtype(dtype) and back.shape == (h, w)
    np.testing.assert_array_equal(back, arr)


# --- round-3 additions -------------------------------------------------------


def _canon_url(url: str) -> str:
    """Python replica of the dedup_url_canonical normalization chain."""
    import re

    u = url.lower()
    u = re.sub(r"#.*$", "", u)
    u = re.sub(r"(utm_[a-z]+|ref)=[^&]*&?", "", u)
    u = re.sub(r"[?&]$", "", u)
    u = u.replace(":443/", "/")
    u = re.sub(r"/+$", "", u)
    return u


@given(
    host=st.from_regex(r"[a-z][a-z0-9]{0,8}", fullmatch=True),
    path=st.from_regex(r"[a-z0-9/]{0,12}", fullmatch=True),
    frag=st.from_regex(r"[a-z0-9]{0,6}", fullmatch=True),
    utm=st.booleans(),
    port=st.booleans(),
    slash=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_url_canonicalization_idempotent_and_variant_stable(
    host, path, frag, utm, port, slash
):
    base = f"https://{host}.example.com{':443' if port else ''}/{path}"
    url = base + ("?utm_source=x&utm_campaign=y" if utm else "")
    if frag:
        url += f"#{frag}"
    if slash and not url.endswith("/"):
        url += "/"
    c = _canon_url(url)
    # idempotent: canonicalizing a canonical form changes nothing
    assert _canon_url(c) == c
    # variant-stable: the undecorated lowercase base maps to the same form
    assert _canon_url(base.replace(":443/", "/")) == _canon_url(base)


@given(
    na=st.integers(min_value=1, max_value=50),
    nb=st.integers(min_value=1, max_value=50),
    common=st.integers(min_value=0, max_value=50),
)
@settings(max_examples=200, deadline=None)
def test_containment_dominates_jaccard(na, nb, common):
    """containment = common/min(|A|,|B|) >= jaccard = common/|A u B|,
    with equality iff one set contains the other or common == 0 — the
    reason the asymmetric score catches doc-in-doc cases Jaccard dilutes."""
    common = min(common, na, nb)
    union = na + nb - common
    jac = common / union
    cont = common / min(na, nb)
    assert cont >= jac - 1e-12
    if common == min(na, nb) and common > 0:
        assert cont == 1.0


# ---------------------------------------------------------------------------
# Streaming sessionizer merge kernel: incremental merging across arbitrary
# batch splits must equal one-shot gaps-and-islands over all events.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _event_batches(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    # timestamps with duplicates allowed; gap threshold fixed at 100us
    tss = draw(st.lists(st.integers(min_value=0, max_value=2000), min_size=n, max_size=n))
    # arbitrary batch assignment for each event
    batch_of = draw(st.lists(st.integers(min_value=0, max_value=3), min_size=n, max_size=n))
    events = [(ts, i) for i, ts in enumerate(tss)]
    batches = [[], [], [], []]
    for (ts, i), b in zip(events, batch_of):
        batches[b].append((ts, ts, 1, i, i))
    return events, batches


@given(_event_batches())
@settings(max_examples=200, deadline=None)
def test_merge_session_intervals_equals_one_shot_islands(data):
    from etl_mri_scripts_spark.streaming.pipeline import merge_session_intervals

    events, batches = data
    GAP = 100

    # incremental: merge batch after batch into the running session list
    sessions = []
    for b in batches:
        sessions = merge_session_intervals(sessions, b, GAP)

    # one-shot truth: sort by (ts, id), split on gap >= GAP
    evs = sorted((ts, i) for ts, i in events)
    expected = []
    cur = [evs[0]]
    for ts, i in evs[1:]:
        if ts - cur[-1][0] >= GAP:
            expected.append(cur)
            cur = [(ts, i)]
        else:
            cur.append((ts, i))
    expected.append(cur)
    exp = [
        (c[0][0], c[-1][0], len(c), c[0][1], c[-1][1])
        for c in expected
    ]
    assert sorted(sessions) == sorted(exp)
