"""Round-5 additions.

- Fixture density contract backing middle_n_selection's top-k plan
  (ADVICE r4: the TakeOrderedAndProject form assumes event_id is a dense
  0-based index; pin that assumption so a fixture change fails loudly
  here instead of silently diverging from the oracle).
- Byte-level pins for sources/pylmdb.py, the pure-Python LMDB
  (liblmdb 0.9.x) data.mdb writer/reader that closes the "real LMDB
  never executed" gap: meta/leaf/branch/overflow page layout asserted
  against the public mdb.c constants, independent of pylmdb's own
  reader.
"""

from __future__ import annotations

import glob
import os
import struct

import duckdb
import pytest

from etl_mri_scripts_spark.sources import pylmdb

SF_DIRS = sorted(d for d in glob.glob("/root/testdata/sf*") if os.path.isdir(d))


@pytest.mark.parametrize("sf", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_events_event_id_is_dense_zero_based(sf):
    """middle_n_selection (queries/relational.py) ranks by distance from
    the center *position* using event_id directly, which is only valid
    when row_number() over event_id == event_id + 1, i.e. event_id is a
    dense 0-based index. Assert that contract on every shipped fixture
    scale; if a future fixture breaks it, switch the query to
    operators.rank.global_row_number (density-independent)."""
    pq = os.path.join(sf, "events.parquet")
    if not os.path.exists(pq):
        pytest.skip(f"no events fixture at {sf}")
    n, lo, hi, nd = duckdb.sql(
        f"SELECT count(*), min(event_id), max(event_id), "
        f"count(DISTINCT event_id) FROM read_parquet('{pq}')"
    ).fetchone()
    assert (lo, hi, nd) == (0, n - 1, n), (
        f"{sf}: event_id not dense 0-based (n={n} min={lo} max={hi} "
        f"distinct={nd}); middle_n_selection's top-k form is invalid here"
    )


# ---------------------------------------------------------------------------
# pylmdb: real-LMDB on-disk format
# ---------------------------------------------------------------------------


def _write_store(path, items, map_size=10 * 1024 * 1024):
    env = pylmdb.open(str(path), map_size=map_size)
    txn = env.begin(write=True)
    for k, v in items:
        txn.put(k, v)
    txn.commit()
    env.close()
    with open(os.path.join(str(path), "data.mdb"), "rb") as f:
        return f.read()


def test_pylmdb_meta_page_bytes(tmp_path):
    """Pin the meta layout against liblmdb's public constants (mdb.c):
    P_META flag in the page header, MDB_MAGIC/MDB_DATA_VERSION at the
    MDB_meta head, and the committed meta (higher txnid) carrying the
    MAIN db entry count."""
    buf = _write_store(tmp_path / "s", [(b"a", b"1"), (b"b", b"22")])
    assert len(buf) % 4096 == 0 and len(buf) >= 3 * 4096
    for pg in (0, 1):
        pgno, _pad, flags, _lo, _up = struct.unpack_from("<QHHHH", buf, pg * 4096)
        assert pgno == pg and flags == 0x08  # P_META
        magic, version = struct.unpack_from("<II", buf, pg * 4096 + 16)
        assert magic == 0xBEEFC0DE and version == 1
    # MDB_meta: 16B hdr + magic/version/address/mapsize (24B) + FREE db
    # (48B) -> MAIN db at offset 88; entries is its 7th field (+32B),
    # root the 8th (+40B); last_pg/txnid follow the dbs (+48B).
    main0 = 4096 * 0 + 16 + 24 + 48
    main1 = 4096 * 1 + 16 + 24 + 48
    (entries1,) = struct.unpack_from("<Q", buf, main1 + 32)
    (root1,) = struct.unpack_from("<Q", buf, main1 + 40)
    (txnid0,) = struct.unpack_from("<Q", buf, main0 + 48 + 8)
    (txnid1,) = struct.unpack_from("<Q", buf, main1 + 48 + 8)
    assert (txnid0, txnid1) == (0, 1)  # readers must pick meta 1
    assert entries1 == 2 and root1 == 2  # single leaf at page 2


def test_pylmdb_leaf_node_bytes(tmp_path):
    """Walk the leaf page by hand: P_LEAF flag, lower = 16 + 2*nkeys,
    ascending ptr array, MDB_node {lo, hi, flags, ksize} + key + value."""
    buf = _write_store(tmp_path / "s", [(b"k1", b"hello"), (b"k2", b"world!")])
    base = 2 * 4096
    _pgno, _pad, flags, lower, upper = struct.unpack_from("<QHHHH", buf, base)
    assert flags == 0x02  # P_LEAF
    nkeys = (lower - 16) // 2
    assert nkeys == 2
    got = {}
    for i in range(nkeys):
        (ptr,) = struct.unpack_from("<H", buf, base + 16 + 2 * i)
        assert ptr >= upper
        lo, hi, nflags, ksize = struct.unpack_from("<HHHH", buf, base + ptr)
        assert nflags == 0
        dsize = lo | (hi << 16)
        key = buf[base + ptr + 8 : base + ptr + 8 + ksize]
        val = buf[base + ptr + 8 + ksize : base + ptr + 8 + ksize + dsize]
        got[key] = val
    assert got == {b"k1": b"hello", b"k2": b"world!"}


def test_pylmdb_overflow_value(tmp_path):
    """8 + ksize + dsize > 2038 forces F_BIGDATA: the node stores the
    overflow pgno, the overflow page header carries P_OVERFLOW and the
    page count, and the value reads back byte-identical."""
    big = bytes(range(256)) * 40  # 10240 B -> 3 overflow pages
    buf = _write_store(tmp_path / "s", [(b"big", big), (b"small", b"x")])
    base = 2 * 4096
    (ptr,) = struct.unpack_from("<H", buf, base + 16)  # first key: b"big"
    lo, hi, nflags, ksize = struct.unpack_from("<HHHH", buf, base + ptr)
    assert nflags == 0x01 and (lo | hi << 16) == len(big)  # F_BIGDATA
    (ovpg,) = struct.unpack_from("<Q", buf, base + ptr + 8 + ksize)
    opgno, _pad, oflags, opages = struct.unpack_from("<QHHI", buf, ovpg * 4096)
    assert opgno == ovpg and oflags == 0x04  # P_OVERFLOW
    assert opages == (15 + len(big)) // 4096 + 1 == 3
    assert buf[ovpg * 4096 + 16 : ovpg * 4096 + 16 + len(big)] == big
    # and through the reader API
    env = pylmdb.open(str(tmp_path / "s"), readonly=True, lock=False)
    with env.begin() as txn:
        assert txn.get(b"big") == big and txn.get(b"small") == b"x"
    env.close()


def test_pylmdb_multilevel_tree_roundtrip(tmp_path):
    """Enough entries to force multiple leaves and at least one branch
    level; every key must point-read back exactly, absent keys -> None,
    and the meta depth/page counts must be consistent."""
    items = [(b"key-%06d" % i, (b"v%d|" % i) * (i % 37 + 1)) for i in range(3000)]
    buf = _write_store(tmp_path / "s", items)
    main1 = 4096 + 16 + 24 + 48
    _padf, _dbflags, depth = struct.unpack_from("<IHH", buf, main1)
    branch, leaf, ovf, entries = struct.unpack_from("<QQQQ", buf, main1 + 8)
    assert entries == 3000 and depth >= 2 and branch >= 1 and leaf > 1
    env = pylmdb.open(str(tmp_path / "s"), readonly=True, lock=False)
    with env.begin() as txn:
        for k, v in items[:: 97]:
            assert txn.get(k) == v
        assert txn.get(b"key-999999") is None
        assert txn.get(b"") is None
    env.close()


def test_pylmdb_psize_in_free_db_pad(tmp_path):
    """liblmdb aliases the FREE db's pad field as the persisted page size
    (mdb.c: #define mm_psize mm_dbs[FREE_DBI].md_pad); writing 0 there
    makes the real library divide by zero (mapsize / psize) at open.
    Both metas must carry 4096."""
    buf = _write_store(tmp_path / "s", [(b"a", b"1")])
    for pg in (0, 1):
        free_db = pg * 4096 + 16 + 24  # page hdr + magic/ver/addr/mapsize
        (psize,) = struct.unpack_from("<I", buf, free_db)
        assert psize == 4096, f"meta {pg}: mm_psize {psize} != 4096"


def test_pylmdb_oversized_key_fails_at_put_not_close(tmp_path):
    """Real lmdb rejects keys > 511 bytes with MDB_BAD_VALSIZE at put();
    failing late (at close) would discard every other committed entry."""
    env = pylmdb.open(str(tmp_path / "s"))
    txn = env.begin(write=True)
    with pytest.raises(EnvironmentError, match="MDB_BAD_VALSIZE"):
        txn.put(b"K" * 512, b"v")
    with pytest.raises(EnvironmentError, match="MDB_BAD_VALSIZE"):
        txn.put(b"", b"v")
    txn.put(b"K" * 511, b"ok")  # boundary key is legal
    txn.put(b"a", b"1")
    txn.commit()
    env.close()
    env = pylmdb.open(str(tmp_path / "s"), readonly=True, lock=False)
    with env.begin() as txn:
        assert txn.get(b"a") == b"1" and txn.get(b"K" * 511) == b"ok"
    env.close()


def test_pylmdb_empty_store_is_a_valid_file(tmp_path):
    """A store that never saw a put must still leave a valid empty
    data.mdb (real lmdb materializes the metas at env creation); an
    empty export partition must not ship an unopenable store."""
    env = pylmdb.open(str(tmp_path / "s"))
    with env.begin(write=True) as txn:
        pass  # no puts
    env.close()
    datafile = os.path.join(str(tmp_path / "s"), "data.mdb")
    assert os.path.exists(datafile)
    with open(datafile, "rb") as f:
        buf = f.read()
    (magic,) = struct.unpack_from("<I", buf, 16)
    assert magic == 0xBEEFC0DE
    env = pylmdb.open(str(tmp_path / "s"), readonly=True, lock=False)
    with env.begin() as txn:
        assert txn.get(b"anything") is None
    env.close()


def test_pylmdb_reopen_preserves_and_extends(tmp_path):
    """Opening an existing store for write keeps prior entries (the sink
    may export in several batched transactions/processes)."""
    _write_store(tmp_path / "s", [(b"a", b"1")])
    env = pylmdb.open(str(tmp_path / "s"))
    with env.begin(write=True) as txn:
        txn.put(b"b", b"2")
    env.close()
    env = pylmdb.open(str(tmp_path / "s"), readonly=True, lock=False)
    with env.begin() as txn:
        assert txn.get(b"a") == b"1" and txn.get(b"b") == b"2"
    env.close()


def test_pylmdb_fuzz_roundtrip(tmp_path):
    """Property-style round-trip: random key/value sizes straddling every
    layout boundary (inline vs F_BIGDATA at 8+ksize+dsize=2038, one- vs
    multi-page overflow at 4080/4096, single- vs multi-leaf, empty
    values, max-size keys). Deterministic LCG so failures reproduce."""
    x = 987654321
    def rnd(n):
        nonlocal x
        x = (x * 6364136223846793005 + 1442695040888963407) % 2**64
        return x % n

    items = {}
    for i in range(400):
        klen = [1, 2, 7, 64, 200, 511][rnd(6)]
        key = (b"%06d-" % i) + bytes(rnd(256) for _ in range(max(0, klen - 7)))
        vlen = [0, 1, 100, 2022, 2023, 2024, 2038, 4079, 4080, 4081, 9000][rnd(11)]
        items[key] = bytes(rnd(256) for _ in range(vlen))
    env = pylmdb.open(str(tmp_path / "s"), map_size=64 * 1024 * 1024)
    txn = env.begin(write=True)
    for n, (k, v) in enumerate(items.items(), 1):
        txn.put(k, v)
        if n % 100 == 0:  # batched commits like the export sink
            txn.commit()
            txn = env.begin(write=True)
    txn.commit()
    env.close()

    env = pylmdb.open(str(tmp_path / "s"), readonly=True, lock=False)
    with env.begin() as txn:
        for k, v in items.items():
            assert txn.get(k) == v, f"mismatch for {k!r}"
        assert txn.get(b"\xff" * 16) is None
    # and the full scan sees exactly the written set, in sorted order
    got = list(env._iter_file())
    assert {k: v for k, v in got} == items
    env.close()


def test_pylmdb_rebalance_tail_conditional_invariant(tmp_path):
    """_rebalance_tail's EXACT guarantee (its docstring): a 1-node
    trailing page is repaired only when the donor keeps >= 2 nodes after
    the steal AND the stolen pair fits one page; outside that, 1-node
    trailing pages remain — and readers tolerate them."""
    from etl_mri_scripts_spark.sources.pylmdb import (
        NODEMAX,
        USABLE,
        _node_need,
        _rebalance_tail,
    )

    need = lambda n: _node_need(8 + n)  # noqa: E731 - node size for payload n
    # 3-node donor, small nodes: steal happens
    g = [[10, 10, 10], [10]]
    _rebalance_tail(g, need)
    assert [len(x) for x in g] == [2, 2]
    # 2-node donor: steal would leave it below MINKEYS -> stays 2+1
    g = [[10, 10], [10]]
    _rebalance_tail(g, need)
    assert [len(x) for x in g] == [2, 1]
    # 3-node donor but the stolen pair would overflow a page -> stays
    # (two maximal inline nodes fill a page EXACTLY — 2*2042 == 4084 only
    # one byte past; use payload NODEMAX-8+1 to exceed the fit guard)
    big = NODEMAX - 8 + 1
    assert need(big) + need(big) > USABLE
    g = [[10, 10, big], [big]]
    _rebalance_tail(g, need)
    assert [len(x) for x in g] == [3, 1]
    # end-to-end: three maximal inline nodes pack 2+1 (two fill a page
    # exactly; the donor has only 2) and point reads still resolve
    items = [(b"k%01d" % i, b"v" * (NODEMAX - 8 - 3)) for i in range(3)]
    buf = _write_store(tmp_path / "s", items)
    counts = []
    for pg in range(2, len(buf) // 4096):
        _pgno, _pad, flags, lower, _up = struct.unpack_from("<QHHHH", buf, pg * 4096)
        if flags == 0x02:  # P_LEAF
            counts.append((lower - 16) // 2)
    assert counts == [2, 1], counts
    env = pylmdb.open(str(tmp_path / "s"), readonly=True, lock=False)
    with env.begin() as txn:
        for k, v in items:
            assert txn.get(k) == v
    env.close()


def test_pylmdb_no_single_node_trailing_pages(tmp_path):
    """Page-fill hygiene in the repairable case: when the donor keeps
    >= 2 nodes and the pair fits, no non-root page is left with 1 node.
    Pick an item size where a leaf holds an odd-making count so the
    greedy fill would strand one node on the last page, then verify the
    rebalance moved a neighbor over."""
    # ~500 B inline nodes -> 8 per leaf (8*504=4032 <= 4080); 17 items
    # would greedily pack 8+8+1
    items = [(b"k%02d" % i, b"v" * 492) for i in range(17)]
    buf = _write_store(tmp_path / "s", items)
    n_pages = len(buf) // 4096
    counts = []
    for pg in range(2, n_pages):
        _pgno, _pad, flags, lower, _up = struct.unpack_from("<QHHHH", buf, pg * 4096)
        if flags == 0x02:  # P_LEAF
            counts.append((lower - 16) // 2)
    assert sum(counts) == 17 and min(counts) >= 2, counts
    env = pylmdb.open(str(tmp_path / "s"), readonly=True, lock=False)
    with env.begin() as txn:
        for k, v in items:
            assert txn.get(k) == v
    env.close()


# ---------------------------------------------------------------------------
# cross-validation against the REAL liblmdb shared library (ctypes)
# ---------------------------------------------------------------------------


def _real_lmdb():
    from etl_mri_scripts_spark.sources import lmdb_ctypes

    if not lmdb_ctypes.available():
        pytest.skip("no liblmdb shared library on this host")
    return lmdb_ctypes


def _cross_items():
    items = {b"k%03d" % i: (b"v%d|" % i) * (i % 50 + 1) for i in range(300)}
    items[b"bigval"] = bytes(range(256)) * 40  # 10 KB -> overflow pages
    items[b"empty"] = b""
    items[b"K" * 511] = b"max key"
    return items


def test_real_liblmdb_reads_pylmdb_store(tmp_path):
    """THE format proof: genuine liblmdb (via ctypes, no wheel needed)
    must open a pylmdb-written store and return every value
    byte-identical — inline nodes, overflow pages, empty values,
    max-size keys, multi-leaf tree."""
    lmdb_ctypes = _real_lmdb()
    items = _cross_items()
    env = pylmdb.open(str(tmp_path / "s"))
    with env.begin(write=True) as txn:
        for k, v in items.items():
            txn.put(k, v)
    env.close()
    renv = lmdb_ctypes.open(str(tmp_path / "s"), readonly=True, lock=False)
    with renv.begin() as txn:
        for k, v in items.items():
            assert txn.get(k) == v, f"real liblmdb mismatch for {k!r}"
        assert txn.get(b"absent") is None
    renv.close()


def test_pylmdb_reads_real_liblmdb_store(tmp_path):
    """And the other direction: pylmdb's reader walks a store written by
    genuine liblmdb (COW page layout, populated free-list db, real split
    decisions) and returns every value byte-identical."""
    lmdb_ctypes = _real_lmdb()
    items = _cross_items()
    wenv = lmdb_ctypes.open(str(tmp_path / "s"), map_size=64 * 1024 * 1024)
    txn = wenv.begin(write=True)
    for n, (k, v) in enumerate(items.items(), 1):
        txn.put(k, v)
        if n % 100 == 0:  # several commits -> real COW churn
            txn.commit()
            txn = wenv.begin(write=True)
    txn.commit()
    wenv.close()
    penv = pylmdb.open(str(tmp_path / "s"), readonly=True, lock=False)
    with penv.begin() as txn:
        for k, v in items.items():
            assert txn.get(k) == v, f"pylmdb mismatch reading real store for {k!r}"
        assert txn.get(b"absent") is None
    penv.close()


def test_real_liblmdb_close_aborts_live_txn(tmp_path):
    """Closing an env with an unfinished write txn is undefined behavior
    in liblmdb; Environment.close() must abort outstanding transactions
    first so a caller that lets a txn error escape doesn't inherit the
    UB. The aborted entries must NOT be visible afterwards."""
    lmdb_ctypes = _real_lmdb()
    env = lmdb_ctypes.open(str(tmp_path / "s"), map_size=16 * 1024 * 1024)
    with env.begin(write=True) as txn:
        txn.put(b"committed", b"1")
    live = env.begin(write=True)
    live.put(b"uncommitted", b"2")
    env.close()  # must abort `live`, not crash / corrupt
    assert live._done
    renv = lmdb_ctypes.open(str(tmp_path / "s"), readonly=True, lock=False)
    with renv.begin() as txn:
        assert txn.get(b"committed") == b"1"
        assert txn.get(b"uncommitted") is None
    renv.close()


def test_real_liblmdb_reads_export_sink_store(spark, tmp_path):
    """End-to-end: a store exported by the Spark sink (which prefers the
    ctypes tier here) must point-read through genuine liblmdb."""
    from etl_mri_scripts_spark.operators.pipeline import PipelineConfig, run_pipeline
    from etl_mri_scripts_spark.sources.lmdb_export import export_kv_stores, read_store_keys
    from etl_mri_scripts_spark.sources.volumes import synthetic_volumes
    from pyspark.sql import functions as F

    lmdb_ctypes = _real_lmdb()
    cfg = PipelineConfig(crop_hr=16, step_hr=8, scales=(2,))
    vols = synthetic_volumes(spark, 1, (24, 24, 4), seed=3)
    patches = run_pipeline(spark, vols, cfg)
    out = str(tmp_path / "stores")
    paths = export_kv_stores(patches, out)
    assert paths
    p = paths[0]
    res, split = os.path.basename(p).split("_", 1)
    keys = read_store_keys(p, limit=3)
    want = {
        r["key"]: bytes(r["value"])
        for r in patches.filter(
            (F.col("resolution") == res) & (F.col("split") == split) & F.col("key").isin(keys)
        ).select("key", "value").collect()
    }
    env = lmdb_ctypes.open(p, readonly=True, lock=False)
    with env.begin() as txn:
        for k in keys:
            assert txn.get(k.encode("ascii")) == want[k]
    env.close()


# ---------------------------------------------------------------------------
# transformWithStateInPandas through a host-provided protobuf runtime
# ---------------------------------------------------------------------------


def test_transform_with_state_via_host_protobuf(tmp_path):
    """Run the real transformWithStateInPandas path (typed-state API,
    protobuf state protocol) in a subprocess whose PYTHONPATH carries a
    host-provided protobuf runtime; parity target is the batch
    aggregate. Shared harness: tests/tws_harness.py (the in-suite twin
    in test_streaming.py falls back to the same harness when protobuf
    is not importable in-process)."""
    from tests.tws_harness import run_tws_parity_subprocess

    run_tws_parity_subprocess(tmp_path)


def test_pylmdb_inline_overflow_threshold_matches_real_liblmdb(tmp_path):
    """Pin the inline/F_BIGDATA boundary to the REAL library's behavior:
    liblmdb 0.9.31 inlines a node iff 8 + ksize + dsize <= 2038
    (me_nodemax subtracts sizeof(indx_t) after the & -2 — verified
    empirically: total 2038 inline, 2039 spills). pylmdb must make the
    identical decision at every boundary total, and genuine liblmdb
    must read the boundary stores byte-exactly."""
    lmdb_ctypes = _real_lmdb()
    for total, want_big in [(2037, 0), (2038, 0), (2039, 1), (2040, 1)]:
        vlen = total - 8 - 3
        p = str(tmp_path / f"s{total}")
        buf = _write_store(p, [(b"key", b"v" * vlen)])
        base = 2 * 4096
        (ptr,) = struct.unpack_from("<H", buf, base + 16)
        _lo, _hi, nflags, _ks = struct.unpack_from("<HHHH", buf, base + ptr)
        assert nflags == want_big, f"total={total}: pylmdb flags {nflags} != {want_big}"
        env = lmdb_ctypes.open(p, readonly=True, lock=False)
        with env.begin() as txn:
            assert txn.get(b"key") == b"v" * vlen
        env.close()


def test_assign_split_full_train_ratio(spark):
    """r5 review: the lexicographic hex threshold broke at a cumulative
    ratio of 1.0 ('10000' is five chars, so 'ffff' < '10000' is False
    and ~94% of rows leaked past a 100% bucket). The numeric compare
    must route EVERY row to train for (1.0, 0.0, 0.0) and keep the
    historical routing for fractional ratios."""
    from etl_mri_scripts_spark.operators.pipeline import PipelineConfig, assign_split
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(f"vol{i:03d}",) for i in range(500)], "base string"
    )
    all_train = assign_split(df, PipelineConfig(split_ratios=(1.0, 0.0, 0.0)))
    assert all_train.filter(F.col("split") != "train").count() == 0
    tv = assign_split(df, PipelineConfig(split_ratios=(0.5, 0.5, 0.0)))
    assert tv.filter(F.col("split") == "test").count() == 0
    # fractional routing unchanged vs the historical hex compare
    cfg = PipelineConfig()  # default ratios
    tr, va, _ = cfg.split_ratios
    t1, t2 = format(int(tr * 65536), "04x"), format(int((tr + va) * 65536), "04x")
    hx = F.substring(F.md5(F.col("base").cast("string").cast("binary")), 1, 4)
    legacy = df.withColumn(
        "legacy", F.when(hx < t1, "train").when(hx < t2, "val").otherwise("test")
    )
    joined = assign_split(df, cfg).join(legacy, "base")
    assert joined.filter(F.col("split") != F.col("legacy")).count() == 0


# ---------------------------------------------------------------------------
# review-pass regression pins (sources/functions/cli batch)
# ---------------------------------------------------------------------------


def test_parse_field_target_udf_propagates_null(spark):
    from etl_mri_scripts_spark.functions.registry import register_all

    register_all(spark)
    rows = spark.sql(
        "SELECT parse_field_target(f) AS b0 FROM VALUES ('3t'), (NULL), ('1.5T') AS t(f)"
    ).collect()
    assert [r["b0"] for r in rows] == [3.0, None, 1.5]


def test_encode_nifti1_big_endian_array_roundtrips():
    import numpy as np

    from etl_mri_scripts_spark.sources.codecs import decode_nifti1, encode_nifti1

    vol = np.arange(24, dtype=">i2").reshape(2, 3, 4)
    out, _ = decode_nifti1(encode_nifti1(vol, (1.0, 1.0, 1.0)))
    assert out.ravel().tolist() == list(range(24))


def test_decode_nifti1_refuses_4d():
    import struct

    import numpy as np

    from etl_mri_scripts_spark.sources.codecs import decode_nifti1, encode_nifti1

    vol = np.zeros((2, 3, 4), dtype=np.float32)
    body = bytearray(encode_nifti1(vol, (1.0, 1.0, 1.0), gzipped=False))
    # rewrite dim[] to declare a 4-D series with 5 timepoints
    struct.pack_into("<8h", body, 40, 4, 2, 3, 4, 5, 1, 1, 1)
    with pytest.raises(ValueError, match="3-D volumes only"):
        decode_nifti1(bytes(body))


def test_resize_images_preserves_uint8_and_mime(spark, tmp_path):
    import numpy as np

    from etl_mri_scripts_spark.sources.codecs import encode_png
    from etl_mri_scripts_spark.sources.multimodal import (
        codec_decode,
        resize_images,
        scan_png_tree,
    )

    img = (np.arange(32 * 32, dtype=np.uint32).reshape(32, 32) % 256).astype("uint8")
    d = tmp_path / "tree" / "train"
    d.mkdir(parents=True)
    (d / "0001.png").write_bytes(encode_png(img))
    d2 = tmp_path / "tree" / "val"
    d2.mkdir(parents=True)
    (d2 / "0001.png").write_bytes(encode_png(img[::-1].copy()))

    media = scan_png_tree(spark, str(tmp_path / "tree"))
    rows = media.collect()
    # full-path ids: same basename in different dirs must not collide
    assert len({r["media_id"] for r in rows}) == 2
    out = resize_images(media, 16, 16).collect()
    for r in out:
        assert r["mime"] == "image/x-npy"
        arr = codec_decode(bytes(r["payload"]), r["mime"])
        assert arr.dtype == np.uint8 and arr.shape[:2] == (16, 16)
