"""Round-7 additions:

- pylmdb WAL durability (verdict demand #6): commit() is crash-recoverable
  (fsync'd CRC-framed sidecar log, replayed on the next write-open), torn
  tails truncate at the first bad frame, close() is atomic (tmp +
  os.replace) so a crash DURING close also loses nothing, and the final
  store bytes are identical to the pre-WAL builder's.
- bench positional normalization (verdict demand #5): interpolated
  per-position factors and the statistic-matched pin math.

No Spark session needed — pure-Python format/stat work.
"""

from __future__ import annotations

import os

import pytest

from etl_mri_scripts_spark.sources import pylmdb


def _fill(env, items, batch=50):
    txn = env.begin(write=True)
    for n, (k, v) in enumerate(items, 1):
        txn.put(k, v)
        if n % batch == 0:
            txn.commit()
            txn = env.begin(write=True)
    txn.commit()


def test_pylmdb_commit_survives_crash_before_close(tmp_path):
    """THE demand: committed puts must be recoverable if the process dies
    between commit() and close(). Simulated crash = drop the env without
    calling close(); a fresh write-open must replay the WAL and close()
    must produce a complete store."""
    items = {b"%04d" % i: bytes([i % 251]) * (i * 7 % 3000) for i in range(200)}
    env = pylmdb.open(str(tmp_path / "s"), map_size=32 * 1024 * 1024)
    _fill(env, sorted(items.items()))
    # crash: no close(). The WAL holds every committed entry, fsync'd.
    wal = env.walfile
    assert os.path.exists(wal) and os.path.getsize(wal) > 0
    assert not os.path.exists(env.datafile)  # tree never written
    del env

    env2 = pylmdb.open(str(tmp_path / "s"), map_size=32 * 1024 * 1024)
    with env2.begin() as txn:  # recovered entries readable pre-close
        assert txn.get(b"0123") == items[b"0123"]
    env2.close()
    assert not os.path.exists(wal)  # clean close retires the WAL

    env3 = pylmdb.open(str(tmp_path / "s"), readonly=True, lock=False)
    with env3.begin() as txn:
        for k, v in items.items():
            assert txn.get(k) == v
    env3.close()


def test_pylmdb_uncommitted_puts_are_not_recovered(tmp_path):
    """Only commit() promises durability: staged-but-uncommitted puts die
    with the crash (same contract as real lmdb)."""
    env = pylmdb.open(str(tmp_path / "s"))
    txn = env.begin(write=True)
    txn.put(b"committed", b"yes")
    txn.commit()
    txn2 = env.begin(write=True)
    txn2.put(b"staged", b"lost")
    del txn2, env  # crash

    env2 = pylmdb.open(str(tmp_path / "s"))
    env2.close()
    env3 = pylmdb.open(str(tmp_path / "s"), readonly=True, lock=False)
    with env3.begin() as txn:
        assert txn.get(b"committed") == b"yes"
        assert txn.get(b"staged") is None
    env3.close()


def test_pylmdb_torn_wal_tail_truncates_to_last_good_frame(tmp_path):
    """A crash mid-append leaves a partial final frame; replay must keep
    every intact frame and drop only the torn tail."""
    env = pylmdb.open(str(tmp_path / "s"))
    txn = env.begin(write=True)
    txn.put(b"k1", b"v1")
    txn.commit()
    txn = env.begin(write=True)
    txn.put(b"k2", b"v2")
    txn.commit()
    wal = env.walfile
    del env  # crash before close
    # tear the tail: chop 3 bytes off the last frame
    size = os.path.getsize(wal)
    with open(wal, "r+b") as f:
        f.truncate(size - 3)

    env2 = pylmdb.open(str(tmp_path / "s"))
    with env2.begin() as txn:
        assert txn.get(b"k1") == b"v1"
        assert txn.get(b"k2") is None  # torn frame dropped
    env2.close()


def test_pylmdb_corrupt_wal_frame_stops_replay(tmp_path):
    """A bit-flipped value must fail the frame CRC; replay stops there."""
    env = pylmdb.open(str(tmp_path / "s"))
    txn = env.begin(write=True)
    txn.put(b"aa", b"AAAA")
    txn.commit()
    txn = env.begin(write=True)
    txn.put(b"bb", b"BBBB")
    txn.commit()
    wal = env.walfile
    del env
    with open(wal, "r+b") as f:
        data = bytearray(f.read())
        # flip a byte inside the FIRST frame's value ("AAAA")
        idx = data.index(b"AAAA")
        data[idx] ^= 0xFF
        f.seek(0)
        f.write(data)

    env2 = pylmdb.open(str(tmp_path / "s"))
    with env2.begin() as txn:
        assert txn.get(b"aa") is None  # corrupt frame rejected
        assert txn.get(b"bb") is None  # and everything after it
    env2.close()
    # zero frames survived (empty replay index, _dirty False) — the clean
    # close must STILL retire the truncated WAL, or it reads as false
    # crash evidence forever (r7 review)
    assert not os.path.exists(wal)


def test_pylmdb_replay_rejects_oversize_klen_header(tmp_path):
    """A corrupt header whose klen ~ file size must be rejected before
    read(klen) can allocate a giant fake key (r7 review)."""
    env = pylmdb.open(str(tmp_path / "s"))
    txn = env.begin(write=True)
    txn.put(b"good", b"value")
    txn.commit()
    wal = env.walfile
    del env
    with open(wal, "ab") as f:  # append a frame claiming a 1 GB key
        f.write(pylmdb._WALHDR.pack(1 << 30, 4) + b"junk")
    env2 = pylmdb.open(str(tmp_path / "s"))
    with env2.begin() as txn:
        assert txn.get(b"good") == b"value"  # intact frames kept
    env2.close()


def test_pylmdb_crash_during_close_keeps_old_store_and_wal(tmp_path):
    """close() builds into data.mdb.tmp and os.replace()s — a crash
    mid-build (simulated by the tmp file simply existing unreplaced)
    leaves the previous store AND the WAL intact, so recovery re-runs."""
    env = pylmdb.open(str(tmp_path / "s"))
    txn = env.begin(write=True)
    txn.put(b"old", b"1")
    txn.commit()
    env.close()

    env = pylmdb.open(str(tmp_path / "s"))
    txn = env.begin(write=True)
    txn.put(b"new", b"2")
    txn.commit()
    wal = env.walfile
    # crash during close: the merge died before os.replace — the real
    # datafile and WAL are untouched (the tmp write is all close() did)
    with open(env.datafile + ".tmp", "wb") as f:
        f.write(b"\x00" * 8192)
    del env

    assert os.path.exists(wal)
    env2 = pylmdb.open(str(tmp_path / "s"))
    env2.close()
    env3 = pylmdb.open(str(tmp_path / "s"), readonly=True, lock=False)
    with env3.begin() as txn:
        assert txn.get(b"old") == b"1" and txn.get(b"new") == b"2"
    env3.close()


def test_pylmdb_wal_memory_is_index_only(tmp_path):
    """Committed VALUES must not be resident: the env holds a (offset,
    length) index, and gets read back from the WAL file."""
    env = pylmdb.open(str(tmp_path / "s"))
    big = os.urandom(1 << 20)
    txn = env.begin(write=True)
    txn.put(b"big", big)
    txn.commit()
    assert not hasattr(env, "_committed")  # the O(store) dict is gone
    off, vlen = env._index[b"big"]
    assert vlen == len(big)
    with env.begin() as txn:
        assert txn.get(b"big") == big  # served from the WAL by offset
    env.close()


def test_pylmdb_wal_store_bytes_match_direct_build(tmp_path):
    """The WAL path is an ingest detail: the final data.mdb must be
    byte-identical to building the same sorted items in one txn (the
    round-5 byte pins all go through this same builder)."""
    items = [(b"%03d" % i, bytes([i]) * (i * 13 % 5000)) for i in range(150)]
    env = pylmdb.open(str(tmp_path / "a"))
    _fill(env, items, batch=7)
    env.close()
    env = pylmdb.open(str(tmp_path / "b"))
    txn = env.begin(write=True)
    for k, v in items:
        txn.put(k, v)
    txn.commit()
    env.close()
    a = open(str(tmp_path / "a" / "data.mdb"), "rb").read()
    b = open(str(tmp_path / "b" / "data.mdb"), "rb").read()
    assert a == b


def test_pylmdb_reopen_merge_overwrites_and_interleaves(tmp_path):
    """Close-time merge of existing store + WAL: interleaved new keys and
    overwrites of old ones, verified via a full ordered scan."""
    env = pylmdb.open(str(tmp_path / "s"))
    txn = env.begin(write=True)
    for k, v in [(b"b", b"old-b"), (b"d", b"old-d"), (b"f", b"old-f")]:
        txn.put(k, v)
    txn.commit()
    env.close()

    env = pylmdb.open(str(tmp_path / "s"))
    txn = env.begin(write=True)
    for k, v in [(b"a", b"new-a"), (b"d", b"NEW-d"), (b"g", b"new-g")]:
        txn.put(k, v)
    txn.commit()
    env.close()

    env = pylmdb.open(str(tmp_path / "s"), readonly=True, lock=False)
    got = list(env._iter_file())
    assert got == [
        (b"a", b"new-a"), (b"b", b"old-b"), (b"d", b"NEW-d"),
        (b"f", b"old-f"), (b"g", b"new-g"),
    ]
    env.close()


def test_pylmdb_iter_file_is_ascending(tmp_path):
    """_iter_file must walk the tree in key order (the merge depends on
    it) — exercised on a multi-level tree."""
    items = [(b"%05d" % i, b"x" * 120) for i in range(2000)]
    env = pylmdb.open(str(tmp_path / "s"), map_size=64 * 1024 * 1024)
    txn = env.begin(write=True)
    for k, v in items:
        txn.put(k, v)
    txn.commit()
    env.close()
    env = pylmdb.open(str(tmp_path / "s"), readonly=True, lock=False)
    keys = [k for k, _v in env._iter_file()]
    assert keys == sorted(keys) and len(keys) == 2000
    env.close()


# --------------------------- imaging drift gate ----------------------------


def test_imaging_drift_gate_math(tmp_path):
    import bench_imaging as bi

    pin_dir = str(tmp_path)  # scoped via the gate's own parameter — no
    # global os.path monkeypatching (process-wide dirname patching broke
    # any mid-test path resolution, r7 review)
    (tmp_path / bi.PIN_FILES["skew"]).write_text(
        '{"patches_per_sec": 300.0, "payload_mb_per_sec": 9.0}'
    )
    ok = bi._drift_gate(
        "skew", {"patches_per_sec": 200.0, "payload_mb_per_sec": 6.0}, pin_dir
    )
    assert ok["ok"] and ok["ratio_pin_over_observed"] == {
        "patches_per_sec": 1.5, "payload_mb_per_sec": 1.5,
    }
    # 2x+ regression on either rate fails the gate
    bad = bi._drift_gate(
        "skew", {"patches_per_sec": 140.0, "payload_mb_per_sec": 6.0}, pin_dir
    )
    assert bad["ok"] is False
    # missing pin bootstraps (indeterminate), never a regression verdict
    none = bi._drift_gate(
        "uniform", {"patches_per_sec": 1.0, "payload_mb_per_sec": 1.0}, pin_dir
    )
    assert none["pinned"] is None and none["ok"] is None
    # pin present but without comparable rates: also indeterminate
    (tmp_path / bi.PIN_FILES["uniform"]).write_text('{"slices_per_sec": 5.0}')
    empty = bi._drift_gate(
        "uniform", {"patches_per_sec": 1.0, "payload_mb_per_sec": 1.0}, pin_dir
    )
    assert empty["ok"] is None and "no comparable" in empty["note"]


# --------------------------- bench positional ------------------------------


def test_positional_factors_interpolate_piecewise():
    import bench

    est = bench.positional_factors([1.0, 0.5, 0.7], 10)
    assert est is not None and len(est) == 10
    assert est[0] == 1.0 and est[5] == 0.5  # mid = 10//2
    assert est[1] == pytest.approx(0.9)  # linear toward the mid probe
    assert est[9] == pytest.approx(0.5 + 0.2 * 4 / 5)
    assert bench.positional_factors([1.0, None, 0.7], 10) is None


def test_positional_normalize_matches_hand_math():
    import bench

    order = ["q0", "q1", "q2", "q3"]
    times = {"q0": 2.0, "q2": 1.0}  # q1/q3 errored -> skipped
    probes = [1.0, 0.5, 0.5]
    pin = 0.5
    # factors: pos0 -> 1.0/0.5=2.0; pos2 -> interp(2)=0.5 -> 1.0
    got = bench.positional_normalize(times, order, probes, pin)
    assert got == pytest.approx(2.0 / 2.0 + 1.0 / 1.0)
