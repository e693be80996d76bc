"""LMDB export sink (SURVEY.md §2.2 K3-K6) + sidecar metadata (K8).

Parquet partitioned by (resolution, split) is the system of record — it
writes in parallel from every executor. LMDB is inherently single-writer
(the reference funnels ALL patch bytes through one driver process,
v2/nii_to_lmdb_paralel.py:298-305 — its scalability ceiling), so the LMDB
form is an EXPORT job: one store per (resolution, split), each written by
exactly one task via foreachPartition after a repartition(1) per store.

The lmdb package is absent in this environment: the writer is gated behind
an import-try; everything around it (store routing, batched commits,
sidecar meta_info.txt lines, key sorting) is real and tested via the
pure-Python directory writer fallback.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COMMIT_BATCH = 5000  # records per transaction (ref: lmdb_util.py:126-128)


def meta_line_col() -> "F.Column":
    """`{key}.npy (h,w,c) dtype` sidecar format (ref: v2/lmdb_npy.py:48)."""
    return F.format_string(
        "%s.npy (%d,%d,%d) %s", F.col("key"), F.col("h"), F.col("w"), F.col("c"), F.col("dtype")
    )


def _write_store_partition(rows, store_dir: str, map_size_gb: float) -> None:
    """Single-writer store build with batched commits. LMDB when available,
    else a flat key-file directory with identical contract (sorted keys,
    meta_info.txt sidecar)."""
    os.makedirs(store_dir, exist_ok=True)
    buf = sorted(
        ((r["key"], bytes(r["value"]), r["meta_line"]) for r in rows), key=lambda t: t[0]
    )
    meta_path = os.path.join(store_dir, "meta_info.txt")
    # Writer preference: the lmdb wheel; else the system liblmdb shared
    # library via ctypes (sources/lmdb_ctypes.py — genuine liblmdb code,
    # just without the wheel); else the pure-Python writer of the same
    # on-disk format (sources/pylmdb.py). All three produce real
    # data.mdb bytes; the directory-KV layout is the last resort.
    # Tier caveat (narrowed in r7): the pure-Python pylmdb tier now
    # fsyncs every Transaction.commit() to a CRC-framed sidecar WAL and
    # replays it on the next open, so committed puts survive a crash
    # before close(); writer memory is O(commit batch) + a key index,
    # and the close-time rebuild streams (old store mmap + WAL merge ->
    # tmp file -> atomic replace). The remaining difference from the
    # wheel/ctypes tiers: the lmdb-FORMAT B-tree itself is still written
    # whole at close, so a reader of the store mid-write sees the
    # previous close's tree, not per-commit snapshots.
    lmdb = None
    try:
        import lmdb
    except ImportError:
        try:
            from . import lmdb_ctypes

            if lmdb_ctypes.available():
                lmdb = lmdb_ctypes
        except Exception:  # noqa: BLE001 - any ctypes failure -> next tier
            pass
        if lmdb is None:
            try:
                from . import pylmdb as lmdb
            except ImportError:
                lmdb = None
    if lmdb is not None:
        env = lmdb.open(store_dir, map_size=int(map_size_gb * 1024**3))
        txn = env.begin(write=True)
        try:
            for n, (key, value, _m) in enumerate(buf, 1):
                txn.put(key.encode("ascii"), value)
                if n % COMMIT_BATCH == 0:
                    txn.commit()
                    txn = env.begin(write=True)
            txn.commit()
        except BaseException:
            # liblmdb forbids closing an environment with a live write
            # txn; abort it before the close below re-raises the error
            abort = getattr(txn, "abort", None)
            if abort is not None:
                abort()
            raise
        finally:
            env.close()
    else:
        data_dir = os.path.join(store_dir, "data")
        os.makedirs(data_dir, exist_ok=True)
        for key, value, _m in buf:
            with open(os.path.join(data_dir, key), "wb") as f:
                f.write(value)
    with open(meta_path, "w") as f:
        for _key, _value, m in buf:
            f.write(m + "\n")


def export_kv_stores(patches: DataFrame, out_root: str, map_size_gb: float = 8.0) -> list[str]:
    """One store per (resolution, split): `{out_root}/{resolution}_{split}`.

    Each store's rows are routed to a single partition (the LMDB constraint)
    but DIFFERENT stores build concurrently — same layout as the
    reference's writers dict, parallel across stores instead of serial.
    """
    stores = [
        (r["resolution"], r["split"])
        for r in patches.select("resolution", "split").distinct().collect()
    ]
    df = patches.select("resolution", "split", "key", "value", meta_line_col().alias("meta_line"))
    paths = []
    for resolution, split in sorted(stores):
        store_dir = os.path.join(out_root, f"{resolution}_{split}")
        part = (
            df.filter((F.col("resolution") == resolution) & (F.col("split") == split))
            .select("key", "value", "meta_line")
            .repartition(1)
        )
        part.foreachPartition(
            lambda rows, d=store_dir: _write_store_partition(rows, d, map_size_gb)
        )
        paths.append(store_dir)
    return paths


def read_store_keys(store_dir: str, limit: int | None = None, regex: str | None = None) -> list[str]:
    """S8/S9 reader analog: key scan with optional regex + limit over the
    sidecar (works for both LMDB and fallback stores — meta_info.txt is the
    contract)."""
    import re as _re

    keys = []
    with open(os.path.join(store_dir, "meta_info.txt")) as f:
        for line in f:
            key = line.split(".npy ")[0]
            if regex and not _re.search(regex, key):
                continue
            keys.append(key)
            if limit and len(keys) >= limit:
                break
    return keys
