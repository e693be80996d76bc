"""Local replica of the round driver's correctness gate.

Runs the first N registered queries (the driver window) at a given
scale-factor directory, comparing each Spark result against its DuckDB
oracle with the same strict canonicalization the driver uses
(tests/parity.py). Prints one status line per query and a JSON summary.

Usage:
    python check_window.py [--sf /root/testdata/sf0.01] [--n 50] [--all]
    python check_window.py --names q1,q2     # just these queries
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--all", action="store_true", help="check every registered query")
    ap.add_argument("--names", default="", help="comma-separated subset")
    args = ap.parse_args()

    from etl_mri_scripts_spark.queries import ORACLES, QUERIES
    from etl_mri_scripts_spark.session import get_spark
    from tests.parity import assert_frames_match

    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
        # usage errors must not masquerade as query FAILs in the summary
        unknown = [n for n in names if n not in QUERIES]
        if unknown:
            print(f"unknown --names (not in QUERIES): {unknown}", file=sys.stderr)
            return 2
    else:
        names = list(QUERIES) if args.all else list(QUERIES)[: args.n]

    spark = get_spark("check-window")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    def storage_mb() -> float:
        # Cached/checkpointed block footprint (MB) across the session —
        # rank.py localCheckpoints must be reclaimed by the
        # ContextCleaner once a query's frames are dropped, so this
        # should stay bounded over a full-registry run.
        jsc = spark.sparkContext._jsc.sc()
        return round(
            sum(i.memSize() + i.diskSize() for i in jsc.getRDDStorageInfo()) / 2**20, 1
        )

    # The imaging query shrinks the Arrow batch size at plan time (volume
    # row-size guard); arrow_batch_restore (the shared guard bench.py also
    # uses) puts the session default back once each query's action
    # completes, so the rest of the sweep never pays 16-row batches.
    from etl_mri_scripts_spark.operators.pipeline import arrow_batch_restore

    results: dict[str, dict] = {}
    n_pass = n_rows_only = n_fail = 0
    storage_high_water = 0.0
    for name in names:
        t0 = time.monotonic()
        try:
            with arrow_batch_restore(spark):
                sdf = QUERIES[name](spark, args.sf).toPandas()
            if name in ORACLES:
                odf = duck.execute(ORACLES[name]).df()
                assert_frames_match(sdf, odf, name)
                status = "pass"
                n_pass += 1
            else:
                assert len(sdf.columns) > 0
                status = f"rows_only({len(sdf)})"
                n_rows_only += 1
            err = None
        except Exception as e:  # noqa: BLE001 - report and continue
            status, err = "FAIL", f"{type(e).__name__}: {e}"
            traceback.print_exc(limit=3)
            n_fail += 1
        dt = time.monotonic() - t0
        storage_high_water = max(storage_high_water, storage_mb())
        # Query-internal persists (minhash signatures, k-means assignments,
        # rare-shingle tables, ...) are registered in the CacheManager and
        # stay pinned past the query's action — fine for one query, an
        # unbounded leak across a 200-query session. Release between
        # queries; nothing reuses caches across queries (each call builds
        # fresh plans), so this only caps the session footprint. The rank
        # machinery's localCheckpoints are NOT in the CacheManager and are
        # reclaimed by the ContextCleaner on their own.
        spark.catalog.clearCache()
        results[name] = {"status": status, "sec": round(dt, 2), "err": err}
        print(f"{status:>14}  {dt:6.2f}s  {name}", flush=True)

    # localCheckpoint blocks are reclaimed by the ContextCleaner only
    # after BOTH Python and JVM GCs drop the frame references — pure
    # timing, so an unforced storage_end reads whatever the collectors
    # happened to leave (r7: 57 MB after a fast 200-query sweep, 1.2 MB
    # after forcing GC on the same session). Force both so the end
    # figure measures LEAKS, not collector lag.
    import gc

    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(3)
    print(
        json.dumps(
            {
                "sf": args.sf,
                "checked": len(names),
                "pass": n_pass,
                "rows_only": n_rows_only,
                "fail": n_fail,
                "storage_high_water_mb": storage_high_water,
                "storage_end_mb": storage_mb(),
                "failures": {k: v["err"] for k, v in results.items() if v["err"]},
            }
        )
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
