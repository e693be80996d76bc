"""Z-order write clustering: correctness of the Morton key + a measured
row-group pruning win over naive layout, judged by the same footer min/max
stats a real scan uses."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_mri_scripts_spark.operators.layout import (
    _interleave,
    row_groups_matching,
    zorder_sorted,
)
from etl_mri_scripts_spark.tables import table


def test_interleave_known_values(spark):
    # dims (x=0b11, y=0b01) at 2 bits -> bits of x at even positions,
    # y at odd: z = x0 + y0<<1 + x1<<2 + y1<<3 = 1 + 2 + 4 + 0 = 7
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    z = df.select(
        _interleave([F.col("x"), F.col("y")], bits=2).alias("z")
    ).first()["z"]
    assert z == 7


def test_interleave_preserves_locality_order(spark):
    # Morton curve property: points in the same quadrant get keys closer
    # than points in opposite quadrants.
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    keyed = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", _interleave([F.col("x"), F.col("y")], bits=3).alias("z")
        ).collect()
    }
    # same quadrant (low-low) keys all below any opposite-quadrant (high-high)
    low = [keyed[(x, y)] for x in range(4) for y in range(4)]
    high = [keyed[(x, y)] for x in range(4, 8) for y in range(4, 8)]
    assert max(low) < min(high)


@pytest.mark.parametrize("dims", [["l_partkey", "l_suppkey"]])
def test_zorder_write_prunes_2d_box_better_than_linear(spark, sf_dir, tmp_path, dims):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", *dims)
    # small row groups so sf0.001 still yields many pruning units
    opts = {"parquet.block.size": str(16 * 1024)}

    naive_dir = str(tmp_path / "naive")
    z_dir = str(tmp_path / "zorder")
    w = li.repartition(1)  # single file isolates layout effect
    w.write.options(**opts).mode("overwrite").parquet(naive_dir)
    zorder_sorted(w, dims).write.options(**opts).mode("overwrite").parquet(z_dir)

    # 2D box predicate: a ~1/16 area box in (partkey, suppkey) space
    stats = li.agg(
        F.max(dims[0]).alias("p"), F.max(dims[1]).alias("s")
    ).first()
    box = {
        dims[0]: (0, stats["p"] // 4),
        dims[1]: (0, stats["s"] // 4),
    }
    naive_hit, naive_total = row_groups_matching(naive_dir, box)
    z_hit, z_total = row_groups_matching(z_dir, box)
    assert naive_total > 4 and z_total > 4, "row groups too coarse to test"
    # data volume identical; the z-ordered layout must let the same box
    # predicate skip a strictly larger fraction of row groups
    assert z_hit / z_total < naive_hit / naive_total, (
        (z_hit, z_total), (naive_hit, naive_total)
    )
    # and the clustered table still contains identical data
    assert (
        spark.read.parquet(z_dir).count() == spark.read.parquet(naive_dir).count()
    )


def test_zorder_sorted_preserves_rows_and_schema(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_suppkey")
    z = zorder_sorted(li, ["l_partkey", "l_suppkey"])
    assert z.columns == li.columns
    assert z.count() == li.count()
