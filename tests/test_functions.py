"""SQL-registered function surface (§2.13): registration, SQL-text calls,
agreement with the Catalyst builders / plain-Python helpers."""

from __future__ import annotations

import numpy as np
import pytest

from etl_mri_scripts_spark.functions import register_all


def test_register_and_call_from_sql_text(spark):
    names = register_all(spark)
    assert set(names) == {
        "snr_target_from_field",
        "parse_field_target",
        "normalize_key",
        "p98",
        "chunk_text",
        "pii_scrub",
        "jaccard",
        "morton2",
    }
    row = spark.sql(
        "SELECT normalize_key('vol001__axial__slice_003__HR_s007') AS nk,"
        "       parse_field_target('1,5T') AS tesla,"
        "       round(snr_target_from_field(3.0D, 2.0D), 4) AS snr"
    ).first()
    assert row["nk"] == "vol001__axial__slice_003__s007"
    assert row["tesla"] == 1.5
    assert abs(row["snr"] - 153.03 * (3.0 / 7.0) * 4.0) < 1e-3  # 4-dp SQL round


def test_normalize_key_udf_matches_catalyst_builder(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_mri_scripts_spark.operators.patches import normalize_key_col
    from etl_mri_scripts_spark.tables import table

    register_all(spark)
    li = table(spark, sf_dir, "lineitem").limit(500)
    keyed = li.select(
        F.format_string(
            "vol%03d__axial__slice_%03d__LRx2_s%03d",
            (F.col("l_orderkey") % 100).cast("int"),
            F.col("l_linenumber"),
            (F.col("l_partkey") % 50).cast("int"),
        ).alias("key")
    )
    both = keyed.select(
        normalize_key_col(F.col("key")).alias("builder"),
        F.expr("normalize_key(key)").alias("udf"),
    )
    assert both.filter(F.col("builder") != F.col("udf")).count() == 0


def test_p98_udaf_groupby_matches_numpy(spark, sf_dir):
    from pyspark.sql import functions as F

    from etl_mri_scripts_spark.tables import table

    register_all(spark)
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_fn")
    got = {
        r["l_returnflag"]: r["p"]
        for r in spark.sql(
            "SELECT l_returnflag, p98(l_extendedprice) AS p FROM li_fn GROUP BY 1"
        ).collect()
    }
    pdf = li.select("l_returnflag", "l_extendedprice").toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        want = float(np.percentile(grp["l_extendedprice"].to_numpy(), 98))
        assert abs(got[flag] - want) < 1e-6


def test_chunk_text_udtf_matches_catalyst_query(spark, sf_dir):
    # The SQL-lateral UDTF must reproduce the zero-Python Catalyst chunker
    # exactly (grid starts, trailing-edge rule, md5 payload digests).
    from etl_mri_scripts_spark.queries import QUERIES
    from etl_mri_scripts_spark.tables import table

    register_all(spark)
    table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    got = {
        (r["doc_id"], r["chunk_start"], r["chunk_len"], r["chunk_md5"])
        for r in spark.sql(
            "SELECT d.doc_id, c.chunk_start, c.chunk_len, c.chunk_md5 "
            "FROM docs_udtf d, LATERAL chunk_text(d.text) c"
        ).collect()
    }
    expected = {
        (r["doc_id"], r["chunk_start"], r["chunk_len"], r["chunk_md5"])
        for r in QUERIES["text_chunk_overlapping"](spark, sf_dir).collect()
    }
    assert got == expected and len(expected) > 0


def test_sql_macro_pii_scrub_matches_query_semantics(spark):
    from etl_mri_scripts_spark.functions.registry import register_all

    register_all(spark)
    got = spark.sql(
        "SELECT pii_scrub('mail a.b@c.org ip 10.0.0.1 tel 555-123-4567 end') AS r"
    ).first()["r"]
    assert got == "mail [EMAIL] ip [IP] tel [PHONE] end"


def test_sql_macro_jaccard(spark):
    from etl_mri_scripts_spark.functions.registry import register_all

    register_all(spark)
    got = spark.sql(
        "SELECT jaccard(array('a','b','c'), array('b','c','d')) AS j"
    ).first()["j"]
    assert got == pytest.approx(2 / 4)


def test_sql_macro_morton2_matches_layout_interleave(spark):
    from pyspark.sql import functions as F

    from etl_mri_scripts_spark.functions.registry import register_all
    from etl_mri_scripts_spark.operators.layout import _interleave

    register_all(spark)
    df = spark.createDataFrame([(3, 1), (7, 5), (0, 0), (1048575, 524287)], "x long, y long")
    rows = df.select(
        F.expr("morton2(x, y)").alias("sql_z"),
        _interleave([F.col("x"), F.col("y")], bits=21).alias("py_z"),
    ).collect()
    for r in rows:
        assert r["sql_z"] == r["py_z"]


def test_sql_macros_stay_codegen(spark):
    # the macro body must inline as Catalyst expressions — no BatchEvalPython
    # or ArrowEvalPython stage may appear in the plan
    from etl_mri_scripts_spark.functions.registry import register_all

    register_all(spark)
    plan = (
        spark.sql("SELECT pii_scrub(text) AS t FROM VALUES ('x') AS v(text)")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
