"""Bucketed co-located joins: the join of two same-bucketed tables must
compile WITHOUT a shuffle (no Exchange in the physical plan)."""

import contextlib
import io

from pyspark.sql import functions as F

from collection_templates_spark.operators.bucketing import (
    read_bucketed,
    save_bucketed,
)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    save_bucketed(li, "b_lineitem", "l_orderkey", 8, str(tmp_path / "li"))
    save_bucketed(o, "b_orders", "l_orderkey", 8, str(tmp_path / "o"))

    # at test scale the planner prefers broadcast (which needs no shuffle
    # either); force the sort-merge path to show bucket co-location — at
    # 100 TB neither side broadcasts and this IS the plan that matters
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, "b_lineitem").join(
            read_bucketed(spark, "b_orders"), "l_orderkey"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle
        # and the result is still correct
        n = joined.count()
        plain = li.join(o, "l_orderkey").count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
