"""Approximate aggregates (the 100 TB cardinality/quantile toolkit): HLL
count-distinct and approximate percentiles, checked against exact values
within documented error bounds — no cross-engine oracle exists for sketch
internals, so the contract is the error bound itself."""

from pyspark.sql import functions as F


def test_approx_count_distinct_error(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    rel_err = abs(row.approx - row.exact) / row.exact
    assert rel_err < 0.06, (row.exact, row.approx)


def test_approx_percentile_close_to_exact(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    row = li.agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx"
        ),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.01


def test_approx_quantiles_multi(spark):
    ev = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    qs = ev.stat.approxQuantile("o_totalprice", [0.25, 0.5, 0.75], 0.01)
    assert qs == sorted(qs) and len(qs) == 3
    exact_mid = ev.agg(
        F.percentile("o_totalprice", F.lit(0.5))
    ).collect()[0][0]
    assert abs(qs[1] - exact_mid) / exact_mid < 0.05
