"""Seeded differential fuzz in the suite: a batch of random ANSI-subset
queries must agree between Spark SQL and DuckDB (tools/fuzz_differential.py
runs bigger sweeps)."""

import random

import duckdb

from tools.fuzz_differential import (
    TABLES,
    Gen,
    norm,
    rows_match,
    window_query,
)

SF = "/root/testdata/sf0.001"


def test_differential_batch(spark):
    for t, cols in TABLES.items():
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    rng = random.Random(99)
    for i in range(15):
        if i % 3 == 2:
            q = window_query(rng)
        else:
            table = rng.choice(list(TABLES))
            q = Gen(rng, table).query(table)
        s_rows = norm([tuple(r) for r in spark.sql(q).collect()])
        d_rows = norm(con.execute(q).fetchall())
        assert rows_match(s_rows, d_rows), f"query {i} disagrees:\n{q}"
