"""Pin the testdata loader to the actual on-disk parquet.

The driver can regenerate /root/testdata between commits (round 3 lost 10
queries when events.ts silently changed from TIMESTAMP(NANOS) to
TIMESTAMP(MICROS)). These tests fail loudly in pytest the next time the
physical schema drifts, instead of failing in the driver's correctness gate.
"""

import os

import pytest
from pyspark.sql import types as T

from collection_templates_spark.sources.testdata import TABLES, load_table

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.mark.parametrize("name", TABLES)
def test_every_table_loads_one_row(spark, name):
    df = load_table(spark, name, SF_DIR)
    assert df.limit(1).count() == 1, f"{name} is empty or unreadable"


def test_events_ts_is_timestamp(spark):
    # The downstream contract: every events query (unix_micros, range
    # windows, session gaps) was validated against TimestampType. The
    # loader must normalize whatever the driver generated to that.
    df = load_table(spark, "events", SF_DIR)
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
        f"events.ts loaded as {df.schema['ts'].dataType}; "
        "load_table must normalize to TimestampType"
    )
    # and the values must be sane (not 1970-epoch garbage from a bad cast)
    row = df.selectExpr("min(year(ts)) AS y").first()
    assert row.y is not None and row.y >= 2000


def test_events_ts_value_matches_duckdb(spark):
    """Loader output must agree with DuckDB's naive read of the same file.

    This is the exact comparison the driver's oracle gate performs; checking
    one value end-to-end here catches tz/unit mistakes in the workaround.
    """
    duckdb = pytest.importorskip("duckdb")
    path = os.path.join(SF_DIR, "events.parquet")
    want = duckdb.sql(
        f"SELECT CAST(min(ts) AS VARCHAR) FROM read_parquet('{path}')"
    ).fetchone()[0]
    got = (
        load_table(spark, "events", SF_DIR)
        .selectExpr("CAST(min(ts) AS STRING)")
        .first()[0]
    )
    # DuckDB prints micros only when non-zero; compare on common prefix
    assert got.rstrip("0").rstrip(".") == want.rstrip("0").rstrip("."), (
        f"spark={got!r} duckdb={want!r}"
    )


def test_load_table_memo_hits_and_invalidates(spark, tmp_path):
    """The DataFrame-handle memo returns the same unresolved plan for an
    unchanged source, and misses when the file content fingerprint
    (size/mtime) changes — the driver regenerates /root/testdata
    mid-round, so a stale handle would read the old layout."""
    import shutil

    from collection_templates_spark.sources.testdata import _DF_MEMO

    src = os.path.join(SF_DIR, "region.parquet")
    work = tmp_path / "sfX"
    work.mkdir()
    shutil.copy(src, work / "region.parquet")

    a = load_table(spark, "region", str(work))
    b = load_table(spark, "region", str(work))
    assert a is b  # warm hit: same handle, zero re-resolution

    # regenerate: same bytes, fresh mtime -> fingerprint miss
    os.utime(work / "region.parquet")
    c = load_table(spark, "region", str(work))
    assert c is not a
    assert c.count() == a.count()
    # and the memo holds both generations under distinct keys
    keys = [k for k in _DF_MEMO if k[1].startswith(str(work))]
    assert len(keys) == 2
