"""Multi-dimensional data layout: Z-order (Morton) clustering for
data-skipping.

At 100 TB the cheapest query is the one that never reads the file:
parquet footers carry per-file min/max for every column, and the scan
planner prunes files whose range misses the predicate. Range-sorting by
ONE column gives perfect pruning on that column and none on any other;
interleaving the bits of several columns (the Z-order / Morton curve —
what Delta Lake's ``OPTIMIZE ZORDER BY`` and ClickHouse's
``ORDER BY mortonEncode(...)`` do) bounds the min/max RECTANGLE of every
file in all interleaved dimensions at once.

The reference engine has no layout optimizer (its outputs are one JSONL
per pipeline run); this module is part of the at-scale extension
surface. ``zorder_value`` builds the interleave as a pure column
expression (whole-stage codegen, no UDF); the production write path is
``df.repartitionByRange(N, zorder_value(...)).sortWithinPartitions(...)``
followed by a parquet write. ``zorder_layout_stats`` is the verifiable
core: it buckets rows by z-range exactly as ``repartitionByRange`` would
and surfaces each bucket's bounding rectangle — the pruning bound a
reader gets — side by side with the same stats for a single-dimension
row-order layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(x: Column, y: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a Morton code (x takes the even bit positions, y the
    odd). Pure bitwise column expression — stays in codegen; callers
    bin real-valued columns first (modulo, width-bucket, or rank)."""
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        xbit = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(xbit, 2 * i)).bitwiseOR(
            F.shiftleft(ybit, 2 * i + 1)
        )
    return z


def zorder_sql_expr(x: str, y: str, bits: int = 8) -> str:
    """The identical interleave as portable SQL (DuckDB/ANSI bit
    operators) — lets an external oracle replay :func:`zorder_value`
    bit for bit."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_layout_stats(
    df: DataFrame,
    x: Column,
    y: Column,
    n_buckets: int = 16,
    bits: int = 8,
) -> DataFrame:
    """Per-bucket bounding rectangles under two layouts: ``zorder``
    (rows bucketed by fixed-width Morton-code range — both dimensions
    bounded) and ``roworder`` (the same rows bucketed by the
    single-dimension ``x`` range — y unbounded). ``area`` is the
    inclusive (x_span+1)·(y_span+1) cell count of the bucket's
    rectangle — the reader's worst-case candidate set; the
    zorder/roworder area ratio is the measured data-skipping win.

    Buckets are value-range slices of the FIXED code domain (the
    top log2(n_buckets) bits of the code), not equal-count tiles: the
    cut is a shift, so the whole pass is one map + one map-side-combined
    aggregate — no global sort, no window, nothing single-task. (The
    production write path's ``repartitionByRange`` achieves balanced
    sizes by sampling; the bounding-rectangle GUARANTEE this surfaces is
    a property of the curve cut, not of the balancing.) ``n_buckets``
    and ``bits`` must be powers of two / compatible: buckets are
    ``code >> (code_bits - log2(n_buckets))``. Output: 2·n_buckets rows
    (empty buckets absent).
    """
    import math

    shift_bits = int(math.log2(n_buckets))
    assert 2**shift_bits == n_buckets, "n_buckets must be a power of two"
    zx = x.cast("long").alias("zx")
    zy = y.cast("long").alias("zy")
    base = df.select(zx, zy).withColumn(
        "zval", zorder_value(F.col("zx"), F.col("zy"), bits)
    )

    def bucket_stats(bucket: Column, layout: str) -> DataFrame:
        return (
            base.withColumn("bucket", bucket.cast("int"))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.min("zx").alias("x_min"),
                F.max("zx").alias("x_max"),
                F.min("zy").alias("y_min"),
                F.max("zy").alias("y_max"),
            )
            .select(
                F.lit(layout).alias("layout"),
                "bucket",
                "n_rows",
                "x_min",
                "x_max",
                "y_min",
                "y_max",
                (
                    (F.col("x_max") - F.col("x_min") + 1)
                    * (F.col("y_max") - F.col("y_min") + 1)
                )
                .cast("long")
                .alias("area"),
            )
        )

    zorder = bucket_stats(
        F.shiftright(F.col("zval"), 2 * bits - shift_bits), "zorder"
    )
    roworder = bucket_stats(
        F.shiftright(F.col("zx"), bits - shift_bits), "roworder"
    )
    # Enforce the docstring's "callers bin first" precondition: values
    # >= 2**bits would silently alias in the Morton code (zorder_value
    # drops high bits) and push roworder buckets past n_buckets, making
    # the area comparison meaningless. Checked on the 2*n_buckets
    # aggregated rows (min/max bound every input), so the guard costs
    # nothing and fails loudly instead of lying.
    lim = F.lit(2**bits).cast("long")
    ok = (
        (F.col("x_min") >= 0)
        & (F.col("y_min") >= 0)
        & (F.col("x_max") < lim)
        & (F.col("y_max") < lim)
    )
    return zorder.unionByName(roworder).where(
        F.assert_true(
            ok,
            F.concat_ws(
                " ",
                F.lit(f"zorder_layout_stats: input exceeds {bits}-bit"),
                F.lit("domain [0, 2**bits); bin columns first — bucket"),
                F.col("layout"),
                F.col("bucket").cast("string"),
                F.lit("spans x"),
                F.col("x_min").cast("string"),
                F.lit(".."),
                F.col("x_max").cast("string"),
                F.lit("y"),
                F.col("y_min").cast("string"),
                F.lit(".."),
                F.col("y_max").cast("string"),
            ),
        ).isNull()
    )
