"""Distributed linear algebra over embedding columns: deterministic
power iteration for the top principal component.

The classic "what single direction explains this embedding table"
diagnostic (anisotropy / dominant-axis audits before ANN indexing or
whitening; Mu & Viswanath's all-but-the-top observation is exactly
"the top component is large and shared"). Spark's built-in route is
RowMatrix.computePrincipalComponents — a driver-side Gram eigensolve
on RDDs; this re-expression keeps the data path in DataFrame-managed
stages so it composes with the rest of the bank and stays
oracle-checkable.

Cross-engine determinism (the r11 DECIMAL discipline, pushed through
an ITERATIVE algorithm): float32 components are 6dp-rounded ONCE
in-engine and then carried as integer MICRO-UNITS (int64) — the
centering, every matrix-vector product, and every cross-row sum are
exact integer arithmetic (int64 per element, chunk-summed into Python
bignums before any bound could overflow), identical to the oracle's
hugeint sums by construction. The per-iteration normalization is the
only float step — w → round(·, 6) → w/‖w‖ → round(·, 6) — computed
DRIVER-SIDE on the exact sums with ``_round_half_up``
(byte-equivalent to the engines' round, see its docstring), so both
engines see identical doubles; the iterate re-enters the next round
as 6dp micros, so error cannot compound: each iteration is an exact
function of a 6dp vector.

Execution shape — third design, each prior one abandoned for a
MEASURED reason on 20k×64 rows at sf0.1:
- DECIMAL hot loop: hit both Spark decimal traps at once — a 64-term
  ``+`` chain grows result precision 1/add, crosses the 38 cap, and
  allowPrecisionLoss silently SHRINKS THE SCALE to 6 → a 2.4e-6
  WRONG ANSWER, not an error. (Fixable with chunked re-casts, but
  BigDecimal per-row math stayed the slow path.)
- 64-SUM-column wide aggregates: arithmetically exact but 1–6 s/job
  in ANALYSIS + whole-stage-codegen of the 64-wide plans; the data
  was never the cost.
- array<long> + higher-order-function folds: small generic plans,
  but interpreted lambdas run ~1 µs/element-step → ~2 s/iteration on
  1.3M element-steps.
Shipped: the cache is 64 LONG columns filled by ONE codegen'd
projection (compile cost paid once), and the moment/iteration passes
are Arrow-batched ``mapInPandas`` partial aggregates — vectorized
int64 numpy with 256-row chunk sums lifted into Python bignums (the
int64 bound is |d·x| ≤ ~2e16, so 256-row chunks stay under 2^63; the
bignum fold is exact at any n). Each pass emits dim partial rows per
partition and the driver does the exact final reduce — the classic
treeAggregate shape with an O(dim · partitions) driver merge; the
iterate is O(dim) per iteration, never O(rows). At 100 TB the
per-partition pass is the embarrassingly parallel stage; insert one
intermediate combine level if partitions ever outgrow the driver.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIM_DEFAULT = 64
_MICRO = 1_000_000
_CHUNK = 256  # 256 · max|term| ≈ 4.6e18 < 2^63: chunk sums never wrap


def _round_half_up(x: float, nd: int) -> Decimal:
    """round(double, nd) exactly as the engines compute it: HALF_UP on
    the shortest round-trip decimal repr — Spark's round IS
    BigDecimal.valueOf(Double.toString(x)).setScale(nd, HALF_UP), and
    Python's repr produces the same shortest repr, so this is
    byte-equivalent to the in-engine rounding the oracle runs."""
    return Decimal(repr(x)).quantize(
        Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP
    )


def _micro_expr(e: Column) -> Column:
    """Exact 6dp micros of a float component: round → DECIMAL(7,6) →
    ×1e6 → BIGINT, every step exact in both engines."""
    return (
        F.round(e.cast("double"), 6).cast("decimal(7,6)")
        * F.lit(_MICRO).cast("decimal(19,0)")
    ).cast("long")


def _micro_sql(e: str) -> str:
    """SQL-string twin of :func:`_micro_expr` (same Catalyst tree, so
    bit-identical results): a dim-wide projection built Column-by-Column
    costs ~640 py4j round trips (~3.8 s of driver time per invocation,
    measured round 15); one selectExpr parse of the same expressions is
    ~100 ms."""
    return (
        f"CAST(CAST(round(CAST({e} AS DOUBLE), 6) AS DECIMAL(7,6))"
        f" * CAST({_MICRO} AS DECIMAL(19,0)) AS BIGINT)"
    )


def _chunked_exact_colsums(mat: np.ndarray) -> list[int]:
    """Exact per-column sums of an int64 matrix: 256-row numpy chunk
    sums (bounded < 2^63) folded into Python bignums."""
    dim = mat.shape[1]
    totals = [0] * dim
    for lo in range(0, mat.shape[0], _CHUNK):
        part = mat[lo : lo + _CHUNK].sum(axis=0)
        for j in range(dim):
            totals[j] += int(part[j])
    return totals


def _batch_matrix(pdf: pd.DataFrame, dim: int) -> np.ndarray:
    return np.column_stack(
        [pdf[f"x{j}"].to_numpy(dtype=np.int64) for j in range(dim)]
    )


def _rh_micro(x: np.ndarray) -> np.ndarray:
    """Half-away-from-zero rescale of micro² int64 values to micros —
    the one rounding both engines replay exactly (the oracle's CASE
    (x+500000)//1000000 expression)."""
    half = _MICRO // 2
    return np.where(
        x >= 0, (x + half) // _MICRO, -((-x + half) // _MICRO)
    ).astype(np.int64)


def power_iteration_components(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = DIM_DEFAULT,
    iters: int = 3,
    n_components: int = 2,
) -> DataFrame:
    """Top ``n_components`` principal components via power iteration
    with Hotelling deflation, fully deterministic (module docstring).
    Component k is found by the same integer-micros ladder as the top
    component, run on the matrix deflated by the previously-found
    6dp iterates: ``c ← c − rh(d·vₚ)`` with ``d = rh(c·vₚ)`` — every
    deflation step is exact int64 arithmetic on 6dp quantities, so
    the whole K-component chain stays byte-replayable in SQL (the
    ``embedding_pca_components`` oracle unrolls it).

    Returns one row per (component, dimension):
    (component, pos, loading, mean_x, eigval, explained_var,
    cum_explained) — cum_explained the running explained-variance
    curve (Σ eigvals so far / tr(C)), the "how many components do my
    SemDeDup/IVF embeddings actually need" readout. Degenerate
    inputs degrade: n < 2 → empty frame; a zero-variance residual at
    component k → NULL loading/eigval rows for k, then stop.

    Scale shape: identical to the top-component ladder — each pass is
    an Arrow mapInPandas partial aggregate over the cached long
    columns with an O(dim·partitions) driver reduce; deflation adds
    O(K·dim) int64 numpy work per batch, never a new shuffle."""
    spark = emb.sparkSession
    raw = emb.selectExpr(
        *[
            f"{_micro_sql(f'element_at(`{vec_col}`, {j + 1})')} AS x{j}"
            for j in range(dim)
        ]
    ).persist()

    def run_moments(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        n = 0
        sx = [0] * dim
        sxx = [0] * dim
        for pdf in batches:
            if not len(pdf):
                continue
            mat = _batch_matrix(pdf, dim)
            n += mat.shape[0]
            for j, s in enumerate(_chunked_exact_colsums(mat)):
                sx[j] += s
            for j, s in enumerate(_chunked_exact_colsums(mat * mat)):
                sxx[j] += s
        if n:
            yield pd.DataFrame(
                {
                    "pos": list(range(dim)),
                    "n": [n] * dim,
                    "sx": [str(v) for v in sx],
                    "sxx": [str(v) for v in sxx],
                }
            )

    parts = raw.mapInPandas(
        run_moments, "pos int, n long, sx string, sxx string"
    ).collect()
    n = 0
    sx, sxx = [0] * dim, [0] * dim
    for r in parts:
        if r["pos"] == 0:
            n += int(r["n"])
        sx[r["pos"]] += int(r["sx"])
        sxx[r["pos"]] += int(r["sxx"])
    out_schema = (
        "component int, pos int, loading double, mean_x double, "
        "eigval double, explained_var double, cum_explained double"
    )
    if n < 2:
        # Degenerate input (empty table or a single row): the sample
        # covariance is undefined (n-1 == 0) — degrade to an empty
        # frame instead of a driver-side ZeroDivisionError (repo
        # convention: every 0-denominator path is guarded).
        raw.unpersist()
        return spark.createDataFrame([], out_schema)
    # mean in micros: round(Σx / n) — the same double-divide both
    # engines run (Σx, n ≪ 2^53: the doubles are exact)
    m = [
        int(_round_half_up(float(sx[j]) / float(n), 0))
        for j in range(dim)
    ]
    # trace in micro²: Σ_j (Sxx_j − 2 m_j Sx_j + n m_j²) — exact ints
    trace = sum(
        sxx[j] - 2 * m[j] * sx[j] + n * m[j] * m[j] for j in range(dim)
    )
    m_np = np.array(m, dtype=np.int64)

    # per component: (v micros | None, norm) — filled by the ladder
    found: list[tuple[list[int] | None, float]] = []
    try:
        for _comp in range(n_components):
            prev = [
                np.array(v, dtype=np.int64)
                for v, _ in found
                if v is not None
            ]
            v = [_MICRO // 8] * dim  # v0 = 0.125 in micros
            norm = 0.0
            for _ in range(iters):
                v_np = np.array(v, dtype=np.int64)

                def run_iter(
                    batches: Iterator[pd.DataFrame],
                    _v: np.ndarray = v_np,
                    _prev: list[np.ndarray] = prev,
                ) -> Iterator[pd.DataFrame]:
                    wx = [0] * dim
                    any_rows = False
                    for pdf in batches:
                        if not len(pdf):
                            continue
                        any_rows = True
                        # centered micros, then the exact-integer
                        # deflation chain by the found components:
                        # c ← c − rh(rh(c·vₚ) ⊗ vₚ). For component 0
                        # this is bit-identical to the raw-matrix
                        # identity the top-component ladder used
                        # (c·v = x·v − m·v and Σd·c_j = Σd·x_j −
                        # m_j·Σd are exact int equalities).
                        c = _batch_matrix(pdf, dim) - m_np[None, :]
                        for vp in _prev:
                            dp = _rh_micro(c @ vp)
                            c = c - _rh_micro(dp[:, None] * vp[None, :])
                        d = _rh_micro(c @ _v)
                        for j, s in enumerate(
                            _chunked_exact_colsums(c * d[:, None])
                        ):
                            wx[j] += s
                    if any_rows:
                        yield pd.DataFrame(
                            {
                                "pos": list(range(dim)),
                                "wx": [str(x) for x in wx],
                            }
                        )

                wparts = raw.mapInPandas(
                    run_iter, "pos int, wx string"
                ).collect()
                w = [0] * dim
                for r in wparts:
                    w[r["pos"]] += int(r["wx"])
                # wr = round(w/1e12, 6) — w is micro²; exact driver math
                wr = [_round_half_up(float(wj) / 1.0e12, 6) for wj in w]
                ssq = sum(r * r for r in wr)  # exact Decimal
                norm = math.sqrt(float(ssq))
                if norm == 0.0:
                    break
                # 6dp unit components back to exact micros
                v = [
                    int(_round_half_up(float(r) / norm, 6) * _MICRO)
                    for r in wr
                ]
            if norm == 0.0:
                # Zero-variance residual: Cv is the zero vector and
                # the unit iterate is undefined — emit NULL rows for
                # this component (the oracle's x/0 path), then stop:
                # every later component would be equally degenerate.
                found.append((None, 0.0))
                break
            found.append((v, norm))
    finally:
        raw.unpersist()

    tv = float(trace) / 1.0e12
    rows = []
    cum_norm = 0.0
    for comp, (v, norm) in enumerate(found):
        if v is None:
            for j in range(dim):
                rows.append(
                    (comp, j, None, m[j] / float(_MICRO), None, None, None)
                )
            continue
        cum_norm += norm
        eigval = norm / float(n - 1)
        if trace:
            explained = eigval / (tv / float(n - 1))
            cum = (cum_norm / float(n - 1)) / (tv / float(n - 1))
        else:
            explained = cum = float("nan")
        for j in range(dim):
            rows.append(
                (
                    comp,
                    j,
                    v[j] / float(_MICRO),
                    m[j] / float(_MICRO),
                    eigval,
                    explained,
                    cum,
                )
            )
    out = spark.createDataFrame(rows, out_schema)
    # in-engine 6dp rounding of the float readouts (same F.round the
    # oracle's round() mirrors; loadings/means are exact 6dp already)
    return out.select(
        "component",
        "pos",
        "loading",
        "mean_x",
        F.round("eigval", 6).alias("eigval"),
        F.round("explained_var", 6).alias("explained_var"),
        F.round("cum_explained", 6).alias("cum_explained"),
    )


def power_iteration_top_component(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = DIM_DEFAULT,
    iters: int = 3,
) -> DataFrame:
    """Top principal component of the (centered) embedding table via
    ``iters`` rounds of power iteration, fully deterministic (see
    module docstring). Returns one row per dimension:
    (pos, loading, mean_x, eigval, explained_var) — loading the 6dp
    unit iterate, eigval ≈ ‖Cv‖ = ‖Σ cᵢ(cᵢ·v)‖/(n−1) after the final
    round, explained_var = eigval / tr(C).

    The K=1 slice of :func:`power_iteration_components` (deflation is
    vacuous for the first component, so the ladders are bit-identical
    — pinned by the exact-replica test and the driver oracle)."""
    out = power_iteration_components(
        emb, vec_col, dim, iters, n_components=1
    )
    return out.select(
        "pos", "loading", "mean_x", "eigval", "explained_var"
    )


def centroid_outliers(
    emb: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DIM_DEFAULT,
    top_k: int = 5,
) -> DataFrame:
    """Per-group centroid-distance outliers — the embedding-QC sweep a
    training pipeline runs before trusting labels (mislabeled /
    corrupted / off-manifold vectors rank first): for every label, the
    ``top_k`` vectors farthest (squared L2) from that label's mean
    vector, with their exact integer distance and rank.

    Exactness (the repo's integer-micros discipline, linalg module
    docstring): components quantize to 6dp micros via
    :func:`_micro_expr`; per-(label, dim) sums are exact int64; the
    centroid micro is round(sum / n) — the one double divide both
    engines replay identically (sum, n ≪ 2^53, the
    power_iteration_components mean idiom); dist² = Σ_d (x − c)² is an
    exact int64 (≤ dim · (4·10⁶)² ≈ 10¹⁵), so the ranking never sees a
    float and (dist² DESC, id ASC) is a total order.

    Scale shape: posexplode to (id, label, d, micro) rows → ONE
    map-side-combined groupBy(label, d) for the centroids (|labels|·dim
    rows out — broadcast), one broadcast join back, one groupBy(id) for
    dist², one per-label window for the top-k. Cost O(rows · dim), no
    all-pairs anywhere; at 100 TB the same plan holds as long as
    |labels|·dim stays broadcast-sized (drop the hint past ~10⁷ cells
    and the join becomes a plain shuffle on (label, d))."""
    from pyspark.sql import Window

    base = emb.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("lbl"),
        F.posexplode(F.col(vec_col)).alias("d", "e"),
    ).select("vid", "lbl", "d", _micro_expr(F.col("e")).alias("x"))
    cent = (
        base.groupBy("lbl", "d")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "lbl",
            "d",
            F.round(F.col("s") / F.col("n"), 0).cast("long").alias("c"),
        )
    )
    diff = F.col("x") - F.col("c")
    dist = (
        base.join(F.broadcast(cent), ["lbl", "d"])
        .groupBy("vid", "lbl")
        .agg(F.sum(diff * diff).alias("dist2"))
    )
    w = Window.partitionBy("lbl").orderBy(F.desc("dist2"), F.asc("vid"))
    return (
        dist.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("lbl").alias(label_col),
            F.col("vid").alias(id_col),
            "dist2",
            "rank",
        )
    )
