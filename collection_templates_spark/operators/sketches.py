"""Deterministic, engine-replayable streaming sketches.

The two one-pass bounded-memory summaries every 100 TB pipeline leans on
— Count-Min (heavy-hitter frequencies) and HyperLogLog (distinct counts)
— built so the DuckDB oracle reproduces them bit-for-bit:

- hash functions are the repo's engine-portable polynomial folds
  (``dedup._poly_hash``: h = fold(h·base + codepoint) mod 2³¹−1), one
  base per CMS row — NOT xxhash64, which the oracle cannot express;
- the HLL harmonic denominator Σ 2^(−M_j) is computed as an INTEGER sum
  of 2^(RMAX − M_j) scaled once at the end: each term is an exact power
  of two but a 64-term float sum spans more than 53 mantissa bits, so a
  float accumulation would be summation-order-dependent — the integer
  form is exact and commutative, which is what makes the estimate
  hash-checkable across engines.

Scale shape (the reason sketches exist): both are ONE map-side-combined
aggregation — CMS state is ≤ d·w cells per partition and HLL state is
≤ m registers per partition regardless of input size, merged
associatively by the shuffle. No driver round-trips; the comparison
queries join the sketch back against exact counts to EXPOSE the
approximation error rather than hide it.

Public algorithms: Cormode & Muthukrishnan 2005 (Count-Min); Flajolet,
Fusy, Gandouet, Meunier 2007 (HyperLogLog). No reference-repo
counterpart — the reference's stats are exact single-threaded passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from collection_templates_spark.operators.dedup import _poly_hash

#: default CMS geometry: d=4 rows (one portable-poly base each) × w=256
CMS_BASES: tuple[int, ...] = (31, 37, 41, 43)
CMS_WIDTH = 256

#: default HLL geometry: m=64 registers, 30-bit rank domain (the second
#: poly fold is < 2³¹), α₆₄ = 0.709 (Flajolet et al. Fig. 3 for m = 64)
HLL_M = 64
HLL_RANK_BITS = 30
HLL_ALPHA = 0.709


def _analyzer_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9']+")
        ).alias("token"),
    ).filter(F.col("token") != "")


def cms_token_errors(
    docs: DataFrame,
    width: int = CMS_WIDTH,
    bases: tuple[int, ...] = CMS_BASES,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Count-Min sketch of the corpus token stream, then every distinct
    token's estimate read back against its exact count — (token, n_true,
    n_est) with the CMS guarantee n_est ≥ n_true surfaced instead of
    assumed. One pass builds the d×w cell table (map-side combined to
    ≤ d·w rows per partition); the read-back joins the vocabulary-sized
    distinct-token table against the d·w-row sketch."""
    toks = _analyzer_tokens(docs, id_col, text_col)
    cells = toks.select(
        F.posexplode(
            F.array(
                *[
                    (_poly_hash(F.col("token"), b) % width).cast("int")
                    for b in bases
                ]
            )
        ).alias("row", "cell")
    )
    cms = cells.groupBy("row", "cell").agg(F.count("*").alias("c"))

    exact = toks.groupBy("token").agg(F.count("*").alias("n_true"))
    probes = exact.select(
        "token",
        "n_true",
        F.posexplode(
            F.array(
                *[
                    (_poly_hash(F.col("token"), b) % width).cast("int")
                    for b in bases
                ]
            )
        ).alias("row", "cell"),
    )
    return (
        probes.join(F.broadcast(cms), ["row", "cell"])
        .groupBy("token", "n_true")
        .agg(F.min("c").alias("n_est"))
    )


#: default KMV/theta geometry: k = 64 minimum values
KMV_K = 64

#: default Bloom geometry: m = 2048 bits, 3 portable-poly hash functions
BLOOM_M = 2048
BLOOM_BASES: tuple[int, ...] = (31, 37, 41)

_P31 = 2147483647


def _numeric_mix(col: F.Column, b1: int = 31, b2: int = 37) -> F.Column:
    """Engine-portable nonlinear hash of an integer column: the HLL
    mixer over two Lehmer-style residues — g = (48271·(h² mod p) mod p
    + h') mod p with h = (x·b1) mod p, h' = (x·b2) mod p. All
    intermediates < 2⁶² (ANSI-safe in both engines); the squaring breaks
    the affine structure a multiplicative step alone cannot."""
    p = F.lit(_P31).cast("long")
    h1 = (col.cast("long") * b1) % p
    h2 = (col.cast("long") * b2) % p
    return ((h1 * h1 % p) * 48271 % p + h2) % p


def kmv_theta_intersections(
    events: DataFrame,
    k: int = KMV_K,
    set_col: str = "event_type",
    member_col: str = "user_id",
) -> DataFrame:
    """KMV/theta-sketch set-intersection estimates between every pair of
    member sets — (set_a, set_b, n_exact, n_est, rel_err).

    Each set keeps its k MINIMUM normalized hashes u = g/p of the
    DISTINCT members (Bar-Yossef et al. 2002 / the DataSketches theta
    sketch; public algorithms — no reference counterpart). Pairwise:
    θ = min(θ_a, θ_b) and |A∩B| ≈ round(|{x ∈ S_a ∩ S_b : u(x) < θ}|/θ)
    — the standard theta intersection. The exact intersection is joined
    alongside so the error is surfaced, mirroring cms/hll rows.

    Determinism: u is one exact double division of portable integer
    hashes; the k-th order statistic is a (u, member) row_number so hash
    ties cannot flip the cut; the estimate is 4dp-rounded.

    Scale shape: the sketch build is one distinct + one per-set top-k
    window (map-side group-limit); everything pairwise operates on
    ≤ |sets|·k rows — the entire point of sketching is that the
    intersection never touches the raw membership table."""
    from pyspark.sql import Window

    members = events.select(
        F.col(set_col).alias("s"), F.col(member_col).alias("v")
    ).distinct()
    hashed = members.select(
        "s",
        "v",
        (
            _numeric_mix(F.col("v")).cast("double") / F.lit(float(_P31))
        ).alias("u"),
    )
    w = Window.partitionBy("s").orderBy(F.asc("u"), F.asc("v"))
    sk = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    # θ = k-th smallest u; a set with fewer than k distinct members keeps
    # everything and θ = 1.0 (its sketch is exact)
    theta = sk.groupBy("s").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == k, F.col("u"))), F.lit(1.0)
        ).alias("theta")
    )
    a = sk.select(
        F.col("s").alias("set_a"), F.col("v").alias("v"), F.col("u").alias("u")
    )
    b = sk.select(F.col("s").alias("set_b"), F.col("v").alias("v"))
    ta = theta.select(F.col("s").alias("set_a"), F.col("theta").alias("th_a"))
    tb = theta.select(F.col("s").alias("set_b"), F.col("theta").alias("th_b"))
    common = (
        a.join(b, "v")
        .filter(F.col("set_a") < F.col("set_b"))
        .join(F.broadcast(ta), "set_a")
        .join(F.broadcast(tb), "set_b")
        .filter(F.col("u") < F.least("th_a", "th_b"))
        .groupBy("set_a", "set_b", "th_a", "th_b")
        .agg(F.count("*").alias("___c"))
        .select(
            "set_a",
            "set_b",
            F.round(
                F.col("___c") / F.least("th_a", "th_b"), 4
            ).alias("n_est"),
        )
    )
    ma = members.select(F.col("s").alias("set_a"), "v")
    mb = members.select(F.col("s").alias("set_b"), "v")
    exact = (
        ma.join(mb, "v")
        .filter(F.col("set_a") < F.col("set_b"))
        .groupBy("set_a", "set_b")
        .agg(F.count("*").alias("n_exact"))
    )
    return exact.join(common, ["set_a", "set_b"], "left").select(
        "set_a",
        "set_b",
        "n_exact",
        F.coalesce("n_est", F.lit(0.0)).alias("n_est"),
        F.round(
            F.abs(F.coalesce("n_est", F.lit(0.0)) - F.col("n_exact"))
            / F.col("n_exact"),
            4,
        ).alias("rel_err"),
    )


def bloom_filter_fpr(
    keys: DataFrame,
    probes: DataFrame,
    m: int = BLOOM_M,
    bases: tuple[int, ...] = BLOOM_BASES,
    col: str = "token",
) -> DataFrame:
    """Bloom-filter membership with its false-positive rate surfaced —
    ONE row (m, k_hashes, n_keys, n_bits_set, n_probes, n_false_pos,
    fpr, fpr_model).

    The filter is the SET-BIT TABLE: distinct positions
    {poly_b(key) mod m} (≤ m rows — the relational representation of the
    bit array, built in one map-side-combined pass). A probe is a
    member iff all |bases| of its positions are set (a semi-join count).
    False positives = probe tokens passing the filter minus true
    members (anti-join on the key set). fpr_model = ρᵏ with ρ the
    measured bit load — written as explicit multiplication, not pow(),
    so both engines do the identical IEEE ops (Bloom 1970; public
    algorithm, no reference counterpart).

    Scale shape: state is ≤ m rows regardless of input; probes join the
    broadcast bit table; nothing pairwise."""
    kd = keys.select(F.col(col).alias("key")).distinct()
    bits = (
        kd.select(
            F.explode(
                F.array(
                    *[
                        (_poly_hash(F.col("key"), b) % m).cast("int")
                        for b in bases
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )
    pd_ = probes.select(F.col(col).alias("probe")).distinct()
    ppos = pd_.select(
        "probe",
        F.explode(
            F.array(
                *[
                    (_poly_hash(F.col("probe"), b) % m).cast("int")
                    for b in bases
                ]
            )
        ).alias("pos"),
    )
    nb = len(bases)
    passing = (
        ppos.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("probe")
        .agg(F.count("*").alias("___hits"))
        .filter(F.col("___hits") == nb)
        .select("probe")
    )
    false_pos = passing.join(
        kd, passing.probe == kd.key, "left_anti"
    )
    true_neg_probes = pd_.join(kd, pd_.probe == kd.key, "left_anti")

    n_keys = kd.agg(F.count("*").alias("n_keys"))
    n_bits = bits.agg(F.count("*").alias("n_bits_set"))
    n_probes = true_neg_probes.agg(F.count("*").alias("n_probes"))
    n_fp = false_pos.agg(F.count("*").alias("n_false_pos"))
    load = F.col("n_bits_set").cast("double") / F.lit(float(m))
    model = load
    for _ in range(nb - 1):
        model = model * load
    return (
        n_keys.join(F.broadcast(n_bits))
        .join(F.broadcast(n_probes))
        .join(F.broadcast(n_fp))
        .select(
            F.lit(m).alias("m"),
            F.lit(nb).alias("k_hashes"),
            "n_keys",
            "n_bits_set",
            "n_probes",
            "n_false_pos",
            F.when(
                F.col("n_probes") > 0,
                F.round(F.col("n_false_pos") / F.col("n_probes"), 6),
            ).otherwise(F.lit(0.0)).alias("fpr"),
            F.round(model, 6).alias("fpr_model"),
        )
    )


def _hll_estimate(
    regs: DataFrame, m: int, rank_bits: int, alpha: float
) -> tuple[DataFrame, "F.Column"]:
    """(one-row register aggregate, estimate Column over it) — the HLL
    estimator split out so the union/merge surface shares the exact
    arithmetic with ``hll_cardinality`` (formula documented there)."""
    rmax = rank_bits + 1
    agg = regs.agg(
        F.count("*").alias("___nonzero"),
        F.sum(
            F.pow(F.lit(2.0), (F.lit(rmax) - F.col("mx")).cast("double"))
            .cast("long")
        ).alias("___num"),
    )
    denom = (
        F.col("___num").cast("double") / F.lit(float(2**rmax))
        + (F.lit(m) - F.col("___nonzero")).cast("double")  # empty regs: 2^0
    )
    raw_e = F.lit(alpha * m * m) / denom
    v = F.lit(m) - F.col("___nonzero")
    est = F.round(
        F.when(
            (raw_e <= 2.5 * m) & (v > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
        ).otherwise(raw_e),
        4,
    )
    return agg, est


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Merge HLL register tables by per-bucket max — the associative /
    commutative / idempotent combine that makes the sketch distributed:
    shards (or micro-batches, or days) sketch independently and the
    union's registers are the element-wise max, with NO access to the
    original streams. Input/output schema: (bucket, mx)."""
    if not registers:
        raise ValueError("hll_merge needs at least one register table")
    merged = registers[0]
    for r in registers[1:]:
        merged = merged.unionByName(r)
    return merged.groupBy("bucket").agg(F.max("mx").alias("mx"))


def hll_union_cardinality(
    docs_a: DataFrame,
    docs_b: DataFrame,
    m: int = HLL_M,
    rank_bits: int = HLL_RANK_BITS,
    alpha: float = HLL_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The mergeability property SURFACED, not assumed: register tables
    built independently per split, max-merged, and the merged estimate
    compared to (a) the exact distinct-token count of the union and
    (b) the registers a single pass over the combined stream would
    produce (``n_register_mismatch`` — 0 by the max-merge identity,
    computed in both engines). One row:
    (m, n_true, estimate, rel_err, n_register_mismatch)."""
    ta = _analyzer_tokens(docs_a, id_col, text_col)
    tb = _analyzer_tokens(docs_b, id_col, text_col)
    merged = hll_merge(
        hll_register_table(ta, m=m, rank_bits=rank_bits),
        hll_register_table(tb, m=m, rank_bits=rank_bits),
    )
    direct = hll_register_table(
        ta.unionByName(tb), m=m, rank_bits=rank_bits
    )
    mism = (
        merged.withColumnRenamed("mx", "___ma")
        .join(direct.withColumnRenamed("mx", "___md"), "bucket", "full_outer")
        .filter(
            (F.col("___ma") != F.col("___md"))
            | F.col("___ma").isNull()
            | F.col("___md").isNull()
        )
        .agg(F.count(F.lit(1)).alias("n_register_mismatch"))
    )
    n_true = (
        ta.select("token")
        .unionByName(tb.select("token"))
        .distinct()
        .agg(F.count("*").alias("n_true"))
    )
    agg, est = _hll_estimate(merged, m, rank_bits, alpha)
    return (
        agg.join(F.broadcast(n_true))
        .join(F.broadcast(mism))
        .select(
            F.lit(m).alias("m"),
            "n_true",
            est.alias("estimate"),
            F.round(
                F.abs(est - F.col("n_true")) / F.col("n_true"), 4
            ).alias("rel_err"),
            "n_register_mismatch",
        )
    )


def hll_register_table(
    toks: DataFrame, m: int = HLL_M, rank_bits: int = HLL_RANK_BITS
) -> DataFrame:
    """(bucket, mx) register table from a ``token`` column — a plain
    ``groupBy(bucket).max(rank)``, which is exactly the shape Structured
    Streaming supports as incremental state: the SAME function applied
    to a readStream source maintains the live HLL registers with m rows
    of state, merged associatively across micro-batches (pinned by
    tests/test_sketches.py::test_streaming_hll_registers_match_batch).
    Hashing scheme documented on ``hll_cardinality``."""
    h1 = _poly_hash(F.col("token"), 31)
    h2 = _poly_hash(F.col("token"), 37)
    p = F.lit(2147483647).cast("long")

    def mix(a: F.Column, b: F.Column) -> F.Column:
        return ((a * a % p) * 48271 % p + b) % p

    g1, g2 = mix(h1, h2), mix(h2, h1)
    rank = F.when(
        g2 > 0,
        F.least(
            F.length(F.bin(g2.bitwiseAND(-g2))), F.lit(rank_bits + 1)
        ),
    ).otherwise(F.lit(rank_bits + 1))
    return (
        toks.select((g1 % m).cast("int").alias("bucket"), rank.alias("r"))
        .groupBy("bucket")
        .agg(F.max("r").alias("mx"))
    )


def hll_cardinality(
    docs: DataFrame,
    m: int = HLL_M,
    rank_bits: int = HLL_RANK_BITS,
    alpha: float = HLL_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """HyperLogLog distinct-token estimate next to the exact count — one
    row (m, n_true, estimate, rel_err).

    Hashing: the two portable poly folds are passed through a NONLINEAR
    overflow-safe mixer before use — g = (48271·(h² mod p) mod p + h')
    mod p, all intermediates < 2⁶² so ANSI 64-bit arithmetic never
    overflows in either engine. The raw folds are affine in the
    codepoints and collide structurally mod small m (31² ≡ 1 mod 64
    makes bucket = alternating char sums; measured 42/64 occupancy on
    200 short tokens, and a linear Lehmer step alone cannot break an
    additive pattern) — the squaring does. bucket = g₁ mod m; rank =
    trailing zeros of g₂ + 1 (capped at rank_bits+1 for a zero mix) —
    trailing, not the paper's leading-zero scan, because tz is exactly
    geometric for a uniform residue and computable without float log2:
    tz(x)+1 = length(bin(x & −x)), exact integer/string ops.

    The harmonic denominator is the integer sum of 2^(rank_bits+1 − M_j)
    scaled once, so both engines compute the IDENTICAL double; the
    small-range correction (E ≤ 2.5 m with empty registers) uses linear
    counting per the paper. Mixed over four token-shape families the
    estimator lands within ±16 % at m=64 (theory: σ = 1.04/√m ≈ 13 %)."""
    toks = _analyzer_tokens(docs, id_col, text_col)
    regs = hll_register_table(toks, m=m, rank_bits=rank_bits)
    agg, est = _hll_estimate(regs, m, rank_bits, alpha)
    n_true = toks.select("token").distinct().agg(
        F.count("*").alias("n_true")
    )
    return (
        agg.join(F.broadcast(n_true))
        .select(
            F.lit(m).alias("m"),
            "n_true",
            est.alias("estimate"),
            F.round(
                F.abs(est - F.col("n_true")) / F.col("n_true"), 4
            ).alias("rel_err"),
        )
    )


def hash_sampled_quantiles(
    df: DataFrame,
    value_col: str,
    key: F.Column,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    sample_mod: int = 16,
) -> DataFrame:
    """Deterministic hash-sampled quantile estimates, read back against
    the exact quantiles to SURFACE the sampling error (the CMS/HLL/theta
    convention applied to order statistics).

    The sample is the rows whose portable ``_numeric_mix(key)`` residue,
    scaled to [0,1), falls below ``1/sample_mod`` — a property of the ROW
    (no RNG, no partition order), so the estimate is bit-reproducible
    across engines and the DuckDB oracle replays it exactly. Both sides
    interpolate with the shared (n−1)·q convention (Spark ``percentile``
    ≡ DuckDB ``quantile_cont`` — verified identical at 6dp).

    Scale shape: the sample is a scan-side filter (no shuffle) keeping an
    expected 1/sample_mod of rows; ``sample_mod`` is the memory knob —
    production corpora size it so p·N sample values fit one aggregation
    buffer (for truly unbounded streams a mergeable KLL sketch replaces
    the sample; this operator is the portable-deterministic variant whose
    error the oracle can grade). The EXACT side is the grading harness —
    one ``percentile`` aggregate, the thing the sample exists to avoid.

    Output: one row per requested quantile — (q, est_q, exact_q,
    abs_err, rel_err), errors computed on raw doubles then rounded.

    Single scan (r15): both percentile states accumulate in ONE pass —
    ``percentile`` skips NULLs, so the sampled side is the same
    aggregate over a ``when``-guarded input (identical values to the
    old filtered-scan form; the guard is the old filter) — instead of
    two full table scans joined on the quantile index. At 100 TB that
    is one corpus pass, not two.
    """
    p = F.lit(_P31).cast("double")
    u = _numeric_mix(key).cast("double") / p
    qs_arr = F.array(*[F.lit(float(q)) for q in quantiles])
    val = F.col(value_col).cast("double")
    both = df.agg(
        F.percentile(
            F.when(u < F.lit(1.0 / sample_mod), val), qs_arr
        ).alias("ps"),
        F.percentile(val, qs_arr).alias("pf"),
    ).select(F.posexplode(F.arrays_zip("ps", "pf")).alias("i", "z"))
    est = F.col("z.ps")
    exact = F.col("z.pf")
    return both.select(
        F.element_at(qs_arr, F.col("i") + 1).alias("q"),
        F.round(est, 4).alias("est_q"),
        F.round(exact, 4).alias("exact_q"),
        F.round(F.abs(est - exact), 4).alias("abs_err"),
        F.round(F.abs(est - exact) / exact, 6).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (DDSketch shape)
# ---------------------------------------------------------------------------

#: default relative-error target: gamma = (1+a)/(1-a) = 51/49
DD_ALPHA = 0.02

#: sentinel bin for v <= 0 (DDSketch is defined on positives; the
#: estimate for this bin is exactly 0.0)
DD_ZERO_BIN = -(2**31)


def _dd_gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def _dd_bin(val: F.Column, alpha: float = DD_ALPHA) -> F.Column:
    """Log-spaced bin index: i = ceil(ln(v)/ln(gamma)) so that
    v in (gamma^(i-1), gamma^i].

    The ratio is rounded to 6dp BEFORE the ceil: Spark's Math.log and
    DuckDB's std::log agree to ~1 ulp, and a 6dp pre-round makes that
    last-ulp disagreement unobservable unless a value sits within
    ~1e-16 of a rounding boundary (the repo's round-before-compare
    determinism rule applied to a discretization).
    """
    gamma = _dd_gamma(alpha)
    import math

    ratio = F.log(val.cast("double")) / F.lit(math.log(gamma))
    return (
        F.when(val.cast("double") <= 0, F.lit(DD_ZERO_BIN))
        .otherwise(F.ceil(F.round(ratio, 6)))
        .cast("int")
    )


def ddsketch_bins(
    df: DataFrame,
    value_col: str,
    alpha: float = DD_ALPHA,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Build the mergeable quantile summary: one (bin, cnt) histogram
    row per log-spaced bin (optionally per group / shard).

    This is the bank's missing mergeable order-statistics summary (r12
    verdict #3): CMS/HLL/theta/Bloom all had an associative merge, but
    ``hash_sampled_quantiles`` was a sample, not a summary. A KLL or
    t-digest compactor is RANDOMIZED (KLL) or order-dependent
    (t-digest centroid formation), which the repo's cross-engine
    hash gate cannot tolerate; DDSketch (Masson, Rim, Lee — VLDB 2019)
    gives the same mergeability and a *deterministic* a-relative-error
    guarantee: the summary is a pure log-binned histogram, so merge is
    count addition — associative, commutative, and EXACTLY equal to a
    single pass (the hll_merge max-register argument, here for order
    statistics).

    Scale shape: ONE map-side-combined aggregation; state per partition
    is bounded by the number of occupied bins, ~ln(max/min)/ln(gamma)
    (a=0.02 over a 0.01..10^6 value span -> ~460 bins) regardless of
    row count. At 100 TB the per-executor partial is a few KB and the
    shuffle carries only (group, bin, cnt) rows.
    """
    b = _dd_bin(F.col(value_col), alpha).alias("bin")
    keys = [*group_cols, "bin"]
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, b)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ddsketch_merge(*histograms: DataFrame) -> DataFrame:
    """Merge per-shard summaries: union + count addition per bin.
    merge(bins(A), bins(B)) == bins(A UNION ALL B) exactly (pinned by
    the property test), because the summary is a histogram keyed by a
    row-local bin function — no compaction, no order dependence."""
    it = iter(histograms)
    u = next(it)
    for h in it:
        u = u.unionByName(h)
    return u.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def ddsketch_quantiles(
    bins_df: DataFrame,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    alpha: float = DD_ALPHA,
) -> DataFrame:
    """Read quantile estimates off a (bin, cnt) summary.

    Rank convention: the estimate for quantile q is the value of the
    row with 1-based rank floor(q*(n-1)) + 1 (the DDSketch paper's
    convention); the bin holding that rank is the first bin whose
    cumulative count reaches it, and the point estimate is the bin's
    relative midpoint 2*gamma^i/(gamma+1), which is within a relative
    error a of EVERY value in the bin — hence of the true order
    statistic.

    Scale shape: the summary is tiny (hundreds of rows), so the
    cumulative window over Window.orderBy("bin") is a single-partition
    sort over a bounded table — the same shape as the HLL register
    readout, not a data-sized sort.
    """
    from pyspark.sql import Window

    gamma = _dd_gamma(alpha)
    n_total = bins_df.agg(F.sum("cnt").alias("n"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins_df.select(
        "bin", "cnt", F.sum("cnt").over(w).alias("cum")
    )
    qs = [float(q) for q in quantiles]
    rows = None
    for q in qs:
        # 1-based target rank for this q
        tgt = (
            n_total.select(
                F.lit(q).alias("q"),
                (
                    F.floor(
                        F.lit(q) * (F.col("n").cast("double") - F.lit(1.0))
                    )
                    + F.lit(1)
                ).alias("rank"),
            )
        )
        rows = tgt if rows is None else rows.unionByName(tgt)
    est = (
        rows.join(cum, F.col("cum") >= F.col("rank"))
        .groupBy("q", "rank")
        .agg(F.min("bin").alias("bin"))
        .select(
            "q",
            F.when(F.col("bin") == DD_ZERO_BIN, F.lit(0.0))
            .otherwise(
                F.lit(2.0)
                * F.pow(F.lit(gamma), F.col("bin").cast("double"))
                / F.lit(gamma + 1.0)
            )
            .alias("raw_est"),
        )
    )
    return est.select("q", F.round("raw_est", 4).alias("est_q"))


def _kmv_build(
    events: DataFrame,
    k: int,
    set_col: str,
    member_col: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared KMV/theta sketch build (the kmv_theta_intersections
    geometry): → (distinct members, per-set k-minimum-hash sketch rows,
    per-set θ table)."""
    from pyspark.sql import Window

    members = events.select(
        F.col(set_col).alias("s"), F.col(member_col).alias("v")
    ).distinct()
    hashed = members.select(
        "s",
        "v",
        (
            _numeric_mix(F.col("v")).cast("double") / F.lit(float(_P31))
        ).alias("u"),
    )
    w = Window.partitionBy("s").orderBy(F.asc("u"), F.asc("v"))
    sk = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    theta = sk.groupBy("s").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == k, F.col("u"))), F.lit(1.0)
        ).alias("theta")
    )
    return members, sk, theta


def kmv_theta_differences(
    events: DataFrame,
    k: int = KMV_K,
    set_col: str = "event_type",
    member_col: str = "user_id",
) -> DataFrame:
    """KMV/theta A-NOT-B estimates between every ORDERED pair of member
    sets — (set_a, set_b, n_exact, n_est, rel_err): the set-difference
    companion of :func:`kmv_theta_intersections` (the DataSketches
    AnotB operation). Under the pair θ = min(θ_a, θ_b):

        |A∖B| ≈ round((|{x∈S_a : u<θ}| − |{x∈S_a∩S_b : u<θ}|)/θ)

    — both counts read ONLY sketch rows, so the difference never
    touches raw membership (the exact difference is joined alongside
    to surface the error, the sketch-family convention). Same
    determinism story as the intersection row: portable hashes, exact
    double division, row_number order statistics, 4dp rounds.

    Scale: everything pairwise operates on ≤ |sets|·k sketch rows.
    """
    members, sk, theta = _kmv_build(events, k, set_col, member_col)
    a = sk.select(
        F.col("s").alias("set_a"), F.col("v").alias("v"),
        F.col("u").alias("u"),
    )
    b = sk.select(F.col("s").alias("set_b"), F.col("v").alias("v"))
    ta = theta.select(F.col("s").alias("set_a"), F.col("theta").alias("th_a"))
    tb = theta.select(F.col("s").alias("set_b"), F.col("theta").alias("th_b"))
    # per ordered pair: survivors of S_a under the pair θ...
    a_under = (
        a.join(F.broadcast(ta), "set_a")
        .join(F.broadcast(tb))
        .filter(F.col("set_a") != F.col("set_b"))
        .filter(F.col("u") < F.least("th_a", "th_b"))
        .groupBy("set_a", "set_b", "th_a", "th_b")
        .agg(F.count("*").alias("___na"))
    )
    # ...minus survivors that are also in S_b
    both_under = (
        a.join(b, "v")
        .filter(F.col("set_a") != F.col("set_b"))
        .join(F.broadcast(ta), "set_a")
        .join(F.broadcast(tb), "set_b")
        .filter(F.col("u") < F.least("th_a", "th_b"))
        .groupBy("set_a", "set_b")
        .agg(F.count("*").alias("___nab"))
    )
    est = (
        a_under.join(both_under, ["set_a", "set_b"], "left")
        .select(
            "set_a",
            "set_b",
            F.round(
                (
                    F.col("___na")
                    - F.coalesce(F.col("___nab"), F.lit(0))
                ).cast("double")
                / F.least("th_a", "th_b"),
                4,
            ).alias("n_est"),
        )
    )
    ma = members.select(F.col("s").alias("set_a"), "v")
    mb = members.select(F.col("s").alias("set_b"), "v")
    inter = (
        ma.join(mb, "v")
        .filter(F.col("set_a") != F.col("set_b"))
        .groupBy("set_a", "set_b")
        .agg(F.count("*").alias("___ni"))
    )
    sizes = members.groupBy(F.col("s").alias("set_a")).agg(
        F.count("*").alias("___sz")
    )
    pairs = sizes.join(
        members.select(F.col("s").alias("set_b")).distinct()
    ).filter(F.col("set_a") != F.col("set_b"))
    exact = pairs.join(inter, ["set_a", "set_b"], "left").select(
        "set_a",
        "set_b",
        (
            F.col("___sz") - F.coalesce(F.col("___ni"), F.lit(0))
        ).alias("n_exact"),
    )
    return exact.join(est, ["set_a", "set_b"], "left").select(
        "set_a",
        "set_b",
        "n_exact",
        F.coalesce("n_est", F.lit(0.0)).alias("n_est"),
        F.round(
            F.try_divide(
                F.abs(
                    F.coalesce("n_est", F.lit(0.0))
                    - F.col("n_exact").cast("double")
                ),
                F.col("n_exact").cast("double"),
            ),
            4,
        ).alias("rel_err"),
    )


def hll_sliding_window_users(
    events: DataFrame,
    window_days: int = 7,
    m: int = HLL_M,
    rank_bits: int = HLL_RANK_BITS,
    alpha: float = HLL_ALPHA,
    ts_col: str = "ts",
    member_col: str = "user_id",
) -> DataFrame:
    """Trailing-``window_days`` distinct-user estimates per day from
    DAILY HLL sketches — mergeability applied along the TIME axis: one
    register table per day (m rows), and any trailing window is the
    per-bucket max of its days' registers, never a rescan of raw
    events. This is the production shape for "rolling 7/28-day active
    users" at 100 TB: the daily sketches are the stored rollup
    (m rows/day), window answers are O(window · m) merges, and
    backfills/re-windows never touch the event log. Exact windowed
    distinct counts are computed alongside to surface the error (the
    sketch-family convention).

    Mechanics: numeric members hash through the ``_numeric_mix``
    pair (the kmv/theta mixer); bucket = g₁ mod m, rank = capped
    trailing-zero length of g₂ (the hll_cardinality scheme for string
    tokens, numeric flavor). Each day's registers EXPLODE to the
    ``window_days`` target days they contribute to (a static
    ≤ window_days fan-out of m-row tables — linear, shuffle-tiny),
    then one groupBy(target_day, bucket).max and one per-day estimate
    aggregate with the exact _hll_estimate arithmetic (integer
    harmonic numerator, linear-counting small-range branch).
    Output: (day, n_true, estimate, rel_err) for event days only.
    """
    p = F.lit(_P31).cast("long")
    v = F.col(member_col).cast("long")
    h1 = (v * 31) % p
    h2 = (v * 37) % p
    g1 = ((h1 * h1 % p) * 48271 % p + h2) % p
    g2 = ((h2 * h2 % p) * 48271 % p + h1) % p
    rank = F.when(
        g2 > 0,
        F.least(
            F.length(F.bin(g2.bitwiseAND(-g2))), F.lit(rank_bits + 1)
        ),
    ).otherwise(F.lit(rank_bits + 1))
    day = F.to_date(F.col(ts_col)).alias("day")
    daily_regs = (
        events.select(day, (g1 % m).cast("int").alias("bucket"),
                      rank.alias("r"))
        .groupBy("day", "bucket")
        .agg(F.max("r").alias("mx"))
    )
    days = events.select(day).distinct()
    k = F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("k")
    fanned = daily_regs.select("day", "bucket", "mx", k).select(
        F.date_add(F.col("day"), F.col("k")).alias("tday"), "bucket", "mx"
    )
    merged = (
        fanned.join(
            days.select(F.col("day").alias("tday")), "tday", "left_semi"
        )
        .groupBy("tday", "bucket")
        .agg(F.max("mx").alias("mx"))
    )
    rmax = rank_bits + 1
    agg = merged.groupBy("tday").agg(
        F.count("*").alias("___nonzero"),
        F.sum(
            F.pow(F.lit(2.0), (F.lit(rmax) - F.col("mx")).cast("double"))
            .cast("long")
        ).alias("___num"),
    )
    denom = (
        F.col("___num").cast("double") / F.lit(float(2**rmax))
        + (F.lit(m) - F.col("___nonzero")).cast("double")
    )
    raw_e = F.lit(alpha * m * m) / denom
    empty = F.lit(m) - F.col("___nonzero")
    est = F.round(
        F.when(
            (raw_e <= 2.5 * m) & (empty > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / empty.cast("double")),
        ).otherwise(raw_e),
        4,
    )
    daily_users = events.select(day, F.col(member_col).alias("u")).distinct()
    exact = (
        daily_users.select("day", "u", k)
        .select(F.date_add(F.col("day"), F.col("k")).alias("tday"), "u")
        .join(days.select(F.col("day").alias("tday")), "tday", "left_semi")
        .groupBy("tday")
        .agg(F.count_distinct("u").alias("n_true"))
    )
    return (
        agg.join(exact, "tday")
        .select(
            F.col("tday").alias("day"),
            "n_true",
            est.alias("estimate"),
            F.round(
                F.abs(est - F.col("n_true").cast("double"))
                / F.col("n_true").cast("double"),
                4,
            ).alias("rel_err"),
        )
    )
