"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB:
- Exact dedup is one hash-groupBy (map-side combine, one shuffle on the
  normalized-text hash — never on the text itself).
- All-pairs similarity is never computed: candidates come from inverted
  shingle index (small corpora), LSH band buckets (MinHash), or band-chunk
  exact-match blocking (SimHash). Each is a self-equi-join on a short key —
  shuffle on the bucket id, AQE splits skewed buckets.
- Hot shingles (stopword trigrams) are the skew risk: ``max_bucket_size``
  drops degenerate buckets exactly like a salting guard would.

The reference's only dedup is keep-first-by-name (SURVEY §2.5 O6 / §2.4 A7);
this module is the LLM-corpus extension suite.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: SimHash fingerprint width. 62 (not 64) because the per-shingle hash is two
#: independent 31-bit polynomial hashes packed side by side — every bit is
#: uniformly distributed, whereas a 64-bit layout would leave 2 constant bits
#: whose blocking chunks degenerate into everyone-collides hot buckets.
SIMHASH_BITS = 62
_HASH_MOD = 2147483647  # 2^31 - 1 (Mersenne; products stay < 2^62, no overflow)


def _poly_hash(col: F.Column, base: int) -> F.Column:
    """h = fold(h*base + codepoint) mod 2^31-1 — pure integer arithmetic,
    reproducible in any engine (same scheme as text_analysis.poly_fingerprint)."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % _HASH_MOD,
    )


def portable_shingle_hash(col: F.Column) -> F.Column:
    """62-bit engine-portable shingle hash: poly(base 31) << 31 | poly(base 37).

    Deliberately NOT xxhash64: the DuckDB oracle must reproduce the exact
    fingerprints, and polynomial folds are the only hash both engines can
    express natively (see the text_fingerprint oracle)."""
    return _poly_hash(col, 31) * F.lit(2147483648).cast("long") + _poly_hash(col, 37)


def normalize_text(text: F.Column) -> F.Column:
    return F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate detection on normalized text: every row keeps its
    group's canonical (min) id and a duplicate flag.

    The window partitions by the normalized text itself; Spark hashes the
    key for the shuffle so long texts cost one pass. For 100 TB, swap the
    raw key for ``xxhash64(norm)`` + a collision-check pass.
    """
    norm = normalize_text(F.col(text_col))
    w = Window.partitionBy("___norm")
    return (
        df.withColumn("___norm", norm)
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("is_duplicate", (F.col(id_col) != F.col("canonical_id")).cast("int"))
        .drop("___norm")
    )


def word_shingles(text: F.Column, n: int = 3) -> F.Column:
    """Distinct word n-grams of normalized text (empty array if < n words)."""
    toks = F.split(normalize_text(text), " ")
    # sequence(1, 0) would DESCEND in Spark — short docs need an explicit
    # empty-array branch, not a clamped bound.
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """n-gram-set Jaccard pairs ≥ threshold. Columns: doc1 < doc2,
    jaccard (rounded 6dp).

    Uses **prefix filtering** (AllPairs/PPJoin family): per doc, only the
    ⌊(1-τ)·n⌋+1 globally-rarest shingles are indexed. Any pair with
    J ≥ τ must overlap within both prefixes (pigeonhole on the shared
    frequency order), so candidate generation joins tiny prefixes instead
    of full inverted lists — the hot-shingle quadratic blowup (stopword
    trigrams) never materializes. Verification computes the exact Jaccard
    from the full shingle sets via array_intersect.

    ``max_bucket_size`` (default 1000) drops shingles appearing in more
    than that many docs from the candidate index, bounding any one join
    bucket at max_bucket_size² candidate pairs regardless of corpus size —
    the guard that keeps a stopword-heavy 100 TB corpus from going
    quadratic. The result is EXACT whenever no capped shingle would land
    in a doc's prefix (capped shingles are the globally hottest, so they
    sort last and only enter a prefix when a doc has fewer than
    ⌊(1-τ)·n⌋+1 uncapped shingles). A pair of docs built almost entirely
    of ultra-hot shingles can be missed under the cap; pass ``None`` for
    strictly-exact output. At the repo's test scales the hottest shingle
    df is ~25, so the default cap never triggers there.
    """
    # materialize the hashed shingle sets ONCE: four downstream branches
    # (df-counts, prefix, and both verify sides) would otherwise each
    # recompute the normalize→split→shingle→hash expression chain
    sets = (
        df.select(
            F.col(id_col).alias("doc"),
            F.transform(
                word_shingles(F.col(text_col), n), lambda s: F.xxhash64(s)
            ).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .persist()
    )

    idx = sets.select("doc", F.size("sh").alias("n"), F.explode("sh").alias("shingle"))
    df_counts = idx.groupBy("shingle").agg(F.count("*").alias("df"))
    if max_bucket_size is not None:
        df_counts = df_counts.filter(F.col("df") <= max_bucket_size)
    # per doc: order shingles rarest-first (global df, then hash for a total
    # order shared by every doc), keep the prefix
    prefix_len = F.floor(F.lit(1.0 - threshold) * F.col("n")).cast("int") + 1
    prefix = (
        idx.join(df_counts, "shingle")
        .groupBy("doc", "n")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct(F.col("df"), F.col("shingle")))
                ),
                F.lit(1),
                prefix_len,
            ).alias("pref")
        )
        .select("doc", F.explode(F.transform("pref", lambda s: s["shingle"])).alias("shingle"))
    )
    candidates = (
        prefix.alias("a")
        .join(prefix.alias("b"), "shingle")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc1"), F.col("b.doc").alias("doc2"))
        .distinct()
    )
    s1 = sets.select(F.col("doc").alias("doc1"), F.col("sh").alias("sh1"))
    s2 = sets.select(F.col("doc").alias("doc2"), F.col("sh").alias("sh2"))
    n_common = F.size(F.array_intersect("sh1", "sh2"))
    jaccard = F.round(n_common / (F.size("sh1") + F.size("sh2") - n_common), 6)
    return (
        candidates.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """MinHash signature per doc: for each of ``num_hashes`` seeded hash
    functions, the min over the doc's shingle set. One explode + one groupBy;
    the 64 mins are computed as 64 aggregate expressions in a single pass
    (map-side partial aggregation keeps shuffle volume at docs × 64 longs).
    """
    idx = df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = idx.groupBy("doc").agg(*mins)
    return sig.select(
        "doc", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    rows_per_band: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs, verified with exact Jaccard.

    banding: signature split into b = num_hashes / rows_per_band bands; docs
    colliding on any full band become candidates (shuffle key = (band_idx,
    band_hash) — short and uniform). Candidates are then *verified* with
    exact n-gram Jaccard so the output has no false positives; with r=2,
    b=32 the miss probability at j=0.5 is (1-0.25)^32 ≈ 1e-4.
    """
    # one materialization of the HASHED shingle sets (8-byte longs, cheap to
    # checkpoint) serves signature generation AND candidate verification;
    # the per-seed minhash functions re-hash the 64-bit shingle hash, which
    # is statistically equivalent to hashing the shingle string
    sets = (
        df.select(
            F.col(id_col).alias("doc"),
            F.transform(
                word_shingles(F.col(text_col), n), lambda s: F.xxhash64(s)
            ).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .persist()
    )
    idx = sets.select("doc", F.explode("sh").alias("shingle"))
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = (
        idx.groupBy("doc")
        .agg(*mins)
        .select(
            "doc",
            F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias(
                "signature"
            ),
        )
    )
    bands = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.xxhash64(
                            *[
                                F.col("signature")[i]
                                for i in range(
                                    b * rows_per_band, (b + 1) * rows_per_band
                                )
                            ]
                        ).alias("band_hash"),
                    )
                    for b in range(num_hashes // rows_per_band)
                ]
            )
        ).alias("band"),
    ).select("doc", "band.band_idx", "band.band_hash")
    candidates = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_idx", "band_hash"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc1"), F.col("b.doc").alias("doc2"))
        .distinct()
    )
    # Verify per-candidate with array_intersect on the two shingle sets —
    # linear in |candidates|, unlike the exact inverted-index pair join
    # (which is quadratic in hot-bucket sizes). This is why LSH is the
    # 100 TB path: candidate generation AND verification both stay cheap.
    s1 = sets.select(F.col("doc").alias("doc1"), F.col("sh").alias("sh1"))
    s2 = sets.select(F.col("doc").alias("doc2"), F.col("sh").alias("sh2"))
    n_common = F.size(F.array_intersect("sh1", "sh2"))
    jaccard = F.round(
        n_common / (F.size("sh1") + F.size("sh2") - n_common), 6
    )
    return (
        candidates.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Packed SimHash fingerprint per doc: ``(doc, fp: long)``.

    Per-bit vote = Σ over distinct shingles of ±1 by that bit of the portable
    shingle hash; fingerprint bit = vote > 0. Fully JVM-side: explode shingles,
    hash once per shingle, then ``bits`` conditional-sum aggregates in ONE
    groupBy pass (map-side partial aggregation — shuffle volume is docs × bits
    ints, never the shingles). Docs with < n words produce no shingles and are
    absent from the output, mirroring the other dedup operators.
    """
    hashed = df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), n)).alias("s"),
    ).select("doc", portable_shingle_hash(F.col("s")).alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    packed = reduce(
        operator.add,
        [
            F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            for b in range(bits)
        ],
    )
    return hashed.groupBy("doc").agg(*votes).select("doc", packed.alias("fp"))


def _chunk_layout(bits: int, bands: int) -> list[tuple[int, int]]:
    """(offset, width) per band, widths as even as possible over ``bits``."""
    base, rem = divmod(bits, bands)
    widths = [base + 1] * rem + [base] * (bands - rem)
    offsets, off = [], 0
    for w in widths:
        offsets.append((off, w))
        off += w
    return offsets


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bits: int = SIMHASH_BITS,
    max_hamming: int = 3,
    bands: int | None = None,
) -> DataFrame:
    """EXACT SimHash near-dup pairs: every pair of docs whose fingerprints are
    within hamming distance ≤ ``max_hamming``. Columns: doc1 < doc2, hamming.

    Blocking (multi-index hashing, Norouzi et al.): split the fingerprint into
    ``bands`` bit-chunks; by pigeonhole a pair differing in ≤ bands-1 bits
    shares at least one identical chunk, so candidate generation is an
    equi-join on (chunk_idx, chunk_val) — short uniform keys, never all-pairs.
    ``bands`` defaults to ``max_hamming + 1``, the minimum that makes the
    guarantee hold; passing fewer bands raises rather than silently dropping
    pairs. Verification is native ``bit_count(xor)`` on the packed longs —
    100% recall by construction, zero false positives after the filter.

    Scale note: chunk width = bits/bands. Large max_hamming → narrow chunks →
    bigger candidate buckets (at max_hamming=12 over 62 bits, 4-5-bit chunks
    ≈ N²/32 candidates per chunk): keep max_hamming small at corpus scale or
    pre-partition by length/language before pairing.
    """
    if bands is None:
        bands = max_hamming + 1
    if bands <= max_hamming:
        raise ValueError(
            f"bands={bands} cannot guarantee recall for max_hamming={max_hamming}: "
            "pigeonhole requires bands >= max_hamming + 1"
        )
    if bands > bits:
        raise ValueError(f"bands={bands} exceeds fingerprint width {bits}")
    fps = simhash_fingerprints(df, id_col, text_col, n, bits).persist()
    chunks = fps.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftright(F.col("fp"), off)
                        .bitwiseAND(F.lit((1 << w) - 1))
                        .alias("chunk_val"),
                    )
                    for i, (off, w) in enumerate(_chunk_layout(bits, bands))
                ]
            )
        ).alias("c"),
    ).select("doc", "c.chunk_idx", "c.chunk_val")
    # distinct over bare id pairs (cheap, 2 longs); fingerprints re-joined after
    pair_ids = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["chunk_idx", "chunk_val"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc1"), F.col("b.doc").alias("doc2"))
        .distinct()
    )
    cand = pair_ids.join(
        fps.select(F.col("doc").alias("doc1"), F.col("fp").alias("fp1")), "doc1"
    ).join(fps.select(F.col("doc").alias("doc2"), F.col("fp").alias("fp2")), "doc2")
    hamming = F.bit_count(F.col("fp1").bitwiseXOR(F.col("fp2"))).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "hamming")
    )
