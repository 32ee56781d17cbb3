"""Incremental dedup against a persisted signature index (r7 verdict #5).

The delta shape an evolving 100 TB corpus actually needs: batches
arrive continuously, and deduping a new batch must cost O(batch +
matched state), never a rescan of history. The LSH side of the
historical corpus is persisted ONCE — the banded minhash table plus the
hashed-shingle sets (``dedup.lsh_band_table`` / ``hashed_shingle_sets``,
the exact tables ``minhash_lsh_pairs`` builds inline) — and each
incoming batch probes it:

    build_minhash_index(history, index_path)          # once / per-merge
    pairs = dedup_batch_against_index(spark, index_path, batch)
    append_to_index(batch, index_path)                # accept the batch

Semantics: ``dedup_batch_against_index`` returns CROSS pairs only
(batch doc × indexed doc) — batch-internal near-dups are the existing
``minhash_lsh_pairs(batch)`` (tiny, batch-sized). Candidacy and
verification replicate ``minhash_lsh_pairs`` exactly (same shingle
hashing, banding, exact-Jaccard verify with 6dp rounding), so with
``min_band_collisions=1`` the output equals the full-corpus pair set
restricted to batch-involving cross pairs (pinned by
tests/test_incremental_dedup.py) and the DuckDB exact-pair oracle
replays it.

Scale shape: the probe joins batch bands against the persisted band
table on (band_idx, band_hash) — equi-keyed, never all-pairs. With
``bucket_bands`` set, the band table is written BUCKETED on the full
join key (band_idx, band_hash) (``operators/bucketing.save_bucketed``
— EnsureRequirements elides the shuffle only on full-key
co-partitioning), so the probe join shuffles
ONLY the batch side — the history side reads bucket-aligned with no
Exchange (pinned by tests/test_incremental_dedup.py); the band scan
itself is columnar over three small integer columns. Hot buckets are
capped at probe time by the JOINED per-key row count (|batch bucket|
× |history bucket| — the actual quadratic term), mirroring
``max_bucket_size``. Verification ships shingle arrays only for
candidate docs. ``append_to_index`` is an O(batch) append — the
rollup_refresh philosophy applied to dedup. (Bucket metadata lives in
the session catalog; a different session reading the same
``index_path`` falls back to the plain parquet files and merely loses
the shuffle elision.)

Reference analogue: the snapshot-diff delta machinery
(/root/reference/airflow/dags/update_es.py:249-313) — process what
changed, not the world; re-expressed for near-duplicate state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from collection_templates_spark.operators.dedup import (
    hashed_shingle_sets,
    lsh_band_table,
)
from collection_templates_spark.operators.scratch import scratch_dir


def scratch_index_path() -> str:
    """Unique PID-owned scratch directory for a signature index
    (lifecycle in ``operators/scratch.scratch_dir``)."""
    return scratch_dir("spark_dedup_index_")


def _completed_epoch_dirs(
    index_path: str, sub: str, min_epoch: int = -1
) -> list[str]:
    """Streaming epoch segment dirs under ``index_path/<sub>/epoch=N``
    whose completion marker ``index_path/_epochs/N`` exists — the
    marker-gated view that makes crashed half-epochs invisible to the
    probe (see streaming/delta_stream.py for the write protocol).
    Epochs ≤ ``min_epoch`` (the compaction watermark — already folded
    into the live base, see operators/index_maintenance) are skipped
    even if their markers still exist: the pointer flip, not the GC,
    is what retires a segment."""
    import glob
    import os

    out = []
    for d in sorted(glob.glob(os.path.join(index_path, sub, "epoch=*"))):
        n = d.rsplit("=", 1)[-1]
        if int(n) <= min_epoch:
            continue
        if os.path.exists(os.path.join(index_path, "_epochs", n)):
            out.append(d)
    return out


def _resolve_dedup_layout(spark: SparkSession, index_path: str) -> dict:
    """The live base layout: the ``_layout.json`` pointer when a
    compaction has published one, else the legacy append-only layout
    (``bands``/``shingles``, watermark −1, the md5-keyed catalog
    name)."""
    from collection_templates_spark.operators.index_maintenance import (
        DEDUP_DEFAULT_LAYOUT,
        read_layout,
    )

    defaults = dict(DEDUP_DEFAULT_LAYOUT)
    defaults["bands_table"] = _bands_table_name(index_path)
    return read_layout(index_path, defaults)


def _bands_table_name(index_path: str) -> str:
    """Stable catalog name for a bucketed band table (bucket metadata
    is catalog-keyed; the parquet files live under ``index_path``)."""
    import hashlib

    return (
        "dedup_idx_bands_"
        + hashlib.md5(index_path.encode()).hexdigest()[:12]
    )


def build_minhash_index(
    df: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    rows_per_band: int = 2,
    bucket_bands: int | None = None,
    _mode: str = "overwrite",
) -> None:
    """Persist the probe-able LSH state of a corpus under
    ``index_path``: ``bands/`` (doc, band_idx, band_hash) and
    ``shingles/`` (doc, sh: array<long>). One corpus pass feeds both
    writes (band table + verification sets). ``bucket_bands`` writes
    the band table bucketed on (band_idx, band_hash) so every later
    probe join shuffles only the batch side (see module docstring)."""
    spark = df.sparkSession
    if _mode == "overwrite":
        # a rebuild subsumes any streaming epoch segments AND any
        # compaction-published layout: stale segments, markers, pointer
        # and versioned dirs/tables must not outlive the base they
        # were deltas OF (same catalog-vs-layout principle as below)
        import os
        import shutil

        from collection_templates_spark.operators.index_maintenance import (
            clear_layout,
            clear_tombstones,
        )

        clear_tombstones(index_path)
        old = _resolve_dedup_layout(spark, index_path)
        if old["bands_table"]:
            spark.sql(f"DROP TABLE IF EXISTS {old['bands_table']}")
        for sub in ("bands_epochs", "shingles_epochs", "_epochs"):
            shutil.rmtree(os.path.join(index_path, sub), ignore_errors=True)
        if os.path.isdir(index_path):
            for name in os.listdir(index_path):
                if name.startswith(("bands_v", "shingles_v")):
                    shutil.rmtree(
                        os.path.join(index_path, name), ignore_errors=True
                    )
        clear_layout(index_path)
        bands_rel, sets_rel = "bands", "shingles"
        table = _bands_table_name(index_path)
    else:
        # appends land in the LIVE base published by the last
        # compaction (or the legacy dirs when none was)
        live = _resolve_dedup_layout(spark, index_path)
        bands_rel, sets_rel = live["bands"], live["shingles"]
        table = live["bands_table"] or _bands_table_name(index_path)
    # lineage cut: the interpreted shingle-hash chain is the plan's
    # most expensive stage (r4 perf notes) and feeds BOTH writes — a
    # lazy localCheckpoint makes it one corpus pass, not two
    sets = hashed_shingle_sets(df, id_col, text_col, n).localCheckpoint(
        eager=False
    )
    bands = lsh_band_table(sets, num_hashes, rows_per_band)
    if bucket_bands is not None:
        from collection_templates_spark.operators.bucketing import (
            save_bucketed,
        )

        save_bucketed(
            bands,
            table,
            ("band_idx", "band_hash"),
            num_buckets=bucket_bands,
            path=f"{index_path}/{bands_rel}",
            mode=_mode,
        )
    else:
        if _mode == "overwrite":
            # a previous BUCKETED build of this same path left a catalog
            # entry describing bucket-named files; overwriting with plain
            # parquet underneath it would make later probes read through
            # the stale spec and fail with 'Invalid bucket file' — the
            # catalog must never outlive the layout it describes
            spark.sql(f"DROP TABLE IF EXISTS {table}")
        bands.write.mode(_mode).parquet(f"{index_path}/{bands_rel}")
    sets.write.mode(_mode).parquet(f"{index_path}/{sets_rel}")


def append_to_index(
    df: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    rows_per_band: int = 2,
    bucket_bands: int | None = None,
) -> None:
    """Accept a deduped batch into the historical index — an O(batch)
    append of its bands and shingle sets (bucketed appends write one
    more file set per bucket; pass the SAME ``bucket_bands`` as the
    build). Callers own id uniqueness across appends (same contract as
    any append-only log)."""
    build_minhash_index(
        df, index_path, id_col, text_col, n, num_hashes, rows_per_band,
        bucket_bands=bucket_bands, _mode="append",
    )


def delete_from_index(
    spark: SparkSession,
    index_path: str,
    doc_ids,
) -> None:
    """Retract documents from the persisted index (takedowns,
    re-crawls): an O(delete-batch) tombstone append — no base rewrite.
    Tombstoned docs stop appearing in every later probe (bands,
    shingle sets AND streaming epoch segments are all masked), and
    the next ``compact_minhash_index`` folds them out of the base for
    good. ``doc_ids`` is a one-column DataFrame or a list of ids.
    Idempotent; deleting a never-indexed id is a no-op."""
    from collection_templates_spark.operators.index_maintenance import (
        append_tombstones,
    )

    append_tombstones(spark, index_path, doc_ids, "doc")


def dedup_batch_against_index(
    spark: SparkSession,
    index_path: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    max_bucket_size: int | None = 1000,
    min_band_collisions: int = 1,
) -> DataFrame:
    """Near-duplicate pairs between ``batch`` and the indexed corpus:
    (doc_new, doc_old, jaccard) with exact n-gram Jaccard ≥ threshold,
    6dp-rounded — the same verify expression as ``minhash_lsh_pairs``.

    ``n``/``num_hashes``/``rows_per_band`` must match the index build
    (they define the band hashes being probed). The default
    ``min_band_collisions=1`` makes the output the exact cross-pair set
    up to the standard banding miss (~(1-j^r)^b per pair); raise it for
    stress-scale probes exactly like the full-corpus operator.

    Streaming epoch segments: the streaming delta pipeline
    (streaming/delta_stream.py) accepts batches as MARKER-GATED epoch
    directories under ``index_path/{bands,shingles}_epochs/epoch=N``.
    Segments whose completion marker (``_epochs/N``) exists are part of
    the index; unmarked (crashed half-epoch) segments are ignored —
    that invisibility is what makes a recovery replay of a crashed
    epoch recompute the SAME accepted set instead of probing the batch
    against itself. Each segment side is joined separately and unioned
    AFTER the join, so a bucketed base keeps its shuffle-elision."""
    # bucketed index (same session as the build): read through the
    # catalog so the probe join inherits the bucket partitioning and
    # only the batch side shuffles; otherwise plain parquet. Base dirs,
    # catalog name and the epoch watermark all come from the live
    # layout pointer (operators/index_maintenance) so a compacted index
    # is probed exactly like a fresh one.
    lay = _resolve_dedup_layout(spark, index_path)
    wm = lay["epoch_watermark"]
    tbl = lay["bands_table"]
    if tbl and spark.catalog.tableExists(tbl):
        hist_bands = spark.table(tbl)
    else:
        hist_bands = spark.read.parquet(f"{index_path}/{lay['bands']}")
    hist_sets = spark.read.parquet(f"{index_path}/{lay['shingles']}")
    seg_band_dirs = _completed_epoch_dirs(index_path, "bands_epochs", wm)
    seg_set_dirs = _completed_epoch_dirs(index_path, "shingles_epochs", wm)
    if seg_set_dirs:
        hist_sets = hist_sets.select("doc", "sh").unionByName(
            spark.read.parquet(*seg_set_dirs).select("doc", "sh")
        )
    # tombstone mask (delete_from_index): drop retracted docs from the
    # BAND side before the probe join — a broadcast anti-join preserves
    # the streamed side's partitioning, so a bucketed band table keeps
    # its shuffle elision, and the bucket-size cap then counts only
    # surviving candidates (probe ≡ rebuild-from-survivors, pinned by
    # test). The sets side follows so verification never ships a
    # deleted doc's shingles.
    from collection_templates_spark.operators.index_maintenance import (
        read_tombstones,
    )

    tomb = read_tombstones(spark, index_path, "doc")

    def _mask(df: DataFrame) -> DataFrame:
        if tomb is None:
            return df
        return df.join(F.broadcast(tomb), "doc", "left_anti")

    hist_bands = _mask(hist_bands)
    hist_sets = _mask(hist_sets)

    # The batch's sets feed band build AND verification; batch-sized, so
    # a lazy lineage cut is cheap insurance against double scan work.
    bsets = hashed_shingle_sets(batch, id_col, text_col, n).localCheckpoint(
        eager=False
    )
    bbands = lsh_band_table(bsets, num_hashes, rows_per_band)

    def _probe(hb: DataFrame) -> DataFrame:
        return bbands.select(
            F.col("doc").alias("doc_new"), "band_idx", "band_hash"
        ).join(
            hb.select(
                F.col("doc").alias("doc_old"), "band_idx", "band_hash"
            ),
            ["band_idx", "band_hash"],
        )

    joined = _probe(hist_bands)
    if seg_band_dirs:
        joined = joined.unionByName(
            _probe(_mask(spark.read.parquet(*seg_band_dirs)))
        )
    if max_bucket_size is not None:
        # cap the JOINED per-key candidate count — |batch bucket| ×
        # |history bucket| is the real quadratic term; counting the join
        # output touches only keys the batch actually probes
        kept = (
            joined.groupBy("band_idx", "band_hash")
            .agg(F.count("*").alias("___bn"))
            .filter(F.col("___bn") <= max_bucket_size)
            .select("band_idx", "band_hash")
        )
        joined = joined.join(kept, ["band_idx", "band_hash"], "left_semi")
    pair_stream = joined.select("doc_new", "doc_old")
    if min_band_collisions > 1:
        candidates = (
            pair_stream.groupBy("doc_new", "doc_old")
            .agg(F.count("*").alias("___nb"))
            .filter(F.col("___nb") >= min_band_collisions)
            .select("doc_new", "doc_old")
        )
    else:
        candidates = pair_stream.distinct()

    s_new = bsets.select(
        F.col("doc").alias("doc_new"), F.col("sh").alias("sh_new")
    )
    s_old = hist_sets.select(
        F.col("doc").alias("doc_old"), F.col("sh").alias("sh_old")
    )
    n_common = F.size(F.array_intersect("sh_new", "sh_old"))
    jaccard = F.round(
        n_common / (F.size("sh_new") + F.size("sh_old") - n_common), 6
    )
    return (
        candidates.join(s_new, "doc_new")
        .join(s_old, "doc_old")
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_new", "doc_old", "jaccard")
    )
