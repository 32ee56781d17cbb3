"""Compaction for the persisted incremental indexes (r12 verdict #6).

``incremental_ann.append_to_ivf_index`` and
``incremental_dedup.append_to_index`` are append-only: every accepted
batch adds one parquet file set per cluster partition / band bucket,
and the streaming delta pipeline adds one epoch segment directory per
micro-batch. After thousands of batches the probe's partition-pruned
read degrades on FILE COUNT (listing + footer + task overhead per
file) — the classic streaming-ingest failure at 100 TB, where the
data volume is fine but the metadata volume is not.

``compact_ivf_index`` / ``compact_minhash_index`` rewrite the
accumulated state into one file per cluster / a fresh bucketed or
plain base that FOLDS IN the marker-complete streaming epochs, with a
crash-safe publication protocol:

- every compacted base is written to a fresh VERSIONED directory
  (``vectors_v3``, ``bands_v3`` …) — never in place;
- a single pointer file ``_layout.json`` names the live base dirs,
  the live bucketed-table name (dedup), and the epoch WATERMARK
  (highest epoch folded into the base). It is published atomically
  (tmp + ``os.replace``), so every reader sees either the old layout
  (old base + all marked segments) or the new one (new base +
  segments above the watermark) — never a half state and never a
  double-count. This is the snapshot-pointer pattern (Iceberg-style
  manifest, reduced to the one pointer these indexes need);
- garbage collection (old base dirs, folded segment dirs + markers,
  the old catalog table) runs LAST and is idempotent: a crash leaves
  only unreferenced directories, which the next compaction removes.

Readers resolve through :func:`read_layout`; a missing pointer file
yields the legacy layout (``bands``/``shingles``/``vectors``,
watermark −1), so pre-compaction indexes keep working unchanged.

Reference analogue: none (the reference has no incremental index);
this is standard LSM/streaming-table maintenance (the OPTIMIZE step
every table format grows) applied to the repo's two probe-able
indexes.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LAYOUT_FILE = "_layout.json"


def read_layout(index_path: str, defaults: dict) -> dict:
    """The live layout pointer, or ``defaults`` when none was ever
    published (legacy append-only index)."""
    p = os.path.join(index_path, LAYOUT_FILE)
    if not os.path.exists(p):
        return dict(defaults)
    with open(p) as fh:
        out = dict(defaults)
        out.update(json.load(fh))
        return out


def write_layout(index_path: str, layout: dict) -> None:
    """Atomic pointer publication: readers see the old layout or the
    new one, never a torn file."""
    p = os.path.join(index_path, LAYOUT_FILE)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(layout, fh)
    os.replace(tmp, p)


def clear_layout(index_path: str) -> None:
    """Drop the pointer (a full rebuild resets to the legacy layout)."""
    try:
        os.remove(os.path.join(index_path, LAYOUT_FILE))
    except FileNotFoundError:
        pass


TOMBSTONE_DIR = "tombstones"


def append_tombstones(
    spark: SparkSession,
    index_path: str,
    ids,
    id_col: str,
) -> None:
    """Record deleted ids as an append-only tombstone segment under
    ``index_path/tombstones/cover=<E>/`` — the retraction half of the
    index delta story (takedowns, re-crawls). ``ids`` is a one-column
    DataFrame (any column name) or a plain Python list. Deletes are
    idempotent: re-tombstoning an id (or tombstoning one that was
    never indexed) is a no-op at probe time, which is also what makes
    the compaction GC crash-window safe (a tombstone that outlives
    the base fold re-removes rows that are already gone).

    ``cover=<E>`` stamps the segment with the highest epoch the delete
    can reach (the max completed-epoch marker, or the published
    watermark when everything is folded): a fold may GC a tombstone
    only once its fold watermark passes E — without the stamp, a
    tombstone masking an epoch segment that completed after the fold's
    segment listing would be GC'd before any fold ever anti-joined it,
    resurfacing the deleted doc (ADVICE r14). Note the masking window:
    deleting an id and re-ingesting it later keeps the NEW copy masked
    at probe time until a compaction folds the tombstone away — run
    ``compact_*`` between a delete and a re-ingest of the same id."""
    if isinstance(ids, DataFrame):
        # cast to long: the list branch writes long, and mixing physical
        # int widths across tombstone segments makes multi-file schema
        # resolution fragile (ADVICE r14)
        df = ids.select(
            F.col(ids.columns[0]).cast("long").alias(id_col)
        )
    else:
        df = spark.createDataFrame(
            [(i,) for i in ids], f"{id_col} long"
        )
    cover = _current_cover_epoch(index_path)
    df.coalesce(1).write.mode("append").parquet(
        os.path.join(index_path, TOMBSTONE_DIR, f"cover={cover}")
    )


def _current_cover_epoch(index_path: str) -> int:
    """Highest epoch a tombstone appended NOW could be masking: the max
    completed-epoch marker still on disk (unfolded segments), falling
    back to the published watermark (all folded into base). -1 for
    epoch-less indexes (the IVF vector dir), whose tombstones cover
    only the base and are GC-safe at any fold."""
    cover = -1
    marker_dir = os.path.join(index_path, "_epochs")
    if os.path.isdir(marker_dir):
        for name in os.listdir(marker_dir):
            try:
                cover = max(cover, int(name))
            except ValueError:
                pass
    layout_p = os.path.join(index_path, LAYOUT_FILE)
    if os.path.exists(layout_p):
        try:
            with open(layout_p) as fh:
                cover = max(
                    cover, int(json.load(fh).get("epoch_watermark", -1))
                )
        except (ValueError, OSError, TypeError):
            pass
    return cover


def _tombstone_cover(path: str) -> int:
    """Cover epoch of a tombstone data file (from its ``cover=<E>``
    path segment; legacy flat files cover only the base: -1)."""
    for part in path.split(os.sep):
        if part.startswith("cover="):
            try:
                return int(part.split("=", 1)[1])
            except ValueError:
                return -1
    return -1


def tombstone_files(index_path: str) -> list[str]:
    """The tombstone segment data files currently on disk — the
    snapshot compaction folds (files appended AFTER the snapshot
    survive the fold's GC untouched)."""
    d = os.path.join(index_path, TOMBSTONE_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for root, _, files in os.walk(d):
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith("_")
        )
    return sorted(out)


def read_tombstones(
    spark: SparkSession,
    index_path: str,
    id_col: str,
    files: list[str] | None = None,
):
    """Distinct tombstoned ids (``files`` restricts to a compaction
    snapshot), or None when no tombstone was ever written."""
    fs = tombstone_files(index_path) if files is None else files
    if not fs:
        return None
    return spark.read.parquet(*fs).select(id_col).distinct()


def clear_tombstones(index_path: str) -> None:
    """Drop all tombstone state (a full index rebuild starts clean)."""
    shutil.rmtree(
        os.path.join(index_path, TOMBSTONE_DIR), ignore_errors=True
    )


def _gc_tombstone_files(index_path: str, files: list[str]) -> None:
    """Remove the folded tombstone snapshot (idempotent; crash-safe
    because re-applying a folded tombstone is a no-op)."""
    for f in files:
        try:
            os.remove(f)
        except FileNotFoundError:
            pass


def parquet_file_count(*dirs: str) -> int:
    """Data files under the given roots — the metadata-pressure metric
    compaction exists to shrink."""
    n = 0
    for d in dirs:
        for _, _, files in os.walk(d):
            n += sum(
                1
                for f in files
                if f.endswith(".parquet") and not f.startswith("_")
            )
    return n


def _next_version(index_path: str, stem: str) -> int:
    v = 0
    for name in os.listdir(index_path):
        if name.startswith(f"{stem}_v"):
            try:
                v = max(v, int(name.rsplit("_v", 1)[-1]))
            except ValueError:
                pass
    return v + 1


def _gc(paths: list[str]) -> None:
    for p in paths:
        shutil.rmtree(p, ignore_errors=True)


# ---------------------------------------------------------------------------
# IVF vector index
# ---------------------------------------------------------------------------

ANN_DEFAULT_LAYOUT = {"vectors": "vectors"}


def compact_ivf_index(spark: SparkSession, index_path: str) -> dict:
    """Rewrite the accumulated vector partitions into ONE file per
    cluster (bin-packing rewrite: ``repartition("cluster")`` sends each
    cluster to exactly one task, so each ``cluster=…`` directory gets
    exactly one data file), published via the versioned-dir + atomic
    pointer protocol. Probe results are INVARIANT (pinned by test):
    compaction moves bytes, not rows.

    Returns {"files_before", "files_after", "version"}.
    """
    layout = read_layout(index_path, ANN_DEFAULT_LAYOUT)
    cur = os.path.join(index_path, layout["vectors"])
    files_before = parquet_file_count(cur)
    v = _next_version(index_path, "vectors")
    new_rel = f"vectors_v{v}"
    new_dir = os.path.join(index_path, new_rel)
    # fold the tombstone snapshot: deleted vectors leave the base for
    # good (files appended after this listing survive the GC and keep
    # masking at probe time — idempotent either way)
    tomb_snapshot = tombstone_files(index_path)
    vecs = spark.read.parquet(cur)
    tomb = read_tombstones(spark, index_path, "vec_id", tomb_snapshot)
    if tomb is not None:
        vecs = vecs.join(F.broadcast(tomb), "vec_id", "left_anti")
    (
        vecs.repartition(F.col("cluster"))
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(new_dir)
    )
    write_layout(index_path, {"vectors": new_rel})
    _gc([cur])
    _gc_tombstone_files(index_path, tomb_snapshot)
    return {
        "files_before": files_before,
        "files_after": parquet_file_count(new_dir),
        "version": v,
        "tombstones_folded": len(tomb_snapshot),
    }


# ---------------------------------------------------------------------------
# MinHash signature index
# ---------------------------------------------------------------------------

DEDUP_DEFAULT_LAYOUT = {
    "bands": "bands",
    "shingles": "shingles",
    "epoch_watermark": -1,
    # legacy catalog name; None ⇒ plain parquet only
    "bands_table": None,
}


def compact_minhash_index(
    spark: SparkSession,
    index_path: str,
    bucket_bands: int | None = None,
    target_set_files: int = 8,
) -> dict:
    """Fold the marker-complete streaming epoch segments into a fresh
    base (bands + shingles) and rewrite the append-fragmented files —
    the maintenance step that keeps ``dedup_batch_against_index``'s
    probe O(probed buckets), not O(accumulated batch count).

    ``bucket_bands`` re-buckets the new base on (band_idx, band_hash)
    under a VERSIONED catalog name (the old table stays live until the
    pointer flips — the catalog never leads the pointer, so no reader
    can pair the new base with the old watermark or vice versa).

    Crash-safety (each window leaves a valid index):
    - after the new base is written, before the pointer flips → readers
      still resolve the old base + all marked segments;
    - after the pointer flips → new base + segments above the
      watermark; the folded segments' markers are now ignored even
      though GC hasn't removed them yet;
    - GC is idempotent cleanup of unreferenced state.

    Returns {"files_before", "files_after", "epochs_folded",
    "version"}.
    """
    from collection_templates_spark.operators.incremental_dedup import (
        _bands_table_name,
        _completed_epoch_dirs,
        _resolve_dedup_layout,
    )

    layout = _resolve_dedup_layout(spark, index_path)
    wm = layout["epoch_watermark"]
    seg_band_dirs = _completed_epoch_dirs(index_path, "bands_epochs", wm)
    seg_set_dirs = _completed_epoch_dirs(index_path, "shingles_epochs", wm)
    folded = [int(d.rsplit("=", 1)[-1]) for d in seg_band_dirs]
    new_wm = max(folded, default=wm)

    old_band_dir = os.path.join(index_path, layout["bands"])
    old_set_dir = os.path.join(index_path, layout["shingles"])
    files_before = parquet_file_count(old_band_dir, old_set_dir) + sum(
        parquet_file_count(d) for d in seg_band_dirs + seg_set_dirs
    )

    if layout["bands_table"] and spark.catalog.tableExists(
        layout["bands_table"]
    ):
        bands: DataFrame = spark.table(layout["bands_table"])
    else:
        bands = spark.read.parquet(old_band_dir)
    if seg_band_dirs:
        bands = bands.select("doc", "band_idx", "band_hash").unionByName(
            spark.read.parquet(*seg_band_dirs).select(
                "doc", "band_idx", "band_hash"
            )
        )
    sets = spark.read.parquet(old_set_dir)
    if seg_set_dirs:
        sets = sets.select("doc", "sh").unionByName(
            spark.read.parquet(*seg_set_dirs).select("doc", "sh")
        )
    # fold the tombstone snapshot: deleted docs leave band table AND
    # shingle sets. Every tombstone on disk is anti-joined (masking is
    # idempotent), but only those whose cover epoch this fold passes
    # are GC'd below — a tombstone covering an epoch segment that
    # completed after the segment listing above survives until the
    # fold that actually folds that segment (ADVICE r14: the previous
    # snapshot GC could resurface such a delete under concurrent
    # ingest).
    tomb_snapshot = tombstone_files(index_path)
    tomb = read_tombstones(spark, index_path, "doc", tomb_snapshot)
    if tomb is not None:
        bands = bands.join(F.broadcast(tomb), "doc", "left_anti")
        sets = sets.join(F.broadcast(tomb), "doc", "left_anti")

    v = _next_version(index_path, "bands")
    new_band_rel, new_set_rel = f"bands_v{v}", f"shingles_v{v}"
    new_band_dir = os.path.join(index_path, new_band_rel)
    new_set_dir = os.path.join(index_path, new_set_rel)
    new_table = None
    if bucket_bands is not None:
        from collection_templates_spark.operators.bucketing import (
            save_bucketed,
        )

        new_table = f"{_bands_table_name(index_path)}_v{v}"
        save_bucketed(
            bands,
            new_table,
            ("band_idx", "band_hash"),
            num_buckets=bucket_bands,
            path=new_band_dir,
        )
    else:
        # one file per band index: bounded file count (the band count is
        # configuration), parallel write, and a later filter on band_idx
        # still maps to whole files
        bands.repartition(F.col("band_idx")).write.mode(
            "overwrite"
        ).parquet(new_band_dir)
    sets.repartition(target_set_files).write.mode("overwrite").parquet(
        new_set_dir
    )

    old_table = layout["bands_table"]
    write_layout(
        index_path,
        {
            "bands": new_band_rel,
            "shingles": new_set_rel,
            "epoch_watermark": new_wm,
            "bands_table": new_table,
        },
    )
    # GC (idempotent; pointer already live)
    if old_table and old_table != new_table:
        spark.sql(f"DROP TABLE IF EXISTS {old_table}")
    _gc(
        [old_band_dir, old_set_dir]
        + seg_band_dirs
        + seg_set_dirs
    )
    for e in folded:
        try:
            os.remove(os.path.join(index_path, "_epochs", str(e)))
        except FileNotFoundError:
            pass
    covered = [
        f for f in tomb_snapshot if _tombstone_cover(f) <= new_wm
    ]
    _gc_tombstone_files(index_path, covered)
    return {
        "files_before": files_before,
        "files_after": parquet_file_count(new_band_dir, new_set_dir),
        "epochs_folded": len(folded),
        "version": v,
        "tombstones_folded": len(covered),
    }


# ---------------------------------------------------------------------------
# Streaming monitor state (epoch-segment histograms/sketches)
# ---------------------------------------------------------------------------


def read_state_with_base(
    spark: SparkSession,
    state_dir: str,
    sub: str,
    complete_epochs: list[int],
    exclude_epoch: int | None = None,
):
    """Cumulative monitor state = the compacted base (when a pointer
    was published) + marker-complete epoch segments ABOVE the
    watermark — the shared read path of the PSI and quantile stream
    monitors. Returns None when there is no state at all."""
    lay = read_layout(
        state_dir, {f"{sub}_base": None, f"{sub}_watermark": -1}
    )
    wm = lay[f"{sub}_watermark"]
    dirs = [
        os.path.join(state_dir, sub, f"epoch={e}")
        for e in complete_epochs
        if e > wm
        and e != exclude_epoch
        and os.path.isdir(os.path.join(state_dir, sub, f"epoch={e}"))
    ]
    parts = []
    if lay[f"{sub}_base"]:
        parts.append(
            spark.read.parquet(os.path.join(state_dir, lay[f"{sub}_base"]))
        )
    if dirs:
        parts.append(spark.read.parquet(*dirs))
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_state_segments(
    spark: SparkSession,
    state_dir: str,
    sub: str,
    group_cols: tuple[str, ...],
    cnt_col: str = "n",
) -> dict:
    """Fold a streaming monitor's marker-complete epoch segments into
    ONE merged base table (count addition over ``group_cols`` — the
    segments are mergeable sufficient statistics by construction), so
    the per-micro-batch cumulative read stops costing O(epochs): the
    same versioned-dir + atomic-pointer + watermark protocol as the
    index compactors, with one difference — the EPOCH MARKERS are NOT
    removed, because they also gate the monitor's per-epoch OUTPUT log
    (read_psi_log / read_quantile_log); only the folded segment
    directories are GC'd, and the watermark is what retires them from
    the state read (crash-safe: a stale folded segment is ignored even
    if GC died).

    Returns {"epochs_folded", "files_before", "files_after",
    "version"}.
    """
    lay = read_layout(
        state_dir, {f"{sub}_base": None, f"{sub}_watermark": -1}
    )
    wm = lay[f"{sub}_watermark"]
    import glob as _glob

    complete = sorted(
        int(os.path.basename(p))
        for p in _glob.glob(os.path.join(state_dir, "_epochs", "*"))
        if os.path.basename(p).isdigit()
    )
    fold = [e for e in complete if e > wm]
    seg_dirs = [
        os.path.join(state_dir, sub, f"epoch={e}")
        for e in fold
        if os.path.isdir(os.path.join(state_dir, sub, f"epoch={e}"))
    ]
    old_base = (
        os.path.join(state_dir, lay[f"{sub}_base"])
        if lay[f"{sub}_base"]
        else None
    )
    files_before = parquet_file_count(
        *( [old_base] if old_base else [] ), *seg_dirs
    )
    cur = read_state_with_base(spark, state_dir, sub, complete)
    if cur is None:
        return {
            "epochs_folded": 0,
            "files_before": 0,
            "files_after": 0,
            "version": 0,
        }
    merged = cur.groupBy(*group_cols).agg(
        F.sum(cnt_col).alias(cnt_col)
    )
    v = _next_version(state_dir, f"{sub}_base")
    new_rel = f"{sub}_base_v{v}"
    new_dir = os.path.join(state_dir, new_rel)
    merged.coalesce(1).write.mode("overwrite").parquet(new_dir)
    new_lay = read_layout(state_dir, {})
    new_lay[f"{sub}_base"] = new_rel
    new_lay[f"{sub}_watermark"] = max(fold, default=wm)
    write_layout(state_dir, new_lay)
    _gc(([old_base] if old_base else []) + seg_dirs)
    return {
        "epochs_folded": len(fold),
        "files_before": files_before,
        "files_after": parquet_file_count(new_dir),
        "version": v,
    }
