"""Randomized multi-batch stress for the streaming delta pipeline
(streaming/delta_stream.py): N document batches with planted
history-dups, batch-internal-fresh docs and CROSS-BATCH dups land as
files; the stream drains them per-file, and the accepted set + final
index state must equal the sequential batch replay — the
tests/test_stream_delta.py check scaled to arbitrary batch counts and
randomized content.

Usage: python tools/stress_stream_delta.py [n_batches] [docs_per_batch]
                                           [seed]
Exit 0 on equality, 1 on divergence.
"""

from __future__ import annotations

import random
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform "
    "victor whiskey xray yankee zulu"
).split()


def _text(rng: random.Random) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(20))


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    rng = random.Random(seed)

    from collection_templates_spark.operators.incremental_dedup import (
        append_to_index,
        build_minhash_index,
        dedup_batch_against_index,
    )
    from collection_templates_spark.session import get_spark
    from collection_templates_spark.streaming.delta_stream import (
        stream_delta_pipeline,
    )

    spark = get_spark("stress_stream_delta")
    base = "/tmp/stress_stream_delta"
    shutil.rmtree(base, ignore_errors=True)

    history = [(i, _text(rng)) for i in range(100)]
    next_id = 1000
    batches = []
    seen_texts = [t for _, t in history]
    for _ in range(n_batches):
        batch = []
        for _ in range(per_batch):
            roll = rng.random()
            if roll < 0.25 and seen_texts:
                txt = rng.choice(seen_texts)  # dup of history OR a
                # previously-accepted doc (cross-batch)
            else:
                txt = _text(rng)
            batch.append((next_id, txt))
            next_id += 1
        batches.append(batch)
        seen_texts.extend(t for _, t in batch)

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    # streaming side
    build_minhash_index(docs(history), f"{base}/idx_stream")
    for rows in batches:
        docs(rows).coalesce(1).write.mode("append").parquet(f"{base}/drop")
        time.sleep(1.1)
    q = stream_delta_pipeline(
        spark, f"{base}/drop", f"{base}/idx_stream",
        f"{base}/accepted", f"{base}/ckpt", docs(history).schema,
    )
    q.awaitTermination(600)
    got = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{base}/accepted").collect()
    )

    # batch replay
    build_minhash_index(docs(history), f"{base}/idx_batch")
    expected = []
    for rows in batches:
        pairs = dedup_batch_against_index(
            spark, f"{base}/idx_batch", docs(rows)
        )
        matched = {r.doc_new for r in pairs.collect()}
        kept = [r for r in rows if r[0] not in matched]
        expected.extend(k for k, _ in kept)
        if kept:
            append_to_index(docs(kept), f"{base}/idx_batch")
    expected.sort()

    ok = got == expected
    print(
        f"stream accepted {len(got)} / batch replay {len(expected)} "
        f"over {n_batches} batches x {per_batch} docs (seed {seed}): "
        f"{'EQUAL' if ok else 'DIVERGED'}"
    )
    if not ok:
        only_s = set(got) - set(expected)
        only_b = set(expected) - set(got)
        print(f"stream-only: {sorted(only_s)[:10]}")
        print(f"batch-only: {sorted(only_b)[:10]}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
