"""Distributed graph reachability (transitive closure).

Replaces the reference's per-member DFS over the Wikidata ``subclass_of``
ontology (reference: airflow/dags/create_collections.py:548-606 — a RocksDB
point-lookup DFS with an lru_cache) with a set-at-a-time iterative
frontier expansion, so validation becomes ONE semi-join instead of 29M
driver-side graph walks (SURVEY.md §2.3 J13, §7 step 4).

Scale notes (the subclass graph is ~3.4M edges, the instance set ~100M):
- We never materialize the full closure of the *instance* layer — only the
  closure of the small class-level graph, then semi-join instances to it.
- Each iteration is join + distinct (one shuffle each); lineage is cut with
  ``localCheckpoint`` so the plan doesn't grow linearly with depth.
- Cycles are tolerated: ``distinct`` + the subtract-known step make every
  frontier strictly new pairs, so a cycle converges instead of looping.
- Skew: the ancestor side of popular classes (Q5 "human" subtree) is hot;
  AQE skew-join handles it, and ``repartition`` on ``src`` before the loop
  keeps the join co-partitioned across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 30,
    checkpoint_every: int = 1,
) -> DataFrame:
    """All (src, dst) pairs such that dst is reachable from src.

    ``edges`` is a DataFrame with columns ``src``/``dst`` (direct edges are
    included in the result). Stops early when a fixpoint is reached.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint(eager=True)
    closure = e
    frontier = e
    for i in range(max_iterations):
        # expand: follow one more edge from the current frontier
        grown = (
            frontier.alias("f")
            .join(e.alias("e"), F.col("f.dst") == F.col("e.src"))
            .select(F.col("f.src").alias("src"), F.col("e.dst").alias("dst"))
            .distinct()
        )
        new_pairs = grown.join(closure, ["src", "dst"], "left_anti")
        if checkpoint_every and (i % checkpoint_every == 0):
            new_pairs = new_pairs.localCheckpoint(eager=True)
        if new_pairs.isEmpty():
            break
        closure = closure.unionByName(new_pairs).localCheckpoint(eager=True)
        frontier = new_pairs
    return closure


def reachable_from(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 30,
) -> DataFrame:
    """BFS from a seed set: returns (seed, reached) pairs.

    Cheaper than a full closure when only a subset of nodes matters (the
    reference only ever asks "is collection-type reachable from member-type",
    so seeding with the distinct member types bounds the state).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    seeds = sources.select(F.col(sources.columns[0]).alias("seed")).distinct()
    reached = seeds.select("seed", F.col("seed").alias("node"))
    frontier = reached
    for _ in range(max_iterations):
        grown = (
            frontier.join(e, frontier["node"] == e["src"])
            .select("seed", e["dst"].alias("node"))
            .distinct()
        )
        new_pairs = grown.join(reached, ["seed", "node"], "left_anti").localCheckpoint(
            eager=True
        )
        if new_pairs.isEmpty():
            break
        reached = reached.unionByName(new_pairs).localCheckpoint(eager=True)
        frontier = new_pairs
    return reached


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank — the canonical iterative-dataflow
    benchmark, expressed as the unrolled join/aggregate chain Catalyst
    can plan as ordinary shuffles (no driver loop state beyond the plan
    builder's Python `for`):

        p₀(v)   = 1/N
        pᵢ₊₁(v) = (1−d)/N + d·Σ_{u→v} round(pᵢ(u)/out(u), 9)

    Dangling nodes (no out-edges) leak their mass in the simple variant
    (``redistribute_dangling=False`` — stated in the docstring so the
    oracle matches by construction). With ``redistribute_dangling=True``
    (r6 verdict #6; real web graphs are ~25 % dangling, so leaked mass
    drifts every rank low) each sweep adds the standard uniform
    redistribution term:

        pᵢ₊₁(v) = (1−d)/N + d·(Σ_{u→v} round(pᵢ(u)/out(u), 9) + Dᵢ/N)
        Dᵢ     = round(Σ_{dangling u} pᵢ(u), 9)

    — Dᵢ is ONE scalar aggregate per sweep (an anti-join of the rank
    vector against the out-degree table), broadcast back, so the extra
    cost is a single short job, not a new shuffle of the edge list.
    Determinism: every per-edge contribution is 9dp-rounded before the
    sum and every iterate is 9dp-rounded after (the repo's fp
    convention), so the DuckDB replay hash-matches. Returns (node,
    pagerank) with the final 6dp rounding.

    Scale shape: per iteration ONE join of the rank vector against the
    edge list (shuffle keyed on src) + ONE dst-keyed aggregate —
    both map-side combined; out-degrees computed once. A fixed
    iteration count is the production norm for ranking signals (e.g.
    3–5 sweeps), which is exactly what makes the unrolled plan and its
    engine replay possible."""
    # Lazy local checkpoints: the edge list, node set and out-degree
    # table are referenced in EVERY sweep, and each reference would
    # otherwise recompute the caller's full edge-derivation plan
    # (measured 11.5 s → 2.9 s at sf0.1 for 3 sweeps over the
    # customer↔supplier graph). Iterative dataflow is the one shape
    # where materializing the loop-invariant inputs is mandatory — the
    # same reason GraphX caches its edge RDD. Lazy, so building the
    # plan still triggers no job.
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count("*").alias("___out")
    ).localCheckpoint(eager=False)
    n_nodes = nodes.agg(F.count("*").alias("___n"))
    ranks = nodes.join(F.broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("___n")).alias("pr")
    )
    # outdeg ⋈ edges is LOOP-INVARIANT: joining it once here (r16,
    # guide §2.2) removes one SortMergeJoin + its sort from EVERY
    # sweep — the unrolled plan shrinks by a join per iteration, which
    # is also driver-side analysis/AQE-stage cost (this family is
    # plan-floor-bound at bench scale: sf0.001 ≈ half the sf0.1 wall).
    # Inner-join order is exact: sources without out-edges appear in
    # neither e nor outdeg⋈e, so per-edge contributions are identical.
    e = edges.select(
        F.col(src_col).alias("___src"), F.col(dst_col).alias("___dst")
    ).join(
        outdeg.select(F.col("node").alias("___src"), "___out"), "___src"
    ).localCheckpoint(eager=False)
    for _ in range(iterations):
        if redistribute_dangling:
            # The rank iterate is consumed TWICE per sweep here (the
            # contribs join and the dangling-mass anti-join aggregate),
            # so without a lineage cut the plan tree doubles each
            # iteration (2^iterations copies of the sweep subtree) —
            # the exact dual-consumer shape hits() already guards
            # (r7 advice). Lazy, so plan building stays job-free; the
            # simple variant has a single consumer and needs no cut.
            ranks = ranks.localCheckpoint(eager=False)
        contribs = (
            ranks.join(e, ranks["node"] == e["___src"])
            .select(
                F.col("___dst").alias("node"),
                F.round(F.col("pr") / F.col("___out"), 9).alias("___c"),
            )
        )
        summed = contribs.groupBy("node").agg(F.sum("___c").alias("___s"))
        if redistribute_dangling:
            dang = ranks.join(outdeg, "node", "left_anti").agg(
                F.round(
                    F.coalesce(F.sum("pr"), F.lit(0.0)), 9
                ).alias("___dm")
            )
            ranks = (
                nodes.join(summed, "node", "left")
                .join(F.broadcast(n_nodes))
                .join(F.broadcast(dang))
                .select(
                    "node",
                    F.round(
                        (1.0 - damping) / F.col("___n")
                        + damping
                        * (
                            F.coalesce(F.col("___s"), F.lit(0.0))
                            + F.col("___dm") / F.col("___n")
                        ),
                        9,
                    ).alias("pr"),
                )
            )
        else:
            ranks = (
                nodes.join(summed, "node", "left")
                .join(F.broadcast(n_nodes))
                .select(
                    "node",
                    F.round(
                        (1.0 - damping) / F.col("___n")
                        + damping * F.coalesce(F.col("___s"), F.lit(0.0)),
                        9,
                    ).alias("pr"),
                )
            )
    return ranks.select("node", F.round("pr", 6).alias("pagerank"))


def hits(
    edges: DataFrame,
    iterations: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) — hubs & authorities as the
    same unrolled join/aggregate chain as ``pagerank``:

        a(v) ← Σ_{u→v} round(h(u), 9), then a ← round(a / max(a), 9)
        h(u) ← Σ_{u→v} round(a(v), 9), then h ← round(h / max(h), 9)

    Max-normalization instead of the textbook L2: the max of 9dp-rounded
    scores is an exact comparison, so the DuckDB replay reproduces the
    identical normalizer without order-dependent sqrt-of-sum-of-squares.
    Nodes outside an aggregation keep 0.0 (in a bipartite src→dst graph
    the dst side has hub 0 and the src side authority 0 — stated so the
    oracle matches by construction). Returns (node, hub, authority)
    rounded 6dp.

    Scale shape: per half-sweep ONE join of the score vector against the
    edge list + ONE map-side-combined aggregate, same as pagerank; the
    normalizer is a single scalar max broadcast back.

    No reference counterpart (public algorithm); part of the
    beyond-reference graph family alongside pagerank/transitive closure.
    """
    edges = edges.localCheckpoint(eager=False)
    e = edges.select(
        F.col(src_col).alias("___src"), F.col(dst_col).alias("___dst")
    )
    nodes = (
        e.select(F.col("___src").alias("node"))
        .union(e.select(F.col("___dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    hub = nodes.select("node", F.lit(1.0).alias("h"))
    auth = nodes.select("node", F.lit(0.0).alias("a"))
    for _ in range(iterations):
        a_raw = (
            hub.join(e, hub["node"] == e["___src"])
            .select(
                F.col("___dst").alias("node"),
                F.round(F.col("h"), 9).alias("___c"),
            )
            .groupBy("node")
            .agg(F.round(F.sum("___c"), 9).alias("___s"))
        )
        a_max = a_raw.agg(F.max("___s").alias("___mx"))
        # lazy checkpoint: each score vector feeds BOTH the next
        # half-sweep and the final (hub ⋈ authority) output, and without
        # the cut the deepest chain is recomputed once per consumer
        auth = (
            nodes.join(a_raw, "node", "left")
            .join(F.broadcast(a_max))
            .select(
                "node",
                F.round(
                    F.coalesce(F.col("___s"), F.lit(0.0)) / F.col("___mx"),
                    9,
                ).alias("a"),
            )
            .localCheckpoint(eager=False)
        )
        h_raw = (
            auth.join(e, auth["node"] == e["___dst"])
            .select(
                F.col("___src").alias("node"),
                F.round(F.col("a"), 9).alias("___c"),
            )
            .groupBy("node")
            .agg(F.round(F.sum("___c"), 9).alias("___s"))
        )
        h_max = h_raw.agg(F.max("___s").alias("___mx"))
        hub = (
            nodes.join(h_raw, "node", "left")
            .join(F.broadcast(h_max))
            .select(
                "node",
                F.round(
                    F.coalesce(F.col("___s"), F.lit(0.0)) / F.col("___mx"),
                    9,
                ).alias("h"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        hub.join(auth, "node")
        .select(
            "node",
            F.round("h", 6).alias("hub"),
            F.round("a", 6).alias("authority"),
        )
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    assume_canonical: bool = False,
) -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation —
    the join formulation of Suri & Vassilvitskii (WWW 2011) / the
    Chiba–Nishizeki arboricity bound.

    Plan: distinct undirected edges (min, max); one degree aggregate
    (node-sized, eagerly checkpointed — it feeds BOTH endpoint joins,
    and without the cut each join side re-runs the union+aggregate over
    the edge table); each edge oriented AWAY from its (degree,
    id)-smaller endpoint, so every node's out-degree is O(√m) no matter
    how skewed the real degree distribution is — a hub of degree 10⁶
    contributes wedges only through its (few) higher-keyed neighbors.
    Wedges are bucket-collect over the checkpointed oriented edges
    (r15; repo rule: prefer bucket-collect over bucket self-joins): one
    shuffle groups each tail's out-neighbors into a kv-sorted array
    (O(√m)-bounded, never hot) and posexplode + slice-explode
    enumerates the ordered pairs — same Σ outdeg² ≤ m^1.5 row bound as
    the old self-join with one Exchange of o instead of two and no
    sorts. One more join against the oriented edges finds each triangle
    exactly once, and a posexplode + count rolls the per-corner credit
    up per node. Nodes in no triangle are absent (callers left-join and
    zero-fill).

    ``assume_canonical``: the caller promises ``edges`` is already the
    distinct (a < b) canonical edge set behind a lineage cut (e.g.
    clustering_coefficient's checkpoint) — skips a redundant
    distinct+checkpoint of identical rows.

    No reference counterpart (the reference's graph work is the ontology
    BFS, SURVEY §2.3 J13); this is the LLM/graph-analytics extension
    suite alongside pagerank/HITS.
    """
    # e feeds THREE consumers (two degree scans + the orientation join);
    # without the lineage cut the whole upstream edge construction runs
    # once per consumer (measured 3× the projection cost on the
    # co-purchase bank row).
    if assume_canonical:
        e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        e = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("a"),
                F.greatest(F.col(src), F.col(dst)).alias("b"),
            )
            .filter(F.col("a") < F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=True)
    )
    keyed = e.join(
        deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b")
    fwd = F.struct(
        F.col("da").alias("kd"), F.col("a").alias("kn")
    ) < F.struct(F.col("db").alias("kd"), F.col("b").alias("kn"))
    o = keyed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(
            fwd, F.struct(F.col("db").alias("kd"), F.col("b").alias("kn"))
        )
        .otherwise(F.struct(F.col("da").alias("kd"), F.col("a").alias("kn")))
        .alias("kv"),
    ).localCheckpoint(eager=True)
    onb = o.groupBy("u").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("kv"), F.col("v")))
        ).alias("___nb")
    )
    wedges = onb.select(
        F.col("u").alias("t1"),
        F.posexplode("___nb").alias("___i", "___x"),
        "___nb",
    ).select(
        "t1",
        F.col("___x.v").alias("t2"),
        F.explode(
            F.slice(
                F.col("___nb"), F.col("___i") + F.lit(2), F.size("___nb")
            )
        ).alias("___y"),
    ).select("t1", "t2", F.col("___y.v").alias("t3"))
    tri = wedges.join(
        o.select(F.col("u").alias("t2"), F.col("v").alias("t3")),
        ["t2", "t3"],
    )
    return (
        tri.select(F.explode(F.array("t1", "t2", "t3")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def label_propagation(
    edges: DataFrame,
    left: str = "u",
    right: str = "v",
    iterations: int = 3,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007), made engine-replayable: every node starts
    labeled with its own id; each sweep every node SIMULTANEOUSLY
    adopts the most frequent label among its neighbors, ties broken by
    the smallest label; a FIXED iteration count. Asynchronous LPA (the
    paper's default) is order-dependent and unreproducible across
    partitionings — the synchronous variant with a total tie order is a
    pure function of (edges, iterations), which is what lets a DuckDB
    oracle replay it sweep for sweep. Output: (node, community).

    Scale: per sweep, one |E|-row equi-join (neighbor labels), one
    map-side-combined (node, label) count, one per-node argmax window
    — the window input is at most the distinct (node, label) pairs,
    degree-bounded per node. Labels are checkpointed per sweep so the
    plan doesn't grow with the sweep count. Isolated nodes never
    appear in ``edges`` and are simply absent (callers coalesce to
    self, the connected_components convention).
    """
    from pyspark.sql import Window

    # LAZY checkpoints throughout (r16): this row is job-floor-bound —
    # at bench scale sf0.001 measured SLOWER than sf0.1 (2.0 s vs
    # 1.8 s), i.e. the serialized per-sweep eager-checkpoint jobs WERE
    # the cost, not data. Lazy keeps every plan cut (each sweep's plan
    # still ends at the previous sweep's ExistingRDD) but materializes
    # all of them inside the single final action instead of 1 + sweeps
    # driver-blocking jobs. und is multi-consumed (every sweep) and
    # labels single-consumed (next sweep) — both materialize exactly
    # once either way.
    und = (
        edges.select(F.col(left).alias("a"), F.col(right).alias("b"))
        .unionByName(
            edges.select(F.col(right).alias("a"), F.col(left).alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = und.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("community")
    ).localCheckpoint(eager=False)
    w = Window.partitionBy("node").orderBy(
        F.desc("___n"), F.asc("community")
    )
    for _ in range(iterations):
        freq = (
            und.join(
                labels.select(
                    F.col("node").alias("b"),
                    F.col("community"),
                ),
                "b",
            )
            .groupBy(F.col("a").alias("node"), "community")
            .agg(F.count(F.lit(1)).alias("___n"))
        )
        labels = (
            freq.withColumn("___rn", F.row_number().over(w))
            .filter(F.col("___rn") == 1)
            .select("node", "community")
            .localCheckpoint(eager=False)
        )
    return labels


def kcore_stats(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    sweeps: int = 4,
) -> DataFrame:
    """Fixed-sweep k-core peeling summary: repeatedly drop nodes of
    degree < k and the edges touching them, reporting nodes/edges
    remaining after each sweep — the degeneracy-ordering workhorse
    (Matula & Beck 1983) that bounds community cores and feeds
    graph-sampling curricula. A FIXED sweep count (like the pagerank /
    HITS / LPA rows) keeps the operator replayable: run-to-convergence
    is data-dependent, per-sweep state is not.

    Plan per sweep: one degree aggregate over the current edge table
    (map-side combined), a broadcast-or-shuffle semi-join of survivors
    back onto both endpoints, and an eager localCheckpoint to cut the
    iterative lineage (the pagerank convention). All counts are
    integers — nothing to round.

    Output: ``sweeps`` rows (sweep, n_nodes, n_edges) where sweep i
    describes the graph AFTER i peels; a sweep that removes nothing is
    the fixed point (k-core reached).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out = None
    for sweep in range(1, sweeps + 1):
        deg = (
            e.select(F.col("a").alias("n"))
            .unionAll(e.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("n")
        e = (
            e.join(keep.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("n", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        stats = (
            e.select(F.explode(F.array("a", "b")).alias("n"))
            .agg(
                F.lit(sweep).alias("sweep"),
                F.count_distinct("n").cast("long").alias("n_nodes"),
                (F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
            )
        )
        out = stats if out is None else out.unionByName(stats)
    return out


def link_prediction_jaccard(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_center_degree: int = 64,
    k: int = 20,
) -> DataFrame:
    """Common-neighbor link prediction: for every NON-adjacent node
    pair sharing at least one neighbor, score by neighbor-set Jaccard
    cn/(d_a + d_b − cn) and return the top ``k`` — the classic
    missing-edge recommender (Liben-Nowell & Kleinberg 2003).

    Skew safety: wedges are generated only through CENTER nodes of
    degree ≤ ``max_center_degree`` (the PPJoin-style hot-node cap used
    across the dedup family, replayed identically by the oracle) — a
    hub with 10⁶ neighbors would otherwise fan out 10¹² candidate
    pairs. Degrees in the Jaccard denominator stay the TRUE degrees;
    the cap only bounds which wedges generate candidates.

    Determinism: counts/degrees are integers; jaccard = cn/(da+db−cn)
    is one exact-input division rounded to 6dp; top-k orders by
    (jaccard desc, cn desc, a, b) — total.

    Plan: one distinct + degree aggregate (node-sized, NOT checkpointed
    — an eager cut was tried and REJECTED at +0.7 s, r15: the subtree
    is deterministic, so AQE's runtime exchange reuse already dedups
    the consumers and the serial materialization job is pure cost; the
    initial explain shows 4 copies, but only non-reusable subtrees —
    nondeterministic UDFs, divergent pushdown — actually re-run), one
    capped wedge enumeration, one count aggregate, an
    anti-join against the edge set (existing edges are not
    "predictions"), two degree joins, TakeOrdered. Wedges are
    bucket-collect (repo rule: prefer bucket-collect over bucket
    self-joins): the capped adjacency groups ONCE per center into a
    sorted neighbor array and pairs are enumerated by posexplode +
    slice-explode (plain codegen'd expressions, no interpreted
    higher-order lambda, no second shuffle of the adjacency, and the
    degree-cap semi-join runs once instead of once per join side).
    ``max_center_degree`` bounds every array at 64 so a bucket is never
    hot. The degree joins carry NO broadcast hint: the degree table is
    O(|nodes|), so a forced hint would override Catalyst's size-based
    choice and OOM on a billion-node graph — AQE still broadcasts it
    when it is small.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    adj = e.select(F.col("a").alias("n"), F.col("b").alias("nbr")).unionAll(
        e.select(F.col("b").alias("n"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    centers = deg.filter(F.col("d") <= max_center_degree).select("n")
    adjc = adj.join(centers, "n", "left_semi")
    nbrs = adjc.groupBy("n").agg(
        F.sort_array(F.collect_list("nbr")).alias("___nb")
    )
    wedges = nbrs.select(
        F.posexplode("___nb").alias("___i", "a"), "___nb"
    ).select(
        "a",
        F.explode(
            F.slice(
                F.col("___nb"), F.col("___i") + F.lit(2), F.size("___nb")
            )
        ).alias("b"),
    )
    cn = wedges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cn"))
    fresh = cn.join(e, ["a", "b"], "left_anti")
    scored = (
        fresh.join(
            deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a"
        )
        .join(
            deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b"
        )
        .select(
            "a",
            "b",
            F.col("cn").cast("long").alias("cn"),
            F.round(
                F.col("cn").cast("double")
                / (F.col("da") + F.col("db") - F.col("cn")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("jaccard").desc(),
        F.col("cn").desc(),
        F.col("a").asc(),
        F.col("b").asc(),
    ).limit(k)


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over all edges (each undirected
    edge contributing both orientations) — positive means hubs attach
    to hubs (social nets), negative means hubs attach to leaves
    (bipartite/technological nets; this corpus's customer-part graph is
    strongly negative by construction).

    Determinism is total: degrees are integers, so Σjk, Σ(j+k), Σ(j²+k²)
    are exact integer sums; r = (S_jk/M − (S_sum/2M)²) / (S_sq/2M −
    (S_sum/2M)²) is one exact-input formula rounded 6dp.

    Scale shape: one distinct + degree aggregate (node-sized, NOT
    checkpointed — tried and REJECTED at +0.17 s, r15: the subtree is
    deterministic so runtime exchange reuse covers its consumers and
    the materialization job is pure cost), ONE degree join onto the edge table
    (r15: Σ(j+k) = Σd², Σ(j²+k²) = Σd³ and M = Σd/2 are pure degree
    moments — every node of degree d lies on d edges, contributing d,
    d² to those edge sums — so only Σjk needs the edge pairing, and even
    that needs a single join: attach d_a per edge, pre-aggregate Σd_a by
    b, then weight the node-sized partial by d_b; all sums stay exact
    integers, identical to the two-join form), two single-row reduces.
    No broadcast hint on the degree join — the degree table is
    O(|nodes|); AQE broadcasts it when small, shuffles it when not.
    Output: (n_nodes, n_edges, assortativity).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    moments = deg.groupBy().agg(
        F.count(F.lit(1)).alias("n_nodes"),
        # coalesce: an empty graph must report n_edges = 0 (the old
        # count(*) form), not NULL
        F.coalesce(F.sum("d"), F.lit(0)).alias("s_d"),
        F.sum(F.col("d") * F.col("d")).alias("s_sum"),
        F.sum(F.col("d") * F.col("d") * F.col("d")).alias("s_sq"),
    )
    sjk = (
        e.join(
            deg.select(F.col("n").alias("a"), F.col("d").alias("da")), "a"
        )
        .groupBy("b")
        .agg(F.sum("da").alias("___sda"))
        .join(
            deg.select(F.col("n").alias("b"), F.col("d").alias("db")), "b"
        )
        .groupBy()
        .agg(F.sum(F.col("db") * F.col("___sda")).alias("s_jk"))
    )
    m = F.col("s_d").cast("double") / F.lit(2.0)
    mean_term = F.col("s_sum").cast("double") / (F.lit(2.0) * m)
    r = F.try_divide(
        F.col("s_jk").cast("double") / m - mean_term * mean_term,
        F.col("s_sq").cast("double") / (F.lit(2.0) * m)
        - mean_term * mean_term,
    )
    return (
        moments.withColumn("_k", F.lit(1))
        .join(F.broadcast(sjk.withColumn("_k", F.lit(1))), "_k")
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            (F.col("s_d") / F.lit(2)).cast("long").alias("n_edges"),
            F.round(r, 6).alias("assortativity"),
        )
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient c_v = 2·T_v / (d_v·(d_v−1)) — how
    close each node's neighborhood is to a clique (Watts–Strogatz 1998),
    composed from :func:`triangle_count` (the hub-safe oriented wedge
    join) and one degree aggregate. Nodes of degree < 2 report 0 (no
    possible triangle — stated, not NULL).

    Determinism: triangles and degrees are integers; the coefficient is
    one exact-input division rounded 6dp. Scale shape: triangle_count's
    O(m^1.5) wedge bound + a degree aggregate + a broadcast join.
    Output: (node, degree, n_triangles, clustering_coeff).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # e is already the distinct (a < b) canonical set behind a lineage
    # cut — assume_canonical skips triangle_count's redundant
    # distinct+checkpoint of identical rows (r15: one Exchange + one
    # materialization job less)
    tri = triangle_count(e, "a", "b", assume_canonical=True)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    joined = deg.join(tri, "node", "left").select(
        "node",
        F.col("degree").cast("long").alias("degree"),
        F.coalesce(F.col("n_triangles"), F.lit(0))
        .cast("long")
        .alias("n_triangles"),
    )
    cc = F.when(
        F.col("degree") >= 2,
        F.round(
            F.lit(2.0) * F.col("n_triangles").cast("double")
            / (
                F.col("degree").cast("double")
                * (F.col("degree").cast("double") - F.lit(1.0))
            ),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return joined.withColumn("clustering_coeff", cc)


def bfs_layers(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Layered BFS from a seed set over the UNDIRECTED graph: per
    reached node the minimum hop distance, returned as the layer
    histogram (hop, n_nodes) — the reachability profile
    (``reachable_from``'s distance-annotated sibling; the reference
    only asks boolean reachability, /root/reference/airflow/dags/
    create_custom.py's ontology walk).

    Integer-exact throughout. The frontier loop is the Pregel shape:
    each sweep joins ONLY the new frontier against the edge table
    (never the accumulated visited set), anti-joins out already-seen
    nodes, and cuts lineage with an eager localCheckpoint — per-sweep
    work is O(frontier-adjacent edges), total O(|E|) across all
    sweeps, shuffle keyed on node id. At 100 TB the edge table would
    be bucketed by src so every sweep's join is co-located
    (exchange-free after the first); max_hops bounds the sweep count
    exactly like kcore_stats' fixed peels.
    """
    fwd = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    und = (
        fwd.unionByName(fwd.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dist = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for h in range(1, max_hops + 1):
        grown = (
            frontier.join(und, frontier["node"] == und["s"])
            .select(und["d"].alias("node"))
            .distinct()
        )
        fresh = (
            grown.join(dist, "node", "left_anti")
            .withColumn("hop", F.lit(h))
            .localCheckpoint(eager=True)
        )
        if fresh.isEmpty():
            break
        # dist is a pure union of ALREADY-checkpointed leaves (seed set
        # + every sweep's fresh) — re-checkpointing the union each
        # sweep was one extra driver-blocking job per sweep that only
        # re-wrote bytes already sitting in block storage (r16; the
        # r15 A/B that rejected removing the FRESH checkpoint measured
        # lineage recompute, a different cut). Union is partition
        # concatenation: consumers rescan the cached leaf blocks, and
        # the partition count is bounded by the same AQE byte sizing
        # that sized each leaf.
        dist = dist.unionByName(fresh)
        frontier = fresh
    return (
        dist.groupBy("hop")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("hop")
    )


def weighted_sssp(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Bounded-hop single-source(-set) shortest paths over the
    UNDIRECTED weighted graph: per reached node the minimum
    path weight using at most ``max_hops`` edges — Bellman–Ford with
    frontier pruning (only nodes whose distance improved last sweep
    are re-relaxed; standard SPFA argument: after sweep k both the
    frontier and the full-relaxation form hold exactly the ≤k-edge
    shortest distances, which is what makes the chained-CTE oracle
    replay the loop bit-for-bit).

    INTEGER weights by contract: every candidate distance is an exact
    long, min() is order-free, so the result is engine-deterministic
    with no rounding anywhere (the repo has no float-min determinism
    story and doesn't need one here).

    Scale shape: the Pregel loop of :func:`bfs_layers` with a weight
    accumulator — per sweep ONE frontier⋈edges shuffle keyed on node
    id, a map-side-combined min per dst, and an improvement anti-check
    against the running dist table; eager localCheckpoints cut the
    multi-consumer lineage (dist feeds both the next improvement
    check and the union — the r10/r12 lineage rule). max_hops bounds
    sweeps; at 100 TB the edge table is bucketed by src so sweeps
    after the first are exchange-free.
    """
    fwd = edges.select(
        F.col(src).alias("s"),
        F.col(dst).alias("d"),
        F.col(weight).cast("long").alias("w"),
    )
    und = (
        fwd.unionByName(
            fwd.select(
                F.col("d").alias("s"), F.col("s").alias("d"), "w"
            )
        )
        .groupBy("s", "d")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    dist = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for _ in range(max_hops):
        best = (
            frontier.join(und, frontier["node"] == und["s"])
            .select(
                und["d"].alias("node"),
                (frontier["dist"] + und["w"]).alias("nd"),
            )
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        fresh = (
            best.join(dist, "node", "left_outer")
            .filter(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("node", F.col("nd").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if fresh.isEmpty():
            break
        # dist's checkpoint stays EAGER (r16 A/B): a lazy cut here
        # measured SLOWER (+0.10 s paired, +0.79 s bench) — the
        # anti-join rewrite is multi-consumed and deferring its
        # materialization into the next sweep's fresh job serializes
        # the two shuffles back-to-back in one job instead of
        # pipelining across jobs.
        dist = (
            dist.join(fresh, "node", "left_anti")
            .unionByName(fresh)
            .localCheckpoint(eager=True)
        )
        frontier = fresh
    return dist


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """Personalized PageRank from a seed set — the recommendation /
    related-entities variant of :func:`pagerank`: teleportation goes to
    the seeds instead of the uniform vector, so rank mass measures
    proximity to the seed neighborhood (Jeh & Widom 2003; the standard
    "related items for THESE users" primitive).

        r(v)    = 1/|S| if v ∈ S else 0
        p₀      = r
        pᵢ₊₁(v) = (1−d)·r(v) + d·Σ_{u→v} round(pᵢ(u)/out(u), 9)

    with every contribution 9dp-rounded before the sum and every
    iterate 9dp-rounded after (the pagerank determinism convention).
    Intended for graphs where every node has out-edges (e.g. an
    undirected projection); with no dangling nodes the update
    conserves mass without a redistribution term — callers with
    genuinely directed graphs should pre-project or use
    :func:`pagerank`'s dangling machinery.

    Scale shape identical to :func:`pagerank`: loop-invariant edge /
    out-degree tables lineage-cut once, per sweep one src-keyed join +
    one dst-keyed map-side-combined aggregate; the seed table is a
    second loop-invariant broadcast. Returns (node, ppr) 6dp.
    """
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count("*").alias("___out")
    ).localCheckpoint(eager=False)
    seed_nodes = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .join(nodes, "node", "left_semi")
        .localCheckpoint(eager=False)
    )
    n_seeds = seed_nodes.agg(F.count("*").alias("___ns"))
    seeded = nodes.join(
        seed_nodes.withColumn("___is_seed", F.lit(1)), "node", "left"
    ).join(F.broadcast(n_seeds))
    restart = F.when(
        F.col("___is_seed") == 1,
        F.lit(1.0) / F.col("___ns").cast("double"),
    ).otherwise(F.lit(0.0))
    base = seeded.select("node", restart.alias("___r")).localCheckpoint(
        eager=False
    )
    ranks = base.select("node", F.col("___r").alias("pr"))
    # loop-invariant outdeg ⋈ edges joined ONCE (the pagerank r16
    # rewrite): one SortMergeJoin fewer per sweep, smaller unrolled
    # plan for the analysis/AQE driver floor that dominates this row.
    e = edges.select(
        F.col(src_col).alias("___src"), F.col(dst_col).alias("___dst")
    ).join(
        outdeg.select(F.col("node").alias("___src"), "___out"), "___src"
    ).localCheckpoint(eager=False)
    d = float(damping)
    for _ in range(iterations):
        contribs = (
            ranks.join(e, ranks["node"] == e["___src"])
            .select(
                F.col("___dst").alias("node"),
                F.round(F.col("pr") / F.col("___out"), 9).alias("___c"),
            )
        )
        summed = contribs.groupBy("node").agg(F.sum("___c").alias("___s"))
        ranks = (
            base.join(summed, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(1.0 - d) * F.col("___r")
                    + F.lit(d) * F.coalesce(F.col("___s"), F.lit(0.0)),
                    9,
                ).alias("pr"),
            )
        )
    return ranks.select("node", F.round("pr", 6).alias("ppr"))
