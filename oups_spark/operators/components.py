"""Connected components over near-duplicate pair graphs.

Reference parity: none — the reference (yohplala/oups) has no graph
operators. This belongs to the beyond-reference LLM-pipeline layer:
LSH / Jaccard / cosine near-dup detection emits PAIRS, but a dedup
policy needs CLUSTERS — one canonical document kept per connected
component of the pair graph (transitive closure: if A~B and B~C, all
three are one duplicate group even when A~C was never emitted).

Algorithm: min-label propagation with pointer jumping (the
"hash-to-min" family — Rastogi et al. 2013, *Finding Connected
Components in Map-Reduce in Logarithmic Rounds*). Each round:

1. every node takes the min label over itself and its neighbors
   (one keyed shuffle: edge join + min aggregation), then
2. jumps to its current label's label (one more keyed join) — so a
   label travels ~2^r hops after r rounds instead of r.

Each round ends in an eager ``localCheckpoint``: lineage stays O(1)
rounds deep, so Catalyst never re-derives the whole iteration stack
and executors never replay earlier rounds. Convergence is detected
through the sum of labels — per-row labels only ever decrease (to
the component minimum), so an unchanged sum is a fixpoint; that is
one scalar aggregate per round, no row-level diff join.

Scale posture (100 TB): rounds are O(log diameter); near-dup
components are shallow (duplicate families, not social graphs), so
2-4 rounds is typical. The iteration runs ONLY over edge-incident
nodes — isolated nodes (the overwhelming majority of a near-dup
graph) can never change label, so they skip the loop entirely and
rejoin in one final keyed pass; per-round volume is O(|edges|), not
O(|nodes|). Every step is a plain keyed shuffle on node ids —
uniformly distributed, AQE-skew-safe; nothing is collected to the
driver except the one convergence scalar.

Small-graph fast path: when the (deduplicated) edge list fits under
``driver_edge_threshold`` rows, the loop is skipped entirely — the
edges are collected (bounded: threshold × 2 longs, ~16 MB at the
default) and labeled with a driver-side union-find, and the labels
rejoin as a broadcast. The distributed loop costs ~5 tiny jobs per
round, which dominates wall-clock exactly when the graph is small;
the threshold keeps the driver state bounded and the distributed
path remains the default above it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_rounds: int = 25,
    driver_edge_threshold: int = 1_000_000,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    Parameters
    ----------
    nodes : one row per node; ``id_col`` must be orderable (the
        component representative is the minimum id).
    edges : undirected pair list (``src_col``, ``dst_col``); need not
        be symmetric or deduplicated — both are normalized here.
    max_rounds : safety bound; with pointer jumping a component of
        diameter d converges in O(log d) rounds, so the default
        covers graphs far beyond any dedup workload.
    driver_edge_threshold : edge count at or below which labeling
        runs as a driver-side union-find over the collected edge
        list instead of the iterative distributed loop (see module
        docstring); pass 0 to force the distributed path.

    Returns
    -------
    DataFrame ``(id, comp)`` — ``comp`` is the component's minimum
    node id; isolated nodes map to themselves.
    """
    # materialize the (possibly expensive) upstream pair pipeline
    # once — it is re-joined every round and twice via the symmetric
    # union, so leaving it lazy re-runs the whole producer per round
    e = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).localCheckpoint()

    # count() over the checkpointed edges is metadata-cheap; a small
    # graph short-circuits the whole iterative machinery
    if e.count() <= driver_edge_threshold:
        labels = _union_find_labels(e, nodes.schema[id_col].dataType)
        return nodes.select(F.col(id_col).alias("id")).join(
            F.broadcast(labels), on="id", how="left"
        ).select(
            "id", F.coalesce(F.col("comp"), F.col("id")).alias("comp")
        )

    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    # Only edge-incident nodes can ever take a label other than their
    # own id — iterate over exactly those (the symmetric union makes
    # "u" cover every endpoint); isolated nodes rejoin after the loop.
    labels = (
        e.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    prev_total = None
    for _ in range(max_rounds):
        # 1. min label over neighbors (invariant: every comp value is
        #    itself a node id, so the pointer jump below always lands)
        nmin = (
            e.join(
                labels.select(
                    F.col("id").alias("v"), F.col("comp").alias("vcomp")
                ),
                on="v",
            )
            .groupBy("u")
            .agg(F.min("vcomp").alias("nmin"))
        )
        stepped = labels.join(
            nmin, labels["id"] == nmin["u"], "left"
        ).select(
            "id",
            F.least(
                F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
            ).alias("comp"),
        )
        # 2. pointer jump: comp <- label(comp)
        parent = stepped.select(
            F.col("id").alias("pid"), F.col("comp").alias("pcomp")
        )
        labels = (
            stepped.join(parent, stepped["comp"] == parent["pid"], "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("pcomp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        total = labels.agg(F.sum("comp")).first()[0]
        if total == prev_total:
            break
        prev_total = total
    # isolated nodes label themselves; the edge-node labels are tiny
    # (bounded by 2·|edges|) so AQE broadcasts this join
    return nodes.select(F.col(id_col).alias("id")).join(
        labels, on="id", how="left"
    ).select(
        "id", F.coalesce(F.col("comp"), F.col("id")).alias("comp")
    )


def _union_find_labels(e: DataFrame, id_type) -> DataFrame:
    """Driver-side union-find over a collected (u, v) edge list:
    returns ``(id, comp)`` for every edge-incident node, comp = the
    component's minimum member. Path-halving find + union by size;
    only called for edge lists bounded by ``driver_edge_threshold``.
    """
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}
    size: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for u, v in e.collect():
        for n in (u, v):
            if n not in parent:
                parent[n] = n
                size[n] = 1
        ru, rv = find(u), find(v)
        if ru != rv:
            if size[ru] < size[rv]:
                ru, rv = rv, ru
            parent[rv] = ru
            size[ru] += size[rv]

    comp_min: dict = {}
    for n in parent:
        r = find(n)
        m = comp_min.get(r)
        if m is None or n < m:
            comp_min[r] = n
    rows = [(n, comp_min[find(n)]) for n in parent]
    schema = StructType(
        [StructField("id", id_type), StructField("comp", id_type)]
    )
    return e.sparkSession.createDataFrame(rows, schema)


def neardup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Cluster near-dup pairs into duplicate groups and pick the
    canonical survivor (minimum id) per group.

    Returns ``(doc_id, cluster_id, is_canonical)``; filtering on
    ``is_canonical`` yields the deduplicated corpus.
    """
    labels = connected_components(
        docs.select(id_col),
        pairs,
        id_col=id_col,
        src_col=src_col,
        dst_col=dst_col,
    )
    return labels.select(
        F.col("id").alias(id_col),
        F.col("comp").alias("cluster_id"),
        (F.col("id") == F.col("comp")).alias("is_canonical"),
    )


def leakage_safe_splits(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    fractions: tuple = (0.8, 0.1, 0.1),
    names: tuple = ("train", "valid", "test"),
    seed="split",
) -> DataFrame:
    """Train/valid/test assignment that near-duplicates cannot
    straddle: the split is hashed from the document's near-dup
    CLUSTER id (min-id of its connected component), not from the
    document id — so two near-identical documents can never land one
    in train and one in test, the classic eval-contamination failure
    mode of naive per-document hashing.

    Hash-based, not ``randomSplit``: ``md5_int(f'{seed}:{cluster}')``
    is reproducible across runs, engines and partitionings (the same
    portable trick as Gumbel selection / k-means init), so the split
    is stable as the corpus grows — a document's assignment can only
    change if its CLUSTER changes (it gained a near-dup that merged
    two components), which is exactly when it must. At 100 TB: one
    distributed connected-components pass (O(log d) rounds) plus a
    map-side hash — no extra shuffle beyond the cluster join.

    Returns ``(id_col, cluster_id, split)``.
    """
    from oups_spark.operators.text import md5_int

    clustered = neardup_clusters(
        docs, pairs, id_col=id_col, src_col=src_col, dst_col=dst_col
    )
    u = md5_int(
        F.concat(F.lit(f"{seed}:"), F.col("cluster_id").cast("string"))
    ) / F.lit(4294967296.0)
    split = F.lit(names[-1])
    acc = 0.0
    # build the CASE from the last boundary backwards so the first
    # matching WHEN is the lowest bracket (matches SQL CASE order)
    cases = []
    for frac, name in zip(fractions[:-1], names[:-1]):
        acc += frac
        cases.append((acc, name))
    for bound, name in reversed(cases):
        split = F.when(u < F.lit(bound), F.lit(name)).otherwise(split)
    return clustered.select(id_col, "cluster_id", split.alias("split"))


def _round_half_up(x: float, decimals: int) -> float:
    """Exact Python twin of Spark's ``Round`` on DoubleType:
    ``BigDecimal.valueOf(x).setScale(decimals, HALF_UP).toDouble``.
    ``repr(x)`` is the same shortest round-trip decimal
    ``Double.toString`` produces, so the two parses are
    value-identical; a float trick (``floor(abs(x)*f + 0.5)``) is NOT
    — the ``+ 0.5`` add can cross a representability boundary exactly
    on the half-way inputs where HALF_UP matters."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-decimals)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _round_long(x: float) -> int:
    """Exact twin of Spark's ``round(x)`` (scale 0) + ``cast long``."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _pagerank_driver(
    sym_rows,
    *,
    iters: int,
    damping: float,
    decimals: int,
    grid: int,
) -> list:
    """Driver-side replay of the distributed PageRank loop over a
    collected symmetrized edge list. Every arithmetic step is the
    same IEEE operation sequence as the Catalyst plan — ``r/deg``
    then ``* 10^grid`` rounded onto the integer grid (order-free long
    sum), then ``teleport + damping * (csum / 10^grid)`` rounded to
    ``decimals`` — with :func:`_round_half_up` standing in for
    Spark's BigDecimal HALF_UP round, so ranks are bit-identical to
    the distributed trajectory (which the DuckDB oracle replays)."""
    deg: dict = {}
    for s, _d in sym_rows:
        deg[s] = deg.get(s, 0) + 1
    n = len(deg)
    teleport = (1.0 - damping) / n
    gfac = float(10**grid)
    r0 = _round_half_up(1.0 / float(n), decimals)
    rank = {node: r0 for node in deg}
    for _ in range(iters):
        cval = {
            node: _round_long((rank[node] / deg[node]) * gfac)
            for node in deg
        }
        contrib: dict = {}
        for s, d in sym_rows:
            contrib[d] = contrib.get(d, 0) + cval[s]
        rank = {
            node: _round_half_up(
                teleport + damping * (contrib.get(node, 0) / gfac),
                decimals,
            )
            for node in deg
        }
    return [(node, deg[node], rank[node]) for node in deg]


def pagerank(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    iters: int = 3,
    damping: float = 0.85,
    decimals: int = 6,
    grid: int = 9,
    driver_edge_threshold: int = 100_000,
) -> DataFrame:
    """PageRank over an UNDIRECTED pair graph (edges symmetrized),
    fixed iteration count — the centrality pass that picks canonical
    representatives inside near-duplicate families (most-connected
    document wins, rather than arbitrary min-id).

    Determinism contract (the ``kmeans_lloyd`` / classifier recipe):
    ranks are rounded to ``decimals`` each iteration, and the
    neighbor-contribution sum rides an INTEGER grid —
    ``round((r/deg)·10^grid)`` summed as longs is exact under any
    partial-merge order (contributions are ≤ 10^grid; 2^63 headroom
    covers any real edge count) — so the trajectory replays
    bit-identically in the unrolled DuckDB oracle.

    Shape per iteration: one join of the rank table onto edges (both
    sides hash-partitioned on node id) + one partial-combined sum by
    destination; ranks localCheckpoint each round so lineage stays
    O(1). Driver state: the node count, one scalar. Nodes outside
    the edge set hold the teleport rank by definition and are out of
    scope here (the caller already restricted to the pair graph).
    """
    # materialize the symmetrized edges ONCE: every action below
    # (node count, init checkpoint, one per iteration) walks sym —
    # without this the caller's edge-generation pipeline (e.g. a
    # full MinHash+LSH pass) re-executes per action
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(
            edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Small-graph fast path (the connected_components recipe): a
    # count() over the checkpointed edges is metadata-cheap, and a
    # driver-sized graph skips the whole iterative machinery — the
    # distributed loop costs ~10 tiny jobs per iteration (join + agg
    # + checkpoint under AQE), pure scheduler floor when the graph is
    # small. Bounded: threshold × 2 longs collected; the Decimal
    # round twin costs ~2 quantizes per node per iteration, which
    # caps the sensible threshold well below union-find's. Pass 0 to
    # force the distributed path.
    n_sym = sym.count()
    if n_sym == 0:
        return edges.sparkSession.createDataFrame(
            [], "node long, deg long, rank double"
        )
    if n_sym <= driver_edge_threshold:
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        rows = _pagerank_driver(
            [(r["s"], r["d"]) for r in sym.collect()],
            iters=iters,
            damping=damping,
            decimals=decimals,
            grid=grid,
        )
        schema = StructType(
            [
                StructField("node", sym.schema["s"].dataType),
                StructField("deg", LongType()),
                StructField("rank", DoubleType()),
            ]
        )
        return edges.sparkSession.createDataFrame(rows, schema)
    deg = sym.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.count()
    teleport = (1.0 - damping) / n
    gfac = float(10**grid)
    ranks = deg.select(
        F.col("s").alias("node"),
        "deg",
        F.round(F.lit(1.0) / F.lit(float(n)), decimals).alias("r"),
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        contrib = (
            sym.join(
                ranks.select(
                    F.col("node").alias("s"),
                    F.round(
                        (F.col("r") / F.col("deg")) * gfac
                    ).cast("long").alias("c"),
                ),
                on="s",
            )
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("c").alias("csum"))
        )
        ranks = (
            ranks.drop("r")
            .join(contrib, on="node", how="left")
            .select(
                "node",
                "deg",
                F.round(
                    F.lit(teleport)
                    + F.lit(damping)
                    * (F.coalesce(F.col("csum"), F.lit(0)) / F.lit(gfac)),
                    decimals,
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "deg", F.col("r").alias("rank"))
