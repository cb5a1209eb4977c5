"""Distributed connected components — resolves near-dup candidate PAIRS
into duplicate CLUSTERS (the step between "these two documents match" and
"keep one canonical copy per group of transitively-linked documents").

Spark has no built-in graph operator, so this implements the alternating
large-star / small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) on plain DataFrames:

- **large-star**: every node links its strictly-larger neighbors to its
  minimum neighbor (or itself).  ``m(u) = min(u, min N(u))``; emit
  ``(v, m(u))`` for every neighbor ``v > u``.
- **small-star**: orient each edge high->low; every node links its
  smaller-or-equal neighbors (and itself) to the minimum.

Both steps are expressed as one ``groupBy(min)`` + one join — NO
``collect_list`` of neighbor sets, so a hub node with 10^8 neighbors never
materializes an array; its adjacency stays row-distributed and AQE can
skew-split the join.  Convergence is O(log^2 n) rounds (in practice 3-5
for dedup graphs, whose clusters are small and dense); each round
``localCheckpoint``s to truncate lineage, so plan size stays constant no
matter how many iterations run.

The driver-side loop iterates PLANS, not data — the per-round action is a
single count used for the fixed-point test, the classic pattern for
iterative algorithms on Spark (GraphX/GraphFrames iterate the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_U, _V = "__cc_u", "__cc_v"


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m(u)) for each neighbor v > u, where m(u) = min(u, N(u))."""
    sym = edges.union(edges.select(F.col(_V).alias(_U), F.col(_U).alias(_V)))
    mins = sym.groupBy(_U).agg(
        F.least(F.min(_V), F.first(_U)).alias("__m")
    )
    return (
        sym.filter(F.col(_V) > F.col(_U))
        .join(mins, on=_U)
        .select(F.col(_V).alias(_U), F.col("__m").alias(_V))
        .filter(F.col(_U) != F.col(_V))
        # no distinct here: duplicate edges don't change small-star's mins,
        # and its terminal distinct canonicalizes — saves a shuffle per round
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient high->low, then link each node's <=-neighbors to the min."""
    hi_lo = edges.select(
        F.greatest(_U, _V).alias(_U), F.least(_U, _V).alias(_V)
    ).filter(F.col(_U) != F.col(_V))
    mins = hi_lo.groupBy(_U).agg(F.min(_V).alias("__m"))
    relink = (
        hi_lo.join(mins, on=_U)
        .select(F.col(_V).alias(_U), F.col("__m").alias(_V))
    )
    self_link = mins.select(F.col(_U), F.col("__m").alias(_V))
    return (
        relink.union(self_link)
        .filter(F.col(_U) != F.col(_V))
        .distinct()
    )


# below this edge count the deduped edge list is at most a few MB — one
# task runs union-find in microseconds, vs O(log^2 n) distributed rounds
# each paying a checkpoint + count + shuffle of fixed job overhead
SMALL_GRAPH_EDGES = 200_000


def _union_find_single_task(edges: DataFrame) -> DataFrame:
    """Small-graph fast path: ship the (already deduped) edge list to ONE
    executor task and run path-compressed union-find there, emitting
    (node, min-id component).  Executor-side — the driver never touches
    edge data; same (node, component) contract as the distributed path."""

    def uf(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for u, v in zip(pdf[_U].tolist(), pdf[_V].tolist()):
                ru, rv = find(u), find(v)
                if ru != rv:
                    # union by min: smaller id becomes the root, so the
                    # final label IS the component minimum
                    lo, hi = (ru, rv) if ru < rv else (rv, ru)
                    parent[hi] = lo
        nodes = list(parent.keys()) + [x for x in set(parent.values())]
        seen = {}
        for n in set(nodes):
            seen[n] = find(n)
        yield pd.DataFrame({"node": list(seen.keys()), "component": list(seen.values())})

    # id type follows the edges (string record keys work exactly like the
    # distributed path's least/greatest ordering — pandas compares them
    # the same way)
    id_type = edges.schema[_U].dataType.simpleString()
    return edges.coalesce(1).mapInPandas(
        uf, schema=f"node {id_type}, component {id_type}"
    )


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
    small_graph_threshold: int | None = None,
) -> DataFrame:
    """Resolve an undirected edge list into components.

    Returns ``(node, component)`` for every node that appears in ``edges``,
    where ``component`` is the smallest node id in its connected component.
    Isolated nodes (no edges) don't appear — callers left-join and coalesce
    to self (see ``assign_components``).

    Hybrid strategy: a dedup graph's edge set (verified near-dup pairs) is
    tiny relative to the corpus — usually thousands of edges even when the
    corpus is 100 TB — so when the deduped count fits comfortably in one
    task (<= SMALL_GRAPH_EDGES) a single-task union-find replaces the
    iterative contraction; above it, alternating star rounds scale out."""
    e = (
        edges.select(F.col(src).alias(_U), F.col(dst).alias(_V))
        .filter(F.col(_U) != F.col(_V))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_cnt = e.count()
    threshold = (
        SMALL_GRAPH_EDGES if small_graph_threshold is None else small_graph_threshold
    )
    if prev_cnt <= threshold:
        return _union_find_single_task(e)
    converged = False
    for _ in range(max_iter):
        # batch TWO alternating rounds per materialization when the edge
        # set is large: checkpoint + count are fixed per-cycle job costs
        # and convergence needs O(log^2 n) rounds, so batching halves the
        # bookkeeping. For small graphs (local tests, tail iterations) the
        # deeper plan costs more in planning than it saves — stay single.
        step = _small_star(_large_star(e))
        if prev_cnt > 10_000:
            step = _small_star(_large_star(step))
        e2 = step.localCheckpoint(eager=True)
        # fixed-point test, cheap-first: a changed edge COUNT (one job,
        # piggybacking on the checkpoint's materialized blocks) proves
        # non-convergence without a set comparison; only an unchanged count
        # pays for the exceptAll (both sides are distinct sets, so
        # equal-count + empty one-sided difference <=> equal sets)
        cnt = e2.count()
        if cnt == prev_cnt:
            changed = (
                e2.exceptAll(e).limit(1).count() > 0
            )
        else:
            changed = True
        prev_cnt = cnt
        e = e2
        if not changed:
            converged = True
            break
    if not converged:
        # a silent partial contraction would stamp WRONG cluster ids —
        # refuse instead (star-contraction needs O(log^2 n) rounds, so
        # hitting this bound means max_iter is far too low for the graph)
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds"
        )
    # at the fixed point every edge is (node -> component root); roots
    # themselves appear only on the right side, so add their self-rows
    roots = e.select(F.col(_V).alias(_U)).distinct().withColumn(_V, F.col(_U))
    return (
        e.union(roots)
        .distinct()
        .select(F.col(_U).alias("node"), F.col(_V).alias("component"))
    )


def assign_components(
    df: DataFrame, id_col: str, pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Attach ``cluster_id`` to every row of ``df``: the component root for
    nodes linked by ``pairs``, the node's own id for isolated rows."""
    comp = connected_components(pairs, src, dst)
    return (
        df.join(comp, on=df[id_col] == comp["node"], how="left")
        .withColumn("cluster_id", F.coalesce(F.col("component"), F.col(id_col)))
        .drop("node", "component")
    )
