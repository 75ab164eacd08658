"""Connected components over a pair/edge relation (dedup clustering).

Near-dup detection (operators/dedup.py) emits PAIRS; an LLM-data pipeline
needs CLUSTERS — "these 7 documents are all the same article; keep one".
Pairs → clusters is connected components on the pair graph, and the member
with the smallest id becomes the cluster's canonical survivor.

Algorithm: iterative min-label propagation. Every vertex starts labeled
with its own id; each round every vertex takes the minimum label among
itself and its neighbors; at the fixpoint every vertex carries the minimum
vertex id reachable from it — exactly the component id. Each round is one
hash equi-join (labels ⋈ edges on the vertex) plus one groupBy-min, both
shuffle-partitioned on the vertex id, so a round costs O(|E|) shuffle and
the loop runs `diameter` rounds. Dedup graphs are near-cliques of
near-identical documents (tiny diameter), so 2-4 rounds is typical; the
O(log n)-round star-contraction variants (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014) only pay off on
long-path graphs, which dedup output is not.

Driver-side per round: one scalar aggregate (the label-sum convergence
check). Min-propagation only ever DECREASES labels, so the total label sum
is strictly decreasing until the fixpoint — comparing two driver-side
scalars detects convergence without a change-count join.

Lineage: each round's labels are localCheckpoint()ed — without truncation
the plan doubles per iteration and the driver, not the data, becomes the
bottleneck. On a real cluster with an unreliable-executor concern, swap
for `checkpoint()` against a durable checkpoint dir; the call site is the
single `_truncate` hop below.

Reference parity: the reference engine has no graph operator at all —
its dedup story stops at `dropDuplicates` (bronze_to_silver.py:87). This
closes the pairs→clusters gap a training-data user hits immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _truncate(df: DataFrame) -> DataFrame:
    """Materialize + cut lineage between iterations (see module docstring)."""
    return df.localCheckpoint(eager=True)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every vertex of `edges`; component = min
    reachable vertex id. Vertices must be non-null integral/comparable ids.

    Raises RuntimeError if the fixpoint is not reached in `max_iter`
    rounds (rounds needed = graph diameter; 25 covers any plausible dedup
    graph — a path that long means the similarity threshold is broken).
    """
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .unionByName(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .distinct()
    )
    sym = _truncate(sym)

    labels = sym.select("node").distinct().withColumn("component", F.col("node"))
    labels = _truncate(labels)

    # convergence scalar: sum of label HASHES, not label values — summing a
    # string component column would cast to double, yield all-NULL, and be
    # mistaken for "already converged" (silently returning the identity
    # labeling for string ids). xxhash64 works for any id type; the sum
    # changes whenever any label changes and is stable when none do (min-
    # label propagation is monotone, so no two distinct labelings repeat).
    def _sig(lbls: DataFrame):
        # decimal(38,0) sum: long hashes span ±2^63, so a plain long sum
        # overflows (ANSI mode raises); decimal38 holds ~1e38 ≫ n·2^63
        return lbls.agg(
            F.sum(F.xxhash64("component").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev_sig = _sig(labels)
    if prev_sig is None:  # empty edge set
        return labels

    for _ in range(max_iter):
        # neighbor labels flow along edges; keep own label via the union
        msgs = sym.join(
            labels.withColumnRenamed("node", "nbr"), "nbr"
        ).select("node", "component")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        new_labels = _truncate(new_labels)
        new_sig = _sig(new_labels)
        labels = new_labels
        if new_sig == prev_sig:
            return labels
        prev_sig = new_sig
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Cluster view of a near-dup pair relation:
    (doc_id, cluster_id, cluster_size, is_canonical), one row per clustered
    document. `cluster_id` = min doc_id of the cluster; `is_canonical`
    marks the survivor a keep-one-per-cluster filter would retain.
    Singleton documents (no pair) are by construction absent — at 100 TB
    the clustered set is orders of magnitude smaller than the corpus, so
    the survivor filter is an anti-join of corpus against the non-canonical
    rows of this (small) relation.
    """
    comp = connected_components(edges, src, dst, max_iter=max_iter)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    iters: int = 4,
    damping_pct: int = 85,
    scale: int = 10**12,
    symmetric: bool = True,
) -> DataFrame:
    """Fixed-point-integer PageRank: (node, rank_scaled) after `iters`
    synchronous power iterations, rank_scaled ≈ rank × `scale` × n.

    Centrality ranks the members of a near-dup cluster (which copy is the
    hub the others orbit?) and, on citation/link graphs, feeds quality
    signals for corpus curation (page authority as a training-data weight
    — the classic Brin & Page 1998 formulation).

    ALL arithmetic is 64-bit integer — ranks are scaled longs, the damping
    factor is a percentage, and per-edge shares use integer division — so
    every engine computes bit-identical ranks regardless of aggregation
    order (float PageRank sums contributions in shuffle order and drifts
    in the last bits; integer sums are associative-exact). This is the
    same exact-integer discipline as the hashed-feature classifier
    (operators/relevance.py) and q8 ANN rescoring.

    Per iteration: one equi-join of ranks onto edges (shuffle keyed on the
    edge source) + one groupBy-sum on the destination — O(|E|) shuffle per
    round, lineage-truncated between rounds. `symmetric=True` mirrors the
    edge set first (pair relations are undirected), which also removes
    dangling-node mass loss; with directed input, dangling mass simply
    decays (acceptable for ranking, documented deviation from the
    stochastic-matrix formulation).

    Overflow headroom: total mass ≈ n·scale must stay ≪ 2^63/damping_pct;
    the default scale=1e12 is safe to ~n=10^5 nodes — pass scale=10**6 for
    web-scale graphs (precision trades against headroom explicitly).
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if symmetric:
        e = e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    e = _truncate(e.distinct())
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = _truncate(e.join(deg, "s"))  # (s, d, outdeg), reused every round

    # vertex set = BOTH endpoints: with directed input a pure sink (most-
    # cited node — exactly what this ranks) appears only as a destination
    # and would otherwise get no rank row at all
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
    )
    ranks = _truncate(nodes.withColumn("r", F.lit(scale).cast("long")))
    base = (scale * (100 - damping_pct)) // 100

    share = F.expr(f"(r * {damping_pct}) div (100 * outdeg)")
    for _ in range(iters):
        incoming = (
            ed.join(ranks.withColumnRenamed("node", "s"), "s")
            .select(F.col("d").alias("node"), share.alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = _truncate(
            nodes.join(incoming, "node", "left").select(
                "node",
                (F.lit(base) + F.coalesce(F.col("inflow"), F.lit(0))).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))
