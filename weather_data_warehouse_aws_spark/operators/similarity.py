"""Embedding similarity search (north-star: ANN over an array<float> column).

Three tiers, all with double-precision cosine computed by SQL higher-order
functions (JVM-side, no Python in the loop; bit-exact vs DuckDB's
``list_cosine_similarity(CAST(… AS DOUBLE[]), …)`` — verified on 9600 pairs):

* `cosine_topk`      — exact brute force: queries × corpus. The baseline and
                       the correctness oracle. Quadratic; fine when one side
                       is small (it broadcasts).
* `blocked_neardup`  — all pairs with cosine ≥ τ *within a blocking key* —
                       the shape every near-dup pipeline uses (block by
                       cluster/label/LSH bucket, compare within block).
* `lsh_topk`         — random-hyperplane LSH: deterministic seeded
                       projections, sign-bit bucket, multi-probe search.
                       Approximate; recall measured against `cosine_topk` in
                       tests/test_similarity.py. The 100 TB path: bucket
                       join replaces the cross product.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            f"0.0D, (acc, v) -> acc + v)"
        )
    )


def cosine(a: str, b: str) -> Column:
    """Sequential-fold double cosine — the cross-engine-stable formulation."""
    return _dot(a, b) / (_norm(a) * _norm(b))


DOT_SQL = (
    "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
)
COSINE_SQL = (
    "list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self-matches excluded).

    Rank on the ROUNDED cosine with id tie-break so ordering is engine-
    stable. The query side broadcasts — at scale this is a map-side pass
    over the corpus (linear), the standard exact-rescoring baseline.
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    # a single-file corpus reads as 1-3 splits; spread the dot-product work
    c = c.repartition(c.sparkSession.sparkContext.defaultParallelism, "neighbor_id")
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine("qv", "cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def blocked_neardup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.95,
    max_block_rows: int | None = 1_000_000,
) -> DataFrame:
    """Near-duplicate pairs (cosine ≥ τ) within each block.

    The self-join is an equi-join on the block key — shuffle partitions by
    block, compare within. Quadratic only in block size, never corpus size.

    EXACT all-pairs is intrinsically Ω(Σ block²): if blocks grow with the
    corpus (fixed label cardinality), cost grows quadratically — measured
    super-linear in the amplified-SF sweep (SCALE.md). `max_block_rows` is
    the tripwire: any block above it raises with a pointer to the
    approximate scale paths (sign-LSH / IVF in this module, MinHash for
    text) whose candidate generation stays equi-join-linear. Set it None
    only when block sizes are known-bounded.
    """
    # hoist the norm: computed once per VECTOR before the join, not twice per
    # PAIR inside it — same float ops on the same values (bit-identical
    # result), at 1/|block| of the arithmetic
    normed = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        _norm(vec_col).alias("nrm"),
    ).persist()  # feeds both join sides — compute the norm pass once
    if max_block_rows is not None:
        # guard action doubles as the cache materialization the join was
        # going to pay anyway — the tripwire is ~free
        biggest = normed.groupBy("blk").count().agg(F.max("count")).first()[0]
        if biggest is not None and biggest > max_block_rows:
            raise ValueError(
                f"blocked_neardup: largest '{block_col}' block has {biggest} rows "
                f"(> {max_block_rows}); exact all-pairs would do ~{biggest}^2/2 "
                "dot products in one block. Use lsh_topk/ivf_topk (vectors) or "
                "minhash_lsh_pairs (text), or raise max_block_rows deliberately."
            )
    # few blocks ⇒ a shuffled block equi-join has ≤ #blocks populated
    # partitions, serializing the quadratic dot-product work. Instead:
    # repartition the probe side by id (full-width parallelism) and
    # broadcast the build side — every core gets an even slice of the
    # pairwise work. When a single block outgrows one executor's share at
    # real scale, fall back to operators/skew.salted_broadcast_join.
    par = normed.sparkSession.sparkContext.defaultParallelism
    a = normed.select(
        "blk", F.col("vid").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    ).repartition(par, "id_a")
    b = F.broadcast(
        normed.select(
            "blk", F.col("vid").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
        )
    )
    return (
        a.join(b, ["blk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(_dot("va", "vb") / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cos") >= threshold)
        .select(F.col("blk").alias(block_col), "id_a", "id_b", "cos")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH (driver-side tiny)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec_col: str, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit_j = [ dot(v, h_j) > 0 ].

    Built as ONE SQL expression string (a single parser round-trip) —
    composing it per-plane from Column operators costs a driver↔JVM
    round-trip per node (~10 per plane), and plan-construction chatter is
    pure serial driver latency at any cluster size."""
    terms = []
    for j, plane in enumerate(planes):
        arr = "array(" + ", ".join(f"{x}D" for x in plane) + ")"
        dot = (
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> "
            f"CAST(x AS DOUBLE) * y), 0.0D, (acc, v) -> acc + v)"
        )
        terms.append(
            f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)"
        )
    return F.expr("0 + " + " + ".join(terms))


def lloyd_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "cv",
    iterations: int = 1,
) -> DataFrame:
    """K-means (Lloyd) refinement of IVF centroids, pure DataFrame ops.

    Per iteration: assign every vector to its max-dot-product centroid
    (broadcast), then rebuild each centroid as the element-wise mean of its
    members (posexplode → groupBy(cell, dim) → re-assemble). Iterative
    algorithms on Spark keep the loop on the DRIVER over small state
    (centroids) while each step is one distributed pass — the standard
    shape for EM/k-means/PageRank-style jobs.
    """
    cents = centroids
    for _ in range(iterations):
        bc = F.broadcast(cents)
        assigned = (
            corpus.crossJoin(bc)
            .withColumn(
                "__sim",
                F.expr(
                    f"aggregate(zip_with({vec_col}, cent_vec, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
                ),
            )
        )
        w = Window.partitionBy(corpus.columns[0]).orderBy(
            F.col("__sim").desc(), F.col("cent_id")
        )
        best = (
            assigned.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .select(F.col("cent_id").alias("cell"), F.col(vec_col).alias("v"))
        )
        dims = best.select("cell", F.posexplode(F.col("v")).alias("d", "x"))
        means = dims.groupBy("cell", "d").agg(F.avg("x").alias("m"))
        # spherical k-means: the dot-product objective is only guaranteed
        # non-decreasing when the updated centroid is the UNIT-normalized
        # mean (argmax_c Σ x·c s.t. |c|=1 is mean/|mean|)
        cents = (
            means.groupBy("cell")
            .agg(F.sort_array(F.collect_list(F.struct("d", "m"))).alias("dm"))
            .select(
                F.col("cell").alias("cent_id"),
                F.expr(
                    "transform(dm, e -> CAST(e.m / sqrt(aggregate(transform(dm, q -> q.m * q.m), 0.0D, (a, v) -> a + v)) AS FLOAT))"
                ).alias("cent_vec"),
            )
        )
    return cents


def normalize_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """Unit-normalize an array<float/double> column (double math)."""
    return df.withColumn(
        vec_col,
        F.expr(
            f"transform({vec_col}, x -> CAST(CAST(x AS DOUBLE) / "
            f"sqrt(aggregate(transform({vec_col}, q -> CAST(q AS DOUBLE) * CAST(q AS DOUBLE)), 0.0D, (a, v) -> a + v)) AS FLOAT))"
        ),
    )


def assign_cells(
    df: DataFrame, centroids: DataFrame, vcol: str, out: str, probes: int
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (tiny) centroid relation,
    score every row map-side, keep the `probes` best cells per row. The
    first column of `df` is the row identity (used for the per-row window).
    Dots are rounded to 9 dp before ranking so Spark and a SQL oracle break
    near-ties identically."""
    scored = df.crossJoin(F.broadcast(centroids)).withColumn(
        "__sim",
        F.round(
            F.expr(
                f"aggregate(zip_with({vcol}, cent_vec, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
            ),
            9,
        ),
    )
    ww = Window.partitionBy(df.columns[0]).orderBy(F.col("__sim").desc(), F.col("cent_id"))
    return (
        scored.withColumn("__r", F.row_number().over(ww))
        .filter(F.col("__r") <= probes)
        .select(*df.columns, F.col("cent_id").alias(out))
    )


def stripe_centroids(
    c: DataFrame, *, n_cells: int, stripe_fn=None
) -> DataFrame:
    """Deterministic centroid seed: the lowest-id vector of each of
    `n_cells` id-hash stripes of the corpus (columns: neighbor_id, cv).
    `stripe_fn` overrides the hash (the oracle-checked queries pass the
    md5-portable hash so DuckDB replicates selection exactly)."""
    if stripe_fn is None:
        stripe_fn = lambda ids: F.pmod(F.xxhash64(ids), F.lit(n_cells))  # noqa: E731
    w = Window.partitionBy("cell").orderBy("neighbor_id")
    return (
        c.withColumn("cell", stripe_fn(F.col("neighbor_id")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("cell").alias("cent_id"), F.col("cv").alias("cent_vec"))
    )


def semantic_cells(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    lloyd_iterations: int = 0,
    stripe_fn=None,
) -> DataFrame:
    """Geometry-derived blocking key for SemDeDup: centroids (deterministic
    stripe seed, optionally Lloyd-refined) are broadcast and every vector
    gets its nearest cell in one map-side pass — zero shuffle on the corpus.
    Returns the corpus' (id, vector) plus `cell_id`."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    centroids = stripe_centroids(c, n_cells=n_cells, stripe_fn=stripe_fn)
    if lloyd_iterations:
        centroids = lloyd_refine(c, centroids, iterations=lloyd_iterations)
    return assign_cells(c, centroids, "cv", "cell_id", 1).select(
        F.col("neighbor_id").alias(id_col), F.col("cv").alias(vec_col), "cell_id"
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    threshold: float = 0.9,
    lloyd_iterations: int = 0,
    stripe_fn=None,
    max_cell_rows: int | None = 1_000_000,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication" — public literature): k-means-cluster the embedding
    space, then compare pairs ONLY within a cluster.

    Where `blocked_neardup` needs a caller-supplied blocking key, this
    DERIVES the blocks from the geometry via `semantic_cells`, then runs the
    same within-block equi-join comparison — quadratic only within a cell,
    and cell population is governed by n_cells, the caller's knob (√n cells
    is the usual web-scale heuristic; `max_cell_rows` is the same tripwire
    `blocked_neardup` carries). The corpus-sized work is one broadcast
    assignment pass plus the within-cell join; no all-pairs anywhere.

    Returns (cell_id, id_a, id_b, cos) with id_a < id_b and cos ≥ threshold.
    Transitive resolution (pairs → clusters → one survivor per component) is
    `operators/graph.dedup_clusters` downstream; the greedy keep-lowest-id
    filter is `semantic_dedup_survivors`.
    """
    cells = semantic_cells(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_cells=n_cells,
        lloyd_iterations=lloyd_iterations,
        stripe_fn=stripe_fn,
    )
    return blocked_neardup(
        cells,
        id_col=id_col,
        vec_col=vec_col,
        block_col="cell_id",
        threshold=threshold,
        max_block_rows=max_cell_rows,
    )


def semantic_dedup_survivors(
    corpus: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy keep-lowest-id SemDeDup filter: drop a row iff some SMALLER id
    in its cell sits within the threshold (a pair (id_a, id_b) condemns
    id_b). One broadcast anti-join of the (small) dropped-id set against the
    corpus — the corpus itself is never shuffled. Deterministic and
    engine-replicable (EXISTS semantics); for one-survivor-per-connected-
    component semantics feed `pairs` to graph.dedup_clusters instead."""
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return corpus.join(F.broadcast(dropped), id_col, "left_anti")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    lloyd_iterations: int = 0,
    stripe_fn=None,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into cells around
    centroids, search only the query's `nprobe` nearest cells.

    Centroids here are deterministically sampled corpus vectors (the
    lowest-id representative per id-stripe) — one Lloyd iteration away from
    k-means, which is the production upgrade. The structure is what matters
    at scale: assignment is a map-side pass against BROADCAST centroids,
    candidates come from an equi-join on cell_id, and exact cosine rescoring
    touches |corpus|·nprobe/n_cells vectors instead of |corpus|.

    `stripe_fn(id_col: Column) -> Column` overrides the centroid-seeding
    stripe hash (default xxhash64); the oracle-checked registry entry passes
    the md5-portable hash so DuckDB can replicate centroid selection exactly.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    centroids = stripe_centroids(c, n_cells=n_cells, stripe_fn=stripe_fn)
    if lloyd_iterations:
        centroids = lloyd_refine(c, centroids, iterations=lloyd_iterations)

    corpus_cells = assign_cells(c, centroids, "cv", "cell_id", 1)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    query_cells = assign_cells(q, centroids, "qv", "cell_id", nprobe)

    scored = (
        query_cells.join(corpus_cells, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
        .withColumn("cos", F.round(cosine("qv", "cv"), 6))
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 1,
    seed: int = 42,
    dim: int,
) -> DataFrame:
    """Approximate top-k: exact rescoring restricted to LSH-bucket collisions.

    Candidates come from an equi-join on the bucket id (2^n_planes buckets
    per table); multi-probe also joins buckets at Hamming distance 1
    (n_planes extra probes), and `n_tables` independent plane sets union
    their candidates — the Indyk-Motwani OR-amplification: per-neighbor
    hit probability q per table becomes 1-(1-q)^L overall.

    Tuning (measured by ann_methods' recall_lsh branch, not guessed):
    candidate fraction ≈ L·(n_planes+1)/2^n_planes of the corpus per
    query, so recall is BOUGHT with candidates — raise n_tables for
    recall, n_planes to cut candidates. Sign-LSH's per-plane agreement is
    1-θ/π; on corpora whose true neighbors are near-orthogonal (synthetic
    uniform vectors) q stays near (1/2)^n_planes and no affordable L
    rescues it — use the IVF or q8 tier there. It earns its keep when
    neighbor cosines are high (real embedding clusters).

    `dim` is required (keyword-only): inferring it would cost a driver-side
    job over the corpus just to measure one array — the caller always knows
    its embedding dimensionality.
    """
    c0 = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    q0 = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    tables = [
        hyperplanes(dim, n_planes, seed + 1009 * t) for t in range(n_tables)
    ]
    # ONE pass per side computes every table's bucket as a projected column
    # (the n_tables·n_planes dot products run once per row), then the
    # (table, bucket) pairs explode and a SINGLE equi-join on the composite
    # key replaces n_tables separate scans+joins
    def entry(t: int, bucket_col) -> F.Column:
        return F.struct(F.lit(t).alias("t"), bucket_col.alias("bucket"))

    cb = c0.select(
        "neighbor_id",
        *[lsh_bucket("cv", p).alias(f"__b{t}") for t, p in enumerate(tables)],
    )
    cp = cb.select(
        "neighbor_id",
        F.explode(
            F.array(*[entry(t, F.col(f"__b{t}")) for t in range(n_tables)])
        ).alias("tb"),
    ).select("neighbor_id", "tb.t", "tb.bucket")

    qb = q0.select(
        "query_id",
        *[lsh_bucket("qv", p).alias(f"__b{t}") for t, p in enumerate(tables)],
    )
    probe_entries = []
    for t in range(n_tables):
        b = F.col(f"__b{t}")
        probe_entries.append(entry(t, b))
        probe_entries.extend(
            entry(t, b.bitwiseXOR(F.lit(1 << j))) for j in range(n_planes)
        )
    qp = qb.select(
        "query_id", F.explode(F.array(*probe_entries)).alias("tb")
    ).select("query_id", "tb.t", "tb.bucket")

    pairs = qp.join(cp, ["t", "bucket"]).select("query_id", "neighbor_id")
    # dedup BEFORE fetching vectors: candidate ids are compact, vectors wide
    cand = pairs.filter(F.col("query_id") != F.col("neighbor_id")).distinct()
    scored = (
        cand.join(q0, "query_id")
        .join(c0, "neighbor_id")
        .withColumn("cos", F.round(cosine("qv", "cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


# ---------------------------------------------------------------------------
# int8-style symmetric vector quantization + two-stage rescoring ANN
# ---------------------------------------------------------------------------
Q8_LEVELS = 127  # symmetric int8 range


def quantize_vectors(
    df: DataFrame, *, id_col: str, vec_col: str, id_out: str, prefix: str
) -> DataFrame:
    """Per-vector symmetric int8-style quantization: scale = max|x|/127,
    q_i = floor(x_i/scale + 0.5) ∈ [-127, 127] (floor(+0.5), never round():
    HALF_UP vs banker's disagree on half-boundaries cross-engine).

    Output columns: {prefix}v (original), {prefix}s (scale), {prefix}q
    (quantized, kept as exact small doubles). At scale the quantized
    corpus is ~4× smaller to shuffle/cache than float32 and ~8× smaller
    than the double math it replaces; every arithmetic step (division,
    +0.5, floor, products) is IEEE exactly-rounded on identical inputs,
    so candidates rank identically in any engine."""
    v, s, q = f"{prefix}v", f"{prefix}s", f"{prefix}q"
    d = df.select(F.col(id_col).alias(id_out), F.col(vec_col).alias(v))
    maxabs = F.expr(
        f"aggregate(transform({v}, x -> abs(CAST(x AS DOUBLE))), 0.0D, (a, b) -> greatest(a, b))"
    )
    d = d.withColumn(s, maxabs / F.lit(float(Q8_LEVELS)))
    return d.withColumn(
        q,
        F.when(F.col(s) == 0.0, F.expr(f"transform({v}, x -> 0.0D)")).otherwise(
            F.expr(f"transform({v}, x -> floor(CAST(x AS DOUBLE) / {s} + 0.5D))")
        ),
    )


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    rerank: int = 4,
) -> DataFrame:
    """Two-stage ANN over int8-quantized vectors: (1) rank ALL candidates by
    the cheap quantized dot product s_a·s_b·Σ(q_a·q_b) and keep rerank·k per
    query; (2) exact double-cosine rescoring of only those. The first stage
    streams the 4×-smaller quantized corpus map-side (queries broadcast);
    the second touches rerank·k·|queries| vectors — the standard
    quantize-then-rescore pattern (product-quantization's scalar little
    sibling; Jégou et al. 2011 motivates the family).

    The quantized dot is EXACT integer arithmetic in doubles (|q| ≤ 127,
    dims ≤ ~2000 ⇒ far under 2^53), so stage-1 ranking is bit-stable
    cross-engine — an approximate ALGORITHM under an exact differential
    test, like ivf/lsh before it."""
    q = F.broadcast(
        quantize_vectors(queries, id_col=id_col, vec_col=vec_col, id_out="query_id", prefix="q")
    )
    c = quantize_vectors(corpus, id_col=id_col, vec_col=vec_col, id_out="neighbor_id", prefix="c")
    c = c.repartition(c.sparkSession.sparkContext.defaultParallelism, "neighbor_id")
    intdot = F.expr(
        "aggregate(zip_with(qq, cq, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
    )
    approx = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("approx", F.round(F.col("qs") * F.col("cs") * intdot, 9))
    )
    w1 = Window.partitionBy("query_id").orderBy(F.col("approx").desc(), F.col("neighbor_id"))
    cand = approx.withColumn("__r", F.row_number().over(w1)).filter(
        F.col("__r") <= rerank * k
    )
    rescored = cand.withColumn("cos", F.round(cosine("qv", "cv"), 6))
    w2 = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def rp_project(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    out_dim: int = 16,
    seed: int = 7,
    in_dim: int,
) -> DataFrame:
    """Random-projection (Johnson-Lindenstrauss) dimensionality reduction:
    v ↦ (1/√out_dim)·[⟨v, g_1⟩ … ⟨v, g_out_dim⟩] with seeded Gaussian
    directions — the standard shrink step before ANN/clustering when the
    native dimensionality makes vectors expensive to shuffle (JL lemma:
    pairwise distances are preserved within 1±ε for out_dim = O(log n/ε²)).

    The projection matrix is driver-side tiny (out_dim × in_dim literals
    compiled into the plan, like `lsh_bucket`'s planes) and the map is pure
    JVM fold arithmetic — zero shuffle, zero Python, deterministic under
    any partitioning. Combine with `quantize_vectors` for a further 4×:
    16-dim int8 codes are ~1/64th the bytes of 256-dim float64 working
    vectors."""
    planes = hyperplanes(in_dim, out_dim, seed)
    inv = 1.0 / float(np.sqrt(out_dim))
    comps = []
    for plane in planes:
        arr = "array(" + ", ".join(f"{x}D" for x in plane) + ")"
        comps.append(
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> CAST(x AS DOUBLE) * y), "
            f"0.0D, (acc, v) -> acc + v) * {inv}D"
        )
    return df.withColumn("rp_vec", F.expr("array(" + ", ".join(comps) + ")"))


# ---------------------------------------------------------------------------
# Persistent IVF index: build once, query many. The per-call ivf_topk above
# re-derives centroids and re-assigns the corpus every invocation — fine for
# one-shot dedup sweeps, wasteful for a serving pattern where the corpus is
# stable and queries keep arriving. At 100 TB the index build is the big
# scan; amortizing it across queries is the difference between an ANN
# *operator* and an ANN *index*.
#
# Layout: {path}/centroids (n_cells tiny rows) and {path}/cells — the
# assigned corpus partitioned BY cell_id, so probing nprobe cells is a
# partition-PRUNED scan (only the probed directories are listed/read; at
# 1000 executors that is nprobe/n_cells of the corpus touched, asserted via
# inputFiles in tests).
# ---------------------------------------------------------------------------


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    lloyd_iterations: int = 1,
    stripe_fn=None,
) -> None:
    """Materialize the IVF structure: Lloyd-refined centroids + the corpus
    assigned to cells, partitioned by cell_id for pruned probes."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    centroids = stripe_centroids(c, n_cells=n_cells, stripe_fn=stripe_fn)
    if lloyd_iterations:
        centroids = lloyd_refine(c, centroids, iterations=lloyd_iterations)
    centroids.write.mode("overwrite").parquet(f"{path.rstrip('/')}/centroids")
    # assign against the PERSISTED centroids, not the lazy lineage: Lloyd's
    # float means are merge-order-sensitive, so recomputing them for the
    # assignment could disagree bit-wise with what queries will read back —
    # a boundary vector stored under the wrong cell is a silent recall hole.
    # Reading back also halves the centroid computation (one pass, not two).
    persisted = c.sparkSession.read.parquet(f"{path.rstrip('/')}/centroids")
    assigned = assign_cells(c, persisted, "cv", "cell_id", 1)
    assigned.write.mode("overwrite").partitionBy("cell_id").parquet(
        f"{path.rstrip('/')}/cells"
    )


def ivf_index_topk(
    spark,
    queries: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Query a materialized IVF index; result ≡ ivf_topk with the same
    centroid parameters (asserted in tests).

    The probed cell ids are collected (≤ n_cells tiny rows) and pushed as
    an IN-list filter on the partition column, so the cells scan is
    partition-pruned at planning time — the only corpus bytes read are the
    probed cells'.
    """
    root = path.rstrip("/")
    centroids = spark.read.parquet(f"{root}/centroids")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    query_cells = assign_cells(q, centroids, "qv", "cell_id", nprobe)
    probed = [r["cell_id"] for r in query_cells.select("cell_id").distinct().collect()]
    if not probed:
        return spark.createDataFrame(
            [], "query_id bigint, rank int, neighbor_id bigint, cos double"
        )
    cells = spark.read.parquet(f"{root}/cells").filter(F.col("cell_id").isin(probed))
    scored = (
        query_cells.join(cells, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
        .withColumn("cos", F.round(cosine("qv", "cv"), 6))
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — Jégou, Douze & Schmid, TPAMI 2011
# ---------------------------------------------------------------------------


def _dot_d(a: str, b: str) -> Column:
    """Ordered-fold dot product in double; identical op sequence to the
    DuckDB list_dot_product over DOUBLE[] so results match bitwise."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v)"
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 4,
    ksub: int = 16,
    rerank: int = 3,
    dim: int,
    caches_out: list | None = None,
) -> DataFrame:
    """Product-quantization ANN: split vectors into `m` subspaces, k-means
    a `ksub`-entry codebook per subspace (seeded + one Lloyd step), encode
    the corpus as m small codes, score queries against CODES via
    asymmetric distance computation (per-subspace lookup tables), then
    exactly rescore the top `rerank*k`.

    Memory story (the reason PQ exists): a 64-dim float vector is 256 B;
    its PQ code is m=4 BYTES — a 64× compression that turns a 100 TB
    vector corpus into a ~1.6 TB code table scannable map-side, with exact
    rescoring touching only rerank*k true vectors per query. Scalar q8
    (quantized_topk) compresses 4×; PQ is the next rung.

    Determinism discipline (cross-engine hashable like ivf/lsh/q8): seeds
    are the ksub smallest ids' subvectors; assignment distances use the
    dot-product identity |a-b|² = a·a + b·b - 2a·b with ordered folds,
    ROUND(·,9) before rank, centroid means cast to FLOAT; ADC partials
    are summed in fixed subspace order (p0+p1+...), never via a shuffle-
    ordered aggregate.

    Cache discipline: the subvector relation and the trained codebook are
    persisted (both feed two consumers; WITHOUT the caches the codebook
    plan inlines itself into every consumer and Catalyst time explodes).
    Spark's CacheManager holds cached plans until an explicit unpersist,
    so by default (`caches_out=None`) the small result is materialized
    eagerly and both caches are released before returning — nothing pins
    executor storage after the call. A caller composing this into a
    larger single-action plan passes `caches_out=[]` to keep the result
    lazy and takes ownership: unpersist every DataFrame appended there
    once the action has run.
    """
    if dim % m != 0:
        raise ValueError(f"pq_topk: dim {dim} not divisible by m {m}")
    dsub = dim // m

    sub_entries = F.array(*[
        F.struct(
            F.lit(i).alias("m"),
            F.expr(
                f"transform(slice({vec_col}, {i * dsub + 1}, {dsub}), "
                "x -> CAST(x AS DOUBLE))"
            ).alias("sv"),
        )
        for i in range(m)
    ])

    def subvecs(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id), F.explode(sub_entries).alias("e")
        ).select(out_id, F.col("e.m").alias("m"), F.col("e.sv").alias("sv"))

    csub = subvecs(corpus, "neighbor_id").persist()

    # --- codebook: seed with the ksub smallest ids, one Lloyd step ---
    wseed = Window.partitionBy("m").orderBy("neighbor_id")
    seeds = (
        csub.withColumn("__rn", F.row_number().over(wseed))
        .filter(F.col("__rn") <= ksub)
        .select("m", (F.col("__rn") - 1).alias("cent_id"), F.col("sv").alias("cvec"))
    )

    def assign(cents: DataFrame) -> DataFrame:
        dist = F.round(
            _dot_d("sv", "sv") + _dot_d("cvec", "cvec") - 2 * _dot_d("sv", "cvec"), 9
        )
        w = Window.partitionBy("neighbor_id", "m").orderBy(
            F.col("__dist").asc(), F.col("cent_id")
        )
        return (
            csub.join(F.broadcast(cents), "m")
            .withColumn("__dist", dist)
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
        )

    members = assign(seeds).select("m", F.col("cent_id").alias("cell"), "sv")
    cents = (
        members.select("m", "cell", F.posexplode("sv").alias("d", "x"))
        .groupBy("m", "cell", "d")
        .agg(F.avg("x").alias("mu"))
        .groupBy("m", "cell")
        .agg(F.sort_array(F.collect_list(F.struct("d", "mu"))).alias("dm"))
        .select(
            "m",
            F.col("cell").alias("cent_id"),
            F.expr(
                "transform(dm, e -> CAST(CAST(e.mu AS FLOAT) AS DOUBLE))"
            ).alias("cvec"),
        )
    ).persist()  # tiny (m·ksub rows); feeds encode + the ADC lookup table

    codes = assign(cents).select("neighbor_id", "m", F.col("cent_id").alias("code"))

    # --- ADC: per-query per-subspace lookup table, summed in m order ---
    qsub = subvecs(queries, "query_id")
    lut = qsub.join(F.broadcast(cents), "m").select(
        "query_id", "m", "cent_id",
        F.round(_dot_d("sv", "cvec"), 9).alias("pdot"),
    )
    adc = (
        codes.join(
            lut, (codes["m"] == lut["m"]) & (codes["code"] == lut["cent_id"])
        )
        .select("query_id", "neighbor_id", codes["m"].alias("mm"), "pdot")
        .groupBy("query_id", "neighbor_id")
        .agg(*[
            F.max(F.when(F.col("mm") == i, F.col("pdot"))).alias(f"p{i}")
            for i in range(m)
        ])
    )
    approx_sum = F.col("p0")
    for i in range(1, m):
        approx_sum = approx_sum + F.col(f"p{i}")
    adc = adc.select(
        "query_id", "neighbor_id", F.round(approx_sum, 6).alias("approx")
    ).filter(F.col("query_id") != F.col("neighbor_id"))

    wa = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id")
    )
    shortlist = (
        adc.withColumn("__r", F.row_number().over(wa))
        .filter(F.col("__r") <= rerank * k)
        .select("query_id", "neighbor_id")
    )

    q0 = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c0 = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        shortlist.join(q0, "query_id")
        .join(c0, "neighbor_id")
        .withColumn("cos", F.round(cosine("qv", "cv"), 6))
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )
    if caches_out is not None:
        # caller owns the caches: keep the result lazy so it fuses into
        # the caller's single action; caller unpersists these afterwards
        caches_out.extend([csub, cents])
        return out
    # standalone call: materialize the small result, release both caches
    out = out.localCheckpoint(eager=True)
    csub.unpersist()
    cents.unpersist()
    return out


# ---------------------------------------------------------------------------
# IVF+PQ persistent index — the canonical billion-scale serving layout
# (FAISS IVFPQ shape, non-residual): coarse cells for partition-pruned
# probes × PQ codes for byte-scale scans within them.
# ---------------------------------------------------------------------------


def _pq_sub_entries(vec_col: str, m: int, dsub: int) -> Column:
    return F.array(*[
        F.struct(
            F.lit(i).alias("m"),
            F.expr(
                f"transform(slice({vec_col}, {i * dsub + 1}, {dsub}), "
                "x -> CAST(x AS DOUBLE))"
            ).alias("sv"),
        )
        for i in range(m)
    ])


def _pq_dist() -> Column:
    return F.round(
        _dot_d("sv", "sv") + _dot_d("cvec", "cvec") - 2 * _dot_d("sv", "cvec"), 9
    )


def _pq_assign(sub: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """(id, m) → nearest codebook entry (deterministic tie-break)."""
    w = Window.partitionBy(id_col, "m").orderBy(
        F.col("__dist").asc(), F.col("cent_id")
    )
    return (
        sub.join(F.broadcast(cents), "m")
        .withColumn("__dist", _pq_dist())
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
    )


def _residualize(cells: DataFrame, centroids: DataFrame) -> DataFrame:
    """(neighbor_id, cv − c_cell) — the residual the PQ codebooks encode
    in residual mode. Broadcast centroid join, map-side subtraction."""
    return cells.join(
        F.broadcast(
            centroids.select(F.col("cent_id").alias("cell_id"), "cent_vec")
        ),
        "cell_id",
    ).select(
        "neighbor_id",
        F.expr(
            "zip_with(cv, cent_vec,"
            " (x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        ).alias("cv"),
    )


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    lloyd_iterations: int = 1,
    m: int = 4,
    ksub: int = 16,
    dim: int,
    stripe_fn=None,
    residual: bool = False,
) -> None:
    """Materialize the IVFPQ structure under `path`:

      centroids/  — Lloyd-refined coarse cell centroids (IVF level)
      codebooks/  — (m, cent_id, cvec, residual) PQ codebooks (trained
                    corpus-wide, same seeding/one-Lloyd-step recipe as
                    `pq_topk`; the `residual` flag makes the index
                    self-describing)
      codes/      — (neighbor_id, m, code) PARTITIONED BY cell_id: the
                    byte-scale scan target (m codes ≈ m bytes per vector)
      cells/      — raw vectors partitioned by cell_id (exact-rescore pool)

    `residual=True` encodes v − c_cell(v) instead of v (FAISS's IVFPQ
    default): residuals are smaller than raw vectors, so the same code
    budget quantizes them with less error — ADC then scores
    dot(q, c_cell) + Σ dot(q_m, codebook[r_m]). Pays one extra broadcast
    join at build/update and one per-(query, cell) dot at query time.

    At 100 TB: `codes/` is the only relation the ADC stage scans — probes
    read nprobe/n_cells of it via partition pruning, and only the
    shortlisted rerank·k vectors per query are fetched from `cells/`.
    """
    if dim % m != 0:
        raise ValueError(f"build_ivfpq_index: dim {dim} not divisible by m {m}")
    dsub = dim // m
    root = path.rstrip("/")
    spark = corpus.sparkSession

    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    centroids = stripe_centroids(c, n_cells=n_cells, stripe_fn=stripe_fn)
    if lloyd_iterations:
        centroids = lloyd_refine(c, centroids, iterations=lloyd_iterations)
    centroids.write.mode("overwrite").parquet(f"{root}/centroids")
    persisted = spark.read.parquet(f"{root}/centroids")
    assigned = assign_cells(c, persisted, "cv", "cell_id", 1)
    assigned.write.mode("overwrite").partitionBy("cell_id").parquet(f"{root}/cells")

    # --- PQ codebooks (corpus-wide, pq_topk's recipe) ---
    if residual:
        enc_src = _residualize(
            spark.read.parquet(f"{root}/cells"), persisted
        )
    else:
        enc_src = c
    csub = enc_src.select(
        "neighbor_id", F.explode(_pq_sub_entries("cv", m, dsub)).alias("e")
    ).select("neighbor_id", F.col("e.m").alias("m"), F.col("e.sv").alias("sv")).persist()
    wseed = Window.partitionBy("m").orderBy("neighbor_id")
    seeds = (
        csub.withColumn("__rn", F.row_number().over(wseed))
        .filter(F.col("__rn") <= ksub)
        .select("m", (F.col("__rn") - 1).alias("cent_id"), F.col("sv").alias("cvec"))
    )
    members = _pq_assign(csub, seeds, "neighbor_id").select(
        "m", F.col("cent_id").alias("cell"), "sv"
    )
    cents = (
        members.select("m", "cell", F.posexplode("sv").alias("d", "x"))
        .groupBy("m", "cell", "d")
        .agg(F.avg("x").alias("mu"))
        .groupBy("m", "cell")
        .agg(F.sort_array(F.collect_list(F.struct("d", "mu"))).alias("dm"))
        .select(
            "m",
            F.col("cell").alias("cent_id"),
            F.expr(
                "transform(dm, e -> CAST(CAST(e.mu AS FLOAT) AS DOUBLE))"
            ).alias("cvec"),
        )
    )
    cents.withColumn("residual", F.lit(residual)).write.mode(
        "overwrite"
    ).parquet(f"{root}/codebooks")
    # encode against the PERSISTED codebooks (same read-back discipline as
    # build_ivf_index: float means must match what queries will read)
    cb = spark.read.parquet(f"{root}/codebooks").drop("residual")
    codes = _pq_assign(csub, cb, "neighbor_id").select(
        "neighbor_id", "m", F.col("cent_id").alias("code")
    )
    # read the cell assignment BACK from cells/ — `assigned` is a lazy plan
    # whose crossJoin+window lineage would otherwise re-run the build's
    # most expensive stage just for this column-pruned join
    cell_of = spark.read.parquet(f"{root}/cells").select("neighbor_id", "cell_id")
    codes.join(cell_of, "neighbor_id").write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(f"{root}/codes")
    csub.unpersist()


def ivfpq_index_topk(
    spark,
    queries: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
    rerank: int = 6,
) -> DataFrame:
    """Query a materialized IVFPQ index: probe `nprobe` cells (partition-
    pruned codes scan), ADC-score the probed codes against per-query
    lookup tables, exactly rescore the top rerank·k from `cells/`.

    With nprobe = n_cells this is exactly `pq_topk` over the same corpus
    (same codebooks, same shortlist, same rescore) — asserted in tests;
    smaller nprobe trades recall for reading 1/n_cells-sized slices."""
    root = path.rstrip("/")
    cb = spark.read.parquet(f"{root}/codebooks")  # KB-scale, broadcast below
    residual = "residual" in cb.columns and bool(
        cb.select("residual").first()["residual"]
    )
    cb = cb.drop("residual") if "residual" in cb.columns else cb
    first = cb.select(F.max("m").alias("mx")).first()
    if first is None or first["mx"] is None:
        raise ValueError(f"ivfpq_index_topk: empty codebooks under {path}")
    m = int(first["mx"]) + 1
    dsub_row = cb.select(F.size("cvec").alias("d")).first()
    dsub = int(dsub_row["d"])

    centroids = spark.read.parquet(f"{root}/centroids")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    query_cells = assign_cells(q, centroids, "qv", "cell_id", nprobe)
    probed = [r["cell_id"] for r in query_cells.select("cell_id").distinct().collect()]
    if not probed:
        return spark.createDataFrame(
            [], "query_id bigint, rank int, neighbor_id bigint, cos double"
        )
    codes = spark.read.parquet(f"{root}/codes").filter(F.col("cell_id").isin(probed))
    # PER-QUERY probe restriction: each query scores only ITS OWN probed
    # cells' codes (the IVFPQ contract) — without this join a diverse query
    # batch would ADC against the union of everyone's cells, costing the
    # whole codes table instead of nprobe/n_cells per query
    cand = codes.join(
        F.broadcast(query_cells.select("query_id", "cell_id")), "cell_id"
    ).select("query_id", "neighbor_id", "cell_id", "m", "code")

    qsub = q.select(
        "query_id", F.explode(_pq_sub_entries("qv", m, dsub)).alias("e")
    ).select("query_id", F.col("e.m").alias("m"), F.col("e.sv").alias("sv"))
    lut = qsub.join(F.broadcast(cb), "m").select(
        "query_id", "m", "cent_id", F.round(_dot_d("sv", "cvec"), 9).alias("pdot")
    )
    adc = (
        cand.join(
            lut,
            (cand["query_id"] == lut["query_id"])
            & (cand["m"] == lut["m"])
            & (cand["code"] == lut["cent_id"]),
        )
        .select(
            cand["query_id"], "neighbor_id", "cell_id",
            cand["m"].alias("mm"), "pdot",
        )
        .groupBy("query_id", "neighbor_id", "cell_id")
        .agg(*[
            F.max(F.when(F.col("mm") == i, F.col("pdot"))).alias(f"p{i}")
            for i in range(m)
        ])
    )
    approx_sum = F.col("p0")
    for i in range(1, m):
        approx_sum = approx_sum + F.col(f"p{i}")
    if residual:
        # residual ADC: dot(q, v) ≈ dot(q, c_cell) + Σ dot(q_m, r_code_m);
        # the coarse term is per-(query, probed cell) — a tiny broadcast
        qc = (
            query_cells.select("query_id", "cell_id")
            .join(q, "query_id")
            .join(
                F.broadcast(
                    centroids.select(
                        F.col("cent_id").alias("cell_id"), "cent_vec"
                    )
                ),
                "cell_id",
            )
            .select(
                "query_id", "cell_id",
                F.round(_dot_d("qv", "cent_vec"), 9).alias("qcdot"),
            )
        )
        adc = adc.join(F.broadcast(qc), ["query_id", "cell_id"])
        approx_sum = F.col("qcdot") + approx_sum
    adc = adc.select(
        "query_id", "neighbor_id", F.round(approx_sum, 6).alias("approx")
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    wa = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id")
    )
    shortlist = (
        adc.withColumn("__r", F.row_number().over(wa))
        .filter(F.col("__r") <= rerank * k)
        .select("query_id", "neighbor_id")
    )
    # dropDuplicates: an interrupted update can leave a vector twice in
    # cells/ (codes are the commit marker); without the dedup a duplicate
    # would occupy two top-k slots
    vecs = (
        spark.read.parquet(f"{root}/cells")
        .filter(F.col("cell_id").isin(probed))
        .select("neighbor_id", "cv")
        .dropDuplicates(["neighbor_id"])
    )
    scored = (
        shortlist.join(q, "query_id")
        .join(vecs, "neighbor_id")
        .withColumn("cos", F.round(cosine("qv", "cv"), 6))
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def update_ivfpq_index(
    new_vectors: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally extend a materialized IVFPQ index with appended
    vectors — the ANN analogue of `file_index.update_bloom_index`: cell
    centroids and PQ codebooks are FROZEN (read back from the index), only
    the new batch is assigned and encoded, and its rows append to the
    partitioned cells/ and codes/ dirs. Existing rows are untouched.

    Cost ∝ |batch|, never the corpus. Like the Bloom index's sizing note:
    frozen codebooks drift from the data distribution as the corpus grows
    — rebuild with `build_ivfpq_index` when recall (measured, e.g. via the
    ann_methods recall harness pattern) degrades past budget.

    Retry safety: the CODES append is the commit marker — ids already in
    codes/ are filtered out of the batch (a tiny int-column scan), so a
    straight retry of a failed update is a no-op for committed vectors.
    The one crash window (cells appended, codes not) leaves orphan
    vectors that a retry re-appends; the query path dedups the rescore
    pool by id, so duplicated cells rows cost bytes, never wrong top-k."""
    root = path.rstrip("/")
    spark = new_vectors.sparkSession
    centroids = spark.read.parquet(f"{root}/centroids")
    cb = spark.read.parquet(f"{root}/codebooks")
    residual = "residual" in cb.columns and bool(
        cb.select("residual").first()["residual"]
    )
    cb = cb.drop("residual") if "residual" in cb.columns else cb
    mrow = cb.select(F.max("m").alias("mx")).first()
    if mrow is None or mrow["mx"] is None:
        raise ValueError(f"update_ivfpq_index: empty codebooks under {path}")
    m = int(mrow["mx"]) + 1
    dsub = int(cb.select(F.size("cvec").alias("d")).first()["d"])

    c = new_vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    # idempotence: drop ids whose codes already committed (retried batch)
    committed = (
        spark.read.parquet(f"{root}/codes").select("neighbor_id").distinct()
    )
    c = c.join(committed, "neighbor_id", "left_anti")
    # materialize once: the assignment feeds BOTH the cells append and the
    # codes join — batch-sized, so the checkpoint is cheap, and it avoids
    # re-running the crossJoin+window lineage (same lesson as the build)
    assigned = assign_cells(c, centroids, "cv", "cell_id", 1).localCheckpoint(
        eager=True
    )
    assigned.write.mode("append").partitionBy("cell_id").parquet(f"{root}/cells")

    enc_src = _residualize(assigned, centroids) if residual else c
    csub = enc_src.select(
        "neighbor_id", F.explode(_pq_sub_entries("cv", m, dsub)).alias("e")
    ).select("neighbor_id", F.col("e.m").alias("m"), F.col("e.sv").alias("sv"))
    codes = _pq_assign(csub, cb, "neighbor_id").select(
        "neighbor_id", "m", F.col("cent_id").alias("code")
    )
    codes.join(
        assigned.select("neighbor_id", "cell_id"), "neighbor_id"
    ).write.mode("append").partitionBy("cell_id").parquet(f"{root}/codes")
