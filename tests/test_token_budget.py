"""token_budget_sample (operators/sampling.py): the two-phase prefix-sum
quota cut must be row-identical to the naive one-window-per-group
formulation, at every bucket count, including degenerate budgets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.sampling import (
    hash_bucket,
    token_budget_sample,
)


def _corpus(spark, n=400, groups=3):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("g"), (F.col("id") % groups).cast("string")).alias("grp"),
            ((F.col("id") * 37 % 19) + 1).alias("tokens"),
        )
    )


def _naive(df, budgets):
    w = (
        Window.partitionBy("grp")
        .orderBy(hash_bucket(F.col("doc_id")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("__cum", F.sum("tokens").over(w))
        .join(budgets, "grp")
        .filter(F.col("__cum") <= F.col("budget"))
        .select("doc_id", "grp", "tokens", "budget")
    )


@pytest.mark.parametrize("n_buckets", [2, 10, 50])
def test_two_phase_equals_naive_window(spark, n_buckets):
    df = _corpus(spark)
    budgets = spark.createDataFrame(
        [("g0", 500), ("g1", 123), ("g2", 1)], "grp string, budget long"
    )
    got = sorted(
        (r["doc_id"], r["grp"])
        for r in token_budget_sample(
            df, "grp", "doc_id", "tokens", budgets, n_buckets=n_buckets
        ).collect()
    )
    want = sorted((r["doc_id"], r["grp"]) for r in _naive(df, budgets).collect())
    assert got == want and len(got) > 0


def test_budget_zero_and_oversized(spark):
    df = _corpus(spark, n=60)
    totals = {
        r["grp"]: r["t"]
        for r in df.groupBy("grp").agg(F.sum("tokens").alias("t")).collect()
    }
    budgets = spark.createDataFrame(
        [("g0", 0), ("g1", totals["g1"]), ("g2", 10**9)], "grp string, budget long"
    )
    out = token_budget_sample(df, "grp", "doc_id", "tokens", budgets).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    assert "g0" not in by_grp  # zero budget keeps nothing
    # exact-total budget keeps the whole group; oversized likewise
    assert len(by_grp["g1"]) == 20 and len(by_grp["g2"]) == 20
    assert sum(r["tokens"] for r in by_grp["g1"]) == totals["g1"]


def test_budget_cut_is_prefix_of_hash_order(spark):
    """Kept set must be a prefix of the (hash, id) order — no cherry-picking."""
    df = _corpus(spark, n=90, groups=1)
    budgets = spark.createDataFrame([("g0", 300)], "grp string, budget long")
    kept = {
        r["doc_id"]
        for r in token_budget_sample(df, "grp", "doc_id", "tokens", budgets).collect()
    }
    ordered = [
        r["doc_id"]
        for r in df.withColumn("__h", hash_bucket(F.col("doc_id")))
        .orderBy("__h", "doc_id")
        .collect()
    ]
    prefix = set(ordered[: len(kept)])
    assert kept == prefix


# ---------------------------------------------------------------------------
# weighted_sample (priority sampling) properties
# ---------------------------------------------------------------------------
def test_weighted_sample_partitioning_invariant(spark):
    """Selection must depend only on (id, weight), never on physical layout."""
    from weather_data_warehouse_aws_spark.operators.sampling import weighted_sample

    rows = [(i, f"g{i % 3}", 10 + (i * 7) % 50) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "tokens"])
    pick = lambda d: sorted(
        (r.grp, r.doc_id)
        for r in weighted_sample(d, "doc_id", "tokens", 10, group_col="grp").collect()
    )
    a = pick(df.repartition(1))
    b = pick(df.repartition(17, "tokens"))
    assert a == b and len(a) == 30  # exactly k per group, layout-independent


def test_weighted_sample_heavy_row_always_selected(spark):
    """Priority p = w/u: a row whose weight dwarfs the rest has higher
    priority than any rival for EVERY u — it must appear under any salt."""
    from weather_data_warehouse_aws_spark.operators.sampling import (
        BUCKETS,
        weighted_sample,
    )

    rows = [(i, 1 + i % 5) for i in range(500)] + [(999, 10 * BUCKETS * BUCKETS)]
    df = spark.createDataFrame(rows, ["doc_id", "tokens"])
    for salt in ("", "a", "b", "c"):
        got = {r.doc_id for r in weighted_sample(df, "doc_id", "tokens", 5, salt=salt).collect()}
        assert 999 in got, f"heavy row missed under salt={salt!r}"


def test_weighted_sample_respects_weights_statistically(spark):
    """Across many salts, a 50×-weight row must be selected far more often
    than a 1×-weight row (inclusion probability ∝ min(w/τ, 1))."""
    from weather_data_warehouse_aws_spark.operators.sampling import weighted_sample

    rows = [(i, 50 if i < 20 else 1) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "tokens"]).cache()
    heavy_hits = light_hits = 0
    for salt in [str(s) for s in range(8)]:
        got = {r.doc_id for r in weighted_sample(df, "doc_id", "tokens", 40, salt=salt).collect()}
        heavy_hits += sum(1 for i in range(20) if i in got)
        light_hits += sum(1 for i in range(20, 400) if i in got)
    heavy_rate = heavy_hits / (8 * 20)
    light_rate = light_hits / (8 * 380)
    assert heavy_rate > 5 * light_rate, (heavy_rate, light_rate)


def test_leakage_safe_split_keeps_near_dups_together(spark, sf_dir):
    """Planted duplicate pairs must share a split under every salt, while
    rows with no near-dup keep exactly their plain split_by_hash assignment."""
    from weather_data_warehouse_aws_spark.operators.sampling import (
        leakage_safe_split,
        split_by_hash,
    )
    from weather_data_warehouse_aws_spark.queries.dedup import (
        EXACT_OFFSET,
        planted_documents,
    )
    from weather_data_warehouse_aws_spark.operators.dedup import exact_duplicates

    docs = planted_documents(spark, sf_dir)
    pairs = exact_duplicates(docs, "doc_id", "text").select(
        F.col("keep_id").alias("id_a"), F.col("dup_id").alias("id_b")
    )
    for salt in ("", "epoch2"):
        out = leakage_safe_split(
            docs, "doc_id", pairs, [0.8, 0.1, 0.1], ["train", "val", "test"], salt=salt
        )
        by_id = {r.doc_id: r.split for r in out.collect()}
        planted = [i for i in by_id if i >= EXACT_OFFSET and i < 2 * EXACT_OFFSET]
        assert planted
        for dup in planted:
            assert by_id[dup] == by_id[dup - EXACT_OFFSET], (salt, dup)

    # non-duplicated rows: identical to the plain split
    plain = {
        r.doc_id: r.split
        for r in split_by_hash(
            docs.withColumn("__skey", F.col("doc_id").cast("string")),
            "__skey", [0.8, 0.1, 0.1], ["train", "val", "test"],
        ).collect()
    }
    dup_ids = {r.id_a for r in pairs.collect()} | {r.id_b for r in pairs.collect()}
    out = leakage_safe_split(docs, "doc_id", pairs, [0.8, 0.1, 0.1], ["train", "val", "test"])
    for r in out.collect():
        if r.doc_id not in dup_ids:
            assert r.split == plain[r.doc_id]


def test_weighted_sample_rejects_fractional_and_negative_weights(spark):
    """The integer-weight contract is enforced in-plan: fractional weights
    (which would silently truncate 0.7 -> 0) and negative weights raise at
    action time."""
    import pytest

    from weather_data_warehouse_aws_spark.operators.sampling import weighted_sample

    frac = spark.createDataFrame(
        [(1, 0.7), (2, 2.0)], "doc_id long, w double"
    )
    with pytest.raises(Exception, match="non-negative integers"):
        weighted_sample(frac, "doc_id", "w", 1).collect()

    neg = spark.createDataFrame([(1, -3.0), (2, 2.0)], "doc_id long, w double")
    with pytest.raises(Exception, match="non-negative integers"):
        weighted_sample(neg, "doc_id", "w", 1).collect()

    # integer-valued doubles are fine (2.0 == floor(2.0))
    ok = spark.createDataFrame([(1, 1.0), (2, 2.0)], "doc_id long, w double")
    assert weighted_sample(ok, "doc_id", "w", 1).count() == 1


def test_weighted_sample_rejects_null_weights(spark):
    """NULL weights must raise, not silently drop the row from every
    sample (NULL < 0 is NULL, so the guard needs an explicit null term)."""
    import pytest

    from weather_data_warehouse_aws_spark.operators.sampling import weighted_sample

    nulls = spark.createDataFrame(
        [(1, None), (2, 2.0)], "doc_id long, w double"
    )
    with pytest.raises(Exception, match="non-negative integers"):
        weighted_sample(nulls, "doc_id", "w", 2).collect()


def test_ewma_long_agrees_with_prefix_frame(spark):
    """The O(n) applyInPandas EWMA must agree EXACTLY with the prefix-list
    HOF fold (alpha=1/2 ⇒ every op is an exact binary scale on both paths),
    including NULL skipping."""
    import datetime as dt

    from pyspark.sql.window import Window

    from weather_data_warehouse_aws_spark.operators.timeseries import ewma_long

    rows = []
    import random

    rnd = random.Random(3)
    for g in ("a", "b"):
        for i in range(40):
            v = None if i % 11 == 7 else round(rnd.uniform(0, 100), 2)
            rows.append((g, dt.date(2024, 1, 1) + dt.timedelta(days=i), v))
    df = spark.createDataFrame(rows, "grp string, day date, val double")

    wp = (
        Window.partitionBy("grp").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hof = (
        df.withColumn("__p", F.collect_list("val").over(wp))
        .withColumn(
            "ewma",
            F.expr(
                "aggregate(__p, CAST(NULL AS DOUBLE),"
                " (acc, x) -> CASE WHEN acc IS NULL THEN x"
                " ELSE 0.5D * x + 0.5D * acc END)"
            ),
        )
        .select("grp", "day", "ewma")
    )
    longp = ewma_long(df, ["grp"], "day", "val").select("grp", "day", "ewma")
    a = {(r.grp, str(r.day)): r.ewma for r in hof.collect()}
    b = {(r.grp, str(r.day)): r.ewma for r in longp.collect()}
    assert a == b  # bit-exact, not approximately
