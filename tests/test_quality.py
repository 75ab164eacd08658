"""Declarative DQ gate (operators/quality.py): split correctness, metric
counts, single-pass plan shape, and parity with the silver layer's
hand-written gates on the same rule set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.operators.quality import (
    accepted_values,
    in_range,
    matches,
    not_null,
    unique,
    validate,
)
from weather_data_warehouse_aws_spark.plans.inspect import physical_plan


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 25.0, "NY", "a@b.com"),
            (2, None, "NY", "bad-email"),      # null temp + bad email
            (3, 99.0, "??", "c@d.org"),        # out of range + bad city
            (4, 10.0, "LA", "e@f.io"),
            (4, 11.0, "LA", "g@h.co"),         # duplicate id (both rows)
        ],
        "id long, temp double, city string, email string",
    )


def _rules():
    return [
        not_null("temp"),
        in_range("temp", -50.0, 60.0),
        accepted_values("city", ["NY", "LA", "SF"]),
        matches("email", r"^[^@]+@[^@]+\.[^@]+$"),
    ]


def test_split_and_tags(spark):
    passed, quarantined, _ = validate(_df(spark), _rules())
    assert {r["id"] for r in passed.collect()} == {1, 4}
    q = {r["id"]: set(r["dq_violations"]) for r in quarantined.collect()}
    assert q[2] == {"not_null_temp", "matches_email"}
    assert q[3] == {"in_range_temp", "accepted_city"}


def test_metrics_counts(spark):
    _, _, metrics = validate(_df(spark), _rules())
    m = {r["rule"]: r["n_violations"] for r in metrics.collect()}
    assert m["_rows"] == 5
    assert m["not_null_temp"] == 1
    assert m["in_range_temp"] == 1
    assert m["accepted_city"] == 1
    assert m["matches_email"] == 1


def test_unique_rule_flags_all_copies(spark):
    passed, quarantined, _ = validate(_df(spark), [unique("id")])
    assert {r["id"] for r in passed.collect()} == {1, 2, 3}
    assert [r["id"] for r in quarantined.collect()] == [4, 4]


def test_row_rules_are_shuffle_free(spark):
    """The pass/fail split over row-local rules must plan zero Exchanges —
    a pure map-side pass no matter how many rules."""
    passed, quarantined, _ = validate(_df(spark), _rules())
    for side in (passed, quarantined):
        assert "Exchange" not in physical_plan(side)


def test_parity_with_silver_hand_written_gates(spark, sf_dir):
    """The declarative gate reproduces the reference-style filter chain
    (non-null key + physical ranges) row for row on real data."""
    from weather_data_warehouse_aws_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "value", "event_type")
    rules = [
        not_null("value"),
        in_range("value", 0.0, 500.0),
        accepted_values("event_type", ["click", "view", "purchase"]),
    ]
    passed, quarantined, metrics = validate(ev, rules)
    hand = ev.filter(
        F.col("value").isNotNull()
        & F.col("value").between(0.0, 500.0)
        & F.col("event_type").isin("click", "view", "purchase")
    )
    assert passed.count() == hand.count()
    assert passed.exceptAll(hand).count() == 0
    assert passed.count() + quarantined.count() == ev.count()
    m = {r["rule"]: r["n_violations"] for r in metrics.collect()}
    assert m["_rows"] == ev.count()


def test_strip_markup_tags_entities_whitespace(spark):
    from weather_data_warehouse_aws_spark.functions.text import (
        markup_tag_count,
        strip_markup,
    )

    df = spark.createDataFrame(
        [
            (1, '<div class="a"><p>hello</p>  <br/>world</div>'),
            (2, "a &amp; b &lt;kept&gt;"),
            (3, "plain text"),
            (4, "5 < 6 and 7 > 3"),  # bare comparators are not tags
        ],
        ["i", "t"],
    )
    got = {
        r.i: (r.s, r.n)
        for r in df.select(
            "i", strip_markup(F.col("t")).alias("s"), markup_tag_count(F.col("t")).alias("n")
        ).collect()
    }
    assert got[1] == ("hello world", 5)
    assert got[2] == ("a & b <kept>", 0)  # entities unescape AFTER strip
    assert got[3] == ("plain text", 0)
    assert got[4][0] == "5 < 6 and 7 > 3"


def test_repair_then_validate_composition(spark):
    """repair → validate: fixable rows (nulls, out-of-range) are repaired
    with provenance; only genuinely unfixable rows quarantine afterwards."""
    from weather_data_warehouse_aws_spark.operators.quality import (
        clamp,
        fill_default,
        in_range,
        not_null,
        repair,
        validate,
    )

    df = spark.createDataFrame(
        [
            (1, 25.0, 60.0),      # clean
            (2, None, 70.0),      # null temp -> filled
            (3, 999.0, 80.0),     # temp clamps to 60
            (4, 20.0, None),      # humidity has no repair -> quarantines
        ],
        ["id", "temp", "humidity"],
    )
    fixed = repair(df, [fill_default("temp", 15.0), clamp("temp", -50.0, 60.0)])
    got = {r.id: (r.temp, sorted(r.dq_repairs)) for r in fixed.collect()}
    assert got[1] == (25.0, [])
    assert got[2] == (15.0, ["fill_temp"])
    assert got[3] == (60.0, ["clamp_temp"])

    passed, quarantined, metrics = validate(
        fixed, [not_null("temp"), in_range("temp", -50, 60), not_null("humidity")]
    )
    assert {r.id for r in passed.collect()} == {1, 2, 3}
    q = quarantined.collect()
    assert [r.id for r in q] == [4] and q[0].dq_violations == ["not_null_humidity"]


def test_repair_first_declared_wins_and_conditions_see_originals(spark):
    from weather_data_warehouse_aws_spark.operators.quality import (
        Repair,
        clamp,
        repair,
    )
    from pyspark.sql import functions as F2

    df = spark.createDataFrame([(1, 200.0)], ["id", "v"])
    out = repair(
        df,
        [
            clamp("v", 0.0, 100.0),
            Repair("zero_v", "v", F2.lit(0.0), F2.col("v") > 100),
        ],
    ).collect()[0]
    # both fire on the ORIGINAL value; first declared (clamp) wins the value
    assert out.v == 100.0
    assert sorted(out.dq_repairs) == ["clamp_v", "zero_v"]


def test_derived_range_rules_catch_planted_outlier(spark, sf_dir):
    """Rules derived from a clean baseline must pass ~99% of the baseline
    itself and quarantine a planted absurd value."""
    from weather_data_warehouse_aws_spark.operators.quality import (
        derived_range_rules,
        validate,
    )
    from weather_data_warehouse_aws_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    rules = derived_range_rules(li, ["l_quantity", "l_extendedprice"])
    passed, quarantined, _ = validate(li, rules)
    n = li.count()
    assert passed.count() >= 0.97 * n  # tails only
    planted = li.limit(1).select(
        "l_orderkey",
        F.lit(1e12).alias("l_quantity"),
        F.lit(-1e12).alias("l_extendedprice"),
    )
    _, q2, _ = validate(li.unionByName(planted), rules)
    tags = {tuple(sorted(r.dq_violations)) for r in q2.collect() if r.l_quantity == 1e12}
    assert tags == {("in_range_l_extendedprice", "in_range_l_quantity")}


def test_derived_range_rules_all_null_column(spark):
    """An all-null column yields no bounds: skipped by default, descriptive
    error on demand — never an IndexError."""
    import pytest
    from pyspark.sql import functions as F

    from weather_data_warehouse_aws_spark.operators.quality import (
        derived_range_rules,
    )

    df = spark.range(10).select(
        F.col("id").cast("double").alias("ok"),
        F.lit(None).cast("double").alias("dead"),
    )
    rules = derived_range_rules(df, ["ok", "dead"])
    assert [r.name for r in rules] == ["in_range_ok"]

    with pytest.raises(ValueError, match="dead"):
        derived_range_rules(df, ["ok", "dead"], on_all_null="raise")


def test_gopher_rules_gate(spark):
    """The declarative Gopher rule set: a good doc passes, each planted
    defect fires exactly its rule."""
    from weather_data_warehouse_aws_spark.operators.quality import (
        gopher_rules,
        validate,
    )

    good = "the quick brown fox jumps over and over with " + " ".join(
        f"word{i}" for i in range(60)
    )
    short = "the and of short"
    symbols = "the and " + "# " * 40 + " ".join(f"w{i}" for i in range(60))
    nostops = " ".join(f"zz{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, nostops), (5, None)],
        "doc_id int, text string",
    )
    passed, quarantined, metrics = validate(df, gopher_rules())
    ok = {r.doc_id for r in passed.collect()}
    assert ok == {1}  # incl. doc 5: NULL text fails closed
    m = {r["rule"]: r["n_violations"] for r in metrics.collect()}
    assert m["gopher_word_count"] >= 1       # doc 2
    assert m["gopher_symbol_ratio"] >= 1     # doc 3
    assert m["gopher_required_stops"] >= 1   # doc 4
    assert m["gopher_null_text"] >= 1        # doc 5

    # a stopword containing a quote stays a VALUE (no expr injection)
    q = validate(df, gopher_rules(required_stops=("don't", "the")))[2]
    assert q.count() > 0
