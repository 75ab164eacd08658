"""Declarative data-quality gate: validate → (passed, quarantined, metrics).

Generalizes the reference's hand-written silver DQ filters
(bronze_to_silver.py:82-88 — null checks and physical-range gates written
as one-off `.filter()` chains) into a rule-driven operator with a
quarantine channel, the pattern every production pipeline converges on:
bad rows are NEVER dropped silently — they land in a quarantine relation
with the violated rule names attached, and per-rule violation counts come
back for monitoring/alerting.

Scale design: all row-local rules evaluate in ONE map-side pass — each rule
contributes a `CASE WHEN violated THEN 'name' END` to an array_compact'd
array column, so a 100-rule gate is still zero shuffles for the pass/fail
split. Metrics aggregate the same boolean expressions (`SUM(CAST(...))`)
in one partial-agg pass — no explode, no per-rule jobs. The only rule that
must shuffle is `unique`, a count window over the key — declared
separately so callers pay that shuffle knowingly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

VIOLATIONS_COL = "dq_violations"


@dataclass(frozen=True)
class Rule:
    """name + a Column predicate that is True when the row VIOLATES it."""

    name: str
    violated: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    """Violated when non-null and outside [lo, hi] — nullness is its own
    rule; a range rule that also fired on nulls would double-count."""
    c = F.col(col)
    return Rule(f"in_range_{col}", c.isNotNull() & ~c.between(lo, hi))


def matches(col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(f"matches_{col}", c.isNotNull() & ~c.rlike(pattern))


def accepted_values(col: str, values) -> Rule:
    c = F.col(col)
    return Rule(f"accepted_{col}", c.isNotNull() & ~c.isin(list(values)))


def unique(*cols: str) -> Rule:
    """Violated for EVERY row of a key appearing more than once. Costs one
    shuffle on the key — the count window, not a self-join."""
    w = Window.partitionBy(*cols)
    return Rule("unique_" + "_".join(cols), F.count("*").over(w) > 1)


def validate(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(passed, quarantined, metrics).

    passed      — input rows violating no rule, original schema;
    quarantined — violating rows + `dq_violations: array<string>`;
    metrics     — one row per rule: (rule, n_violations) + a `_rows` total.
    """
    tags = F.array_compact(
        F.array(*[F.when(r.violated, F.lit(r.name)) for r in rules])
    )
    tagged = df.withColumn(VIOLATIONS_COL, tags)
    passed = tagged.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    quarantined = tagged.filter(F.size(VIOLATIONS_COL) > 0)

    # aggregate over the materialized tag column (not the raw predicates):
    # window-backed rules like `unique` are legal here, and every rule still
    # reduces in the same single partial-agg pass
    counts = tagged.agg(
        F.count("*").alias("_rows"),
        *[
            F.sum(F.array_contains(VIOLATIONS_COL, r.name).cast("long")).alias(r.name)
            for r in rules
        ],
    )
    metrics = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r.name).alias("rule"), F.col(r.name).alias("n_violations"))
                    for r in rules
                ],
                F.struct(F.lit("_rows").alias("rule"), F.col("_rows").alias("n_violations")),
            )
        ).alias("m")
    ).select("m.rule", "m.n_violations")
    return passed, quarantined, metrics


def k_anonymity(
    df: DataFrame, quasi_identifiers: list[str], *, k: int = 5
) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns (Sweeney 2002):
    every row whose quasi-identifier combination matches fewer than k rows
    is re-identifiable. Returns per-combination (quasi..., group_size,
    is_k_anonymous) — one groupBy shuffle on the QI tuple; join it back on
    the QI columns to filter or generalize the violating rows before a
    dataset ships as training data."""
    return (
        df.groupBy(*quasi_identifiers)
        .agg(F.count("*").alias("group_size"))
        .withColumn("is_k_anonymous", F.col("group_size") >= k)
    )


@dataclass(frozen=True)
class Repair:
    """name + target column + a Column producing the repaired value (applied
    only where `when` is True). Declarative sibling of `Rule`."""

    name: str
    col: str
    value: Column
    when: Column


def fill_default(col: str, default) -> Repair:
    """Repair a null with a default — the fix for a `not_null` violation."""
    return Repair(f"fill_{col}", col, F.lit(default), F.col(col).isNull())


def clamp(col: str, lo, hi) -> Repair:
    """Clamp out-of-range values to the nearest bound — the fix for an
    `in_range` violation that keeps the row usable (sensor saturation
    semantics) instead of quarantining it."""
    c = F.col(col)
    return Repair(
        f"clamp_{col}",
        col,
        F.least(F.greatest(c, F.lit(lo)), F.lit(hi)),
        c.isNotNull() & ~c.between(lo, hi),
    )


def repair(df: DataFrame, repairs: list[Repair]) -> DataFrame:
    """Apply declarative repairs in one map-side pass, recording provenance:
    `dq_repairs` lists the repairs that actually fired per row (empty array
    = untouched). Rows the repairs cannot fix still belong in `validate`'s
    quarantine — the intended composition is repair → validate, so only
    genuinely unfixable rows quarantine.

    Every `when` condition tests the ORIGINAL row (all repairs compile into
    ONE projection over the input — no sequential rewriting, so provenance
    and repaired values can never disagree); if several repairs target the
    same column and fire together, the FIRST declared wins. Same scale
    shape as `validate`'s row rules: a 100-repair pipeline is still one
    shuffle-free projection.
    """
    exprs = []
    for c in df.columns:
        e = F.col(c)
        for r in reversed(repairs):  # fold so the first declared is outermost
            if r.col == c:
                e = F.when(r.when, r.value).otherwise(e)
        exprs.append(e.alias(c))
    fired = [F.when(r.when, F.lit(r.name)) for r in repairs]
    exprs.append(F.array_compact(F.array(*fired)).alias("dq_repairs"))
    return df.select(*exprs)


def derived_range_rules(
    df: DataFrame,
    cols: list[str],
    *,
    lo_q: float = 0.005,
    hi_q: float = 0.995,
    relative_error: float = 0.001,
    on_all_null: str = "skip",
) -> list[Rule]:
    """Bootstrap `in_range` rules from the data's own distribution: one
    `approxQuantile` pass (Greenwald-Khanna sketch, mergeable across
    partitions — a single distributed job returning 2·|cols| scalars to the
    driver) yields [lo_q, hi_q] bounds per column. The standard way
    production DQ gets seeded when nobody has written physical bounds yet:
    derive from a trusted baseline load, review, then pin the literals.
    Compose straight into `validate`/`repair`.

    Columns with NO non-null values return an empty quantile list — those
    are skipped by default (`on_all_null='skip'`: no rule is derivable from
    zero observations); pass `on_all_null='raise'` to fail fast instead."""
    if on_all_null not in ("skip", "raise"):
        raise ValueError("on_all_null must be 'skip' or 'raise'")
    bounds = df.stat.approxQuantile(cols, [lo_q, hi_q], relative_error)
    empty = [c for c, b in zip(cols, bounds) if len(b) < 2]
    if empty and on_all_null == "raise":
        raise ValueError(
            f"derived_range_rules: no non-null values to derive bounds from "
            f"in column(s) {empty}"
        )
    return [in_range(c, b[0], b[1]) for c, b in zip(cols, bounds) if len(b) == 2]


def gopher_rules(
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    required_stops: tuple[str, ...] = (
        "the", "be", "to", "of", "and", "that", "have", "with",
    ),
) -> list[Rule]:
    """The Gopher document-quality rule set (Rae et al. 2021 §A1.1) as
    declarative DQ rules for `validate`/`pipeline.curate` — word-count
    bounds, mean-word-length ∈ [3, 10], symbol-to-word ratio (#/ellipsis)
    ≤ 0.1, ≥80% alphabetic words, ≥2 required stopwords. Every predicate
    is an INTEGER comparison (3·n_tok ≤ chars, never chars/n_tok ≥ 3), the
    same cross-engine-exact formulation the doc_profile oracle hashes.
    All map-side; `validate` folds them into its single projection pass.
    """
    toks = f"split(trim({text_col}), '\\\\s+')"
    toksl = f"split(trim(lower({text_col})), '\\\\s+')"
    n_tok = F.expr(f"size({toks})")
    nonws = F.expr(f"length(regexp_replace({text_col}, '\\\\s', ''))")
    n_sym = F.expr(
        f"(length({text_col}) - length(replace({text_col}, '#', '')))"
        f" + (length({text_col}) - length(replace({text_col}, '...', ''))) div 3"
    )
    n_alpha = F.expr(f"size(filter({toks}, t -> t rlike '[A-Za-z]'))")
    n_stops = None
    for w in required_stops:
        # lit(), not string interpolation: a stopword containing a quote
        # must stay a VALUE, never become expression text
        term = F.array_contains(F.expr(toksl), F.lit(w)).cast("int")
        n_stops = term if n_stops is None else n_stops + term
    return [
        # NULL text fails closed: every predicate below is NULL on NULL
        # input (3VL) and validate only tags True predicates, so without
        # this rule a NULL-text doc would sail through the whole gate.
        # Own rule name — composing with a pipeline that already carries
        # not_null(text) must not produce duplicate metric columns.
        Rule(f"gopher_null_{text_col}", F.col(text_col).isNull()),
        Rule("gopher_word_count", ~n_tok.between(min_words, max_words)),
        Rule(
            "gopher_mean_word_len",
            (3 * n_tok > nonws) | (nonws > 10 * n_tok),
        ),
        Rule("gopher_symbol_ratio", 10 * n_sym > n_tok),
        Rule("gopher_alpha_words", 5 * n_alpha < 4 * n_tok),
        Rule("gopher_required_stops", n_stops < 2),
    ]
