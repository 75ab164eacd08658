"""Broadcast Bloom-filter semi-join pruning.

North-star use (100 TB): a semi-join where the probe side is huge and the
build side is comparatively small — decontamination (corpus vs eval-set
shingles), dim-key pruning, dedup-against-index. Shuffling the probe side
to the join is the dominant cost; a Bloom filter over the build keys,
shipped to every task as a literal, drops non-matching probe rows *at the
scan*, before any shuffle. False positives are then removed by the exact
join that follows, so composing `bloom prune → exact join` is
result-identical to the exact join alone — which is what lets the oracle
hash gate verify the pruned plan against plain-SQL semantics.

Spark's own runtime bloom join filters (`spark.sql.optimizer.runtime.
bloomFilter.enabled`, SPARK-32268) do this automatically for suitable
plans; `bloom_filter_agg` is not SQL-exposed, and the optimizer only
injects filters when size heuristics line up. This operator is the
explicit, always-available form: the bitmap is built distributedly with
built-in aggregates, only ceil(n_bits/64) longs ever reach the driver, and
the probe is pure integer arithmetic inside whole-stage codegen (no UDF,
no Python, no md5 per probe row).

Hashing: the key is expected to be an already well-mixed BIGINT (e.g. the
md5-prefix `portable_hash60` shingle hash used across this repo). The k
probe positions use Kirsch–Mitzenmacher double hashing
(pos_i = h1 + i*h2 mod m), which preserves the asymptotic false-positive
rate of k independent hashes with two derived ones (Kirsch & Mitzenmacher,
"Less Hashing, Same Performance", ESA 2006 — public literature).

Reference parity: the reference engine has no bloom pruning; this is part
of the beyond-reference scale surface (SURVEY.md §2 additions), motivated
by `scripts/sql/sample_queries.sql`-style selective joins.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_params", "build_bloom", "might_contain", "bloom_prune"]


def bloom_params(n_keys: int, fpr: float = 0.01) -> tuple[int, int]:
    """Classic sizing: m = -n·ln(p)/ln(2)^2 bits, k = m/n·ln(2) hashes."""
    n_keys = max(n_keys, 1)
    m = int(math.ceil(-n_keys * math.log(fpr) / (math.log(2) ** 2)))
    m = max(64, ((m + 63) // 64) * 64)  # whole words
    k = max(1, int(round(m / n_keys * math.log(2))))
    return m, min(k, 16)


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """k bit positions via double hashing over a well-mixed BIGINT key.

    h2 is forced odd so successive probes cycle through distinct residues
    when n_bits is even (the common power-of-two/word-aligned case).
    """
    key = key.cast("bigint")
    h1 = F.pmod(key, F.lit(n_bits))
    h2 = F.pmod(F.shiftrightunsigned(key, 23), F.lit(n_bits)).bitwiseOR(F.lit(1))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(n_hashes)]


def build_bloom(keys: DataFrame, key_col: str, n_bits: int, n_hashes: int) -> list[int]:
    """Aggregate the bitmap distributedly; collect only ceil(n_bits/64) longs.

    Plan: explode k positions per key (map-side), partial `bit_or` per
    64-bit word inside each task, one shuffle of ≤ n_bits/64 tiny rows.
    The full bitmap never exists on an executor; the driver assembles the
    word list (this is the same driver-side footprint as broadcasting a
    small dim table — the build side is small by precondition).
    """
    pos = F.explode(F.array(*_positions(F.col(key_col), n_bits, n_hashes))).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    bitmap = [0] * ((n_bits + 63) // 64)
    for row in words:
        bitmap[row.w] = row.word
    return bitmap


def might_contain(bitmap: list[int], key: Column, n_bits: int, n_hashes: int) -> Column:
    """Codegen-friendly probe: element_at into the literal word array plus
    shift/mask per hash. No false negatives; FPR per `bloom_params`."""
    words = F.lit(bitmap)
    test = None
    for pos in _positions(key, n_bits, n_hashes):
        word = F.element_at(words, (pos / 64).cast("int") + F.lit(1))
        # F.shiftright only takes a literal shift; call the SQL builtin for a column shift
        shifted = F.call_function("shiftright", word, F.pmod(pos, F.lit(64)).cast("int"))
        bit = shifted.bitwiseAND(F.lit(1)) == F.lit(1)
        test = bit if test is None else (test & bit)
    return test


def bloom_prune(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    *,
    fpr: float = 0.01,
    n_keys: int | None = None,
) -> DataFrame:
    """Filter `probe` to rows whose key *might* be in `build`'s key set.

    Superset semantics: every true match survives (no false negatives), so
    `bloom_prune(...).join(build, ...)` ≡ `probe.join(build, ...)` exactly.
    Two tiny jobs run at call time on the build side (count + bitmap agg);
    the probe side gains a map-side filter and is never scanned here.
    """
    if n_keys is None:
        n_keys = build.select(build_key).distinct().count()
    n_bits, n_hashes = bloom_params(n_keys, fpr)
    bitmap = build_bloom(build.select(build_key).distinct(), build_key, n_bits, n_hashes)
    return probe.filter(might_contain(bitmap, F.col(probe_key), n_bits, n_hashes))
