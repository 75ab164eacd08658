"""End-to-end training-corpus curation: the composition a real LLM-data
user runs over `documents`-shaped input, built entirely from this engine's
already-verified operators.

    raw docs
      → clean        (strip markup, redact PII, token counts)   functions/text.py
      → quality gate (declarative rules → passed / quarantined)  operators/quality.py
      → near-dup     (MinHash+LSH pairs → connected components
                      → keep one canonical doc per cluster)      operators/dedup.py, graph.py
      → decontaminate (drop docs sharing any n-gram with a held-
                      out eval set; Bloom-pruned semi-join)      operators/bloom.py
      → split        (leakage-safe: a doc and its near-dups
                      always share a split)                      operators/sampling.py
      → mix          (optional per-group token budgets)          operators/sampling.py
      → pack         (concat-and-cut into fixed token budgets)   operators/packing.py

Scale shape: the composition introduces NO new shuffle beyond each stage's
own — every cross-stage hand-off is either a narrow column projection or an
(anti/semi) join against a relation that is small by construction (cluster
membership, eval shingles, quarantine tags). The two fan-out points —
`cleaned` (feeds the gate AND the shingle pass) and `survivors` (feeds
decontamination AND the split) — are persisted so each upstream scan runs
once per `curate_corpus` call. At 100 TB the same boundaries become parquet
materializations between jobs; nothing else changes.

Stage semantics mirror the published curation recipes (C4 / Gopher /
RefinedWeb-style quality filters, MinHash near-dedup, GPT-2/3-style n-gram
decontamination, leakage-safe splits) — see the operator modules for the
per-algorithm citations. Reference parity: the reference engine
(`scripts/glue/bronze_to_silver.py:86-101`) hard-codes its quality gate as
two inline filters; `curate_corpus` is the declarative, corpus-scale
generalization of that same bronze→silver discipline.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import redact_pii, strip_markup, token_count
from ..operators.bloom import bloom_prune
from ..operators.dedup import cap_hot_shingles, minhash_lsh_pairs, shingle_table
from ..operators.graph import dedup_clusters
from ..operators.packing import pack_concat_cut, shard_of
from ..operators.quality import Rule, in_range, not_null, validate
from ..operators.sampling import leakage_safe_split, token_budget_sample


@dataclass(frozen=True)
class CurationConfig:
    """Knobs for `curate_corpus`; defaults suit the synthetic corpus and
    are the documented tuning surface at scale."""

    min_tokens: int = 5            # Gopher-style short-doc floor
    max_tokens: int = 100_000      # pathological-doc ceiling
    shingle_n: int = 5             # near-dup + decontamination n-gram width
    minhash_k: int = 16
    minhash_bands: int = 4
    neardup_threshold: float = 0.5  # signature-agreement keep threshold
    max_shingle_df: int = 10_000    # hot-shingle cap (stop-shingle guard)
    decontam_fpr: float = 0.01      # Bloom FPR; exact join removes FPs
    split_weights: tuple[float, ...] = (0.98, 0.01, 0.01)
    split_labels: tuple[str, ...] = ("train", "val", "test")
    split_salt: str = "curate"
    pack_budget: int = 256          # tokens per packed sequence
    pack_shards: int = 8            # parallel pack streams
    extra_rules: tuple[Rule, ...] = field(default_factory=tuple)
    # verified salvage: contaminated docs whose leaked-token coverage is
    # ≤ this fraction get their leak ENVELOPE cut (operators/dedup.py::
    # cut_spans) and re-probed instead of dropped; None = always drop
    salvage_max_coverage: float | None = None


def clean_documents(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Markup-strip + PII-redact + token-count in ONE map projection
    (whole-stage codegen; zero shuffle, zero Python)."""
    stripped = strip_markup(F.col(text_col))
    redacted = redact_pii(stripped)
    passthrough = [c for c in docs.columns if c not in (id_col, text_col)]
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *passthrough,
        F.col(text_col).alias("raw_text"),
        redacted.alias("text"),
        token_count(redacted).alias("n_tokens"),
    )


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    eval_docs: DataFrame | None = None,
    budgets: DataFrame | None = None,
    config: CurationConfig = CurationConfig(),
) -> dict[str, DataFrame]:
    """Run the full curation pipeline; returns every stage as a DataFrame
    so callers can materialize, audit, or branch at any boundary:

      cleaned / passed / quarantined / dq_metrics
      dup_pairs / clusters / survivors
      salvaged         (verified-salvage docs, empty unless
                        salvage_max_coverage is set with eval_docs)
      decontaminated   (== survivors when eval_docs is None; includes
                        salvaged docs with their leak envelope cut)
      split            (adds `split` column)
      mixed            (== train split when budgets is None)
      packed

    `eval_docs` must carry (id_col, text_col); `budgets` is a
    (`lang`, budget) relation joined on the documents' `lang` column when
    present (callers without a lang column pass budgets=None).

    CACHE OWNERSHIP: the fan-out boundaries are `persist()`-ed, and
    Spark's CacheManager is not GC'd — the caller OWNS them and must call
    `release_curation(stages)` once done consuming the returned frames
    (every persisted plan, including internals not in the dict, rides the
    `"_caches"` key). A caller that drops the dict without releasing pins
    executor storage for the session — the same contract as
    `operators/similarity.pq_topk(caches_out=...)`.
    """
    cfg = config
    caches: list[DataFrame] = []

    def _pin(df: DataFrame) -> DataFrame:
        caches.append(df.persist())
        return df

    cleaned = _pin(clean_documents(docs, id_col, text_col))

    rules = [
        not_null("text"),
        in_range("n_tokens", cfg.min_tokens, cfg.max_tokens),
        *cfg.extra_rules,
    ]
    passed, quarantined, dq_metrics = validate(cleaned, rules)
    # the gate's pass side feeds the shingle pass, the survivor anti-join,
    # and the split — persist it NARROW: raw_text (the unstripped original)
    # exists for the cleaned/quarantined audit surfaces only, and carrying
    # it forward would double every downstream cache and land each
    # document's full text twice in the packed output
    passed = _pin(passed.drop("raw_text"))

    dup_pairs = minhash_lsh_pairs(
        passed,
        "doc_id",
        "text",
        k=cfg.minhash_k,
        bands=cfg.minhash_bands,
        shingle_n=cfg.shingle_n,
        threshold=cfg.neardup_threshold,
        caches_out=caches,  # the signature pin joins this run's release set
    )
    dup_pairs = _pin(dup_pairs)  # feeds clustering AND the split keying
    clusters = dedup_clusters(dup_pairs)
    losers = clusters.filter(~F.col("is_canonical")).select("doc_id")
    # clustered docs ≪ corpus at real scale → broadcast anti-join
    survivors = passed.join(F.broadcast(losers), "doc_id", "left_anti")

    if eval_docs is not None:
        # the decontamination probes only test shingle EQUALITY (unlike
        # the MinHash pass above, whose signature VALUES depend on the
        # md5-prefix hash): hash both sides with xxhash64 — identical
        # contamination sets at ~1/5 the per-occurrence CPU, and this
        # hash runs once per SURVIVOR-corpus shingle occurrence, the
        # stage's dominant linear cost (operators/dedup.shingle_table)
        eval_sh = (
            shingle_table(eval_docs, id_col, text_col, cfg.shingle_n,
                          hash_fn=F.xxhash64)
            .select("sh")
            .distinct()
        )
        eval_sh = _pin(eval_sh)  # bloom build (count + bitmap) + exact probe
        surv_sh = shingle_table(survivors, "doc_id", "text", cfg.shingle_n,
                                hash_fn=F.xxhash64)
        pruned = _pin(bloom_prune(
            surv_sh, "sh", eval_sh, "sh", fpr=cfg.decontam_fpr
        ))  # cap consumes it twice (df groupBy + anti-join probe)
        capped = cap_hot_shingles(pruned, cfg.max_shingle_df)
        hits = capped.join(eval_sh, "sh").select("doc_id", "sh")
        contaminated = hits.select("doc_id").distinct()
        decontaminated = survivors.join(
            F.broadcast(contaminated), "doc_id", "left_anti"
        )
        if cfg.salvage_max_coverage is not None:
            # VERIFIED SALVAGE: cut the leak envelope out of lightly-
            # contaminated docs instead of dropping them, then RE-PROBE
            # the cut text against the eval shingles — the splice can
            # create a brand-new matching n-gram, so salvage only counts
            # when the re-probe comes back clean. All joins here are on
            # the contaminated side (≪ corpus).
            from ..operators.dedup import cut_spans, leak_spans

            cont_docs = survivors.join(F.broadcast(contaminated), "doc_id")
            spans = leak_spans(
                cont_docs, hits.distinct(), cfg.shingle_n,
                hash_fn=F.xxhash64,
            )  # (doc_id, span_start, span_end, n_covered_tokens)
            light = spans.join(
                cont_docs.select("doc_id", "n_tokens"), "doc_id"
            ).filter(
                F.col("n_covered_tokens")
                <= cfg.salvage_max_coverage * F.col("n_tokens")
            ).select("doc_id", "span_start", "span_end")
            cut = cut_spans(
                cont_docs.join(F.broadcast(light.select("doc_id")), "doc_id"),
                light,
            ).filter(F.col("n_tokens") >= cfg.min_tokens)
            still_hot = (
                shingle_table(cut, "doc_id", "text", cfg.shingle_n,
                              hash_fn=F.xxhash64)
                .join(eval_sh, "sh")
                .select("doc_id")
                .distinct()
            )
            salvaged = _pin(cut.join(
                F.broadcast(still_hot), "doc_id", "left_anti"
            ))
            decontaminated = decontaminated.unionByName(salvaged)
        else:
            salvaged = survivors.limit(0)
    else:
        decontaminated = survivors
        salvaged = survivors.limit(0)
    decontaminated = _pin(decontaminated)

    split = leakage_safe_split(
        decontaminated,
        "doc_id",
        dup_pairs,
        cfg.split_weights,
        cfg.split_labels,
        salt=cfg.split_salt,
        # the dedup stage already clustered exactly these pairs —
        # cluster_id IS the component label (min doc_id); handing it
        # over skips a second full connected-components run
        components=clusters.select(
            F.col("doc_id").alias("node"),
            F.col("cluster_id").alias("component"),
        ),
    )

    train = split.filter(F.col("split") == cfg.split_labels[0])
    if budgets is not None:
        mixed = token_budget_sample(
            train, "lang", "doc_id", "n_tokens", budgets, salt=cfg.split_salt
        ).drop("budget")
    else:
        mixed = train

    packed = pack_concat_cut(
        mixed.withColumn("shard_id", shard_of("doc_id", n_shards=cfg.pack_shards)),
        ["doc_id"],
        "n_tokens",
        budget=cfg.pack_budget,
        n_shards=cfg.pack_shards,
    )

    return {
        "cleaned": cleaned,
        "passed": passed,
        "quarantined": quarantined,
        "dq_metrics": dq_metrics,
        "dup_pairs": dup_pairs,
        "clusters": clusters,
        "survivors": survivors,
        "salvaged": salvaged,
        "decontaminated": decontaminated,
        "split": split,
        "mixed": mixed,
        "packed": packed,
        "_caches": caches,
    }


def release_curation(stages: dict[str, DataFrame]) -> None:
    """Release every cache `curate_corpus` pinned — call once the returned
    frames have been consumed (written out, counted, collected). Targeted:
    unpersists ONLY this run's plans, so a shared session's unrelated
    caches survive (unlike `spark.catalog.clearCache()`). Idempotent."""
    for df in stages.get("_caches", []):
        df.unpersist()


def curation_provenance(
    stages: dict[str, DataFrame], *, train_label: str = "train"
) -> DataFrame:
    """(doc_id, disposition, detail): ONE row per cleaned document
    explaining its fate through the funnel — the "why did my document
    disappear?" debugging surface a curation run owes its users.

    dispositions (first matching, mirroring the pipeline's stage order):
      quarantined  — detail = comma-joined violated rule names
      dup_loser    — detail = "cluster=<id> canonical=<survivor doc_id>"
      contaminated — detail = "dropped", or "salvaged" when the
                     verified-salvage path kept a cut copy (which then
                     flows into the split under its cut text)
      kept         — detail = the split label (train/val/test), or
                     "mixed-out" when the token-budget mixture excluded it
                     (`train_label` must match the pipeline's
                     cfg.split_labels[0] — only the train split is
                     subject to mixing)

    Shape: every leg is a projection/join of ALREADY-persisted stage
    outputs against small derived relations (losers, contaminated ids) —
    plan glue, no new corpus scans beyond what the stages cached."""
    cleaned = stages["cleaned"]
    quarantined = stages["quarantined"].select(
        "doc_id",
        F.lit("quarantined").alias("disposition"),
        F.array_join(F.col("dq_violations"), ",").alias("detail"),
    )
    losers = stages["clusters"].filter(~F.col("is_canonical")).select(
        "doc_id",
        F.lit("dup_loser").alias("disposition"),
        F.concat(
            F.lit("cluster="), F.col("cluster_id").cast("string"),
            F.lit(" canonical="), F.col("cluster_id").cast("string"),
        ).alias("detail"),  # cluster_id IS the canonical (min doc_id)
    )
    surv_ids = stages["survivors"].select("doc_id")
    dec_ids = stages["decontaminated"].select("doc_id")
    salvaged_ids = stages["salvaged"].select("doc_id").withColumn(
        "__salv", F.lit(True)
    )
    dropped_cont = (
        surv_ids.join(dec_ids, "doc_id", "left_anti")
        .select(
            "doc_id",
            F.lit("contaminated").alias("disposition"),
            F.lit("dropped").alias("detail"),
        )
    )
    salvaged = stages["salvaged"].select(
        "doc_id",
        F.lit("contaminated").alias("disposition"),
        F.lit("salvaged").alias("detail"),
    )
    kept = (
        stages["split"].select("doc_id", "split")
        .join(
            stages["mixed"].select("doc_id").withColumn("__in_mix", F.lit(True)),
            "doc_id",
            "left",
        )
        .join(salvaged_ids.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.lit("kept").alias("disposition"),
            F.when(
                F.col("split") != F.lit(train_label), F.col("split")
            ).otherwise(
                F.when(F.col("__in_mix"), F.col("split")).otherwise(
                    F.lit("mixed-out")
                )
            ).alias("detail"),
        )
    )
    out = quarantined.unionByName(losers).unionByName(dropped_cont).unionByName(
        salvaged
    ).unionByName(kept)
    # completeness tripwire: every cleaned doc must appear exactly once
    return out.join(cleaned.select("doc_id"), "doc_id")


def curation_audit(stages: dict[str, DataFrame]) -> DataFrame:
    """One (stage, n_docs, n_tokens) row per row-bearing stage — the
    funnel report a curation run logs. Each leg is a 1-row aggregate over
    an already-persisted stage; the union is driver-side plan glue, not a
    data collect."""
    legs = []
    for name in (
        "cleaned", "passed", "survivors", "salvaged", "decontaminated",
        "mixed",
    ):
        df = stages[name]
        legs.append(
            df.agg(
                F.lit(name).alias("stage"),
                F.count("*").alias("n_docs"),
                F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("n_tokens"),
            )
        )
    packed = stages["packed"].agg(
        F.lit("packed").alias("stage"),
        F.count_distinct("shard_id", "pack_id").alias("n_docs"),
        F.coalesce(F.sum("seg_len"), F.lit(0)).cast("long").alias("n_tokens"),
    )
    out = legs[0]
    for leg in legs[1:] + [packed]:
        out = out.unionByName(leg)
    return out
