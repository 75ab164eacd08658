"""weather_data_warehouse_aws_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of the
reference repo ``Sathish-sj/weather-data-warehouse-aws`` (a serverless AWS
weather lakehouse: Lambda extract → Glue PySpark bronze/silver/gold →
Athena star-schema views), re-expressed Spark-first:

* medallion pipeline (bronze JSON → silver parquet → gold dims → fact views)
  as pure DataFrame / Spark SQL (``pipeline/``),
* every operator the reference exercises (SURVEY.md §2) as a reusable,
  scale-safe primitive (``operators/``, ``functions/``),
* LLM-training-data extensions: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), similarity search, text analysis,
  multimodal column plumbing (``operators/dedup.py``, ``operators/similarity.py``,
  ``functions/text.py``, ``operators/multimodal.py``),
* structured-streaming variants of the batch aggregations (``streaming/``).

Design stance (100 TB first):
  - DataFrame/SQL only; no RDDs; Catalyst + AQE do the physical planning.
  - No global ``Window.orderBy`` surrogate keys in data paths — hash keys
    (``xxhash64``) or partitioned windows instead.
  - Small dims are broadcast; band joins are bucketed equi-joins, never
    theta-only cross products; skew handled by AQE.
  - Python stays out of the hot path: built-in functions first, Arrow-batched
    pandas UDFs where unavoidable, never row-at-a-time UDFs.
"""

__version__ = "0.1.0"
