"""UDTF chunker ≡ HOF chunker: the Python table function and the JVM
higher-order-function pipeline must emit identical chunk sets."""

from __future__ import annotations

from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.functions.udtf_chunk import make_chunk_udtf
from weather_data_warehouse_aws_spark.queries.chunking import q_chunk_documents
from weather_data_warehouse_aws_spark.sources.tables import load_table


def test_udtf_chunks_match_hof_chunks(spark, sf_smoke_dir):
    hof = q_chunk_documents(spark, sf_smoke_dir)
    want = {
        (r.doc_id, r.chunk_index): r.chunk_md5 for r in hof.collect()
    }

    chunker = make_chunk_udtf()
    spark.udtf.register("chunk_document", chunker)
    docs = load_table(spark, sf_smoke_dir, "documents")
    docs.createOrReplaceTempView("docs_udtf")
    got_df = spark.sql(
        """
        SELECT d.doc_id, c.chunk_index, md5(c.chunk_text) AS chunk_md5
        FROM docs_udtf d, LATERAL chunk_document(d.text) c
        """
    )
    got = {(r.doc_id, r.chunk_index): r.chunk_md5 for r in got_df.collect()}
    assert got == want
    assert len(got) > len(want) * 0  # non-empty by construction
