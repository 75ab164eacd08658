"""Python UDTF (table function) — the last of Spark's Python execution
shapes (scalar pandas_udf / mapInPandas / applyInPandas /
applyInPandasWithState / UDTF), demonstrated on document chunking.

The HOF chunker (queries/chunking.py) is the production path — JVM-side,
codegen-friendly. The UDTF spelling exists for chunkers that need real
tokenizers (tiktoken/sentencepiece): one Python process per partition,
rows streamed through `eval`, arbitrary Python per input row, multiple
output rows. tests/test_udtf.py proves the two produce identical chunks.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK_TOKENS = 50
CHUNK_STRIDE = 40


def make_chunk_udtf():
    """Built lazily — the decorator needs an active session to parse the
    return schema."""

    @udtf(returnType="chunk_index int, chunk_text string")
    class ChunkDocument:
        def eval(self, text: str):
            toks = text.strip().split()
            if not toks:
                return
            n_chunks = max(-(-(len(toks) - CHUNK_TOKENS) // CHUNK_STRIDE) + 1, 1)
            for i in range(n_chunks):
                window = toks[i * CHUNK_STRIDE : i * CHUNK_STRIDE + CHUNK_TOKENS]
                yield i, " ".join(window)

    return ChunkDocument
