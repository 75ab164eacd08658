"""Delimited-text and JSON-Lines sources/sinks (SURVEY.md §2.1 additions).

The reference's only text format is multiline JSON arrays
(`bronze_to_silver.py:27-30`); real lakes also land CSV exports and JSONL
event feeds. These helpers wrap Spark's built-in csv/json datasources with
the settings that make text round-trips EXACT — the defaults silently
corrupt data (NULL vs empty string collapse, timestamp timezone drift,
float formatting), and every gotcha here is a real data-loss mode at scale.

Exactness contract (proven by tests/test_text_formats.py): for any
DataFrame of atomic-typed columns, `read_csv(write_csv(df)) ≡ df` and
`read_jsonl(write_jsonl(df)) ≡ df`, including NULL/empty-string
distinction, quotes/newlines inside values, non-ASCII, and timestamps.

Scale shape: both formats are line-splittable (CSV with quoted newlines is
NOT splittable within a file — Spark handles it via `multiLine=false`
default only when values lack newlines; we keep multiLine=true for
correctness and rely on many-files parallelism, the same trade Glue makes).
Schema is explicit on read — runtime inference over 100 TB is a full extra
scan and a correctness hazard (a column of digit-strings infers numeric).
JSONL is the streaming-friendly landing format: append-only, splittable,
schema-tagged per record; it is what `readStream.json` consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

__all__ = ["write_csv", "read_csv", "write_jsonl", "read_jsonl"]

#: sentinel distinguishing NULL from empty string in CSV (RFC 4180 has no
#: native spelling for NULL; Spark's default collapses both to "")
_NULL = "\\N"

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_csv(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """Write an exact-round-trip CSV directory: header, full quoting with
    escaped quotes, `\\N` for NULL (so empty string survives as ""), ISO
    timestamps with explicit offset (session-timezone-proof)."""
    (
        df.write.mode(mode)
        .option("header", True)
        .option("nullValue", _NULL)
        .option("emptyValue", '""')
        .option("escape", '"')  # RFC 4180 doubled quotes, not backslash
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read a `write_csv` directory back with an EXPLICIT schema (inference
    at scale = an extra full scan + type guessing). multiLine tolerates
    quoted embedded newlines; maxCharsPerColumn guards runaway rows."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("nullValue", _NULL)
        # emptyValue stays default on READ: quoted-empty fields parse to ""
        # (setting it here would replace them with the literal option text)
        .option("escape", '"')
        .option("multiLine", True)
        # bound a runaway field (an unbalanced quote under multiLine would
        # otherwise swallow the rest of the file into one column)
        .option("maxCharsPerColumn", 10_000_000)
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """One JSON object per line (the append/stream landing format).
    `ignoreNullFields=false` keeps explicit nulls so the reader cannot
    confuse "absent" with "null" under a nullable schema."""
    (
        df.write.mode(mode)
        .option("ignoreNullFields", False)
        .option("timestampFormat", _TS_FMT)
        .json(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read a JSONL directory with explicit schema. PERMISSIVE mode would
    null-out corrupt records silently; FAILFAST surfaces them — a corrupt
    landing file should stop the pipeline, not thin it."""
    return (
        spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .option("timestampFormat", _TS_FMT)
        .json(path)
    )


def write_orc(df, path: str, *, mode: str = "overwrite") -> None:
    """ORC sink (Spark-native, no extra packages): the columnar
    alternative lake format — same splittable/predicate-pushdown story as
    parquet, common in Hive-heritage lakes."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source; schema comes from the file footers (self-describing,
    unlike the text formats — no explicit schema needed)."""
    return spark.read.orc(path)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table whose files carry EVOLVED schemas (columns
    added by later writers): `mergeSchema` unions all file schemas and
    null-extends older files — the parquet-side twin of the bronze JSON
    optional-column handling (`pipeline/silver.py`'s wind.gust default).
    Costs a footer read per file at planning (why it is not the default);
    tables under a fixed contract should pass an explicit schema instead."""
    return spark.read.option("mergeSchema", True).parquet(path)
