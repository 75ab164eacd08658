"""Sequential time-series operators that windows cannot express.

`queries/temporal.py` computes EWMA with an ordered prefix-list frame +
HOF fold — exact and oracle-hashable, but the prefix lists hold O(n²/2)
values per group. This module is the documented LONG-SERIES path: one
Arrow-batched sequential scan per group (`applyInPandas`), O(n) time and
memory, for series too long for prefix frames (multi-year tick data).
Same recurrence, same α-halving exactness; the two paths agree exactly on
shared inputs (unit-asserted).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ewma_long"]


def ewma_long(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    *,
    alpha: float = 0.5,
    out_col: str = "ewma",
) -> DataFrame:
    """y_t = α·x_t + (1-α)·y_{t-1} per key, ordered by `order_col`.

    One shuffle on the key, then a linear in-memory scan per group —
    groups must fit one executor's Arrow batch (the applyInPandas
    contract; a single multi-billion-row key needs time-chunking with
    boundary carry-over, same note as the as-of join). NULL values are
    skipped (the fold ignores them), matching the prefix-frame variant
    ON NaN-FREE INPUTS: Arrow folds SQL NULL and literal NaN into one
    value, so this path treats NaN as missing too, while the JVM
    prefix-frame fold propagates a literal NaN forever — filter NaN
    payloads upstream if the two paths must stay interchangeable.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    # copy, don't .add(): StructType.add mutates the DataFrame's own
    # cached schema object, corrupting df.columns mid-plan
    schema = StructType(list(df.schema.fields) + [StructField(out_col, DoubleType())])

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        # vectorized recurrence: pandas ewm(adjust=False) computes
        # y_t = (1-α)·y_{t-1} + α·x_t — the same single fused
        # multiply-add per step as the explicit fold, so results are
        # bit-identical; ignore_na=True carries y over NaN gaps without
        # decaying (the skip-NULL fold), and NaN positions surface the
        # carried value, NaN before the first valid point. A per-row
        # Python loop here would forfeit vectorization on exactly the
        # long series this path exists for.
        pdf[out_col] = (
            pdf[value_col]
            .astype("float64")
            .ewm(alpha=alpha, adjust=False, ignore_na=True)
            .mean()
        )
        return pdf

    return df.groupBy(*[F.col(c) for c in key_cols]).applyInPandas(_scan, schema)
