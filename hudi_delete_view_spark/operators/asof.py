"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the classic distributed merge: union both sides tagged, one
shuffle on the key, one in-partition sort by (time, side), then
``last(value, ignorenulls)`` over an unbounded-preceding window carries the
most recent right-side values forward onto each left row. No join
explosion, no driver loops — wall-clock is one shuffle + sort regardless of
how many right rows precede each left row (the naive join+argmax approach
is O(|L|·|R|) per key and dies at 100 TB).

Tie rule: a right row at exactly the left row's timestamp matches
(inclusive, `left.time >= right.time`) — same as DuckDB's ASOF JOIN, which
oracles this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach ``payload_cols`` from the most recent right
    row with the same key and ``right_time <= left_time``.

    ``how='inner'`` drops left rows with no match (DuckDB ASOF JOIN
    semantics); ``how='left'`` keeps them with null payload.
    """
    r = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_time).alias("__t"),
        *[F.col(c).alias(f"__r_{c}") for c in payload_cols],
    ).withColumn("__side", F.lit(0))
    l = (
        left.withColumn("__k", F.col(left_on))
        .withColumn("__t", F.col(left_time))
        .withColumn("__side", F.lit(1))
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in payload_cols:
        u = u.withColumn(f"__r_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1).drop("__side", "__k", "__t")
    out = out.select(
        *left.columns, *[F.col(f"__r_{c}").alias(c) for c in payload_cols]
    )
    if how == "inner":
        out = out.filter(F.col(payload_cols[0]).isNotNull())
    return out
