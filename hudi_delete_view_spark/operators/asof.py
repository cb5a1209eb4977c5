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
    # the payload travels as ONE struct so a single last(ignorenulls) carries
    # the whole matched right row atomically — per-column carries could
    # stitch values from DIFFERENT right rows whenever the most recent row
    # has a NULL in one column. The struct is also the match marker (a
    # right row with all-null payload still yields a non-null struct).
    r = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__r"),
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
    u = u.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__r").isNotNull())
    return out.select(
        *left.columns, *[F.col(f"__r.{c}").alias(c) for c in payload_cols]
    )
