"""Shared TESTDATA table loaders for the query modules.

Lives in its own registration-free module so that importing a helper never
drags in another module's ``@query`` side effects — the driver's oracle
harness checks the first 50 *registered* queries, so registration order is
load_all()'s contract and must not be perturbed by helper imports.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; read nanos as long and convert to a
    microsecond TimestampType column. Integer ``DIV`` (not ``/1000`` in
    double — epoch nanos exceed 2^53, so float division drifts by ±1us
    against DuckDB's truncation).

    Session TZ is pinned to UTC here because the driver may hand us a
    session with another zone — TimestampType rendering and window
    boundaries are TZ-dependent, and the DuckDB oracle renders wall-clock."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes)["ts"] in ("bigint", "long"):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def _dec(c: str):
    return F.col(c).cast("decimal(18,2)")
