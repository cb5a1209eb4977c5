"""As-of join operator: match semantics, ties, unmatched rows."""

from datetime import datetime

from pyspark.sql import functions as F

from hudi_delete_view_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_basic_and_tie(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-05T00:00:00"), "e1"),
            (1, _ts("2024-01-10T00:00:00"), "e2"),
            (1, _ts("2024-01-02T00:00:00"), "e0"),  # exact tie with r1
            (2, _ts("2024-01-01T00:00:00"), "e3"),  # before any right row
        ],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-02T00:00:00"), 100),
            (1, _ts("2024-01-07T00:00:00"), 200),
            (2, _ts("2024-06-01T00:00:00"), 300),
        ],
        "k long, rt timestamp, val long",
    )
    out = asof_join(left, right, "k", "k", "t", "rt", ["val"], how="inner")
    got = {r["tag"]: r["val"] for r in out.collect()}
    # e0 matches the right row at the exact same instant (inclusive)
    assert got == {"e0": 100, "e1": 100, "e2": 200}

    out_left = asof_join(left, right, "k", "k", "t", "rt", ["val"], how="left")
    got_left = {r["tag"]: r["val"] for r in out_left.collect()}
    assert got_left == {"e0": 100, "e1": 100, "e2": 200, "e3": None}


def test_asof_multiple_payload_cols(spark):
    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 5, "a", 1.5), (1, 9, "b", 2.5), (1, 11, "c", 3.5)],
        "k long, rt long, name string, score double",
    )
    out = asof_join(left, right, "k", "k", "t", "rt", ["name", "score"]).collect()
    assert len(out) == 1 and out[0]["name"] == "b" and out[0]["score"] == 2.5


def test_salted_join_matches_plain(spark):
    """Salting must be semantically invisible (inner and left joins)."""
    from pyspark.sql import functions as F

    from hudi_delete_view_spark.operators.util import salted_join

    left = spark.range(2000).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    right = spark.createDataFrame([(0, "a"), (1, "b"), (7, "z")], ["k", "tag"])
    for how in ("inner", "left"):
        plain = sorted(map(tuple, left.join(right, "k", how).collect()))
        salted = sorted(map(tuple, salted_join(left, right, "k", how).collect()))
        assert salted == plain, how


def test_functions_surface_imports(spark):
    """The curated functions package must expose every name in __all__ and
    each column factory must build a usable Column."""
    from pyspark.sql import functions as F

    from hudi_delete_view_spark import functions as Fx

    for name in Fx.__all__:
        assert hasattr(Fx, name), name
    df = spark.createDataFrame([(1, "hello world", [1.0, 2.0])], ["id", "text", "vec"])
    out = df.select(
        Fx.token_count("text").alias("n"),
        Fx.fingerprint("text").alias("fp"),
        Fx.char_shingles("text", 3).alias("sh"),
    ).collect()[0]
    assert out["n"] == 2 and len(out["fp"]) == 32 and len(out["sh"]) > 0


def test_asof_no_cross_row_stitching(spark):
    """The matched right row's payload must come through ATOMICALLY: a NULL
    column in the most recent match stays NULL (not backfilled from an
    older right row), and inner-join keeps a left row whose genuine match
    has NULL in the first payload column."""
    left = spark.createDataFrame([(1, 100), (1, 200)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 50, "old_a", "old_b"), (1, 150, None, "new_b")],
        "k int, t int, a string, b string",
    )
    got = {
        r["t"]: (r["a"], r["b"])
        for r in asof_join(
            left, right, "k", "k", "t", "t", ["a", "b"], how="inner"
        ).collect()
    }
    # t=100 matches the t=50 row wholly
    assert got[100] == ("old_a", "old_b")
    # t=200 matches the t=150 row: a stays NULL (no stitching with old_a),
    # and the row is NOT dropped by the inner filter despite a IS NULL
    assert got[200] == (None, "new_b")
