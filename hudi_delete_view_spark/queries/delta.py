"""Foreign Delta Lake queries over the committed genuine-layout fixture
``tests/fixtures/delta_tbl`` (authored by the INDEPENDENT encoder
``tools/make_delta_fixture.py`` — transaction-log JSON, hive-partitioned
parquet, a checkpoint parquet + ``_last_checkpoint`` this package's
reader did not produce).

Unlike the binary Hudi log blocks, EVERYTHING here is DuckDB-readable:
the oracles restate the authored per-version file lists (the same
constants the fixture tool wrote into the log) and recompute
snapshot/travel/CDC/delete-view semantics from the raw parquet — a hash
match proves the log replay (checkpoint + JSON deltas, dataChange
semantics, remove/add supersession) resolved exactly the right files."""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query

_DELTA_FIXTURE = _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..", "tests", "fixtures",
    "delta_tbl"))

# the authored per-version file lists (mirrors tools/make_delta_fixture):
# v0 adds F0(part=a: id1-3) F1(part=b: id4-6); v1 removes F0 adds F2
# (id3 -> 333); v2 removes F2,F1 adds F3,F4 (DELETE id2,id5); v3 removes
# F4 adds F5 with dataChange=false (OPTIMIZE); v4 adds F6 (insert id7);
# v5 re-adds F5 with an INLINE deletion vector {0} (DV DELETE id4);
# v6 re-adds F5 with an on-disk 'u' DV {0,1} (DV DELETE id6 — cumulative)
_F = {
    0: "part=a/part-00000-0f0a0000-0000-4000-8000-000000000000-c000.parquet",
    1: "part=b/part-00001-0f1b0000-0000-4000-8000-000000000001-c000.parquet",
    2: "part=a/part-00000-0f2a0000-0000-4000-8000-000000000002-c000.parquet",
    3: "part=a/part-00000-0f3a0000-0000-4000-8000-000000000003-c000.parquet",
    4: "part=b/part-00001-0f4b0000-0000-4000-8000-000000000004-c000.parquet",
    5: "part=b/part-00001-0f5b0000-0000-4000-8000-000000000005-c000.parquet",
    6: "part=a/part-00002-0f6a0000-0000-4000-8000-000000000006-c000.parquet",
}


def _rp(*file_nums: int) -> str:
    """DuckDB read of specific fixture data files with the hive
    partition column recovered from the path."""
    paths = ", ".join(f"'{_DELTA_FIXTURE}/{_F[n]}'" for n in file_nums)
    return f"read_parquet([{paths}], hive_partitioning = true)"


@query(
    "delta_interop",
    oracle=f"""
SELECT 'snapshot' AS section, id, name, value, CAST(part AS VARCHAR) AS part
FROM {_rp(3, 6)}
UNION ALL
SELECT 'snapshot' AS section, id, name, value, CAST(part AS VARCHAR) AS part
FROM read_parquet('{_DELTA_FIXTURE}/{_F[5]}', hive_partitioning = true,
                  file_row_number = true)
WHERE file_row_number NOT IN (0, 1)
UNION ALL
SELECT 'time_travel' AS section, id, name, value, CAST(part AS VARCHAR) AS part
FROM {_rp(2, 1)}
UNION ALL
SELECT 'delete_view' AS section, id, name, value, CAST(part AS VARCHAR) AS part
FROM {_rp(2, 1)}
WHERE id NOT IN (SELECT id FROM {_rp(3, 4)})
""",
)
def delta_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot + time travel + THE FLAGSHIP delete view over a FOREIGN
    genuine-layout Delta Lake table (sources/delta.py over
    tests/fixtures/delta_tbl — log replay through the v3 CHECKPOINT
    parquet plus the v4 JSON delta, remove/add supersession, OPTIMIZE's
    dataChange=false rewrite served for reads but never mistaken for
    change).

    Three sections under one driver row: the latest snapshot (update +
    delete + compaction + post-checkpoint insert + BOTH deletion-vector
    commits all resolved — v5/v6's cumulative DV on F5 applies as a
    (file, row-ordinal) anti-join), time travel to version 1
    (pre-delete), and the reference's headline question asked of a
    table the reference cannot read — which rows did the DELETE commit
    (v2) remove? Reconstructed DeleteView.java:112-163-style:
    candidates = the commit's removed files, survivors = its added
    files, one keyed anti-join, never an untouched file. The oracle
    restates the authored per-version file lists and recomputes each
    section from raw parquet (the DV via file_row_number)."""
    from ..sources.delta import read_delta_delete_view, read_delta_snapshot

    cols = ["id", "name", "value", "part"]
    snap = read_delta_snapshot(spark, _DELTA_FIXTURE).select(
        F.lit("snapshot").alias("section"), *cols)
    tt = read_delta_snapshot(spark, _DELTA_FIXTURE, version=1).select(
        F.lit("time_travel").alias("section"), *cols)
    dv = read_delta_delete_view(spark, _DELTA_FIXTURE, 2, ["id"]).select(
        F.lit("delete_view").alias("section"), *cols)
    return snap.unionByName(tt).unionByName(dv)


@query(
    "delta_incremental",
    oracle=f"""
SELECT id, name, value, CAST(part AS VARCHAR) AS part,
       CAST(1 AS BIGINT) AS commit_version FROM {_rp(2)}
UNION ALL
SELECT id, name, value, CAST(part AS VARCHAR) AS part,
       CAST(2 AS BIGINT) AS commit_version FROM {_rp(3, 4)}
UNION ALL
SELECT id, name, value, CAST(part AS VARCHAR) AS part,
       CAST(4 AS BIGINT) AS commit_version FROM {_rp(6)}
""",
)
def delta_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental pull (0, 4] on the foreign Delta table: every
    dataChange add stamped with its commit version — Delta streaming
    source semantics, so the v3 OPTIMIZE rewrite (dataChange=false)
    emits NOTHING even though it added a file. The oracle restates the
    authored dataChange adds per version. (Window pinned below the
    v5/v6 DV commits, whose feed is covered by delta_dv_delete_view.)"""
    from ..sources.delta import read_delta_incremental

    return read_delta_incremental(spark, _DELTA_FIXTURE, 0, 4).select(
        "id", "name", "value", "part",
        F.col("_commit_version").alias("commit_version"),
    )


@query(
    "delta_cdc",
    oracle=f"""
WITH before0 AS (SELECT * FROM {_rp(0, 1)}),
after4 AS (SELECT * FROM {_rp(3, 5, 6)}),
net AS (
  SELECT COALESCE(a.id, b.id) AS id,
         CASE WHEN b.id IS NULL THEN 'insert'
              WHEN a.id IS NULL THEN 'delete'
              ELSE 'update' END AS op,
         COALESCE(a.name, b.name) AS name,
         COALESCE(a.value, b.value) AS value,
         CAST(COALESCE(a.part, b.part) AS VARCHAR) AS part
  FROM before0 b FULL OUTER JOIN after4 a USING (id)
  WHERE b.id IS NULL OR a.id IS NULL
     OR a.name IS DISTINCT FROM b.name
     OR a.value IS DISTINCT FROM b.value
     OR a.part IS DISTINCT FROM b.part
),
-- per-version change events recomputed from the authored file moves:
-- v1 diff(F0 -> F2), v2 diff(F2+F1 -> F3+F4), v4 diff(nothing -> F6)
ev AS (
  SELECT COALESCE(a.id, b.id) AS id, 1 AS v
  FROM {_rp(0)} b FULL OUTER JOIN {_rp(2)} a USING (id)
  WHERE b.id IS NULL OR a.id IS NULL
     OR a.name IS DISTINCT FROM b.name OR a.value IS DISTINCT FROM b.value
  UNION ALL
  SELECT COALESCE(a.id, b.id) AS id, 2 AS v
  FROM {_rp(2, 1)} b FULL OUTER JOIN {_rp(3, 4)} a USING (id)
  WHERE b.id IS NULL OR a.id IS NULL
     OR a.name IS DISTINCT FROM b.name OR a.value IS DISTINCT FROM b.value
  UNION ALL
  SELECT id, 4 AS v FROM {_rp(6)}
),
stamps AS (SELECT id, CAST(MAX(v) AS BIGINT) AS change_version
           FROM ev GROUP BY id)
SELECT n.op, n.id, n.name, n.value, n.part, s.change_version
FROM net n LEFT JOIN stamps s USING (id)
""",
)
def delta_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net-effect CDC (0, 4] on the foreign Delta table, keyed on id —
    the Delta mirror of the foreign-Hudi net-effect CDC: one row per
    net-changed key, before-image for deletes, change_version = the
    last version that actually changed the key. The v3 OPTIMIZE moves
    rows between files without changing them: pruning includes the
    moved files (else its rows would misread as deletes) and stamps
    ignore it (id3's stamp stays 1, the UPDATE — not 2, the file
    rewrite by the unrelated DELETE; the fixture pins both traps)."""
    from ..sources.delta import read_delta_cdc

    return read_delta_cdc(spark, _DELTA_FIXTURE, ["id"], 0, 4).select(
        "op", "id", "name", "value", "part", "change_version")


@query(
    "delta_data_skipping",
    oracle=f"""
SELECT id, name, value, CAST(part AS VARCHAR) AS part
FROM {_rp(3, 5, 6)} WHERE value BETWEEN 35 AND 65
""",
)
def delta_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """add.stats file skipping on the foreign Delta table (at version
    4, where F5's rows are all alive): min/max bounds prune files whose
    stats provably exclude [35, 65] before any scan (F6 —
    minValues=maxValues=70 — never reads; the pruning pin lives in the
    pytest), with the residual row filter on top. The oracle scans the
    full snapshot and filters."""
    from ..sources.delta import read_delta_snapshot

    return (
        read_delta_snapshot(spark, _DELTA_FIXTURE, version=4,
                            bounds={"value": (35, 65)})
        .filter(F.col("value").between(35, 65))
        .select("id", "name", "value", "part")
    )


@query(
    "delta_dv_delete_view",
    oracle=f"""
SELECT 'v5' AS section, id, name, value, CAST(part AS VARCHAR) AS part
FROM read_parquet('{_DELTA_FIXTURE}/{_F[5]}', hive_partitioning = true,
                  file_row_number = true)
WHERE file_row_number = 0
UNION ALL
SELECT 'v6' AS section, id, name, value, CAST(part AS VARCHAR) AS part
FROM read_parquet('{_DELTA_FIXTURE}/{_F[5]}', hive_partitioning = true,
                  file_row_number = true)
WHERE file_row_number = 1
""",
)
def delta_dv_delete_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE FLAGSHIP question asked of DELETION-VECTOR commits — EXACT
    and KEYLESS: a DV commit re-adds the same file with a new
    (cumulative) vector, so the deleted rows are precisely (new DV
    minus old DV) read back by row ordinal. v5 carries an INLINE (z85)
    vector, v6 an on-disk z85-uuid-named DV file with CRC-verified
    framing; both roaring layers are golden-vector-pinned against the
    real org.roaringbitmap. The oracle re-derives each commit's victim
    ordinals via file_row_number."""
    from ..sources.delta import read_delta_delete_view

    cols = ["id", "name", "value", "part"]
    v5 = read_delta_delete_view(spark, _DELTA_FIXTURE, 5).select(
        F.lit("v5").alias("section"), *cols)
    v6 = read_delta_delete_view(spark, _DELTA_FIXTURE, 6).select(
        F.lit("v6").alias("section"), *cols)
    return v5.unionByName(v6)


_CM_FIXTURE = _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..", "tests", "fixtures",
    "delta_cm_tbl"))

# authored file lists (mirrors tools/make_delta_cm_fixture.py): v0 adds
# FA(part=a: id1-3) FB(part=b: id4-5); v1 removes FA adds FC (DELETE
# id2); v2 adds FD (id6, geo NULL)
_CMF = {
    "FA": "col-08=a/part-00000-aa0a0000-0000-4000-8000-000000000000-c000.parquet",
    "FB": "col-08=b/part-00001-aa1b0000-0000-4000-8000-000000000001-c000.parquet",
    "FC": "col-08=a/part-00000-aa2a0000-0000-4000-8000-000000000002-c000.parquet",
    "FD": "col-08=b/part-00002-aa3b0000-0000-4000-8000-000000000003-c000.parquet",
}


def _cm_rp(*names: str) -> str:
    paths = ", ".join(f"'{_CM_FIXTURE}/{_CMF[n]}'" for n in names)
    return f"read_parquet([{paths}], hive_partitioning = true)"


def _cm_sel(section: str, src: str, extra: str = "") -> str:
    """Physical parquet -> the query's logical output shape: physical
    column names aliased back, nested struct members extracted, the
    hive partition dir (physical name col-08) recovered as part."""
    return f"""
SELECT '{section}' AS section, "col-01" AS id, "col-02" AS doc,
       struct_extract("col-04", 'col-05') AS lat,
       struct_extract("col-04", 'col-06') AS lon,
       COALESCE(array_to_string("col-07", ','), '') AS tags_csv,
       CAST("col-08" AS VARCHAR) AS part
FROM {src}{extra}"""


@query(
    "delta_column_mapping",
    oracle=(
        _cm_sel("snapshot", _cm_rp("FC", "FB", "FD"))
        + "\nUNION ALL" + _cm_sel("time_travel", _cm_rp("FA", "FB"))
        + "\nUNION ALL" + _cm_sel(
            "delete_view", _cm_rp("FA"),
            f""" WHERE "col-01" NOT IN (SELECT "col-01" FROM {_cm_rp("FC")})""",
        )
    ),
)
def delta_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign COLUMN-MAPPED Delta table (delta.columnMapping.mode=name,
    minReaderVersion=2 — the layout every renamed/dropped-column
    Databricks table ships with; r8 VERDICT gap #1, lifted): data files
    store columns under per-field physical names ('col-NN' + parquet
    field ids), partitionValues/stats/hive dirs all physical, nested
    struct members physically renamed too, and the reader
    (sources/delta.py) rebuilds the logical shape recursively from the
    schemaString's delta.columnMapping.physicalName metadata.

    Three sections under one driver row: the latest snapshot (id2
    deleted, id6's NULL struct preserved as NULL, not a struct of
    NULLs), time travel to v0, and the flagship delete view of the
    DELETE commit (v1) keyed on id. The oracle restates the authored
    per-version physical file lists and re-derives every logical column
    from the raw physical parquet."""
    from ..sources.delta import read_delta_delete_view, read_delta_snapshot

    def proj(df: DataFrame, section: str) -> DataFrame:
        return df.select(
            F.lit(section).alias("section"), "id", "doc",
            F.col("geo.lat").alias("lat"), F.col("geo.lon").alias("lon"),
            F.array_join("tags", ",").alias("tags_csv"), "part",
        )

    snap = proj(read_delta_snapshot(spark, _CM_FIXTURE), "snapshot")
    tt = proj(read_delta_snapshot(spark, _CM_FIXTURE, version=0),
              "time_travel")
    dv = proj(read_delta_delete_view(spark, _CM_FIXTURE, 1, ["id"]),
              "delete_view")
    return snap.unionByName(tt).unionByName(dv)
