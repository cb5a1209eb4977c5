"""Foreign Apache Iceberg queries over the committed genuine-layout v2
fixture ``tests/fixtures/iceberg_tbl`` (authored by the INDEPENDENT
encoder ``tools/make_iceberg_fixture.py`` — metadata JSON + Avro OCF
manifest lists/manifests + parquet data and POSITION DELETE files this
package's reader did not produce).

The oracles restate the authored per-snapshot file lists and recompute
the semantics from raw parquet in DuckDB — including the position-
delete application via ``file_row_number`` — so a hash match proves the
OCF manifest decode, the status/content routing, and the (path, row
ordinal) anti-join all resolved exactly."""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query

_ICE_FIXTURE = _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..", "tests", "fixtures",
    "iceberg_tbl"))

_S1, _S2, _S3, _S4, _S5, _S6 = (
    9111111111111111101, 9111111111111111102, 9111111111111111103,
    9111111111111111104, 9111111111111111105, 9111111111111111106)

_DA2 = f"{_ICE_FIXTURE}/data/da2-00003.parquet"
_DB = f"{_ICE_FIXTURE}/data/db-00002.parquet"
_DC = f"{_ICE_FIXTURE}/data/dc-00004.parquet"
_DD = f"{_ICE_FIXTURE}/data/dd-00005.parquet"


@query(
    "iceberg_interop",
    oracle=f"""
SELECT 'snapshot' AS section, id, name, value, part
FROM read_parquet('{_DA2}') WHERE id != 'id2'
UNION ALL
SELECT 'snapshot' AS section, id, name, value, part
FROM read_parquet('{_DB}', file_row_number = true)
WHERE file_row_number != 1
UNION ALL
SELECT 'snapshot' AS section, id, name, value, part
FROM read_parquet('{_DD}')
UNION ALL
SELECT 'time_travel' AS section, id, name, value, part
FROM read_parquet(['{_DA2}', '{_DB}'])
UNION ALL
SELECT 'delete_view_mor' AS section, id, name, value, part
FROM read_parquet('{_DB}', file_row_number = true)
WHERE file_row_number = 1
UNION ALL
SELECT 'delete_view_cow' AS section, id, name, value, part
FROM read_parquet('{_DC}')
UNION ALL
SELECT 'delete_view_eq' AS section, id, name, value, part
FROM read_parquet('{_DA2}') WHERE id = 'id2'
""",
)
def iceberg_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot + time travel + THE FLAGSHIP delete view over a FOREIGN
    genuine-layout Apache Iceberg v2 table (sources/iceberg.py over
    tests/fixtures/iceberg_tbl — metadata JSON, Avro OCF manifest
    list/manifest decode through the same from-spec Avro layer as the
    Hudi log blocks, position-delete anti-join on (recorded path,
    _metadata.row_index)).

    Five sections under one driver row: the current snapshot (COW
    update + MOR position delete + append + COW file drop + the s6
    EQUALITY delete with its same-commit re-insert all resolved — the
    strict data_seq < delete_seq rule kills da2's old id2 and spares
    dd's new one, the Flink CDC upsert shape), time travel to the
    pre-delete snapshot, and the reference's headline question asked of
    a THIRD format it cannot read — in ALL THREE Iceberg delete shapes:
    the s3 position delete reconstructs EXACTLY (no user key: the
    delete file names its target file and row ordinal), the s5
    copy-on-write file drop reconstructs through the keyed anti-join,
    and the s6 equality delete reconstructs EXACTLY and keyless
    (parent-live rows semi-joined to the delete rows on the
    equality_ids columns). The oracle recomputes every section from raw
    parquet with DuckDB's file_row_number."""
    from ..sources.iceberg import read_iceberg_delete_view, read_iceberg_snapshot

    cols = ["id", "name", "value", "part"]
    snap = read_iceberg_snapshot(spark, _ICE_FIXTURE).select(
        F.lit("snapshot").alias("section"), *cols)
    tt = read_iceberg_snapshot(spark, _ICE_FIXTURE, snapshot_id=_S2).select(
        F.lit("time_travel").alias("section"), *cols)
    dv_mor = read_iceberg_delete_view(spark, _ICE_FIXTURE, _S3).select(
        F.lit("delete_view_mor").alias("section"), *cols)
    dv_cow = read_iceberg_delete_view(
        spark, _ICE_FIXTURE, _S5, key_cols=["id"]
    ).select(F.lit("delete_view_cow").alias("section"), *cols)
    dv_eq = read_iceberg_delete_view(spark, _ICE_FIXTURE, _S6).select(
        F.lit("delete_view_eq").alias("section"), *cols)
    return (snap.unionByName(tt).unionByName(dv_mor)
            .unionByName(dv_cow).unionByName(dv_eq))


@query(
    "iceberg_incremental",
    oracle=f"""
SELECT id, name, value, part, CAST({_S2} AS BIGINT) AS snapshot_id
FROM read_parquet('{_DA2}')
UNION ALL
SELECT id, name, value, part, CAST({_S4} AS BIGINT) AS snapshot_id
FROM read_parquet('{_DC}')
UNION ALL
SELECT id, name, value, part, CAST({_S6} AS BIGINT) AS snapshot_id
FROM read_parquet('{_DD}')
""",
)
def iceberg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental append scan (s1, latest] on the foreign Iceberg
    table: each snapshot's ADDED data files stamped with the snapshot
    id, in sequence-number order — the MOR delete snapshot (s3) and the
    COW file drop (s5) add no data files and emit NOTHING; the s6
    upsert emits its re-insert. The oracle restates the authored adds
    per snapshot."""
    from ..sources.iceberg import read_iceberg_incremental

    return read_iceberg_incremental(spark, _ICE_FIXTURE, _S1).select(
        "id", "name", "value", "part",
        F.col("_snapshot_id").alias("snapshot_id"),
    )
