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


_ICE_V3 = _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..", "tests", "fixtures",
    "iceberg_v3_tbl"))
_V3_DA = f"{_ICE_V3}/data/da-00001.parquet"
_V3_DB = f"{_ICE_V3}/data/db-00002.parquet"
_V3_DC = f"{_ICE_V3}/data/dc-00003.parquet"


@query(
    "iceberg_v3_dv_delete_view",
    oracle=f"""
SELECT 'snapshot' AS section, id, name, value
FROM read_parquet('{_V3_DA}', file_row_number = true)
WHERE file_row_number NOT IN (1, 2, 3)
UNION ALL
SELECT 'snapshot' AS section, id, name, value
FROM read_parquet(['{_V3_DB}', '{_V3_DC}'])
UNION ALL
SELECT 'travel_s2' AS section, id, name, value
FROM read_parquet('{_V3_DA}', file_row_number = true)
WHERE file_row_number NOT IN (1, 2)
UNION ALL
SELECT 'travel_s2' AS section, id, name, value
FROM read_parquet('{_V3_DB}')
UNION ALL
SELECT 'delete_view_s3' AS section, id, name, value
FROM read_parquet('{_V3_DA}', file_row_number = true)
WHERE file_row_number = 3
UNION ALL
SELECT 'delete_view_s2' AS section, id, name, value
FROM read_parquet('{_V3_DA}', file_row_number = true)
WHERE file_row_number IN (1, 2)
""",
)
def iceberg_v3_dv_delete_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign Apache Iceberg FORMAT-VERSION 3 table with PUFFIN
    DELETION VECTORS (r8 verdict item 5, refusal lifted):
    tests/fixtures/iceberg_v3_tbl authored by the independent encoder
    tools/make_iceberg_v3_fixture.py — v3 manifests carrying
    referenced_data_file/content_offset/content_size_in_bytes, DV blobs
    in genuine Puffin containers (BE length + D1 D3 39 64 magic +
    portable 64-bit roaring + BE CRC, plans/puffin.py), parsed
    EXECUTOR-side and applied as the same (path, ordinal) anti-join as
    v2 position deletes.

    Four sections under one driver row: the current snapshot (the
    cumulative DV {1,2,3} on file da applied), time travel to the
    FIRST DV commit (only {1,2} dead), and the flagship delete view of
    BOTH DV commits — s3's view must be (new DV minus superseded DV) =
    exactly ordinal 3 (id4), not the cumulative set; s2's is {id2,id3}.
    The oracle recomputes every section from raw parquet ordinals via
    file_row_number."""
    from ..sources.iceberg import (
        _load_metadata,
        read_iceberg_delete_view,
        read_iceberg_snapshot,
    )

    meta = _load_metadata(_ICE_V3)
    snaps = sorted(meta["snapshots"], key=lambda s: s["sequence-number"])
    cols = ["id", "name", "value"]

    def proj(df: DataFrame, section: str) -> DataFrame:
        return df.select(F.lit(section).alias("section"), *cols)

    snap = proj(read_iceberg_snapshot(spark, _ICE_V3), "snapshot")
    tt = proj(read_iceberg_snapshot(
        spark, _ICE_V3, snapshot_id=snaps[1]["snapshot-id"]), "travel_s2")
    dv3 = proj(read_iceberg_delete_view(
        spark, _ICE_V3, snaps[2]["snapshot-id"]), "delete_view_s3")
    dv2 = proj(read_iceberg_delete_view(
        spark, _ICE_V3, snaps[1]["snapshot-id"]), "delete_view_s2")
    return snap.unionByName(tt).unionByName(dv3).unionByName(dv2)
