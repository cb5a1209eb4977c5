"""Spark SQL surface: expose a lake table's views as named temp views so
users query with ``spark.sql`` instead of the Python API — the switch-over
surface for SQL-first consumers of the reference (whose output was likewise
a registered Dataset, DeleteSupport.java:94-95).

Temp views are lazily-planned DataFrames: registering costs metadata only,
and every downstream ``spark.sql`` gets full Catalyst treatment (pushdown
into the pruned snapshot scans, broadcast of small sides) exactly as the
Python API does — there is no second engine here, just names.
"""

from __future__ import annotations

from .sources.cow import CowTable
from .sources.delete_view import DeleteView


def register_views(table: CowTable, name: str) -> list[str]:
    """Register ``<name>`` (snapshot), ``<name>_history`` (commit stats),
    and ``<name>_deletes_<ts>`` for every commit that deleted rows. Returns
    the registered view names."""
    created = [name, f"{name}_history"]
    table.snapshot().createOrReplaceTempView(name)
    table.commit_history().createOrReplaceTempView(f"{name}_history")
    for ts in table.timeline.timestamps():
        meta = table.timeline.commit_metadata(ts)
        if meta.total_records_deleted > 0:
            vn = f"{name}_deletes_{ts}"
            DeleteView(table.spark, table.base_path, ts).dataset().createOrReplaceTempView(vn)
            created.append(vn)
    return created
