"""hudi_delete_view_spark — a PySpark-native lake analytics engine.

Brand-new implementation of the query/data-processing capabilities of the
reference ``shangyuantech/hudi-delete-view`` (a Hudi COW delete-view
utility), re-expressed Spark-first: driver-side metadata layer + DataFrame
data plane, plus the LLM-data-pipeline operator surface (dedup, similarity
search, text analysis, multimodal columns, streaming ingest) designed for
100 TB scale.
"""

from .plans.metadata import CommitMetadata, WriteStat
from .plans.timeline import Timeline, TimelineError
from .session import get_spark
from .sources.cow import CowTable
from .sources.delete_view import DeleteView, delete_view

__all__ = [
    "CommitMetadata",
    "CowTable",
    "DeleteView",
    "Timeline",
    "TimelineError",
    "WriteStat",
    "delete_view",
    "get_spark",
]
