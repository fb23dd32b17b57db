"""padawan_spark — a PySpark-native partitioned-analytics engine.

Re-expresses the capability surface of mwiebusch78/padawan (an
out-of-core partitioned dataset manager, ``/root/reference``) on Spark:

- :class:`padawan_spark.dataset.Dataset` — the partition-topology facade
  (index columns, null-first lexicographic bounds, slice/join/
  repartition/collate/concat/map/rename, manifest-carrying parquet IO);
- :mod:`padawan_spark.queries` — the relational query surface (the
  reference delegates row/column compute to polars via ``map``; here it
  is native DataFrame ops optimized by Catalyst);
- :mod:`padawan_spark.functions` — text analysis, dedup, similarity
  search building blocks for large-scale data pipelines;
- :mod:`padawan_spark.streaming` — Structured Streaming variants of the
  event-table operators.
"""

from .dataset import (  # noqa: F401
    AppendError,
    Dataset,
    StatsUnknownError,
    compact_parquet,
    delete_rows,
    merge_rows,
    read_changes,
    refresh_aggregate,
    build_bloom_index,
    scan_point_lookup,
    concat,
    from_pandas,
    scan_parquet,
    scan_parquet_pruned,
    write_metadata,
)
from .metadata import list_versions, vacuum  # noqa: F401
from .functions.delta import read_delta  # noqa: F401
from .functions.iceberg import read_iceberg  # noqa: F401
from .functions.hudi import read_hudi  # noqa: F401
from .session import get_spark  # noqa: F401

__all__ = [
    "AppendError",
    "Dataset",
    "StatsUnknownError",
    "compact_parquet",
    "delete_rows",
    "merge_rows",
    "read_changes",
    "refresh_aggregate",
    "build_bloom_index",
    "scan_point_lookup",
    "read_delta",
    "read_iceberg",
    "read_hudi",
    "concat",
    "from_pandas",
    "get_spark",
    "list_versions",
    "scan_parquet",
    "scan_parquet_pruned",
    "vacuum",
    "write_metadata",
]

__version__ = "0.1.0"
