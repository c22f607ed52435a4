"""Driver contract for the spark-graft builder (PySpark target).

entry()      -- flagship query smoke check at sf0.001
queries()    -- every implemented operator from SURVEY.md §2 (+ extensions)
oracle_sql() -- DuckDB-equivalent SQL for the correctness gate
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cassandra_sstable_to_protocolbuf_spark.plans import catalog as _catalog  # noqa: E402
from cassandra_sstable_to_protocolbuf_spark.session import ensure_shipped  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full pipeline surface -- scan the wide-row
    cell model, drop tombstoned partitions / non-live cells, project to the
    proto shape, group into per-partition rows (SURVEY §2 S+F+P ops)."""
    from cassandra_sstable_to_protocolbuf_spark.plans.cells_queries import sst_row_group
    ensure_shipped(spark)
    return sst_row_group(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Catalog queries, each wrapped to ship the package to executors
    first (the driver's session may run from any cwd/PYTHONPATH)."""
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_shipped(spark)
            return fn(spark, sf_dir)
        return run
    return {name: wrap(fn) for name, fn in _catalog.queries().items()}


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
