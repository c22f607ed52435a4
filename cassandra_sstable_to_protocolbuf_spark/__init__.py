"""PySpark-native analytics engine with the query/data-processing
capabilities of stliu/cassandra-sstable-to-protocolbuf, rebuilt Spark-first.

The reference (see SURVEY.md) is a single-threaded Java batch converter:
scan Cassandra SSTables -> filter dead data -> project cells -> group by
partition key -> delimited-protobuf + zstd sink. This package re-expresses
that surface as DataFrame operators plus a custom protobuf sink, and layers
on the large-scale training-data operators (dedup, similarity search, text
analysis, multimodal columns) that a 100 TB pipeline needs.

Subpackages:
    sources/    wide-row cell model encoders + delimited-protobuf source
    operators/  tombstone filters, projections, dedup, similarity, text
    functions/  reusable column expression helpers
    plans/      the query catalog (queries + DuckDB oracle SQL)
    streaming/  Structured Streaming pipelines over the events table
"""

__version__ = "0.1.0"
