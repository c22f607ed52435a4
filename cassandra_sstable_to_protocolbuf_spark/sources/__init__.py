from cassandra_sstable_to_protocolbuf_spark.sources.cells import encode_lineitem_cells  # noqa: F401
