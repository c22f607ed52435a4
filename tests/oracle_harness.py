"""Local mirror of the driver's correctness gate -- the implementation
lives in the package (cassandra_sstable_to_protocolbuf_spark.oracle) so the
`check` CLI and these tests certify with ONE set of rules."""

from __future__ import annotations

from cassandra_sstable_to_protocolbuf_spark.oracle import (  # noqa: F401
    canonicalize, compare, run_and_compare)
