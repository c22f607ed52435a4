"""Every oracle-gated catalog query must match DuckDB exactly at sf0.001.

This mirrors the driver's CORRECTNESS gate (which runs at sf0.01) with a
comparison at least as strict as its hash match.
"""

from __future__ import annotations

import pytest

from cassandra_sstable_to_protocolbuf_spark.plans.catalog import CATALOG
from tests.conftest import SF_SMOKE
from tests.oracle_harness import run_and_compare

ORACLE_QUERIES = sorted(n for n, qd in CATALOG.items() if qd.oracle is not None)

# A gate that compares empty-to-empty certifies nothing (round-3 verdict:
# tpch_q9/tpch_q11 passed on 0 rows at every SF because their literals
# matched nothing in the testdata). Every gated query must therefore
# produce a NON-empty result at the smoke SF; genuinely-empty results are
# only legal if listed here with a justification. Keep this set empty.
EMPTY_OK: set[str] = set()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    qd = CATALOG[name]
    n = run_and_compare(spark, duck, qd.fn, qd.oracle, SF_SMOKE, name)
    if name not in EMPTY_OK:
        assert n > 0, (
            f"{name}: oracle gate is vacuous -- both engine and oracle "
            f"returned 0 rows, so the comparison certifies nothing. Pick "
            f"gate literals that select data at every SF.")


ROWS_ONLY_QUERIES = sorted(n for n, qd in CATALOG.items() if qd.oracle is None)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    df = CATALOG[name].fn(spark, SF_SMOKE)
    assert df.count() > 0, f"{name}: rows-only query returned an empty frame"
    assert len(df.schema.fields) > 0
