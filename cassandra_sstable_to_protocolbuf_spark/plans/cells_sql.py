"""DuckDB oracle SQL for the wide-row cell encoding.

Mirrors sources/cells.py exactly -- same integer formulas, same canonical
string rendering -- so the driver's hash comparison is bit-exact. Any
change to the encoding must change both files.
"""

from __future__ import annotations

# (cell name, DuckDB value expression) -- parallel to cells.CELL_COLUMNS
_DUCK_CELL_COLUMNS = [
    ("l_quantity", "CAST(CAST(ROUND(l_quantity * 100) AS BIGINT) AS VARCHAR)"),
    ("l_extendedprice", "CAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS VARCHAR)"),
    ("l_discount", "CAST(CAST(ROUND(l_discount * 100) AS BIGINT) AS VARCHAR)"),
    ("l_returnflag", "l_returnflag"),
    ("l_shipdate", "strftime(l_shipdate, '%Y-%m-%d')"),
]


def _one_select(i: int, name: str, value_expr: str, replica: bool) -> str:
    sstable = ("'sst-r'" if replica
               else "'sst-' || CAST(l_orderkey % 4 AS VARCHAR)")
    delta = " + 7" if replica else ""
    where = "WHERE l_orderkey % 5 = 0" if replica else ""
    kind_code = f"((l_orderkey * 31 + l_linenumber * 7 + {i * 13}) % 20)"
    kind = (f"CASE WHEN {kind_code} < 14 THEN 'LIVE' "
            f"WHEN {kind_code} < 16 THEN 'DELETED' "
            f"WHEN {kind_code} < 18 THEN 'EXPIRING' "
            f"ELSE 'COUNTER' END")
    return f"""
    SELECT {sstable} AS sstable_id,
           CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) AS key,
           '{name}' AS name,
           {value_expr} AS value,
           l_orderkey * 1000000 + CAST(l_linenumber AS BIGINT) * 100 + {i}{delta} AS writeTime,
           {kind} AS cell_kind,
           CASE WHEN {kind} = 'EXPIRING' THEN ((l_orderkey + {i}) % 2 = 0) END AS ttl_expired,
           ((l_orderkey * 131 + l_linenumber) % 50) <> 0 AS partition_deletion_live
    FROM lineitem {where}"""


def cells_sql() -> str:
    """Full flat cell table as one DuckDB SELECT (primary + replica)."""
    selects = []
    for replica in (False, True):
        for i, (name, expr) in enumerate(_DUCK_CELL_COLUMNS):
            selects.append(_one_select(i, name, expr, replica))
    return "\nUNION ALL\n".join(selects)


def cells_cte() -> str:
    """`cells` CTE header for composing oracle queries."""
    return f"WITH cells AS (\n{cells_sql()}\n)"
