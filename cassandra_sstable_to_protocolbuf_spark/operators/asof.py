"""As-of (point-in-time) join -- a custom operator Spark's built-ins
don't offer directly, expressed as a composition of DataFrame ops
(union + window) per the engine's custom-operator policy: composition
first, Pandas-UDF only if semantics demand it (they don't here).

Semantics: for each left row, attach the single right row with the
greatest right_time <= left_time within the same key (backward as-of,
like pandas merge_asof / DuckDB ASOF JOIN).

Scale design: ONE shuffle+sort of left UNION right on (key, time) --
the same cost as a sort-merge join -- then a running last-non-null
window carries the most recent right row forward onto left rows. No
range-explosion, no per-key driver loops; skewed keys behave like any
window partition (AQE-assisted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(left: DataFrame, right: DataFrame, by: str,
               left_time: str, right_time: str,
               value_cols: list[str]) -> DataFrame:
    """Backward as-of join. Right must be unique per (by, right_time);
    pre-aggregate it if not. Returns left columns + value_cols (null
    when no right row precedes the left row).
    """
    lt = F.col(left_time)
    rt = F.col(right_time)
    # JOIN null semantics, not window-group semantics: a null key never
    # matches anything (window partitions would GROUP null keys
    # together), and a right row with a null time has no position on
    # the timeline (nulls-first ordering would otherwise carry it onto
    # every row of its key) -- both match DuckDB's ASOF JOIN, the
    # operator's oracle
    right = right.filter(F.col(by).isNotNull() & rt.isNotNull())
    # the carried right payload is ONE struct so all value columns come
    # from the same right row (per-column last(ignorenulls) could mix
    # rows if right values contain nulls)
    r_struct = F.struct(*[F.col(c) for c in value_cols])
    r_tagged = right.select(
        F.col(by).alias("_k"), rt.alias("_t"), F.lit(0).alias("_is_left"),
        r_struct.alias("_r"),
    )
    l_tagged = left.select(
        F.col(by).alias("_k"), lt.alias("_t"), F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    ).withColumn("_r", F.lit(None).cast(r_tagged.schema["_r"].dataType))
    l_tagged = l_tagged.select("_k", "_t", "_is_left", "_l", "_r")
    r_tagged = r_tagged.withColumn(
        "_l", F.lit(None).cast(l_tagged.schema["_l"].dataType)).select(
        "_k", "_t", "_is_left", "_l", "_r")
    # right rows sort BEFORE left rows at equal time (_is_left asc), so a
    # right row at exactly left_time matches (<= semantics)
    w = (Window.partitionBy("_k").orderBy("_t", "_is_left")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = l_tagged.unionByName(r_tagged).select(
        "_k", "_is_left", "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_r"))
    return (filled.filter(F.col("_is_left") == 1)
            # null-key left rows pass through with null attribution
            .withColumn("_r", F.when(F.col("_k").isNotNull(), F.col("_r")))
            .select("_l.*", *[F.col(f"_r.{c}").alias(c) for c in value_cols]))
