"""As-of (point-in-time) join — an operator Spark's API lacks.

For every left row, attach the LATEST right row with
right.ts <= left.ts for the same key (the classic "state as of this
event" join: purchase -> most recent prior click, trade -> last quote,
model score -> freshest feature snapshot).

Spark-first composition, no UDF and no range cross join: tag both
sides, union, and take `last(right_payload, ignorenulls=True)` over a
per-key window ordered by (ts, side, tie-breaks). One shuffle on the
key (both inputs co-partitioned by the union), O(n log n) per key for
the window sort — this is the plan a 100 TB as-of join wants, vs the
naive theta-join (left.ts >= right.ts) which Catalyst can only run as
a broadcast-nested-loop or cross product.

Tie rule: a right row at EXACTLY left.ts matches (inclusive) — the
right side sorts before the left at equal ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tiebreak: str | None = None,
) -> DataFrame:
    """left columns + (right_cols renamed with `suffix`) from the
    latest right row at-or-before each left row's ts (NULLs when no
    prior right row exists). `tiebreak` names a right column that
    orders right rows sharing an exact ts (e.g. an event id) so the
    winner is deterministic."""
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, ts)
    ]
    tb_r = F.col(tiebreak) if tiebreak else F.lit(0)
    tb_type = (right.schema[tiebreak].dataType.simpleString()
               if tiebreak else "int")
    l = left.withColumn("_side", F.lit(1)).withColumn(
        "_rpay", F.lit(None).cast(
            "struct<" + ", ".join(
                f"`{c}`: {right.schema[c].dataType.simpleString()}"
                for c in right_cols
            ) + ">"
        )
    ).withColumn("_tb", F.lit(None).cast(tb_type))
    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rpay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (on, ts)],
        tb_r.alias("_tb"),
    ).select(*l.columns)  # align column order for the union
    u = l.unionByName(r)
    w = (
        W.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = u.withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out
