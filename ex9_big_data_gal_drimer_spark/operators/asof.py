"""As-of (point-in-time) join — a custom operator Spark lacks
(SURVEY.md task list: "as-of join, range join").

For each left row, attach the payload of the latest right row with
the same key and right.ts <= left.ts (inclusive).

Implementation is the scalable union+window form, not a row-pair
join: tag both sides, union, and take `last(payload, ignorenulls)`
over a (key)-partitioned window ordered by (ts, right-first).  Cost
is one shuffle on the key + one sort per partition — linear in
|L|+|R|, no candidate explosion, and it spills gracefully.  (The
naive form — theta-join on ts ranges + max — is quadratic per key.)

Matches DuckDB's `ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts`
semantics, which the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: left columns + `asof_<payload>` of the latest
    right row at-or-before each left row's timestamp (NULL when none).
    """
    lcols = left.columns
    tagged_left = left.select(
        *lcols, F.lit(0).alias("__is_right"), *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols]
    )
    tagged_right = right.select(
        *[
            F.col(c) if c in (key, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(1).alias("__is_right"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)

    # right rows sort BEFORE left rows at equal ts → inclusive (>=)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.desc("__is_right"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned.select(
        *lcols,
        "__is_right",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"{payload_prefix}{c}")
            for c in payload_cols
        ],
    )
    return out.filter(F.col("__is_right") == 0).drop("__is_right")
