"""CDC MERGE / upsert — warehouse-maintenance tier (SURVEY.md §2
extension: the reference's CTAS+INSERT pipeline stops at append-only
materialization, reference main.py:150-220; a training-data warehouse
also needs in-place change application).

Spark on plain parquet has no MERGE INTO statement, so the operator
expresses the same semantics as one full-outer equi-join on the merge
key plus a projection — the exact physical shape a table-format MERGE
(Delta/Iceberg) lowers to, minus the transactional file rewrite:

- matched + op='D'           -> row dropped
- matched + op='U'           -> payload columns replaced
- unmatched change, op!='D'  -> row inserted
- unmatched base row         -> carried unchanged
- delete of an absent key    -> no-op (standard MERGE semantics)

Scale shape: ONE hash shuffle of each side on the merge key (or zero
if both sides are bucketed on it — sources/bucketed.py), then a
map-side projection.  Change sets are normally << base snapshots, so
AQE picks a broadcast join for the change side automatically; at
100 TB the join is additionally partition-pruned to the partitions
the change set actually touches.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_apply(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    set_cols: Mapping[str, Column],
    insert_cols: Mapping[str, Column],
    op_col: str = "op",
) -> DataFrame:
    """Apply a change set to a snapshot, returning the new snapshot
    plus a ``row_status`` audit column ('kept'/'updated'/'inserted').

    `changes` must carry one row per key with `op_col` in
    {'U','I','D'} ('U' and 'I' are both upserts — matched rows
    update, unmatched insert).  `set_cols` maps payload column name →
    replacement expression (over the joined row) for matched updates;
    `insert_cols` maps EVERY base column except the key → expression
    for unmatched inserts.
    """
    b = base.alias("b")
    c = changes.alias("c")
    joined = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
    matched = F.col(f"b.{key}").isNotNull() & F.col(f"c.{key}").isNotNull()
    op = F.col(f"c.{op_col}")
    is_delete = matched & (op == "D")
    is_update = matched & (op != "D")
    is_insert = F.col(f"b.{key}").isNull() & (op != "D")

    out_cols = [
        F.coalesce(F.col(f"b.{key}"), F.col(f"c.{key}")).alias(key)
    ]
    for name in base.columns:
        if name == key:
            continue
        expr = (
            F.when(is_update, set_cols[name])
            if name in set_cols
            else F.when(is_update, F.col(f"b.{name}"))
        )
        out_cols.append(
            expr.when(is_insert, insert_cols[name])
            .otherwise(F.col(f"b.{name}"))
            .alias(name)
        )
    out_cols.append(
        F.when(is_update, F.lit("updated"))
        .when(is_insert, F.lit("inserted"))
        .otherwise(F.lit("kept"))
        .alias("row_status")
    )
    # Unmatched deletes (op='D', no base row) fall out via is_insert
    # being false AND the delete filter below never selecting them —
    # they produce a row with a NULL base key only if kept, so filter
    # on: not a matched delete, and not an unmatched 'D' ghost.
    ghost_delete = F.col(f"b.{key}").isNull() & (op == "D")
    return joined.filter(~is_delete & ~ghost_delete).select(*out_cols)


def scd2_intervals(
    events: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: collapse a per-key
    ordered value stream into validity intervals.

    Consecutive equal values merge into one interval; a row opens a
    new interval iff its value differs from the previous row's
    (change-point detection via LAG).  ``valid_to`` is the next
    interval's start (NULL = current).  Two narrow window passes over
    the same (key × order) partitioning — one shuffle, reused by both
    windows (Catalyst keeps the exchange).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts_col, tiebreak_col)
    starts = (
        events.withColumn("__prev", F.lag(value_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(value_col)))
        .drop("__prev")
    )
    w2 = Window.partitionBy(key).orderBy(ts_col, tiebreak_col)
    return starts.select(
        key,
        F.col(value_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    payload_cols: list[str],
) -> DataFrame:
    """CDC feed GENERATION — the inverse of :func:`merge_apply`: diff
    two snapshots into a minimal change set (key, op, payload):

    - key only in `new`                      -> 'I' (+ new payload)
    - key only in `old`                      -> 'D'
    - in both with any payload difference    -> 'U' (+ new payload)
    - in both, payloads null-safe equal      -> no row

    Law (property-tested): ``merge_apply(old, snapshot_diff(old, new))``
    reproduces `new` exactly — diff and merge are inverse halves of
    snapshot replication, which is how a warehouse ships incremental
    state to downstream consumers instead of full copies.

    Scale shape: one co-partitioned full-outer join on the key and a
    null-safe struct comparison; the emitted feed is change-sized,
    not snapshot-sized.
    """
    o = old.alias("o")
    n = new.alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    in_old = F.col(f"o.{key}").isNotNull()
    in_new = F.col(f"n.{key}").isNotNull()
    same = F.lit(True)
    for c in payload_cols:
        same = same & F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    op = (
        F.when(~in_old, F.lit("I"))
        .when(~in_new, F.lit("D"))
        .when(~same, F.lit("U"))
    )
    return (
        joined.select(
            F.coalesce(F.col(f"n.{key}"), F.col(f"o.{key}")).alias(key),
            op.alias("op"),
            *[F.col(f"n.{c}").alias(c) for c in payload_cols],
        )
        .filter(F.col("op").isNotNull())
    )
