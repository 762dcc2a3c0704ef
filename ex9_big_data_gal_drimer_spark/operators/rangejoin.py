"""Bucketized range join — the scalable form of point-in-interval
joins (SURVEY.md task list: "as-of join, range join").

A naive point⋈range theta-join is a broadcast nested loop (fine when
one side is tiny) or a cartesian disaster (when both are big).  The
bucketized form turns it into an equi-join:

  - each range [lo, hi) explodes into the fixed-width buckets it
    covers;
  - each point maps to exactly ONE bucket;
  - equi-join on the bucket id, then refine with the exact BETWEEN.

Each point meets only ranges overlapping its bucket, and since a
point lives in one bucket there are no duplicate matches to dedupe.
Shuffle is on the bucket id — both sides hash-partition, skew is
bounded by bucket_width choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to range rows with lo <= point < hi.

    Inner only: the exact BETWEEN refinement is applied as a
    post-join filter, which would silently drop the null-padded rows
    an outer join exists to keep.  (An outer variant needs the BETWEEN
    folded into the join condition itself — not implementable for the
    bucketized shape without a second anti-join pass; raise rather
    than return wrong rows.)"""
    if how != "inner":
        raise ValueError(
            "range_join_bucketed supports how='inner' only: the exact-"
            "BETWEEN post-filter drops outer joins' null-padded rows"
        )
    bucketed_ranges = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                # hi is exclusive: a range ending exactly on a bucket
                # boundary does not cover that bucket; greatest() guards
                # degenerate ranges (hi <= lo) from a descending
                # sequence fanning out spurious bucket rows
                F.greatest(
                    F.floor(F.col(lo_col) / bucket_width),
                    F.floor((F.col(hi_col) - F.lit(1e-9)) / bucket_width),
                ),
            )
        ),
    )
    bucketed_points = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / bucket_width)
    )
    return (
        bucketed_points.join(bucketed_ranges, "__bucket", how)
        .filter(
            (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
        )
        .drop("__bucket")
    )
