"""Date-partitioned layout tests (sources/layout.py).

Pins the two properties the data-skipping story needs: the month
predicate reaches the scan as a PARTITION filter (directory pruning,
not row filtering), and the layout write produces one file per
partition directory (no small-files explosion).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.plans import QUERIES
from ex9_big_data_gal_drimer_spark.plans.audit import partition_filters
from ex9_big_data_gal_drimer_spark.sources.layout import (
    PART_COL,
    ingest_partitioned,
    read_partitioned,
)

from conftest import SF_DIR


def test_partition_filter_reaches_scan(spark):
    df = QUERIES["partitioned_scan_pruning"](spark, SF_DIR)
    pf = partition_filters(df)
    assert pf, "expected a partitioned file scan"
    assert any(PART_COL in f and f != "[]" for f in pf), f"no partition pruning: {pf}"


def test_one_file_per_partition_dir(spark):
    path = ingest_partitioned(spark, SF_DIR)
    dirs = [d for d in glob.glob(os.path.join(path, f"{PART_COL}=*"))]
    assert len(dirs) > 12, f"expected many month dirs, got {len(dirs)}"
    for d in dirs:
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) == 1, f"{d} has {len(files)} files"


def test_pruned_scan_reads_subset_of_files(spark):
    path = ingest_partitioned(spark, SF_DIR)
    li = read_partitioned(spark, path)
    pruned = li.filter(F.col(PART_COL).between("1996-01", "1996-06"))
    n_total = li.select(F.input_file_name()).distinct().count()
    n_pruned = pruned.select(F.input_file_name()).distinct().count()
    assert n_pruned <= 6 < n_total, (n_pruned, n_total)


def test_approx_quantiles_within_one_percent(spark):
    """quantiles_approx_scale_variant's self-evidencing rel_err must
    stay under 2% at accuracy 10000.  The sketch bounds RANK error at
    1/accuracy; VALUE error additionally depends on local density, and
    at this test's tiny SF (~300 rows/group) one rank step moves the
    value ~1% — at sf0.01 the measured rel_err is ~1e-4."""
    rows = QUERIES["quantiles_approx_scale_variant"](spark, SF_DIR).collect()
    assert rows, "expected per-priority rows"
    for r in rows:
        assert all(e is not None and e < 0.02 for e in r["rel_err"]), r
