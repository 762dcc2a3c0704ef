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
    # exploded form: one row per (priority, quantile), 4 quantiles each
    assert rows and len(rows) % 4 == 0, "expected per-(priority, quantile) rows"
    for r in rows:
        assert r["rel_err"] is not None and r["rel_err"] < 0.02, r


def test_sorted_layout_skips_rowgroups(spark):
    """The sort-clustered layout's contract, read straight from the
    parquet footers: for a one-month l_shipdate predicate, the
    fraction of row groups whose [min,max] intersects the range is a
    small minority — while an UNSORTED copy of the same rows at the
    same row-group size has (nearly) every row group straddling the
    range.  Spark's pushed filter is what consumes those stats, so
    the plan must show a PushedFilters entry for l_shipdate."""
    import datetime
    import tempfile

    import pyarrow.parquet as pq

    from ex9_big_data_gal_drimer_spark.catalog import load_table
    from ex9_big_data_gal_drimer_spark.sources.layout import ingest_sorted

    lo = datetime.datetime(1995, 3, 1)
    hi = datetime.datetime(1995, 4, 1)

    def intersecting_fraction(path):
        total = hit = 0
        for f in glob.glob(os.path.join(path, "*.parquet")):
            meta = pq.ParquetFile(f).metadata
            idx = meta.schema.to_arrow_schema().get_field_index("l_shipdate")
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                total += 1
                if st.min < hi and st.max >= lo:
                    hit += 1
        assert total > 8, f"expected many small row groups, got {total}"
        return hit / total

    sorted_path = ingest_sorted(spark, SF_DIR, block_size=16 * 1024)
    unsorted_path = os.path.join(tempfile.gettempdir(), "ex9_unsorted_test")
    (
        load_table(spark, SF_DIR, "lineitem")
        .repartition(4)  # hash-scatter: every task sees every month
        .write.mode("overwrite")
        .option("parquet.block.size", 16 * 1024)
        .parquet(unsorted_path)
    )

    frac_sorted = intersecting_fraction(sorted_path)
    frac_unsorted = intersecting_fraction(unsorted_path)
    assert frac_sorted < 0.25, f"sorted layout should skip: {frac_sorted}"
    assert frac_unsorted > 0.9, f"unsorted should not skip: {frac_unsorted}"

    df = QUERIES["sorted_layout_rowgroup_skip"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_compaction_reduces_files_preserving_rows(spark, tmp_path):
    """Compaction contract: many small files -> few target-sized
    files, identical row multiset, atomic swap (no *_compacting /
    *_precompact residue), and with sort_col the compacted layout is
    range-clustered again (footer min/max usable)."""
    from ex9_big_data_gal_drimer_spark.catalog import load_table
    from ex9_big_data_gal_drimer_spark.sources.layout import compact

    path = str(tmp_path / "frag")
    li = load_table(spark, SF_DIR, "lineitem")
    li.repartition(32).write.parquet(path)  # fragmented: 32 small files
    before_rows = sorted(
        map(tuple, spark.read.parquet(path).select("l_orderkey", "l_linenumber").collect())
    )

    n_before, n_after = compact(
        spark, path, target_bytes=10 * 1024 * 1024, sort_col="l_shipdate"
    )
    assert n_before == 32 and n_after < 8
    after_rows = sorted(
        map(tuple, spark.read.parquet(path).select("l_orderkey", "l_linenumber").collect())
    )
    assert after_rows == before_rows
    assert not os.path.exists(path + "_compacting")
    assert not os.path.exists(path + "_precompact")


def test_zorder_layout_skips_on_both_columns(spark):
    """Z-order contract from the parquet footers: for a range
    predicate on EACH of the two interleaved columns, the fraction of
    row groups whose [min,max] intersects is a minority — while the
    single-column sorted layout (ingest_sorted on l_shipdate) prunes
    shipdate but has ~every row group straddling any partkey range."""
    import datetime

    import pyarrow.parquet as pq

    from ex9_big_data_gal_drimer_spark.sources.layout import (
        ingest_sorted,
        ingest_zordered,
    )

    def fraction(path, column, lo, hi):
        total = hit = 0
        for f in glob.glob(os.path.join(path, "*.parquet")):
            meta = pq.ParquetFile(f).metadata
            idx = meta.schema.to_arrow_schema().get_field_index(column)
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                total += 1
                if st.min < hi and st.max >= lo:
                    hit += 1
        assert total > 8
        return hit / total

    z = ingest_zordered(spark, SF_DIR, block_size=16 * 1024)
    s = ingest_sorted(spark, SF_DIR, block_size=16 * 1024)
    d_lo, d_hi = datetime.datetime(1995, 3, 1), datetime.datetime(1995, 6, 1)
    # part key range = middle fifth of the domain
    import duckdb

    pk_lo, pk_hi = duckdb.sql(
        f"SELECT CAST(MAX(l_partkey)*0.4 AS BIGINT), CAST(MAX(l_partkey)*0.6 AS BIGINT) FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchone()

    z_date = fraction(z, "l_shipdate", d_lo, d_hi)
    z_part = fraction(z, "l_partkey", pk_lo, pk_hi)
    s_date = fraction(s, "l_shipdate", d_lo, d_hi)
    s_part = fraction(s, "l_partkey", pk_lo, pk_hi)
    assert z_date < 0.75, f"zorder should partially prune dates: {z_date}"
    assert z_part < 0.75, f"zorder should partially prune partkeys: {z_part}"
    assert s_part > 0.9, f"single-sort should NOT prune partkeys: {s_part}"
    # single-sort prunes its own column better than zorder does
    assert s_date <= z_date + 1e-9


def test_zorder_key_bit_interleave_exact(spark):
    """zorder_key on known small ints: bit b of column i lands at
    output position b·n+i (Morton order), checked against a Python
    reference for an exhaustive 8×8 grid."""
    from ex9_big_data_gal_drimer_spark.sources.layout import zorder_key

    def ref(a, b, bits=3):
        out = 0
        for bit in range(bits):
            out |= ((a >> bit) & 1) << (bit * 2)
            out |= ((b >> bit) & 1) << (bit * 2 + 1)
        return out

    rows = [(a, b) for a in range(8) for b in range(8)]
    df = spark.createDataFrame(rows, "a LONG, b LONG")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b",
            zorder_key([F.col("a"), F.col("b")], bits=3).alias("z"),
        ).collect()
    }
    assert got == {(a, b): ref(a, b) for a, b in rows}
