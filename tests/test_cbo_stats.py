"""Catalog statistics → optimizer evidence (SURVEY.md §4): ANALYZE
TABLE feeds real row counts / sizes into Catalyst's cost model, the
"let the optimizer decide" contract for managed tables (file-relation
estimates only see bytes; catalog stats add row counts and enable
CBO features)."""

from __future__ import annotations

from ex9_big_data_gal_drimer_spark.catalog import load_table

from conftest import SF_DIR


def test_analyze_table_statistics_reach_the_plan(spark):
    spark.sql("DROP TABLE IF EXISTS nation_stats_t")
    load_table(spark, SF_DIR, "nation").write.mode("overwrite").saveAsTable(
        "nation_stats_t"
    )
    try:
        n = spark.table("nation_stats_t").count()
        spark.sql("ANALYZE TABLE nation_stats_t COMPUTE STATISTICS")
        desc = {
            r["col_name"]: r["data_type"]
            for r in spark.sql("DESCRIBE TABLE EXTENDED nation_stats_t").collect()
        }
        assert "Statistics" in desc and f"{n} rows" in desc["Statistics"]
        # The COST MODEL sees the analyzed row count once CBO is on
        # (without cbo.enabled, plan stats carry sizeInBytes only).
        spark.conf.set("spark.sql.cbo.enabled", "true")
        stats = (
            spark.table("nation_stats_t")
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
        )
        assert stats.rowCount().isDefined()
        assert int(str(stats.rowCount().get())) == n
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.sql("DROP TABLE IF EXISTS nation_stats_t")
