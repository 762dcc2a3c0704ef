"""End-to-end pipeline CLI test (reference `python main.py` parity,
SURVEY.md §3.1): queries → warehouse tables → sqlite → docs → charts →
static dashboard, in one invocation."""

from __future__ import annotations

import json
import sqlite3

from ex9_big_data_gal_drimer_spark.cli import main

from conftest import SF_DIR


def test_cli_pipeline(spark, tmp_path):
    out = tmp_path / "wh"
    rc = main(
        [
            "--sf-dir",
            SF_DIR,
            "--out",
            str(out),
            "--queries",
            "q1_nation_order_stats",
            "lang_distribution",
            "--static-dashboard",
        ]
    )
    assert rc == 0
    # warehouse tables
    assert spark.table("q1_nation_order_stats_results").count() == 25
    assert spark.table("q1_nation_order_stats_sample").count() == 25
    # sqlite export
    with sqlite3.connect(out / "serve.db") as conn:
        tables = {
            r[0]
            for r in conn.execute("SELECT name FROM sqlite_master WHERE type='table'")
        }
    assert "q1_nation_order_stats_sample" in tables
    # docs + dashboard + chart spec
    assert "q1_nation_order_stats_results" in (out / "database_info.md").read_text()
    assert "<h1>" in (out / "dashboard.html").read_text()
    spec = json.loads((out / "static" / "q1_nation_order_stats.json").read_text())
    assert spec["kind"] == "pie" and len(spec["labels"]) >= 15
    for t in (
        "q1_nation_order_stats_results",
        "q1_nation_order_stats_sample",
        "lang_distribution_results",
        "lang_distribution_sample",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
