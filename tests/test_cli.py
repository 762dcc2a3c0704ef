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


def test_cli_adhoc_sql(spark, tmp_path, capsys):
    """--sql runs one ad-hoc statement over the registered testdata
    views and prints TSV (reference main.py:250's raw-SQL surface)."""
    rc = main(
        [
            "--sf-dir",
            SF_DIR,
            "--out",
            str(tmp_path / "wh_sql"),
            "--sql",
            "SELECT n_name, COUNT(*) AS n FROM nation GROUP BY n_name "
            "ORDER BY n_name LIMIT 3",
        ]
    )
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == "n_name\tn"
    assert len(lines) == 4  # header + 3 rows
    assert all("\t1" in l for l in lines[1:])
