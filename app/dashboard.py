"""Serving dashboard (SURVEY.md §3.2, reference dashboard.py).

Reads ONLY the tiny exported sample tables (≤500 rows each) from the
SQLite serving DB — never the engine — exactly like the reference's
Streamlit app reads small_tables.db (reference dashboard.py:9-24).

Two modes:
- ``streamlit run app/dashboard.py`` when streamlit is installed
  (st.metric overview, per-table data pages, CSV download);
- ``python app/dashboard.py --static out.html`` anywhere: renders the
  same content as a single static HTML file with stdlib only (this
  container has no streamlit).
"""

from __future__ import annotations

import argparse
import html
import os
import sqlite3
import sys

import pandas as pd

DEFAULT_DB = os.environ.get("EX9_SERVE_DB", "warehouse/serve.db")


def load_tables(db_path: str) -> dict[str, pd.DataFrame]:
    with sqlite3.connect(db_path) as conn:
        names = [
            r[0]
            for r in conn.execute(
                "SELECT name FROM sqlite_master WHERE type='table' ORDER BY name"
            )
        ]
        return {n: pd.read_sql(f"SELECT * FROM {n}", conn) for n in names}


def render_static(db_path: str, out_path: str) -> str:
    tables = load_tables(db_path)
    parts = [
        "<html><head><meta charset='utf-8'><title>ex9 spark dashboard</title>",
        "<style>body{font-family:sans-serif;margin:2em} table{border-collapse:collapse}",
        "td,th{border:1px solid #ccc;padding:4px 8px;font-size:12px}</style></head><body>",
        "<h1>ex9 Spark engine — sample tables</h1>",
        f"<p>{len(tables)} tables from {html.escape(db_path)}</p>",
    ]
    for name, pdf in tables.items():
        parts.append(f"<h2>{html.escape(name)} ({len(pdf)} rows)</h2>")
        parts.append(pdf.head(50).to_html(index=False))
    parts.append("</body></html>")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as fh:
        fh.write("\n".join(parts))
    return out_path


def run_streamlit(db_path: str) -> None:  # pragma: no cover - needs streamlit
    import streamlit as st

    st.set_page_config(page_title="ex9 Spark dashboard", layout="wide")
    tables = load_tables(db_path)
    page = st.sidebar.radio("Page", ["Overview", "Data Tables"])
    if page == "Overview":
        st.title("Overview")
        st.metric("Sample tables", len(tables))
        for name, pdf in tables.items():
            st.subheader(name)
            st.dataframe(pdf.head(20))
    else:
        st.title("Data Tables")
        name = st.selectbox("Table", sorted(tables))
        pdf = tables[name]
        st.dataframe(pdf)
        st.download_button(
            "Download CSV", pdf.to_csv(index=False), file_name=f"{name}.csv"
        )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--db", default=DEFAULT_DB)
    parser.add_argument("--static", metavar="OUT_HTML")
    args = parser.parse_args(argv)
    if args.static:
        print(render_static(args.db, args.static))
        return 0
    try:
        run_streamlit(args.db)
    except ImportError:
        print(
            "streamlit not installed; use --static OUT_HTML for the static render",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
