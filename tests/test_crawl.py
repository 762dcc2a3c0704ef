"""Crawl-frontier tranche (plans/queries_crawl.py + operators/urls.py):
semantics and plan pins for URL canonicalization, the robots
longest-prefix gate, and host-level link-graph extraction.

The staged-oracle differential (tests/test_staged_oracles.py) already
proves Spark ≡ DuckDB on the registered rollups; these tests pin the
SEMANTICS against hand-built expectations and a pure-Python reference
— the two engines agreeing on the wrong answer would pass the
differential, not these.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ex9_big_data_gal_drimer_spark.operators.urls import (
    TRACKING_PARAM_RE,
    canonicalize_url_sql,
    host_of,
    with_canonical_url,
)
from ex9_big_data_gal_drimer_spark.plans import QUERIES
from ex9_big_data_gal_drimer_spark.plans.audit import has_cartesian
from ex9_big_data_gal_drimer_spark.plans.queries_crawl import ROBOTS_RULES

from conftest import SF_DIR


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], schema="url string")
    rows = with_canonical_url(df, "url", "canon").select("url", "canon")
    return {r["url"]: r["canon"] for r in rows.collect()}


# Hand-built expectations: each (messy, canonical) pair exercises one
# normalization rule in isolation plus combined forms.
CANON_CASES = [
    # case + default port
    ("HTTPS://WWW.Example.COM:443/a", "https://www.example.com/a"),
    ("http://Host.net:80/x", "http://host.net/x"),
    # NON-default port survives
    ("http://host.net:8080/x", "http://host.net:8080/x"),
    # fragment stripped
    ("https://h.com/p#frag", "https://h.com/p"),
    ("https://h.com/p?a=1#frag", "https://h.com/p?a=1"),
    # trailing slash(es) stripped
    ("https://h.com/p/", "https://h.com/p"),
    ("https://h.com/p//", "https://h.com/p"),
    # params sorted, tracking dropped, empties dropped
    ("https://h.com/p?b=2&a=1", "https://h.com/p?a=1&b=2"),
    (
        "https://h.com/p?utm_source=x&b=2&fbclid=F1&a=1&gclid=g&msclkid=m",
        "https://h.com/p?a=1&b=2",
    ),
    ("https://h.com/p?utm_campaign=only", "https://h.com/p"),
    ("https://h.com/p?&&a=1&", "https://h.com/p?a=1"),
    # utm must match as a PREFIXED key, not anywhere in the pair
    ("https://h.com/p?xutm_source=keep", "https://h.com/p?xutm_source=keep"),
    ("https://h.com/p?a=utm_source", "https://h.com/p?a=utm_source"),
    # authority-only URL
    ("https://h.com", "https://h.com"),
    # everything at once
    (
        "HTTPS://H.COM:443/p/?fbclid=F&b=2&a=1#sec",
        "https://h.com/p?a=1&b=2",
    ),
]


def test_canonicalize_cases(spark):
    got = _canon(spark, [m for m, _ in CANON_CASES])
    for messy, want in CANON_CASES:
        assert got[messy] == want, f"{messy!r}: {got[messy]!r} != {want!r}"


def test_canonicalize_idempotent(spark):
    """canon(canon(u)) == canon(u) — canonical forms are fixpoints."""
    first = _canon(spark, [m for m, _ in CANON_CASES])
    again = _canon(spark, sorted(set(first.values())))
    for c in again:
        assert again[c] == c, f"not a fixpoint: {c!r} -> {again[c]!r}"


def test_canonicalize_sql_twin_matches(duck):
    """The DuckDB expression built from the same constants agrees on
    every hand-built case (the per-engine builders, not just the
    registered rollups, are differentially pinned)."""
    sql = canonicalize_url_sql("u")
    for messy, want in CANON_CASES:
        got = duck.execute(
            f"SELECT {sql} FROM (SELECT ? AS u)", [messy]
        ).fetchone()[0]
        assert got == want, f"{messy!r}: {got!r} != {want!r}"


def test_host_of(spark):
    df = spark.createDataFrame(
        [("https://www.example2.com/articles/4?a=1",), ("http://h.net",)],
        schema="u string",
    )
    hosts = [r[0] for r in df.select(host_of(F.col("u"))).collect()]
    assert hosts == ["www.example2.com", "h.net"]


# ---------------------------------------------------------------------------
# robots longest-prefix gate vs a pure-Python reference
# ---------------------------------------------------------------------------


def _py_robots(path: str) -> tuple[str, bool]:
    best = max(
        (p for p, _ in ROBOTS_RULES if path.startswith(p)), key=len
    )
    return best, dict(ROBOTS_RULES)[best]


def test_robots_reference_agreement(spark):
    paths = [
        "/articles/5",
        "/private/5",
        "/private/7",
        "/private/77",  # prefix-matches the /private/7 re-allow
        "/tmp/1",
        "/archive/5",
        "/archive/1",
        "/archive/19",  # prefix-matches the /archive/1 re-disallow
        "/search/3",
        "/",
        "/unlisted/9",
    ]
    df = spark.createDataFrame([(p,) for p in paths], schema="path string")
    rules = F.broadcast(
        spark.createDataFrame(
            list(ROBOTS_RULES), schema="prefix string, allow boolean"
        )
    )
    win = (
        df.join(rules, F.expr("startswith(path, prefix)"))
        .groupBy("path")
        .agg(
            F.max_by("prefix", F.length("prefix")).alias("prefix"),
            F.max_by("allow", F.length("prefix")).alias("allow"),
        )
    )
    got = {r["path"]: (r["prefix"], r["allow"]) for r in win.collect()}
    for p in paths:
        assert got[p] == _py_robots(p), f"{p}: {got[p]} != {_py_robots(p)}"


def test_robots_reallow_and_redisallow_fire(spark):
    """The cases an any-disallow filter gets wrong are present in the
    registered query's output: /private/7* wins with allow=True and
    /archive/1* wins with allow=False."""
    rows = {
        r["rule_prefix"]: r
        for r in QUERIES["robots_rules_gate"](spark, SF_DIR).collect()
    }
    assert rows["/private/7"]["allow"] is True
    assert rows["/private/7"]["n_paths"] > 0
    assert rows["/archive/1"]["allow"] is False
    assert rows["/archive/1"]["n_paths"] > 0
    # each path's docs are counted exactly once across rules
    total_docs = sum(r["n_docs"] for r in rows.values())
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert total_docs == n_docs


# ---------------------------------------------------------------------------
# link graph
# ---------------------------------------------------------------------------


def test_link_graph_resolution_and_hosts(spark):
    out = QUERIES["link_graph_hosts"](spark, SF_DIR).collect()
    by_edge = {(r["src_host"], r["dst_host"]): r for r in out}
    hosts = {f"www.example{i}.com" for i in range(3)}
    # every src is a page host; dst is a page host or the cdn
    assert {s for s, _ in by_edge} <= hosts
    assert {d for _, d in by_edge} <= hosts | {"cdn.assets-example.net"}
    # relative links resolve to the page's OWN host: every src host has
    # a self-edge (doc_id%3 drives both), and cdn edges carry no params
    for h in {s for s, _ in by_edge}:
        assert (h, h) in by_edge, f"relative links must land on {h}"
    # no tracking params survive: distinct targets per edge are bounded
    # by the 1000-page key space (utm_campaign=w<doc_id> would explode)
    for r in out:
        assert r["n_targets"] <= 1000, "tracking params leaked into targets"
        assert r["n_links"] >= r["n_targets"]


def test_link_graph_total_links(spark):
    """Exactly three extracted+resolved links per document."""
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    out = QUERIES["link_graph_hosts"](spark, SF_DIR).collect()
    assert sum(r["n_links"] for r in out) == 3 * n_docs


# ---------------------------------------------------------------------------
# url dedup invariants + plan shape
# ---------------------------------------------------------------------------


def test_url_dedup_collapses_variant_blocks(spark):
    out = QUERIES["url_canonical_dedup"](spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r["n_urls"] for r in out) == n_docs
    # four messy variants per page: ~4x collapse (the tail block of a
    # corpus whose size isn't a multiple of 4 can be smaller)
    total_canon = sum(r["n_canonical"] for r in out)
    assert total_canon <= n_docs // 4 + 1
    assert all(r["n_dupes"] == r["n_urls"] - r["n_canonical"] for r in out)


def test_crawl_queries_plan_shape(spark):
    for name in ("url_canonical_dedup", "link_graph_hosts"):
        df = QUERIES[name](spark, SF_DIR)
        assert not has_cartesian(df), name
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} must stay pure map+aggregate"
        )
    gate = QUERIES["robots_rules_gate"](spark, SF_DIR)
    plan = gate._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, (
        "rule match must broadcast the bounded rule table"
    )
    assert "CartesianProduct" not in plan


def test_tracking_param_re_is_anchored():
    """The regex drops whole key=... params only when the KEY matches."""
    rx = re.compile(TRACKING_PARAM_RE)
    assert rx.search("utm_source=x")
    assert rx.search("fbclid=1")
    assert not rx.search("xutm_source=x")
    assert not rx.search("a=utm_source")
    assert not rx.search("utm_source")  # bare key without '=' survives


def test_crawl_front_funnel_invariants(spark):
    rows = {
        r["stage"]: r
        for r in QUERIES["crawl_front_funnel"](spark, SF_DIR).collect()
    }
    assert set(rows) == {
        "0_raw", "1_url_dedup", "2_robots", "3_extract", "4_quality"
    }
    # monotone survivor counts through the drop stages
    assert (
        rows["0_raw"]["n_rows"]
        >= rows["1_url_dedup"]["n_rows"]
        >= rows["2_robots"]["n_rows"]
        >= rows["4_quality"]["n_rows"]
    )
    # extraction rewrites text, drops nothing
    assert rows["3_extract"]["n_rows"] == rows["2_robots"]["n_rows"]
    # the four messy variants of each page collapse to one URL
    assert rows["1_url_dedup"]["n_rows"] <= rows["0_raw"]["n_rows"] // 4 + 1
    # robots drops something on this ruleset (3 of 5 sections gated)
    assert rows["2_robots"]["n_rows"] < rows["1_url_dedup"]["n_rows"]
    # quality chars are a subset of extracted chars
    assert rows["4_quality"]["measure"] <= rows["3_extract"]["measure"]
