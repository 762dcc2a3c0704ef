"""URL canonicalization — the crawl-side key-normalization operator.

A crawl's first dedup key is the URL itself: the same page arrives as
``https://Host/x``, ``HTTPS://HOST:443/x?utm_source=feed`` and
``https://host/x/#frag``, and content-level dedup (MinHash, CDC spans)
should never be spent on copies a cheap key normalization removes.
The reference has no crawl stage (reference main.py ingests one CSV);
this extends the engine's crawl story (WARC source → HTML extraction →
URL dedup → content dedup) with the canonicalization every production
pipeline (CCNet, RefinedWeb) applies before fetching or deduping.

Canonical form, applied in this order:

1. strip the ``#fragment``;
2. lower-case the ``scheme://authority`` part and drop an explicit
   default port (``:80``/``:443``);
3. strip trailing ``/`` from the path;
4. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``), sort the surviving query parameters byte-wise, and
   re-join — parameter ORDER never distinguishes two URLs.

Both engines implement the same steps from the SAME regex constants
(the operators/html.py precedent): the Spark side is a chain of staged
column projections (arrays staged as real columns before the
``filter``/``array_sort`` higher-order functions — inlining a large
array expression into a lambda re-evaluates it per element and falls
out of codegen), the DuckDB side is one nested SQL expression emitted
by :func:`canonicalize_url_sql`.

Scale shape: everything here is a per-row JVM string expression —
map-side, no shuffle, no Python.  At 100 TB the canonical URL becomes
the equi-key the frontier dedups and partitions on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query parameters that never identify content (shared regex text —
#: RE2-safe: no lookaround, anchored, character classes only).
TRACKING_PARAM_RE = "^(utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid)="

#: Explicit default ports dropped from the lower-cased authority.
DEFAULT_PORT_RE = ":(80|443)$"

#: Fragment (anchored at end; at most one match in either engine).
FRAGMENT_RE = "#.*$"

#: ``scheme://authority`` prefix (group 0 match).
AUTHORITY_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"

#: Scheme prefix, for extracting the bare host from an authority.
SCHEME_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://"

#: Trailing slashes on the path.
TRAILING_SLASH_RE = "/+$"


def with_canonical_url(
    df: DataFrame, src: str = "url", dst: str = "canon"
) -> DataFrame:
    """Append column ``dst`` = canonical form of URL column ``src``.

    Staged projections (not one nested expression) so the
    ``filter``/``array_sort`` higher-order functions read a REAL
    column: Catalyst inlines a column-reference lambda argument
    cheaply, whereas a large inlined array expression is re-evaluated
    per lambda element outside whole-stage codegen.  All temporaries
    are dropped; the plan is a single map-side projection chain.
    """
    u = F.regexp_replace(F.col(src), FRAGMENT_RE, "")
    d1 = df.withColumn("_cu_nofrag", u).withColumn(
        "_cu_authraw", F.regexp_extract(F.col("_cu_nofrag"), AUTHORITY_RE, 0)
    )
    d2 = d1.withColumn(
        "_cu_auth",
        F.regexp_replace(F.lower("_cu_authraw"), DEFAULT_PORT_RE, ""),
    ).withColumn(
        "_cu_rest",
        F.expr("substr(_cu_nofrag, length(_cu_authraw) + 1)"),
    )
    d3 = d2.withColumn("_cu_qpos", F.expr("instr(_cu_rest, '?')"))
    d4 = d3.withColumn(
        "_cu_path",
        F.regexp_replace(
            F.expr(
                "CASE WHEN _cu_qpos > 0"
                " THEN substr(_cu_rest, 1, _cu_qpos - 1)"
                " ELSE _cu_rest END"
            ),
            TRAILING_SLASH_RE,
            "",
        ),
    ).withColumn(
        "_cu_q",
        F.expr(
            "CASE WHEN _cu_qpos > 0"
            " THEN substr(_cu_rest, _cu_qpos + 1) ELSE '' END"
        ),
    )
    # Stage the split array as a real column before the HOFs.
    d5 = d4.withColumn("_cu_params_raw", F.split(F.col("_cu_q"), "&"))
    d6 = d5.withColumn(
        "_cu_params",
        F.array_join(
            F.array_sort(
                F.filter(
                    F.col("_cu_params_raw"),
                    lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
                )
            ),
            "&",
        ),
    )
    out = d6.withColumn(
        dst,
        F.concat(
            F.col("_cu_auth"),
            F.col("_cu_path"),
            F.when(F.col("_cu_params") == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), F.col("_cu_params"))
            ),
        ),
    )
    return out.drop(
        "_cu_nofrag",
        "_cu_authraw",
        "_cu_auth",
        "_cu_rest",
        "_cu_qpos",
        "_cu_path",
        "_cu_q",
        "_cu_params_raw",
        "_cu_params",
    )


def host_of(url: Column) -> Column:
    """Bare host of an (already canonical, lower-case) URL."""
    return F.regexp_replace(
        F.regexp_extract(url, AUTHORITY_RE, 0), SCHEME_RE, ""
    )


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`with_canonical_url` as one nested
    expression over ``expr`` — built from the SAME regex constants so
    the two engines cannot drift step-wise."""
    nofrag = f"regexp_replace({expr}, '{FRAGMENT_RE}', '')"
    authraw = f"regexp_extract({nofrag}, '{AUTHORITY_RE}')"
    auth = f"regexp_replace(lower({authraw}), '{DEFAULT_PORT_RE}', '')"
    rest = f"substr({nofrag}, length({authraw}) + 1)"
    qpos = f"strpos({rest}, '?')"
    path_raw = (
        f"CASE WHEN {qpos} > 0 THEN substr({rest}, 1, {qpos} - 1)"
        f" ELSE {rest} END"
    )
    path = f"regexp_replace({path_raw}, '{TRAILING_SLASH_RE}', '')"
    q = f"CASE WHEN {qpos} > 0 THEN substr({rest}, {qpos} + 1) ELSE '' END"
    # COALESCE: DuckDB array_to_string([]) is NULL, Spark array_join
    # of an empty array is '' — pin the Spark semantics.
    params = (
        "COALESCE(array_to_string(list_sort(list_filter("
        f"string_split({q}, '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}')"
        ")), '&'), '')"
    )
    return (
        f"({auth} || {path} || "
        f"CASE WHEN {params} = '' THEN '' ELSE '?' || {params} END)"
    )


def host_of_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`host_of`."""
    return (
        f"regexp_replace(regexp_extract({expr}, '{AUTHORITY_RE}'), "
        f"'{SCHEME_RE}', '')"
    )


#: Path component of an (already canonical) URL: group 1 = everything
#: between the authority and the first ``?``/``#``.
PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"


def path_of(url: Column) -> Column:
    """Path component of an (already canonical) URL."""
    return F.regexp_extract(url, PATH_RE, 1)


def path_of_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`path_of`."""
    return f"regexp_extract({expr}, '{PATH_RE}', 1)"
