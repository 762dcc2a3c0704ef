"""Round-13 crawl-frontier tranche — the curation stages BETWEEN the
WARC container source (queries_platform7) and the content-dedup tiers,
i.e. what a 100 TB crawl pipeline runs before it ever hashes document
text (the CCNet/RefinedWeb front half):

- **URL canonicalization + URL-level dedup** (`url_canonical_dedup`) —
  normalize scheme/host case, default ports, trailing slashes,
  fragments and tracking parameters, then dedup on the canonical key.
  The cheapest dedup in the pipeline: pure map-side string
  expressions feeding ONE equi-key exchange, removing fetch/work
  BEFORE MinHash or CDC spans ever run.
- **robots longest-prefix gate** (`robots_rules_gate`) — the
  politeness filter: every URL path resolves to the LONGEST matching
  rule prefix (robots.txt semantics), via a distinct-path relation
  joined against a broadcast rule table (bounded non-equi join — the
  weighted_quantiles BroadcastNestedLoopJoin precedent), never a
  row-level scan × rules shuffle.
- **host-level link graph** (`link_graph_hosts`) — extract
  ``<a href>`` targets from synthesized pages, resolve relative links
  against the page's own host, canonicalize every target with the
  SAME operator the dedup uses, and aggregate the (src_host,
  dst_host) edge list — the frontier-expansion stage that feeds
  PageRank-style host scoring.

All three register with STAGED oracles (the 200-row driver capacity
is permanently full; tests/test_staged_oracles.py runs the full
differential at every pytest).  Both engines share the URL-synthesis
SQL fragments verbatim (Spark evaluates them via ``F.expr`` — the
fragments restrict themselves to the common dialect: ``||``, ``%``,
``CASE``, ``CAST(… AS STRING)``) and the canonicalization derives
from one set of regex constants (operators/urls.py), so the
differential pins canonical STRINGS byte-for-byte via md5-prefix
fingerprint sums, not just counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import local_df, query_persist, table
from ..operators.urls import (
    canonicalize_url_sql,
    host_of,
    host_of_sql,
    path_of,
    path_of_sql,
    with_canonical_url,
)
from .registry import register

# ---------------------------------------------------------------------------
# Shared synthesis fragments (common Spark/DuckDB dialect, evaluated by
# BOTH engines — the strongest form of the _PAGE_SQL sharing precedent).
# ---------------------------------------------------------------------------

#: Four messy spellings of the same logical page: every doc_id block of
#: four yields one canonical URL (page = doc_id - doc_id % 4, host from
#: page % 3).  Variant 1 upper-cases scheme+host and adds the default
#: port and a fragment; variant 2 injects utm_* params; variant 3 adds
#: a trailing slash and a per-doc fbclid; param order differs in all.
_MESSY_URL_SQL = """CASE doc_id % 4
 WHEN 0 THEN 'https://www.example' || CAST((doc_id - doc_id % 4) % 3 AS STRING)
      || '.com/articles/' || CAST(doc_id - doc_id % 4 AS STRING) || '?a=1&b=2'
 WHEN 1 THEN 'HTTPS://WWW.EXAMPLE' || CAST((doc_id - doc_id % 4) % 3 AS STRING)
      || '.COM:443/articles/' || CAST(doc_id - doc_id % 4 AS STRING)
      || '?b=2&a=1#section-3'
 WHEN 2 THEN 'https://www.example' || CAST((doc_id - doc_id % 4) % 3 AS STRING)
      || '.com/articles/' || CAST(doc_id - doc_id % 4 AS STRING)
      || '?utm_source=feed&a=1&utm_campaign=w' || CAST(doc_id AS STRING)
      || '&b=2'
 ELSE 'https://www.example' || CAST((doc_id - doc_id % 4) % 3 AS STRING)
      || '.com:443/articles/' || CAST(doc_id - doc_id % 4 AS STRING)
      || '/?fbclid=F' || CAST(doc_id AS STRING) || '&b=2&a=1'
END"""

#: Crawl-shaped URL path per document (five top-level sections, 97
#: leaf pages — repeats by construction, the way a real frontier does).
_CRAWL_PATH_SQL = (
    "'/' || CASE doc_id % 5 WHEN 0 THEN 'articles' WHEN 1 THEN 'private'"
    " WHEN 2 THEN 'tmp' WHEN 3 THEN 'archive' ELSE 'search' END"
    " || '/' || CAST(doc_id % 97 AS STRING)"
)

#: robots.txt-shaped ruleset: longest matching prefix wins; note the
#: specific re-allow under /private and re-disallow under /archive —
#: the cases a naive "any disallow matches" filter gets wrong.
ROBOTS_RULES: tuple[tuple[str, bool], ...] = (
    ("/", True),
    ("/articles", True),
    ("/private", False),
    ("/private/7", True),
    ("/tmp", False),
    ("/archive", True),
    ("/archive/1", False),
    ("/search", False),
)

#: Minimal page body with three outlinks: a RELATIVE link (must
#: resolve against the page's own host), an absolute link with messy
#: case/port/tracking params (must canonicalize), and an off-site
#: asset link (different host).  Quotes: href values use double
#: quotes so the fragment embeds in single-quoted SQL strings.
_LINKS_HTML_SQL = """'<html><body><p>' || text || '</p>
<a href="/articles/' || CAST((doc_id * 7 + 13) % 1000 AS STRING) || '">rel</a>
<a href="https://WWW.Example' || CAST((doc_id * 11 + 5) % 3 AS STRING)
 || '.COM:443/articles/' || CAST((doc_id * 11 + 5) % 1000 AS STRING)
 || '?utm_source=feed&ref=' || CAST(doc_id % 7 AS STRING) || '">abs</a>
<a href="https://cdn.assets-example.net/img/' || CAST(doc_id % 50 AS STRING)
 || '.png">img</a>
</body></html>'"""

#: The page's own base URL (for resolving relative hrefs) — host
#: matches variant-0 of _MESSY_URL_SQL's host scheme.
_BASE_URL_SQL = "'https://www.example' || CAST(doc_id % 3 AS STRING) || '.com'"

_HREF_RE = 'href="([^"]*)"'

#: md5-prefix fingerprint (the registry-wide exact-string pin; DuckDB
#: hex-parse twin of Spark's conv(substring(md5(x),1,8),16,10)).
_FP_SQL = "CAST(('0x' || substring(md5({0}), 1, 8)) AS BIGINT)"


def _fp(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# ---------------------------------------------------------------------------
# url_canonical_dedup
# ---------------------------------------------------------------------------


@register(
    "url_canonical_dedup",
    staged_oracle=f"""
    WITH raw AS (
        SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents
    ), canon AS (
        SELECT doc_id, {canonicalize_url_sql('url')} AS canon FROM raw
    ), hosts AS (
        SELECT doc_id, canon, {host_of_sql('canon')} AS host FROM canon
    ), groups AS (
        SELECT host, canon, COUNT(*) AS n, MIN(doc_id) AS keeper
        FROM hosts GROUP BY host, canon
    )
    SELECT host,
           CAST(SUM(n) AS BIGINT) AS n_urls,
           CAST(COUNT(*) AS BIGINT) AS n_canonical,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dupes,
           CAST(SUM(keeper) AS BIGINT) AS keeper_id_sum,
           CAST(SUM({_FP_SQL.format('canon')}) AS BIGINT) AS canon_fp_sum
    FROM groups GROUP BY host ORDER BY host
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup on the canonical key: four messy spellings of
    each logical page (case, default port, fragment, tracking params,
    trailing slash, param order) collapse to ONE canonical URL; the
    keeper is the min doc_id per canonical group (the exact-dedup
    keep-rule).  Per-host rollup pins group counts, keeper identity
    and an order-insensitive md5-prefix fingerprint SUM of the
    canonical strings — the differential proves canonicalization
    byte-for-byte, not just group cardinality.

    Scale shape: canonicalization is a map-side projection chain
    (operators/urls.py); the only data-grain exchange keys on the
    canonical URL (the frontier's natural partitioning key at 100 TB);
    the host rollup exchanges per-host partials."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_MESSY_URL_SQL).alias("url")
    )
    canon = with_canonical_url(docs, "url", "canon").select(
        "doc_id", "canon", host_of(F.col("canon")).alias("host")
    )
    groups = canon.groupBy("host", "canon").agg(
        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keeper")
    )
    return (
        groups.groupBy("host")
        .agg(
            F.sum("n").cast("long").alias("n_urls"),
            F.count(F.lit(1)).cast("long").alias("n_canonical"),
            (F.sum("n") - F.count(F.lit(1)))
            .cast("long")
            .alias("n_dupes"),
            F.sum("keeper").cast("long").alias("keeper_id_sum"),
            F.sum(_fp(F.col("canon"))).cast("long").alias("canon_fp_sum"),
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# robots_rules_gate
# ---------------------------------------------------------------------------


def _robots_rules_values() -> str:
    rows = ", ".join(
        f"('{p}', {'TRUE' if a else 'FALSE'})" for p, a in ROBOTS_RULES
    )
    return f"(VALUES {rows}) AS r(prefix, allow)"


@register(
    "robots_rules_gate",
    staged_oracle=f"""
    WITH paths AS (
        SELECT DISTINCT {_CRAWL_PATH_SQL} AS path FROM documents
    ), docs AS (
        SELECT doc_id, {_CRAWL_PATH_SQL} AS path FROM documents
    ), matched AS (
        SELECT p.path, r.prefix, r.allow
        FROM paths p JOIN {_robots_rules_values()}
          ON starts_with(p.path, r.prefix)
    ), winners AS (
        SELECT path,
               arg_max(prefix, length(prefix)) AS prefix,
               arg_max(allow, length(prefix)) AS allow
        FROM matched GROUP BY path
    ), per_rule AS (
        SELECT w.prefix, w.allow,
               CAST(COUNT(*) AS BIGINT) AS n_paths,
               CAST(SUM({_FP_SQL.format('w.path')}) AS BIGINT) AS path_fp_sum
        FROM winners w GROUP BY w.prefix, w.allow
    ), doc_counts AS (
        SELECT w.prefix, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM docs d JOIN winners w USING (path) GROUP BY w.prefix
    )
    SELECT p.prefix AS rule_prefix, p.allow, p.n_paths, c.n_docs,
           p.path_fp_sum
    FROM per_rule p JOIN doc_counts c USING (prefix)
    ORDER BY rule_prefix
    """,
)
def robots_rules_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl politeness gate with real robots.txt semantics: the
    LONGEST matching rule prefix decides, so ``/private/7`` re-allows
    under a disallowed ``/private`` and ``/archive/1`` re-disallows
    under an allowed ``/archive`` — the cases an any-disallow filter
    gets wrong.  Per-rule rollup pins which rule WON each distinct
    path (count + md5-prefix fingerprint sum) and how many documents
    that rule gates.

    Scale shape: paths dedupe first (one equi-key exchange at frontier
    grain), the rule match is a BroadcastNestedLoopJoin against the
    8-row rule table (the weighted_quantiles bounded-broadcast
    precedent — never a shuffled cartesian), the winner is one
    ``max_by`` aggregate per path, and the document rollup re-joins
    the bounded winner relation by broadcast.  Ties are impossible by
    construction: two same-length distinct prefixes cannot both
    prefix one path."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_CRAWL_PATH_SQL).alias("path")
    )
    rules = F.broadcast(
        local_df(spark, list(ROBOTS_RULES), "prefix string, allow boolean")
    )
    paths = docs.select("path").distinct()
    matched = paths.join(
        rules, F.expr("startswith(path, prefix)"), "inner"
    )
    winners = matched.groupBy("path").agg(
        F.max_by("prefix", F.length("prefix")).alias("prefix"),
        F.max_by("allow", F.length("prefix")).alias("allow"),
    )
    per_rule = winners.groupBy("prefix", "allow").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths"),
        F.sum(_fp(F.col("path"))).cast("long").alias("path_fp_sum"),
    )
    doc_counts = (
        docs.join(F.broadcast(winners.select("path", "prefix")), "path")
        .groupBy("prefix")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    return (
        per_rule.join(doc_counts, "prefix")
        .select(
            F.col("prefix").alias("rule_prefix"),
            "allow",
            "n_paths",
            "n_docs",
            "path_fp_sum",
        )
        .orderBy("rule_prefix")
    )


# ---------------------------------------------------------------------------
# link_graph_hosts
# ---------------------------------------------------------------------------


@register(
    "link_graph_hosts",
    staged_oracle=f"""
    WITH pages AS (
        SELECT doc_id,
               'www.example' || CAST(doc_id % 3 AS STRING) || '.com'
                   AS src_host,
               {_BASE_URL_SQL} AS base,
               {_LINKS_HTML_SQL} AS html
        FROM documents
    ), links AS (
        SELECT doc_id, src_host, base,
               unnest(regexp_extract_all(html, '{_HREF_RE}', 1)) AS href
        FROM pages
    ), resolved AS (
        SELECT doc_id, src_host,
               CASE WHEN href LIKE '/%' THEN base || href
                    WHEN lower(href) LIKE 'http%' THEN href END AS abs_url
        FROM links
    ), canon AS (
        SELECT doc_id, src_host,
               {canonicalize_url_sql('abs_url')} AS target
        FROM resolved WHERE abs_url IS NOT NULL
    )
    SELECT src_host, {host_of_sql('target')} AS dst_host,
           CAST(COUNT(*) AS BIGINT) AS n_links,
           CAST(COUNT(DISTINCT target) AS BIGINT) AS n_targets,
           CAST(SUM({_FP_SQL.format('target')}) AS BIGINT) AS target_fp_sum
    FROM canon GROUP BY src_host, dst_host ORDER BY src_host, dst_host
    """,
)
def link_graph_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier expansion: extract every ``<a href>`` from synthesized
    pages (one relative link, one messy absolute link, one off-site
    asset per page), resolve relative targets against the page's own
    host, canonicalize each target with the SAME operator
    url_canonical_dedup keys on, and aggregate the host-level link
    graph — edge counts, distinct canonical targets, and the
    fingerprint sum that pins resolution+canonicalization
    byte-for-byte.

    Scale shape: extraction (regexp_extract_all + explode),
    resolution and canonicalization are all map-side; the single
    data-grain exchange carries (src_host, dst_host) partial
    aggregates (count-distinct runs the standard two-phase partial
    over the target key).  At 100 TB this edge list is what feeds
    host-score iteration (the pagerank_part_cooccurrence loop)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.concat(
            F.lit("www.example"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".com"),
        ).alias("src_host"),
        F.expr(_BASE_URL_SQL).alias("base"),
        F.expr(_LINKS_HTML_SQL).alias("html"),
    )
    links = docs.select(
        "doc_id",
        "src_host",
        "base",
        F.explode(
            F.regexp_extract_all(F.col("html"), F.lit(_HREF_RE), 1)
        ).alias("href"),
    )
    resolved = links.select(
        "doc_id",
        "src_host",
        F.when(
            F.col("href").startswith("/"),
            F.concat(F.col("base"), F.col("href")),
        )
        .when(F.lower("href").startswith("http"), F.col("href"))
        .alias("abs_url"),
    ).filter(F.col("abs_url").isNotNull())
    canon = with_canonical_url(resolved, "abs_url", "target").select(
        "src_host", "target"
    )
    return (
        canon.groupBy(
            "src_host", host_of(F.col("target")).alias("dst_host")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_links"),
            F.countDistinct("target").cast("long").alias("n_targets"),
            F.sum(_fp(F.col("target"))).cast("long").alias("target_fp_sum"),
        )
        .orderBy("src_host", "dst_host")
    )


# ---------------------------------------------------------------------------
# crawl_front_funnel — the composed crawl front half
# ---------------------------------------------------------------------------

#: Crawl-section path shared by all four messy variants of a page:
#: section and leaf derive from the PAGE id (doc_id - doc_id % 4) so a
#: variant block shares one path (page % 5 cycles 0,4,3,2,1 as pages
#: step by 4 — all five sections occur).
_FUNNEL_PATH_SQL = (
    "'/' || CASE (doc_id - doc_id % 4) % 5 WHEN 0 THEN 'articles'"
    " WHEN 1 THEN 'private' WHEN 2 THEN 'tmp' WHEN 3 THEN 'archive'"
    " ELSE 'search' END"
    " || '/' || CAST((doc_id - doc_id % 4) % 97 AS STRING)"
)

#: Messy URL over that path (same four decorations as _MESSY_URL_SQL;
#: variant 1 upper-cases only the AUTHORITY — paths are case-sensitive).
_FUNNEL_URL_SQL = f"""CASE doc_id % 4
 WHEN 0 THEN 'https://www.site' || CAST((doc_id - doc_id % 4) % 3 AS STRING)
      || '.example.com' || {_FUNNEL_PATH_SQL} || '?a=1&b=2'
 WHEN 1 THEN 'HTTPS://WWW.SITE' || CAST((doc_id - doc_id % 4) % 3 AS STRING)
      || '.EXAMPLE.COM:443' || {_FUNNEL_PATH_SQL} || '?b=2&a=1#top'
 WHEN 2 THEN 'https://www.site' || CAST((doc_id - doc_id % 4) % 3 AS STRING)
      || '.example.com' || {_FUNNEL_PATH_SQL}
      || '?utm_source=feed&a=1&b=2'
 ELSE 'https://www.site' || CAST((doc_id - doc_id % 4) % 3 AS STRING)
      || '.example.com:443' || {_FUNNEL_PATH_SQL} || '/?fbclid=F'
      || CAST(doc_id AS STRING) || '&b=2&a=1'
END"""


def _crawl_funnel_oracle() -> str:
    from ..operators.html import extract_text_sql
    from .queries_platform6 import _PAGE_SQL

    return f"""
    WITH raw AS (
        SELECT doc_id, n_chars, text, {_FUNNEL_URL_SQL} AS url
        FROM documents
    ), canon AS (
        SELECT doc_id, n_chars, text,
               {canonicalize_url_sql('url')} AS canon
        FROM raw
    ), kept AS (
        SELECT doc_id, n_chars, text, canon FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY canon
                                         ORDER BY doc_id) AS rn
            FROM canon) WHERE rn = 1
    ), pathed AS (
        SELECT *, {path_of_sql('canon')} AS path FROM kept
    ), gate AS (
        SELECT p.doc_id, arg_max(r.allow, length(r.prefix)) AS allow
        FROM pathed p JOIN {_robots_rules_values()}
          ON starts_with(p.path, r.prefix)
        GROUP BY p.doc_id
    ), allowed AS (
        SELECT k.doc_id, k.n_chars, k.text
        FROM pathed k JOIN gate g USING (doc_id) WHERE g.allow
    ), pages AS (
        SELECT doc_id, n_chars, {_PAGE_SQL} AS html FROM allowed
    ), ex AS (
        SELECT doc_id, n_chars, {extract_text_sql('html')} AS ext
        FROM pages
    ), q AS (
        SELECT * FROM ex WHERE length(ext) >= 100
    )
    SELECT * FROM (
        SELECT '0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(n_chars) AS BIGINT) AS measure FROM documents
        UNION ALL SELECT '1_url_dedup', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(n_chars) AS BIGINT) FROM kept
        UNION ALL SELECT '2_robots', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(n_chars) AS BIGINT) FROM allowed
        UNION ALL SELECT '3_extract', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(length(ext)) AS BIGINT) FROM ex
        UNION ALL SELECT '4_quality', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(length(ext)) AS BIGINT) FROM q
    ) ORDER BY stage
    """


@register("crawl_front_funnel", staged_oracle=_crawl_funnel_oracle())
def crawl_front_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed crawl FRONT half in one registered query — the
    stages a 100 TB pipeline runs before any content hashing:
    messy-URL ingest → canonicalization + URL-level dedup (keep min
    doc_id per canonical key) → robots longest-prefix gate → HTML
    extraction → quality gate (≥100 extracted chars).  Emits one
    (stage, n_rows, measure) row per stage, the llm_pipeline_e2e
    funnel contract, so the two composites meet at the extraction
    boundary and together cover crawl container → training batches.

    Every stage is the registered standalone operator applied in
    sequence and the staged oracle is the chained CTE of the
    standalone oracle texts (shared fragments: the messy-URL/path
    synthesis, canonicalize_url_sql, ROBOTS_RULES, _PAGE_SQL,
    extract_text_sql) — the differential proves the crawl operators
    COMPOSE.

    Scale shape: canonicalization/extraction/gating are map-side; the
    URL dedup is ONE window at canonical-key grain (the frontier's
    partitioning key); the robots match joins the bounded DISTINCT
    path relation against the broadcast rule table and re-joins by
    broadcast.  The post-gate relation is persisted once and fans out
    to the stage rollups."""
    from pyspark.sql.window import Window

    from ..operators.html import extract_text
    from .queries_platform6 import synthesize_page

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.expr(_FUNNEL_URL_SQL).alias("url"),
    )
    canon = with_canonical_url(docs, "url", "canon")
    wn = Window.partitionBy("canon").orderBy("doc_id")
    kept = (
        canon.withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "n_chars",
            "text",
            path_of(F.col("canon")).alias("path"),
        )
    )
    kept = query_persist(kept)
    rules = F.broadcast(
        local_df(spark, list(ROBOTS_RULES), "prefix string, allow boolean")
    )
    winners = (
        kept.select("path")
        .distinct()
        .join(rules, F.expr("startswith(path, prefix)"))
        .groupBy("path")
        .agg(F.max_by("allow", F.length("prefix")).alias("allow"))
    )
    allowed = (
        kept.join(F.broadcast(winners), "path")
        .filter(F.col("allow"))
        .select("doc_id", "n_chars", "text")
    )
    ex = allowed.select(
        "doc_id",
        "n_chars",
        extract_text(synthesize_page(F.col("doc_id"), F.col("text"))).alias(
            "ext"
        ),
    )
    ex = query_persist(ex)

    def one(df: DataFrame, name: str, measure: F.Column) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"), F.sum(measure).alias("m")
        ).select(
            F.lit(name).alias("stage"),
            F.col("n").cast("long").alias("n_rows"),
            F.col("m").cast("long").alias("measure"),
        )

    raw = table(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("long").alias("n_chars")
    )
    return (
        one(raw, "0_raw", F.col("n_chars"))
        .unionAll(one(kept, "1_url_dedup", F.col("n_chars")))
        .unionAll(one(ex, "2_robots", F.col("n_chars")))
        .unionAll(one(ex, "3_extract", F.length("ext").cast("long")))
        .unionAll(
            one(
                ex.filter(F.length("ext") >= 100),
                "4_quality",
                F.length("ext").cast("long"),
            )
        )
        .orderBy("stage")
    )
