"""Data-platform operators (round 6): storage-layout optimization
(Z-order clustering audit), snapshot CDC diff, ordered-sequence regex
cohorts, and ordered list aggregation.

These are the table-maintenance / change-management shapes a 100 TB
lakehouse runs nightly: OPTIMIZE ZORDER-style multi-dimensional
clustering with measured file-skipping effectiveness, snapshot-to-
snapshot change classification, and MATCH_RECOGNIZE-ish per-entity
sequence classification — all expressed as declarative DataFrame
plans with exact DuckDB oracles.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import register

_Z_BITS = 6  # 6 bits per dimension -> 12-bit z-values


def _bit(col: F.Column, i: int) -> F.Column:
    """i-th bit as 0/1 via pure integer arithmetic (portable to the
    DuckDB oracle verbatim — no engine-specific shift operators)."""
    return (col / F.lit(2**i)).cast("long") % 2


def _zvalue(a: F.Column, b: F.Column) -> F.Column:
    """Interleave the low _Z_BITS of two columns (Morton/Z-order):
    bit i of `a` lands at position 2i+1, bit i of `b` at 2i."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(_bit(a, i) * F.lit(2 ** (2 * i + 1)))
        terms.append(_bit(b, i) * F.lit(2 ** (2 * i)))
    return reduce(lambda x, y: x + y, terms)


def _zvalue_sql(a: str, b: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(({a} // {2**i}) % 2) * {2 ** (2 * i + 1)}")
        terms.append(f"(({b} // {2**i}) % 2) * {2 ** (2 * i)}")
    return " + ".join(terms)


_PROBES = [50 * i for i in range(1, 21)]  # custkey probes, present at all SFs


@register(
    "zorder_layout_audit",
    oracle=f"""
    WITH keyed AS (
        SELECT o_custkey,
               CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d,
               o_custkey % {2**_Z_BITS} AS cb,
               (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                   % {2**_Z_BITS} AS db
        FROM orders
    ), tagged AS (
        SELECT o_custkey, d,
               {_zvalue_sql('cb', 'db')} AS z
        FROM keyed
    ), files AS (
        SELECT 'date_sort' AS layout, d // 32 AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
               MIN(d) AS min_d, MAX(d) AS max_d
        FROM tagged GROUP BY d // 32
        UNION ALL
        SELECT 'zorder' AS layout, z // 64 AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(o_custkey) AS min_ck, MAX(o_custkey) AS max_ck,
               MIN(d) AS min_d, MAX(d) AS max_d
        FROM tagged GROUP BY z // 64
    ), probes AS (
        SELECT UNNEST({_PROBES!r}) AS probe_ck
    ), hits AS (
        SELECT f.layout, p.probe_ck,
               SUM(CASE WHEN p.probe_ck BETWEEN f.min_ck AND f.max_ck
                        THEN 1 ELSE 0 END) AS files_hit
        FROM files f CROSS JOIN probes p
        GROUP BY f.layout, p.probe_ck
    )
    SELECT f.layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           ROUND(AVG(max_ck - min_ck), 4) AS avg_ck_span,
           ROUND(AVG(max_d - min_d), 4) AS avg_day_span,
           ROUND((SELECT AVG(files_hit) FROM hits h
                  WHERE h.layout = f.layout), 4) AS avg_files_hit
    FROM files f
    GROUP BY f.layout
    ORDER BY f.layout
    """,
)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-layout optimization audit — the OPTIMIZE ZORDER
    question: does Morton-interleaving (o_custkey, order-day) cluster
    BOTH dimensions well enough that min/max file pruning beats a
    single-column sort?  Rows are bucketed into "files" by value
    range under two layouts (date-sorted vs z-ordered — value-range
    bucketing is exactly what `repartitionByRange` does on the write
    path, so the audit needs no global row_number), each file keeps
    min/max zone-map stats per dimension, and 20 fixed customer-key
    probes count how many files a point lookup must read under each
    layout.  Everything is exact integer arithmetic — the z-value is
    pure add/divide/modulo, portable verbatim to the oracle.

    Scale: two hash aggregations over the fact (one per layout) plus
    a broadcast cross join of ~O(100) file-stat rows × 20 probes —
    no window over raw rows, no sort; at 100 TB the same plan audits
    a real table's add-file stats instead of synthesizing them.
    Complements the actual Z-order WRITE path
    (sources/layout.py::ingest_zordered + `zorder_layout_skip`, which
    pin parquet row-group pruning on the clustered layout): this
    audit quantifies the files-hit ratio the two layouts imply,
    engine-exactly, without writing files."""
    o = table(spark, sf_dir, "orders")
    d = F.unix_date(F.col("o_orderdate").cast("date"))
    tagged = o.select(
        F.col("o_custkey"),
        d.alias("d"),
        _zvalue(F.col("o_custkey") % (2**_Z_BITS), d % (2**_Z_BITS)).alias("z"),
    )

    def files(layout: str, bucket: F.Column) -> DataFrame:
        return (
            tagged.groupBy(bucket.alias("file_id"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("o_custkey").alias("min_ck"),
                F.max("o_custkey").alias("max_ck"),
                F.min("d").alias("min_d"),
                F.max("d").alias("max_d"),
            )
            .withColumn("layout", F.lit(layout))
        )

    fl = files("date_sort", (F.col("d") / 32).cast("long")).unionByName(
        files("zorder", (F.col("z") / 64).cast("long"))
    )
    probes = spark.range(1, 21, 1, 1).select((F.col("id") * 50).alias("probe_ck"))
    hits = (
        fl.join(F.broadcast(probes))
        .groupBy("layout", "probe_ck")
        .agg(
            F.sum(
                F.when(
                    F.col("probe_ck").between(F.col("min_ck"), F.col("max_ck")), 1
                ).otherwise(0)
            ).alias("files_hit")
        )
        .groupBy("layout")
        .agg(F.round(F.avg("files_hit"), 4).alias("avg_files_hit"))
    )
    return (
        fl.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_rows").alias("n_rows"),
            F.round(F.avg(F.col("max_ck") - F.col("min_ck")), 4).alias(
                "avg_ck_span"
            ),
            F.round(F.avg(F.col("max_d") - F.col("min_d")), 4).alias(
                "avg_day_span"
            ),
        )
        .join(hits, "layout")
        .select(
            "layout",
            "n_files",
            "n_rows",
            "avg_ck_span",
            "avg_day_span",
            "avg_files_hit",
        )
        .orderBy("layout")
    )


@register(
    "snapshot_diff_cdc",
    oracle="""
    WITH old AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 10 != 0
    ), new AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 5 = 0
                    THEN o_totalprice * 1.1 ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey % 7 != 0
    ), classified AS (
        SELECT COALESCE(o.o_orderstatus, n.o_orderstatus) AS status,
               CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    WHEN n.price != o.o_totalprice THEN 'update'
                    ELSE 'unchanged' END AS change_type
        FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    )
    SELECT status, change_type, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM classified
    GROUP BY status, change_type
    ORDER BY status, change_type
    """,
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot change-data-capture classification: two
    deterministic snapshots of the orders table (modulo-keyed deletes
    / inserts, a 10% price bump as updates) full-outer-joined on the
    primary key and classified insert / delete / update / unchanged,
    rolled up per status.  This is the nightly diff a lakehouse emits
    as a change feed when the source can't stream one.

    Scale: one shuffled equi-join on the primary key (both sides
    pre-projected to key + compare columns — column pruning keeps the
    shuffle narrow), then a partial-aggregable rollup of primitive
    rows.  Update detection compares the row-wise derived price
    (deterministic per-row IEEE math, identical in the oracle)."""
    o = table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("old_status"),
        F.col("o_totalprice").alias("old_price"),
    )
    new = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("new_status"),
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") * 1.1)
        .otherwise(F.col("o_totalprice"))
        .alias("new_price"),
    )
    return (
        old.join(new, "o_orderkey", "full_outer")
        .select(
            F.coalesce("old_status", "new_status").alias("status"),
            F.when(F.col("old_price").isNull(), "insert")
            .when(F.col("new_price").isNull(), "delete")
            .when(F.col("new_price") != F.col("old_price"), "update")
            .otherwise("unchanged")
            .alias("change_type"),
        )
        .groupBy("status", "change_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("status", "change_type")
    )


@register(
    "event_sequence_cohorts",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               string_agg(CASE event_type
                              WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                              WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                              ELSE 'e' END, '' ORDER BY ts, event_id) AS seq
        FROM events
        GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN regexp_matches(seq, 'v.*c.*p')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_funnel,
           CAST(SUM(CASE WHEN regexp_matches(seq, 'vcp')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_direct_funnel,
           CAST(SUM(CASE WHEN regexp_matches(seq, 'p.*e')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_error_after_purchase,
           CAST(SUM(CASE WHEN NOT regexp_matches(seq, 'p')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_never_purchased
    FROM seqs
    """,
)
def event_sequence_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence classification without the
    clause: each user's ordered event stream becomes a compact symbol
    string (one char per event, (ts, event_id)-ordered for a total
    deterministic order), and regex predicates classify whole
    journeys — saw the view→click→purchase funnel in order (with or
    without interleaving), hit an error after purchasing, never
    purchased.  Pattern matching over SEQUENCES, not rows, in one
    aggregation pass + one regex scan per user.

    Scale: the only shuffle is the per-user collect (combine-friendly
    struct list); symbol strings are ~events-per-user chars, so the
    regex pass is linear and partition-local.  The same shape powers
    clickstream-funnel and session-outcome labeling for training-data
    curation."""
    ev = table(spark, sf_dir, "events")
    ini = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    seqs = (
        ev.select("user_id", F.struct("ts", "event_id", ini.alias("i")).alias("s"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda s: s["i"]
                ),
                "",
            ).alias("seq")
        )
    )
    flag = lambda pat: F.sum(  # noqa: E731
        F.when(F.col("seq").rlike(pat), 1).otherwise(0)
    ).cast("long")
    return seqs.agg(
        F.count(F.lit(1)).alias("n_users"),
        flag("v.*c.*p").alias("n_funnel"),
        flag("vcp").alias("n_direct_funnel"),
        flag("p.*e").alias("n_error_after_purchase"),
        (F.count(F.lit(1)) - flag("p")).cast("long").alias("n_never_purchased"),
    )


@register(
    "listagg_top_parts_by_brand",
    oracle="""
    WITH top3 AS (
        SELECT p_brand, p_name, p_retailprice, p_partkey
        FROM part
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY p_brand
            ORDER BY p_retailprice DESC, p_partkey) <= 3
    )
    SELECT p_brand AS brand,
           string_agg(p_name, '|' ORDER BY p_retailprice DESC, p_partkey)
               AS top_names,
           ROUND(MAX(p_retailprice), 2) AS top_price
    FROM top3
    GROUP BY p_brand
    ORDER BY brand
    """,
)
def listagg_top_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation (LISTAGG / string_agg ... ORDER BY):
    each brand's three priciest part names as one ordered,
    '|'-delimited string.  The Spark side needs no window at all:
    collect per-brand structs keyed (−price, partkey), `array_sort`
    gives the deterministic order, `slice` keeps the top 3, and
    `array_join` flattens — a single partial-aggregable shuffle.

    Scale: collect_list ships each brand's (price, key, name)
    triples through one exchange; when parts-per-brand stops fitting
    an executor the pre-prune is a per-partition top-k (the
    TakeOrdered pattern) before the same collect — the ordered-
    aggregation semantics and this audit form stay the oracle."""
    p = table(spark, sf_dir, "part")
    sortable = F.struct(
        (-F.col("p_retailprice")).alias("neg_price"),
        F.col("p_partkey").alias("pk"),
        F.col("p_name").alias("name"),
    )
    top3 = F.slice(F.array_sort(F.collect_list(sortable)), 1, 3)
    return (
        p.groupBy(F.col("p_brand").alias("brand"))
        .agg(top3.alias("t3"))
        .select(
            "brand",
            F.array_join(
                F.transform(F.col("t3"), lambda s: s["name"]), "|"
            ).alias("top_names"),
            F.round(-F.element_at(F.col("t3"), 1)["neg_price"], 2).alias(
                "top_price"
            ),
        )
        .orderBy("brand")
    )


@register(
    "multiformat_roundtrip_audit",
    oracle="""
    WITH base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS sum_cents,
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
               MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        FROM orders
    )
    SELECT fmt, n_rows, sum_cents, n_statuses, min_key, max_key
    FROM base, (VALUES ('jsonl'), ('orc'), ('xml')) AS f(fmt)
    ORDER BY fmt
    """,
)
def multiformat_roundtrip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/sink format generalization audit (SURVEY.md §2.1): the
    SAME orders projection written once to JSON-lines, ORC, and XML
    (sources/formats.py::ingest_multiformat — price as exact BIGINT
    cents so no format's float-text convention can smudge it), each
    read back through its own source (explicit schema for the text
    formats, footer schema for ORC) and aggregated.  Every format's
    row must equal the parquet-direct oracle row — a lossy writer,
    reader, or schema mapping in ANY of the three paths flips the
    value hash.

    Scale: each leg is one scan + partial agg; JSONL/XML re-parse
    text per read (the documented reason the first pipeline stage
    converts drops to parquet/ORC), ORC gets the vectorized
    columnar reader.  The union is three 1-row legs."""
    from ..sources.formats import ingest_multiformat, read_jsonl, read_orc, read_xml
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    paths = ingest_multiformat(spark, sf_dir)
    schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("price_cents", LongType()),
        ]
    )
    legs = {
        "jsonl": read_jsonl(spark, paths["jsonl"], schema),
        "orc": read_orc(spark, paths["orc"]),
        "xml": read_xml(spark, paths["xml"], schema),
    }
    audits = [
        df.agg(
            F.lit(fmt).alias("fmt"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price_cents").alias("sum_cents"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        ).select(
            "fmt", "n_rows", "sum_cents", "n_statuses", "min_key", "max_key"
        )
        for fmt, df in legs.items()
    ]
    return reduce(lambda a, b: a.unionByName(b), audits).orderBy("fmt")
