"""Planted-behavior evidence for the round-5 operators
(plans/queries_dedup_oracle.py, queries_ann_oracle.py,
queries_analytics5.py).  The registry sweep pins every query against
its DuckDB oracle on the driver corpus; these tests add the
non-trivial semantics on constructed tables — planted duplicates are
found, interpolation reconstructs the exact midpoint, streaks break
where planted, lift separates dependent from independent brands —
plus oracle differentials on the same planted tables."""

from __future__ import annotations

import datetime

import duckdb
import pytest

from ex9_big_data_gal_drimer_spark.plans import ORACLES, QUERIES


def _write(spark, tmp_path, name, rows, schema):
    df = spark.createDataFrame(rows, schema)
    sf_dir = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/{name}.parquet")
    return sf_dir


def _duck(sf_dir, *names):
    con = duckdb.connect()
    for name in names:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet/*.parquet'"
        )
    return con


DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(rows):
    return [(i, t, "en", "s0", len(t)) for i, t in rows]


# ---------------------------------------------------------------------------
# MinHash-LSH / SimHash md5 oracle twins
# ---------------------------------------------------------------------------


BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)
NEAR = BASE.replace("tango", "zulu")  # one word differs at the tail
OTHER = (
    "one two three four five six seven eight nine ten eleven twelve "
    "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
)


def test_minhash_lsh_finds_planted_dups_only(spark, tmp_path):
    """Exact dup pair (J=1) and a 1-word-out near dup (J≈0.85) are
    emitted; two unrelated docs never pair up."""
    sf_dir = _write(
        spark, tmp_path, "documents",
        _docs([(0, BASE), (1, BASE), (2, NEAR), (3, OTHER), (4, OTHER + " extra")]),
        DOC_SCHEMA,
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["minhash_lsh_oracle_md5"](spark, sf_dir).collect()
    }
    assert got[(0, 1)] == 1.0
    assert 0.7 < got[(0, 2)] < 1.0 and 0.7 < got[(1, 2)] < 1.0
    assert not any(3 in p or 4 in p for p in got if p != (3, 4))
    con = _duck(sf_dir, "documents")
    want = con.execute(ORACLES["minhash_lsh_oracle_md5"]).fetchall()
    assert sorted((a, b, j) for (a, b), j in got.items()) == sorted(
        tuple(r) for r in want
    )


def test_minhash_estimate_matches_exact_on_identical_docs(spark, tmp_path):
    """An exact duplicate pair must estimate J=1 with zero error; the
    near-dup's estimate is a multiple of 1/8 within 3/8 of truth."""
    sf_dir = _write(
        spark, tmp_path, "documents",
        _docs([(0, BASE), (1, BASE), (2, NEAR)]),
        DOC_SCHEMA,
    )
    rows = {
        (r.doc_a, r.doc_b): r
        for r in QUERIES["minhash_estimate_quality_md5"](spark, sf_dir).collect()
    }
    assert rows[(0, 1)].est_jaccard == 1.0
    assert rows[(0, 1)].true_jaccard == 1.0
    assert rows[(0, 1)].abs_err == 0.0
    near = rows[(0, 2)]
    assert near.est_jaccard in [round(k / 8, 4) for k in range(9)]
    assert near.abs_err <= 3 / 8


def test_simhash_identical_token_multisets_at_distance_zero(spark, tmp_path):
    """Docs with the same token multiset (reordered words) hash to the
    SAME SimHash (distance 0); an unrelated doc stays out of the ≤1
    result set."""
    reordered = " ".join(reversed(BASE.split()))
    sf_dir = _write(
        spark, tmp_path, "documents",
        _docs([(0, BASE), (1, reordered), (2, OTHER)]),
        DOC_SCHEMA,
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in QUERIES["simhash_hamming_oracle_md5"](spark, sf_dir).collect()
    }
    assert got[(0, 1)] == 0  # word order is invisible to SimHash
    assert not any(2 in p for p in got)


# ---------------------------------------------------------------------------
# IVF fixed-centroid oracle twin
# ---------------------------------------------------------------------------


def test_ivf_fixed_centroids_top1_is_planted_neighbor(spark, tmp_path):
    """Vectors planted in centroid cells: each query's rank-1 neighbor
    is its own cell's planted satellite, and the oracle agrees."""

    def vec(axes, dim=12):
        v = [0.0] * dim
        for a, w in axes:
            v[a] = w
        return v

    rows = []
    # centroids 0..7 = basis vectors (these double as queries 0..7)
    for c in range(8):
        rows.append((c, vec([(c, 1.0)]), c))
    # satellites 20..27: close to centroid i (cos ≈ 0.995)
    for c in range(8):
        rows.append((20 + c, vec([(c, 1.0), ((c + 1) % 12, 0.1)]), c))
    # queries 8, 9: near centroids 0 and 1
    rows.append((8, vec([(0, 1.0), (11, 0.05)]), 0))
    rows.append((9, vec([(1, 1.0), (11, 0.05)]), 1))
    sf_dir = _write(
        spark, tmp_path, "embeddings", rows,
        "vec_id long, embedding array<float>, label int",
    )
    got = QUERIES["knn_ivf_oracle_fixed_centroids"](spark, sf_dir).collect()
    top1 = {r.query_id: r.neighbor_id for r in got if r.rank == 1}
    assert top1[8] == 0 and top1[9] == 1  # the centroid itself wins
    top1_sat = {r.query_id: r.neighbor_id for r in got if r.rank == 2}
    assert top1_sat[8] == 20 and top1_sat[9] == 21  # then the satellite
    con = _duck(sf_dir, "embeddings")
    want = con.execute(ORACLES["knn_ivf_oracle_fixed_centroids"]).fetchall()
    assert sorted((r.query_id, r.rank, r.neighbor_id, r.sim) for r in got) == sorted(
        tuple(r) for r in want
    )


# ---------------------------------------------------------------------------
# analytics5: time series / behavioral / statistical
# ---------------------------------------------------------------------------


ORDER_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
)


def _order(k, cust, price, day):
    return (k, cust, "F", price, datetime.datetime(2024, 1, day), "1-URGENT")


def test_gapfill_reconstructs_exact_midpoint(spark, tmp_path):
    """Days 1,2,4 present; day 3 must be filled with the linear
    midpoint of days 2 and 4 and flagged."""
    sf_dir = _write(
        spark, tmp_path, "orders",
        [_order(1, 1, 100.0, 1), _order(2, 1, 200.0, 2), _order(3, 1, 400.0, 4)],
        ORDER_SCHEMA,
    )
    got = {
        r.day: r for r in QUERIES["daily_revenue_gapfill_interp"](spark, sf_dir).collect()
    }
    assert len(got) == 4
    assert got[datetime.date(2024, 1, 3)].revenue == 300.0
    assert got[datetime.date(2024, 1, 3)].filled == 1
    assert got[datetime.date(2024, 1, 2)].revenue == 200.0
    assert got[datetime.date(2024, 1, 2)].filled == 0


def test_moving_median_window_is_calendar_days(spark, tmp_path):
    """med7 at day 8 covers days 2..8 only (day 1 ages out), and the
    median is the order statistic of those revenues."""
    rows = [_order(d, 1, float(d) * 10, d) for d in range(1, 9)]
    sf_dir = _write(spark, tmp_path, "orders", rows, ORDER_SCHEMA)
    got = {r.day: r.med7 for r in QUERIES["daily_revenue_moving_median"](spark, sf_dir).collect()}
    assert got[datetime.date(2024, 1, 8)] == 50.0  # median of 20..80
    assert got[datetime.date(2024, 1, 1)] == 10.0  # frame of one
    assert got[datetime.date(2024, 1, 4)] == 25.0  # even frame: (20+30)/2


def test_streaks_split_on_planted_gap(spark, tmp_path):
    """User active days 1-3 then 5-6: two streaks of 3 and 2."""
    evs = []
    for i, d in enumerate([1, 2, 3, 5, 6]):
        evs.append((i, datetime.datetime(2024, 1, d, 12), 7, "view", 1.0, "{}"))
    sf_dir = _write(
        spark, tmp_path, "events", evs,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    got = QUERIES["user_active_day_streaks"](spark, sf_dir).collect()
    assert [(r.streak_len, r.start_day.day, r.end_day.day) for r in got] == [
        (3, 1, 3),
        (2, 5, 6),
    ]


def test_twa_weights_by_holding_time(spark, tmp_path):
    """value 10 held 30 s then value 90 held 10 s → TWA = 30."""
    t0 = datetime.datetime(2024, 1, 1)
    evs = [
        (1, t0, 1, "view", 10.0, "{}"),
        (2, t0 + datetime.timedelta(seconds=30), 1, "view", 90.0, "{}"),
        (3, t0 + datetime.timedelta(seconds=40), 1, "view", 0.0, "{}"),
    ]
    sf_dir = _write(
        spark, tmp_path, "events", evs,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    got = QUERIES["time_weighted_avg_value"](spark, sf_dir).collect()
    assert len(got) == 1 and got[0].twa_value == 30.0  # (10*30 + 90*10) / 40


def test_welch_ttest_formula(spark, tmp_path):
    """Hand-computed Welch t on planted arms."""
    t0 = datetime.datetime(2024, 1, 1)
    evs = []
    for i, v in enumerate([10.0, 12.0, 14.0]):  # purchase: mean 12, var 4
        evs.append((i, t0, 1, "purchase", v, "{}"))
    for i, v in enumerate([5.0, 7.0]):  # view: mean 6, var 2
        evs.append((10 + i, t0, 2, "view", v, "{}"))
    sf_dir = _write(
        spark, tmp_path, "events", evs,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    r = QUERIES["welch_ttest_purchase_view"](spark, sf_dir).collect()[0]
    assert (r.n_purchase, r.n_view, r.mean_diff) == (3, 2, 6.0)
    assert r.t_stat == round(6.0 / (4 / 3 + 2 / 2) ** 0.5, 4)


def test_gini_extremes(spark, tmp_path):
    """Equal revenues → Gini 0; one customer holding ~everything →
    Gini near (n−1)/n."""
    nat = [(0, "A", 0), (1, "B", 0)]
    cust = [(i, f"c{i}", 0 if i < 4 else 1, 0.0, "SEG") for i in range(8)]
    orders = []
    for i in range(4):  # nation A: all equal
        orders.append(_order(i, i, 100.0, 1))
    orders.append(_order(10, 4, 10000.0, 1))  # nation B: concentrated
    for i in range(5, 8):
        orders.append(_order(10 + i, i, 0.01, 1))
    sf_dir = _write(spark, tmp_path, "orders", orders, ORDER_SCHEMA)
    _write(spark, tmp_path, "customer", cust,
           "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
           " c_mktsegment string")
    _write(spark, tmp_path, "nation", nat,
           "n_nationkey int, n_name string, n_regionkey int")
    got = {r.nation: r.gini for r in QUERIES["gini_revenue_by_nation"](spark, sf_dir).collect()}
    assert got["A"] == 0.0
    assert abs(got["B"] - 0.75) < 0.01  # (n-1)/n with n=4


def test_basket_lift_separates_dependence(spark, tmp_path):
    """Brands X,Y co-occur in every order → lift = n_orders/ (nX·nY)
    · nXY is maximal; brand Z appears alone → no Z pairs."""
    li, pt = [], []
    pt = [(1, "p1", "X", "t", 1, 1.0), (2, "p2", "Y", "t", 1, 1.0),
          (3, "p3", "Z", "t", 1, 1.0)]
    rows = []
    for ok in range(4):  # orders 0..3 contain X and Y
        rows.append((ok, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     datetime.datetime(2024, 1, 1)))
        rows.append((ok, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O",
                     datetime.datetime(2024, 1, 1)))
    rows.append((4, 3, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                 datetime.datetime(2024, 1, 1)))  # order 4: only Z
    li_schema = ("l_orderkey long, l_partkey long, l_suppkey long,"
                 " l_linenumber int, l_quantity double, l_extendedprice double,"
                 " l_discount double, l_tax double, l_returnflag string,"
                 " l_linestatus string, l_shipdate timestamp_ntz")
    sf_dir = _write(spark, tmp_path, "lineitem", rows, li_schema)
    _write(spark, tmp_path, "part", pt,
           "p_partkey long, p_name string, p_brand string, p_type string,"
           " p_size int, p_retailprice double")
    got = QUERIES["basket_lift_top_pairs"](spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.brand_a, r.brand_b, r.n_both) == ("X", "Y", 4)
    assert r.support == 0.8      # 4 of 5 orders
    assert r.confidence == 1.0   # X ⇒ Y always
    assert r.lift == 1.25        # 4·5/(4·4)


def test_weighted_median_crosses_half_total(spark, tmp_path):
    """Quantity-weighted median picks the price where cumulative
    quantity first reaches half: weights (1,1,8) → the heavy row."""
    rows = [
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", datetime.datetime(2024, 1, 1)),
        (2, 1, 1, 1, 1.0, 20.0, 0.0, 0.0, "N", "O", datetime.datetime(2024, 1, 1)),
        (3, 1, 1, 1, 8.0, 30.0, 0.0, 0.0, "N", "O", datetime.datetime(2024, 1, 1)),
    ]
    li_schema = ("l_orderkey long, l_partkey long, l_suppkey long,"
                 " l_linenumber int, l_quantity double, l_extendedprice double,"
                 " l_discount double, l_tax double, l_returnflag string,"
                 " l_linestatus string, l_shipdate timestamp_ntz")
    sf_dir = _write(spark, tmp_path, "lineitem", rows, li_schema)
    got = QUERIES["quantity_weighted_median_price"](spark, sf_dir).collect()
    assert len(got) == 1 and got[0].weighted_median_price == 30.0


def test_percentile_profile_deciles(spark, tmp_path):
    """20 customers with distinct ascending balances land two per
    decile; band ranges track the balance order."""
    cust = [(i, f"c{i}", 0, float(i * 5), "SEG") for i in range(20)]
    sf_dir = _write(spark, tmp_path, "customer", cust,
                    "c_custkey long, c_name string, c_nationkey int,"
                    " c_acctbal double, c_mktsegment string")
    got = QUERIES["acctbal_percentile_profile"](spark, sf_dir).collect()
    assert [r.decile for r in got] == list(range(10))
    assert all(r.n_customers == 2 for r in got)
    assert [r.min_bal for r in got] == [float(d * 10) for d in range(10)]
    assert [r.max_bal for r in got] == [float(d * 10 + 5) for d in range(10)]


def test_percentile_profile_tied_balances_share_a_band(spark, tmp_path):
    """A tied balance group is assigned ONE decile (by rows strictly
    below it), never split across bands."""
    cust = [(i, f"c{i}", 0, 100.0, "SEG") for i in range(9)]
    cust.append((9, "c9", 0, 200.0, "SEG"))
    sf_dir = _write(spark, tmp_path, "customer", cust,
                    "c_custkey long, c_name string, c_nationkey int,"
                    " c_acctbal double, c_mktsegment string")
    got = {r.decile: r for r in QUERIES["acctbal_percentile_profile"](spark, sf_dir).collect()}
    assert set(got) == {0, 9}
    assert got[0].n_customers == 9 and got[0].min_bal == got[0].max_bal == 100.0
    assert got[9].n_customers == 1 and got[9].min_bal == 200.0


def test_user_path_counts_only_complete_triples(spark, tmp_path):
    """Two users share view>click>purchase; a 2-event user is excluded."""
    t0 = datetime.datetime(2024, 1, 1)

    def ts(i):
        return t0 + datetime.timedelta(seconds=i)

    evs = []
    eid = 0
    for uid in (1, 2):
        for i, et in enumerate(["view", "click", "purchase", "error"]):
            evs.append((eid, ts(i), uid, et, 0.0, "{}"))
            eid += 1
    evs.append((eid, ts(0), 3, "view", 0.0, "{}"))
    evs.append((eid + 1, ts(1), 3, "click", 0.0, "{}"))
    sf_dir = _write(
        spark, tmp_path, "events", evs,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    got = QUERIES["user_path_top10"](spark, sf_dir).collect()
    assert [(r.path, r.n_users) for r in got] == [("view>click>purchase", 2)]


def test_benford_digits_and_chi2_on_planted_values(spark, tmp_path):
    """Planted first digits 1,1,1,2 → observed 0.75/0.25 over digits
    1,2 and the chi-square terms follow the formula."""
    rows = [_order(i, 1, p, 1) for i, p in enumerate([120.0, 150.0, 199.0, 25.0])]
    sf_dir = _write(spark, tmp_path, "orders", rows, ORDER_SCHEMA)
    got = {r.digit: r for r in QUERIES["benford_first_digit_audit"](spark, sf_dir).collect()}
    assert got[1].n == 3 and got[1].observed_p == 0.75
    assert got[2].n == 1 and got[2].observed_p == 0.25
    import math

    exp1 = math.log10(2)
    assert got[1].benford_p == round(exp1, 4)
    assert got[1].chi2_term == round((0.75 - exp1) ** 2 / exp1 * 4, 4)


def test_hash_bucket_balance_is_complete_and_normalized(spark, duck):
    """On the driver corpus: buckets span 0..31, row counts sum to
    |orders|, and load factors average 1."""
    from conftest import SF_DIR as sf_dir

    got = QUERIES["hash_bucket_balance_audit"](spark, sf_dir).collect()
    assert [r.bucket for r in got] == list(range(32))
    n_orders = duck.execute(
        f"SELECT COUNT(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]
    assert sum(r.n_rows for r in got) == n_orders
    assert abs(sum(r.load_factor for r in got) / 32 - 1.0) < 0.01


def test_lang_entropy_uniform_vs_degenerate(spark, tmp_path):
    """A 4-language uniform source scores exactly 2 bits; a
    single-language source scores 0."""
    rows = []
    for i, lang in enumerate(["en", "de", "fr", "es"] * 2):
        rows.append((i, "x y z", lang, "uniform", 5))
    for i in range(3):
        rows.append((100 + i, "x y z", "en", "mono", 5))
    sf_dir = _write(spark, tmp_path, "documents", rows, DOC_SCHEMA)
    got = {r.source: r for r in QUERIES["lang_entropy_by_source"](spark, sf_dir).collect()}
    assert got["uniform"].n_langs == 4 and got["uniform"].lang_entropy == 2.0
    assert got["mono"].n_langs == 1
    assert got["mono"].lang_entropy == 0.0


def test_corr_matrix_sign_on_planted_columns(spark, tmp_path):
    """quantity ⇑ price (corr 1), quantity ⇓ discount (corr −1)."""
    rows = []
    for i in range(1, 6):
        rows.append((i, 1, 1, 1, float(i), float(i) * 10, 1.0 - i * 0.1, 0.05,
                     "N", "O", datetime.datetime(2024, 1, 1)))
    li_schema = ("l_orderkey long, l_partkey long, l_suppkey long,"
                 " l_linenumber int, l_quantity double, l_extendedprice double,"
                 " l_discount double, l_tax double, l_returnflag string,"
                 " l_linestatus string, l_shipdate timestamp_ntz")
    sf_dir = _write(spark, tmp_path, "lineitem", rows, li_schema)
    got = {(r.col_a, r.col_b): r.corr_v
           for r in QUERIES["numeric_corr_matrix_lineitem"](spark, sf_dir).collect()}
    assert got[("l_quantity", "l_extendedprice")] == 1.0
    assert got[("l_quantity", "l_discount")] == -1.0
    assert got[("l_discount", "l_tax")] is None  # zero variance in tax
