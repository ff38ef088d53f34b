"""Seeded random-corpus cross-engine parity for the near-dup family —
the kmeans-parity idea (tests/test_kmeans_oracle_parity.py) applied to
the queries with the subtlest oracle SQL: minhash banding, simhash
chunk blocking, n-gram Jaccard, connected components, contamination.

The fixed testdata corpus can only exercise the token distributions it
happens to contain; these draws build adversarial corpora on purpose —
template families with small mutations (dense near-dup structure),
exact duplicates, empty and whitespace-only docs, single-token docs —
and require the Spark result and the DuckDB oracle to agree row-exact.
ASCII-only by construction: the engines' unicode lower()/regex
semantics differ and the synthetic testdata contract is ASCII.

This family is where the r4 HUGEINT-xor recall bug lived (invisible at
sf0.01, 66 dropped pairs at sf0.1) — corpus-shape-sensitive bugs are
exactly what random draws surface.
"""

from __future__ import annotations

import os
import sys
import random

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from monzo_data_pipeline_spark.registry import specs  # noqa: E402

QUERIES = [
    "exact_dup_groups",
    "ngram_jaccard_pairs",
    "minhash_lsh_near_dup",
    "simhash_near_dup",
    "near_dup_clusters",
    "benchmark_contamination",
]

VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "line", "sort", "window", "query",
    "join", "filter", "group", "order", "data", "column", "stream", "big",
    "small", "vector", "the", "a", "customer",
]


def _random_docs(seed: int, n_templates: int = 14, per_template: int = 5):
    rng = random.Random(seed)
    docs = []
    for t in range(n_templates):
        base = [rng.choice(VOCAB) for _ in range(rng.randint(8, 28))]
        for c in range(per_template):
            words = list(base)
            for _ in range(rng.randint(0, 3)):  # small mutations
                i = rng.randrange(len(words))
                words[i] = rng.choice(VOCAB)
            docs.append(" ".join(words))
        docs.append(" ".join(base))  # one exact duplicate per template
    # adversarial shapes
    docs += ["", "   ", "solo", "a", "the the the the the the the the"]
    rng.shuffle(docs)
    return docs


def _write_docs_dir(tmp_path, seed: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = _random_docs(seed)
    d = tmp_path / f"sf-rand-{seed}"
    d.mkdir()
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array([f"src{i % 3}" for i in range(len(docs))]),
            "n_chars": pa.array([len(t) for t in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def _canon_rows(rows):
    out = []
    for r in rows:
        out.append(tuple(str(v) for v in r))
    return sorted(out)


def _assert_family(spark, con, sf_dir, names, seed):
    """Run every query on Spark and its oracle on DuckDB; require
    row-exact (multiset) agreement via sorted stringified rows."""
    by_name = {s.name: s for s in specs()}
    for name in names:
        spec = by_name[name]
        srows = _canon_rows(tuple(r) for r in spec.fn(spark, sf_dir).collect())
        orows = _canon_rows(con.sql(spec.oracle).fetchall())
        assert srows == orows, (
            f"{name} diverged on seed {seed}: spark={len(srows)} rows, "
            f"oracle={len(orows)} rows; first deltas "
            f"{[r for r in srows if r not in orows][:3]} vs "
            f"{[r for r in orows if r not in srows][:3]}"
        )


@pytest.mark.parametrize("seed", [3, 17])
def test_neardup_family_matches_oracle_on_random_corpora(spark, tmp_path, seed):
    sf_dir = _write_docs_dir(tmp_path, seed)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    _assert_family(spark, con, sf_dir, QUERIES, seed)
    con.close()


TEXT_QUERIES = [
    "word_frequencies",
    "token_stats",
    "lang_id_heuristic",
    "quality_scores",
    "tfidf_top_terms",
    "bm25_keyword_search",
    "textrank_keywords",
    "pmi_collocations",
    "heavy_hitter_words",
    "token_diversity_scores",
    "bigram_rarity_scores",
    "oov_rates",
    "winnowing_fingerprints",
    "polynomial_fingerprints",
    "dup_ngram_stats",
    "inverted_index",
    "sharded_inverted_index",
    "adaptive_stopword_filter",
    "bpe_merge_table",
    "bpe_segmentation_stats",
    "bpe_token_counts",
]


@pytest.mark.parametrize("seed", [29])
def test_text_family_matches_oracle_on_random_corpora(spark, tmp_path, seed):
    """Same harness, the whole text-analysis family: token stats, TF-IDF,
    BM25, TextRank, PMI, diversity, OOV, rarity, fingerprints, inverted
    indexes, stopword filtering, and the unrolled BPE trainer — all
    must agree row-exact with their DuckDB twins on a random corpus
    with empty/whitespace/single-token edge docs."""
    sf_dir = _write_docs_dir(tmp_path, seed)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    _assert_family(spark, con, sf_dir, TEXT_QUERIES, seed)
    con.close()


EVENT_QUERIES = [
    "pseudonymized_activity", "scalar_functions", "struct_flatten",
    "asof_join", "tumbling_window_agg", "sessionization",
    "interval_join_attribution", "latest_events", "json_extract",
    "sliding_window_agg", "null_safe_equality", "variant_json_stats",
    "bitmap_exact_distinct", "scd2_intervals", "funnel_conversion",
    "cohort_retention", "resample_gap_fill", "value_histogram",
    "zscore_outliers", "mad_robust_outliers", "equi_depth_histogram",
    "scd2_temporal_lookup", "event_transition_matrix",
    "scd2_compressed_intervals", "session_paths_top",
    "k_anonymity_audit", "reversal_matching", "time_weighted_balance",
    "double_charge_flags", "ewma_user_values",
]


def _write_events_dir(tmp_path, seed: int) -> str:
    """Random events with deliberate timestamp TIES (same-user and
    cross-user), value extremes, single-event users, and bursts — the
    determinism stress the uniform testdata never applies: every
    window/as-of/SCD2 query's total-order tiebreak has to hold."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # include "view" and "click": asof_join / attribution / funnel
    # filter on them — without these the three checks compare
    # empty against empty
    types = ["signup", "login", "purchase", "refund", "error",
             "view", "click"]
    for _ in range(700):
        user = rng.randint(1, 25)
        ts = base + dt.timedelta(seconds=rng.randint(0, 30 * 86400))
        n_tied = rng.choice([1, 1, 1, 2, 3])  # ~40% land in a tie burst
        for _ in range(n_tied):
            val = rng.choice(
                [0.0, 0.01, round(rng.uniform(-50, 500), 2), 185.22]
            )
            rows.append(
                (
                    eid,
                    ts,  # identical across the burst: tiebreak stress
                    user if rng.random() < 0.8 else rng.randint(1, 25),
                    rng.choice(types),
                    val,
                    '{"k": %d}' % rng.randint(0, 99),
                )
            )
            eid += 1
    d = tmp_path / f"ev-rand-{seed}"
    d.mkdir()
    cols = list(zip(*rows))
    tbl = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("us")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3]),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5]),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("seed", [5])
def test_event_family_matches_oracle_on_random_streams(spark, tmp_path, seed):
    sf_dir = _write_events_dir(tmp_path, seed)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    _assert_family(spark, con, sf_dir, EVENT_QUERIES, seed)
    con.close()


ORDERS_QUERIES = [
    "monthly_spend", "top_k_orders", "spend_trend_slopes", "set_except",
    "top_n_per_group_salted", "running_total", "ntile_quartiles",
    "rollup_spend", "pivot_status_by_month", "exact_distinct_counts",
    "exact_percentiles", "table_profile", "upsert_last_wins",
    "versioned_upsert_merge", "set_intersect", "union_batches",
    "top_n_per_group", "cube_spend", "frequent_customers_having",
    "orders_above_customer_avg", "case_bucketing", "grouping_sets",
    "datetime_functions", "conditional_aggregates", "arg_extrema",
    "sorted_array_agg", "date_spine_densification", "unpivot_melt",
    "union_by_name_missing", "lag_lead_analytics", "rolling_7day_spend",
    "snapshot_diff_cdc", "map_type_pipeline", "range_band_join",
    "interval_band_revenue", "wow_revenue_movers", "l_diversity_audit",
    "rfm_segments", "subscription_streaks", "roundup_pots",
    "benford_digits",
]


def _write_orders_dir(tmp_path, seed: int) -> str:
    """Random orders with deliberate TOTALPRICE and DATE ties, repeat
    customers with bursts (streak/rolling-window stress), prices that
    land exactly on cent/rounding boundaries (the floor(x*100+0.5)
    and ntile cut edges), and single-order customers."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    statuses = ["O", "F", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    rows = []
    for okey in range(900):
        cust = rng.randint(1, 40)
        date = base + dt.timedelta(days=rng.randint(0, 400))
        price = rng.choice(
            [
                0.01,
                100.0,          # exact boundary
                99.995,         # half-cent rounding edge
                185.22,
                round(rng.uniform(1, 400000), 2),
                float(rng.randint(1, 5000)),  # integer-valued double
            ]
        )
        rows.append(
            (okey, cust, rng.choice(statuses), price, date, rng.choice(prios))
        )
    d = tmp_path / f"ord-rand-{seed}"
    d.mkdir()
    cols = list(zip(*rows))
    tbl = pa.table(
        {
            "o_orderkey": pa.array(cols[0], pa.int64()),
            "o_custkey": pa.array(cols[1], pa.int64()),
            "o_orderstatus": pa.array(cols[2]),
            "o_totalprice": pa.array(cols[3], pa.float64()),
            "o_orderdate": pa.array(cols[4], pa.timestamp("us")),
            "o_orderpriority": pa.array(cols[5]),
        }
    )
    pq.write_table(tbl, str(d / "orders.parquet"))
    return str(d)


@pytest.mark.parametrize("seed", [13])
def test_orders_family_matches_oracle_on_random_tables(spark, tmp_path, seed):
    sf_dir = _write_orders_dir(tmp_path, seed)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    _assert_family(spark, con, sf_dir, ORDERS_QUERIES, seed)
    con.close()


WAREHOUSE_QUERIES = [
    "pricing_summary", "date_range_filter", "anti_join_new_keys",
    "project_cast_stamp", "reconciliation_checksums", "first_wins_dedup",
    "fk_star_join", "broadcast_enrich_rates", "shipping_priority_q3",
    "fuzzy_name_pairs", "full_scan_region", "row_count_lineitem",
    "distinct_entities", "distinct_projection_wide", "default_fill",
    "revenue_per_customer", "string_functions", "local_supplier_volume_q5",
    "string_agg", "order_max_item", "semi_join", "full_outer_join",
    "exists_agg_priority", "volume_shipping_q7", "percentrank_cumedist",
    "algebraic_moments", "deterministic_mode", "systematic_sample",
    "stratified_fixed_n_sample", "regexp_extract_brand", "posexplode_words",
    "array_functions_breadth", "array_set_algebra", "grid_radius_join",
    "row_fingerprints", "correlation_matrix", "forecast_revenue_q6",
    "market_share_q8", "product_profit_q9", "returned_items_q10",
    "important_parts_q11", "priority_linestatus_q12",
    "customer_distribution_q13", "promo_revenue_q14", "top_supplier_q15",
    "small_qty_orders_q17", "large_volume_customers_q18",
    "disjunctive_revenue_q19", "waiting_customers_q22",
    "parts_supplier_counts_q16", "excess_inventory_suppliers_q20",
    "waiting_orders_suppliers_q21", "min_cost_supplier_q2",
    "frequently_bought_together",
]


def _write_warehouse_dir(tmp_path, seed: int) -> str:
    """Consistent random mini-warehouse with FK integrity, price/date
    ties, skewed fact keys (one hot customer, one hot part), and
    single-row dimension edges — the TPC-H-shape join family's stress
    surface."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    d = tmp_path / f"wh-rand-{seed}"
    d.mkdir()

    def write(name, cols):
        pq.write_table(pa.table(cols), str(d / f"{name}.parquet"))

    regions = ["AMERICA", "ASIA", "EUROPE", "AFRICA", "MIDDLE EAST"]
    write("region", {
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(regions),
    })
    n_nat = 12
    write("nation", {
        "n_nationkey": pa.array(range(n_nat), pa.int32()),
        "n_name": pa.array([f"NATION{i:02d}" for i in range(n_nat)]),
        "n_regionkey": pa.array([i % 5 for i in range(n_nat)], pa.int32()),
    })
    n_cust = 60
    write("customer", {
        "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(1, n_cust + 1)]),
        "c_nationkey": pa.array(
            [rng.randrange(n_nat) for _ in range(n_cust)], pa.int32()
        ),
        "c_acctbal": pa.array(
            [round(rng.uniform(-999, 9999), 2) for _ in range(n_cust)],
            pa.float64(),
        ),
        "c_mktsegment": pa.array(
            [rng.choice(["BUILDING", "AUTOMOBILE", "MACHINERY"])
             for _ in range(n_cust)]
        ),
    })
    n_supp = 15
    write("supplier", {
        "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(1, n_supp + 1)]),
        "s_nationkey": pa.array(
            [rng.randrange(n_nat) for _ in range(n_supp)], pa.int32()
        ),
        "s_acctbal": pa.array(
            [round(rng.uniform(-999, 9999), 2) for _ in range(n_supp)],
            pa.float64(),
        ),
    })
    n_part = 50
    brands = [f"Brand#{i}{j}" for i in range(1, 4) for j in range(1, 4)]
    types = ["ECONOMY ANODIZED STEEL", "PROMO BURNISHED COPPER",
             "STANDARD POLISHED TIN", "MEDIUM PLATED BRASS"]
    write("part", {
        "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
        "p_name": pa.array(
            [f"{rng.choice(['azure','blush','coral'])} "
             f"{rng.choice(['green','ivory','khaki'])} part {i}"
             for i in range(1, n_part + 1)]
        ),
        "p_brand": pa.array([rng.choice(brands) for _ in range(n_part)]),
        "p_type": pa.array([rng.choice(types) for _ in range(n_part)]),
        "p_size": pa.array(
            [rng.randint(1, 50) for _ in range(n_part)], pa.int32()
        ),
        "p_retailprice": pa.array(
            [round(rng.uniform(900, 2000), 2) for _ in range(n_part)],
            pa.float64(),
        ),
    })
    base = dt.datetime(2024, 1, 1)
    n_ord = 300
    hot_cust = 7  # skew: ~20% of orders on one customer
    o_rows, l_rows = [], []
    for okey in range(1, n_ord + 1):
        cust = hot_cust if rng.random() < 0.2 else rng.randint(1, n_cust)
        odate = base + dt.timedelta(days=rng.randint(0, 365))
        total = 0.0
        n_lines = rng.randint(1, 5)
        for ln in range(1, n_lines + 1):
            part = 3 if rng.random() < 0.15 else rng.randint(1, n_part)
            qty = float(rng.randint(1, 50))
            eprice = rng.choice(
                [100.0, 99.995, round(rng.uniform(100, 90000), 2)]
            )
            l_rows.append(
                (okey, part, rng.randint(1, n_supp), ln, qty, eprice,
                 rng.choice([0.0, 0.05, 0.1]), rng.choice([0.0, 0.08]),
                 rng.choice(["R", "A", "N"]), rng.choice(["O", "F"]),
                 odate + dt.timedelta(days=rng.randint(1, 60)))
            )
            total += eprice
        o_rows.append(
            (okey, cust, rng.choice(["O", "F", "P"]), round(total, 2),
             odate, rng.choice(
                 ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                  "5-LOW"]))
        )
    oc = list(zip(*o_rows))
    write("orders", {
        "o_orderkey": pa.array(oc[0], pa.int64()),
        "o_custkey": pa.array(oc[1], pa.int64()),
        "o_orderstatus": pa.array(oc[2]),
        "o_totalprice": pa.array(oc[3], pa.float64()),
        "o_orderdate": pa.array(oc[4], pa.timestamp("us")),
        "o_orderpriority": pa.array(oc[5]),
    })
    lc = list(zip(*l_rows))
    write("lineitem", {
        "l_orderkey": pa.array(lc[0], pa.int64()),
        "l_partkey": pa.array(lc[1], pa.int64()),
        "l_suppkey": pa.array(lc[2], pa.int64()),
        "l_linenumber": pa.array(lc[3], pa.int32()),
        "l_quantity": pa.array(lc[4], pa.float64()),
        "l_extendedprice": pa.array(lc[5], pa.float64()),
        "l_discount": pa.array(lc[6], pa.float64()),
        "l_tax": pa.array(lc[7], pa.float64()),
        "l_returnflag": pa.array(lc[8]),
        "l_linestatus": pa.array(lc[9]),
        "l_shipdate": pa.array(lc[10], pa.timestamp("us")),
    })
    return str(d)


@pytest.mark.parametrize("seed", [37])
def test_warehouse_family_matches_oracle_on_random_tables(spark, tmp_path, seed):
    sf_dir = _write_warehouse_dir(tmp_path, seed)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    _assert_family(spark, con, sf_dir, WAREHOUSE_QUERIES, seed)
    con.close()


EMBEDDING_QUERIES = [
    "array_ops", "cosine_topk_bruteforce", "ivf_topk",
    "ivf_topk_multiprobe", "bucketed_near_pairs",
    "random_projection_embed", "knn_join", "embedding_cosine_near_dup",
    "label_centroids", "kmeans_cluster_profile", "kmeans_representatives",
    "pq_rerank_topk",
]


def _write_embeddings_dir(tmp_path, seed: int, n: int = 200) -> str:
    """Random 64-dim float32 embeddings (the registry oracles hardcode
    the dimension) with outlier magnitudes, exactly-representable
    repeated values, duplicate vectors (near-dup/top-k tie stress),
    and a sign-skewed region (LSH bucket collisions)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vecs = rng.normal(0, 1, (n, 64)).astype(np.float32)
    vecs[::11] *= 50.0                 # outlier magnitudes
    vecs[1::7, :8] = np.abs(vecs[1::7, :8])  # sign-skew: LSH collisions
    vecs[5] = vecs[4]                  # exact duplicate pair
    vecs[3::13, 0] = 0.5               # exactly-representable repeats
    d = tmp_path / f"emb-rand-{seed}"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([i % 10 for i in range(n)], pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


@pytest.mark.parametrize("seed", [41])
def test_embedding_family_matches_oracle_on_random_vectors(
    spark, tmp_path, seed
):
    sf_dir = _write_embeddings_dir(tmp_path, seed)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    _assert_family(spark, con, sf_dir, EMBEDDING_QUERIES, seed)
    con.close()


MEDIA_DOC_QUERIES = [
    "pack_sequences", "exact_dedup_survivors", "source_mixture_sample",
    "token_repetition_stats", "chunk_documents", "bigram_counts",
    "curriculum_quality_sample", "media_metadata", "frame_sampling",
    "audio_windowing", "image_decode_stats", "image_resize_real",
    "image_png_roundtrip", "jpeg_decode_stats",
    "jpeg_progressive_decode_stats", "video_frame_stats",
    "media_resize", "media_feature_extract",
]


@pytest.mark.parametrize("seed", [53])
def test_media_doc_family_matches_oracle_on_random_corpora(
    spark, tmp_path, seed
):
    """The remaining documents-driven queries: packing, chunking,
    curriculum sampling, and the REAL media codecs whose payloads are
    constructed deterministically from the doc text — the oracles
    recompute every pixel/sample statistic from the ASCII codes, so a
    random corpus (including empty and whitespace-only docs, the
    _MEDIA_CLEAN edge) must agree bit-exact through encode → decode →
    stats on both engines."""
    sf_dir = _write_docs_dir(tmp_path, seed)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    _assert_family(spark, con, sf_dir, MEDIA_DOC_QUERIES, seed)
    con.close()


# ---------------------------------------------------------------------------
# round-5 analytics family: PageRank, skyline, ACF, integrity screen,
# chi-square, PII scan — over one combined random mini-warehouse +
# stream + corpus dir (the family touches all three table groups).

ANALYTICS_QUERIES = [
    "pagerank_trade_graph",
    "hits_customer_supplier",
    "skyline_parts",
    "acf_event_values",
    "referential_integrity_screen",
    "chi_square_lang_source",
    "pii_pattern_screen",
    "multi_touch_attribution",
    "classifier_bias_audit",
    "gini_spend_concentration",
    "cusum_daily_events",
    "triangle_count_copurchase",
    # r5 second batch — graph reach/mixing, conversion timing, rank
    # statistics, survival, drift/quality screens, deterministic HLL
    "bfs_copurchase_reach",
    "assortativity_copurchase",
    "conversion_latency",
    "spearman_balance_spend",
    "mannwhitney_urgent_orders",
    "welch_urgent_orders",
    "kendall_tau_balance_spend",
    "benford_first_digit",
    "tvd_source_drift",
    "churn_survival_km",
    "hll_distinct_orders",
    "weighted_price_percentiles",
    "doc_fingerprints",
    "theilsen_balance_spend",
    "spearman_by_segment",
]


def _write_analytics_dir(tmp_path, seed: int) -> str:
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed + 1000)
    wh = _write_warehouse_dir(tmp_path, seed)
    ev = _write_events_dir(tmp_path, seed)
    shutil.copy2(
        os.path.join(ev, "events.parquet"),
        os.path.join(wh, "events.parquet"),
    )
    # documents with MIXED lang/source (chi-square needs dof > 0) and
    # some digit/PII-ish tokens (pii screen needs non-zero matches)
    docs = []
    for i in range(120):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(3, 20))]
        if rng.random() < 0.2:
            words.append(f"user{rng.randint(100000, 999999)}")  # id_token
        if rng.random() < 0.1:
            words.append("a@b.co")
        docs.append(" ".join(words))
    docs += ["", "   "]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs),
            "lang": pa.array(
                [rng.choice(["en", "fr", "de"]) for _ in docs]
            ),
            "source": pa.array([f"src{i % 4}" for i in range(len(docs))]),
            "n_chars": pa.array([len(t) for t in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(wh, "documents.parquet"))
    return wh


@pytest.mark.parametrize("seed", [41, 59])
def test_analytics_family_matches_oracle_on_random_tables(
    spark, tmp_path, seed
):
    sf_dir = _write_analytics_dir(tmp_path, seed)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    _assert_family(spark, con, sf_dir, ANALYTICS_QUERIES, seed)
    con.close()


def test_word_shingles_poly62_matches_char_fold(spark):
    """r11: the fused per-token packed-fold shingle hasher must equal
    the char-level `_poly_hash62` of the shingle string exactly —
    including truncated short-doc shingles, empty/whitespace docs,
    and repeated tokens."""
    from monzo_data_pipeline_spark.ext import dedup_fuzzy as DF
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "one"),
            (2, ""),
            (3, "   "),
            (4, "a  b\tc"),
            (5, "w1 w2 w3 w4 w5 w6 w7"),
            (6, "x x x x x x"),
            (7, "the quick brown fox jumps over the lazy dog"),
            (8, "Zz aA 09 ~! %% || nope"),  # '|' words are fine here
        ],
        "doc_id long, text string",
    )
    ref = sorted(
        (r["doc_id"], r["shingle"], r["__h"])
        for r in DF.word_shingles(docs)
        .withColumn("__h", DF._poly_hash62(F.col("shingle")))
        .collect()
    )
    got = sorted(
        (r["doc_id"], r["shingle"], r["__h"])
        for r in DF.word_shingles_poly62(docs).collect()
    )
    assert got == ref and len(got) > 0
