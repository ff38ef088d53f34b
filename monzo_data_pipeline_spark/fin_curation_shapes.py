"""Round-2 query shapes: banking analytics (recurring payments,
round-up pots, time-weighted balances, double-charge flags, Benford
profiling) and corpus-curation signals (engine-agnostic fingerprints,
winnowing, collocations, lexical diversity) plus the REAL image
decode/resize pipeline.

Registered through the same decorator as the main registry (the
`warehouse_shapes.py` pattern) and appended AFTER the round-1
entries, so the driver's checked-prefix of the registry stays stable
across rounds.

Reference parity: the reference's silver layer is card-transaction
analytics (/root/reference/src/sql/transform_bronze_to_silver.sql);
the fin_* shapes are the gold-layer queries its users run next.
The curation/image shapes are north-star scope (SURVEY.md §2.C4/C5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .ext import bpe as BPE
from .ext import images as IMG
from .ext import similarity as SIM2
from .functions import text as TX
from .operators import fin as FIN


def register(_register) -> None:
    # -- banking analytics ------------------------------------------------

    @_register(
        "subscription_streaks",
        "B1/north-star (recurring-payment detection: gaps-and-islands "
        "runs of consecutive active months per customer)",
        """
        WITH m AS (
            SELECT DISTINCT o_custkey,
                   CAST(year(o_orderdate)*12 + month(o_orderdate) AS INT) AS mi
            FROM orders
        ), g AS (
            SELECT o_custkey, mi,
                   mi - dense_rank() OVER (PARTITION BY o_custkey ORDER BY mi) AS grp
            FROM m
        )
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS streak_months,
               MIN(mi) AS first_month, MAX(mi) AS last_month
        FROM g GROUP BY o_custkey, grp
        HAVING COUNT(*) >= 3
        ORDER BY o_custkey, first_month
        """,
    )
    def q_subscription_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
        return FIN.subscription_streaks(load_table(spark, sf_dir, "orders"))

    @_register(
        "roundup_pots",
        "B1/north-star (round-up-to-pot savings: integer cents, "
        "top-20 savers)",
        """
        WITH r AS (
            SELECT o_custkey,
                   (1000 - (CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) % 1000))
                     % 1000 AS roundup
            FROM orders
        )
        SELECT o_custkey, CAST(SUM(roundup) AS BIGINT) AS total_roundup_cents,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM r GROUP BY o_custkey
        ORDER BY total_roundup_cents DESC, o_custkey LIMIT 20
        """,
    )
    def q_roundup_pots(spark: SparkSession, sf_dir: str) -> DataFrame:
        return FIN.roundup_pots(load_table(spark, sf_dir, "orders"))

    @_register(
        "time_weighted_balance",
        "B1/north-star (step-function time-weighted average per user; "
        "whole-second weights, milli-unit values, integer DIV)",
        """
        WITH s AS (
            SELECT user_id,
                   CAST(floor(value * 1000) AS BIGINT) AS value_q,
                   (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                    - epoch_us(ts)) // 1000000 AS dur_s
            FROM events
        )
        SELECT user_id,
               CAST(SUM(value_q * dur_s) // SUM(dur_s) AS BIGINT) AS twa_value_q,
               CAST(COUNT(*) AS BIGINT) AS n_intervals
        FROM s WHERE dur_s IS NOT NULL
        GROUP BY user_id HAVING SUM(dur_s) > 0
        ORDER BY user_id
        """,
    )
    def q_time_weighted_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
        return FIN.time_weighted_balance(load_table(spark, sf_dir, "events"))

    @_register(
        "double_charge_flags",
        "A11/north-star (duplicate-charge screen: consecutive purchases "
        "per user within 300 s)",
        """
        WITH p AS (
            SELECT user_id, event_id, ts,
                   (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id))
                     // 1000000 AS gap_s
            FROM events WHERE event_type = 'purchase'
        )
        SELECT user_id, event_id, gap_s
        FROM p WHERE gap_s <= 300
        ORDER BY user_id, event_id
        """,
    )
    def q_double_charge_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
        return FIN.double_charge_flags(load_table(spark, sf_dir, "events"))

    @_register(
        "benford_digits",
        "B1/north-star (Benford first-digit profile of amounts; "
        "ppm shares via 1-row broadcast total)",
        """
        WITH c AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS INT) AS digit
            FROM orders
        ), counts AS (
            SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY digit
        )
        SELECT digit, n,
               CAST((n * 1000000) // (SELECT SUM(n) FROM counts)
                    AS BIGINT) AS share_ppm
        FROM counts ORDER BY digit
        """,
    )
    def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
        return FIN.benford_digits(load_table(spark, sf_dir, "orders"))

    # -- corpus curation --------------------------------------------------

    @_register(
        "polynomial_fingerprints",
        "north-star (engine-agnostic rolling content fingerprint: "
        "(acc·131+code) mod 2³¹−1 over printable ASCII — the "
        "oracle-checkable twin of xxhash64 doc_fingerprints)",
        r"""
        WITH d AS (
            SELECT doc_id,
                   CASE WHEN length(regexp_replace(COALESCE(text, ''),
                                                   '[^\x20-\x7e]', '', 'g')) = 0
                        THEN ' '
                        ELSE regexp_replace(COALESCE(text, ''),
                                            '[^\x20-\x7e]', '', 'g')
                   END AS clean
            FROM documents
        )
        SELECT doc_id,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, length(clean) + 1),
                                  i -> CAST(ascii(clean[i]) AS BIGINT))),
                 (a, b) -> (a * 131 + b) % 2147483647) AS fingerprint
        FROM d ORDER BY doc_id
        """,
    )
    def q_polynomial_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return docs.select(
            "doc_id", TX.polynomial_fingerprint("text").alias("fingerprint")
        )

    @_register(
        "winnowing_fingerprints",
        "north-star (MOSS winnowing: k-gram token hashes, w-window "
        "minima, distinct fingerprint set per doc — Schleimer SIGMOD'03)",
        r"""
        WITH t AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(lower(text)), '\s+') AS toks
            FROM documents
            WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 3
        ), h AS (
            SELECT doc_id,
                   list_transform(toks, t ->
                     CASE WHEN length(t) = 0 THEN CAST(0 AS BIGINT)
                          ELSE list_reduce(
                                 list_prepend(CAST(0 AS BIGINT),
                                   list_transform(range(1, length(t) + 1),
                                     i -> CAST(ascii(t[i]) AS BIGINT))),
                                 (a, b) -> (a * 131 + b) % 2147483647)
                     END) AS th,
                   len(toks) AS m
            FROM t
        ), g AS (
            SELECT doc_id,
                   list_transform(range(1, m - 1),
                     j -> ((th[j] * 131 + th[j+1]) % 2147483647 * 131
                           + th[j+2]) % 2147483647) AS g
            FROM h
        ), f AS (
            SELECT doc_id,
                   list_distinct(
                     list_transform(range(1, greatest(len(g) - 3, 1) + 1),
                                    i -> list_min(g[i:i+3]))) AS fps
            FROM g
        )
        SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps,
               list_min(fps) AS fp_min,
               CAST(list_sum(fps) AS BIGINT) AS fp_sum
        FROM f ORDER BY doc_id
        """,
    )
    def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
        return TX.winnowing_fingerprints(load_table(spark, sf_dir, "documents"))

    @_register(
        "pmi_collocations",
        "C4/north-star (collocation mining: integer lift score — the "
        "log-free PMI surrogate, min-count cut, top-20)",
        r"""
        WITH t AS (
            SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
            FROM documents
            WHERE trim(text) <> ''
              AND len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 2
        ), p AS (
            SELECT toks[i] AS a, toks[i+1] AS b
            FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) i
            WHERE toks[i] <> '' AND toks[i+1] <> ''
        ), ab AS (
            SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab FROM p GROUP BY a, b
        ), nb AS (SELECT SUM(n_ab) AS n_bigrams FROM ab),
        u AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w
            FROM (SELECT unnest(toks) AS w FROM t) WHERE w <> '' GROUP BY w
        )
        SELECT ab.a, ab.b, ab.n_ab,
               CAST((ab.n_ab * nb.n_bigrams * 1000) // (ua.c_w * ub.c_w)
                    AS BIGINT) AS lift_q
        FROM ab
        JOIN u ua ON ua.w = ab.a
        JOIN u ub ON ub.w = ab.b
        CROSS JOIN nb
        WHERE ab.n_ab >= 5
        ORDER BY lift_q DESC, a, b LIMIT 20
        """,
    )
    def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
        return TX.pmi_collocations(load_table(spark, sf_dir, "documents"))

    @_register(
        "token_diversity_scores",
        "C4/north-star (Gini–Simpson lexical diversity per doc, "
        "integer-quantized — the log-free entropy twin)",
        r"""
        WITH c AS (
            SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS n_i
            FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
                FROM documents
            ) WHERE w <> '' GROUP BY doc_id, w
        )
        SELECT doc_id, CAST(SUM(n_i) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(((SUM(n_i)*SUM(n_i) - SUM(n_i*n_i)) * 1000000)
                    // (SUM(n_i)*SUM(n_i)) AS BIGINT) AS simpson_q
        FROM c GROUP BY doc_id ORDER BY doc_id
        """,
    )
    def q_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
        return TX.token_diversity(load_table(spark, sf_dir, "documents"))

    # -- real image pipeline ----------------------------------------------
    # The payload is synthesized JVM-side from the doc's printable-ASCII
    # bytes cycled to fill a 16×16×3 P6 raster; the Spark side then
    # REALLY decodes it (ext/images.py) while the oracle recomputes the
    # pixel sums from the same cycling rule with integer arithmetic —
    # so the decoder itself is under the correctness gate.

    _CLEAN_SQL = r"""
            CASE WHEN length(regexp_replace(COALESCE(text, ''),
                                            '[^\x20-\x7e]', '', 'g')) = 0
                 THEN ' '
                 ELSE regexp_replace(COALESCE(text, ''), '[^\x20-\x7e]', '', 'g')
            END"""

    @_register(
        "image_decode_stats",
        "C5/north-star (REAL netpbm decode via Arrow-batched mapInPandas; "
        "oracle recomputes pixel sums from the deterministic raster rule)",
        f"""
        WITH d AS (
            SELECT doc_id AS media_id, {_CLEAN_SQL} AS clean
            FROM documents
        ), s AS (
            SELECT media_id, length(clean) AS L,
                   list_transform(range(1, length(clean) + 1),
                                  i -> CAST(ascii(clean[i]) AS BIGINT)) AS codes
            FROM d
        )
        SELECT media_id, TRUE AS valid, 16 AS width, 16 AS height,
               3 AS channels, CAST(256 AS BIGINT) AS n_pixels,
               CAST((768 // L) * list_sum(codes)
                    + CASE WHEN 768 % L = 0 THEN 0
                           ELSE list_sum(codes[1:(768 % L)]) END
                    AS BIGINT) AS pix_sum
        FROM s ORDER BY media_id
        """,
    )
    def q_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return IMG.image_stats(IMG.documents_as_images(docs))

    @_register(
        "image_resize_real",
        "C5/north-star (REAL decode → nearest-neighbor resize → re-encode "
        "→ re-decode; oracle samples the same source pixels by index math)",
        f"""
        WITH d AS (
            SELECT doc_id AS media_id, {_CLEAN_SQL} AS clean
            FROM documents
        ), s AS (
            SELECT media_id, length(clean) AS L,
                   list_transform(range(1, length(clean) + 1),
                                  i -> CAST(ascii(clean[i]) AS BIGINT)) AS codes
            FROM d
        )
        SELECT media_id, TRUE AS valid, 4 AS width, 4 AS height,
               3 AS channels, CAST(16 AS BIGINT) AS n_pixels,
               CAST(list_sum(list_transform(range(0, 48),
                 j -> codes[((((j // 12) * 4 * 16 + ((j // 3) % 4) * 4) * 3
                              + (j % 3)) % L) + 1])) AS BIGINT) AS pix_sum
        FROM s ORDER BY media_id
        """,
    )
    def q_image_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        imgs = IMG.documents_as_images(docs)
        return IMG.image_stats(IMG.resize_images(imgs, target_w=4, target_h=4))

    # -- vocabulary induction + projection ---------------------------------

    @_register(
        "bpe_merge_table",
        "C4/north-star (DataFrame-native BPE merge training, 6 steps; "
        "oracle = the same steps unrolled as chained CTEs with "
        "scalar-subquery argmaxes — the textrank technique)",
        BPE.bpe_merges_oracle_sql(6),
    )
    def q_bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
        return BPE.bpe_merges(load_table(spark, sf_dir, "documents"), n_merges=6)

    @_register(
        "random_projection_embed",
        "C3/north-star (deterministic ±1 Johnson–Lindenstrauss projection "
        "64→16 dims, all-integer — the coarse-filter tier of ANN). The "
        "registry query serializes the vector to a ','-joined string: "
        "array-typed output columns crash the driver's pandas "
        "canonicalizer (unhashable list in sort_values); the array-typed "
        "API function random_projection() is unchanged.",
        """
        SELECT vec_id,
               array_to_string(
                 list_transform(range(0, 16), j ->
                   list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, 65), i ->
                         (CASE WHEN (i*31 + j*17) % 2 = 0 THEN 1 ELSE -1 END)
                         * CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                                AS BIGINT))),
                     (a, b) -> a + b)), ',') AS proj_q,
               label
        FROM embeddings ORDER BY vec_id
        """,
    )
    def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
        proj = SIM2.random_projection(load_table(spark, sf_dir, "embeddings"))
        return proj.select(
            "vec_id",
            F.array_join(
                F.transform("proj_q", lambda x: x.cast("string")), ","
            ).alias("proj_q"),
            "label",
        )

    # -- trends, profiling, reconciliation ---------------------------------

    @_register(
        "spend_trend_slopes",
        "B1/north-star (per-customer OLS spending trend: exact integer "
        "slope num/den from moment sums — no division, no float)",
        """
        WITH m AS (
            SELECT o_custkey,
                   CAST(year(o_orderdate)*12 + month(o_orderdate) AS BIGINT)
                     - 24000 AS x,
                   SUM(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS y
            FROM orders GROUP BY 1, 2
        )
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_months,
               -- CAST: DuckDB SUM(BIGINT) yields HUGEINT, which pandas
               -- materializes as float64 and hash-mismatches Spark's
               -- int64; values fit comfortably in BIGINT.
               CAST(COUNT(*)*SUM(x*y) - SUM(x)*SUM(y) AS BIGINT) AS slope_num,
               CAST(COUNT(*)*SUM(x*x) - SUM(x)*SUM(x) AS BIGINT) AS slope_den
        FROM m GROUP BY o_custkey HAVING COUNT(*) >= 2
        ORDER BY o_custkey
        """,
    )
    def q_spend_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
        return FIN.spend_trend(load_table(spark, sf_dir, "orders"))

    @_register(
        "table_profile",
        "A6/north-star (column-level profile — the ANALYZE TABLE stats "
        "pass: one scan, one wide agg, cluster-side unpivot; exact "
        "distincts keep it oracle-checkable)",
        """
        WITH w AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_nulls,
                   CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS k_d,
                   CAST(MIN(o_orderkey) AS VARCHAR) AS k_min,
                   CAST(MAX(o_orderkey) AS VARCHAR) AS k_max,
                   CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_nulls,
                   CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS s_d,
                   CAST(MIN(o_orderstatus) AS VARCHAR) AS s_min,
                   CAST(MAX(o_orderstatus) AS VARCHAR) AS s_max,
                   CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls,
                   CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS p_d,
                   CAST(MIN(o_orderpriority) AS VARCHAR) AS p_min,
                   CAST(MAX(o_orderpriority) AS VARCHAR) AS p_max
            FROM orders
        )
        SELECT 'o_orderkey' AS "column", n AS n_rows, k_nulls AS n_nulls,
               k_d AS n_distinct, k_min AS min_str, k_max AS max_str FROM w
        UNION ALL
        SELECT 'o_orderstatus', n, s_nulls, s_d, s_min, s_max FROM w
        UNION ALL
        SELECT 'o_orderpriority', n, p_nulls, p_d, p_min, p_max FROM w
        ORDER BY "column"
        """,
    )
    def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .pipeline.quality import profile_table

        return profile_table(
            load_table(spark, sf_dir, "orders"),
            ["o_orderkey", "o_orderstatus", "o_orderpriority"],
        )

    @_register(
        "reconciliation_checksums",
        "A5/north-star (cross-warehouse drift detection: order-independent "
        "per-bucket polynomial checksums over integer columns — compare "
        "bucket tables between replicas without moving data)",
        """
        WITH h AS (
            SELECT l_orderkey % 32 AS bucket,
                   ((((0*131 + l_orderkey % 2147483647) % 2147483647) * 131
                     + l_partkey % 2147483647) % 2147483647 * 131
                     + l_suppkey % 2147483647) % 2147483647 AS h
            FROM lineitem
        )
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(h) % 2147483647 AS BIGINT) AS checksum
        FROM h GROUP BY bucket ORDER BY bucket
        """,
    )
    def q_reconciliation_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .pipeline.quality import reconciliation_checksums

        return reconciliation_checksums(
            load_table(spark, sf_dir, "lineitem"),
            ["l_orderkey", "l_partkey", "l_suppkey"],
            bucket_key="l_orderkey",
        )

    @_register(
        "image_png_roundtrip",
        "C5/north-star (REAL PNG codec under the gate: resize re-encodes "
        "as PNG — stdlib-zlib DEFLATE — and image_stats decodes it back; "
        "pixel sums must equal the PPM-path oracle exactly)",
        f"""
        WITH d AS (
            SELECT doc_id AS media_id, {_CLEAN_SQL} AS clean
            FROM documents
        ), s AS (
            SELECT media_id, length(clean) AS L,
                   list_transform(range(1, length(clean) + 1),
                                  i -> CAST(ascii(clean[i]) AS BIGINT)) AS codes
            FROM d
        )
        SELECT media_id, TRUE AS valid, 4 AS width, 4 AS height,
               3 AS channels, CAST(16 AS BIGINT) AS n_pixels,
               CAST(list_sum(list_transform(range(0, 48),
                 j -> codes[((((j // 12) * 4 * 16 + ((j // 3) % 4) * 4) * 3
                              + (j % 3)) % L) + 1])) AS BIGINT) AS pix_sum
        FROM s ORDER BY media_id
        """,
    )
    def q_image_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        imgs = IMG.documents_as_images(docs)
        return IMG.image_stats(
            IMG.resize_images(imgs, target_w=4, target_h=4, codec="png")
        )

    @_register(
        "bpe_segmentation_stats",
        "C4/north-star (BPE apply side: corpus compression summary after "
        "the trained merges — token budget + vocabulary size; oracle "
        "shares the training CTE chain and reads the final corpus)",
        BPE.bpe_stats_oracle_sql(6),
    )
    def q_bpe_segmentation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        return BPE.bpe_segmentation_stats(
            load_table(spark, sf_dir, "documents"), n_merges=6
        )

    @_register(
        "pseudonymized_activity",
        "A15/north-star (GDPR Art. 4(5) pseudonymization: salted "
        "engine-agnostic tokens replace user ids — joins still work, "
        "exports never correlate across salts; map-side only)",
        r"""
        WITH t AS (
            SELECT 'anon_' || CAST(list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(s) + 1),
                                      i -> CAST(ascii(s[i]) AS BIGINT))),
                     (a, b) -> (a * 131 + b) % 2147483647) AS VARCHAR)
                   || '_' || CAST(list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(range(1, length(s) + 1),
                                      i -> CAST(ascii(s[i]) AS BIGINT))),
                     (a, b) -> (a * 137 + b) % 2147483647) AS VARCHAR) AS token
            FROM (SELECT 'export-2026|' || CAST(user_id AS VARCHAR) AS s
                  FROM events)
        )
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM t GROUP BY token ORDER BY token
        """,
    )
    def q_pseudonymized_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .pipeline.erasure import pseudonymize_columns

        ev = load_table(spark, sf_dir, "events").select("user_id")
        anon = pseudonymize_columns(ev, ["user_id"], salt="export-2026")
        return (
            anon.groupBy(F.col("user_id").alias("token"))
            .agg(F.count(F.lit(1)).alias("n_events"))
        )

    @_register(
        "frequently_bought_together",
        "B3/north-star (market-basket pair mining: per-order baskets → "
        "map-side pair explode → ONE count; no fact-fact self-join)",
        """
        WITH b AS (
            SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS parts
            FROM lineitem GROUP BY l_orderkey
        ), p AS (
            SELECT parts[i] AS part_a, parts[j] AS part_b
            FROM b,
                 LATERAL (SELECT unnest(range(1, len(parts) + 1)) AS i) i,
                 LATERAL (SELECT unnest(range(1, len(parts) + 1)) AS j) j
            WHERE i < j AND len(parts) >= 2
        )
        SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM p GROUP BY part_a, part_b
        HAVING COUNT(*) >= 3
        ORDER BY n_orders DESC, part_a, part_b LIMIT 20
        """,
    )
    def q_frequently_bought_together(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .ext.shared import copurchase_sup

        # the sup ≥ 3 top-N view of the shared co-purchase pair memo
        # (identical pair counts: per-order DISTINCT baskets → one
        # count per co-occurring order) — FIN.frequently_bought_together
        # remains the from-scratch operator API
        sup = copurchase_sup(spark, sf_dir)
        return (
            sup.filter(F.col("sup") >= 3)
            .select(
                F.col("a").alias("part_a"),
                F.col("b").alias("part_b"),
                F.col("sup").alias("n_orders"),
            )
            .orderBy(F.desc("n_orders"), "part_a", "part_b")
            .limit(20)
        )

    @_register(
        "ewma_user_values",
        "B1/north-star (per-user EWMA with alpha=1/2: every step an exact "
        "integer halving — zero float accumulation, chronological fold "
        "over the bounded per-user event array)",
        """
        WITH o AS (
            SELECT user_id,
                   list(CAST(floor(value * 1000) AS BIGINT)
                        ORDER BY ts, event_id) AS vals
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT), vals),
                 (a, v) -> (a + v) // 2) AS ewma_q,
               CAST(len(vals) AS BIGINT) AS n_events
        FROM o ORDER BY user_id
        """,
    )
    def q_ewma_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
        return FIN.ewma_user_values(load_table(spark, sf_dir, "events"))

    @_register(
        "video_frame_stats",
        "C5/north-star (REAL video decode: YUV4MPEG2/C444 stream walk + "
        "per-frame stats — one row in, one row per frame out; oracle = "
        "prefix-sum differences of the cycling raster rule)",
        f"""
        WITH d AS (
            SELECT doc_id AS media_id, {_CLEAN_SQL} AS clean
            FROM documents
        ), s AS (
            SELECT media_id, length(clean) AS L,
                   list_transform(range(1, length(clean) + 1),
                                  i -> CAST(ascii(clean[i]) AS BIGINT)) AS codes,
                   list_sum(list_transform(range(1, length(clean) + 1),
                                  i -> CAST(ascii(clean[i]) AS BIGINT))) AS tot
            FROM d
        )
        SELECT media_id, CAST(f AS INT) AS frame_idx,
               8 AS width, 8 AS height,
               CAST(((192*(f+1)) // L) * tot
                    + CASE WHEN (192*(f+1)) % L = 0 THEN 0
                           ELSE list_sum(codes[1:((192*(f+1)) % L)]) END
                    - ((192*f) // L) * tot
                    - CASE WHEN (192*f) % L = 0 THEN 0
                           ELSE list_sum(codes[1:((192*f) % L)]) END
                    AS BIGINT) AS pix_sum
        FROM s, LATERAL (SELECT unnest(range(0, 4)) AS f) f
        ORDER BY media_id, frame_idx
        """,
    )
    def q_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return IMG.video_frame_stats(IMG.documents_as_videos(docs))

    @_register(
        "bigram_rarity_scores",
        "C4/north-star (LM-lite perplexity surrogate: mean inverse corpus "
        "bigram frequency per doc, all-integer — the n-gram-LM filter "
        "axis without libm logs)",
        r"""
        WITH t AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
            FROM documents
            WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 2
        ), p AS (
            SELECT doc_id, toks[i] AS a, toks[i+1] AS b
            FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) i
            WHERE toks[i] <> '' AND toks[i+1] <> ''
        ), c AS (
            SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM p GROUP BY a, b
        )
        SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(1000000 // c.c_ab) // COUNT(*) AS BIGINT) AS rarity_q
        FROM p JOIN c ON c.a = p.a AND c.b = p.b
        GROUP BY p.doc_id ORDER BY p.doc_id
        """,
    )
    def q_bigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
        return TX.bigram_rarity_scores(load_table(spark, sf_dir, "documents"))

    @_register(
        "lm_perplexity_scores",
        "C4/north-star (r10: the CCNet/KenLM corpus quality filter — "
        "an add-1-smoothed bigram LM trained on the corpus scores "
        "every document's cross-entropy in bits-per-bigram, ENTIRELY "
        "in exact fixed point: integer part of each −log₂P from "
        "bit-length strings, fractional 16 bits from the "
        "shift-and-square Q29 mantissa recurrence — no libm, so the "
        "scores hash-check cross-engine; the 16-round recurrence "
        "runs on the vocabulary-sized model table, never the fact "
        "table — functions/text.py::lm_perplexity_scores)",
        TX.lm_perplexity_oracle_sql(add_k=1),
    )
    def q_lm_perplexity_scores(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        return TX.lm_perplexity_scores(
            load_table(spark, sf_dir, "documents"), add_k=1
        )

    @_register(
        "lm_kl_drift",
        "C4/north-star (r10: corpus DRIFT between the en and non-en "
        "document slices as the two-directional KL divergence of "
        "their add-1 bigram LMs over a shared union vocabulary — the "
        "distribution-shift gate a pipeline runs when a new source "
        "lands, in Q16 bits/bigram; both models' costs run through "
        "one Q16 log recurrence on the union-bigram model table, "
        "fact touched once, DECIMAL(38,0) accumulation — "
        "functions/text.py::lm_bigram_kl)",
        TX.lm_kl_oracle_sql("lang = 'en'", add_k=1),
    )
    def q_lm_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
        return TX.lm_bigram_kl(
            load_table(spark, sf_dir, "documents"),
            F.col("lang") == "en",
            add_k=1,
        )

    @_register(
        "lm_heldout_scores",
        "C4/north-star (r10: HELD-OUT LM scoring, the exact CCNet "
        "shape — the add-1 bigram model trains only on the en slice "
        "and every non-en document is scored under it; unseen "
        "bigrams pay the full smoothed penalty, making the score a "
        "real out-of-distribution signal; Q16 recurrence once per "
        "distinct held-out bigram, broadcast back — "
        "functions/text.py::lm_crossentropy_heldout)",
        TX.lm_heldout_oracle_sql("lang = 'en'", add_k=1),
    )
    def q_lm_heldout_scores(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        return TX.lm_crossentropy_heldout(
            load_table(spark, sf_dir, "documents"),
            F.col("lang") == "en",
            add_k=1,
        )

    @_register(
        "mixture_temperature_plan",
        "north-star sampling (r10: the α-temperature source-mixture "
        "rule — XLM-R/mBERT p_i ∝ n_i^0.3 — computed entirely in "
        "fixed point: n^α = exp2(α·log₂ n) through the Q16 log chain "
        "and a Q30 exp2 chain with hardcoded per-bit constants; "
        "output per source = token counts, target mixture weight "
        "(ppm) and the per-source sampling rate normalized so the "
        "most-upsampled source reads at 10⁶; one fact-scale agg, "
        "everything after on the bounded source table — "
        "functions/text.py::mixture_temperature_plan)",
        TX.mixture_temperature_oracle_sql("lang", alpha_ppm=300_000),
    )
    def q_mixture_temperature_plan(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        return TX.mixture_temperature_plan(
            load_table(spark, sf_dir, "documents"),
            "lang",
            alpha_ppm=300_000,
        )

    @_register(
        "oov_rates",
        "C4/north-star (tokenizer-coverage filter: ppm of tokens outside "
        "the deterministic top-K corpus vocabulary)",
        r"""
        WITH w AS (
            SELECT doc_id, w
            FROM (SELECT doc_id,
                         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS w
                  FROM documents)
            WHERE w <> ''
        ), v AS (
            SELECT w FROM (
                SELECT w, COUNT(*) AS c FROM w GROUP BY w
                ORDER BY c DESC, w ASC LIMIT 10)
        )
        SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS oov_ppm
        FROM w LEFT JOIN v ON v.w = w.w
        GROUP BY w.doc_id ORDER BY w.doc_id
        """,
    )
    def q_oov_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
        return TX.oov_rate(load_table(spark, sf_dir, "documents"), vocab_size=10)
