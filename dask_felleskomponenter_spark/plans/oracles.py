"""DuckDB oracle SQL twins for the declared query set.

Each SQL string computes the same result as its ``plans/queries.py``
namesake, on the driver's pre-registered parquet views (region nation
customer supplier part orders lineitem events documents embeddings).

The twin rules that make hash-parity hold:
- identical output column names (aliased on both sides);
- money aggregates summed in DECIMAL(18,s) then cast to DOUBLE (exact,
  order-independent — mirrors ``queries.dmoney``/``dsum``);
- per-row double math written with the same operation order and the same
  explicit ROUND as the Spark expression;
- rankings over computed doubles rank on the rounded value + id;
- whitespace classes spelled ``[\\s\\x0b]`` (and ``\\x0b`` added to every
  negated class containing ``\\s``): Java's ``\\s`` includes vertical tab
  U+000B, DuckDB's RE2 ``\\s`` does not — a document containing ``\\x0B``
  would otherwise tokenize differently across the two engines;
- ORDER BY on a NULLABLE key says ``NULLS FIRST`` explicitly: Spark ASC
  sorts NULLs first, DuckDB defaults to NULLS LAST, and the driver's
  value hash is order-sensitive.

Queries deliberately absent (rows-only checks) — the complete list, 11
of the 158 declared (every one has pytest semantic pins instead):
agg_approx_distinct / sketch_rollup_users (different HLL
implementations), agg_approx_percentiles / kll_quantile_rollup_prices
(different quantile sketches), neardup_minhash_lsh / simhash_documents /
neardup_crossbatch_screen (xxhash64 has no DuckDB twin),
ann_lsh_bucketed / ann_ivf_topk / ann_pq_topk (approximate by design),
raster_contours_tiles (marching-squares WKB has no SQL twin).
"""

from __future__ import annotations

ORACLES: dict[str, str] = {}

ORACLES["q1_pricing_summary"] = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["q3_shipping_priority"] = """
SELECT
  o_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  o_orderpriority
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) DESC, o_orderkey
LIMIT 10
"""

ORACLES["q5_local_supplier_volume"] = """
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

ORACLES["q10_returned_customers"] = """
SELECT
  c_custkey,
  c_name,
  n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) DESC, c_custkey
LIMIT 20
"""

ORACLES["q7_volume_shipping"] = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS revenue
FROM supplier, lineitem, orders, customer, nation n1, nation n2
WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
  AND c_custkey = o_custkey
  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

ORACLES["q8_market_share"] = """
SELECT o_year,
       ROUND(CAST(COALESCE(SUM(CASE WHEN nation = 'NATION_3'
                                    THEN volume END), 0) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
       region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
    AND p_type = 'PROMO'
) t
GROUP BY o_year
ORDER BY o_year
"""

ORACLES["q18_large_volume_customers"] = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       ROUND(o_totalprice, 2) AS o_totalprice,
       ROUND(SUM(l_quantity), 2) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING SUM(l_quantity) > 170
  )
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
"""

ORACLES["q6_forecast_revenue"] = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

ORACLES["q13_customer_distribution"] = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN (
    SELECT o_custkey, o_orderkey FROM orders WHERE o_orderpriority <> '1-URGENT'
  ) o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

ORACLES["q15_top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS r
  FROM lineitem
  -- l_suppkey IS NOT NULL mirrors the Spark query's explicit filter:
  -- without it a NULL-suppkey group could own MAX(r), match no
  -- supplier, and empty the result while Spark returns the top real
  -- supplier (NULL-key divergence class).
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
    AND l_suppkey IS NOT NULL
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(rev.r AS DOUBLE) AS total_revenue
FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
WHERE rev.r = (SELECT MAX(r) FROM rev)
ORDER BY s.s_suppkey
"""

ORACLES["q2_min_cost_supplier"] = """
WITH pf AS (
  SELECT p_partkey, p_name FROM part
  WHERE p_type = 'SMALL' AND p_size BETWEEN 10 AND 20
), li AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(l.l_extendedprice AS DECIMAL(12,2)) AS cost,
         pf.p_partkey, pf.p_name
  FROM lineitem l JOIN pf ON l.l_partkey = pf.p_partkey
), mc AS (
  SELECT l_partkey, MIN(cost) AS min_cost FROM li GROUP BY l_partkey
)
SELECT DISTINCT li.p_partkey, li.p_name, s.s_suppkey, s.s_name,
       CAST(mc.min_cost AS DOUBLE) AS min_cost
FROM li
JOIN mc ON li.l_partkey = mc.l_partkey AND li.cost = mc.min_cost
JOIN supplier s ON li.l_suppkey = s.s_suppkey
ORDER BY li.p_partkey, s.s_suppkey
"""

ORACLES["q11_important_parts"] = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(4,1))) AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey IN (0, 1, 2)
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(v AS DOUBLE) > (SELECT CAST(SUM(v) AS DOUBLE) FROM per_part) * 0.001
ORDER BY part_value DESC, l_partkey
"""

ORACLES["q21_single_blame_supplier"] = """
SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_suppkey, s.s_name
ORDER BY numwait DESC, s.s_suppkey
LIMIT 100
"""

ORACLES["q9_product_type_profit"] = """
SELECT n_name,
       CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
       - CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))
                  * CAST(l_quantity AS DECIMAL(4,1))) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""

ORACLES["q12_late_lines_by_status"] = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""

ORACLES["q16_supplier_count_by_part"] = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey IS NOT NULL
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""

ORACLES["q20_heavy_part_suppliers"] = """
WITH per_sup AS (
  SELECT l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%widget%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM per_sup
  WHERE qty > (SELECT AVG(qty) FROM per_sup) * 1.5
)
ORDER BY s_suppkey
"""

# Same word-3-gram shingle derivation as neardup_jaccard_pairs; eval
# set = doc_id % 97 == 0, train = the rest; per-train-doc distinct
# shingle count and eval-overlap count.
ORACLES["contamination_ngram_screen"] = """
WITH toks AS (
  SELECT doc_id, __TOKS(text)__ AS t
  FROM documents
), shingled AS (
  SELECT doc_id,
         CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
              ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]
         END AS shs
  FROM toks
), sets AS (
  SELECT doc_id, UNNEST(list_distinct(shs)) AS sh FROM shingled
), eval_sh AS (
  SELECT DISTINCT sh FROM sets WHERE doc_id % 97 = 0
), train AS (
  SELECT doc_id, sh FROM sets WHERE doc_id % 97 <> 0
), counted AS (
  SELECT t.doc_id,
         COUNT(*) AS n_shingles,
         CAST(SUM(CASE WHEN e.sh IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hits
  FROM train t LEFT JOIN eval_sh e ON t.sh = e.sh
  GROUP BY t.doc_id
)
SELECT doc_id, n_shingles, n_hits,
       ROUND(n_hits / n_shingles, 6) AS hit_ratio
FROM counted
WHERE n_hits > 0
ORDER BY doc_id
"""

ORACLES["pack_sequences_offsets"] = """
WITH toks AS (
  -- COALESCE mirrors bpe_ish_token_count's NULL-text → 0 guard: a NULL
  -- n_tokens here emitted NULL seq fields where Spark emits 0s
  -- (round-10 review, confirmed divergence)
  SELECT doc_id,
         doc_id % 8 AS shard,
         COALESCE(len(regexp_extract_all(text, '\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s\\x0b\\p{Z}]')), 0)
           AS n_tokens
  FROM documents
), placed AS (
  SELECT doc_id, shard, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_before
  FROM toks
)
SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(FLOOR(cum_before / 2048.0) AS BIGINT) AS seq_start,
       CAST(cum_before % 2048 AS BIGINT) AS seq_offset,
       CAST(FLOOR((cum_before + n_tokens - 1) / 2048.0) AS BIGINT)
         - CAST(FLOOR(cum_before / 2048.0) AS BIGINT) + 1 AS n_seqs_spanned
FROM placed
ORDER BY doc_id
"""

ORACLES["mixture_temperature_sample"] = """
WITH counts AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
), mx AS (
  SELECT MAX(n) AS mxn FROM counts
), rates AS (
  SELECT lang, POWER(CAST(n AS DOUBLE) / CAST(mxn AS DOUBLE), 0.5) AS rate
  FROM counts, mx
)
SELECT d.lang,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN (d.doc_id * 2654435761) % 1000 / 1000.0 < r.rate
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       ROUND(ANY_VALUE(r.rate), 6) AS target_rate,
       ROUND(SUM(CASE WHEN (d.doc_id * 2654435761) % 1000 / 1000.0 < r.rate
                      THEN 1 ELSE 0 END) / COUNT(*), 6) AS achieved_rate
FROM documents d JOIN rates r ON d.lang = r.lang
GROUP BY d.lang
ORDER BY d.lang
"""

ORACLES["unigram_logprob_score"] = """
WITH tok AS (
  SELECT doc_id, UNNEST(__TOKS(text)__) AS term
  FROM documents
), doc_term AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), vocab AS (
  SELECT term, SUM(tf) AS cf FROM doc_term GROUP BY term
), total AS (
  SELECT SUM(cf) AS n FROM vocab
)
SELECT dt.doc_id,
       CAST(SUM(dt.tf) AS BIGINT) AS n_tokens,
       ROUND(SUM(dt.tf * LN(v.cf / t.n)) / SUM(dt.tf), 6) AS avg_logprob
FROM doc_term dt
JOIN vocab v ON dt.term = v.term
CROSS JOIN total t
GROUP BY dt.doc_id
ORDER BY dt.doc_id
"""

ORACLES["robust_stats_lineitem"] = """
WITH med AS (
  SELECT l_returnflag, MEDIAN(l_quantity) AS m
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       COUNT(*) AS n_rows,
       ROUND(ANY_VALUE(med.m), 6) AS median_qty,
       ROUND(MEDIAN(ABS(l.l_quantity - med.m)), 6) AS mad_qty
FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""

ORACLES["repetition_profile_documents"] = """
WITH toks AS (
  SELECT doc_id, __TOKS(text)__ AS t
  FROM documents
), bigrams AS (
  SELECT doc_id,
         len(t) AS n_tokens,
         len(list_distinct(t)) AS n_distinct,
         UNNEST(CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                     ELSE [array_to_string(t[i:i+1], ' ')
                           FOR i IN range(1, len(t))]
                END) AS bg
  FROM toks
  -- zero-token docs excluded on both engines: nothing to profile and
  -- the distinct/token ratio would be 0/0
  WHERE len(t) > 0
), per_bigram AS (
  SELECT doc_id, n_tokens, n_distinct, bg, COUNT(*) AS c
  FROM bigrams GROUP BY doc_id, n_tokens, n_distinct, bg
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(n_distinct / n_tokens, 6) AS distinct_token_ratio,
       MAX(c) AS top_bigram_count,
       ROUND(MAX(c) / SUM(c), 6) AS top_bigram_fraction
FROM per_bigram
GROUP BY doc_id, n_tokens, n_distinct
ORDER BY doc_id
"""

ORACLES["window_range_7day_spend"] = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
         CAST(FLOOR(EPOCH(o_orderdate) / 86400.0) AS BIGINT) AS d,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price
  FROM orders
)
SELECT o_orderkey, o_custkey, order_date,
       CAST(SUM(price) OVER (
         PARTITION BY o_custkey ORDER BY d
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS spend_7d
FROM o
ORDER BY o_custkey, order_date NULLS FIRST, o_orderkey
"""

ORACLES["nullsafe_join_segments"] = """
WITH cust AS (
  SELECT c_custkey, NULLIF(c_mktsegment, 'MACHINERY') AS seg FROM customer
), dim AS (
  SELECT DISTINCT NULLIF(c_mktsegment, 'MACHINERY') AS d_seg,
         COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'UNKNOWN') AS seg_label
  FROM customer
)
SELECT d.seg_label, COUNT(*) AS n_customers
FROM cust c JOIN dim d ON c.seg IS NOT DISTINCT FROM d.d_seg
GROUP BY d.seg_label
ORDER BY d.seg_label
"""

ORACLES["stats_regression_lineitem"] = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       ROUND(CORR(l_extendedprice, l_quantity), 6) AS corr_pq,
       ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 3) AS covar_pq,
       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 3) AS intercept,
       ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS r2,
       ROUND(MEDIAN(l_extendedprice), 6) AS median_price,
       ROUND(STDDEV_SAMP(l_quantity), 6) AS stddev_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLES["funnel_conversion_events"] = """
WITH t_view AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), t_click AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN t_view v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
), t_purchase AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN t_click c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT COUNT(*) AS n_viewed,
       COUNT(c.t_click) AS n_clicked_after_view,
       COUNT(p.t_purchase) AS n_purchased_after_click,
       ROUND(COUNT(p.t_purchase) / COUNT(*), 6) AS view_to_purchase_rate
FROM t_view v
LEFT JOIN t_click c ON v.user_id = c.user_id
LEFT JOIN t_purchase p ON v.user_id = p.user_id
WHERE v.t_view IS NOT NULL
"""

ORACLES["cohort_retention_events"] = """
WITH active AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0)
              AS INTEGER) AS week
  FROM events
), cohort AS (
  SELECT user_id, MIN(week) AS cohort_week FROM active GROUP BY user_id
)
SELECT c.cohort_week,
       a.week - c.cohort_week AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM active a JOIN cohort c ON a.user_id = c.user_id
GROUP BY c.cohort_week, week_offset
ORDER BY c.cohort_week NULLS FIRST, week_offset NULLS FIRST
"""

ORACLES["resample_ffill_events"] = """
WITH hourly AS (
  -- ts IS NOT NULL spelled on BOTH sides (the timeline convention):
  -- the NULL pseudo-hour emitted no grid rows here either, but on the
  -- Spark side it leaked its hour-average into the ffill window
  SELECT user_id, date_trunc('hour', ts) AS h,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*), 6)
           AS hour_avg
  FROM events WHERE ts IS NOT NULL GROUP BY user_id, h
), spans AS (
  SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY user_id
), grid AS (
  SELECT s.user_id, UNNEST(generate_series(s.h0, s.h1, INTERVAL 1 HOUR)) AS h
  FROM spans s
)
SELECT g.user_id,
       STRFTIME(g.h, '%Y-%m-%d %H:00') AS hour,
       last_value(hy.hour_avg IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
       hy.hour_avg IS NULL AS is_gap
FROM grid g
LEFT JOIN hourly hy ON g.user_id = hy.user_id AND g.h = hy.h
ORDER BY g.user_id NULLS FIRST, hour
"""

ORACLES["spatial_box_join_counts"] = """
WITH sup AS (
  SELECT s_suppkey,
         (s_suppkey * 2654435761) % 100000 AS x,
         (s_suppkey * 97610309) % 100000 AS y
  FROM supplier
), cust AS (
  SELECT c_custkey,
         (c_custkey * 2654435761) % 100000 AS x,
         (c_custkey * 97610309) % 100000 AS y
  FROM customer
)
SELECT s.s_suppkey,
       COUNT(*) AS n_nearby,
       MIN(c.c_custkey) AS nearest_custkey_min
FROM sup s JOIN cust c
  ON ABS(s.x - c.x) <= 2500 AND ABS(s.y - c.y) <= 2500
GROUP BY s.s_suppkey
ORDER BY s.s_suppkey
"""

ORACLES["date_arith_orders"] = """
SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
       CAST(QUARTER(o_orderdate) AS INTEGER) AS o_quarter,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT WEEK(o_orderdate)) AS n_iso_weeks,
       STRFTIME(MAX(LAST_DAY(CAST(o_orderdate AS DATE))), '%Y-%m-%d')
         AS latest_month_end,
       STRFTIME(MIN(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH), '%Y-%m-%d')
         AS earliest_plus3m,
       ROUND(AVG(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')), 6)
         AS avg_days_to_close
FROM orders
GROUP BY o_year, o_quarter
ORDER BY o_year, o_quarter
"""

ORACLES["recursive_cte_customer_tree"] = """
WITH RECURSIVE tree AS (
  SELECT c_custkey AS node, c_custkey AS root, 0 AS depth
  FROM customer
  WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, t.root, t.depth + 1
  FROM customer c
  JOIN tree t ON CAST(FLOOR(c.c_custkey / 10.0) AS BIGINT) = t.node
  WHERE c.c_custkey >= 10
)
SELECT node, root, CAST(depth AS INT) AS depth
FROM tree
ORDER BY node
"""

ORACLES["join_full_outer_spend_freq"] = """
WITH spend AS (
  SELECT o_custkey AS ck_s,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
  FROM orders GROUP BY 1
  HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) > 2600000
), freq AS (
  SELECT o_custkey AS ck_f, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
  HAVING COUNT(*) >= 13
)
SELECT COALESCE(ck_s, ck_f) AS custkey,
       COALESCE(total_spend, -1.0) AS total_spend,
       COALESCE(n_orders, -1) AS n_orders
FROM spend FULL OUTER JOIN freq ON ck_s = ck_f
ORDER BY custkey
"""

# Salted-join twin: the salt is physical-plan-only, so the oracle is the
# PLAIN join + rollup — equality IS the correctness statement.
ORACLES["join_salted_user_events"] = """
SELECT c.c_mktsegment,
       COUNT(*) AS n_events,
       ROUND(SUM(e.value), 6) AS sum_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""

ORACLES["theta_cohort_overlap"] = """
WITH a AS (
  -- user_id IS NOT NULL: theta_sketch_agg skips NULL inputs, but
  -- COUNT(*) over DISTINCT would count the NULL row as a member
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'purchase' AND value > 200 AND user_id IS NOT NULL
), b AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'error' AND value > 200 AND user_id IS NOT NULL
)
SELECT (SELECT COUNT(*) FROM a) AS big_buyers,
       (SELECT COUNT(*) FROM b) AS error_reporters,
       (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS both,
       (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS either,
       (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS buyers_only
"""

ORACLES["skew_profile_event_keys"] = """
WITH per_key AS (
  SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id
), t AS (
  SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM per_key
)
SELECT p.user_id, p.n_rows,
       ROUND(p.n_rows / t.total, 9) AS share,
       ROUND(CAST(p.n_rows AS DOUBLE) * t.n_keys / t.total, 6) AS skew_x
FROM per_key p, t
ORDER BY p.n_rows DESC, p.user_id NULLS FIRST
LIMIT 20
"""

ORACLES["embedding_quantize_stats"] = """
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), m AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS maxabs
  FROM base
), q AS (
  SELECT vec_id, maxabs,
         127.0 / maxabs AS scale,
         list_transform(v, x -> CAST(ROUND(x * (127.0 / maxabs)) AS INTEGER))
           AS qv
  FROM m
)
SELECT vec_id,
       CASE WHEN maxabs IS NULL OR maxabs = 0 THEN NULL
            ELSE ROUND(scale, 6) END AS scale,
       CASE WHEN maxabs IS NULL OR maxabs = 0 THEN NULL
            ELSE CAST(list_sum(qv) AS BIGINT) END AS q_sum,
       CASE WHEN maxabs IS NULL OR maxabs = 0 THEN NULL
            ELSE CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT)
            END AS q_l1,
       CASE WHEN maxabs IS NULL OR maxabs = 0 THEN NULL
            ELSE list_max(qv) END AS q_max
FROM q
ORDER BY vec_id
"""

ORACLES["exists_late_shipment_orders"] = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLES["scalar_subquery_small_qty"] = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 2)
         AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
  AND l_quantity < (
    SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = part.p_partkey
  )
"""

ORACLES["filter_or_of_and_revenue"] = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 30)
"""

ORACLES["notexists_dormant_customers"] = """
SELECT c_mktsegment,
       COUNT(*) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

ORACLES["conditional_promo_revenue"] = """
SELECT ROUND(
  100.0
  * CAST(SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice AS DECIMAL(12,2))
                       * (1 - CAST(l_discount AS DECIMAL(4,2))) END) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
  4) AS promo_pct
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""

ORACLES["grouping_sets_orders"] = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
ORDER BY status, priority
"""

ORACLES["join_left_outer_counts"] = """
SELECT
  c_custkey,
  c_mktsegment,
  COALESCE(o.order_count, 0) AS order_count,
  COALESCE(CAST(o.spent AS DOUBLE), 0.0) AS total_spent
FROM customer
LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS order_count,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spent
  FROM orders GROUP BY o_custkey
) o ON c_custkey = o.o_custkey
ORDER BY c_custkey
"""

ORACLES["join_semi_customers"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
)
ORDER BY c_custkey
"""

ORACLES["join_anti_customers"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""

ORACLES["join_broadcast_supplier_geo"] = """
SELECT s_suppkey, s_name, n_name, r_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
ORDER BY s_suppkey
"""

ORACLES["agg_orders_stats"] = """
SELECT
  o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS avg_total,
  MIN(o_totalprice) AS min_total,
  MAX(o_totalprice) AS max_total,
  COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLES["agg_rollup_status_priority"] = """
SELECT
  COALESCE(o_orderstatus, 'ALL') AS status,
  COALESCE(o_orderpriority, 'ALL') AS priority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""

ORACLES["window_topn_orders_per_customer"] = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, rn
"""

ORACLES["window_lag_sessionize"] = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       COUNT(DISTINCT session_id) AS n_sessions,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id
ORDER BY user_id NULLS FIRST
"""

# Native session_window twin. Spark merges an event into the open
# session when it arrives AT OR BEFORE last-event + gap (windows
# [t, t+gap] merge on single-point overlap — probed empirically: two
# events exactly 30:00 apart form ONE session, 30:01 two), so a new
# session starts only when the gap is STRICTLY greater — the same
# convention as window_lag_sessionize; session_end = MAX(ts) + gap =
# window.end. The differential fuzz (planted exact-gap events) caught
# the earlier >= form diverging.
ORACLES["session_window_events"] = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
         AS session_end,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM sessions
GROUP BY user_id, sid
ORDER BY user_id NULLS FIRST, session_start
"""

# Distribution-rank twin: identical (balance, custkey) sort key so the
# ntile/percent_rank/cume_dist values match row-for-row; sums of the
# rank columns make every row's value feed the hash without emitting
# 1500 rows.
ORACLES["window_distribution_ranks"] = """
WITH ranked AS (
  SELECT c_mktsegment, c_acctbal,
         NTILE(4)       OVER w AS quartile,
         PERCENT_RANK() OVER w AS pr,
         CUME_DIST()    OVER w AS cd
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment
               ORDER BY c_acctbal ASC, c_custkey ASC)
)
SELECT c_mktsegment, CAST(quartile AS INTEGER) AS quartile,
       COUNT(*) AS n,
       ROUND(SUM(pr), 6) AS sum_pr,
       ROUND(SUM(cd), 6) AS sum_cd,
       ROUND(MIN(c_acctbal), 2) AS min_bal,
       ROUND(MAX(c_acctbal), 2) AS max_bal
FROM ranked
GROUP BY c_mktsegment, quartile
ORDER BY c_mktsegment, quartile
"""

ORACLES["window_running_total"] = """
SELECT
  o_custkey,
  o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
         OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
FROM orders
ORDER BY o_custkey, o_orderkey
"""

ORACLES["topk_expensive_orders"] = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""

ORACLES["set_union_segments"] = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
UNION
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY c_custkey
"""

ORACLES["set_except_inactive"] = """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
ORDER BY c_custkey
"""

ORACLES["string_fns_documents"] = """
SELECT
  UPPER(lang) AS lang_uc,
  COUNT(*) AS n_docs,
  ROUND(CAST(SUM(LENGTH(text)) AS DOUBLE) / COUNT(*), 6) AS avg_chars,
  ROUND(CAST(SUM(CASE WHEN TRIM(text) = '' THEN 0
                      ELSE len(__TOKS(text)__) END) AS DOUBLE)
          / COUNT(*), 6) AS avg_tokens,
  MIN(n_chars) AS min_chars,
  MAX(n_chars) AS max_chars
FROM documents
GROUP BY UPPER(lang)
ORDER BY lang_uc
"""

ORACLES["date_fns_events"] = """
SELECT
  strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(14,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY day NULLS FIRST, event_type NULLS FIRST
"""

ORACLES["tumbling_window_events"] = """
SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type,
  COUNT(*) AS n_events
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
ORDER BY window_start, event_type NULLS FIRST
"""

# TRY_CAST, not CAST, and the avg denominator counts PARSED values:
# Spark's from_json NULLs a non-numeric k ("zz") and F.count("_k")
# excludes it, so a plain CAST would crash the oracle on malformed data
# and a COUNT of the raw string would inflate the denominator. (Quoted
# NUMERICS are a documented divergence: from_json rejects "7" where
# TRY_CAST coerces it — the fuzz plants only non-numeric malformed.)
ORACLES["json_fns_events"] = """
WITH typed AS (
  -- Mirror from_json's accept set over the raw JSON TOKEN
  -- (json_extract, NOT json_extract_string — the unquoting would make
  -- a quoted "12" indistinguishable from the number 12, which
  -- from_json with a bigint schema REJECTS). A JSON integer token is
  -- exactly '-?[0-9]+'; decimals ('1.5'), scientific ('1e2') and
  -- quoted strings ('"12"') all fail the gate, matching from_json's
  -- NULL. json_valid guards the DuckDB-aborts-on-invalid-JSON class.
  SELECT event_type,
         CASE WHEN json_valid(props) THEN
           CASE WHEN regexp_matches(
                       CAST(json_extract(props, '$.k') AS VARCHAR),
                       '^-?[0-9]+$')
                THEN TRY_CAST(
                       CAST(json_extract(props, '$.k') AS VARCHAR)
                       AS BIGINT) END
         END AS k
  FROM events
)
SELECT
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(k) AS BIGINT) AS sum_k,
  ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(k), 6) AS avg_k,
  MAX(k) AS max_k
FROM typed
GROUP BY event_type
ORDER BY event_type NULLS FIRST
"""

ORACLES["math_fns_lineitem"] = """
SELECT
  l_linestatus,
  ROUND(SQRT(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)), 6) AS sqrt_qty,
  ROUND(AVG(POW(CAST(l_discount AS DOUBLE), 2.0)), 6) AS avg_disc_sq,
  CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_disc,
  ROUND(ABS(MIN(l_extendedprice)), 2) AS abs_min_price
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
"""

ORACLES["array_fns_embeddings"] = """
SELECT
  label,
  COUNT(*) AS n_vecs,
  ROUND(AVG(CAST(embedding[1] AS DOUBLE)), 6) AS avg_first,
  ROUND(AVG(SQRT(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                         x -> x * x)))), 6) AS avg_norm
FROM embeddings
GROUP BY label
ORDER BY label
"""

ORACLES["dedup_exact_docs"] = """
SELECT doc_id, lang, source
FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
ORDER BY doc_id
"""

ORACLES["dedup_exact_summary"] = """
SELECT
  COUNT(*) AS n_rows,
  COUNT(DISTINCT text) AS n_distinct_texts,
  COUNT(*) - COUNT(DISTINCT text) AS n_duplicate_rows
FROM documents
"""

# Capped-universe twin: shingles with document frequency > 64 leave the
# universe (both the index and the set sizes) before pairing — the same
# hot-shingle cut the Spark query applies, so parity holds even when the
# cap is actually removing shingles.
ORACLES["neardup_jaccard_pairs"] = """
WITH toks AS (
  SELECT doc_id, __TOKS(text)__ AS t
  FROM documents
), __JACCARD_CTES(toks)__
SELECT p.id_a, p.id_b,
       ROUND(p.intersection / (sa.set_size + sb.set_size - p.intersection), 6)
         AS jaccard
FROM ipairs p
JOIN sizes sa ON p.id_a = sa.doc_id
JOIN sizes sb ON p.id_b = sb.doc_id
WHERE p.intersection / (sa.set_size + sb.set_size - p.intersection) >= 0.6
ORDER BY id_a, id_b
"""

# Connected components of the capped-universe Jaccard pair graph
# (same derivation as neardup_jaccard_pairs) via recursive label
# propagation: `reach` enumerates every (node, label) where label can
# reach node along pair edges; MIN(label) per node is then the smallest
# doc_id in the node's component — exactly the Spark operator's cluster
# id. Fine at oracle scale (few hundred nodes); the Spark side is the
# O(log n) large-star/small-star algorithm.
ORACLES["neardup_cluster_assign"] = """
WITH RECURSIVE toks AS (
  SELECT doc_id, __TOKS(text)__ AS t
  FROM documents
), __JACCARD_CTES(toks)__, __JPAIRS_CTE__, __CC_CTES(documents)__
SELECT c.doc_id, c.component, s.cluster_size
FROM comp c
JOIN (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component) s
  ON c.component = s.component
ORDER BY c.doc_id
"""

ORACLES["text_quality_profile"] = """
WITH base AS (
  -- NULL text normalizes to 0 tokens / 0 chars / [] on this side too,
  -- mirroring the Spark tokens()/COALESCE guards: un-normalized, NULL
  -- flowed into LEAST/GREATEST (which SKIP NULLs in DuckDB, unlike
  -- Spark's null-propagating least/greatest) and scored a NULL
  -- document quality=0.70 — above the repo's own keep threshold
  -- (round-10 review, confirmed divergence)
  SELECT doc_id,
         text,
         CASE WHEN text IS NULL OR TRIM(text) = '' THEN 0
              ELSE len(__TOKS(text)__) END AS n_tokens,
         COALESCE(len(regexp_extract_all(text, '\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s\\x0b\\p{Z}]')), 0) AS n_bpe_tokens,
         COALESCE(CAST(len(regexp_extract_all(text, '[^\\p{L}\\p{N}_\\s\\x0b\\p{Z}]')) AS DOUBLE), 0.0) AS n_punct,
         COALESCE(CAST(LENGTH(text) AS DOUBLE), 0.0) AS n_chars,
         CASE WHEN text IS NULL OR TRIM(text) = '' THEN []
              ELSE list_transform(__TOKS(LOWER(text))__, x -> x)
         END AS toks
  FROM documents
), scored AS (
  SELECT doc_id, n_tokens, n_bpe_tokens,
         CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio_raw,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_filter(toks,
                     t -> list_contains(['the','and','of','to','a','in','is','that','it','for'], t))) AS DOUBLE)
                   / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS stop_ratio_raw
  FROM base
)
SELECT doc_id, n_tokens, n_bpe_tokens,
       ROUND(punct_ratio_raw, 6) AS punct_ratio,
       ROUND(stop_ratio_raw, 6) AS stopword_ratio,
       ROUND(
         0.4 * (CASE WHEN n_tokens <= 0 THEN 0.0
                     ELSE LEAST(CAST(n_tokens AS DOUBLE) / 20.0, 1.0)
                          * LEAST(2000.0 / GREATEST(CAST(n_tokens AS DOUBLE), 1.0), 1.0) END)
         + 0.3 * (CASE WHEN n_tokens <= 0 THEN 0.0
                     ELSE 1.0 - LEAST(punct_ratio_raw * 4.0, 1.0) END)
         + 0.3 * LEAST(stop_ratio_raw * 5.0, 1.0), 6) AS quality
FROM scored
ORDER BY doc_id
"""

# TF-IDF twin: same lowercase whitespace tokenization, natural log,
# ROUND(·,6) scores, and ranking on the ROUNDED score with a term
# tie-break (the determinism rule). ROW_NUMBER is BIGINT in DuckDB →
# cast to match Spark's int rank.
ORACLES["tfidf_top_terms"] = """
WITH toks AS (
  SELECT doc_id,
         CASE WHEN TRIM(text) = '' THEN []
              ELSE __TOKS(LOWER(text))__ END AS t
  FROM documents WHERE text IS NOT NULL
), terms AS (
  SELECT doc_id, UNNEST(t) AS term FROM toks
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ROUND(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rnk
  FROM scored
)
SELECT doc_id, CAST(rnk AS INTEGER) AS rank, term, tf, df, tfidf
FROM ranked WHERE rnk <= 3
ORDER BY doc_id, rank
"""

# Bigram twin: non-distinct shingles (contrast the jaccard oracles'
# list_distinct), lowercase, with the "whole text as one shingle when
# shorter than the window" rule — an empty/whitespace doc contributes
# zero bigrams on both sides (the len(t)=0 branch yields [] here, and
# word_shingles' n==0 branch yields an empty array — the phantom ''
# shingle was deliberately removed; see word_shingles' docstring).
ORACLES["ngram_top_bigrams"] = """
WITH toks AS (
  SELECT CASE WHEN TRIM(text) = '' THEN []
              ELSE __TOKS(LOWER(text))__ END AS t
  FROM documents WHERE text IS NOT NULL
), grams AS (
  SELECT CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
              ELSE [array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))]
         END AS g
  FROM toks
), b AS (
  SELECT UNNEST(g) AS bigram FROM grams
)
SELECT bigram, COUNT(*) AS n
FROM b GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT 20
"""

ORACLES["sample_hash_stratified"] = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                          IN ('0', '1') THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sampled,
       ROUND(CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                                IN ('0', '1') THEN 1 ELSE 0 END) AS BIGINT)
             / COUNT(*), 6) AS sample_rate
FROM documents
GROUP BY lang
ORDER BY lang
"""

# PII twin: identical planted text, identical regexes (chosen to mean
# the same thing in Java regex and RE2), global replace ('g').
ORACLES["pii_redact_profile"] = """
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' AS t
  FROM documents
  WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER)
         AS n_emails,
       CAST(len(regexp_extract_all(t, '\\+?\\d(?:-?\\d){8,}')) AS INTEGER)
         AS n_phones,
       CAST(LENGTH(t) AS INTEGER) AS len_before,
       CAST(LENGTH(regexp_replace(regexp_replace(t,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
         '\\+?\\d(?:-?\\d){8,}', '[PHONE]', 'g')) AS INTEGER) AS len_after
FROM planted
ORDER BY doc_id
"""

# Blocked fuzzy-join twin: the SAME three staged blocking-key families
# (first token / (first, second token) escalation / salted minhash
# band), the SAME per-block size guards, the SAME prefix and metric.
# The band keys are deliberately engine-portable (md5 + substr produce
# identical strings in Spark and DuckDB) so candidate sets match
# exactly; family C carries the same residual excluding family-A pairs.
ORACLES["fuzzy_blocked_match"] = """
WITH b AS (
  -- COALESCE on BOTH token picks: Spark's regexp_extract returns ''
  -- (not NULL) when a tab-only text has no \\S token at all, and the
  -- list_filter mirror of the tokenizer leaves [] there
  SELECT doc_id,
         COALESCE(__TOKS(text)__[1], '') AS blk,
         COALESCE(__TOKS(text)__[2], '') AS tok2,
         substr(TRIM(text), 1, 40) AS pfx
  FROM documents
  WHERE text IS NOT NULL AND TRIM(text) != ''
), s AS (
  SELECT *, COUNT(*) OVER (PARTITION BY blk) AS bs0 FROM b
), fam_a AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, x.pfx AS px, y.pfx AS py
  FROM s x JOIN s y
    ON x.blk = y.blk AND x.doc_id < y.doc_id
  WHERE x.bs0 <= 1000
), hot AS (
  SELECT *, blk || '|' || tok2 AS k2 FROM s WHERE bs0 > 1000
), hot2 AS (
  SELECT *, COUNT(*) OVER (PARTITION BY k2) AS bs2 FROM hot
), fam_b AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, x.pfx AS px, y.pfx AS py
  FROM hot2 x JOIN hot2 y
    ON x.k2 = y.k2 AND x.doc_id < y.doc_id
  WHERE x.bs2 <= 1000 AND y.bs2 <= 1000
), banded AS (
  SELECT *,
         list_min(list_transform(
             range(1, GREATEST(LEN(pfx) - 4, 1) + 1),
             i -> md5('A' || substr(pfx, i, 5))))
         || '_'
         || list_min(list_transform(
             range(1, GREATEST(LEN(pfx) - 4, 1) + 1),
             i -> md5('B' || substr(pfx, i, 5)))) AS k3
  FROM s
), banded2 AS (
  SELECT *, COUNT(*) OVER (PARTITION BY k3) AS bs3 FROM banded
), fam_c AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, x.pfx AS px, y.pfx AS py
  FROM banded2 x JOIN banded2 y
    ON x.k3 = y.k3 AND x.doc_id < y.doc_id
  WHERE x.bs3 <= 1000 AND y.bs3 <= 1000
    AND (x.blk != y.blk OR x.bs0 > 1000)
), extras AS (
  SELECT DISTINCT * FROM (
    SELECT * FROM fam_b UNION ALL SELECT * FROM fam_c
  )
), cand AS (
  SELECT * FROM fam_a UNION ALL SELECT * FROM extras
)
SELECT id_a, id_b,
       CAST(levenshtein(px, py) AS INTEGER) AS distance
FROM cand
WHERE levenshtein(px, py) <= 10
ORDER BY id_a, id_b
"""

# Capstone pipeline twin: the whole corpus pipeline in one CTE chain —
# quality formula (text_quality_profile's), min-doc_id exact dedup,
# capped-universe Jaccard pairs over the SURVIVORS, recursive-CTE
# components, and representative = rows whose doc_id equals their
# component minimum.
ORACLES["pipeline_training_corpus"] = """
WITH RECURSIVE base AS (
  SELECT doc_id, text, lang,
         CASE WHEN TRIM(text) = '' THEN 0
              ELSE len(__TOKS(text)__) END AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^\\p{L}\\p{N}_\\s\\x0b\\p{Z}]')) AS DOUBLE) AS n_punct,
         CAST(LENGTH(text) AS DOUBLE) AS n_chars,
         CASE WHEN TRIM(text) = '' THEN []
              ELSE list_transform(__TOKS(LOWER(text))__,
                                  x -> x) END AS toks
  FROM documents
  WHERE text IS NOT NULL
), scored AS (
  SELECT doc_id, text, lang, n_tokens,
         ROUND(
           0.4 * (CASE WHEN n_tokens <= 0 THEN 0.0
                       ELSE LEAST(CAST(n_tokens AS DOUBLE) / 20.0, 1.0)
                            * LEAST(2000.0 / GREATEST(CAST(n_tokens AS DOUBLE),
                                                      1.0), 1.0) END)
           + 0.3 * (CASE WHEN n_tokens <= 0 THEN 0.0
                        ELSE 1.0 - LEAST((CASE WHEN n_chars > 0
                                          THEN n_punct / n_chars
                                          ELSE 0.0 END) * 4.0, 1.0) END)
           + 0.3 * LEAST((CASE WHEN len(toks) > 0
                               THEN CAST(len(list_filter(toks,
                                      t -> list_contains(['the','and','of','to',
                                        'a','in','is','that','it','for'], t)))
                                    AS DOUBLE) / CAST(len(toks) AS DOUBLE)
                               ELSE 0.0 END) * 5.0, 1.0), 6) AS quality
  FROM base
), kept AS (
  SELECT * FROM scored WHERE quality >= 0.7
), dedup AS (
  SELECT doc_id, text, lang, n_tokens, quality
  FROM (SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS _mk FROM kept)
  WHERE doc_id = _mk
), toks2 AS (
  SELECT doc_id, __TOKS(text)__ AS t FROM dedup
), __JACCARD_CTES(toks2)__, __JPAIRS_CTE__, __CC_CTES(dedup)__
SELECT d.doc_id, d.lang, d.n_tokens, d.quality
FROM dedup d
JOIN comp c ON d.doc_id = c.doc_id
WHERE c.doc_id = c.component
ORDER BY d.doc_id
"""

# Tie rule must match Spark's array_max over (hits, lang) structs: equal
# hit-counts prefer the lexicographically LARGEST language code.
ORACLES["lang_id_documents"] = """
WITH toks AS (
  SELECT doc_id, lang,
         CASE WHEN TRIM(text) = '' THEN []
              ELSE __TOKS(LOWER(text))__ END AS t
  FROM documents
), hits AS (
  SELECT doc_id, lang,
         len(list_filter(t, x -> list_contains(['the','and','of','to','a','in','is','that','it','for'], x))) AS h_en,
         len(list_filter(t, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','zu','auf'], x))) AS h_de,
         len(list_filter(t, x -> list_contains(['el','la','de','que','y','en','un','es','no','por'], x))) AS h_es,
         len(list_filter(t, x -> list_contains(['le','la','de','et','un','est','ne','pas','que','pour'], x))) AS h_fr
  FROM toks
)
SELECT doc_id, lang,
       CASE
         WHEN h_fr > 0 AND h_fr >= h_es AND h_fr >= h_en AND h_fr >= h_de THEN 'fr'
         WHEN h_es > 0 AND h_es >= h_en AND h_es >= h_de THEN 'es'
         WHEN h_en > 0 AND h_en >= h_de THEN 'en'
         WHEN h_de > 0 THEN 'de'
         ELSE 'und'
       END AS lang_pred
FROM hits
ORDER BY doc_id
"""

ORACLES["cosine_topk_embeddings"] = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2) AND embedding IS NOT NULL
), cand AS (
  -- NULL embeddings carry no position in the space: excluded on both
  -- engines (Spark's scorer no-matches them; DuckDB's
  -- list_dot_product ERRORS on a NULL list rather than skipping)
  SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL
), scored AS (
  SELECT q.query_id, e.vec_id,
         ROUND(
           list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
           / (GREATEST(SQRT(list_sum(list_transform(
                  CAST(e.embedding AS DOUBLE[]), x -> x * x))), 1e-12)
              * GREATEST(SQRT(list_sum(list_transform(
                  q.qv, x -> x * x))), 1e-12)), 9) AS c9
  FROM cand e CROSS JOIN q
), ranked AS (
  SELECT query_id, vec_id, c9,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c9 DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, ROUND(c9, 6) AS cosine, rn
FROM ranked
WHERE rn <= 5
ORDER BY query_id, rn
"""

ORACLES["sync_merge_orders"] = """
WITH target AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
  FROM orders WHERE o_orderkey % 5 <> 0
), staging AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         'SYNCED' AS o_orderpriority,
         CASE WHEN o_orderkey % 6 = 0 THEN 'delete' ELSE 'upsert' END AS update_type
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus, t.o_orderpriority
FROM target t
WHERE NOT EXISTS (SELECT 1 FROM staging s WHERE s.o_orderkey = t.o_orderkey)
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
FROM staging WHERE update_type <> 'delete'
ORDER BY o_orderkey
"""

ORACLES["multimodal_decode_profile"] = """
SELECT
  doc_id,
  CASE WHEN text IS NULL THEN 'none' ELSE 'fakm' END AS container,
  CAST(COALESCE(octet_length(encode(text)) % 64 + 1, -1) AS INTEGER) AS width,
  CAST(COALESCE(octet_length(encode(text)) % 48 + 1, -1) AS INTEGER) AS height,
  CAST(CASE WHEN text IS NULL THEN -1 ELSE 3 END AS INTEGER) AS channels,
  COALESCE(CAST((octet_length(encode(text)) % 64 + 1) AS BIGINT)
    * (octet_length(encode(text)) % 48 + 1), -1) AS n_pixels
FROM documents
ORDER BY doc_id
"""

ORACLES["neardup_embedding_cosine"] = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), n AS (
  SELECT vec_id, v, SQRT(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
), scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 9) AS c9
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, ROUND(c9, 6) AS cosine
FROM scored
WHERE c9 >= 0.4
ORDER BY id_a, id_b
"""

# Profile twin: one UNION ALL branch per column (DuckDB may scan per
# branch — the single-scan property is the Spark side's plan shape, the
# oracle only has to agree on values). Profiled as DOUBLE both sides.
ORACLES["profile_lineitem_columns"] = """
WITH src AS (
  SELECT CAST(l_quantity AS DOUBLE) AS q,
         CAST(l_extendedprice AS DOUBLE) AS ep,
         CAST(l_discount AS DOUBLE) AS d,
         CAST(l_tax AS DOUBLE) AS t
  FROM lineitem
)
SELECT 'l_quantity' AS col_name, COUNT(*) AS n_rows, COUNT(q) AS n_nonnull,
       COUNT(*) - COUNT(q) AS n_null, COUNT(DISTINCT q) AS n_distinct,
       ROUND(MIN(q), 6) AS min_val, ROUND(MAX(q), 6) AS max_val,
       ROUND(AVG(q), 6) AS avg_val
FROM src
UNION ALL
SELECT 'l_extendedprice', COUNT(*), COUNT(ep), COUNT(*) - COUNT(ep),
       COUNT(DISTINCT ep), ROUND(MIN(ep), 6), ROUND(MAX(ep), 6),
       ROUND(AVG(ep), 6)
FROM src
UNION ALL
SELECT 'l_discount', COUNT(*), COUNT(d), COUNT(*) - COUNT(d),
       COUNT(DISTINCT d), ROUND(MIN(d), 6), ROUND(MAX(d), 6),
       ROUND(AVG(d), 6)
FROM src
UNION ALL
SELECT 'l_tax', COUNT(*), COUNT(t), COUNT(*) - COUNT(t),
       COUNT(DISTINCT t), ROUND(MIN(t), 6), ROUND(MAX(t), 6),
       ROUND(AVG(t), 6)
FROM src
ORDER BY col_name
"""

# Semantic-dedup twin: the exact all-pairs cosine CTE from
# neardup_embedding_cosine (same round-9-then-threshold decision rule)
# feeding the same recursive-CTE min-label propagation used by
# neardup_cluster_assign. Spark's component ids are longs.
ORACLES["semantic_cluster_assign"] = """
WITH RECURSIVE e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), n AS (
  SELECT vec_id, v, SQRT(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
), jpairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM n a JOIN n b ON a.vec_id < b.vec_id
  WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 9) >= 0.4
), edges AS (
  SELECT id_a AS a, id_b AS b FROM jpairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM jpairs
), reach(node, lbl) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
), comp AS (
  SELECT node AS vec_id, MIN(lbl) AS component FROM reach GROUP BY node
)
SELECT c.vec_id, CAST(c.component AS BIGINT) AS component, s.cluster_size
FROM comp c
JOIN (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component) s
  ON c.component = s.component
ORDER BY c.vec_id
"""

ORACLES["asof_last_error_before_click"] = """
WITH errors_dedup AS (
  SELECT user_id, ts AS err_ts, event_id, value
  FROM events
  WHERE event_type = 'error' AND ts IS NOT NULL
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
), clicks AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'click' AND ts IS NOT NULL
)
SELECT c.event_id,
       c.user_id,
       COALESCE(e.event_id, -1) AS err_event_id,
       COALESCE(ROUND(e.value, 6), -1.0) AS err_value
FROM clicks c
ASOF LEFT JOIN errors_dedup e
  ON c.user_id = e.user_id AND e.err_ts <= c.ts
ORDER BY c.event_id
"""

ORACLES["set_intersect_buyers"] = """
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '5-LOW'
ORDER BY c_custkey
"""

ORACLES["agg_cube_segment_status"] = """
SELECT
  COALESCE(c_mktsegment, 'ALL') AS segment,
  COALESCE(o_orderstatus, 'ALL') AS status,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, o_orderstatus)
ORDER BY segment, status
"""

# Map-functions twin: DuckDB has no map-over-JSON, but every map op in
# the query reduces to JSON introspection (json_extract for element_at,
# json_keys for map_keys/size), so the twin checks real values.
# VARIANT twin: DuckDB extracts from the JSON text directly — the
# VARIANT type is a storage/execution choice, the values must agree.
ORACLES["variant_fns_events"] = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
         AS sum_k,
       CAST(MIN(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER)
         AS min_k,
       CAST(MAX(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER)
         AS max_k,
       CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM events
GROUP BY event_type
ORDER BY event_type NULLS FIRST
"""

# TRY_CAST so a malformed k can't crash the oracle. Known asymmetry
# kept OUT of this corpus: Spark's from_json(map<string,bigint>) NULLs
# the WHOLE map when any value fails conversion, while per-key
# TRY_CAST only NULLs that key — the malformed-props fuzz therefore
# targets try_cast_typed_backfill (get_json_object path), never the
# map query.
ORACLES["map_fns_events"] = """
WITH valid AS (
  -- json_valid guard: json_extract/json_keys ABORT on invalid JSON
  -- where from_json yields a NULL map (then the sentinels apply).
  -- The json_type = 'OBJECT' gate closes the valid-but-non-object
  -- class ('[1,2]', '7'): Spark's from_json(map<...>) yields a NULL
  -- map there (sentinels -1/'') while json_keys would yield []
  -- (0/'') — NULL both sides so the sentinels agree. NESTED CASE, not
  -- AND: DuckDB's adaptive conjunction reordering may evaluate
  -- json_type first, aborting on the invalid JSON the json_valid
  -- guard exists to screen (reproduced at ~200k rows).
  SELECT event_id,
         CASE WHEN json_valid(props)
              THEN CASE WHEN json_type(props) = 'OBJECT'
                        THEN props END
              END AS props
  FROM events
)
SELECT
  event_id,
  COALESCE(TRY_CAST(json_extract(props, '$.k') AS BIGINT), -1) AS k_val,
  COALESCE(array_to_string(list_sort(json_keys(props)), ','), '') AS prop_keys,
  COALESCE(CAST(len(json_keys(props)) AS INTEGER), -1) AS n_props,
  COALESCE(TRY_CAST(json_extract(props, '$.k') AS BIGINT) * 2, -1) AS k_doubled
FROM valid
ORDER BY event_id
"""

# PIVOT twin: conditional aggregation (COUNT FILTER yields BIGINT,
# matching Spark's long without the HUGEINT cast dance).
ORACLES["pivot_status_by_priority"] = """
SELECT
  o_orderstatus,
  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
  COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_high,
  COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_medium,
  COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
  COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

ORACLES["unpivot_lineitem_metrics"] = """
WITH wide AS (
  SELECT l_linestatus,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
    CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc
  FROM lineitem GROUP BY l_linestatus
)
SELECT l_linestatus, 'sum_qty' AS metric, ROUND(sum_qty, 2) AS value FROM wide
UNION ALL
SELECT l_linestatus, 'sum_price', ROUND(sum_price, 2) FROM wide
UNION ALL
SELECT l_linestatus, 'sum_disc', ROUND(sum_disc, 2) FROM wide
ORDER BY l_linestatus, metric
"""

# Exact interpolated percentiles: Spark's percentile() and DuckDB's
# quantile_cont share the p*(n-1) linear-interpolation definition.
ORACLES["agg_percentiles_orders"] = """
SELECT
  o_orderstatus,
  ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5), 6) AS p50,
  ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9), 6) AS p90,
  COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

# Salted two-phase aggregation must equal the plain GROUP BY — that IS
# the check.
ORACLES["agg_salted_user_events"] = """
SELECT
  user_id,
  COUNT(value) AS n_events,
  ROUND(SUM(CAST(value AS DOUBLE)), 6) AS sum_value,
  ROUND(MAX(CAST(value AS DOUBLE)), 6) AS max_value
FROM events
GROUP BY user_id
ORDER BY user_id NULLS FIRST
"""

# UDAF twin: geometric mean as EXP(AVG(LN(x))), rounded to 4 so
# summation-order ulp noise cannot flip the hash.
ORACLES["udaf_geomean_orders"] = """
SELECT
  o_orderstatus,
  ROUND(EXP(AVG(LN(CAST(o_totalprice AS DOUBLE)))), 4) AS geomean_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""

# UDTF twin: overlapping token windows via generate_series starts;
# same trim + \s+ tokenization as the UDTF, chunk_index = start/stride.
ORACLES["udtf_chunk_documents"] = """
WITH toks AS (
  SELECT doc_id, __TOKS(text)__ AS t FROM documents
),
starts AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t), 24)) AS s FROM toks
)
SELECT doc_id,
       CAST((s - 1) / 24 AS INTEGER) AS chunk_index,
       array_to_string(list_slice(t, s, least(s + 31, len(t))), ' ')
         AS chunk_text,
       CAST(least(s + 31, len(t)) - s + 1 AS INTEGER) AS n_tokens
FROM starts
ORDER BY doc_id, chunk_index
"""

# Real-WAV multimodal twin: the Spark side encodes text to PCM WAV and
# chunk-walks it back; the oracle recomputes the same metadata from
# octet_length with the query's deterministic parameter derivation
# (channels = L%2+1, rate = 8000 + (L%100)*10, payload zero-padded to a
# block-align multiple, integer-floor duration).
ORACLES["multimodal_audio_profile"] = """
WITH b AS (
  SELECT doc_id, octet_length(encode(text)) AS L FROM documents
),
c AS (
  SELECT doc_id, L,
         L % 2 + 1 AS ch,
         8000 + (L % 100) * 10 AS sr,
         2 * (L % 2 + 1) AS blk
  FROM b
)
SELECT doc_id,
       CASE WHEN L IS NULL THEN 'none' ELSE 'riff' END AS container,
       CAST(COALESCE(sr, -1) AS INTEGER) AS sample_rate,
       CAST(COALESCE(ch, -1) AS INTEGER) AS channels,
       CAST(CASE WHEN L IS NULL THEN -1 ELSE 16 END AS INTEGER)
         AS bits_per_sample,
       CAST(COALESCE((L + ((blk - L % blk) % blk)) // blk, -1) AS BIGINT)
         AS n_frames,
       CAST(COALESCE(((L + ((blk - L % blk) % blk)) // blk) * 1000 // sr, -1)
         AS BIGINT) AS duration_ms
FROM c
ORDER BY doc_id
"""

# Real-PNG multimodal twin: the Spark side encodes a deterministic
# (x+y+c) gradient to PNG (mixed scanline filters) and decodes it back;
# the oracle recomputes the metadata AND the exact integer pixel sum
# from octet_length: with w = L%32+1 <= 32, h = L%24+1 <= 24, ch = 3,
# every sample x+y+c < 256, so
#   pixel_sum = ch*h*(w(w-1)/2) + ch*w*(h(h-1)/2) + w*h*(0+1+2).
ORACLES["multimodal_image_profile"] = """
WITH b AS (
  SELECT doc_id, octet_length(encode(text)) AS L FROM documents
),
c AS (
  SELECT doc_id, L, L % 32 + 1 AS w, L % 24 + 1 AS h FROM b
)
SELECT doc_id,
       CASE WHEN L IS NULL THEN 'none' ELSE 'png' END AS container,
       CAST(COALESCE(w, -1) AS INTEGER) AS width,
       CAST(COALESCE(h, -1) AS INTEGER) AS height,
       CAST(CASE WHEN L IS NULL THEN -1 ELSE 3 END AS INTEGER) AS channels,
       CAST(COALESCE(w * h, -1) AS BIGINT) AS n_pixels,
       CAST(COALESCE(
         3 * h * (w * (w - 1) // 2) + 3 * w * (h * (h - 1) // 2) + 3 * w * h,
         -1) AS BIGINT) AS pixel_sum,
       CAST(COALESCE(w * h * 3, -1) AS BIGINT) AS n_bytes
FROM c
ORDER BY doc_id
"""

# Int16-PCM feature twin: rebuild every sample with character
# arithmetic. After the printable-ASCII sanitize, byte == character on
# both engines; samples are little-endian pairs (lo + 256*hi), sign
# convention u >= 32768 → u - 65536, odd-length payloads zero-padded.
ORACLES["multimodal_audio_features"] = """
WITH clean AS (
  SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t
  FROM documents WHERE text IS NOT NULL
), dims AS (
  SELECT doc_id, t, length(t) AS n,
         (length(t) + (length(t) % 2)) // 2 AS ns
  FROM clean
), samples AS (
  -- hi byte = raw byte (0 past end), sign bit flipped on every other
  -- sample (byte position 2i with 2i % 4 = 2) — XOR 0x80 equals +128
  -- here because ASCII bytes and pad are < 128
  SELECT doc_id, ns,
         [CASE WHEN u >= 32768 THEN u - 65536 ELSE u END
          FOR u IN [ascii(substr(t, 2*i - 1, 1))
                    + 256 * ((CASE WHEN 2*i > n THEN 0
                                   ELSE ascii(substr(t, 2*i, 1)) END)
                             + (CASE WHEN (2*i) % 4 = 2 THEN 128
                                     ELSE 0 END))
                    FOR i IN range(1, ns + 1)]] AS s
  FROM dims
)
SELECT doc_id,
       CAST(ns AS INTEGER) AS n_samples,
       CAST(COALESCE(list_sum(list_transform(s,
              x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))), 0) AS BIGINT)
         AS sum_sq,
       CAST(COALESCE(list_sum([CASE WHEN s[i] * s[i+1] < 0 THEN 1 ELSE 0 END
                               FOR i IN range(1, len(s))]), 0) AS BIGINT)
         AS zero_crossings,
       CAST(COALESCE(list_max(list_transform(s, x -> abs(x))), 0) AS INTEGER)
         AS peak
FROM samples
ORDER BY doc_id
"""

# Video twin: every derived quantity (dimensions, frame count, rate,
# sampled-frame pixel sums) has a closed integer form in
# L = octet_length(text). Sampled frames are i = 0, 2, …, 2(ns-1) with
# ns = (nf+1)//2; per-frame pixel sum of the (x+y+c+i) gradient is
# base + 3*w*h*i, so the sampled total is ns*base + 3*w*h*ns*(ns-1).
# NULL text → NULL blob → 'none'/-1 sentinels, matching the Spark side.
ORACLES["multimodal_video_profile"] = """
WITH b AS (
  SELECT doc_id, octet_length(encode(text)) AS L FROM documents
),
c AS (
  SELECT doc_id, L,
         L % 16 + 1 AS w, L % 12 + 1 AS h,
         L % 5 + 1 AS nf, L % 24 + 1 AS rate
  FROM b
),
d AS (
  SELECT *,
         (nf + 1) // 2 AS ns,
         3 * (h * (w * (w - 1) // 2) + w * (h * (h - 1) // 2)) + 3 * w * h
           AS base
  FROM c
)
SELECT doc_id,
       CASE WHEN L IS NULL THEN 'none' ELSE 'riff' END AS container,
       CAST(COALESCE(w, -1) AS INTEGER) AS width,
       CAST(COALESCE(h, -1) AS INTEGER) AS height,
       CAST(COALESCE(nf, -1) AS INTEGER) AS n_frames,
       CAST(COALESCE(rate, -1) AS INTEGER) AS rate,
       CAST(COALESCE(nf * 1000 // rate, -1) AS BIGINT) AS duration_ms,
       CAST(COALESCE(ns, -1) AS BIGINT) AS n_sampled,
       CAST(COALESCE(ns * base + 3 * w * h * ns * (ns - 1), -1) AS BIGINT)
         AS sampled_pixel_sum
FROM d
ORDER BY doc_id
"""

# Bounded interval join twin: plain key join + BETWEEN range predicate
# (DuckDB's planner handles the small scale; the Spark side buckets —
# same result, different physical strategy). COUNT is BIGINT in DuckDB,
# matching Spark's long without a cast.
ORACLES["range_join_error_context"] = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
errors AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'error'
),
ctx AS (
  SELECT c.event_id,
         COUNT(*) AS n,
         ROUND(MAX(e.value), 6) AS mx
  FROM clicks c
  JOIN errors e
    ON c.user_id = e.user_id
   AND e.ts BETWEEN c.ts - INTERVAL 300 SECOND AND c.ts
  GROUP BY c.event_id
)
SELECT c.event_id,
       c.user_id,
       COALESCE(ctx.n, 0) AS n_errors,
       COALESCE(ctx.mx, -1.0) AS max_err_value
FROM clicks c
LEFT JOIN ctx ON c.event_id = ctx.event_id
ORDER BY c.event_id
"""

# Winnowing fingerprint twin: same tokenization (trim + \s+ split), same
# "whole text as one shingle when shorter than the window" rule, same
# md5-hex hash family and smallest-4 selection as
# ``functions/text.py::rolling_fingerprint_md5``; exploded to scalar
# (doc_id, pos, fp_hash) rows with 1-based pos.
ORACLES["fingerprint_documents"] = """
WITH toks AS (
  SELECT doc_id, __TOKS(text)__ AS t
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
              ELSE list_transform(
                     generate_series(1, len(t) - 7),
                     i -> array_to_string(list_slice(t, i, i + 7), ' '))
         END AS shingles
  FROM toks
),
fp AS (
  SELECT doc_id,
         list_slice(list_sort(list_transform(shingles, s -> md5(s))), 1, 4) AS f
  FROM sh
)
SELECT fp.doc_id,
       CAST(r.i AS INTEGER) AS pos,
       fp.f[CAST(r.i AS INTEGER)] AS fp_hash
FROM fp, (SELECT unnest(generate_series(1, 4)) AS i) r
WHERE r.i <= len(fp.f)
ORDER BY doc_id, pos
"""

# ExactSubstr span dedup (Lee et al. 2022 shape): positional 8-gram
# shingles → cross-doc dup flag (min≠max doc over the shingle hash) →
# gaps-and-islands merge into maximal spans → per-doc profile. The md5
# hash family and the 1-based list_slice bounds mirror
# ``operators/dedup.py::duplicated_spans(hash_family='md5')`` exactly;
# generate_series yields start i in 1..len-7 ⇒ pos = i-1 in 0..len-8,
# the same 0-based positions Spark's posexplode emits.
ORACLES["dedup_substring_spans"] = """
WITH base AS (
  SELECT doc_id, __TOKS(text)__ AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, g.i - 1 AS pos,
         md5(array_to_string(list_slice(toks, g.i, g.i + 7), ' ')) AS h
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(toks) - 7)) AS i) g
  WHERE len(toks) >= 8
),
flg AS (
  SELECT doc_id, pos,
         MIN(doc_id) OVER (PARTITION BY h)
           <> MAX(doc_id) OVER (PARTITION BY h) AS dup
  FROM sh
),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN MAX(pos + 8) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR pos > MAX(pos + 8) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_isl
  FROM flg WHERE dup
),
isl2 AS (
  SELECT doc_id, pos,
         SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 8 AS e
  FROM isl2 GROUP BY doc_id, island
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(e - s) AS BIGINT) AS dup_tokens,
       CAST(MAX(e - s) AS BIGINT) AS max_span_tokens
FROM spans
GROUP BY doc_id
ORDER BY doc_id
"""

# Ensemble quality + token-budget selection twin: the quality formula is
# text_quality_profile's verbatim; the repetition leg is
# len(list_distinct)/len; 20 fixed score bins, cumulative token budget
# from the top bin down, selected while cum <= 50% of corpus tokens.
ORACLES["quality_ensemble_buckets"] = """
WITH base AS (
  SELECT doc_id,
         CASE WHEN TRIM(text) = '' THEN 0
              ELSE len(__TOKS(text)__) END AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^\\p{L}\\p{N}_\\s\\x0b\\p{Z}]')) AS DOUBLE) AS n_punct,
         CAST(LENGTH(text) AS DOUBLE) AS n_chars,
         CASE WHEN TRIM(text) = '' THEN []
              ELSE __TOKS(LOWER(text))__ END AS ltoks,
         CASE WHEN TRIM(text) = '' THEN []
              ELSE __TOKS(text)__ END AS toks
  FROM documents
  WHERE text IS NOT NULL
), scored AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS pr,
         CASE WHEN len(ltoks) > 0
              THEN CAST(len(list_filter(ltoks,
                     t -> list_contains(['the','and','of','to','a','in','is','that','it','for'], t))) AS DOUBLE)
                   / CAST(len(ltoks) AS DOUBLE)
              ELSE 0.0 END AS sr,
         len(list_distinct(toks)) AS n_distinct
  FROM base
), ens AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         ROUND(
           0.6 * ROUND(
             0.4 * (CASE WHEN n_tokens <= 0 THEN 0.0
                         ELSE LEAST(CAST(n_tokens AS DOUBLE) / 20.0, 1.0)
                              * LEAST(2000.0 / GREATEST(CAST(n_tokens AS DOUBLE), 1.0), 1.0) END)
             + 0.3 * (CASE WHEN n_tokens <= 0 THEN 0.0
                          ELSE 1.0 - LEAST(pr * 4.0, 1.0) END)
             + 0.3 * LEAST(sr * 5.0, 1.0), 6)
           + 0.4 * (CAST(n_distinct AS DOUBLE) / GREATEST(n_tokens, 1)),
           6) AS ensemble
  FROM scored
), hist AS (
  SELECT CAST(LEAST(FLOOR(ensemble * 20), 19) AS INTEGER) AS score_bin,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         ROUND(SUM(CAST(ROUND(ensemble * 1000000) AS BIGINT))
               / (COUNT(*) * 1000000.0), 6) AS avg_ensemble,
         CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
  FROM ens GROUP BY 1
), cum AS (
  SELECT *,
         CAST(SUM(sum_tokens) OVER (ORDER BY score_bin DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_tokens,
         (SELECT SUM(n_tokens) FROM ens) AS total_tokens
  FROM hist
)
SELECT score_bin, n_docs, avg_ensemble, sum_tokens, cum_tokens,
       cum_tokens <= 0.5 * total_tokens AS selected
FROM cum
ORDER BY score_bin DESC
"""

# Cross-batch novelty twin: identical keep-first-within-batch +
# history anti-join semantics; DuckDB anti-joins on the raw text (same
# accept set as the 256-bit hash modulo ~2^-128 collisions).
ORACLES["dedup_cross_batch_novelty"] = """
WITH hist AS (
  SELECT DISTINCT text FROM documents
  WHERE doc_id % 3 = 0 AND text IS NOT NULL
),
batch AS (
  SELECT doc_id, source, text,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM documents WHERE text IS NOT NULL
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_novel,
       MIN(doc_id) AS first_novel_id
FROM batch
WHERE rn = 1 AND text NOT IN (SELECT text FROM hist)
GROUP BY source
ORDER BY source
"""

# Canonical-head dedup twin: same normalization chain (lowercase →
# strip [^\w\s] → collapse \s+ → trim) over the 80-char prefix; DuckDB
# groups on the canonical string itself (same accept set as Spark's
# sha2 key modulo ~2^-128 collisions).
ORACLES["dedup_canonical_docs"] = """
WITH c AS (
  SELECT doc_id,
         TRIM(regexp_replace(regexp_replace(
             LOWER(substr(text, 1, 80)), '[^\\p{L}\\p{N}\\s\\x0b\\p{Z}_]', '', 'g'),
             '[\\s\\x0b\\p{Z}]+', ' ', 'g')) AS canon
  FROM documents
)
SELECT MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM c
WHERE canon <> ''
GROUP BY canon
HAVING COUNT(*) > 1
ORDER BY keep_id
"""

# Ordered-set aggregates: DuckDB string_agg supports an ORDER BY inside
# the aggregate (same ANSI listagg semantics); deterministic mode is
# spelled explicitly as count + row_number (most frequent, lowest value
# on frequency ties) — the exact rule Spark's mode(col, true) applies.
ORACLES["agg_listagg_mode_orders"] = """
WITH freq AS (
  -- NULLs are not mode candidates: Spark's mode(col, true) skips them,
  -- so a status whose priorities are [NULL, NULL, '5-LOW'] must pick
  -- '5-LOW', never the NULL group (round-10 review, confirmed
  -- divergence)
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders WHERE o_orderpriority IS NOT NULL
  GROUP BY o_orderstatus, o_orderpriority
), m AS (
  SELECT o_orderstatus, o_orderpriority AS top_priority
  FROM (
    SELECT o_orderstatus, o_orderpriority,
           ROW_NUMBER() OVER (
             PARTITION BY o_orderstatus
             ORDER BY n DESC, o_orderpriority
           ) AS rn
    FROM freq
  ) WHERE rn = 1
)
SELECT
  o.o_orderstatus,
  string_agg(DISTINCT o.o_orderpriority, '|' ORDER BY o.o_orderpriority)
    AS priorities,
  -- LEFT + null-safe key: an all-NULL-priority status group (or a NULL
  -- status group) still emits a row with NULL top_priority, matching
  -- Spark's groupBy-over-everything shape
  MIN(m.top_priority) AS top_priority,
  COUNT(*) AS n_orders
FROM orders o
LEFT JOIN m ON o.o_orderstatus IS NOT DISTINCT FROM m.o_orderstatus
GROUP BY o.o_orderstatus
ORDER BY o.o_orderstatus
"""

# LATERAL correlated top-n: DuckDB executes the lateral directly; the
# Spark side decorrelates the same SQL into a window top-n.
ORACLES["lateral_topn_per_group"] = """
SELECT c.c_custkey, t.o_orderkey, t.price, t.rnk
FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 9900.0
) c,
LATERAL (
  SELECT o_orderkey,
         ROUND(CAST(o_totalprice AS DOUBLE), 2) AS price,
         ROW_NUMBER() OVER (
           ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey
         ) AS rnk
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey
  LIMIT 2
) t
ORDER BY c.c_custkey, t.rnk
"""

# Interval coalescing: the union-of-intervals rule spelled identically —
# a new island starts only when start strictly exceeds the running max
# end over all PRIOR rows. Exact epoch-micro bigints throughout.
ORACLES["interval_coalesce_events"] = """
WITH ev AS (
  SELECT user_id, event_id,
         epoch_us(ts) AS start_us,
         epoch_us(ts) + 300000000 AS end_us
  FROM events WHERE ts IS NOT NULL
), flagged AS (
  SELECT user_id, start_us, end_us,
         CASE WHEN MAX(end_us) OVER (
                PARTITION BY user_id ORDER BY start_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ) IS NULL
              OR start_us > MAX(end_us) OVER (
                PARTITION BY user_id ORDER BY start_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              )
         THEN 1 ELSE 0 END AS new_island,
         event_id
  FROM ev
), islands AS (
  SELECT user_id,
         SUM(new_island) OVER (
           PARTITION BY user_id ORDER BY start_us, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS island_id,
         start_us, end_us
  FROM flagged
), per_island AS (
  SELECT user_id, island_id,
         MIN(start_us) AS i_start, MAX(end_us) AS i_end,
         COUNT(*) AS i_events
  FROM islands GROUP BY user_id, island_id
)
SELECT user_id,
       COUNT(*) AS n_islands,
       CAST(SUM(i_end - i_start) AS BIGINT) AS covered_us,
       MAX(i_events) AS max_island_events
FROM per_island
GROUP BY user_id
ORDER BY user_id NULLS FIRST
"""

# Time-weighted average as exact integer numerator/denominator; NULL
# values weigh zero (COALESCE before the multiply), the open-ended last
# reading per user is excluded by the lead() IS NOT NULL filter.
ORACLES["twap_events"] = """
WITH ev AS (
  SELECT user_id, event_id,
         epoch_us(ts) AS start_us,
         COALESCE(CAST(ROUND(value * 100) AS BIGINT), 0) AS cents
  FROM events WHERE ts IS NOT NULL
), seg AS (
  SELECT user_id, cents,
         LEAD(start_us) OVER (
           PARTITION BY user_id ORDER BY start_us, event_id
         ) - start_us AS dt_us
  FROM ev
)
SELECT user_id,
       COUNT(*) AS n_segments,
       CAST(SUM(dt_us) AS BIGINT) AS active_us,
       CAST(SUM(cents * dt_us) AS BIGINT) AS weighted_cents_us
FROM seg WHERE dt_us IS NOT NULL
GROUP BY user_id
ORDER BY user_id NULLS FIRST
"""

# Run-length (SCD-2) compression with the null-safe change predicate:
# IS DISTINCT FROM treats NULL event_type as a value, exactly like
# Spark's eqNullSafe negation.
ORACLES["scd2_event_type_runs"] = """
WITH flagged AS (
  SELECT user_id, event_type,
         CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS change,
         ts, event_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
), runs_src AS (
  SELECT user_id, event_type,
         SUM(change) OVER (
           PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS run_id
  FROM flagged
), runs AS (
  SELECT user_id, run_id, event_type, COUNT(*) AS run_len
  FROM runs_src GROUP BY user_id, run_id, event_type
)
SELECT user_id, event_type,
       COUNT(*) AS n_runs,
       MAX(run_len) AS max_run_len,
       CAST(SUM(run_len) AS BIGINT) AS total_events
FROM runs
GROUP BY user_id, event_type
ORDER BY user_id NULLS FIRST, event_type NULLS FIRST
"""

# $500 bins on exact integer cents; integer division only (never float
# width math). All SUMs cast back to BIGINT (the HUGEINT rule).
ORACLES["histogram_orders_prices"] = """
WITH c AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT cents // 50000 AS bin,
       COUNT(*) AS n_orders,
       MIN(cents) AS min_cents,
       MAX(cents) AS max_cents,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM c
GROUP BY bin
ORDER BY bin NULLS FIRST
"""

# First-event exclusion via the lagged EVENT ID (never the lagged type:
# NULL prev_type is ambiguous between "no predecessor" and "predecessor
# with NULL type"); NULL event_type is a real state on both sides.
ORACLES["markov_transitions_events"] = """
WITH seq AS (
  SELECT user_id, event_type AS cur_type,
         LAG(event_type) OVER w AS prev_type,
         LAG(event_id) OVER w AS prev_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
)
SELECT prev_type, cur_type,
       COUNT(*) AS n_transitions,
       COUNT(DISTINCT user_id) AS n_users
FROM seq
WHERE prev_id IS NOT NULL
GROUP BY prev_type, cur_type
ORDER BY prev_type NULLS FIRST, cur_type NULLS FIRST
"""

# RANK (ties kept) on exact integer cents; rnk cast to INTEGER to match
# Spark's rank() type, like the row_number queries.
ORACLES["rank_ties_topn_priority"] = """
SELECT o_orderpriority, o_orderkey, cents, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT o_orderpriority, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         RANK() OVER (
           PARTITION BY o_orderpriority
           ORDER BY CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT) DESC NULLS LAST
         ) AS rnk
  FROM orders
)
WHERE rnk <= 3
ORDER BY o_orderpriority, rnk, o_orderkey
"""

# First significant digit of the exact cents integer via its decimal
# string — never floor(log10) float math.
ORACLES["benford_first_digit_prices"] = """
WITH c AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT CAST(SUBSTR(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
       COUNT(*) AS n_orders,
       MIN(cents) AS min_cents,
       MAX(cents) AS max_cents
FROM c
WHERE cents > 0
GROUP BY digit
ORDER BY digit
"""

# Per-source quota: at most 3 docs, longest first, doc_id tie-break.
ORACLES["domain_quota_topn"] = """
SELECT source, doc_id, n_chars, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY n_chars DESC NULLS LAST, doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= 3
ORDER BY source NULLS FIRST, rn
"""

# Latest change per key: row_number DESC = 1; timestamp-less changes
# carry no position; ts ties break by event_id DESC.
ORACLES["cdc_latest_per_key"] = """
WITH ranked AS (
  SELECT user_id, event_id, event_type, ts, value,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
  WHERE ts IS NOT NULL
)
SELECT user_id,
       event_id AS last_event_id,
       event_type AS last_type,
       CAST(ROUND(value * 100) AS BIGINT) AS last_value_cents,
       epoch_us(ts) AS last_ts_us
FROM ranked
WHERE rn = 1
ORDER BY user_id NULLS FIRST
"""

# QUALIFY-style window filter: running per-customer spend cut at a
# budget cap. DuckDB SUM(BIGINT) OVER widens to HUGEINT — cast back.
ORACLES["qualify_running_budget_cut"] = """
SELECT o_custkey, o_orderkey, cents, CAST(cum AS BIGINT) AS cum_cents
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate NULLS FIRST, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM orders
)
WHERE cum <= 30000000
ORDER BY o_custkey NULLS FIRST, o_orderkey
"""

# GROUPING SETS with the grouping id surfaced; GROUPING() uses the same
# leftmost-arg-is-MSB encoding as Spark's grouping_id().
ORACLES["grouping_id_sales_matrix"] = """
SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
       o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""

# HOF chain: floor-quantized milliunits, sorted DESC (Spark reverses an
# asc-NULLS-LAST sort, so DESC NULLS FIRST), top-8 slice, exact sums.
# list_sum of BIGINTs widens to HUGEINT — cast; empty slice sums NULL on
# both sides (Spark guards with size>0, DuckDB list_sum([]) is NULL).
# Finite-elements-only, mirroring the Spark side's F.filter: NULL
# elements NULL-propagate Spark's aggregate fold where list_sum skips
# them, and NaN/inf ABORT this CAST(... AS BIGINT) where Spark's
# non-ANSI cast quietly maps them — filtering identically on both
# sides is the only portable semantics.
ORACLES["array_topk_quantized_embeddings"] = """
WITH q AS (
  SELECT vec_id,
         list_slice(
           list_sort(
             list_transform(
               list_filter(embedding,
                           x -> x IS NOT NULL AND isfinite(CAST(x AS DOUBLE))),
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
             'DESC', 'NULLS FIRST'),
           1, 8) AS t
  FROM embeddings
)
SELECT vec_id,
       CAST(list_sum(t) AS BIGINT) AS top8_sum,
       t[1] AS top1,
       t[8] AS top8
FROM q
ORDER BY vec_id
"""

# map_zip_with merge twin: the map machinery reduces to conditional
# counts per (user, event_type); the batch split is event_id parity
# (data-independent). NULL-type events are excluded on both sides (a
# map key must be non-null in Spark), and so are NULL-id events — the
# parity split assigns them to NEITHER batch (both % 2 predicates are
# NULL), so an unfiltered COUNT(*) here would count rows the Spark
# side structurally drops.
ORACLES["map_zip_with_merge_profiles"] = """
SELECT user_id, event_type,
       COUNT(*) FILTER (WHERE event_id % 2 = 0)  AS early_n,
       COUNT(*) FILTER (WHERE event_id % 2 <> 0) AS late_n,
       COUNT(*) AS total_n
FROM events
WHERE event_type IS NOT NULL AND event_id IS NOT NULL
GROUP BY user_id, event_type
ORDER BY user_id NULLS FIRST, event_type
"""

# unionByName(allowMissingColumns=True) twin: UNION ALL with explicit
# typed NULL backfill; SUM(BIGINT) widens to HUGEINT — cast.
ORACLES["union_byname_backfill_ingest"] = """
WITH unioned AS (
  SELECT doc_id, text, lang, n_chars, 'documents' AS origin FROM documents
  UNION ALL
  SELECT event_id + 10000000, props, CAST(NULL AS VARCHAR),
         CAST(NULL AS BIGINT), 'events' FROM events
)
SELECT origin,
       COUNT(*) AS n_rows,
       COUNT(*) FILTER (WHERE lang IS NULL) AS n_null_lang,
       COUNT(*) FILTER (WHERE n_chars IS NULL) AS n_backfilled,
       CAST(SUM(COALESCE(n_chars, LENGTH(text))) AS BIGINT) AS sum_chars_filled
FROM unioned
GROUP BY origin
ORDER BY origin
"""

# arg_max/arg_min twin of max_by/min_by. Ties are unspecified in both
# engines, so the ordering values are composite strings with the unique
# orderkey tie-break; cents are offset positive before lpad so planted
# negative prices keep lexicographic order.
ORACLES["argminmax_orders_priority"] = """
SELECT o_orderpriority,
  COUNT(*) AS n_orders,
  arg_max(o_orderkey,
          strftime(o_orderdate, '%Y-%m-%d') || '#'
            || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS latest_orderkey,
  arg_min(o_orderkey,
          lpad(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                      + 10000000000 AS VARCHAR), 14, '0') || '#'
            || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')) AS cheapest_orderkey
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority NULLS FIRST
"""

# Bitwise aggregate twin: hour-of-day presence bitmap per user, profiled
# by popcount. NULL ts excluded explicitly on both engines.
ORACLES["bitmap_hour_activity"] = """
WITH per_user AS (
  SELECT user_id,
         bit_or((1::BIGINT) << EXTRACT(hour FROM ts)::INT) AS hour_mask
  FROM events WHERE ts IS NOT NULL
  GROUP BY user_id
)
SELECT CAST(bit_count(hour_mask) AS INT) AS n_active_hours,
       COUNT(*) AS n_users,
       MIN(hour_mask) AS min_mask,
       MAX(hour_mask) AS max_mask
FROM per_user
GROUP BY 1
ORDER BY 1
"""

# TRY_CAST twin; SUM(BIGINT) widens to HUGEINT and count_if returns
# HUGEINT — cast both back.
ORACLES["try_cast_typed_backfill"] = r"""
WITH extracted AS (
  -- json_valid guard: DuckDB json_extract_string ABORTS on
  -- structurally invalid JSON where Spark's get_json_object returns
  -- NULL — the never-abort contract must hold on the oracle side too
  SELECT event_type,
         CASE WHEN json_valid(props)
              THEN json_extract_string(props, '$.k') END AS raw
  FROM events
), typed AS (
  -- integer-literal gate mirroring Spark's try_cast accept set
  -- (optional sign, digits, surrounding ASCII whitespace): DuckDB's
  -- TRY_CAST additionally COERCES '1.5'/'1e2' where Spark rejects
  -- them. Overflow passes the gate and NULLs identically on both.
  SELECT event_type, raw,
         CASE WHEN regexp_matches(raw,
                     '^[\s\x0b]*[+-]?[0-9]+[\s\x0b]*$')
              THEN TRY_CAST(raw AS BIGINT) END AS k
  FROM extracted
)
SELECT event_type,
  COUNT(*) AS n_events,
  CAST(count_if(k IS NOT NULL) AS BIGINT) AS n_cast_ok,
  CAST(count_if(raw IS NOT NULL AND k IS NULL) AS BIGINT) AS n_cast_bad,
  CAST(SUM(k) AS BIGINT) AS sum_k
FROM typed
GROUP BY event_type
ORDER BY event_type NULLS FIRST
"""

# generate_series/UNNEST twin of the sequence/explode date spine;
# generate_series over DATE bounds yields timestamps — cast back, same
# as the Spark side.
ORACLES["date_spine_order_gaps"] = """
WITH o AS (
  -- day granularity, mirroring the Spark side's to_date: a TIMESTAMP
  -- o_orderdate with time-of-day must neither split one day into two
  -- "distinct dates" nor miss the spine's midnight DATE values; the
  -- half-open upper bound keeps a Dec-31 afternoon inside the year
  SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate
  FROM orders
  WHERE o_orderdate >= DATE '1995-01-01'
    AND o_orderdate <  DATE '1996-01-01'
    AND o_custkey IS NOT NULL
), span AS (
  SELECT o_custkey, MIN(o_orderdate) AS d0, MAX(o_orderdate) AS d1
  FROM o GROUP BY 1 HAVING COUNT(*) >= 2
), spine AS (
  SELECT o_custkey,
         UNNEST(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
                                INTERVAL 1 DAY))::DATE AS d
  FROM span
), miss AS (
  SELECT s.o_custkey, s.d
  FROM spine s LEFT JOIN o
    ON o.o_custkey = s.o_custkey AND o.o_orderdate = s.d
  WHERE o.o_orderdate IS NULL
)
SELECT o_custkey, COUNT(*) AS gap_days,
       MIN(d) AS first_gap, MAX(d) AS last_gap
FROM miss GROUP BY 1 ORDER BY o_custkey
"""

# bool_and/bool_or/count_if twin; NULL balances skip the bool aggregates
# and count false in count_if on both engines.
ORACLES["bool_flags_by_segment"] = """
SELECT c_mktsegment,
  COUNT(*) AS n_customers,
  bool_and(c_acctbal > 0) AS all_positive,
  bool_or(c_acctbal < 0) AS any_negative,
  CAST(count_if(c_acctbal > 5000) AS BIGINT) AS n_wealthy
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment NULLS FIRST
"""


# inline (struct-array generator) twin: UNNEST of a list of structs,
# recursive:=true to splat the struct fields into columns. Tax is
# FLOOR(cents / 10.0) on BOTH engines — integer division would diverge
# on refund-negative prices (Spark cast truncates toward zero, // floors).
ORACLES["inline_order_charges"] = """
WITH c AS (
  SELECT o_orderkey,
         UNNEST([
           {'kind': 'base', 'cents': cents},
           {'kind': 'tax',
            'cents': CAST(FLOOR(cents / 10.0) AS BIGINT)},
           {'kind': 'fee',  'cents': LEAST(cents, 500)}
         ], recursive := true)
  FROM (SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                 AS cents
        FROM orders WHERE o_totalprice IS NOT NULL)
)
SELECT kind,
       COUNT(*) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       MAX(cents) AS max_cents
FROM c
GROUP BY kind
ORDER BY kind
"""

# first_value/last_value IGNORE NULLS twin over the identical unbounded
# frame; NULL ts/user excluded on both engines (a timeline needs a
# position and an owner).
ORACLES["window_first_last_ignore_nulls"] = """
WITH w AS (
  SELECT user_id,
         first_value(value IGNORE NULLS) OVER win AS fv,
         last_value(event_type IGNORE NULLS) OVER win AS lt,
         COUNT(*) OVER win AS n
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
  WINDOW win AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
)
SELECT user_id,
       ROUND(ANY_VALUE(fv), 6) AS first_value_seen,
       ANY_VALUE(lt) AS last_type_seen,
       ANY_VALUE(n) AS n_events
FROM w
GROUP BY user_id
ORDER BY user_id
"""


# Array set-algebra twin: recomputed WITHOUT array set ops — per-token
# parity flags (1-based ordinality: odd ↔ Spark's 0-based even) +
# count_if give the same set cardinalities. [\s\x0b] = Java \s.
# Empty tokens are list_filter'ed BEFORE generate_subscripts, exactly
# as the Spark twin filters before its positional lambda: indexing the
# raw split would let a leading-whitespace text ('  a b c') shift every
# position by one and swap the halves.
ORACLES["set_algebra_token_halves"] = """
WITH toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS idx
  FROM (SELECT doc_id,
               __TOKS(LOWER(text))__ AS l
        FROM documents WHERE text IS NOT NULL)
), flags AS (
  SELECT doc_id, tok,
         bool_or(idx % 2 = 1) AS in_even,
         bool_or(idx % 2 = 0) AS in_odd
  FROM toks GROUP BY doc_id, tok
)
SELECT doc_id,
  CAST(count_if(in_even AND in_odd) AS INT) AS n_common,
  CAST(count_if(in_even AND NOT in_odd) AS INT) AS n_only_even,
  CAST(COUNT(*) AS INT) AS n_union
FROM flags
GROUP BY doc_id
ORDER BY doc_id
"""

# str_to_map round-trip twin: the oracle never parses a k=v string —
# it derives the same profile straight from the base columns, checking
# serialize → str_to_map → element_at → cast against an independent
# path. COALESCE sentinels mirror the wire format's NULL-lossiness,
# and translate(';=' → '__') mirrors its delimiter sanitization (an
# unsanitized 'a;b' type would truncate to 'a' at parse time while
# the direct derivation kept it whole).
ORACLES["str_to_map_event_kv"] = """
SELECT translate(COALESCE(event_type, '?'), ';=', '__') AS t_key,
       COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT COALESCE(user_id, -1)) AS BIGINT) AS n_users,
       MIN(COALESCE(user_id, -1)) AS min_user,
       MAX(COALESCE(user_id, -1)) AS max_user
FROM events
GROUP BY 1
ORDER BY 1
"""

# percentile_disc twin: both engines implement the SQL standard's
# ordered-set discrete quantile (first value with cume_dist >= p), so
# the values are actual data points — exact, no interpolation FP.
ORACLES["percentile_disc_prices"] = """
SELECT o_orderpriority,
       COUNT(o_totalprice) AS n_priced,
       percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS p25,
       percentile_disc(0.5)  WITHIN GROUP (ORDER BY o_totalprice) AS p50,
       percentile_disc(0.9)  WITHIN GROUP (ORDER BY o_totalprice) AS p90
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority NULLS FIRST
"""

# regexp_extract_all twin: [a-z]{4,} is dialect-safe (Java ≡ RE2);
# COUNT(DISTINCT doc_id) widens like COUNT(*) → BIGINT on both.
ORACLES["regexp_extract_all_words"] = """
WITH words AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z]{4,}')) AS word
  FROM documents WHERE text IS NOT NULL
)
SELECT word, COUNT(*) AS n,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM words
GROUP BY word
HAVING COUNT(*) >= 5
ORDER BY word
"""

# map_filter/map_concat twin: no map functions at all — the exploded
# rows are HAVING-filtered per-type counts UNION ALL a per-user total
# row under the reserved '__n__' key (impossible as an event type).
ORACLES["map_filter_concat_profile"] = """
WITH typed AS (
  SELECT user_id, event_type FROM events WHERE event_type IS NOT NULL
)
SELECT user_id, k, v FROM (
  SELECT user_id, event_type AS k, COUNT(*) AS v
  FROM typed GROUP BY user_id, event_type HAVING COUNT(*) >= 2
  UNION ALL
  SELECT user_id, '__n__' AS k, COUNT(*) AS v
  FROM typed GROUP BY user_id
)
ORDER BY user_id NULLS FIRST, k
"""

# width_bucket twin: DuckDB lacks width_bucket — the oracle mirrors
# the standard's formula in plain arithmetic. Bin width 50000.0 =
# (600000-0)/12 is exact in binary, so FLOOR((x-0)/width)+1 is the
# same IEEE divide+floor on both engines; underflow → 0, overflow
# (x >= max) → 13, NULL price → NULL bucket.
ORACLES["width_bucket_price_histogram"] = """
WITH b AS (
  SELECT CASE WHEN o_totalprice IS NULL THEN NULL
              WHEN o_totalprice < 0.0 THEN 0
              WHEN o_totalprice >= 600000.0 THEN 13
              ELSE CAST(FLOOR((o_totalprice - 0.0)
                              / ((600000.0 - 0.0) / 12)) AS BIGINT) + 1
         END AS bucket,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           AS cents
  FROM orders
)
SELECT bucket,
       COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       MIN(cents) AS min_cents,
       MAX(cents) AS max_cents
FROM b
GROUP BY bucket
ORDER BY bucket NULLS FIRST
"""


# CONT-vs-DISC tie twin: both engines implement the standard's
# interpolation / cume_dist pick; the LEFT JOIN counts orders AT the
# discrete median (null-safe on the group key, matching Spark's <=>).
ORACLES["percentile_cont_vs_disc_ties"] = """
WITH q AS (
  SELECT o_orderpriority,
         COUNT(o_totalprice) AS n_priced,
         ROUND(percentile_cont(0.5)
               WITHIN GROUP (ORDER BY o_totalprice), 6) AS p50_cont,
         percentile_disc(0.5)
               WITHIN GROUP (ORDER BY o_totalprice) AS p50_disc
  FROM orders
  GROUP BY o_orderpriority
)
SELECT q.o_orderpriority, q.n_priced, q.p50_cont, q.p50_disc,
       ROUND(q.p50_cont - q.p50_disc, 6) AS cont_disc_gap,
       COUNT(o.o_totalprice) AS n_at_disc_median
FROM q LEFT JOIN orders o
  ON o.o_orderpriority IS NOT DISTINCT FROM q.o_orderpriority
 AND o.o_totalprice = q.p50_disc
GROUP BY q.o_orderpriority, q.n_priced, q.p50_cont, q.p50_disc
ORDER BY q.o_orderpriority NULLS FIRST
"""

# Expanding-distinct twin: first-seen day per user, then a running sum
# over the day spine — all-integer, no FP.
ORACLES["cumulative_distinct_users"] = """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS day
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
  GROUP BY user_id
), per_day AS (
  SELECT day, COUNT(*) AS new_users FROM first_seen GROUP BY day
)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM per_day
ORDER BY day
"""

# Gini twin: rank-weighted closed form, all sums in DECIMAL, the single
# double division last. The (rev, custkey) tie-break matches Spark's
# row_number order; the result is tie-permutation invariant anyway.
ORACLES["gini_revenue_concentration"] = """
WITH rev AS (
  SELECT c.c_mktsegment, o.o_custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)))
              AS DECIMAL(15,2)) AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
  HAVING SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) IS NOT NULL
), ranked AS (
  SELECT c_mktsegment, rev,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                 ORDER BY rev, o_custkey) AS BIGINT) AS i,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n_customers
  FROM rev
)
SELECT c_mktsegment,
       MAX(n_customers) AS n_customers,
       ROUND(CAST(SUM(CAST(2 * i - n_customers - 1 AS DECIMAL(12,0)) * rev)
                  AS DOUBLE)
             / (CAST(MAX(n_customers) AS DOUBLE)
                * CAST(SUM(rev) AS DOUBLE)), 6) AS gini,
       CAST(SUM(rev) AS DOUBLE) AS total_revenue
FROM ranked
GROUP BY c_mktsegment
ORDER BY c_mktsegment NULLS FIRST
"""

# Entropy twin: per-source −p·ln(p) rounded to 9 and summed in DECIMAL
# so sum order cannot move the hash; p is an exact integer ratio.
ORACLES["entropy_source_by_lang"] = """
WITH per AS (
  SELECT lang, source, COUNT(*) AS c
  FROM documents WHERE source IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT lang, SUM(c) AS n_docs, COUNT(*) AS n_sources
  FROM per GROUP BY lang
)
SELECT per.lang,
       CAST(MAX(tot.n_docs) AS BIGINT) AS n_docs,
       MAX(tot.n_sources) AS n_sources,
       ROUND(CAST(SUM(CAST(ROUND(
             -(CAST(per.c AS DOUBLE) / CAST(tot.n_docs AS DOUBLE))
             * ln(CAST(per.c AS DOUBLE) / CAST(tot.n_docs AS DOUBLE)), 9)
             AS DECIMAL(18,9))) AS DOUBLE), 6) AS source_entropy
FROM per JOIN tot ON per.lang IS NOT DISTINCT FROM tot.lang
GROUP BY per.lang
ORDER BY per.lang NULLS FIRST
"""

# BM25 twin: engine-wide tokenizer, identical operation order inside
# the per-term partial (idf * tf*2.2 / (tf + 1.2*(0.25 + 0.75*dl/avgdl))),
# partials rounded to 9 and summed in DECIMAL, rank on the rounded
# score + doc_id.
ORACLES["bm25_doc_scores"] = """
WITH toks AS (
  SELECT doc_id, __TOKS(LOWER(text))__ AS t
  FROM documents WHERE text IS NOT NULL
), dl AS (
  SELECT doc_id, len(t) AS dl FROM toks
), n_avg AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(t) AS term FROM toks)
  WHERE term IN ('spark', 'join', 'window', 'stream')
  GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), parts AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           ln(1.0 + (CAST(n_avg.n_docs AS DOUBLE) - df.df + 0.5)
                    / (df.df + 0.5))
           * (CAST(tf.tf AS DOUBLE) * 2.2
              / (CAST(tf.tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * dl.dl
                          / (CAST(n_avg.sum_dl AS DOUBLE)
                             / CAST(n_avg.n_docs AS DOUBLE))))), 9)
           AS DECIMAL(18,9)) AS part
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN n_avg
)
SELECT doc_id,
       ROUND(CAST(SUM(part) AS DOUBLE), 6) AS bm25,
       COUNT(*) AS n_terms_hit
FROM parts
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC
LIMIT 15
"""

# Weighted-median twin: per-(flag, price) pre-combine, cumulative
# DECIMAL weights, smallest price with 2·cumw ≥ total — exact compares
# only.
ORACLES["weighted_median_lineitem"] = """
WITH per_price AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
  GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(w) OVER (PARTITION BY l_returnflag
                      ORDER BY l_extendedprice
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cumw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS totw
  FROM per_price
)
SELECT l_returnflag,
       MIN(l_extendedprice) AS weighted_median_price,
       MAX(CAST(totw AS DOUBLE)) AS total_weight
FROM cum
WHERE cumw * 2 >= totw
GROUP BY l_returnflag
ORDER BY l_returnflag NULLS FIRST
"""

# RFM twin: ntile(4) under the same total order (metric + custkey);
# both engines split buckets per the standard (first n%4 buckets one
# larger). date_diff arg order: (start=last_day, end=max_day) ≡ Spark's
# datediff(max_day, last_day).
ORACLES["rfm_customer_segments"] = """
WITH per_cust AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_day,
         COUNT(*) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS monetary
  FROM orders GROUP BY o_custkey
), base AS (
  SELECT o_custkey,
         date_diff('day', last_day,
                   (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders))
           AS recency_days,
         frequency, monetary
  FROM per_cust
), cells AS (
  SELECT CAST(ntile(4) OVER (ORDER BY recency_days ASC NULLS FIRST,
                             o_custkey) AS INTEGER) AS r_quartile,
         CAST(ntile(4) OVER (ORDER BY frequency DESC NULLS LAST,
                             o_custkey) AS INTEGER) AS f_quartile,
         CAST(ntile(4) OVER (ORDER BY monetary DESC NULLS LAST,
                             o_custkey) AS INTEGER) AS m_quartile,
         monetary
  FROM base
)
SELECT r_quartile, f_quartile, m_quartile,
       COUNT(*) AS n_customers,
       ROUND(CAST(SUM(monetary) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS avg_monetary
FROM cells
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

# Basket-lift twin: exact integer counts, one double division in the
# same order (n_ab·N then / (n_a·n_b)), rank on rounded lift + pair.
ORACLES["basket_pair_lift"] = """
WITH ob AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), n AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob
), pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS n_ab
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
), marg AS (
  SELECT p_brand, COUNT(*) AS n_b FROM ob GROUP BY p_brand
)
SELECT pairs.brand_a, pairs.brand_b, pairs.n_ab,
       ROUND(CAST(pairs.n_ab AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
             / (CAST(ma.n_b AS DOUBLE) * CAST(mb.n_b AS DOUBLE)), 6)
         AS lift
FROM pairs
JOIN marg ma ON ma.p_brand = pairs.brand_a
JOIN marg mb ON mb.p_brand = pairs.brand_b
CROSS JOIN n
ORDER BY lift DESC, brand_a, brand_b
LIMIT 20
"""

# Skyline twin: NOT EXISTS dominance within the brand block; LEFT JOIN
# census mirrors the Spark left join byte for byte.
ORACLES["skyline_parts_pareto"] = """
WITH p AS (
  SELECT p_partkey, p_brand, p_retailprice, p_size
  FROM part
  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
), skyline AS (
  SELECT * FROM p
  WHERE NOT EXISTS (
    SELECT 1 FROM p d
    WHERE d.p_brand = p.p_brand
      AND d.p_retailprice <= p.p_retailprice
      AND d.p_size >= p.p_size
      AND (d.p_retailprice < p.p_retailprice OR d.p_size > p.p_size)
  )
), census AS (
  SELECT p_brand, COUNT(*) AS n_parts FROM p GROUP BY p_brand
), sk AS (
  SELECT p_brand, COUNT(*) AS n_skyline,
         MIN(p_retailprice) AS min_skyline_price,
         MAX(p_size) AS max_skyline_size
  FROM skyline GROUP BY p_brand
)
SELECT census.p_brand, census.n_parts, sk.n_skyline,
       sk.min_skyline_price, sk.max_skyline_size
FROM census LEFT JOIN sk ON census.p_brand = sk.p_brand
ORDER BY census.p_brand NULLS FIRST
"""

# NOT IN vs NOT EXISTS null-semantics twin: identical SQL — the check
# is that BOTH engines keep zero rows under the NULL-poisoned NOT IN
# and exactly the BUILDING rows under NOT EXISTS.
ORACLES["notin_null_aware_segments"] = """
SELECT
  (SELECT COUNT(*) FROM customer) AS n_customers,
  (SELECT COUNT(*) FROM customer
    WHERE c_mktsegment NOT IN
          (SELECT NULLIF(c_mktsegment, 'BUILDING') FROM customer))
    AS n_not_in,
  (SELECT COUNT(*) FROM customer c
    WHERE NOT EXISTS
          (SELECT 1 FROM customer d
            WHERE NULLIF(d.c_mktsegment, 'BUILDING') = c.c_mktsegment))
    AS n_not_exists
"""


# DiD twin: the cutoff is exact integer day arithmetic (// 2 of the
# day span), cell means are DECIMAL sums over exact counts, the DiD
# combine is the same fixed four-term double expression.
ORACLES["did_promo_effect"] = """
WITH span AS (
  SELECT MIN(CAST(o_orderdate AS DATE))
           + CAST(date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                            MAX(CAST(o_orderdate AS DATE))) // 2
                  AS INTEGER) AS cutoff
  FROM orders WHERE o_orderdate IS NOT NULL
), cells AS (
  SELECT (o_orderpriority = '1-URGENT') AS treated,
         (CAST(o_orderdate AS DATE) >= (SELECT cutoff FROM span)) AS post,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
           / COUNT(*) AS mean_price
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
        AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
)
SELECT
  MAX(CASE WHEN treated AND post THEN n END) AS n_treat_post,
  MAX(CASE WHEN treated AND NOT post THEN n END) AS n_treat_pre,
  MAX(CASE WHEN NOT treated AND post THEN n END) AS n_ctrl_post,
  MAX(CASE WHEN NOT treated AND NOT post THEN n END) AS n_ctrl_pre,
  ROUND(
    (MAX(CASE WHEN treated AND post THEN mean_price END)
     - MAX(CASE WHEN treated AND NOT post THEN mean_price END))
    - (MAX(CASE WHEN NOT treated AND post THEN mean_price END)
       - MAX(CASE WHEN NOT treated AND NOT post THEN mean_price END)),
    6) AS did_estimate
FROM cells
"""

# Largest-remainder twin: all-integer // and % — no FP anywhere.
# HUGEINT-widening window sums cast back to BIGINT.
ORACLES["allocation_largest_remainder"] = """
WITH counts AS (
  SELECT c_mktsegment, COUNT(*) AS n_customers
  FROM customer GROUP BY c_mktsegment
), quota AS (
  SELECT c_mktsegment, n_customers,
         CAST((10000 * n_customers) // CAST(SUM(n_customers) OVER ()
              AS BIGINT) AS BIGINT) AS base,
         CAST((10000 * n_customers) % CAST(SUM(n_customers) OVER ()
              AS BIGINT) AS BIGINT) AS rem
  FROM counts
), ranked AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (
           ORDER BY rem DESC, c_mktsegment ASC NULLS FIRST) AS INTEGER)
           AS r,
         CAST(10000 - SUM(base) OVER () AS BIGINT) AS leftover
  FROM quota
)
SELECT c_mktsegment, n_customers, base,
       CASE WHEN r <= leftover THEN 1 ELSE 0 END AS extra,
       base + CASE WHEN r <= leftover THEN 1 ELSE 0 END AS allocated
FROM ranked
ORDER BY c_mktsegment NULLS FIRST
"""

# Chi-squared twin: exact integer marginals cast to double inside the
# SAME (O−E)²/E expression, per-cell terms rounded to 9 and summed in
# DECIMAL per segment.
ORACLES["crosstab_chi2_segment_priority"] = """
WITH cells AS (
  SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS o
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), terms AS (
  SELECT c_mktsegment, o,
         CAST(ROUND(
           (CAST(o AS DOUBLE)
            - CAST(SUM(o) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
              * CAST(SUM(o) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
              / CAST(SUM(o) OVER () AS DOUBLE))
           * (CAST(o AS DOUBLE)
              - CAST(SUM(o) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
                * CAST(SUM(o) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
                / CAST(SUM(o) OVER () AS DOUBLE))
           / (CAST(SUM(o) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
              * CAST(SUM(o) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
              / CAST(SUM(o) OVER () AS DOUBLE)), 9)
           AS DECIMAL(18,9)) AS term
  FROM cells
)
SELECT c_mktsegment,
       CAST(SUM(o) AS BIGINT) AS n_orders,
       COUNT(*) AS n_cells,
       ROUND(CAST(SUM(term) AS DOUBLE), 6) AS chi2_contrib
FROM terms
GROUP BY c_mktsegment
ORDER BY c_mktsegment NULLS FIRST
"""

# Wilson twin: exact integer n/successes; the lower-bound formula is
# the same fixed double chain (sqrt is IEEE-correct on both engines);
# rank on the rounded bound + type.
ORACLES["wilson_ctr_event_types"] = """
WITH agg AS (
  SELECT event_type,
         COUNT(value) AS n,
         COUNT(CASE WHEN value > 50.0 THEN 1 END) AS successes
  FROM events
  GROUP BY event_type
  HAVING COUNT(value) > 0
)
SELECT event_type, n, successes,
       ROUND(CAST(successes AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
       ROUND(
         (CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)
          + 1.96 * 1.96 / (2.0 * CAST(n AS DOUBLE))
          - 1.96 * sqrt(((CAST(successes AS DOUBLE) / CAST(n AS DOUBLE))
                         * (1.0 - CAST(successes AS DOUBLE)
                                  / CAST(n AS DOUBLE))
                         + 1.96 * 1.96 / (4.0 * CAST(n AS DOUBLE)))
                        / CAST(n AS DOUBLE)))
         / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE)), 6) AS wilson_lb
FROM agg
ORDER BY wilson_lb DESC, event_type ASC NULLS FIRST
"""

# Decile-lift twin: ntile(10) under the same total order; per-decile
# DECIMAL revenue; the cumulative share divides two exact decimal
# window sums once in double.
ORACLES["decile_lift_monetary"] = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DECIMAL(15,2)) AS monetary
  FROM orders GROUP BY o_custkey
  HAVING SUM(CAST(o_totalprice AS DECIMAL(12,2))) IS NOT NULL
), deciles AS (
  SELECT CAST(ntile(10) OVER (ORDER BY monetary DESC NULLS LAST,
                              o_custkey) AS INTEGER) AS decile,
         monetary
  FROM per_cust
), per_dec AS (
  SELECT decile, COUNT(*) AS n_customers,
         CAST(SUM(monetary) AS DECIMAL(18,2)) AS revenue
  FROM deciles GROUP BY decile
)
SELECT decile, n_customers,
       CAST(revenue AS DOUBLE) AS revenue,
       ROUND(CAST(SUM(revenue) OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE)
             / CAST(SUM(revenue) OVER () AS DOUBLE), 6) AS cum_share
FROM per_dec
ORDER BY decile
"""

# Autocorrelation twin: exact DECIMAL Pearson sums over the lag-paired
# day spine, cast to double only inside the one closed-form expression.
ORACLES["autocorr_daily_revenue"] = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
              AS DECIMAL(15,2)) AS x
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1
), pairs AS (
  SELECT x, LAG(x) OVER (ORDER BY day) AS y FROM daily
), sums AS (
  SELECT COUNT(*) AS n_pairs,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM pairs WHERE y IS NOT NULL
)
SELECT n_pairs,
       ROUND(
         (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (sqrt(CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * sqrt(CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS autocorr_lag1
FROM sums
"""


# --- tokenizer macro expansion ----------------------------------------------
# The engine-wide whitespace tokenizer as ONE SQL fragment (the DuckDB
# twin of queries-side ``TX.tokens()``): oracles write ``__TOKS(expr)__``
# and the expansion below substitutes the real fragment, so the
# whitespace rule has a single point of change — the round-6 ``\x0b``
# and round-9 ``\p{Z}`` fixes each had to be hand-applied to ~20 inline
# copies, and a missed copy breaks hash parity only on planted
# unicode-whitespace documents (round-10 review).

def _toks_sql(expr: str) -> str:
    """DuckDB tokenizer fragment: TRIM → regex split on the engine-wide
    whitespace class (``[\\s\\x0b\\p{Z}]`` — Java ``\\s`` incl. U+000B,
    plus the Unicode separator block) → drop empty tokens."""
    return (
        "list_filter(string_split_regex(TRIM(" + expr + "), "
        + r"'[\s\x0b\p{Z}]+'), x -> x <> '')"
    )


def _jaccard_ctes_sql(tok_cte: str) -> str:
    """The capped-universe 3-gram Jaccard derivation (the DuckDB twin of
    ``operators/similarity.py::ngram_jaccard_pairs`` with
    ``max_shingle_df=64``), shared VERBATIM by the three near-dup
    oracles — one point of change for the shingle/cap/pair rules.
    Reads token lists from CTE ``tok_cte`` (columns doc_id, t); defines
    shingled → sets → inv0 → hot → inv → sizes → ipairs."""
    return f"""shingled AS (
  SELECT doc_id,
         CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
              ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]
         END AS shs
  FROM {tok_cte}
), sets AS (
  SELECT doc_id, list_distinct(shs) AS s FROM shingled
), inv0 AS (
  SELECT doc_id, UNNEST(s) AS sh FROM sets
), hot AS (
  SELECT sh FROM inv0 GROUP BY sh HAVING COUNT(*) > 64
), inv AS (
  SELECT i.doc_id, i.sh FROM inv0 i ANTI JOIN hot h ON i.sh = h.sh
), sizes AS (
  SELECT doc_id, COUNT(*) AS set_size FROM inv GROUP BY doc_id
), ipairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS intersection
  FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""


#: Jaccard >= 0.6 threshold cut over ipairs/sizes (follows
#: __JACCARD_CTES__; defines jpairs).
_JPAIRS_CTE = """jpairs AS (
  SELECT p.id_a, p.id_b
  FROM ipairs p
  JOIN sizes sa ON p.id_a = sa.doc_id
  JOIN sizes sb ON p.id_b = sb.doc_id
  WHERE p.intersection / (sa.set_size + sb.set_size - p.intersection) >= 0.6
)"""


def _cc_ctes_sql(node_src: str) -> str:
    """Recursive-CTE connected components over jpairs (the oracle twin
    of ``operators/graph.py``'s large-star/small-star): every node from
    ``node_src`` seeds its own label; MIN(label) reachable per node is
    the component id. Defines edges → reach → comp; the enclosing WITH
    must be RECURSIVE."""
    return f"""edges AS (
  SELECT id_a AS a, id_b AS b FROM jpairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM jpairs
), reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM {node_src}
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
), comp AS (
  SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY node
)"""


def _expand_macros() -> None:
    import re as _re

    subs = [
        (_re.compile(r"__JACCARD_CTES\((.+?)\)__"),
         lambda m: _jaccard_ctes_sql(m.group(1))),
        (_re.compile(r"__JPAIRS_CTE__"), lambda m: _JPAIRS_CTE),
        (_re.compile(r"__CC_CTES\((.+?)\)__"),
         lambda m: _cc_ctes_sql(m.group(1))),
        (_re.compile(r"__TOKS\((.+?)\)__"),
         lambda m: _toks_sql(m.group(1))),
    ]
    for _k, _sql in ORACLES.items():
        for pat, fn in subs:
            _sql = pat.sub(fn, _sql)
        ORACLES[_k] = _sql


_expand_macros()
