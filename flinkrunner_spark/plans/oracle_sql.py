"""DuckDB oracle SQL for every queries() entry (the driver's t2 gate).

Cross-engine determinism rules used throughout (see operators/aggregates.py):
* additive aggregates over doubles go through DECIMAL(18,6) — exact and
  order-independent — then CAST AS DOUBLE, mirroring the Spark plans
  expression-for-expression;
* order-dependent folds (EMA family) are written as ``list_reduce`` with
  the SAME IEEE double operations in the SAME order as the Spark-side
  ``F.aggregate`` fold, with float literals spelled as CAST(x AS DOUBLE) so
  DuckDB doesn't parse them as decimals;
* every computed column is aliased identically to the Spark plan;
* decimal→double casts go through VARCHAR (``CAST(CAST(x AS VARCHAR) AS
  DOUBLE)``): duckdb's direct decimal→double cast double-rounds (int128 →
  double, then ÷10^scale — off by one ulp when the scaled integer exceeds
  2^53), while Spark's BigDecimal cast rounds once; strtod is correctly
  rounded, so the VARCHAR route matches Spark bit-for-bit.
"""

# shared fragments
_DSUM_V = "CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)"
_S1 = _DSUM_V
_S2 = "CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)"
_N = "COUNT(value)"
_A = "CAST(0.7 AS DOUBLE)"
_OMA = "(CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))"
# Factor precisions chosen so even the triple product price*disc*tax fits
# precision 38 exactly — no intermediate decimal rounding anywhere (scale-6
# casts of doubles can never hit an exact .5 tie, so HALF_UP vs HALF_EVEN
# engine differences are unreachable).
_DISC = "(CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))"
_PRICE = "CAST(l_extendedprice AS DECIMAL(18,6))"
_TAX = "(CAST(1 AS DECIMAL(8,6)) + CAST(l_tax AS DECIMAL(8,6)))"

def _r6(expr: str) -> str:
    """Spark-parity ROUND(double, 6). Spark's Round on a double rounds the
    SHORTEST DECIMAL REPR (BigDecimal.valueOf → Double.toString) with
    HALF_UP, while duckdb's ROUND rounds the true binary value — they
    disagree whenever the shortest repr sits on a .5 boundary the binary
    value is just below (seen live: fold → 33.03283249999999782 whose repr
    is "33.0328325" → Spark 33.032833, duck ROUND 33.032832). Routing
    through VARCHAR → DECIMAL reproduces Spark's semantics exactly."""
    return (
        f"CAST(CAST(ROUND(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,20)),"
        f" 6) AS VARCHAR) AS DOUBLE)"
    )


ORACLES: dict[str, str] = {}

ORACLES["q1_pricing"] = f"""
SELECT l_returnflag, l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
  CAST(CAST(SUM({_PRICE}) AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(CAST(SUM({_PRICE} * {_DISC}) AS DECIMAL(24,6)) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(CAST(SUM({_PRICE} * {_DISC} * {_TAX}) AS DECIMAL(24,6)) AS VARCHAR) AS DOUBLE) AS sum_charge,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["q3_shipping"] = f"""
SELECT l_orderkey, o_orderdate,
  CAST(CAST(CAST(SUM({_PRICE} * {_DISC}) AS DECIMAL(24,6)) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

ORACLES["q10_returned"] = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
  CAST(CAST(CAST(SUM({_PRICE} * {_DISC}) AS DECIMAL(24,6)) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

ORACLES["q18_bigorders"] = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM (
  SELECT l_orderkey,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) > 250
) big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""

ORACLES["q14_promo"] = f"""
SELECT {_r6(
    f"CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' "
    f"THEN CAST({_PRICE} * {_DISC} AS DECIMAL(24,6)) "
    f"ELSE CAST(0 AS DECIMAL(24,6)) END) AS VARCHAR) AS DOUBLE) * 100.0 "
    f"/ CAST(CAST(SUM(CAST({_PRICE} * {_DISC} AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE)"
)} AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""

ORACLES["q19_brand"] = f"""
SELECT
  CAST(CAST(CAST(SUM({_PRICE} * {_DISC}) AS DECIMAL(24,6)) AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""

ORACLES["salted_supplier_rev"] = f"""
SELECT s_name,
  CAST(CAST(CAST(SUM({_PRICE} * {_DISC}) AS DECIMAL(24,6)) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
"""

ORACLES["q5_supplier"] = f"""
SELECT n_name, CAST(CAST(CAST(SUM({_PRICE} * {_DISC}) AS DECIMAL(24,6)) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""

ORACLES["q4_priority"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""

ORACLES["q7_volume"] = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
  CAST(CAST(CAST(SUM({_PRICE} * {_DISC}) AS DECIMAL(24,6)) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_13', 'NATION_19')
  AND cn.n_name IN ('NATION_13', 'NATION_19')
  AND sn.n_name <> cn.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
"""

ORACLES["q8_market"] = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
  {_r6(
    f"CAST(CAST(SUM(CASE WHEN n.n_name = 'NATION_13' "
    f"THEN CAST({_PRICE} * {_DISC} AS DECIMAL(24,6)) "
    f"ELSE CAST(0 AS DECIMAL(24,6)) END) AS VARCHAR) AS DOUBLE) "
    f"/ CAST(CAST(SUM(CAST({_PRICE} * {_DISC} AS DECIMAL(24,6))) AS VARCHAR) AS DOUBLE)"
)} AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n ON s_nationkey = n.n_nationkey
GROUP BY 1
"""

ORACLES["q12_modes"] = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""

ORACLES["q13_custdist"] = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
       AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) c_orders
GROUP BY c_count
"""

ORACLES["q15_topsupplier"] = f"""
WITH revenue AS (
  SELECT l_suppkey,
    CAST(CAST(CAST(SUM({_PRICE} * {_DISC}) AS DECIMAL(24,6)) AS VARCHAR) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""

ORACLES["q17_smallqty"] = f"""
SELECT {_r6(
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)"
    " / CAST(7.0 AS DOUBLE)"
)} AS avg_yearly,
  COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < CAST(0.2 AS DOUBLE) * (
    SELECT CAST(CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
           / COUNT(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""

ORACLES["q21_waiting"] = """
WITH li AS (SELECT l_orderkey, l_suppkey, l_returnflag FROM lineitem),
ret AS (SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE l_returnflag = 'R')
SELECT s_name, COUNT(DISTINCT r.l_orderkey) AS numwait
FROM ret r
JOIN supplier ON r.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM li l2
              WHERE l2.l_orderkey = r.l_orderkey
                AND l2.l_suppkey <> r.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM li l3
                  WHERE l3.l_orderkey = r.l_orderkey
                    AND l3.l_suppkey <> r.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""

ORACLES["q22_opportunity"] = """
SELECT c_mktsegment,
  COUNT(*) AS numcust,
  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
           / COUNT(c2.c_acctbal)
    FROM customer c2 WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
"""

ORACLES["topk_orders"] = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY o_orderpriority
      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank
  FROM orders) t
WHERE rank <= 3
"""

ORACLES["pivot_events"] = """
SELECT user_id,
  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events GROUP BY user_id
"""

ORACLES["rollup_sales"] = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

ORACLES["agg_basic"] = f"""
SELECT event_type,
  {_N} AS agg_count,
  {_DSUM_V} AS agg_sum,
  {_DSUM_V} / {_N} AS agg_mean,
  MIN(value) AS agg_min,
  MAX(value) AS agg_max,
  MAX(value) - MIN(value) AS agg_range,
  ({_S2} - {_S1} * {_S1} / {_N}) / ({_N} - 1) AS agg_variance,
  SQRT(({_S2} - {_S1} * {_S1} / {_N}) / ({_N} - 1)) AS agg_stddev,
  ({_S2} - {_S1} * {_S1} / {_N}) AS agg_ssd
FROM events GROUP BY event_type
"""

ORACLES["agg_percentage"] = f"""
SELECT event_type, {_DSUM_V} / 20.0 * 100.0 AS agg_pct
FROM events GROUP BY event_type
"""

# exact DISC quantiles: both engines return the smallest stored value
# whose cumulative distribution reaches p — an actual double from the
# data, so no interpolation ulps to reconcile
ORACLES["agg_quantiles"] = """
SELECT event_type,
  quantile_disc(value, 0.5) AS p50,
  quantile_disc(value, 0.9) AS p90,
  quantile_disc(value, 0.95) AS p95,
  quantile_disc(value, 0.99) AS p99,
  CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
"""

ORACLES["agg_histogram"] = """
WITH m AS (
  SELECT event_type, value,
    FLOOR(LOG10(CASE WHEN ABS(value) < 1e-9 THEN 1e-9 ELSE ABS(value) END))
      AS magnitude
  FROM events
), e AS (
  SELECT event_type, value,
    POWER(10.0, SIGN(magnitude) * (ABS(magnitude) - 1)) AS p
  FROM m
)
SELECT event_type,
  FLOOR(value / p) * p AS bin_min,
  CEIL(value / p) * p AS bin_max,
  COUNT(*) AS bin_count
FROM e GROUP BY event_type, bin_min, bin_max
"""

ORACLES["agg_ema"] = f"""
SELECT event_type,
  {_r6(f"list_reduce(list(value ORDER BY ts, event_id),"
       f" (acc, x) -> acc * {_OMA} + x * {_A})")} AS agg_ema
FROM events GROUP BY event_type
"""

# NOTE: 'v' must be listed BEFORE 'e' in the reduce lambda's struct —
# DuckDB 1.0 evaluates struct fields sequentially against the accumulator,
# so a field computed after 'e' would see the already-updated EMA.
ORACLES["agg_emvar"] = f"""
SELECT event_type,
  {_r6("st.v")} AS agg_emvar,
  {_r6("SQRT(st.v)")} AS agg_emsd
FROM (
  SELECT event_type,
    list_reduce(
      list_transform(list(value ORDER BY ts, event_id),
                     x -> {{'v': CAST(0.0 AS DOUBLE), 'e': x}}),
      (acc, x) -> {{
        'v': {_OMA} * (acc.v + {_A} * (x.e - acc.e) * (x.e - acc.e)),
        'e': acc.e * {_OMA} + x.e * {_A}
      }}) AS st
  FROM events GROUP BY event_type) t
"""

ORACLES["win_tumbling"] = f"""
SELECT date_trunc('hour', ts) AS window_start,
  date_trunc('hour', ts) + INTERVAL '1 hour' AS window_end,
  event_type, COUNT(*) AS n, {_DSUM_V} AS total
FROM events GROUP BY 1, 2, 3
"""

ORACLES["win_sliding"] = f"""
WITH shifted AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, event_type, value
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS ws,
         event_type, value
  FROM events
)
SELECT ws AS window_start, ws + INTERVAL '1 hour' AS window_end,
  event_type, COUNT(*) AS n, {_DSUM_V} AS total
FROM shifted GROUP BY 1, 2, 3
"""

ORACLES["win_session"] = f"""
WITH o AS (
  SELECT user_id, ts, event_id, value,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              < INTERVAL '5 minutes' THEN 0 ELSE 1 END AS new_s
  FROM events
), s AS (
  SELECT user_id, ts, value,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT MIN(ts) AS window_start,
  MAX(ts) + INTERVAL '5 minutes' AS window_end,
  user_id, COUNT(*) AS n, {_DSUM_V} AS total
FROM s GROUP BY user_id, sid
"""

ORACLES["dedup_first"] = """
SELECT event_id, ts, user_id, event_type, value FROM (
  SELECT event_id, ts, user_id, event_type, value,
    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS rn
  FROM events) t
WHERE rn = 1
"""

# deterministic projection of the SBF dedup contract (plans/events.
# dedup_sbf_check): kept rows are true first occurrences, at most one per
# key, FP key loss within 3×fpr. n_exact_keys is data-derived on both
# engines, so the row is anchored, not a tautology.
ORACLES["dedup_sbf_check"] = """
SELECT
  (SELECT COUNT(*) FROM (SELECT DISTINCT user_id, event_type FROM events))
    AS n_exact_keys,
  CAST(0 AS BIGINT) AS n_non_first_kept,
  CAST(0 AS BIGINT) AS n_multi_kept_keys,
  true AS fp_within_bound
"""

# the streaming mirror dedups on the identical composite key and SBF
# geometry, so its contract projection shares the batch oracle verbatim
ORACLES["stream_dedup_sbf_check"] = ORACLES["dedup_sbf_check"]

ORACLES["filter_by_control"] = """
WITH merged AS (
  SELECT user_id AS k, ts AS o_ts, event_id AS tb, 0 AS kind,
         (event_type = 'signup') AS active,
         CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS TIMESTAMP) AS ts,
         CAST(NULL AS BIGINT) AS user_id, CAST(NULL AS VARCHAR) AS event_type,
         CAST(NULL AS DOUBLE) AS value
  FROM events WHERE event_type IN ('signup', 'error')
  UNION ALL
  SELECT user_id AS k, ts AS o_ts, event_id AS tb, 1 AS kind,
         CAST(NULL AS BOOLEAN) AS active,
         event_id, ts, user_id, event_type, value
  FROM events WHERE event_type NOT IN ('signup', 'error')
), st AS (
  SELECT *, LAST_VALUE(active IGNORE NULLS) OVER (
      PARTITION BY k ORDER BY o_ts, kind, tb
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS state
  FROM merged
)
SELECT event_id, ts, user_id, event_type, value
FROM st WHERE kind = 1 AND state
"""

ORACLES["asof_join"] = """
SELECT event_id, ts, user_id, click_id, click_ts FROM (
  SELECT p.event_id, p.ts, p.user_id,
    c.event_id AS click_id, c.ts AS click_ts,
    ROW_NUMBER() OVER (PARTITION BY p.event_id
                       ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON c.user_id = p.user_id AND c.ts <= p.ts) t
WHERE rn = 1
"""

ORACLES["enrich_events"] = """
SELECT e.event_id, e.user_id, e.event_type, c.c_name, c.c_mktsegment
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""

ORACLES["distinct_users"] = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""

# Exact HLL oracle: the estimator (algorithms/hll.py, b=12) is md5-based
# and fully deterministic, and the register sum Σ2^-M_j adds 4096 exact
# powers of two (≥2^-20, total <2^12 → every partial sum fits 32 mantissa
# bits), so it is order-independent in IEEE doubles — the whole pipeline
# is reproducible in SQL bit-for-bit. int() truncates → TRUNC.
ORACLES["hll_users"] = """
WITH u AS (SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS s FROM events),
h AS (SELECT event_type, md5(s) AS hx FROM u),
x AS (SELECT event_type,
        CAST(list_sum(list_transform(generate_series(1, 8),
          i -> (instr('0123456789abcdef', substring(hx, CAST(i AS INT), 1)) - 1)
               * CAST(power(16, 8 - i) AS BIGINT))) AS BIGINT)
          & 2147483647 AS xv
      FROM h),
r AS (SELECT event_type, xv & 4095 AS j, xv >> 12 AS w FROM x),
rho AS (SELECT event_type, j,
        MAX(CASE WHEN w = 0 THEN 20
            ELSE 19 - length(ltrim(bin(w), '0')) + 1 END) AS rho
        FROM r GROUP BY 1, 2),
grid AS (SELECT event_type, gj AS j
         FROM (SELECT DISTINCT event_type FROM events)
         CROSS JOIN (SELECT unnest(generate_series(0, 4095)) AS gj)),
regs AS (SELECT g.event_type, COALESCE(rho.rho, 0) AS M
         FROM grid g LEFT JOIN rho
           ON g.event_type = rho.event_type AND g.j = rho.j),
s AS (SELECT event_type,
        SUM(power(2.0, -M)) AS sp,
        SUM(CASE WHEN M = 0 THEN 1 ELSE 0 END) AS V
      FROM regs GROUP BY 1),
est AS (SELECT event_type,
        (1.0 / (2.0 * ln(2.0))) * 4096 * 4096 / sp AS E, V FROM s)
SELECT event_type,
  CAST(CASE
    WHEN E <= 8192 AND V <> 0 THEN TRUNC(4096 * ln(4096.0 / V))
    WHEN E <= 8192 THEN TRUNC(E)
    WHEN E <= 143165576 THEN TRUNC(E)
    ELSE TRUNC(-4294967296.0 * ln(1.0 - E / 4294967296.0))
  END AS BIGINT) AS n_users_hll
FROM est
"""

# ---------------------------------------------------------------------------
# LLM-pipeline operators (documents / embeddings). Canonical fragments
# mirror flinkrunner_spark/llm/* expression-for-expression: md5 hashing
# (identical hex on both engines), integer-exact ratios, and identical
# left-fold dot products.

_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
    " x -> x <> '')"
)

ORACLES["docs_tokens"] = """
SELECT doc_id,
  CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
       AS INTEGER) AS n_ws_tokens,
  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))
       AS INTEGER) AS n_bpe_tokens,
  CAST(length(text) AS INTEGER) AS n_chars_measured
FROM documents
"""

_LANGS = {
    "de": ("der", "und", "die", "das", "ist"),
    "en": ("the", "and", "a", "of", "data"),
    "es": ("el", "la", "de", "los", "es"),
    "fr": ("le", "la", "et", "les", "un"),
    "zh": ("de", "le", "shi", "bu", "wo"),
}
_VOTE = {
    lang: f"len(list_filter({_TOKS}, x -> x IN {w!r}))"
    for lang, w in _LANGS.items()
}
_BEST = "GREATEST(" + ", ".join(_VOTE[lang] for lang in sorted(_LANGS)) + ")"
_PRED = (
    "CASE "
    + " ".join(
        f"WHEN {_BEST} > 0 AND {_VOTE[lang]} = {_BEST} THEN '{lang}'"
        for lang in sorted(_LANGS)
    )
    + " ELSE 'und' END"
)

ORACLES["docs_langid"] = f"""
SELECT doc_id, lang AS lang_declared,
  {", ".join(f"CAST({_VOTE[lang]} AS INTEGER) AS votes_{lang}" for lang in sorted(_LANGS))},
  {_PRED} AS lang_pred
FROM documents
"""

_ALL_STOP = tuple(sorted({w for ws in _LANGS.values() for w in ws}))

ORACLES["docs_quality"] = f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS} AS toks FROM documents
), m AS (
  SELECT doc_id,
    CAST(len(toks) AS INTEGER) AS n_tokens,
    list_sum(list_transform(toks, x -> length(x))) AS tok_chars,
    length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS punct,
    length(text) AS n_chars,
    len(list_filter(toks, x -> x IN {_ALL_STOP!r})) AS stop_hits
  FROM t
)
SELECT doc_id, n_tokens,
  tok_chars / n_tokens AS avg_token_len,
  punct / n_chars AS punct_ratio,
  stop_hits / n_tokens AS stopword_ratio,
  (stop_hits / n_tokens) * CAST(2.0 AS DOUBLE)
    + CAST(1.0 AS DOUBLE)
      / (CAST(1.0 AS DOUBLE) + (punct / n_chars) * CAST(5.0 AS DOUBLE))
    + (tok_chars / n_tokens) / CAST(10.0 AS DOUBLE) AS quality_score
FROM m
"""

ORACLES["docs_fingerprint"] = f"""
SELECT doc_id, md5(array_to_string({_TOKS}, ' ')) AS fingerprint
FROM documents
"""

ORACLES["docs_dedup_exact"] = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_doc_id,
  COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""

_SHINGLES = f"""
  SELECT doc_id,
    CASE WHEN len(toks) >= 3
      THEN list_transform(generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      ELSE [array_to_string(toks, ' ')] END AS sh
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) t
"""

_MH = ", ".join(
    f"list_min(list_transform(sh, s -> md5('{j}:' || s))) AS mh{j}"
    for j in range(8)
)
_BANDS = ", ".join(
    f"md5('{b}:' || mh{2 * b} || mh{2 * b + 1})" for b in range(4)
)

_CAND = f"""
  WITH sh AS ({_SHINGLES}),
  sigs AS (SELECT doc_id, sh, {_MH} FROM sh),
  bands AS (SELECT doc_id, unnest([{_BANDS}]) AS band FROM sigs),
  ok AS (SELECT band FROM bands GROUP BY band HAVING COUNT(*) <= 1000)
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
  WHERE a.band IN (SELECT band FROM ok)
"""

ORACLES["docs_minhash_lsh"] = _CAND

ORACLES["docs_ngram_jaccard"] = f"""
WITH cand AS ({_CAND}),
sh AS ({_SHINGLES}),
d AS (SELECT doc_id, list_distinct(sh) AS shd FROM sh),
j AS (
  SELECT c.doc_a, c.doc_b,
    {_r6("len(list_intersect(a.shd, b.shd))"
         " / len(list_distinct(list_concat(a.shd, b.shd)))")} AS jaccard
  FROM cand c
  JOIN d a ON a.doc_id = c.doc_a
  JOIN d b ON b.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.2
"""

# Connected components via transitive closure (exact; the closure is
# quadratic only within a component, and dup components are tiny).
ORACLES["docs_dup_clusters"] = f"""
WITH RECURSIVE cand AS ({_CAND}),
sh AS ({_SHINGLES}),
d AS (SELECT doc_id, list_distinct(sh) AS shd FROM sh),
jp AS (
  SELECT doc_a, doc_b FROM (
    SELECT c.doc_a, c.doc_b,
      {_r6("len(list_intersect(a.shd, b.shd))"
           " / len(list_distinct(list_concat(a.shd, b.shd)))")} AS jaccard
    FROM cand c
    JOIN d a ON a.doc_id = c.doc_a
    JOIN d b ON b.doc_id = c.doc_b) t
  WHERE jaccard >= 0.2
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM jp
  UNION
  SELECT doc_b AS u, doc_a AS v FROM jp
),
reach(a, b) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
),
labels AS (
  SELECT a, MIN(b) AS min_reach FROM reach GROUP BY a
)
SELECT doc_id,
  COALESCE(LEAST(l.min_reach, doc_id), doc_id) AS cluster_id
FROM documents LEFT JOIN labels l ON doc_id = l.a
"""

ORACLES["docs_simhash"] = f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
h AS (SELECT doc_id, md5(tok) AS h FROM toks),
bits AS (
  SELECT doc_id, k,
    ((instr('0123456789abcdef', substring(h, CAST(k // 4 AS INTEGER) + 1, 1)) - 1)
      >> (3 - (k % 4))) & 1 AS bit
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 62)) AS k) ks
),
votes AS (
  SELECT doc_id, k, SUM(CASE WHEN bit = 1 THEN 1 ELSE -1 END) AS vote
  FROM bits GROUP BY doc_id, k
)
SELECT doc_id,
  CAST(SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << k)
                ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""

_DOTQ = (
    "list_reduce(list_transform(generate_series(1, len(embedding)),"
    " i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),"
    " (a, b) -> a + b)"
)
_EE = (
    "list_reduce(list_transform(generate_series(1, len(embedding)),"
    " i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),"
    " (a, b) -> a + b)"
)
_QQ = (
    "list_reduce(list_transform(generate_series(1, len(qv)),"
    " i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),"
    " (a, b) -> a + b)"
)

ORACLES["emb_knn"] = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, {_r6(f"{_DOTQ} / SQRT({_EE} * {_QQ})")} AS cosine
FROM embeddings CROSS JOIN q
WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id
LIMIT 10
"""

# IVF probe: per-label centroids (elementwise means), rank cells by
# centroid·query cosine, keep the top nprobe=2, exact top-k inside those
# cells only — the same pruned search the Spark plan runs. Centroid
# cosines are compared only ACROSS labels (well-separated), so engine-
# side summation-order ulps cannot flip the probe ranking.
_DOTCQ = (
    "list_reduce(list_transform(generate_series(1, len(centroid)),"
    " i -> centroid[i] * CAST(qv[i] AS DOUBLE)), (a, b) -> a + b)"
)
_CC = (
    "list_reduce(list_transform(generate_series(1, len(centroid)),"
    " i -> centroid[i] * centroid[i]), (a, b) -> a + b)"
)
ORACLES["emb_knn_ivf"] = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cent AS (
  SELECT label, list(cx ORDER BY pos) AS centroid FROM (
    SELECT label, pos, AVG(x) AS cx FROM (
      SELECT label,
        unnest(list_transform(embedding, e -> CAST(e AS DOUBLE))) AS x,
        unnest(generate_series(1, len(embedding))) AS pos
      FROM embeddings) u
    GROUP BY label, pos) t
  GROUP BY label
),
probe AS (
  SELECT label FROM cent CROSS JOIN q
  ORDER BY {_DOTCQ} / SQRT({_CC} * {_QQ}) DESC, label
  LIMIT 2
)
SELECT vec_id, {_r6(f"{_DOTQ} / SQRT({_EE} * {_QQ})")} AS cosine
FROM embeddings CROSS JOIN q
WHERE label IN (SELECT label FROM probe) AND vec_id <> 0
ORDER BY cosine DESC, vec_id
LIMIT 10
"""

_DOTAB = (
    "list_reduce(list_transform(generate_series(1, len(a.embedding)),"
    " i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),"
    " (x, y) -> x + y)"
)
_AA = (
    "list_reduce(list_transform(generate_series(1, len(a.embedding)),"
    " i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)),"
    " (x, y) -> x + y)"
)
_BB = (
    "list_reduce(list_transform(generate_series(1, len(b.embedding)),"
    " i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),"
    " (x, y) -> x + y)"
)

# emb_dup_pairs routes through the RH-LSH plan (r7 verdict item 1a: the
# label-blocked all-pairs form measured 25.4× time at 10× data — it
# survives as the guarded small-N baseline emb_dup_pairs_blocked, not a
# driver key); its oracle is the exact RH-LSH reproduction, assigned
# below once _rh_oracle_sql is defined.

# Random-hyperplane LSH near-dup: the ±1 plane matrix is deterministic
# (md5-derived, shared with the Spark side via rh_planes), so the whole
# pipeline — sign bits, band codes, candidate buckets, verified cosines —
# is exactly reproducible. Sign dots are left-fold list_reduce like every
# embedding oracle here, bit-identical to Spark's aggregate fold; planes
# are inlined as DOUBLE[] literals (bare list literals parse as DECIMAL).


def _rh_codes_cte() -> str:
    """The (vec_id, band, code) sign-code relation as inlined SQL — the
    driver runs correctness at sf0.01 (500 rows), where auto_bits clamps
    to the static RH_BITS, so the literal plane matrix matches the Spark
    side exactly."""
    from flinkrunner_spark.llm.similarity import RH_BANDS, RH_BITS, rh_planes

    planes = rh_planes()
    arms = []
    for b in range(RH_BANDS):
        bits = []
        for r in range(RH_BITS):
            w = planes[b * RH_BITS + r]
            lit = "[" + ",".join(str(x) for x in w) + "]::DOUBLE[]"
            d = (
                "list_reduce(list_transform(generate_series(1, len(embedding)),"
                f" i -> CAST(embedding[i] AS DOUBLE) * ({lit})[i]),"
                " (a, b) -> a + b)"
            )
            bits.append(f"(CASE WHEN {d} >= 0 THEN {1 << r} ELSE 0 END)")
        arms.append(
            f"SELECT vec_id, {b} AS band, "
            + " + ".join(bits)
            + " AS code FROM embeddings"
        )
    return "\nUNION ALL\n".join(arms)


def _rh_cand_ctes() -> str:
    """The shared candidate pipeline CTE block — sign codes, bucket
    sizes, the super-bucket cap (count-first, same semantics as the Spark
    anti-join), and the candidate pair set. Mirrors the Spark plan's
    probe resolution exactly: at the default τ=0.35 ``auto_probes``
    turns on flip-1 multi-probe, so a pair is a candidate when its codes
    in some band differ in ≤1 bit and BOTH endpoints sit in kept
    (uncapped) buckets — probe codes are xor-flips of each kept row's
    native code, matched against kept native codes."""
    from flinkrunner_spark.llm.similarity import (
        COSINE_DUP_THRESHOLD,
        RH_BITS,
        RH_MAX_BUCKET,
        auto_probes,
    )

    base = f"""codes AS MATERIALIZED (
{_rh_codes_cte()}
),
sizes AS (SELECT band, code, COUNT(*) AS n FROM codes GROUP BY band, code),
keep AS (SELECT band, code FROM sizes WHERE n <= {RH_MAX_BUCKET}),
kept AS MATERIALIZED (
  SELECT c.vec_id, c.band, c.code FROM codes c
  JOIN keep k ON c.band = k.band AND c.code = k.code
)"""
    if auto_probes(COSINE_DUP_THRESHOLD):
        return f"""{base},
probes AS (
  SELECT vec_id, band, code AS pcode FROM kept
  UNION ALL
  SELECT vec_id, band,
    xor(code, CAST(1 << CAST(r.range AS INTEGER) AS INTEGER)) AS pcode
  FROM kept CROSS JOIN range(0, {RH_BITS}) r
),
cand AS (
  SELECT DISTINCT LEAST(p.vec_id, n.vec_id) AS vec_a,
                  GREATEST(p.vec_id, n.vec_id) AS vec_b
  FROM probes p
  JOIN kept n ON p.band = n.band AND p.pcode = n.code
             AND p.vec_id <> n.vec_id
)"""
    return f"""{base},
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM kept a
  JOIN kept b ON a.band = b.band AND a.code = b.code
             AND a.vec_id < b.vec_id
)"""


def _rh_oracle_sql() -> str:
    return f"""
WITH {_rh_cand_ctes()}
SELECT vec_a, vec_b, cosine FROM (
  SELECT c.vec_a, c.vec_b,
    {_r6(f"{_DOTAB} / SQRT({_AA} * {_BB})")} AS cosine
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.vec_a
  JOIN embeddings b ON b.vec_id = c.vec_b) t
WHERE cosine >= 0.35
"""


def _rh_recall_oracle_sql() -> str:
    """Measured RH-LSH recall against the exact all-pairs baseline on the
    md5-bucketed sample. The driver runs at sf0.01 (500 rows), where the
    sample mod resolves to 1 (n ≤ RECALL_SAMPLE_CAP) — the row is TRUE
    corpus recall there; the hash predicate is kept structurally (mod 1)
    so the SQL mirrors the Spark plan shape. Baseline cosines are the
    same left-fold + Spark-parity round as every embedding oracle."""
    from flinkrunner_spark.llm.similarity import (
        COSINE_DUP_THRESHOLD,
        RH_BANDS,
        RH_BITS,
        auto_probes,
    )

    probes = auto_probes(COSINE_DUP_THRESHOLD)
    return f"""
WITH {_rh_cand_ctes()},
lsh AS (
  SELECT vec_a, vec_b FROM (
    SELECT c.vec_a, c.vec_b,
      {_r6(f"{_DOTAB} / SQRT({_AA} * {_BB})")} AS cosine
    FROM cand c
    JOIN embeddings a ON a.vec_id = c.vec_a
    JOIN embeddings b ON b.vec_id = c.vec_b) t
  WHERE cosine >= 0.35
),
sample AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE CAST(list_sum(list_transform(generate_series(1, 8),
      i -> (instr('0123456789abcdef',
              substring(md5(CAST(vec_id AS VARCHAR) || ':rhrecall:v1'),
                        CAST(i AS INT), 1)) - 1)
           * CAST(power(16, 8 - i) AS BIGINT))) AS BIGINT) % 1 = 0
),
truep AS (
  SELECT vec_a, vec_b FROM (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      {_r6(f"{_DOTAB} / SQRT({_AA} * {_BB})")} AS cosine
    FROM sample a JOIN sample b ON a.vec_id < b.vec_id) t
  WHERE cosine >= 0.35
),
flag AS (
  SELECT t.vec_a, t.vec_b,
    CASE WHEN l.vec_a IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM truep t
  LEFT JOIN lsh l ON t.vec_a = l.vec_a AND t.vec_b = l.vec_b
)
SELECT (SELECT COUNT(*) FROM sample) AS n_sample,
  CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
  CAST(SUM(hit) AS BIGINT) AS n_found_pairs,
  CASE WHEN COUNT(*) > 0
       THEN {_r6("SUM(hit) * 1.0 / COUNT(*)")}
       ELSE 1.0 END AS recall,
  CAST({RH_BITS} AS INTEGER) AS bits,
  CAST({RH_BANDS} AS INTEGER) AS bands,
  CAST({probes} AS INTEGER) AS probes
FROM flag
"""


def _rh_stats_oracle_sql() -> str:
    from flinkrunner_spark.llm.similarity import RH_MAX_BUCKET

    return f"""
WITH codes AS (
{_rh_codes_cte()}
),
sizes AS (SELECT band, code, COUNT(*) AS n FROM codes GROUP BY band, code)
SELECT COUNT(*) AS n_buckets,
  CAST(MAX(n) AS BIGINT) AS max_bucket_size,
  CAST(SUM(CASE WHEN n > {RH_MAX_BUCKET} THEN 1 ELSE 0 END) AS BIGINT)
    AS dropped_buckets
FROM sizes
"""


ORACLES["emb_dup_pairs_rhlsh"] = _rh_oracle_sql()
ORACLES["emb_dup_pairs"] = _rh_oracle_sql()  # default surface = RH-LSH
ORACLES["rhlsh_bucket_stats"] = _rh_stats_oracle_sql()
ORACLES["rhlsh_recall_stats"] = _rh_recall_oracle_sql()


def _rh_clusters_oracle_sql() -> str:
    """Connected components over the RH-LSH near-dup pair graph via
    transitive closure (exact; dup components are tiny) — the embedding
    twin of the docs_dup_clusters oracle."""
    return f"""
WITH RECURSIVE {_rh_cand_ctes()},
lsh AS MATERIALIZED (
  SELECT vec_a, vec_b FROM (
    SELECT c.vec_a, c.vec_b,
      {_r6(f"{_DOTAB} / SQRT({_AA} * {_BB})")} AS cosine
    FROM cand c
    JOIN embeddings a ON a.vec_id = c.vec_a
    JOIN embeddings b ON b.vec_id = c.vec_b) t
  WHERE cosine >= 0.35
),
edges AS MATERIALIZED (
  SELECT vec_a AS u, vec_b AS v FROM lsh
  UNION
  SELECT vec_b AS u, vec_a AS v FROM lsh
),
reach(a, b) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
),
labels AS (
  SELECT a, MIN(b) AS min_reach FROM reach GROUP BY a
)
SELECT vec_id,
  COALESCE(LEAST(l.min_reach, vec_id), vec_id) AS cluster_id
FROM embeddings LEFT JOIN labels l ON vec_id = l.a
"""


ORACLES["emb_dup_clusters"] = _rh_clusters_oracle_sql()
# the streaming twin accumulates the SAME bucket index as the batch plan
# (order-independent id-set state), so the batch oracle carries over
ORACLES["stream_emb_dup_pairs"] = _rh_oracle_sql()

ORACLES["mm_meta"] = """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
  CASE octet_length(encode(text)) % 3
    WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
    ELSE 'video/mp4' END AS mime,
  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
  CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height
FROM documents
"""

# end-to-end curation pipeline: compose the already-defined stage oracles
# as CTEs (duckdb allows a nested WITH [RECURSIVE] inside a CTE body).
# r13: the language stage is the NB trigram classifier's oracle (the
# SAME trained profile VALUES table docs_langid_ngram verifies against),
# matching the pipeline's production langid screen.
from flinkrunner_spark.llm.text import langid_ngram_oracle_sql as _langid_ngram_sql  # noqa: E402

ORACLES["docs_pipeline"] = f"""
WITH exact_keep AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
clusters AS ({ORACLES["docs_dup_clusters"]}),
q AS ({ORACLES["docs_quality"]}),
l AS ({_langid_ngram_sql()}),
tk AS ({ORACLES["docs_tokens"]})
SELECT q.doc_id, l.lang_pred, q.quality_score, tk.n_bpe_tokens
FROM q
JOIN l ON q.doc_id = l.doc_id
JOIN tk ON q.doc_id = tk.doc_id
WHERE q.doc_id IN (SELECT doc_id FROM exact_keep)
  AND q.doc_id IN (SELECT doc_id FROM clusters WHERE cluster_id = doc_id)
  AND q.quality_score >= 1.58
  AND l.lang_pred <> 'und'
"""

ORACLES["mm_frames"] = """
SELECT doc_id,
  CAST(frame_idx AS INTEGER) AS frame_idx,
  md5(text || ':' || frame_idx) AS frame_md5
FROM documents,
  LATERAL (SELECT unnest(generate_series(0,
             octet_length(encode(text)) % 120, 10)) AS frame_idx) f
WHERE octet_length(encode(text)) % 3 = 2
"""

ORACLES["cube_sales"] = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""

ORACLES["connected_union"] = """
SELECT event_id, ts, user_id, value, 'purchase' AS src
FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT event_id, ts, user_id, value, 'click' AS src
FROM events WHERE event_type = 'click'
"""

ORACLES["win_ema"] = f"""
SELECT date_trunc('hour', ts) AS window_start,
  date_trunc('hour', ts) + INTERVAL '1 hour' AS window_end,
  event_type,
  {_r6(f"list_reduce(list(value ORDER BY ts, event_id),"
       f" (acc, x) -> acc * {_OMA} + x * {_A})")} AS agg_ema
FROM events GROUP BY 1, 2, 3
"""

# streaming mirror computes the identical result to the batch plan
ORACLES["stream_win_tumbling"] = ORACLES["win_tumbling"]
ORACLES["stream_win_ema"] = ORACLES["win_ema"]
ORACLES["stream_enrich"] = ORACLES["enrich_events"]
ORACLES["stream_win_session"] = ORACLES["win_session"]
ORACLES["stream_win_sliding"] = ORACLES["win_sliding"]

# append-mode (watermark-finalized) streaming windows emit exactly the
# batch windows already CLOSED by the final watermark: window_end ≤
# max(event time) − lateness (30 minutes; plans/events.APPEND_LATENESS).
# Window ends are bucket-aligned and the watermark carries raw sub-second
# event time, so the ≤ boundary is never ambiguous on this data.
_WM = "(SELECT max(ts) - INTERVAL '30 minutes' FROM events)"
for _append, _base in [
    ("stream_win_tumbling_append", "win_tumbling"),
    ("stream_win_sliding_append", "win_sliding"),
    ("stream_win_session_append", "win_session"),
]:
    ORACLES[_append] = (
        f"SELECT * FROM ({ORACLES[_base]}) WHERE window_end <= {_WM}"
    )

_P6 = "CAST(l_extendedprice AS DECIMAL(18,6))"
ORACLES["q6_forecast"] = f"""
SELECT
  CAST(CAST(CAST(SUM({_P6} * CAST(l_discount AS DECIMAL(8,6))) AS DECIMAL(24,6)) AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

ORACLES["stream_interval_join"] = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
  p.ts AS p_ts, c.ts AS c_ts
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR
 AND c.ts <= p.ts
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""

# -- Q2/Q9/Q11/Q16/Q20 family (partsupp derived from lineitem; see
# -- plans/analytics.py docstrings for the re-expression rationale) --

ORACLES["q2_mincost"] = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT n_nationkey, n_name FROM nation
  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'
), cand AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_size, supply_cost
  FROM ps
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN eu ON s_nationkey = n_nationkey
  WHERE p_type = 'LARGE' AND p_size <= 25
), minc AS (
  SELECT p_partkey AS mp_partkey, MIN(supply_cost) AS min_cost
  FROM cand GROUP BY p_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_size, supply_cost
FROM cand JOIN minc ON p_partkey = mp_partkey AND supply_cost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

ORACLES["q9_profit"] = f"""
SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
  CAST(CAST(
    CAST(SUM({_PRICE} * {_DISC}) AS DECIMAL(24,6))
    - CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(24,6))
  AS VARCHAR) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, YEAR(o_orderdate)
"""

ORACLES["q11_important"] = """
WITH li AS (
  SELECT l_partkey, l_extendedprice
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), val AS (
  SELECT l_partkey,
    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS part_value
  FROM li GROUP BY l_partkey
), total AS (
  SELECT
    CAST(CAST(SUM(CAST(part_value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value,
    COUNT(*) AS n_parts
  FROM val
)
SELECT l_partkey, part_value
FROM val, total
WHERE part_value > CAST(1.5 AS DOUBLE) * (total_value / n_parts)
"""

ORACLES["q16_suppcnt"] = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p_brand, p_type, p_size
"""

ORACLES["q20_excess"] = """
WITH li AS (
  SELECT l_partkey, l_suppkey, l_quantity
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'large%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
), per_supp AS (
  SELECT l_partkey, l_suppkey,
    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS supp_qty
  FROM li GROUP BY l_partkey, l_suppkey
), per_part AS (
  SELECT l_partkey AS pp_partkey,
    CAST(CAST(SUM(CAST(supp_qty AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS part_qty,
    COUNT(*) AS n_supp
  FROM per_supp GROUP BY l_partkey
), excess AS (
  SELECT DISTINCT l_suppkey
  FROM per_supp JOIN per_part ON l_partkey = pp_partkey
  WHERE supp_qty > CAST(1.5 AS DOUBLE) * (part_qty / n_supp)
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (SELECT l_suppkey FROM excess)
ORDER BY s_name
"""

# streaming HLL mirror: register max-merge is batch-order-independent, so
# the final state equals the batch merge — same exact oracle.
ORACLES["stream_hll_users"] = ORACLES["hll_users"]

# streaming control gate: availableNow single-batch mirror processes rows in
# (ts, control-first, tiebreak) order — identical to the batch as-of window.
ORACLES["stream_filter_by_control"] = ORACLES["filter_by_control"]

# streaming keep-first dedup: single-batch mirror's first arrival is the
# (ts, event_id) minimum — same result as the batch window dedup.
ORACLES["stream_dedup_first"] = ORACLES["dedup_first"]

# streaming as-of join: single-batch mirror's (ts, right-first, id) order
# reproduces the batch sorted-merge as-of exactly.
ORACLES["stream_asof_join"] = ORACLES["asof_join"]

# windowless streaming aggregation (complete mode): decimal-exact aggregates
# are micro-batch-order-independent — identical to the batch result.
ORACLES["stream_agg_basic"] = ORACLES["agg_basic"]
# update mode: the mirror keeps the LAST emission per key, and cumulative
# state makes that the full-input aggregate — same batch oracle.
ORACLES["stream_agg_basic_update"] = ORACLES["agg_basic"]

# deterministic split assignment: first 32 bits of md5(doc_id || salt) mod
# 100 (hex parsed with the same digit-sum idiom as the HLL oracle).
ORACLES["docs_split"] = """
WITH h AS (
  SELECT doc_id,
    md5(CONCAT(CAST(doc_id AS VARCHAR), ':split:v1')) AS hx
  FROM documents
), b AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(generate_series(1, 8),
      i -> (instr('0123456789abcdef', substring(hx, CAST(i AS INT), 1)) - 1)
           * CAST(power(16, 8 - i) AS BIGINT))) AS BIGINT) % 100 AS bucket
  FROM h
)
SELECT doc_id, bucket,
  CASE WHEN bucket < 90 THEN 'train'
       WHEN bucket < 95 THEN 'val'
       ELSE 'test' END AS split
FROM b
"""

# ---------------------------------------------------------------------------
# round 4: curation + similarity extensions
# ---------------------------------------------------------------------------

# eval-set decontamination: deterministic 1-in-10 md5 eval bucket (same
# digit-sum hex-parse idiom as docs_split), distinct-shingle overlap
# against the eval inventory, contamination at >= 0.2 overlap fraction.
_EVALB = """
  SELECT doc_id,
    CAST(list_sum(list_transform(generate_series(1, 8),
      i -> (instr('0123456789abcdef',
              substring(md5(CAST(doc_id AS VARCHAR) || ':eval:v1'),
                        CAST(i AS INT), 1)) - 1)
           * CAST(power(16, 8 - i) AS BIGINT))) AS BIGINT) % 10 AS eb
  FROM documents
"""

ORACLES["docs_decontaminate"] = f"""
WITH sh AS ({_SHINGLES}),
d AS (SELECT doc_id, list_distinct(sh) AS shd FROM sh),
b AS ({_EVALB}),
ev AS (
  SELECT DISTINCT unnest(shd) AS s
  FROM d JOIN b USING (doc_id) WHERE eb = 0
),
train AS (SELECT d.doc_id, d.shd FROM d JOIN b USING (doc_id) WHERE eb <> 0),
hits AS (
  SELECT doc_id, COUNT(*) AS n_overlap
  FROM (SELECT doc_id, unnest(shd) AS s FROM train) t
  JOIN ev USING (s)
  GROUP BY doc_id
)
SELECT t.doc_id,
  CAST(len(t.shd) AS INTEGER) AS n_shingles,
  COALESCE(h.n_overlap, 0) AS n_overlap,
  COALESCE(h.n_overlap, 0) / len(t.shd) AS overlap_frac,
  COALESCE(h.n_overlap, 0) / len(t.shd) >= CAST(0.2 AS DOUBLE) AS contaminated
FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
"""


# PII detect/redact: fixture augmentation (every 3rd/5th/7th doc gains an
# email/phone/SSN derived from doc_id), counts BEFORE redaction, then the
# same sequential regexp_replace chain Spark runs ('g' = replace-all, which
# is Spark's default). Patterns shared with the Spark side via import.
def _pii_oracle_sql() -> str:
    from flinkrunner_spark.llm.curation import PII_PATTERNS

    counts = ",\n  ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS INTEGER) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    red = "text"
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"""
WITH a1 AS (
  SELECT doc_id, CASE WHEN doc_id % 3 = 0
    THEN text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com'
    ELSE text END AS text
  FROM documents
), a2 AS (
  SELECT doc_id, CASE WHEN doc_id % 5 = 0
    THEN text || ' call ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
         || '-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
    ELSE text END AS text
  FROM a1
), a3 AS (
  SELECT doc_id, CASE WHEN doc_id % 7 = 0
    THEN text || ' ssn ' || lpad(CAST(doc_id % 900 AS VARCHAR), 3, '0')
         || '-' || lpad(CAST(doc_id % 90 AS VARCHAR), 2, '0')
         || '-' || lpad(CAST(doc_id % 9000 AS VARCHAR), 4, '0')
    ELSE text END AS text
  FROM a2
)
SELECT doc_id,
  {counts},
  md5({red}) AS redacted_md5
FROM a3
"""


ORACLES["docs_pii_redact"] = _pii_oracle_sql()

# Gopher-style repetition signals: duplicate-token and duplicate-2-gram
# occurrence fractions + most-frequent-2-gram fraction, all exact-int
# ratios (the corpus is single-line, so line-level fractions degenerate).
ORACLES["docs_repetition"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tokc AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS tok FROM t) x
  GROUP BY doc_id, tok
),
ts AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
    CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_tok
  FROM tokc GROUP BY doc_id
),
g AS (
  SELECT doc_id, CASE WHEN len(toks) >= 2
    THEN list_transform(generate_series(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i + 1])
    ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM t
),
gramc AS (
  SELECT doc_id, g2, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(grams) AS g2 FROM g) x
  GROUP BY doc_id, g2
),
gs AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_2grams,
    CAST(MAX(c) AS BIGINT) AS top_2gram,
    CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_2gram
  FROM gramc GROUP BY doc_id
)
SELECT ts.doc_id, ts.n_tokens,
  ts.dup_tok / ts.n_tokens AS dup_token_frac,
  COALESCE(gs.n_2grams, 0) AS n_2grams,
  COALESCE(gs.top_2gram / gs.n_2grams, CAST(0.0 AS DOUBLE)) AS top_2gram_frac,
  COALESCE(gs.dup_2gram / gs.n_2grams, CAST(0.0 AS DOUBLE)) AS dup_2gram_frac
FROM ts LEFT JOIN gs ON ts.doc_id = gs.doc_id
"""

# Deterministic centroid table shared by docs_cluster_assign/emb_knn_join:
# per-(label, pos) mean as a LEFT FOLD OVER SORTED values — exactly the
# Spark plan's aggregate(array_sort(collect_list(x)), 0.0, +)/count fold
# (init 0.0 + x1 == x1 bit-exact), so centroid components are
# order-independent and bit-identical cross-engine, unlike AVG whose
# partial-merge order floats (fine for emb_knn_ivf's cell RANKING, not
# for output values).
# two-level fixed-fan-in fold, mirroring similarity._label_centroids
# bit-for-bit: rank-chunked sorted folds (<=4096 values each), then a
# fold over the chunk sums in chunk order. With one chunk per group (all
# test scales) this degenerates to the flat sorted fold exactly.
_CENT_FOLD = """
  SELECT label, list(cx ORDER BY pos) AS centroid FROM (
    SELECT label, pos,
      list_reduce(list(csum ORDER BY chunk), (a, b) -> a + b)
        / SUM(cnt) AS cx
    FROM (
      SELECT label, pos, chunk,
        list_reduce(list(x ORDER BY x), (a, b) -> a + b) AS csum,
        COUNT(x) AS cnt
      FROM (
        SELECT label, pos, x,
          CAST(FLOOR((row_number() OVER (PARTITION BY label, pos ORDER BY x)
                      - 1) / 4096) AS INTEGER) AS chunk
        FROM (
          SELECT label,
            unnest(list_transform(embedding, e -> CAST(e AS DOUBLE))) AS x,
            unnest(generate_series(1, len(embedding))) AS pos
          FROM embeddings) u) w
      GROUP BY label, pos, chunk) c
    GROUP BY label, pos) t
  GROUP BY label
"""

_DOT_EC = (
    "list_reduce(list_transform(generate_series(1, len(embedding)),"
    " i -> CAST(embedding[i] AS DOUBLE) * centroid[i]),"
    " (a, b) -> a + b)"
)

ORACLES["docs_cluster_assign"] = f"""
WITH cent AS ({_CENT_FOLD}),
sc AS (
  SELECT e.vec_id, e.label, c.label AS clabel,
    {_r6(f"{_DOT_EC} / SQRT({_EE} * {_CC})")} AS cos
  FROM embeddings e CROSS JOIN cent c
),
r AS (
  SELECT vec_id, label, clabel, cos,
    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, clabel) AS rn
  FROM sc
)
SELECT vec_id, label, clabel AS assigned_label, cos AS cosine
FROM r WHERE rn = 1
"""

# emb_knn_join itself is rows-only since r8: it probes a LEARNED
# corpus-scaled quantizer (iterative Lloyd's — not SQL-expressible; r7
# verdict item 1b replaced the quadratic label-cell plan). Its full
# numpy mirror lives in tests/test_algorithms.py; the exactly-oracled
# companion below runs the deterministic label cells over a CONSTANT
# md5-ordered query block (the cap is a no-op at the driver's sf0.01 —
# 20 queries < 256 — so these values match the key's pre-r8 green rows).
ORACLES["emb_knn_join_label"] = f"""
WITH q AS (
  SELECT q_vec_id, qv FROM (
    SELECT vec_id AS q_vec_id, embedding AS qv,
      md5(CAST(vec_id AS VARCHAR) || ':knnq:v1') AS h
    FROM embeddings WHERE vec_id % 25 = 0
    ORDER BY h, q_vec_id LIMIT 256) capped
),
cent AS ({_CENT_FOLD}),
pr AS (
  SELECT q_vec_id, qv, label, ccos,
    row_number() OVER (PARTITION BY q_vec_id ORDER BY ccos DESC, label) AS crk
  FROM (
    SELECT q.q_vec_id, q.qv, c.label,
      {_r6(f"{_DOTCQ} / SQRT({_CC} * {_QQ})")} AS ccos
    FROM q CROSS JOIN cent c) s
),
probe AS (SELECT q_vec_id, qv, label FROM pr WHERE crk <= 2),
sel AS (
  SELECT p.q_vec_id, e.vec_id,
    {_r6(f"{_DOTQ} / SQRT({_EE} * {_QQ})")} AS cosine
  FROM probe p JOIN embeddings e
    ON e.label = p.label AND e.vec_id <> p.q_vec_id
)
SELECT q_vec_id, vec_id, cosine, CAST(rk AS INTEGER) AS rk FROM (
  SELECT q_vec_id, vec_id, cosine,
    row_number() OVER (PARTITION BY q_vec_id ORDER BY cosine DESC, vec_id) AS rk
  FROM sel) t
WHERE rk <= 5
"""

# LSH bucket-health stats: the no-silent-truncation signal for the
# super-bucket cap in _candidate_pairs (same bands pipeline, count-only).
ORACLES["docs_lsh_stats"] = f"""
WITH sh AS ({_SHINGLES}),
sigs AS (SELECT doc_id, sh, {_MH} FROM sh),
bands AS (SELECT doc_id, unnest([{_BANDS}]) AS band FROM sigs),
sizes AS (SELECT band, COUNT(*) AS n FROM bands GROUP BY band)
SELECT COUNT(*) AS n_buckets,
  CAST(MAX(n) AS BIGINT) AS max_bucket_size,
  CAST(SUM(CASE WHEN n > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS dropped_buckets
FROM sizes
"""

# ——— round 5: vocabulary / tf-idf / sampling / packing / semantic dedup ———
# Each mirrors its llm/ operator expression-for-expression (md5 buckets,
# integer-exact ratios, left-fold dot products, rank on ROUNDED scores).

ORACLES["docs_topk_ngrams"] = f"""
WITH t AS (SELECT {_TOKS} AS toks FROM documents),
uni AS (SELECT unnest(toks) AS ngram, 1 AS n FROM t),
bi AS (
  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1])) AS ngram, 2 AS n
  FROM t WHERE len(toks) >= 2
),
c AS (
  SELECT n, ngram, COUNT(*) AS cnt
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi) u
  GROUP BY n, ngram
)
SELECT CAST(n AS INTEGER) AS n, ngram, cnt
FROM c ORDER BY cnt DESC, n, ngram LIMIT 100
"""

ORACLES["docs_tfidf"] = f"""
WITH terms AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
ntok AS (SELECT doc_id, SUM(tf) AS n_tok FROM tf GROUP BY doc_id),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
sc AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
    {_r6("(tf.tf / ntok.n_tok) * (nd.n_docs / df.df)")} AS score
  FROM tf JOIN ntok USING (doc_id) JOIN df USING (term) CROSS JOIN nd
)
SELECT doc_id, term, tf, df, score, CAST(rk AS INTEGER) AS rk FROM (
  SELECT doc_id, term, tf, df, score,
    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
  FROM sc) t
WHERE rk <= 3
"""

_STRATA_RATE = (
    "CASE lang WHEN 'de' THEN 10000 WHEN 'en' THEN 5000 WHEN 'es' THEN 2500 "
    "WHEN 'fr' THEN 2500 WHEN 'zh' THEN 10000 ELSE 1000 END"
)

def _hex8_to_long(hx: str) -> str:
    """First-8-hex-chars → BIGINT via the digit-sum parse (same idiom as
    the docs_split oracle — duckdb-version-proof, no from_hex/BLOB)."""
    return (
        f"CAST(list_sum(list_transform(generate_series(1, 8), "
        f"i -> (instr('0123456789abcdef', substring({hx}, CAST(i AS INT), 1)) - 1) "
        f"* CAST(power(16, 8 - i) AS BIGINT))) AS BIGINT)"
    )


ORACLES["docs_stratified_sample"] = f"""
SELECT doc_id, lang, bucket FROM (
  SELECT doc_id, lang,
    {_hex8_to_long("md5(CAST(doc_id AS VARCHAR) || ':strata:v1')")}
      % 10000 AS bucket,
    {_STRATA_RATE} AS rate
  FROM documents) t
WHERE bucket < rate
"""

ORACLES["docs_pack_sequences"] = f"""
WITH base AS (
  SELECT doc_id,
    md5(CAST(doc_id AS VARCHAR) || ':pack:v1') AS h,
    {_hex8_to_long("md5(CAST(doc_id AS VARCHAR) || ':pack:v1')")}
      % 64 AS shard,
    len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))
      AS n_tokens
  FROM documents
)
SELECT doc_id, CAST(shard AS INTEGER) AS shard,
  CAST(FLOOR((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
  CAST(n_tokens AS INTEGER) AS n_tokens
FROM (
  SELECT doc_id, shard, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM base) t
"""

ORACLES["emb_semantic_dedup"] = f"""
WITH cent AS ({_CENT_FOLD}),
sc AS (
  SELECT e.vec_id, c.label AS clabel,
    {_r6(f"{_DOT_EC} / SQRT({_EE} * {_CC})")} AS cos
  FROM embeddings e CROSS JOIN cent c
),
asg AS (
  SELECT vec_id, clabel AS assigned_label FROM (
    SELECT vec_id, clabel,
      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, clabel) AS rn
    FROM sc) r WHERE rn = 1
),
m AS (
  SELECT g.assigned_label, e.vec_id, e.embedding
  FROM asg g JOIN embeddings e USING (vec_id)
),
dropped AS (
  SELECT DISTINCT b.vec_id FROM m a JOIN m b
    ON a.assigned_label = b.assigned_label AND a.vec_id < b.vec_id
  WHERE {_r6(f"{_DOTAB} / SQRT({_AA} * {_BB})")} >= 0.35
)
SELECT g.vec_id, g.assigned_label, (d.vec_id IS NULL) AS keep
FROM asg g LEFT JOIN dropped d ON g.vec_id = d.vec_id
"""

# Connector roundtrips: the oracle aggregates the ORIGINAL parquet — a
# green row proves the sink->source path lost/mangled nothing.
from flinkrunner_spark.plans.connectors import LANG_PROFILE_ORACLE as _LPO  # noqa: E402

ORACLES["iceberg_roundtrip"] = _LPO
ORACLES["avro_roundtrip"] = _LPO
# r6: the AMQP queue roundtrip and the REST-catalog-published table both
# profile back to the identical aggregate over the original parquet
ORACLES["rabbitmq_roundtrip"] = _LPO
ORACLES["iceberg_catalog_roundtrip"] = _LPO
ORACLES["iceberg_glue_roundtrip"] = _LPO
ORACLES["iceberg_nessie_roundtrip"] = _LPO
# hive catalog wiring changes discovery, not data — same exact profile
ORACLES["iceberg_hive_roundtrip"] = _LPO
ORACLES["firehose_roundtrip"] = _LPO
ORACLES["cassandra_roundtrip"] = _LPO
# r6: the kafka wire roundtrip (native jar-free transport through the
# loopback broker) profiles back to the same aggregate
ORACLES["kafka_roundtrip"] = _LPO
ORACLES["stream_kafka_roundtrip"] = _LPO
# SASL/PLAIN + read_committed transport wrapper: same data plane,
# same exact profile oracle (security must not change a single row)
ORACLES["kafka_sasl_roundtrip"] = _LPO
ORACLES["kafka_avro_roundtrip"] = _LPO
ORACLES["kafka_glue_avro_roundtrip"] = _LPO
ORACLES["stream_rabbitmq_roundtrip"] = _LPO
ORACLES["kinesis_roundtrip"] = _LPO
ORACLES["kinesis_efo_roundtrip"] = _LPO
ORACLES["stream_kinesis_roundtrip"] = _LPO
ORACLES["elasticsearch_roundtrip"] = _LPO

# r6: position-delete roundtrip — survivors of a row-level DELETE equal
# the original parquet under the same predicate
from flinkrunner_spark.plans.connectors import DELETE_PROFILE_ORACLE as _DPO  # noqa: E402

ORACLES["iceberg_delete_roundtrip"] = _DPO

from flinkrunner_spark.plans.connectors import JDBC_PROFILE_ORACLE as _JPO  # noqa: E402

ORACLES["jdbc_roundtrip"] = _JPO

from flinkrunner_spark.plans.connectors import PRUNED_SCAN_ORACLE as _PSO  # noqa: E402

ORACLES["iceberg_pruned_scan"] = _PSO

ORACLES["docs_dup_spans"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
    md5(array_to_string(list_slice(toks, CAST(i AS INT),
                                   CAST(i + 19 AS INT)), ' ')) AS span_hash
  FROM t CROSS JOIN unnest(generate_series(1, len(toks) - 19, 10)) AS u(i)
  WHERE len(toks) >= 20
)
SELECT span_hash, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ,
  MIN(doc_id) AS min_doc_id
FROM s GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2
"""

# span REMOVAL: same md5 windows; a window is removed from every doc but
# the hash's minimum doc_id; token p survives iff no removed window
# covers it; survivors re-join with single spaces (normalized-token text)
ORACLES["docs_remove_dup_spans"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
w AS (
  SELECT doc_id, CAST(i AS INT) AS i,
    md5(array_to_string(list_slice(toks, CAST(i AS INT),
                                   CAST(i + 19 AS INT)), ' ')) AS span_hash
  FROM t CROSS JOIN unnest(generate_series(1, len(toks) - 19, 10)) AS u(i)
  WHERE len(toks) >= 20
),
dup AS (
  SELECT span_hash, MIN(doc_id) AS owner FROM w
  GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2
),
rm AS (
  SELECT w.doc_id, list(DISTINCT w.i) AS rm
  FROM w JOIN dup USING (span_hash)
  WHERE w.doc_id > dup.owner
  GROUP BY w.doc_id
),
m AS (
  SELECT t.doc_id, t.toks, COALESCE(rm.rm, CAST([] AS INT[])) AS rm
  FROM t LEFT JOIN rm USING (doc_id)
),
k AS (
  SELECT doc_id, toks, rm,
    list_filter(generate_series(1, len(toks)),
      p -> len(list_filter(rm, s -> p >= s AND p < s + 20)) = 0) AS kept
  FROM m
)
SELECT doc_id,
  COALESCE(
    array_to_string(list_transform(kept, p -> toks[CAST(p AS INT)]), ' '),
    '') AS clean_text,
  CAST(len(toks) - len(kept) AS BIGINT) AS n_tokens_removed,
  CAST(len(rm) AS BIGINT) AS n_spans_removed
FROM k
"""

from flinkrunner_spark.plans.connectors import UPSERT_ORACLE as _UPO  # noqa: E402

ORACLES["iceberg_upsert_roundtrip"] = _UPO

# ——— round 5 (second half): filter screens / shuffle / mixture / semantic
# decontamination — each mirrors its operator expression-for-expression.

from flinkrunner_spark.llm.filters import (  # noqa: E402
    BADWORDS as _BW,
    GOPHER_MAX_MEAN_WORD_LEN as _GXL,
    GOPHER_MAX_WORDS as _GXW,
    GOPHER_MIN_MEAN_WORD_LEN as _GNL,
    GOPHER_MIN_STOPWORDS as _GNS,
    GOPHER_MIN_WORDS as _GNW,
    GOPHER_STOPWORDS as _GSW,
)

_GSW_SQL = "[" + ", ".join(f"'{s}'" for s in _GSW) + "]"

ORACLES["docs_gopher_rules"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
    CAST(len(toks) AS INTEGER) AS n_words,
    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT)
      AS sum_len,
    CAST(len(list_intersect(list_distinct(toks), {_GSW_SQL})) AS INTEGER)
      AS stopword_hits
  FROM t
)
SELECT doc_id, n_words,
  {_r6("sum_len / n_words")} AS mean_word_len,
  stopword_hits,
  (n_words >= {_GNW} AND n_words <= {_GXW}) AS pass_words,
  (sum_len / n_words >= {_GNL} AND sum_len / n_words <= {_GXL})
    AS pass_word_len,
  (stopword_hits >= {_GNS}) AS pass_stopwords,
  ((n_words >= {_GNW} AND n_words <= {_GXW})
   AND (sum_len / n_words >= {_GNL} AND sum_len / n_words <= {_GXL})
   AND stopword_hits >= {_GNS}) AS keep
FROM m
"""

_BW_SQL = "[" + ", ".join(f"'{b}'" for b in _BW) + "]"

ORACLES["docs_badwords"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id,
  CAST(len(list_filter(toks, x -> list_contains({_BW_SQL}, x)))
    AS INTEGER) AS n_bad,
  (len(list_filter(toks, x -> list_contains({_BW_SQL}, x))) = 0) AS keep
FROM t
"""

from flinkrunner_spark.llm.sampling import (  # noqa: E402
    MIXTURE_TARGETS as _MIX,
    SHUFFLE_SHARDS as _NSH,
)

ORACLES["docs_shuffle_shards"] = f"""
WITH b AS (
  SELECT doc_id,
    md5(CAST(doc_id AS VARCHAR) || ':shuffle:v1') AS h,
    {_hex8_to_long("md5(CAST(doc_id AS VARCHAR) || ':shuffle:v1')")}
      % {_NSH} AS shard
  FROM documents
)
SELECT doc_id, CAST(shard AS INTEGER) AS shard,
  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
    AS INTEGER) AS pos
FROM b
"""

_MIX_PCT = (
    "CASE lang "
    + " ".join(
        f"WHEN '{lang}' THEN {pct}" for lang, pct in sorted(_MIX.items())
    )
    + " ELSE 0 END"
)

ORACLES["docs_mixture_weights"] = f"""
WITH d AS (
  SELECT lang,
    len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))
      AS n_tok
  FROM documents),
per AS (
  SELECT lang, COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens FROM d
  GROUP BY lang
),
tot AS (SELECT SUM(n_tok) AS total_tokens FROM d)
SELECT lang, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST({_MIX_PCT} AS INTEGER) AS target_pct,
  {_r6(f"(({_MIX_PCT}) * total_tokens) / (100 * n_tokens)")} AS epochs
FROM per CROSS JOIN tot
"""

from flinkrunner_spark.llm.similarity import (  # noqa: E402
    COSINE_DUP_THRESHOLD as _CDT,
    EVAL_VEC_BUCKETS as _EVB,
)

ORACLES["emb_decontaminate"] = f"""
WITH t AS (
  SELECT vec_id, embedding,
    {_hex8_to_long("md5(CAST(vec_id AS VARCHAR) || ':eval:v1')")}
      % {_EVB} AS bkt
  FROM embeddings
),
a AS (SELECT vec_id, embedding FROM t WHERE bkt <> 0),
b AS (
  SELECT vec_id AS eval_id, embedding FROM t WHERE bkt = 0
  ORDER BY md5(CAST(vec_id AS VARCHAR) || ':eval:v1'), vec_id
  LIMIT 512
),
p AS (
  SELECT a.vec_id, b.eval_id,
    {_r6(f"{_DOTAB} / SQRT({_AA} * {_BB})")} AS cos
  FROM a CROSS JOIN b
),
r AS (
  SELECT vec_id, eval_id, cos,
    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, eval_id)
      AS rk
  FROM p
)
SELECT vec_id, cos AS max_eval_cosine, eval_id AS nearest_eval_id,
  (cos >= {_CDT}) AS contaminated
FROM r WHERE rk = 1
"""

# ANN recall telemetry: the two component oracles nest as subqueries
# (both deterministic), the stat is an exact-int quotient.
ORACLES["ann_recall_stats"] = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap, 10 AS k,
  {_r6("COUNT(*) / 10.0")} AS recall
FROM ({ORACLES["emb_knn_ivf"]}) a
WHERE a.vec_id IN (SELECT vec_id FROM ({ORACLES["emb_knn"]}) e)
"""

# Streaming vocabulary mirror: cumulative complete-mode counts equal the
# batch scan for order-independent int aggregates — same oracle.
ORACLES["stream_topk_ngrams"] = ORACLES["docs_topk_ngrams"]

from flinkrunner_spark.plans.connectors import INCREMENTAL_ORACLE as _INO  # noqa: E402

ORACLES["iceberg_incremental_roundtrip"] = _INO

# multimodal transform stages: md5-derived fakes reproduce in SQL, so the
# Arrow plumbing is checked per-row exactly (same contract as mm_meta).
from flinkrunner_spark.llm.mm_transforms import (  # noqa: E402
    MM_FEATURE_DIM as _MFD,
    MM_RESIZE_TARGET as _MRT,
)

ORACLES["mm_features"] = f"""
SELECT doc_id, CAST(fi - 1 AS INTEGER) AS pos,
  ({_hex8_to_long("md5(text || ':feat:' || CAST(fi - 1 AS VARCHAR))")}
   % 10000) / 10000.0 AS feature
FROM documents, generate_series(1, {_MFD}) AS t(fi)
"""

ORACLES["mm_resize"] = f"""
WITH m AS (
  SELECT doc_id, text,
    CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
    CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height
  FROM documents
),
r AS (
  SELECT doc_id, text, width, height,
    GREATEST(width, height) AS m,
    CASE WHEN GREATEST(width, height) > 0
      THEN (width * {_MRT}) // GREATEST(width, height) ELSE 0 END AS nw,
    CASE WHEN GREATEST(width, height) > 0
      THEN (height * {_MRT}) // GREATEST(width, height) ELSE 0 END AS nh
  FROM m
)
SELECT doc_id, CAST(width AS INTEGER) AS width,
  CAST(height AS INTEGER) AS height,
  CAST(nw AS INTEGER) AS new_width, CAST(nh AS INTEGER) AS new_height,
  (m > 0) AS decoded,
  md5(text || ':resize:' || CAST(nw AS VARCHAR) || 'x'
      || CAST(nh AS VARCHAR)) AS resize_fingerprint
FROM r
"""

ORACLES["iceberg_stream_roundtrip"] = _LPO

# ——— round 7: non-identity partition transforms (day/bucket/truncate) —
# the roundtrip profiles the original parquet; the pruned scan filters by
# the same epoch-day arithmetic the transform computes.

from flinkrunner_spark.plans.connectors import (  # noqa: E402
    ICEBERG_TRANSFORM_ORACLE as _ITO,
    ICEBERG_TRANSFORM_PRUNED_ORACLE as _ITPO,
)

ORACLES["iceberg_transform_roundtrip"] = _ITO
ORACLES["iceberg_transform_pruned"] = _ITPO

# ——— round 8: partition-spec evolution — the mixed-spec snapshot must
# profile exactly like the source parquet (the split is deterministic,
# so the oracle is the plain full-corpus profile).
ORACLES["iceberg_spec_evolution_roundtrip"] = _LPO

# ——— round 8: S3 FileIO — publish with path rewriting, mirror back,
# read with position deletes applied across the relocation.
from flinkrunner_spark.plans.connectors import (  # noqa: E402
    ICEBERG_S3_ORACLE as _IS3O,
)

ORACLES["iceberg_s3_roundtrip"] = _IS3O

# ——— round 8: Count-Min heavy hitters + A-ES weighted sampling —
# md5-derived hashes/uniforms, so sketch counters, estimates and sample
# ranking reproduce bit-for-bit (hex parsed with the digit-sum idiom).

ORACLES["docs_heavy_hitters"] = f"""
WITH toks AS (SELECT unnest({_TOKS}) AS tok FROM documents),
exact AS (SELECT tok, COUNT(*) AS exact_count FROM toks GROUP BY tok),
cells AS (
  SELECT tok, r,
    {_hex8_to_long("md5(tok || ':cms:' || CAST(r AS VARCHAR))")} % 1024
      AS bucket
  FROM toks, (SELECT unnest(generate_series(0, 3)) AS r) rr
),
sketch AS (SELECT r, bucket, COUNT(*) AS cnt FROM cells GROUP BY r, bucket),
probes AS (
  SELECT e.tok, e.exact_count, MIN(s.cnt) AS est_count
  FROM exact e
  JOIN (SELECT DISTINCT tok, r, bucket FROM cells) c ON c.tok = e.tok
  JOIN sketch s ON s.r = c.r AND s.bucket = c.bucket
  GROUP BY e.tok, e.exact_count
)
SELECT token, est_count, exact_count, CAST(rk AS INTEGER) AS rk FROM (
  SELECT tok AS token, est_count, exact_count,
    row_number() OVER (ORDER BY est_count DESC, tok) AS rk
  FROM probes) t
WHERE rk <= 50
"""

# streaming twin: the CMS sketch accumulated as streaming state equals
# the batch sketch (order-independent int counters), so the batch
# oracle verifies it exactly — the stream_topk_ngrams convention.
def _alias_stream_heavy_hitters() -> None:
    ORACLES["stream_heavy_hitters"] = ORACLES["docs_heavy_hitters"]


_alias_stream_heavy_hitters()

ORACLES["docs_pmi_bigrams"] = f"""
WITH t AS (SELECT {_TOKS} AS toks FROM documents),
pos AS (
  SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> toks[i])) AS w1,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                i -> toks[i+1])) AS w2
  FROM t WHERE len(toks) >= 2
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pos GROUP BY w1, w2),
c1 AS (SELECT w1, SUM(c12) AS c1 FROM c12 GROUP BY w1),
c2 AS (SELECT w2, SUM(c12) AS c2 FROM c12 GROUP BY w2),
n AS (SELECT SUM(c12) AS n_pos FROM c12),
sc AS (
  SELECT p.w1, p.w2, p.c12 AS pair_count,
    {_r6("ln((CAST(p.c12 AS DOUBLE) * n.n_pos)"
         " / (CAST(a.c1 AS DOUBLE) * b.c2))")} AS pmi
  FROM c12 p JOIN c1 a ON p.w1 = a.w1 JOIN c2 b ON p.w2 = b.w2
  CROSS JOIN n
  WHERE p.c12 >= 5
)
SELECT w1, w2, pair_count, pmi, CAST(rk AS INTEGER) AS rk FROM (
  SELECT w1, w2, pair_count, pmi,
    row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rk
  FROM sc) r
WHERE rk <= 50
"""

ORACLES["docs_weighted_sample"] = f"""
WITH t AS (
  SELECT doc_id, lang, n_chars,
    ln(({_hex8_to_long("md5(CAST(doc_id AS VARCHAR) || ':wsample:v1')")}
        + 1) / 4294967296.0) / n_chars AS k_
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, lang, n_chars, CAST(rk AS INTEGER) AS rk FROM (
  SELECT doc_id, lang, n_chars,
    row_number() OVER (ORDER BY k_ DESC, doc_id) AS rk
  FROM t) s
WHERE rk <= 100
"""

# ——— round 7: the composed flagship pipeline — batch composition of the
# SAME stages (gopher screens ∧ badwords screen → dedup by (lang,
# md5(text)) → PII redact) over the original parquet. Every aggregate
# derives only from (lang, text), so streaming first-arrival keeper
# choice cannot move the profile.


def _curation_pipeline_oracle() -> str:
    from flinkrunner_spark.llm.curation import PII_PATTERNS

    red = "text"
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return f"""
WITH t AS (
  SELECT text, lang, n_chars, {_TOKS} AS toks FROM documents
), scr AS (
  SELECT text, lang, n_chars,
    list_sum(list_transform(toks, x -> length(x))) AS sum_len,
    len(toks) AS n_words
  FROM t
  WHERE len(toks) >= {_GNW} AND len(toks) <= {_GXW}
    AND len(list_intersect(list_distinct(toks), {_GSW_SQL})) >= {_GNS}
    AND len(list_filter(toks, x -> list_contains({_BW_SQL}, x))) = 0
), scr2 AS (
  SELECT text, lang, n_chars FROM scr
  WHERE sum_len / n_words >= {_GNL} AND sum_len / n_words <= {_GXL}
), ded AS (
  SELECT lang, md5(text) AS h, MIN(text) AS text, MAX(n_chars) AS nc
  FROM scr2 GROUP BY lang, md5(text)
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(nc) AS BIGINT) AS sum_chars,
  CAST(SUM(length({red})) AS BIGINT) AS sum_red_len
FROM ded GROUP BY lang
"""


ORACLES["stream_curation_to_iceberg"] = _curation_pipeline_oracle()


# ——— r7 additions: chunking, bigram-LM scoring, SQ8 quantized ANN
# (llm/chunking.py, llm/lm.py, llm/pq.py) — each mirrored
# expression-for-expression; emb_knn_pq stays rows-only (trained
# codebooks), numpy-mirror-tested in tests/test_llm_round7.py.

ORACLES["docs_chunk"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, toks, unnest(generate_series(0, len(toks)-1, 48)) AS start
      FROM t WHERE len(toks) > 0)
SELECT doc_id, CAST(start // 48 AS INTEGER) AS chunk_idx,
  CAST(len(list_slice(toks, start+1, start+64)) AS INTEGER) AS n_tokens,
  md5(array_to_string(list_slice(toks, start+1, start+64), ' ')) AS chunk_hash
FROM s
"""

ORACLES["docs_lm_score"] = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
bg AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, len(toks)-1), i -> toks[i])) AS w1,
    unnest(list_transform(generate_series(1, len(toks)-1),
           i -> toks[i] || ' ' || toks[i+1])) AS bigram
  FROM t WHERE len(toks) >= 2),
c2 AS (SELECT bigram, COUNT(*) AS c2 FROM bg GROUP BY bigram),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1)
SELECT doc_id, COUNT(*) AS n_bigrams,
  {_r6("AVG(-ln(c2.c2 / c1.c1))")} AS xent_nats
FROM bg JOIN c2 USING (bigram) JOIN c1 USING (w1)
GROUP BY doc_id
"""

_SQDOT = (
    "list_reduce(list_transform(generate_series(1, 64),"
    " i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
)

ORACLES["emb_knn_sq8"] = f"""
WITH e AS (SELECT vec_id,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
st AS (
  SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx FROM (
    SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
    FROM e CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) u
    GROUP BY i) s),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
dq AS (
  SELECT vec_id,
    list_transform(generate_series(1, 64),
      i -> CASE WHEN mx[i] = mn[i] THEN mn[i]
           ELSE mn[i] + floor(((v[i] - mn[i]) / (mx[i] - mn[i])) * 255.0 + 0.5)
                * ((mx[i] - mn[i]) / 255.0) END) AS d,
    qv
  FROM e CROSS JOIN st CROSS JOIN q
  WHERE vec_id <> 0)
SELECT vec_id,
  {_r6(f"{_SQDOT.format(a='d', b='qv')} / SQRT({_SQDOT.format(a='d', b='d')} * {_SQDOT.format(a='qv', b='qv')})")} AS acos
FROM dq
ORDER BY acos DESC, vec_id
LIMIT 10
"""

ORACLES["docs_chunk_dedup"] = f"""
WITH c AS ({ORACLES["docs_chunk"]}),
cf AS (SELECT * FROM c WHERE n_tokens >= 16),
d AS (SELECT chunk_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keep_doc
      FROM cf GROUP BY chunk_hash HAVING COUNT(*) > 1)
SELECT d.chunk_hash, d.n_copies, d.keep_doc,
  CAST(MIN(cf.chunk_idx) AS INTEGER) AS keep_idx
FROM d JOIN cf ON cf.chunk_hash = d.chunk_hash AND cf.doc_id = d.keep_doc
GROUP BY d.chunk_hash, d.n_copies, d.keep_doc
"""


def _micro6(expr: str) -> str:
    """Spark-parity 6-decimal quantization to integer micro-units: the
    _r6 VARCHAR route (Spark ROUND semantics), then a x1e6 scale whose
    product sits within 1 ulp of an integer, so ROUND(..., 0) has no .5
    boundary to disagree on. Integer micro-nat sums are order-
    independent — the llm/dsir.py determinism contract."""
    return f"CAST(ROUND(({_r6(expr)}) * 1000000.0, 0) AS BIGINT)"


_DSIR_LLR = _micro6(
    "ln(((COALESCE(ct, 0) + 1.0) * (r_tot + 1024.0))"
    " / ((COALESCE(cr, 0) + 1.0) * (t_tot + 1024.0)))"
)
_DSIR_GMD5 = "md5(CAST(d.doc_id AS VARCHAR) || ':dsir:g1')"
_DSIR_U = f"({_hex8_to_long(_DSIR_GMD5)} + 0.5) / 4294967296.0"

ORACLES["docs_dsir_sample"] = f"""
WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
f AS (SELECT doc_id, lang,
        unnest(list_concat(toks,
          CASE WHEN len(toks) >= 2 THEN list_transform(
                 generate_series(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i + 1])
               ELSE CAST([] AS VARCHAR[]) END)) AS feat
      FROM t),
b AS (SELECT doc_id, lang,
        {_hex8_to_long("md5(feat || ':dsir:v1')")} % 1024 AS bucket
      FROM f),
cnt AS (SELECT bucket, COUNT(*) AS cr,
          COUNT(CASE WHEN lang = 'en' THEN 1 END) AS ct
        FROM b GROUP BY bucket),
tot AS (SELECT SUM(cr) AS r_tot, SUM(ct) AS t_tot FROM cnt),
grid AS (SELECT unnest(generate_series(0, 1023)) AS bucket),
llr AS (SELECT grid.bucket, {_DSIR_LLR} AS llr_micro
        FROM grid LEFT JOIN cnt ON grid.bucket = cnt.bucket
        CROSS JOIN tot),
dw AS (SELECT doc_id, SUM(llr_micro) AS logw_micro
       FROM b JOIN llr ON b.bucket = llr.bucket GROUP BY doc_id),
s AS (SELECT d.doc_id, d.lang, d.source,
        COALESCE(dw.logw_micro, 0) AS logw_micro,
        {_micro6(f"-ln(-ln({_DSIR_U}))")} AS g_micro
      FROM documents d LEFT JOIN dw ON d.doc_id = dw.doc_id)
SELECT doc_id, lang, source,
  CAST(logw_micro AS DOUBLE) / 1000000.0 AS logw_nats,
  CAST(logw_micro + g_micro AS DOUBLE) / 1000000.0 AS key_nats
FROM s
ORDER BY logw_micro + g_micro DESC, doc_id
LIMIT 64
"""

# r10 (continued): iceberg CDC changelog + full column evolution — both
# rebuild the expected frames straight from the original parquet
from flinkrunner_spark.plans.connectors import CHANGELOG_ORACLE as _CLO  # noqa: E402
from flinkrunner_spark.plans.connectors import (  # noqa: E402
    COLUMN_EVOLUTION_ORACLE as _CEO,
)

ORACLES["iceberg_changelog_roundtrip"] = _CLO
ORACLES["iceberg_column_evolution_roundtrip"] = _CEO

# r10 (continued): pruning screens — prototype-distance outliers and
# CCNet perplexity buckets (llm/pruning.py). Both replay the exact
# fold-based machinery their inputs are oracled with, adding only
# rank/ntile logic over unambiguous total orders.
ORACLES["emb_outliers"] = f"""
WITH cent AS ({_CENT_FOLD}),
sc AS (
  SELECT e.vec_id, c.label AS clabel,
    {_r6(f"{_DOT_EC} / SQRT({_EE} * {_CC})")} AS cos
  FROM embeddings e CROSS JOIN cent c
),
asg AS (
  SELECT vec_id, clabel AS assigned_label, cos AS cosine FROM (
    SELECT vec_id, clabel, cos,
      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, clabel)
        AS rn
    FROM sc) r WHERE rn = 1
),
rk AS (
  SELECT vec_id, assigned_label, cosine,
    row_number() OVER (PARTITION BY assigned_label
                       ORDER BY cosine, vec_id) AS rn,
    COUNT(*) OVER (PARTITION BY assigned_label) AS n
  FROM asg
)
SELECT vec_id, assigned_label, cosine,
  rn <= CAST(FLOOR(n * 0.2) AS BIGINT) AS is_outlier
FROM rk
"""

ORACLES["docs_ccnet_buckets"] = f"""
WITH lm AS ({ORACLES["docs_lm_score"]}),
j AS (
  SELECT l.doc_id, d.lang, l.xent_nats
  FROM lm l JOIN documents d ON l.doc_id = d.doc_id
),
t AS (
  SELECT doc_id, lang, xent_nats,
    ntile(3) OVER (PARTITION BY lang ORDER BY xent_nats, doc_id) AS q
  FROM j
)
SELECT doc_id, lang, xent_nats,
  CASE q WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM t
"""

# WAP staging changes publication, not data — the published table must
# profile exactly like the original corpus (invisibility is asserted
# inside the query itself)
ORACLES["iceberg_wap_roundtrip"] = _LPO

# add_files imports change discovery, not data — the half-written,
# half-imported table profiles exactly like the original corpus
ORACLES["iceberg_add_files_roundtrip"] = _LPO

# idempotent produce under induced retries: any duplicate would double
# counts — the exact full-corpus profile IS the effectively-once proof
ORACLES["kafka_idempotent_roundtrip"] = _LPO
# KIP-98 transactions: the aborted first attempt must be invisible and
# the committed retry exactly-once — any leak/duplicate breaks the
# profile over the original parquet
ORACLES["kafka_txn_roundtrip"] = _LPO
# the read-process-write loop forwards every record exactly once —
# same corpus profile
ORACLES["kafka_rpw_roundtrip"] = _LPO

# the minhash-dedup ACTION report: keep-lowest per verified cluster,
# per-language survivor/removal volumes (same recursive closure)
ORACLES["docs_dedup_report"] = f"""
WITH clusters AS ({ORACLES["docs_dup_clusters"]})
SELECT d.lang, COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN c.cluster_id = d.doc_id THEN 1 ELSE 0 END)
    AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN c.cluster_id = d.doc_id THEN 0 ELSE 1 END)
    AS BIGINT) AS n_removed,
  CAST(SUM(CASE WHEN c.cluster_id = d.doc_id THEN d.n_chars ELSE 0 END)
    AS BIGINT) AS chars_kept
FROM documents d JOIN clusters c ON d.doc_id = c.doc_id
GROUP BY d.lang
"""

# epoch-timestamp offset bounds (r12): the [base+120, base+430) time
# cut over CreateTime = base + doc_id must equal the doc_id range
# filter on the raw parquet — ListOffsets-by-timestamp resolution,
# no-match→log-end fallback and the exclusive stop bound all have to
# be exact for the profile to match
from flinkrunner_spark.plans.connectors import KAFKA_TS_OFFSETS_ORACLE  # noqa: E402

ORACLES["kafka_ts_offsets_roundtrip"] = KAFKA_TS_OFFSETS_ORACLE

# char-trigram Naive Bayes langid (r12): scores are integer log-prob
# sums from the import-time-trained profile — the oracle embeds the
# SAME profile as a VALUES table and replays the trigram extraction,
# smoothing misses and argmax/tiebreak in SQL
from flinkrunner_spark.llm.text import langid_ngram_oracle_sql  # noqa: E402

ORACLES["docs_langid_ngram"] = langid_ngram_oracle_sql()

# ANALYZE-through-the-metastore (r12): Spark-computed exact column
# stats stored + read back over the thrift wire must equal DuckDB
# computing the same stats from the raw parquet
from flinkrunner_spark.plans.connectors import HIVE_STATS_ORACLE  # noqa: E402

ORACLES["hive_stats_roundtrip"] = HIVE_STATS_ORACLE

# streaming replay-from-epoch (r12): everything from base+LO onward,
# resolved by the stream reader's initialOffset ListOffsets-by-timestamp
from flinkrunner_spark.plans.connectors import STREAM_TS_OFFSETS_ORACLE  # noqa: E402

ORACLES["stream_kafka_ts_offsets_roundtrip"] = STREAM_TS_OFFSETS_ORACLE
