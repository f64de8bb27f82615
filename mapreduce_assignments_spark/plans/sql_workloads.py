"""The engine's SQL front-end: every headline workload as a plain
``spark.sql`` string over the registered table views.

The reference's only declarative surface is two Pig scripts
(assignment6/assignment6.md:9-55); this module is their Spark-SQL
translation plus SQL forms of the other workloads — proving a user can
drive the engine entirely from SQL. Each string is the exact semantic
twin of a DataFrame operator; ``tests/test_sql_surface.py`` asserts
result equality pairwise.

These strings are Spark SQL dialect. They are deliberately close to
ANSI: the relational ones run on DuckDB too with one lexical swap
(Spark's ``unix_micros`` ↔ DuckDB's ``epoch_us``; the others run
verbatim), and the RPN boolean compiler in ``plans.rpn`` emits SQL
that both engines accept verbatim.
"""

from __future__ import annotations

# tokens: whitespace split with empties dropped (text.tokens_array)
_TOK_SQL = r"filter(split(text, '\\s+'), t -> length(t) > 0)"

WORD_COUNT = f"""
SELECT word, count(*) AS cnt
FROM documents
LATERAL VIEW explode({_TOK_SQL}) AS word
GROUP BY word
"""

# Pig Analysis #1 (assignment6/assignment6.md:9-29): hourly tweet
# counts. Pig's 0-based SUBSTRING(ts, 4, 7) == SQL's 1-based
# substring(ts, 5, 3); the Jan/Feb whitelist and REPLACE chain are the
# reference's own formulation.
HOURLY_COUNTS_TWEETS = """
SELECT concat(replace(replace(month, 'Jan', '1'), 'Feb', '2'), '/', day) AS date,
       hour, count(*) AS cnt
FROM (
  SELECT substring(timestamp, 5, 3) AS month,
         substring(timestamp, 9, 2) AS day,
         substring(timestamp, 12, 2) AS hour
  FROM tweets
  WHERE substring(timestamp, 5, 3) IN ('Jan', 'Feb')
)
GROUP BY 1, 2
"""

# Pig Analysis #2 (assignment6/assignment6.md:31-55): the egypt|cairo
# message filter, then the same rollup.
HOURLY_COUNTS_EGYPT = """
SELECT concat(replace(replace(month, 'Jan', '1'), 'Feb', '2'), '/', day) AS date,
       hour, count(*) AS cnt
FROM (
  SELECT substring(timestamp, 5, 3) AS month,
         substring(timestamp, 9, 2) AS day,
         substring(timestamp, 12, 2) AS hour
  FROM tweets
  WHERE substring(timestamp, 5, 3) IN ('Jan', 'Feb')
    AND message RLIKE '(?i)(egypt|cairo)'
)
GROUP BY 1, 2
"""

HOURLY_COUNTS_EVENTS = """
SELECT concat(CAST(month(ts) AS STRING), '/', CAST(day(ts) AS STRING)) AS date,
       hour(ts) AS hour, count(*) AS cnt
FROM events GROUP BY 1, 2
"""

PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_qty,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_base_price,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                 * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 6)
       AS DOUBLE) AS sum_disc_price,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                 * ((CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))
                    * (CAST(1 AS DECIMAL(8,6)) + CAST(l_tax AS DECIMAL(8,6))))), 6)
       AS DOUBLE) AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_qty,
  round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""

REVENUE_BY_NATION = """
SELECT n_name, r_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 6)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""

TOP_REVENUE_ORDERS = """
SELECT o_orderkey, c_mktsegment, o_orderdate,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 6)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY o_orderkey, c_mktsegment, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

USER_SESSIONS = """
SELECT user_id, sum(ns) AS n_sessions, count(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN lag(unix_micros(ts))
                     OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR unix_micros(ts)
                      - lag(unix_micros(ts))
                          OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
              THEN 1 ELSE 0 END AS ns
  FROM events
)
GROUP BY user_id
"""

ALL_SQL: dict[str, str] = {
    "word_count": WORD_COUNT,
    "hourly_counts_tweets": HOURLY_COUNTS_TWEETS,
    "hourly_counts_egypt": HOURLY_COUNTS_EGYPT,
    "hourly_counts_events": HOURLY_COUNTS_EVENTS,
    "pricing_summary": PRICING_SUMMARY,
    "revenue_by_nation": REVENUE_BY_NATION,
    "top_revenue_orders": TOP_REVENUE_ORDERS,
    "user_sessions": USER_SESSIONS,
}
