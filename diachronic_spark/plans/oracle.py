"""DuckDB oracle SQL for every SQL-expressible query in ``queries.py``.

Aliases, rounding, and string-rendered timestamps match the Spark side
exactly (FIXTURES.md §4). q21 reads the materialized wiki fixture
parquet (fixtures/wiki_revisions.parquet) — the same file the Spark
query reads — so even the engine-internal pipeline query is fully
oracle-checked; the declarative-vs-sequential equivalence is pinned by
tests/test_snapshot.py on top.

DuckDB dialect notes:
- ``epoch_us(ts)/1000000.0`` mirrors Spark's ``cast(ts as double)``.
- ``strftime('%Y-%m-%d %H:%M:%S.%f')`` mirrors ``date_format(...,
  'yyyy-MM-dd HH:mm:ss.SSSSSS')`` (events timestamps are exact µs).
- list comprehensions + ``list_sum`` give the same sequential
  double-accumulation as Spark's ``aggregate(zip_with(...))``.
- ``sum(int)`` returns HUGEINT in DuckDB → cast to BIGINT to match
  Spark's LongType.
"""

from __future__ import annotations

from ..sources.wiki_fixture import FIXTURE_PATH as _WIKI_FIXTURE

ORACLE: dict[str, str] = {}

ORACLE["q1"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                              AS sum_qty,
       round(sum(l_extendedprice), 2)                         AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
       round(avg(l_quantity), 2)                              AS avg_qty,
       round(avg(l_extendedprice), 2)                         AS avg_price,
       round(avg(l_discount), 2)                              AS avg_disc,
       count(*)                                               AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLE["q2"] = """
SELECT c_mktsegment,
       count(*)                    AS count_orders,
       round(sum(o_totalprice), 2) AS sum_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

ORACLE["q3"] = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

ORACLE["q4"] = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""

ORACLE["q5"] = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
ORDER BY c_custkey
"""

ORACLE["q6"] = """
WITH r AS (
  SELECT *, row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
       round(o_totalprice, 2)            AS o_totalprice
FROM r WHERE rn = 1
ORDER BY o_custkey
"""

ORACLE["q7"] = """
WITH r AS (
  SELECT *, row_number() OVER (
      PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id,
       strftime(ts, '%Y-%m-%d')             AS event_date,
       event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s
FROM r WHERE rn = 1
ORDER BY user_id, event_date
"""

ORACLE["q8"] = """
WITH r AS (
  SELECT *, row_number() OVER (
      PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rnk
  FROM part
)
SELECT p_brand, CAST(rnk AS INTEGER) AS rnk, p_partkey,
       round(p_retailprice, 2) AS p_retailprice
FROM r WHERE rnk <= 3
ORDER BY p_brand, rnk
"""

ORACLE["q9"] = """
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_revenue
FROM orders
ORDER BY o_custkey, o_orderkey
"""

ORACLE["q10"] = """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts)/1000000.0
          - lag(epoch_us(ts)/1000000.0) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)) / 86400.0
           AS gap_days,
         (lead(epoch_us(ts)/1000000.0) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)
          - epoch_us(ts)/1000000.0) / 86400.0
           AS fwd_days
  FROM events
)
SELECT event_type,
       round(avg(gap_days), 2) AS avg_gap_days,
       round(avg(fwd_days), 2) AS avg_fwd_days,
       count(*)                AS n_gaps
FROM g WHERE gap_days IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""

ORACLE["q11"] = """
SELECT count(DISTINCT l_partkey) AS exact_cnt, TRUE AS approx_ok
FROM lineitem
"""

ORACLE["q12"] = """
SELECT coalesce(l_returnflag, 'ALL')  AS l_returnflag,
       coalesce(l_linestatus, 'ALL')  AS l_linestatus,
       round(sum(l_quantity), 2)      AS sum_qty,
       CAST(grouping(l_returnflag, l_linestatus) AS INTEGER) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""

ORACLE["q13"] = """
WITH top5 AS (
  SELECT c_custkey, c_acctbal FROM customer
  ORDER BY c_acctbal DESC, c_custkey LIMIT 5
), bot5 AS (
  SELECT c_custkey, c_acctbal FROM customer
  ORDER BY c_acctbal ASC, c_custkey LIMIT 5
)
SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
FROM (SELECT * FROM top5 UNION SELECT * FROM bot5)
ORDER BY c_custkey
"""

ORACLE["q14"] = """
SELECT n_nationkey, n_name FROM nation
EXCEPT
SELECT n_nationkey, n_name FROM nation
WHERE n_nationkey IN (
  SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000)
ORDER BY n_nationkey
"""

ORACLE["q15"] = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""

ORACLE["q16"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS window_start,
       event_type,
       count(*) AS n_events
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""

ORACLE["q17"] = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id))
                  >= 300000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions
FROM g GROUP BY user_id ORDER BY user_id
"""

ORACLE["q18"] = """
WITH r AS (
  SELECT lang, row_number() OVER (
      PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
)
SELECT lang, count(*) AS n_docs
FROM r WHERE rn = 1
GROUP BY lang ORDER BY lang
"""

ORACLE["q19"] = """
WITH q AS (
  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
)
SELECT vec_id,
       round(
         list_sum([embedding[i]::DOUBLE * qe[i]::DOUBLE
                   FOR i IN generate_series(1, 64)])
         / (sqrt(list_sum([embedding[i]::DOUBLE * embedding[i]::DOUBLE
                           FOR i IN generate_series(1, 64)]))
            * sqrt(list_sum([qe[i]::DOUBLE * qe[i]::DOUBLE
                             FOR i IN generate_series(1, 64)]))), 4)
         AS cos_sim
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY cos_sim DESC, vec_id
LIMIT 5
"""

ORACLE["q20"] = """
SELECT token, count(*) AS cnt
FROM (
  SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 20
"""

# q21: daily-snapshot dedup over the materialized wiki fixture
# (fixtures/wiki_revisions.parquet, tools/make_wiki_fixture.py). Same
# parquet both engines; reference semantics per SURVEY §1.2 /
# main.py:151-161: ns-0, day >= epoch, first revision per (page, day),
# rev_seq (document order) breaking exact-timestamp ties, null text -> ''.
ORACLE["q21"] = f"""
WITH f AS (
  SELECT * FROM read_parquet('{_WIKI_FIXTURE}')
  WHERE namespace = '0' AND timestamp >= TIMESTAMP '2001-01-15 00:00:00'
),
w AS (
  SELECT *, row_number() OVER (
      PARTITION BY page_id, CAST(timestamp AS DATE)
      ORDER BY timestamp, rev_seq) AS rn
  FROM f)
SELECT namespace, title,
       strftime(timestamp, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
       coalesce(text, '') AS text
FROM w WHERE rn = 1
ORDER BY title, ts_s
"""

ORACLE["q22"] = """
SELECT o_orderstatus, count(*) AS n_pairs
FROM events e JOIN orders o
  ON abs(epoch_us(e.ts - INTERVAL 29 YEAR)/1000000.0
         - epoch_us(o.o_orderdate)/1000000.0) <= 86400.0
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""
