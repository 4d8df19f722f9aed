"""Registry: query name -> (Spark callable, DuckDB oracle SQL).

This is the single source of truth consumed by ``__spark_entry__.py``
(the driver contract), ``bench.py`` and the oracle-parity tests. Every
operator from SURVEY.md §2 registers here; SQL-expressible ones carry a
DuckDB oracle whose column names/types/rounding match the Spark output
exactly (the driver hash-compares values by sorted column name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from navigator_data_ingest_spark.operators import analytics

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (query fn, oracle sql | None)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    _REGISTRY[name] = (fn, oracle)


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None
    }


# --------------------------------------------------------------------------
# §2.3 analytics
# --------------------------------------------------------------------------

register(
    "q1_pricing_summary",
    analytics.q1_pricing_summary,
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 6)                                    AS sum_qty,
           round(sum(l_extendedprice), 6)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 6)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
           round(avg(l_quantity), 6)                                    AS avg_qty,
           round(avg(l_extendedprice), 6)                               AS avg_price,
           round(avg(l_discount), 6)                                    AS avg_disc,
           count(*)::bigint                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)

register(
    "q3_shipping_priority",
    analytics.q3_shipping_priority,
    """
    SELECT l_orderkey, o_orderdate,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)

register(
    "q5_local_volume",
    analytics.q5_local_volume,
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND c_nationkey = s_nationkey
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)

register(
    "q_top_customers",
    analytics.q_top_customers,
    """
    WITH spend AS (
        SELECT o_custkey, sum(o_totalprice) AS spend_raw
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT n_name, c_custkey, c_name, spend_raw,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY spend_raw DESC, c_custkey) AS rank
        FROM spend
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
    )
    SELECT n_name, c_custkey, c_name,
           round(spend_raw, 6) AS total_spend, rank::int AS rank
    FROM ranked WHERE rank <= 3
    ORDER BY n_name, rank
    """,
)

register(
    "q_orders_enriched",
    analytics.q_orders_enriched,
    """
    SELECT o_orderkey, o_custkey, n_name AS nation_name, c_mktsegment,
           year(o_orderdate)::int AS order_year,
           round(o_totalprice, 6) AS total_price,
           (o_orderpriority = '1-URGENT') AS is_urgent
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    """,
)

register(
    "q_events_windowed",
    analytics.q_events_windowed,
    """
    SELECT time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS window_start,
           event_type,
           count(*)::bigint          AS n_events,
           round(sum(value), 6)      AS sum_value,
           count(DISTINCT user_id)::bigint AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)

register(
    "q_events_sessionize",
    analytics.q_events_sessionize,
    """
    WITH ev AS (
        SELECT user_id, ts::TIMESTAMP AS ts, event_id, value FROM events
    ), flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id::bigint AS session_id,
           count(*)::bigint AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           round(sum(value), 6) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)

register(
    "q_documents_stats",
    analytics.q_documents_stats,
    """
    SELECT lang, source,
           count(*)::bigint AS n_docs,
           sum(n_chars)::bigint AS total_chars,
           round(avg(n_chars), 6) AS avg_chars,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
