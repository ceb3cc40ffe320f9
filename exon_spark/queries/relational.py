"""Relational-layer queries (SURVEY.md §2.3 — all stock Catalyst).

The reference delegates every relational operator to DataFusion; we delegate
to Catalyst. These queries prove the full §2.3 surface through the driver's
DuckDB-oracle gate: projection/filter, multi-way equi joins, theta
(interval-containment) join, hash aggregation, ROLLUP, window functions,
NOT EXISTS anti-join, sort/limit top-k, tumbling windows and sessionization
over the events table.

Scale notes (100 TB design):
* join order: filters first, fact-to-dim joins rely on Catalyst broadcast
  (nation/region/part/supplier are broadcast-size; AQE handles the rest);
* q09 interval join binned to avoid the O(n²) theta-join explosion would be
  the next step at scale — here the per-user key partitions already bound it;
* q11 sessionization is the batch analogue of Structured Streaming
  session_window — one shuffle on user_id, then sortWithinPartitions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from exon_spark.queries.base import AVG_D, SUM_D, QuerySpec, register_views, sql_query, table

Q01_SQL = f"""
select l_returnflag, l_linestatus,
       {SUM_D("l_quantity", "sum_qty")},
       {SUM_D("l_extendedprice", "sum_base_price")},
       {SUM_D("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
       {SUM_D("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
       {AVG_D("l_quantity", "avg_qty")},
       {AVG_D("l_extendedprice", "avg_price")},
       {AVG_D("l_discount", "avg_disc")},
       count(*) as count_order
from lineitem
where l_shipdate <= timestamp '1998-09-02 00:00:00'
group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus
"""

Q02_SQL = f"""
select l_orderkey, {SUM_D("l_extendedprice * (1 - l_discount)", "revenue")}, o_orderdate
from customer
join orders on c_custkey = o_custkey
join lineitem on l_orderkey = o_orderkey
where c_mktsegment = 'BUILDING'
  and o_orderdate < timestamp '1998-03-15 00:00:00'
  and l_shipdate  > timestamp '1998-03-15 00:00:00'
group by l_orderkey, o_orderdate
order by revenue desc, l_orderkey
limit 10
"""

Q03_SQL = f"""
select n_name, {SUM_D("l_extendedprice * (1 - l_discount)", "revenue")}
from customer
join orders   on c_custkey = o_custkey
join lineitem on l_orderkey = o_orderkey
join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
join nation   on s_nationkey = n_nationkey
join region   on n_regionkey = r_regionkey
where r_name = 'ASIA'
  and o_orderdate >= timestamp '1996-01-01 00:00:00'
  and o_orderdate <  timestamp '1997-01-01 00:00:00'
group by n_name
order by revenue desc, n_name
"""

Q04_SQL = f"""
select {SUM_D("l_extendedprice * l_discount", "revenue")}, count(*) as n_rows
from lineitem
where l_shipdate >= timestamp '1996-01-01 00:00:00'
  and l_shipdate <  timestamp '1997-01-01 00:00:00'
  and l_discount between 0.05 and 0.07
  and l_quantity < 24
"""

Q05_SQL = """
select c_mktsegment, c_custkey, total_spend, rnk from (
  select c_mktsegment, c_custkey,
         round(cast(sum(cast(round(o_totalprice, 6) as decimal(38,10))) as double), 4) as total_spend,
         rank() over (partition by c_mktsegment
                      order by sum(cast(round(o_totalprice, 6) as decimal(38,10))) desc, c_custkey) as rnk
  from customer join orders on c_custkey = o_custkey
  group by c_mktsegment, c_custkey
) ranked
where rnk <= 3
order by c_mktsegment, rnk
"""

Q06_SQL = f"""
select coalesce(o_orderstatus, 'ALL') as status,
       coalesce(o_orderpriority, 'ALL') as priority,
       count(*) as n_orders,
       {SUM_D("o_totalprice", "sum_price")}
from orders
group by rollup(o_orderstatus, o_orderpriority)
order by status, priority
"""

Q07_SQL = """
select c_custkey, c_name, c_acctbal
from customer
where not exists (select 1 from orders where o_custkey = c_custkey)
order by c_custkey
"""

Q08_SQL = f"""
select p_brand, count(*) as n_items,
       {SUM_D("l_quantity", "sum_qty")},
       {AVG_D("l_extendedprice", "avg_price")}
from lineitem join part on l_partkey = p_partkey
group by p_brand
order by p_brand
"""

# interval-containment self-join — the analogue of the reference's GFF
# annotation join (exon-examples/examples/gff_annotation_join.rs:37-48:
# ON a.seqname = b.seqname AND a.start <= b.start AND a.end >= b.end).
# floor() before cast: Spark cast(double as bigint) truncates, DuckDB rounds.
Q09_SQL = """
with iv as (
  select event_id, user_id, event_type,
         cast(floor(value * 1000) as bigint) as start_pos,
         cast(floor(value * 1000) as bigint)
           + (case when event_type = 'view' then 5000 else 50 end) as end_pos
  from events
  where event_type in ('view', 'click')
)
select a.user_id as user_id, count(*) as n_contained,
       count(distinct b.event_id) as n_distinct_inner
from iv a
join iv b on a.user_id = b.user_id
         and a.event_type = 'view' and b.event_type = 'click'
         and a.start_pos <= b.start_pos and b.end_pos <= a.end_pos
group by a.user_id
order by a.user_id
"""


def _q10_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows via F.window — the batch face of the
    Structured Streaming tumbling-window operator."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.round("value", 6).cast("decimal(38,10)")).cast("double"), 4
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


Q10_ORACLE = f"""
select date_trunc('hour', ts) as window_start, event_type,
       count(*) as n_events,
       {SUM_D("value", "sum_value")}
from events
group by date_trunc('hour', ts), event_type
"""


def _q11_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) with window functions — the
    batch analogue of session_window. One shuffle on user_id."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.unix_millis("ts").alias("ms")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.withColumn(
        "new_sess",
        F.when(
            F.lag("ms").over(w).isNull() | ((F.col("ms") - F.lag("ms").over(w)) > 1_800_000),
            1,
        ).otherwise(0),
    )
    sess = gaps.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id").agg(
        F.countDistinct("sess_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


Q11_ORACLE = """
with gaps as (
  select user_id, event_id, ts,
         case when lag(epoch_ms(ts)) over w is null
                or epoch_ms(ts) - lag(epoch_ms(ts)) over w > 1800000
              then 1 else 0 end as new_sess
  from events
  window w as (partition by user_id order by ts, event_id)
),
sess as (
  select user_id,
         sum(new_sess) over (partition by user_id order by ts, event_id
                             rows between unbounded preceding and current row) as sess_id
  from gaps
)
select user_id, count(distinct sess_id) as n_sessions, count(*) as n_events
from sess
group by user_id
"""


RELATIONAL_QUERIES: list[QuerySpec] = [
    sql_query("q01_pricing_summary", Q01_SQL, doc="TPC-H Q1: scan+filter+hash agg"),
    sql_query("q02_shipping_priority", Q02_SQL, doc="TPC-H Q3: 3-way join + top-k"),
    sql_query("q03_local_supplier_volume", Q03_SQL, doc="TPC-H Q5: 6-way join"),
    sql_query("q04_forecast_revenue", Q04_SQL, doc="TPC-H Q6: selective filter agg"),
    sql_query("q05_top_customers_window", Q05_SQL, doc="window rank over agg"),
    sql_query("q06_order_priority_rollup", Q06_SQL, doc="ROLLUP grouping sets"),
    sql_query("q07_customers_without_orders", Q07_SQL, doc="NOT EXISTS anti-join"),
    sql_query("q08_brand_stats", Q08_SQL, doc="fact-dim broadcast join + agg"),
    sql_query("q09_interval_containment_join", Q09_SQL, doc="interval theta-join (GFF annotation-join analogue)"),
    QuerySpec("q10_events_tumbling_window", _q10_spark, Q10_ORACLE, "tumbling window agg"),
    QuerySpec("q11_events_sessionize", _q11_spark, Q11_ORACLE, "sessionization via window fns"),
]
