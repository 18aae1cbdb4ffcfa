"""Relational operator surface: scans, filters, joins, aggregates, windows,
sorts, set ops (SURVEY.md §2.B), each registered with a DuckDB oracle.

Design notes (scale-first):
- Every query projects/filters immediately after the scan so Catalyst pushes
  predicates and prunes columns into the parquet reader (asserted in
  tests/test_plans.py via PushedFilters/ReadSchema).
- Join strategies are *forced* where the contract names the algorithm
  (broadcast for dims, sort-merge for big-big) — on a 1000-executor cluster
  these choices dominate shuffle volume.
- Aggregates of money-like doubles go through exact decimal(18,4) sums
  (see _util) so results are order-insensitive and engine-identical.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgforge.ops._util import dmul, dmul_sum_sql, dsum, dsum_raw, dsum_sql
from kgforge.registry import register
from kgforge.tables import load

# ---------------------------------------------------------------------------
# Scans / projection / filter / explode
# ---------------------------------------------------------------------------


@register(
    "scan_project",
    sql="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - l_discount AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
           upper(l_returnflag) AS flag
    FROM lineitem
    WHERE l_quantity >= 30
    """,
    doc="Columnar scan + projection + computed column; predicate pushed to parquet.",
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") >= 30)
        .select(
            "l_orderkey",
            "l_linenumber",
            dmul(F.col("l_extendedprice"), 1 - F.col("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.upper("l_returnflag").alias("flag"),
        )
    )


@register(
    "filter_pred",
    sql="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'O' OR o_orderpriority LIKE '1%')
      AND o_totalprice BETWEEN 1000 AND 150000
      AND o_custkey IS NOT NULL
      AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
    """,
    doc="Conjunctive/disjunctive predicates, BETWEEN, LIKE, IN, null checks.",
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.where(
        ((F.col("o_orderstatus") == "O") | F.col("o_orderpriority").like("1%"))
        & F.col("o_totalprice").between(1000, 150000)
        & F.col("o_custkey").isNotNull()
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


@register(
    "explode_tokens",
    sql="""
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS pos,
           unnest(string_split(text, ' ')) AS tok
    FROM documents
    WHERE lang = 'en'
    """,
    doc="posexplode of split(text) — lateral array→rows; 1-based positions.",
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.where(F.col("lang") == "en")
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "join_broadcast",
    sql=f"""
    SELECT p.p_brand, COUNT(*) AS n, {dsum_sql('l.l_quantity')} AS sum_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    doc="Broadcast hash equi-join: fact × small dim (dictionary-linking shape, SURVEY A3/A4).",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty"))
    )


@register(
    "join_smj",
    sql=f"""
    SELECT l.l_returnflag, COUNT(*) AS n, {dsum_sql('o.o_totalprice')} AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY l.l_returnflag
    """,
    doc="Big-big sort-merge join (forced via merge hint) — blocked tail linking shape.",
)
def join_smj(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )
    return (
        li.hint("merge")
        .join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "join_shj",
    sql=f"""
    SELECT s.s_name, COUNT(*) AS n, {dsum_sql('l.l_quantity')} AS sum_qty
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
    doc="Shuffled hash join (forced) — same results as SMJ, different physical strategy.",
)
def join_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.join(s.hint("shuffle_hash"), li.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty"))
    )


@register(
    "join_left",
    sql="""
    SELECT c.c_mktsegment, COUNT(o.o_orderkey) AS n_orders, COUNT(*) AS n_rows
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Left outer join: keep unmatched left rows (unlinked-mention accounting).",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"), F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "join_semi",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    doc="Left semi join: orders having at least one qualifying lineitem.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 45)
        .select("l_orderkey")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "join_anti",
    sql="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left anti join: customers with no orders (new-vs-existing delta shape, SURVEY A6/A8).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti")


@register(
    "join_range",
    sql="""
    SELECT o.o_orderstatus, COUNT(*) AS n
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY o.o_orderstatus
    """,
    doc="Equi + range (theta) join: lineitems shipped >60 days after order date.",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderstatus")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        li.join(o, cond, "inner")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "join_asof",
    sql="""
    SELECT e.event_id, e.user_id, s.signup_ts
    FROM (SELECT event_id, user_id, ts FROM events) e
    JOIN LATERAL (
        SELECT max(s.ts) AS signup_ts FROM events s
        WHERE s.event_type = 'signup' AND s.user_id = e.user_id AND s.ts <= e.ts
    ) s ON s.signup_ts IS NOT NULL
    """,
    doc=(
        "As-of join: latest signup at-or-before each event per user. "
        "Spark impl is the scalable union+last(ignorenulls) window (single "
        "shuffle, no per-row subquery); oracle is the equivalent LATERAL max."
    ),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    probes = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("timestamp").alias("s_ts"),
        F.lit(0).alias("is_s"),
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("s_ts"),
        F.lit(1).alias("is_s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_s").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        probes.unionByName(signups)
        .withColumn("signup_ts", F.last("s_ts", ignorenulls=True).over(w))
        .where((F.col("is_s") == 0) & F.col("signup_ts").isNotNull())
        .select("event_id", "user_id", "signup_ts")
    )


@register(
    "join_salted",
    sql=f"""
    SELECT o.o_orderpriority, COUNT(*) AS n, {dsum_sql('l.l_extendedprice')} AS sum_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc=(
        "Salted skew join (BASELINE.json north_star: explicit skew splitting): "
        "big side gets salt = pmod(xxhash64(row id), K); the other side is "
        "replicated ×K; join on (key, salt). Result must equal the plain join "
        "— the oracle IS the plain join."
    ),
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    K = 8
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(K)))
    )
    o = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(K)])))
    )
    return (
        li.join(o, (li.l_orderkey == o.o_orderkey) & (li.salt == o.salt), "inner")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("sum_price"))
    )


@register(
    "join_cross",
    sql="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
    doc="Bounded cross join over tiny dims (guarded: dims only).",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "agg_group",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base,
           {dmul_sum_sql('l_extendedprice', '1 - l_discount')} AS sum_disc_price,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Hash aggregate (TPC-H Q1 shape); partial+final agg via Catalyst.",
)
def agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base"),
        dsum_raw(dmul(F.col("l_extendedprice"), 1 - F.col("l_discount"))).alias(
            "sum_disc_price"
        ),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "agg_distinct",
    sql="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Distinct aggregation (expand + two-phase agg in Spark).",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register(
    "agg_approx",
    # The sketch value itself is engine-specific, but its ACCURACY CONTRACT
    # is not: emit the exact cardinality plus a boolean "HLL within 3% of
    # exact" at rsd=0.01. The bound is 3 relative standard deviations —
    # and since HLL++ is hash-based (deterministic per dataset), the
    # boolean is a fixed fact of each SF's data, measured ≤1.02% error at
    # sf0.001/0.01/0.1. The oracle asserts the contract (TRUE) plus the
    # exact value — a full value-hash check of what the operator promises,
    # not of sketch internals. (The default rsd=0.05 sketch strays past
    # ONE-sigma routinely — 5.65% on sf0.01 — which is exactly why the
    # contract needs the tighter sketch, not a looser assertion.)
    sql="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
           TRUE AS approx_ok
    FROM orders GROUP BY o_orderstatus
    """,
    doc="HLL approximate distinct count (cheap cardinality metrics, SURVEY A9).",
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("exact_custs"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", 0.01)
                - F.count_distinct("o_custkey")
            )
            <= 0.03 * F.count_distinct("o_custkey")
        ).alias("approx_ok"),
    )


@register(
    "agg_collect",
    sql="""
    SELECT o_orderpriority,
           string_agg(s, ',' ORDER BY s) AS statuses
    FROM (SELECT DISTINCT o_orderpriority, o_orderstatus AS s FROM orders)
    GROUP BY o_orderpriority
    """,
    doc="collect_set + sort_array for deterministic grouped collection (string-joined).",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus"))).alias("statuses")
    )


@register(
    "agg_rollup",
    sql=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="Rollup with grouping-set null markers (metrics rollups, SURVEY A9).",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@register(
    "agg_pivot",
    sql="""
    SELECT n.n_name,
           COALESCE(COUNT(*) FILTER (WHERE c.c_mktsegment = 'AUTOMOBILE'), 0) AS automobile,
           COALESCE(COUNT(*) FILTER (WHERE c.c_mktsegment = 'BUILDING'), 0) AS building,
           COALESCE(COUNT(*) FILTER (WHERE c.c_mktsegment = 'FURNITURE'), 0) AS furniture,
           COALESCE(COUNT(*) FILTER (WHERE c.c_mktsegment = 'HOUSEHOLD'), 0) AS household,
           COALESCE(COUNT(*) FILTER (WHERE c.c_mktsegment = 'MACHINERY'), 0) AS machinery
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Pivot (explicit value list for a deterministic schema) over customer segments.",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    piv = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", segs)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "n_name", *[F.coalesce(F.col(s), F.lit(0)).alias(s.lower()) for s in segs]
    )


@register(
    "agg_pudf",
    sql="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "Grouped-agg pandas UDF (Arrow-batched, JVM→Python once per group): "
        "quantity-weighted mean price; rounded to absorb fp association order."
    ),
)
def agg_pudf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:  # GROUPED_AGG
        return round(float((price * qty).sum() / qty.sum()), 4)

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    return li.groupBy("l_returnflag").agg(
        wavg("l_extendedprice", "l_quantity").alias("wavg_price")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "win_rank",
    sql="""
    SELECT * FROM (
      SELECT c_custkey, c_nationkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn,
             RANK()       OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rk,
             DENSE_RANK() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS drk
      FROM customer)
    WHERE rn <= 3
    """,
    doc="Ranking window (rank-1 disambiguation shape; stable tiebreak on key).",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "win_lag",
    sql="""
    SELECT o_orderkey, o_custkey,
           LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS prev_price,
           LEAD(o_totalprice) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS next_price
    FROM orders
    """,
    doc="lag/lead — previous-turn context shape (stable (partition, ts, key) order).",
)
def win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "win_running",
    sql="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
    FROM orders
    """,
    doc="Running aggregate over a rows frame (cumulative triples-per-conversation shape).",
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@register(
    "win_range",
    sql="""
    SELECT event_id,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
                PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_1h
    FROM events
    """,
    doc="Time-range window frame (sliding 1h per user) on microsecond epoch.",
)
def win_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double").alias("sum_1h"),
    )


@register(
    "win_analytic",
    sql="""
    SELECT c_custkey, c_nationkey,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           FIRST_VALUE(c_name) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS richest,
           LAST_VALUE(c_name) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND UNBOUNDED FOLLOWING) AS poorest
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="Analytic window functions: ntile / percent_rank / first / last.",
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.first("c_name").over(wf).alias("richest"),
        F.last("c_name").over(wf).alias("poorest"),
    )


@register(
    "topk_group",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 2
    """,
    doc="Top-k per group via ranking window (k best candidates per mention shape).",
)
def topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 2)
        .drop("rn")
    )


@register(
    "topk_global",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="Global top-k (TakeOrderedAndProject — no full sort at scale).",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "sort_global",
    sql="""
    SELECT n_name, n_regionkey,
           ROW_NUMBER() OVER (ORDER BY n_regionkey, n_name) AS global_rank
    FROM nation
    """,
    doc="Global total order made hash-visible via a global rank column.",
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    w = Window.orderBy("n_regionkey", "n_name")
    return n.select(
        "n_name", "n_regionkey", F.row_number().over(w).alias("global_rank")
    ).orderBy("global_rank")


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "set_union",
    sql="""
    SELECT c_custkey AS key FROM customer WHERE c_acctbal > 0
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    """,
    doc="UNION (distinct) of two key sets.",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("key"))
    )
    b = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 50000)
        .select(F.col("o_custkey").alias("key"))
    )
    return a.unionByName(b).distinct()


@register(
    "set_intersect",
    sql="""
    SELECT c_custkey AS key FROM customer WHERE c_acctbal > 1000
    INTERSECT
    SELECT o_custkey FROM orders
    """,
    doc="INTERSECT — P/R numerator shape (ours ∩ reference triples).",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 1000)
        .select(F.col("c_custkey").alias("key"))
    )
    b = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    return a.intersect(b)


@register(
    "set_except",
    sql="""
    SELECT c_custkey AS key FROM customer
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT — false-negative accounting shape.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    b = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("key"))
    )
    return a.subtract(b)


@register(
    "dedup",
    sql="""
    SELECT DISTINCT l_returnflag, l_linestatus, year(l_shipdate) AS ship_year
    FROM lineitem
    """,
    doc="Exact dedup on a projection (triple-dedup shape, SURVEY A6).",
)
def dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag", "l_linestatus", F.year("l_shipdate").alias("ship_year")
    ).distinct()


@register(
    "join_bucketed",
    sql="""
    SELECT l.l_orderkey AS okey, l.l_linenumber AS lineno,
           l.l_quantity AS qty, o.o_orderstatus AS status
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
    doc=(
        "Co-located bucketed join: both sides written bucketBy(orderkey) + "
        "sortBy into the session catalog, then joined with ZERO exchanges "
        "(verified in tests/test_plans.py) — the pre-partitioning strategy "
        "that turns every repeated big-big join into a shuffle-free merge at "
        "100 TB. Result is value-identical to the plain join (the oracle)."
    ),
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    from urllib.parse import urlparse

    # drop catalog entries AND stale directories (a previous session's
    # managed-table location survives in spark-warehouse/ and blocks create)
    wh_dir = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("kgf_lineitem_bucketed", "kgf_orders_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh_dir}/{t}", ignore_errors=True)

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    od = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(
        "kgf_lineitem_bucketed"
    )
    od.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
        "kgf_orders_bucketed"
    )
    a = spark.table("kgf_lineitem_bucketed")
    b = spark.table("kgf_orders_bucketed")
    return a.hint("merge").join(b, a.l_orderkey == b.o_orderkey).select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lineno"),
        F.col("l_quantity").alias("qty"),
        F.col("o_orderstatus").alias("status"),
    )


@register(
    "agg_quantile",
    sql="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS qty_p50,
           quantile_cont(l_quantity, 0.9) AS qty_p90,
           quantile_cont(l_extendedprice, 0.5) AS price_p50,
           quantile_cont(l_extendedprice, 0.99) AS price_p99
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "Exact interpolated percentiles per group (Spark `percentile` == "
        "DuckDB quantile_cont bit-for-bit: sort + linear interpolation over "
        "identical doubles). The approximate sketch path is agg_approx."
    ),
)
def agg_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("qty_p50"),
        F.expr("percentile(l_quantity, 0.9)").alias("qty_p90"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("price_p50"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("price_p99"),
    )


@register(
    "agg_cube",
    sql=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc=(
        "CUBE grouping sets (all 4 combinations incl. grand total) — the "
        "rollup pane's sibling; NULL marks the aggregated-out dimension."
    ),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@register(
    "agg_grouping_sets",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
           COUNT(*) AS n, {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc=(
        "Explicit GROUPING SETS (the rollup/cube pane's general form) with "
        "grouping_id — gid disambiguates an aggregated-out dimension from a "
        "natural NULL, the standard trick rollup consumers rely on. Same "
        "expand-then-aggregate physical shape as rollup/cube: one Expand "
        "node, partial+final hash aggregate, one Exchange."
    ),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sum_qty"),
    )


@register(
    "agg_approx_quantile",
    sql="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS qty_p50_exact,
           TRUE AS sketch_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    doc=(
        "Approximate percentile sketch with an accuracy CONTRACT (the "
        "agg_approx HLL pattern): emit the exact interpolated median plus a "
        "boolean asserting percentile_approx(accuracy=10000, rank error "
        "<= 1e-4) landed between the exact p45/p55 — the oracle computes "
        "the exact value and asserts TRUE, so a sketch regression breaks "
        "the value hash. The sketch (KLL-style, mergeable) is the "
        "single-pass scale path; exact percentiles (agg_quantile) need a "
        "full sort per group."
    ),
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("qty_p50_exact"),
        F.expr("percentile_approx(l_quantity, 0.5, 10000)").alias("_approx"),
        F.expr("percentile(l_quantity, 0.45)").alias("_lo"),
        F.expr("percentile(l_quantity, 0.55)").alias("_hi"),
    )
    return g.select(
        "l_returnflag",
        "qty_p50_exact",
        (
            (F.col("_approx") >= F.col("_lo")) & (F.col("_approx") <= F.col("_hi"))
        ).alias("sketch_ok"),
    )


# ---------------------------------------------------------------------------
# Batch sessionization (round 3) — the lag-gap formulation of sessions, the
# classic SQL sibling of the streaming pane's session_window key.
# ---------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap, microseconds


@register(
    "win_sessionize",
    sql=f"""
    SELECT user_id, session_idx,
           CAST(count(*) AS BIGINT) AS n_events,
           min(micros) AS start_us, max(micros) AS end_us
    FROM (
      SELECT user_id, event_id, micros,
             CAST(sum(is_new) OVER (
                  PARTITION BY user_id ORDER BY micros, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_idx
      FROM (
        SELECT user_id, event_id, micros,
               CASE WHEN lag(micros) OVER (
                      PARTITION BY user_id ORDER BY micros, event_id) IS NULL
                    THEN 1
                    WHEN micros - lag(micros) OVER (
                      PARTITION BY user_id ORDER BY micros, event_id)
                      > {SESSION_GAP_US} THEN 1
                    ELSE 0 END AS is_new
        FROM (SELECT user_id, event_id, epoch_us(ts) AS micros FROM events)))
    GROUP BY user_id, session_idx
    """,
    doc=(
        "Batch sessionization via the lag-gap formulation: a session breaks "
        f"where the per-user inactivity gap exceeds {SESSION_GAP_US // 60_000_000} "
        "minutes; session_idx is the running sum of break flags. Scale shape: "
        "two window passes + one hash aggregate, all partitioned by user_id — "
        "one shuffle total (the windows and the aggregate share the "
        "partitioning). All-integer output (epoch micros), so the oracle "
        "value-hash is exact. Tiebreak on event_id keeps the lag ordering "
        "total and engine-identical."
    ),
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("micros"),
    )
    return sessionize(e)


def sessionize(e: DataFrame) -> DataFrame:
    """Lag-gap sessionization of ``e(user_id, event_id, micros)`` →
    (user_id, session_idx, n_events, start_us, end_us)."""
    w = Window.partitionBy("user_id").orderBy("micros", "event_id")
    prev = F.lag("micros").over(w)
    flagged = e.select(
        "user_id",
        "event_id",
        "micros",
        F.when(prev.isNull(), 1)
        .when(F.col("micros") - prev > SESSION_GAP_US, 1)
        .otherwise(0)
        .alias("is_new"),
    )
    sessioned = flagged.select(
        "user_id",
        "micros",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_idx"),
    )
    return sessioned.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("micros").alias("start_us"),
        F.max("micros").alias("end_us"),
    )
