"""Analytical queries over the TPC-H-ish driver tables.

The reference has no joins at all (SURVEY.md §2.10); these queries exist to
exercise the engine surface an analytics user expects — multi-way joins,
semi-joins, top-k per group — on the driver's star schema, with the same
oracle rigor as everything else.

Money arithmetic is integer-exact: 2-decimal dollars become cents and
2-decimal discount rates become hundredths, so revenue =
sum(ext_cents * (100 - disc_100)) is an exact int64 under any partial-agg
order, and both engines produce identical doubles after the final /1e4.

Scale notes:
- dimension joins (nation, region, customer at these ratios) broadcast —
  zero shuffle on the fact table for the dim side;
- the fact-side aggregate shuffles once on the group keys;
- top-k per group is a window over the aggregated (small) frame, not the
  fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cloudcomputing_flink_application_spark.sources.scan_cache import (
    memo_parquet_scan,
)

TOP_SUPPLIERS_K = 3

#: Memoized parquet scans per (applicationId, path) — r14, VERDICT r13
#: #2.  Adjudication root cause of the olap_suite_extra creep: ~5.5 s of
#: its ~7.5 s quiet reading was DataFrame CONSTRUCTION, not execution —
#: 49 repeated `spark.read.parquet` calls across the 14 arms at ~135 ms
#: each (file listing + footer schema read per call).  A scan DataFrame
#: is an immutable analyzed plan over a write-once benchmark dir, so one
#: per (session, path) is safe to share across every OLAP query; entries
#: of a stopped session are dropped when a new applicationId first
#: misses.  NOT a general reader cache on purpose: a cached scan pins
#: its file listing, which would silently miss late-arriving files on
#: mutable dirs (the streaming stores) — OLAP's TPC-H dirs are the one
#: family where immutability is a contract, and that contract extends
#: to EVERY caller of this module: rewriting a dir in place mid-session
#: and re-querying it is unsupported (the pinned listing would read
#: deleted part files).  r14 optimization round: the implementation moved
#: to sources.scan_cache so the documents/embeddings/events registry
#: scans (same write-once driver testdata, same ~135 ms per rebuild)
#: share it; this wrapper keeps the OLAP-local name tests pin.
def _scan(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return memo_parquet_scan(spark, f"{sf_dir}/{table}.parquet")


def _revenue_cents() -> F.Column:
    ext_cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_100 = F.round(F.col("l_discount") * 100).cast("long")
    return ext_cents * (F.lit(100) - disc_100)


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per customer nation: lineitem ⋈ orders ⋈ customer ⋈ nation.

    Output: (n_name, orders, revenue) — revenue in dollars (exact cents*100
    arithmetic, 4 implied decimals collapsed to a double at the end).
    """
    li = _scan(spark, sf_dir, "lineitem")
    orders = _scan(spark, sf_dir, "orders")
    cust = _scan(spark, sf_dir, "customer")
    nation = _scan(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.countDistinct("o_orderkey").cast("long").alias("orders"),
            F.sum(_revenue_cents()).alias("_rev"),
        )
        .select(
            "n_name",
            "orders",
            (F.col("_rev").cast("double") / 10000.0).alias("revenue"),
        )
    )


REVENUE_BY_NATION_SQL = """
SELECT n_name,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS orders,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def top_suppliers_by_nation(spark: SparkSession, sf_dir: str, k: int = TOP_SUPPLIERS_K) -> DataFrame:
    """Top-k suppliers by revenue within each nation (rank over agg).

    Output: (n_name, s_name, rank, revenue).  The window runs over the
    aggregated per-supplier frame (|suppliers| rows), never the fact table.
    """
    li = _scan(spark, sf_dir, "lineitem")
    supp = _scan(spark, sf_dir, "supplier")
    nation = _scan(spark, sf_dir, "nation")
    per_supp = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "s_name")
        .agg(F.sum(_revenue_cents()).alias("_rev"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("_rev"), F.asc("s_name"))
    return (
        per_supp.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "n_name",
            "s_name",
            "rank",
            (F.col("_rev").cast("double") / 10000.0).alias("revenue"),
        )
    )


TOP_SUPPLIERS_SQL = f"""
WITH per_supp AS (
  SELECT n_name, s_name,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  GROUP BY n_name, s_name
),
ranked AS (
  SELECT n_name, s_name, rev,
         row_number() OVER (PARTITION BY n_name ORDER BY rev DESC, s_name ASC) AS rank
  FROM per_supp
)
SELECT n_name, s_name, rank, rev / 10000.0 AS revenue
FROM ranked WHERE rank <= {TOP_SUPPLIERS_K}
"""


#: Shipdate cutoff for the pricing summary (TPC-H Q1 uses a delta off the
#: data's max date; the testdata generator's lineitem range is 1995..2001).
PRICING_CUTOFF = "2001-09-01 00:00:00"


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape): grouped aggregates over the
    full fact table with a shipdate cutoff.

    Per (l_returnflag, l_linestatus): sum/avg of quantity, base price,
    discounted price, charge, discount, and the row count.  All arithmetic
    is exact integers so partial-agg order never changes a bit; each output
    double is ONE division performed identically by both engines.  Per-row
    products stay well inside int64, but the price/charge SUMS are
    accumulated as DECIMAL(38,0): sum(ext*(100-disc)*(100+tax)) passes
    int64 at roughly 5e7 rows (~SF 8) where Spark's non-ANSI sum would
    wrap silently while DuckDB promotes to HUGEINT — DECIMAL keeps both
    engines exact to 1e38 (far past 100 TB row counts).  The plan
    (scan-fused projection + one partial-agg shuffle on a 6-value key) is
    unchanged.
    """
    li = _scan(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(PRICING_CUTOFF).cast("timestamp")
    )
    qty = F.col("l_quantity").cast("long")  # generator emits integral qty
    ext_cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_100 = F.round(F.col("l_discount") * 100).cast("long")
    tax_100 = F.round(F.col("l_tax") * 100).cast("long")
    dec = lambda c: c.cast("decimal(38,0)")  # overflow-proof accumulator
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).alias("_sq"),
        F.sum(dec(ext_cents)).alias("_sbp"),
        F.sum(dec(ext_cents * (F.lit(100) - disc_100))).alias("_sdp"),
        F.sum(
            dec(ext_cents * (F.lit(100) - disc_100) * (F.lit(100) + tax_100))
        ).alias("_sc"),
        F.sum(disc_100).alias("_sd"),
        F.count("*").cast("long").alias("count_order"),
    )
    cnt = F.col("count_order")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("_sq").alias("sum_qty"),
        (F.col("_sbp").cast("double") / 100.0).alias("sum_base_price"),
        (F.col("_sdp").cast("double") / 10000.0).alias("sum_disc_price"),
        (F.col("_sc").cast("double") / 1000000.0).alias("sum_charge"),
        (F.col("_sq").cast("double") / cnt).alias("avg_qty"),
        (F.col("_sbp").cast("double") / 100.0 / cnt).alias("avg_price"),
        (F.col("_sd").cast("double") / 100.0 / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


PRICING_SUMMARY_SQL = f"""
WITH cents AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS ext,
         CAST(round(l_discount * 100) AS BIGINT) AS disc,
         CAST(round(l_tax * 100) AS BIGINT) AS tax
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF}'
),
agg AS (
  SELECT l_returnflag, l_linestatus,
         sum(qty) AS sq, sum(ext) AS sbp,
         sum(ext * (100 - disc)) AS sdp,
         sum(ext * (100 - disc) * (100 + tax)) AS sc,
         sum(disc) AS sd,
         CAST(count(*) AS BIGINT) AS count_order
  FROM cents GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       CAST(sq AS BIGINT) AS sum_qty,
       CAST(sbp AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(sdp AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(sc AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(sq AS DOUBLE) / count_order AS avg_qty,
       CAST(sbp AS DOUBLE) / 100.0 / count_order AS avg_price,
       CAST(sd AS DOUBLE) / 100.0 / count_order AS avg_disc,
       count_order
FROM agg
"""


#: Q3 parameters: segment + date pivot inside the generator's 1995..2001
#: range so both sides of each cutoff are populated.
SHIPPING_SEGMENT = "BUILDING"
SHIPPING_PIVOT = "1998-06-01 00:00:00"
SHIPPING_K = 10


def shipping_priority(spark: SparkSession, sf_dir: str, k: int = SHIPPING_K) -> DataFrame:
    """Top-k unshipped-revenue orders (TPC-H Q3 shape): segment-filtered
    customer ⋈ orders ⋈ lineitem, revenue per order, deterministic top-k.

    The driver schema carries ``o_orderpriority`` (no shippriority column);
    it serves the same reporting role.  Revenue is the exact-cents integer
    sum; the k cut orders by (revenue desc, l_orderkey asc) — fully
    deterministic, unlike a bare LIMIT over ties.

    Scale: the segment filter prunes the broadcast customer dim BEFORE the
    join; the orders/lineitem equi-join shuffles on orderkey; the top-k is
    TakeOrderedAndProject over the per-order aggregate — partial top-k per
    partition then a k-row merge, never a global sort or single-partition
    window.
    """
    li = _scan(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(SHIPPING_PIVOT).cast("timestamp")
    )
    orders = _scan(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(SHIPPING_PIVOT).cast("timestamp")
    )
    cust = (
        _scan(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == SHIPPING_SEGMENT)
        .select("c_custkey")
    )
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_semi")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue_cents()).alias("_rev"))
    )
    # orderBy+limit -> TakeOrderedAndProject (distributed partial top-k);
    # rank via in-partition row index on the <= k-row frame — the same
    # no-global-WindowExec pattern as textstats.token_freq (a bare
    # row_number window would drag every qualifying order to one task).
    top = per_order.orderBy(F.desc("_rev"), F.asc("l_orderkey")).limit(k)
    return (
        top.coalesce(1)
        .sortWithinPartitions(F.desc("_rev"), F.asc("l_orderkey"))
        .withColumn("rank", (F.monotonically_increasing_id() + 1).cast("int"))
        .select(
            "l_orderkey",
            (F.col("_rev").cast("double") / 10000.0).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "rank",
        )
    )


SHIPPING_PRIORITY_SQL = f"""
WITH per_order AS (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > TIMESTAMP '{SHIPPING_PIVOT}'
    AND o_orderdate < TIMESTAMP '{SHIPPING_PIVOT}'
    AND o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = '{SHIPPING_SEGMENT}'
    )
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
),
ranked AS (
  SELECT l_orderkey, rev, o_orderdate, o_orderpriority,
         row_number() OVER (ORDER BY rev DESC, l_orderkey ASC) AS rank
  FROM per_order
)
SELECT l_orderkey, rev / 10000.0 AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority, rank
FROM ranked WHERE rank <= {SHIPPING_K}
"""


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per priority that have at least one late-shipped lineitem
    (semi-join, TPC-H Q4 shape).

    'Late' = l_shipdate after the order date plus 60 days.  Semi-join keeps
    the fact scan single-pass and never duplicates orders.
    Output: (o_orderpriority, n_orders).
    """
    orders = _scan(spark, sf_dir, "orders")
    li = _scan(spark, sf_dir, "lineitem")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey")
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


#: Q13 filter: count only non-finished orders per customer (stands in for
#: the reference query's comment NOT LIKE filter; the driver schema has no
#: o_comment column).
CUSTDIST_EXCLUDE_STATUS = "F"


def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): how many
    customers placed exactly N qualifying orders, INCLUDING the
    zero-order customers a plain inner join would silently drop.

    Two-level aggregation: left join customer -> filtered orders, count
    per customer (count of a NULL-able key is 0 for no-order customers),
    then the distribution over those counts.

    Scale: the first aggregate shuffles on c_custkey (high-cardinality);
    the second on c_count — a few dozen distinct values, but its input is
    already one row per customer and partial aggregation collapses each
    partition to |distinct counts| rows before the exchange, so the
    low-cardinality key never concentrates data-sized volume.
    All-integer output — full value-hash oracle.
    """
    cust = _scan(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _scan(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != CUSTDIST_EXCLUDE_STATUS)
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("long").alias("custdist")
    )


CUSTOMER_DISTRIBUTION_SQL = f"""
WITH per_cust AS (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN (
    SELECT o_custkey, o_orderkey FROM orders
    WHERE o_orderstatus <> '{CUSTDIST_EXCLUDE_STATUS}'
  ) o ON c_custkey = o.o_custkey
  GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
"""


#: Q18 large-order threshold: > this summed quantity per order marks a
#: "large-volume customer" order (p99 of the testdata's per-order sums,
#: the same rarity the TPC-H spec's 300-of-max-350 cutoff targets).
LARGE_ORDERS_MIN_QTY = 250
LARGE_ORDERS_K = 100


def large_orders(
    spark: SparkSession,
    sf_dir: str,
    min_qty: int = LARGE_ORDERS_MIN_QTY,
    k: int = LARGE_ORDERS_K,
) -> DataFrame:
    """Large-volume-customer orders (TPC-H Q18 shape): a HAVING-filtered
    aggregate over the fact table joined BACK to orders + customer, top-k
    by order value.

    Output: (c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
    total_qty), the k highest-totalprice qualifying orders
    (o_orderdate, o_orderkey break ties deterministically).

    Scale: the lineitem aggregate shuffles once on l_orderkey;
    the HAVING filter then keeps only the rare large orders (p99 cutoff),
    so the join back to orders runs against a tiny filtered side — AQE
    sees the post-filter size at runtime and picks a broadcast join
    (a static planner would see an un-sized aggregate and shuffle both
    sides; this query is the regression canary for that runtime re-plan —
    pinned by tests/test_plans.py::
    test_large_orders_aqe_runtime_broadcast_of_having_side, which disables
    static broadcast and asserts the executed adaptive plan converted the
    initial sort-merge join to broadcast-hash).
    Customer is a dimension at these ratios: broadcast.  total_qty sums
    integral-valued doubles as BIGINT, so partial-agg order never changes
    a bit.  The top-k compiles to TakeOrderedAndProject (distributed
    partial top-k), never a global sort.
    """
    li = _scan(spark, sf_dir, "lineitem")
    orders = _scan(spark, sf_dir, "orders")
    cust = _scan(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    joined = (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    return (
        joined.select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(k)
    )


LARGE_ORDERS_SQL = f"""
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > {LARGE_ORDERS_MIN_QTY}
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT {LARGE_ORDERS_K}
"""


# --- local supplier volume (TPC-H Q5 shape) ----------------------------------

#: Q5 parameters: one region, one year window inside the generator's
#: 1995..2001 order-date range so the filter keeps a meaningful slice.
LOCAL_VOLUME_REGION = "ASIA"
LOCAL_VOLUME_FROM = "1996-01-01 00:00:00"
LOCAL_VOLUME_TO = "1997-01-01 00:00:00"


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue kept in-nation per nation of one region (TPC-H Q5 shape):
    the six-table star join whose distinguishing feature is the join
    predicate ACROSS two dimensions — the customer's nation must equal the
    supplier's nation ("local supplier volume").

    Output: (n_name, revenue) for nations of ``LOCAL_VOLUME_REGION`` with
    orders in the one-year window; revenue is the exact-cents integer sum
    collapsed to dollars at the end.

    Scale: region prunes nation BEFORE the broadcast (<= |nations in
    region| rows ship); orders carries the date filter into its scan
    (PushedFilters); the only fact-table shuffle is the lineitem ⋈ orders
    equi-join on orderkey — customer, supplier, and nation⋈region all
    broadcast, and the c_nationkey = s_nationkey cross-dimension predicate
    evaluates inside those broadcast joins, so mismatched rows die before
    the aggregate.  Final aggregate is one exchange on a <= |nations| key.
    """
    li = _scan(spark, sf_dir, "lineitem")
    orders = (
        _scan(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(LOCAL_VOLUME_FROM).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(LOCAL_VOLUME_TO).cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = _scan(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = _scan(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = _scan(spark, sf_dir, "nation")
    region = _scan(spark, sf_dir, "region").filter(
        F.col("r_name") == LOCAL_VOLUME_REGION
    )
    local_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(
            F.broadcast(local_nations),
            supp.s_nationkey == local_nations.n_nationkey,
        )
        .groupBy("n_name")
        .agg(F.sum(_revenue_cents()).alias("_rev"))
        .select(
            "n_name", (F.col("_rev").cast("double") / 10000.0).alias("revenue")
        )
    )


LOCAL_SUPPLIER_VOLUME_SQL = f"""
SELECT n_name,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{LOCAL_VOLUME_REGION}'
  AND o_orderdate >= TIMESTAMP '{LOCAL_VOLUME_FROM}'
  AND o_orderdate < TIMESTAMP '{LOCAL_VOLUME_TO}'
GROUP BY n_name
"""


# --- nation trade volume (TPC-H Q7 shape) ------------------------------------

#: Q7 parameters: the ordered nation pair, both directions kept.
TRADE_NATION_A = "NATION_3"
TRADE_NATION_B = "NATION_7"


def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade volume between two nations by direction and ship year
    (TPC-H Q7 shape): supplier-nation x customer-nation with the
    SYMMETRIC pair predicate — (A ships to B) or (B ships to A) — the
    disjunction ACROSS two dimension joins that Q5's equality predicate
    cannot express.

    Output: (supp_nation, cust_nation, l_year, revenue).

    Scale: both nation dims prune to the two-row pair BEFORE broadcast,
    so the disjunctive filter evaluates inside the broadcast joins and
    non-pair rows die on the fact scan side of the only real shuffle
    (lineitem ⋈ orders on orderkey); the year comes from the lineitem
    scan (no second fact pass); final aggregate exchanges a
    2 x 2 x |years| key space.
    """
    pair = [TRADE_NATION_A, TRADE_NATION_B]
    li = _scan(spark, sf_dir, "lineitem")
    orders = _scan(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = _scan(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = _scan(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nations = _scan(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(pair)
    )
    n1 = nations.select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nations.select(
        F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_ck"))
        .filter(
            (
                (F.col("supp_nation") == TRADE_NATION_A)
                & (F.col("cust_nation") == TRADE_NATION_B)
            )
            | (
                (F.col("supp_nation") == TRADE_NATION_B)
                & (F.col("cust_nation") == TRADE_NATION_A)
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_revenue_cents()).alias("_rev"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            (F.col("_rev").cast("double") / 10000.0).alias("revenue"),
        )
    )


NATION_TRADE_VOLUME_SQL = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{TRADE_NATION_A}' AND n2.n_name = '{TRADE_NATION_B}')
   OR (n1.n_name = '{TRADE_NATION_B}' AND n2.n_name = '{TRADE_NATION_A}')
GROUP BY supp_nation, cust_nation, l_year
"""


# --- disjunctive predicate revenue (TPC-H Q19 shape) -------------------------

#: Q19 parameters: three (brand, size-range, quantity-range) arms.  The
#: driver schema has no shipmode/shipinstruct columns; the arms keep the
#: shape's point — a disjunction of per-arm conjunctions spanning BOTH
#: join sides, which Catalyst must decompose into pushable per-table
#: predicates (p_brand IN (...) etc.) plus the residual join filter.
DISJ_ARMS = [
    ("Brand#12", (1, 15), (1, 11)),
    ("Brand#23", (1, 25), (10, 20)),
    ("Brand#34", (1, 50), (20, 30)),
]


def disjunctive_revenue(
    spark: SparkSession, sf_dir: str, empty_as_zero: bool = True
) -> DataFrame:
    """Single-row revenue under a disjunction of brand/size/quantity
    conjunctions (TPC-H Q19 shape).

    Scale: the part side prunes to the arms' brand union and broadcasts;
    the disjunction evaluates inside the broadcast join so the fact scan
    is single-pass with the quantity bounds pushed down as the arms'
    envelope.  Output is one exact-cents row — the canonical "does the
    optimizer decompose OR-of-ANDs" probe.

    ``empty_as_zero=False`` drops the scalar row when NO lineitem matched
    (sum is NULL) instead of coalescing to 0.0 — the form the
    ``suite_extra`` union uses so an empty input yields an empty union
    (the registry-wide empty-input invariant).
    """
    li = _scan(spark, sf_dir, "lineitem")
    part = _scan(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    arm = None
    for brand, (s_lo, s_hi), (q_lo, q_hi) in DISJ_ARMS:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        arm = c if arm is None else (arm | c)
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(arm)
        .agg(
            F.sum(_revenue_cents()).alias("_rev"),
            F.count("*").alias("_n"),
        )
    )
    if not empty_as_zero:
        # count(*) > 0, the SAME predicate as the oracle's HAVING (ADVICE
        # r7 low: an IS NOT NULL filter here diverges from the oracle if
        # matched rows ever aggregated to a NULL sum).
        return agg.filter(F.col("_n") > 0).select(
            (F.col("_rev").cast("double") / 10000.0).alias("revenue")
        )
    return agg.select(
        (F.coalesce(F.col("_rev"), F.lit(0)).cast("double") / 10000.0).alias("revenue")
    )


def _disj_arm_sql() -> str:
    arms = []
    for brand, (s_lo, s_hi), (q_lo, q_hi) in DISJ_ARMS:
        arms.append(
            f"(p_brand = '{brand}' AND p_size BETWEEN {s_lo} AND {s_hi} "
            f"AND l_quantity BETWEEN {q_lo} AND {q_hi})"
        )
    return "\n   OR ".join(arms)


DISJUNCTIVE_REVENUE_SQL = f"""
SELECT coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))), 0) / 10000.0 AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE {_disj_arm_sql()}
"""


# --- idle high-balance customers (TPC-H Q22 shape) ---------------------------


#: Q22 adaptation: the generator gives EVERY customer at least one order
#: (verified at sf0.001/0.01), so "never ordered" is empty at every SF —
#: "idle" here means CHURNED: no order at or after this cutoff (orders
#: span 1995..2001).  Same plan shape, populated result.
IDLE_CUTOFF = "2000-01-01 00:00:00"


def idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation count and balance of ABOVE-AVERAGE-balance customers with
    no RECENT order (TPC-H Q22 shape, churn form): a global scalar
    subquery (the positive-balance average) gating an anti-join against
    the date-filtered orders.

    Output: (c_nationkey, numcust, totacctbal) — balances summed as exact
    cents, collapsed to dollars at the end.

    Scale: the scalar average is one partial-agg pass reduced to a single
    row and broadcast into the filter (no per-row subquery); the cutoff
    pushes to the orders scan; the anti-join shuffles customer against
    the filtered orders on custkey once (or broadcasts the distinct
    custkey side when it fits); the final aggregate exchanges a
    <= |nations| key space.
    """
    cust = _scan(spark, sf_dir, "customer")
    orders = (
        _scan(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(IDLE_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    avg_pos = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(cents) / F.count("*")).alias("_avg_cents"))
    )
    rich = (
        cust.select("c_custkey", "c_nationkey", cents.alias("_cents"))
        .join(F.broadcast(avg_pos))
        .filter(F.col("_cents") > F.col("_avg_cents"))
    )
    return (
        rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum("_cents").alias("_tot"),
        )
        .select(
            "c_nationkey",
            "numcust",
            (F.col("_tot").cast("double") / 100.0).alias("totacctbal"),
        )
    )


IDLE_CUSTOMERS_SQL = f"""
WITH cents AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
         c_acctbal
  FROM customer
),
avg_pos AS (
  SELECT sum(bal_cents) / count(*) AS avg_cents FROM cents WHERE c_acctbal > 0
)
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       sum(bal_cents) / 100.0 AS totacctbal
FROM cents, avg_pos
WHERE bal_cents > avg_cents
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{IDLE_CUTOFF}'
  )
GROUP BY c_nationkey
"""


# --- r7 registry consolidation: the four r6 OLAP shapes as one keyed union ---


def suite_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r6+r8+r9 OLAP shapes beyond the individually-registered
    queries — Q5 local supplier volume, Q7 nation trade volume, Q19
    disjunctive revenue, Q22 idle customers, (r8) Q6 forecast revenue,
    Q10 returned-item revenue, Q14 promo revenue share, Q17
    small-quantity revenue, and (r9) Q20 dominant suppliers, Q21 waiting
    suppliers, Q8 national market share, and (r9b) Q15 top supplier, Q16
    supplier-per-part counts, Q9 nation profit — as ONE keyed union: the
    registry-facing composition that
    earns all fourteen a driver CORRECTNESS row inside the 50-query window
    (each component stays public and individually parity-gated in
    tests/test_offregistry_parity.py).

    Normalized schema ``(shape, k, v)``: shape names the component, ``k``
    is its grouping key flattened to one string (pipe-joined for Q7;
    Q22 emits one row per metric so both ``numcust`` and ``totacctbal``
    are value-hashed; Q10's arm keys by custkey and hashes the revenue —
    its decoration columns live in the off-registry full shape), ``v``
    the metric as double.  Scalar arms use the drop-empty forms so the
    union keeps the registry-wide empty-input -> empty-output invariant
    (the r9 grouped arms are empty-safe by construction).

    Scale: a UNION of independent plans — each keeps its own shape's
    plan guarantees (single fact shuffle, pruned broadcasts, pushed
    disjunction, scalar-subquery anti-join, decorrelated per-part agg);
    the union itself adds no exchange.
    """
    arms = suite_extra_arms(spark, sf_dir)
    out = None
    for df in arms.values():
        out = df if out is None else out.unionByName(df)
    return out


def suite_extra_arms(
    spark: SparkSession, sf_dir: str, dsl: bool = False
) -> "dict[str, DataFrame]":
    """The fourteen :func:`suite_extra` arms as an ordered dict keyed by
    shape name — the EXACT frames the union composes (r14, VERDICT r13
    #2: per-arm cost was invisible inside the 14-arm union row, making
    drift unattributable; bench.py times each arm from this dict right
    after the union measurement, and tests/test_plans.py pins that the
    union equals these arms so the trace measures the real thing).

    Default construction path (r14 optimization round 2nd session, guide
    §1.2 — driver-side work): each arm is ONE Spark-SQL statement parsed
    JVM-side (``_suite_arm_sx``), instead of ~8.5k py4j round trips of
    Column-DSL building per 14-arm rebuild (~measured 3-4 s per bench
    run on a loaded gateway).  The statements mirror the DSL functions'
    exact arithmetic (same exact-integer cents forms, same double
    literals, same broadcast hints); equality with the DSL twins is
    pinned row-for-row at two SFs in
    tests/test_plans.py::test_suite_extra_sql_arms_equal_dsl, and each
    DSL component keeps its own DuckDB parity gate in
    tests/test_offregistry_parity.py.  ``dsl=True`` builds the original
    Column-DSL frames (the reference twins)."""
    if not dsl:
        tables = {
            t: _scan(spark, sf_dir, t)
            for t in (
                "lineitem", "orders", "customer", "supplier",
                "nation", "region", "part",
            )
        }
        return {
            name: spark.sql(sx, **tables)
            for name, sx in _suite_arm_sx().items()
        }
    q5 = local_supplier_volume(spark, sf_dir).select(
        F.lit("q5_local_volume").alias("shape"),
        F.col("n_name").alias("k"),
        F.col("revenue").alias("v"),
    )
    q7 = nation_trade_volume(spark, sf_dir).select(
        F.lit("q7_trade_volume").alias("shape"),
        F.concat_ws(
            "|", "supp_nation", "cust_nation", F.col("l_year").cast("string")
        ).alias("k"),
        F.col("revenue").alias("v"),
    )
    q19 = disjunctive_revenue(spark, sf_dir, empty_as_zero=False).select(
        F.lit("q19_disjunctive").alias("shape"),
        F.lit("*").alias("k"),
        F.col("revenue").alias("v"),
    )
    # ONE Q22 computation: its two metrics explode into (metric, value)
    # rows instead of planning the customer+orders anti-join subtree twice
    # (r7 review catch — the union-of-two-selects form did exactly that).
    q22 = idle_customers(spark, sf_dir).select(
        F.lit("q22_idle").alias("shape"),
        F.col("c_nationkey").cast("string").alias("_nk"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("numcust").alias("m"),
                    F.col("numcust").cast("double").alias("v"),
                ),
                F.struct(F.lit("totacctbal").alias("m"), F.col("totacctbal").alias("v")),
            )
        ).alias("mv"),
    ).select(
        "shape",
        F.concat_ws("|", "_nk", F.col("mv.m")).alias("k"),
        F.col("mv.v").alias("v"),
    )
    q6 = forecast_revenue(spark, sf_dir, empty_as_zero=False).select(
        F.lit("q6_forecast").alias("shape"),
        F.lit("*").alias("k"),
        F.col("revenue").alias("v"),
    )
    q10 = returned_item_revenue(spark, sf_dir).select(
        F.lit("q10_returned").alias("shape"),
        F.col("c_custkey").cast("string").alias("k"),
        F.col("revenue").alias("v"),
    )
    q14 = promo_revenue_share(spark, sf_dir, drop_empty=True).select(
        F.lit("q14_promo").alias("shape"),
        F.lit("*").alias("k"),
        F.col("promo_share").alias("v"),
    )
    q17 = small_quantity_revenue(spark, sf_dir, drop_empty=True).select(
        F.lit("q17_smallqty").alias("shape"),
        F.lit("*").alias("k"),
        F.col("avg_yearly").alias("v"),
    )
    q20 = dominant_suppliers(spark, sf_dir).select(
        F.lit("q20_dominant").alias("shape"),
        F.col("s_name").alias("k"),
        F.col("n_dominant").cast("double").alias("v"),
    )
    q21 = waiting_suppliers(spark, sf_dir).select(
        F.lit("q21_waiting").alias("shape"),
        F.col("s_name").alias("k"),
        F.col("numwait").cast("double").alias("v"),
    )
    q8 = market_share(spark, sf_dir).select(
        F.lit("q8_mktshare").alias("shape"),
        F.col("o_year").cast("string").alias("k"),
        F.col("mkt_share").alias("v"),
    )
    q15 = top_supplier(spark, sf_dir).select(
        F.lit("q15_topsupp").alias("shape"),
        F.col("s_name").alias("k"),
        F.col("total_revenue").alias("v"),
    )
    q16 = supplier_counts(spark, sf_dir).select(
        F.lit("q16_suppcnt").alias("shape"),
        F.concat_ws(
            "|", "p_brand", "p_type", F.col("p_size").cast("string")
        ).alias("k"),
        F.col("supplier_cnt").cast("double").alias("v"),
    )
    q9 = nation_profit(spark, sf_dir).select(
        F.lit("q9_profit").alias("shape"),
        F.concat_ws("|", "nation", F.col("o_year").cast("string")).alias("k"),
        F.col("sum_profit").alias("v"),
    )
    # insertion order == the pre-r14 union order (the registry query's
    # row order is irrelevant — the driver sorts — but keep it stable)
    return {
        "q5_local_volume": q5,
        "q7_trade_volume": q7,
        "q19_disjunctive": q19,
        "q22_idle": q22,
        "q6_forecast": q6,
        "q10_returned": q10,
        "q14_promo": q14,
        "q17_smallqty": q17,
        "q20_dominant": q20,
        "q21_waiting": q21,
        "q8_mktshare": q8,
        "q15_topsupp": q15,
        "q16_suppcnt": q16,
        "q9_profit": q9,
    }


# Q19 arm without the empty-input scalar row (HAVING count(*) > 0 drops the
# NULL-sum row exactly when no lineitem matched) — keeps the union's
# registry-wide "empty input -> empty output" invariant.
_DISJ_NONEMPTY_SQL = f"""
SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
       * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE {_disj_arm_sql()}
HAVING count(*) > 0
"""


# NOTE: SUITE_EXTRA_SQL is assigned at the END of this module — the r8
# union composes the Q6/Q10/Q14/Q17 oracle constants defined below.


# --- forecast revenue change (TPC-H Q6 shape) --------------------------------

#: Q6 parameters: one ship-year window, a discount band, a quantity cap.
FORECAST_FROM = "1996-01-01 00:00:00"
FORECAST_TO = "1997-01-01 00:00:00"
FORECAST_DISC_LO_C = 5  # discount cents
FORECAST_DISC_HI_C = 7
FORECAST_MAX_QTY = 24


def forecast_revenue(
    spark: SparkSession, sf_dir: str, empty_as_zero: bool = True
) -> DataFrame:
    """Forecast revenue change (TPC-H Q6 shape): the revenue that would
    be recovered by eliminating small discounts on low-quantity lines —
    one scalar over a pure filter-aggregate with NO join at all.

    Output: one row ``(revenue)``, sum(extendedprice * discount) over
    the window, exact cents x cents integer arithmetic.

    Scale: the canonical pushdown probe — the ship-date window, the
    quantity cap, and a SARGable envelope of the discount band (the
    exact cents band is a round+cast expression no scan can push; see
    the inline note) all reach the parquet scan as PushedFilters, and
    the aggregate is a map-side partial collapsed to one row; any plan
    with a shuffle bigger than the single-row exchange is wrong
    (pinned in tests/test_plans.py, including the l_discount pushdown).

    ``empty_as_zero=False`` drops the scalar row when no line matched
    (count(*) > 0, the same predicate as the oracle's HAVING) — the form
    the ``suite_extra`` union uses for the registry-wide empty-input
    invariant.
    """
    li = _scan(spark, sf_dir, "lineitem")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * disc_c
    # The cents-exact discount band is an EXPRESSION (round+cast), which
    # no parquet scan can push — so a redundant plain-column envelope
    # rides along: round(d*100) in [5,7] implies d in [0.045, 0.075),
    # and [0.044, 0.076] contains it, so the envelope never drops a
    # qualifying row (same trick as Q19's quantity envelope) while
    # giving the scan a SARGable l_discount range.  The exact band stays
    # as the residual; the oracle needs no mirror (implied predicates
    # cannot change results).
    agg = li.filter(
        (F.col("l_shipdate") >= F.lit(FORECAST_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(FORECAST_TO).cast("timestamp"))
        & F.col("l_discount").between(
            FORECAST_DISC_LO_C / 100.0 - 0.006, FORECAST_DISC_HI_C / 100.0 + 0.006
        )
        & disc_c.between(FORECAST_DISC_LO_C, FORECAST_DISC_HI_C)
        & (F.col("l_quantity") < FORECAST_MAX_QTY)
    ).agg(F.sum(rev).alias("_rev"), F.count("*").alias("_n"))
    if not empty_as_zero:
        return agg.filter(F.col("_n") > 0).select(
            (F.col("_rev").cast("double") / 10000.0).alias("revenue")
        )
    return agg.select(
        (F.coalesce(F.col("_rev"), F.lit(0)).cast("double") / 10000.0).alias(
            "revenue"
        )
    )


FORECAST_REVENUE_SQL = f"""
SELECT coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round(l_discount * 100) AS BIGINT)), 0) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{FORECAST_FROM}'
  AND l_shipdate < TIMESTAMP '{FORECAST_TO}'
  AND CAST(round(l_discount * 100) AS BIGINT)
      BETWEEN {FORECAST_DISC_LO_C} AND {FORECAST_DISC_HI_C}
  AND l_quantity < {FORECAST_MAX_QTY}
"""


# --- returned-item revenue (TPC-H Q10 shape) ---------------------------------

#: Q10 parameters: one order-date quarter; top-k complaining customers.
RETURNED_FROM = "1997-01-01 00:00:00"
RETURNED_TO = "1997-04-01 00:00:00"
RETURNED_K = 20


def returned_item_revenue(
    spark: SparkSession, sf_dir: str, k: int = RETURNED_K
) -> DataFrame:
    """Top customers by revenue of RETURNED items in one quarter
    (TPC-H Q10 shape): the fact-side group-then-decorate plan — filter
    orders to the quarter, lineitem to returnflag 'R', aggregate revenue
    per customer, then decorate the few surviving customers with their
    name / balance / nation via broadcast joins.

    Output: (c_custkey, c_name, revenue, c_acctbal, n_name), top ``k``
    by revenue (custkey tiebreak).

    Scale: the quarter + returnflag predicates push to the scans;
    customer and nation broadcast (explicit hints); the lineitem-orders
    join is deliberately UNhinted — at bench scale AQE broadcasts the
    quarter-filtered orders slice (the plan test pins one exchange
    here), while at 100 TB a quarter of orders is itself fact-sized and
    the right plan is the orderkey equi-join shuffle, which the
    optimizer picks from statistics; forcing a broadcast would wedge
    the large case.  Either way the per-customer aggregate is the one
    row-sized shuffle (uniform key) and the top-k is
    TakeOrderedAndProject, never a global sort.
    """
    li = _scan(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = _scan(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(RETURNED_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(RETURNED_TO).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = _scan(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = _scan(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_revenue_cents()).alias("_rev"))
    )
    return (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            (F.col("_rev").cast("double") / 10000.0).alias("revenue"),
            "c_acctbal",
            "n_name",
            F.col("_rev").alias("_o"),
        )
        .orderBy(F.desc("_o"), F.asc("c_custkey"))
        .limit(k)
        .drop("_o")
    )


RETURNED_ITEM_SQL = f"""
SELECT c_custkey, c_name,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue,
       c_acctbal, n_name
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{RETURNED_FROM}'
  AND o_orderdate < TIMESTAMP '{RETURNED_TO}'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) DESC,
         c_custkey ASC
LIMIT {RETURNED_K}
"""


# --- promotion revenue share (TPC-H Q14 shape) -------------------------------

#: Q14 parameters: one ship-month; the promoted part category.  The
#: synthetic generator emits BARE category names (p_type = 'PROMO'), so
#: the equality replaces TPC-H's LIKE 'PROMO%' — same shape, documented
#: deviation.
PROMO_FROM = "1997-06-01 00:00:00"
PROMO_TO = "1997-07-01 00:00:00"
PROMO_TYPE = "PROMO"


def promo_revenue_share(
    spark: SparkSession, sf_dir: str, drop_empty: bool = False
) -> DataFrame:
    """Share of one month's revenue from promoted parts (TPC-H Q14
    shape): a conditional-aggregate ratio — two sums over the same
    joined scan, one gated by the part category, divided at the end.

    Output: one row ``(promo_share)`` = 100 * promo revenue / total
    revenue (NULL when the month is empty, matching the SQL ratio).

    Scale: the month predicate pushes to the fact scan; part prunes to
    (p_partkey, p_type) and broadcasts; both sums are exact-integer and
    collapse map-side into ONE single-row exchange — the
    numerator/denominator never require two passes.
    """
    li = _scan(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(PROMO_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(PROMO_TO).cast("timestamp"))
    )
    part = _scan(spark, sf_dir, "part").select(
        "p_partkey", "p_type"
    )
    rev = _revenue_cents()
    agg = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.sum(F.when(F.col("p_type") == PROMO_TYPE, rev).otherwise(F.lit(0)))
        .alias("_promo"),
        F.sum(rev).alias("_total"),
        F.count("*").alias("_n"),
    )
    if drop_empty:  # suite_extra arm: empty month -> no row, not NULL
        agg = agg.filter(F.col("_n") > 0)
    return agg.select(
        (
            F.lit(100.0)
            * F.col("_promo").cast("double")
            / F.col("_total").cast("double")
        ).alias("promo_share")
    )


PROMO_REVENUE_SQL = f"""
SELECT 100.0 * sum(CASE WHEN p_type = '{PROMO_TYPE}'
           THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
           ELSE 0 END) / sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS promo_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{PROMO_FROM}'
  AND l_shipdate < TIMESTAMP '{PROMO_TO}'
"""


# --- small-quantity-order revenue (TPC-H Q17 shape) --------------------------

#: Q17 parameters: one brand; the below-one-fifth-of-average threshold.
SMALLQTY_BRAND = "Brand#4"


def small_quantity_revenue(
    spark: SparkSession, sf_dir: str, drop_empty: bool = False
) -> DataFrame:
    """Average yearly revenue lost by not filling small-quantity orders
    of one brand's parts (TPC-H Q17 shape): the CORRELATED-aggregate
    probe — each line qualifies iff its quantity is under 1/5 of the
    AVERAGE quantity ordered for ITS OWN part.

    Decorrelation is the point: the per-part average becomes window
    aggregates partitioned by partkey over the brand slice — never a
    per-row subquery, and ONE pass over lineitem (the r8 review caught
    the groupBy+join-back form scanning the corpus-sized fact twice;
    the window shuffles the tiny brand slice once and reads the scan
    once).  Per-part windows here carry ~tens of rows, so the usual
    hot-key window caveat does not apply.  The threshold compare is
    INTEGER-exact (quantities are integral): ``5 * qty * cnt <
    sum_qty`` replaces the fractional ``qty < 0.2 * avg`` with no
    float boundary, mirrored in the oracle.

    Output: one row ``(avg_yearly)`` = qualifying extendedprice sum / 7
    (the TPC-H year-count convention).

    Scale: part prunes to the brand and broadcasts into the fact scan
    (the only corpus-sized read, read once); the window shuffles only
    the brand's lines (a ~1/|brands| slice) on a uniform partkey.
    """
    part = _scan(spark, sf_dir, "part").filter(
        F.col("p_brand") == SMALLQTY_BRAND
    ).select("p_partkey")
    qty = F.col("l_quantity").cast("long")
    li = (
        _scan(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            qty.alias("_qty"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("_ep"),
        )
    )
    w = Window.partitionBy("l_partkey")
    agg = (
        li.select(
            "_qty",
            "_ep",
            F.sum("_qty").over(w).alias("_sum_qty"),
            F.count("*").over(w).alias("_cnt"),
        )
        .filter(F.lit(5) * F.col("_qty") * F.col("_cnt") < F.col("_sum_qty"))
        .agg(F.sum("_ep").alias("_rev"), F.count("*").alias("_n"))
    )
    if drop_empty:  # suite_extra arm: no qualifying line -> no row
        return agg.filter(F.col("_n") > 0).select(
            (F.col("_rev").cast("double") / 100.0 / 7.0).alias("avg_yearly")
        )
    return agg.select(
        (
            F.coalesce(F.col("_rev"), F.lit(0)).cast("double") / 100.0 / 7.0
        ).alias("avg_yearly")
    )


SMALL_QUANTITY_SQL = f"""
WITH brand_lines AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS ep
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{SMALLQTY_BRAND}'
),
per_part AS (
  SELECT l_partkey, sum(qty) AS sum_qty, CAST(count(*) AS BIGINT) AS cnt
  FROM brand_lines GROUP BY l_partkey
)
SELECT coalesce(sum(ep), 0) / 100.0 / 7.0 AS avg_yearly
FROM brand_lines JOIN per_part USING (l_partkey)
WHERE 5 * qty * cnt < sum_qty
"""


# --- dominant suppliers (TPC-H Q20 shape) ------------------------------------

#: Q20 parameters: a part-name prefix and one ship-year window.  The classic
#: Q20 runs its correlated aggregate against partsupp.ps_availqty; the driver
#: schema has no partsupp table, so the adapted predicate keeps the exact
#: decorrelation STRUCTURE (nested IN over a correlated per-group aggregate)
#: against lineitem itself: a supplier qualifies iff EXISTS a prefix-named
#: part for which the supplier shipped MORE THAN HALF of that part's total
#: in-window volume.  No trailing nation filter (the driver corpus spreads
#: dominance thin; the probe is the decorrelation, not the dim filter).
DOMINANT_PREFIX = "red "
DOMINANT_FROM = "1997-01-01 00:00:00"
DOMINANT_TO = "1998-01-01 00:00:00"


def dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant part suppliers (TPC-H Q20 shape): suppliers for whom at
    least one prefix-named part exists whose in-window shipments they
    dominate — the NESTED-IN-over-correlated-aggregate probe (classic
    Q20 compares a (part, supplier) availability row against half that
    pair's shipped quantity; with no partsupp table in this schema the
    adapted threshold is half the PART's total shipped quantity, which
    preserves the correlated-aggregate decorrelation exactly).

    Decorrelation: the correlated "total quantity of THIS part" subquery
    becomes a window sum over the (part, supplier) aggregate slice —
    never a per-row subquery, and ONE pass over lineitem (the Q17
    playbook: the window runs over the already-aggregated prefix slice,
    tiny groups, no second fact scan).  The dominance compare is
    INTEGER-exact: ``2 * qty > total`` (quantities are integral).

    Output: ``(s_name, n_dominant)`` — one row per qualifying supplier
    with the number of parts it dominates, name-ordered.

    Scale: part prunes to the prefix and broadcasts into the fact scan
    (the only corpus-sized read, filters pushed); the groupBy shuffles
    only the prefix-window slice; the window and the supplier decoration
    run over the per-(part, supplier) aggregate — |slice| rows, not the
    corpus.  Plan pinned in tests/test_plans.py (one lineitem scan, no
    cartesian, broadcast dims).
    """
    parts = (
        _scan(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith(DOMINANT_PREFIX))
        .select("p_partkey")
    )
    pair = (
        _scan(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(DOMINANT_FROM).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(DOMINANT_TO).cast("timestamp"))
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("_qty"))
    )
    w = Window.partitionBy("l_partkey")
    qual = pair.select(
        "l_suppkey", "_qty", F.sum("_qty").over(w).alias("_total")
    ).filter(F.lit(2) * F.col("_qty") > F.col("_total"))
    supp = _scan(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        qual.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("n_dominant"))
        .orderBy("s_name")
    )


DOMINANT_SUPPLIERS_SQL = f"""
WITH pr AS (SELECT p_partkey FROM part WHERE p_name LIKE '{DOMINANT_PREFIX}%'),
pair AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem JOIN pr ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{DOMINANT_FROM}'
    AND l_shipdate < TIMESTAMP '{DOMINANT_TO}'
  GROUP BY l_partkey, l_suppkey
),
tot AS (SELECT l_partkey, sum(qty) AS total FROM pair GROUP BY l_partkey)
SELECT s_name, CAST(count(*) AS BIGINT) AS n_dominant
FROM pair JOIN tot USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE 2 * qty > total
GROUP BY s_name
ORDER BY s_name
"""


# --- waiting suppliers (TPC-H Q21 shape) --------------------------------------

#: Q21 parameters.  The classic Q21 flags a line as late via
#: l_receiptdate > l_commitdate; the driver schema carries neither column,
#: so the adapted predicate derives lateness from the columns it has
#: (shipped >= N days after the order date) — the chained
#: EXISTS / NOT EXISTS over lineitem self-references is untouched.
WAITING_NATION = "NATION_3"
WAITING_LATE_DAYS = 60
WAITING_K = 100


def waiting_suppliers(
    spark: SparkSession, sf_dir: str, k: int = WAITING_K
) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape): for finalized
    ('F') multi-supplier orders, count per supplier the late lines where
    NO OTHER supplier on the same order was also late — the chained
    EXISTS (another supplier exists) / NOT EXISTS (no other supplier
    failed) self-reference probe.

    Decorrelation: both correlated subqueries collapse into per-order
    DISTINCT-supplier counts over ONE lineitem pass — ``n_supp`` (any
    other supplier exists iff > 1) and ``n_late`` (no OTHER late
    supplier iff == 1, since the candidate line is itself late) — as
    ``collect_set`` sizes over a window keyed by the SAME l_orderkey the
    orders join uses, so the join's exchange is reused and the fact
    never shuffles twice (per-order groups are bounded by order width,
    so the set state is tiny).  Lateness = shipped >= 60 days after the
    order date (see the parameter note: the driver schema has no
    receipt/commit dates).

    Output: ``(s_name, numwait)`` — top-k by wait count desc, name asc
    (the Q21 output contract).

    Scale: ONE lineitem scan (pinned), orders pruned to status 'F' and
    projected to (key, date) before the join, supplier x nation
    broadcast after the per-order flags; the only corpus-sized exchange
    is the single orderkey shuffle the join and window share.
    """
    orders = (
        _scan(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = F.col("l_shipdate") >= F.col("o_orderdate") + F.expr(
        f"INTERVAL {WAITING_LATE_DAYS} DAYS"
    )
    li = (
        _scan(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("_late"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = li.select(
        "l_suppkey",
        "_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("_n_supp"),
        F.size(
            F.collect_set(
                F.when(F.col("_late"), F.col("l_suppkey"))
            ).over(w)
        ).alias("_n_late"),
    ).filter(
        F.col("_late") & (F.col("_n_supp") > 1) & (F.col("_n_late") == 1)
    )
    supp = (
        _scan(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _scan(spark, sf_dir, "nation").filter(
                    F.col("n_name") == WAITING_NATION
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        flagged.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(k)
    )


WAITING_SUPPLIERS_SQL = f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate >= o_orderdate + INTERVAL {WAITING_LATE_DAYS} DAY) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_ord AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
  FROM li GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM li JOIN per_ord USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE late AND n_supp > 1 AND n_late = 1 AND n_name = '{WAITING_NATION}'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT {WAITING_K}
"""


# --- national market share (TPC-H Q8 shape) -----------------------------------

#: Q8 parameters: one region's customers, one part type, a two-year order
#: window, and the supplier nation whose revenue share is measured.
MKT_REGION = "ASIA"
MKT_TYPE = "PROMO"
MKT_NATION = "NATION_13"
MKT_FROM = "1996-01-01 00:00:00"
MKT_TO = "1998-01-01 00:00:00"


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): of the revenue from one
    part type sold to one region's customers over two years, the share
    supplied by one nation, per order year — the deepest star in the
    suite (seven tables, nation joined TWICE: customer side and supplier
    side) with a nested conditional aggregate.

    Output: ``(o_year, mkt_share)`` — one row per order year in the
    window, share as the exact-integer revenue ratio cast to double
    (both engines divide the same two exact long sums, so the hash is
    stable).

    Scale: lineitem joins orders on the order key — the ONE fact-fact
    shuffle — after both are pruned (type semi-filter broadcast into the
    lineitem scan; date window pushed to the orders scan); every other
    table (part keys, region-filtered customer keys, the two nation
    decorations) broadcasts.  The final aggregate is two rows.  Plan
    pinned in tests/test_plans.py (one scan of each fact, pushdown on
    both, no cartesian).
    """
    part_k = (
        _scan(spark, sf_dir, "part")
        .filter(F.col("p_type") == MKT_TYPE)
        .select("p_partkey")
    )
    nation = _scan(spark, sf_dir, "nation")
    region = _scan(spark, sf_dir, "region").filter(
        F.col("r_name") == MKT_REGION
    )
    cust_in_region = (
        _scan(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        _scan(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("_supp_nation"))
    )
    orders_w = (
        _scan(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(MKT_FROM).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(MKT_TO).cast("timestamp"))
        )
        .join(F.broadcast(cust_in_region), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").cast("int").alias("o_year"))
    )
    rev_q = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    joined = (
        _scan(spark, sf_dir, "lineitem")
        .join(F.broadcast(part_k), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders_w, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("o_year", "_supp_nation", rev_q.alias("_rev_q"))
    )
    return (
        joined.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("_supp_nation") == MKT_NATION, F.col("_rev_q")
                    ).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("_rev_q").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


MARKET_SHARE_SQL = f"""
WITH all_nations AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(round(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_q,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = '{MKT_REGION}' AND p_type = '{MKT_TYPE}'
    AND o_orderdate >= TIMESTAMP '{MKT_FROM}'
    AND o_orderdate < TIMESTAMP '{MKT_TO}'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = '{MKT_NATION}' THEN rev_q ELSE 0 END)
            AS DOUBLE) / sum(rev_q) AS mkt_share
FROM all_nations
GROUP BY o_year
ORDER BY o_year
"""


# --- top supplier (TPC-H Q15 shape) -------------------------------------------

#: Q15 parameters: the classic three-month revenue window.
TOPSUPP_FROM = "1996-01-01 00:00:00"
TOPSUPP_TO = "1996-04-01 00:00:00"


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier(s) by three-month revenue (TPC-H Q15 shape): the
    scalar-MAX-subquery probe — suppliers whose windowed revenue equals
    the maximum over ALL suppliers' windowed revenue (ties all emit, the
    Q15 contract).

    Decorrelation: the classic form computes the ``revenue0`` view twice
    (once per supplier, once under ``max()``).  Here ``revenue0`` is
    computed ONCE from a single fact scan and the global max runs as an
    empty-partition window over it — the window input is the per-supplier
    aggregate, O(|suppliers|) rows (dimension-sized, the same class as
    broadcasting the supplier table), so the single-partition exchange is
    bounded by the dimension, never the corpus.  Revenue is the exact
    integer cent-percent sum; ties compare exactly.

    Output: ``(s_name, total_revenue)`` — revenue in dollars, name-ordered.

    Scale: ONE lineitem scan (pinned), ship window pushed; one corpus-sized
    exchange (the suppkey aggregate); supplier names broadcast.
    """
    rev_q = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    rev = (
        _scan(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(TOPSUPP_FROM).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(TOPSUPP_TO).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev_q).alias("_rev_q"))
    )
    top = rev.select(
        "l_suppkey",
        "_rev_q",
        F.max("_rev_q").over(Window.partitionBy()).alias("_max_q"),
    ).filter(F.col("_rev_q") == F.col("_max_q"))
    supp = _scan(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        top.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_name",
            (F.col("_rev_q").cast("double") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_name")
    )


TOP_SUPPLIER_SQL = f"""
WITH revenue0 AS (
  SELECT l_suppkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TOPSUPP_FROM}'
    AND l_shipdate < TIMESTAMP '{TOPSUPP_TO}'
  GROUP BY l_suppkey
)
SELECT s_name, CAST(rev_q AS DOUBLE) / 10000.0 AS total_revenue
FROM revenue0 JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_q = (SELECT max(rev_q) FROM revenue0)
ORDER BY s_name
"""


# --- parts-supplier relationship (TPC-H Q16 shape) ----------------------------

#: Q16 parameters.  The classic Q16 counts DISTINCT partsupp suppliers per
#: part attribute group, excluding one brand, a type family, and suppliers
#: with complaints in s_comment; the driver schema has neither partsupp nor
#: comment columns, so the supplier relation comes from lineitem (who
#: actually shipped the part) and the complaint exclusion becomes the
#: negative-balance suppliers — the COUNT(DISTINCT)-with-NOT-IN structure
#: is untouched.
SUPPCNT_EXCL_BRAND = "Brand#4"
SUPPCNT_EXCL_TYPE = "MEDIUM"
SUPPCNT_SIZES = (1, 5, 9, 14, 19, 23, 36, 45)


def supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-per-part-attribute counts (TPC-H Q16 shape): how many
    DISTINCT suppliers ship parts of each (brand, type, size) group in a
    size slice, excluding one brand, one type family, and blacklisted
    (negative-balance) suppliers via NOT IN — the count-distinct +
    anti-join probe (see the parameter note for the schema adaptation).

    Output: ``(p_brand, p_type, p_size, supplier_cnt)`` ordered by count
    desc then attributes — the Q16 output contract.

    Scale: part prunes to the size slice minus the excluded brand/type and
    broadcasts into the single fact scan; the NOT IN subquery is a tiny
    broadcast LEFT ANTI (never a shuffle); the distinct count aggregates
    over (attrs, suppkey) pairs — bounded by |parts| x |suppliers|, not
    the corpus.  Plan pinned in tests/test_plans.py.
    """
    parts = (
        _scan(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != SUPPCNT_EXCL_BRAND)
            & (F.col("p_type") != SUPPCNT_EXCL_TYPE)
            & F.col("p_size").isin(*SUPPCNT_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    blacklisted = (
        _scan(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        _scan(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(blacklisted),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


SUPPLIER_COUNTS_SQL = f"""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{SUPPCNT_EXCL_BRAND}'
  AND p_type <> '{SUPPCNT_EXCL_TYPE}'
  AND p_size IN {SUPPCNT_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- product-type profit (TPC-H Q9 shape) -------------------------------------

#: Q9 parameters.  The classic Q9 prices cost from partsupp.ps_supplycost;
#: with no partsupp table the per-unit cost proxy is p_retailprice — the
#: shape (name-substring part filter, supplier-nation decoration, order-year
#: fact-fact join, profit = revenue minus quantity-priced cost, grouped by
#: (nation, year)) is untouched.
PROFIT_NAME_PART = "bolt"


def nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit by nation and year (TPC-H Q9 shape): for parts
    whose name contains a substring, profit per supplier nation per order
    year, where profit = discounted revenue minus quantity times the
    per-unit cost proxy (see the parameter note) — all in exact integer
    cent-percent arithmetic, divided once for display.

    Output: ``(nation, o_year, sum_profit)`` ordered nation asc, year desc
    (the Q9 output contract).

    Scale: part prunes on the pushed name-substring filter and broadcasts
    its (key, cost) pairs into the fact scan; supplier x nation broadcasts;
    the orderkey join against the pruned orders projection is the one
    fact-fact exchange (same class as Q8's, pinned); the final aggregate is
    |nations| x |years| rows.
    """
    parts = (
        _scan(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(PROFIT_NAME_PART))
        .select(
            "p_partkey",
            F.round(F.col("p_retailprice") * 100)
            .cast("long")
            .alias("_cost_c"),
        )
    )
    supp = (
        _scan(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _scan(spark, sf_dir, "nation").select(
                    "n_nationkey", "n_name"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders_y = _scan(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("int").alias("o_year")
    )
    profit_q = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    ) - F.col("l_quantity").cast("long") * F.col("_cost_c") * F.lit(100)
    return (
        _scan(spark, sf_dir, "lineitem")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders_y, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", "o_year")
        .agg(
            (F.sum(profit_q).cast("double") / 10000.0).alias("sum_profit")
        )
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


NATION_PROFIT_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                - CAST(l_quantity AS BIGINT)
                  * CAST(round(p_retailprice * 100) AS BIGINT) * 100)
            AS DOUBLE) / 10000.0 AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{PROFIT_NAME_PART}%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# Drop-empty oracle forms for the scalar r8 arms (HAVING count(*) > 0 drops
# the empty-input scalar row, same predicate as the Spark side).
_FORECAST_NONEMPTY_SQL = f"""
SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
       * CAST(round(l_discount * 100) AS BIGINT)) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{FORECAST_FROM}'
  AND l_shipdate < TIMESTAMP '{FORECAST_TO}'
  AND CAST(round(l_discount * 100) AS BIGINT)
      BETWEEN {FORECAST_DISC_LO_C} AND {FORECAST_DISC_HI_C}
  AND l_quantity < {FORECAST_MAX_QTY}
HAVING count(*) > 0
"""

_PROMO_NONEMPTY_SQL = f"""
SELECT 100.0 * sum(CASE WHEN p_type = '{PROMO_TYPE}'
           THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
           ELSE 0 END) / sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS promo_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{PROMO_FROM}'
  AND l_shipdate < TIMESTAMP '{PROMO_TO}'
HAVING count(*) > 0
"""

_SMALLQTY_NONEMPTY_SQL = f"""
WITH brand_lines AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS ep
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{SMALLQTY_BRAND}'
),
per_part AS (
  SELECT l_partkey, sum(qty) AS sum_qty, CAST(count(*) AS BIGINT) AS cnt
  FROM brand_lines GROUP BY l_partkey
)
SELECT sum(ep) / 100.0 / 7.0 AS avg_yearly
FROM brand_lines JOIN per_part USING (l_partkey)
WHERE 5 * qty * cnt < sum_qty
HAVING count(*) > 0
"""


SUITE_EXTRA_SQL = f"""
WITH q22 AS ({IDLE_CUSTOMERS_SQL})
SELECT 'q5_local_volume' AS shape, n_name AS k, revenue AS v
FROM ({LOCAL_SUPPLIER_VOLUME_SQL}) q5
UNION ALL
SELECT 'q7_trade_volume' AS shape,
       supp_nation || '|' || cust_nation || '|' || CAST(l_year AS VARCHAR) AS k,
       revenue AS v
FROM ({NATION_TRADE_VOLUME_SQL}) q7
UNION ALL
SELECT 'q19_disjunctive' AS shape, '*' AS k, revenue AS v
FROM ({_DISJ_NONEMPTY_SQL}) q19
UNION ALL
SELECT 'q22_idle' AS shape,
       CAST(c_nationkey AS VARCHAR) || '|numcust' AS k,
       CAST(numcust AS DOUBLE) AS v
FROM q22
UNION ALL
SELECT 'q22_idle' AS shape,
       CAST(c_nationkey AS VARCHAR) || '|totacctbal' AS k,
       totacctbal AS v
FROM q22
UNION ALL
SELECT 'q6_forecast' AS shape, '*' AS k, revenue AS v
FROM ({_FORECAST_NONEMPTY_SQL}) q6
UNION ALL
SELECT 'q10_returned' AS shape, CAST(c_custkey AS VARCHAR) AS k, revenue AS v
FROM ({RETURNED_ITEM_SQL}) q10
UNION ALL
SELECT 'q14_promo' AS shape, '*' AS k, promo_share AS v
FROM ({_PROMO_NONEMPTY_SQL}) q14
UNION ALL
SELECT 'q17_smallqty' AS shape, '*' AS k, avg_yearly AS v
FROM ({_SMALLQTY_NONEMPTY_SQL}) q17
UNION ALL
SELECT 'q20_dominant' AS shape, s_name AS k, CAST(n_dominant AS DOUBLE) AS v
FROM ({DOMINANT_SUPPLIERS_SQL}) q20
UNION ALL
SELECT 'q21_waiting' AS shape, s_name AS k, CAST(numwait AS DOUBLE) AS v
FROM ({WAITING_SUPPLIERS_SQL}) q21
UNION ALL
SELECT 'q8_mktshare' AS shape, CAST(o_year AS VARCHAR) AS k, mkt_share AS v
FROM ({MARKET_SHARE_SQL}) q8
UNION ALL
SELECT 'q15_topsupp' AS shape, s_name AS k, total_revenue AS v
FROM ({TOP_SUPPLIER_SQL}) q15
UNION ALL
SELECT 'q16_suppcnt' AS shape,
       p_brand || '|' || p_type || '|' || CAST(p_size AS VARCHAR) AS k,
       CAST(supplier_cnt AS DOUBLE) AS v
FROM ({SUPPLIER_COUNTS_SQL}) q16
UNION ALL
SELECT 'q9_profit' AS shape,
       nation || '|' || CAST(o_year AS VARCHAR) AS k, sum_profit AS v
FROM ({NATION_PROFIT_SQL}) q9
"""


# --- Spark-SQL twins of the suite_extra arms (r14 optimization round) ---------
#
# One statement per arm, parsed JVM-side via ``spark.sql(sx, **tables)``
# (``{table}`` placeholders bind the memoized ``_scan`` DataFrames — no
# named temp views, no session state).  Each statement mirrors its DSL
# twin's arithmetic EXACTLY: the same exact-integer cents expressions,
# the same double literals/casts (``D`` suffixes where a bare literal
# would parse as DECIMAL), the same join/filter structure and broadcast
# hints; ORDER BY is kept only where a LIMIT makes it semantic (the
# driver sorts rows, so a sort without a limit never changes the result
# set).  Row-for-row equality with the DSL twins is pinned in
# tests/test_plans.py::test_suite_extra_sql_arms_equal_dsl.

_SUITE_ARM_SX: "dict[str, str] | None" = None

#: exact-cents revenue (the _revenue_cents() twin)
_REV_SX = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


def _suite_arm_sx() -> "dict[str, str]":
    global _SUITE_ARM_SX
    if _SUITE_ARM_SX is not None:
        return _SUITE_ARM_SX
    rev = _REV_SX
    disj_arm = " OR ".join(
        f"(p_brand = '{brand}' AND p_size BETWEEN {s_lo} AND {s_hi}"
        f" AND l_quantity BETWEEN {q_lo} AND {q_hi})"
        for brand, (s_lo, s_hi), (q_lo, q_hi) in DISJ_ARMS
    )
    fc_lo = FORECAST_DISC_LO_C / 100.0 - 0.006
    fc_hi = FORECAST_DISC_HI_C / 100.0 + 0.006
    sizes = ", ".join(str(s) for s in SUPPCNT_SIZES)
    _SUITE_ARM_SX = {
        "q5_local_volume": f"""
SELECT /*+ BROADCAST(cust, supp, ln) */
       'q5_local_volume' AS shape, ln.n_name AS k,
       CAST(sum({rev}) AS DOUBLE) / 10000.0D AS v
FROM {{lineitem}} li
JOIN (SELECT o_orderkey, o_custkey FROM {{orders}}
      WHERE o_orderdate >= TIMESTAMP '{LOCAL_VOLUME_FROM}'
        AND o_orderdate < TIMESTAMP '{LOCAL_VOLUME_TO}') o
  ON li.l_orderkey = o.o_orderkey
JOIN (SELECT c_custkey, c_nationkey FROM {{customer}}) cust
  ON o.o_custkey = cust.c_custkey
JOIN (SELECT s_suppkey, s_nationkey FROM {{supplier}}) supp
  ON li.l_suppkey = supp.s_suppkey AND cust.c_nationkey = supp.s_nationkey
JOIN (SELECT /*+ BROADCAST(r) */ n_nationkey, n_name
      FROM {{nation}} n JOIN {{region}} r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = '{LOCAL_VOLUME_REGION}') ln
  ON supp.s_nationkey = ln.n_nationkey
GROUP BY ln.n_name
""",
        "q7_trade_volume": f"""
SELECT /*+ BROADCAST(cust, supp, n1, n2) */
       'q7_trade_volume' AS shape,
       concat_ws('|', n1.n_name, n2.n_name,
                 CAST(year(l_shipdate) AS STRING)) AS k,
       CAST(sum({rev}) AS DOUBLE) / 10000.0D AS v
FROM {{lineitem}} li
JOIN (SELECT o_orderkey, o_custkey FROM {{orders}}) o
  ON li.l_orderkey = o.o_orderkey
JOIN (SELECT c_custkey, c_nationkey FROM {{customer}}) cust
  ON o.o_custkey = cust.c_custkey
JOIN (SELECT s_suppkey, s_nationkey FROM {{supplier}}) supp
  ON li.l_suppkey = supp.s_suppkey
JOIN (SELECT n_nationkey, n_name FROM {{nation}}
      WHERE n_name IN ('{TRADE_NATION_A}', '{TRADE_NATION_B}')) n1
  ON supp.s_nationkey = n1.n_nationkey
JOIN (SELECT n_nationkey, n_name FROM {{nation}}
      WHERE n_name IN ('{TRADE_NATION_A}', '{TRADE_NATION_B}')) n2
  ON cust.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{TRADE_NATION_A}' AND n2.n_name = '{TRADE_NATION_B}')
   OR (n1.n_name = '{TRADE_NATION_B}' AND n2.n_name = '{TRADE_NATION_A}')
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
""",
        "q19_disjunctive": f"""
SELECT 'q19_disjunctive' AS shape, '*' AS k,
       CAST(_rev AS DOUBLE) / 10000.0D AS v
FROM (
  SELECT /*+ BROADCAST(p) */ sum({rev}) AS _rev, count(*) AS _n
  FROM {{lineitem}} li
  JOIN (SELECT p_partkey, p_brand, p_size FROM {{part}}) p
    ON li.l_partkey = p.p_partkey
  WHERE {disj_arm}
) WHERE _n > 0
""",
        "q22_idle": f"""
SELECT 'q22_idle' AS shape,
       concat_ws('|', CAST(c_nationkey AS STRING), mv.m) AS k,
       mv.v AS v
FROM (
  SELECT /*+ BROADCAST(ap) */ c_nationkey,
         CAST(count(*) AS BIGINT) AS numcust,
         CAST(sum(_cents) AS DOUBLE) / 100.0D AS totacctbal
  FROM (SELECT c_custkey, c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS _cents
        FROM {{customer}}) c
  CROSS JOIN (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) / count(*)
                     AS _avg_cents
              FROM {{customer}} WHERE c_acctbal > 0) ap
  LEFT ANTI JOIN (SELECT o_custkey FROM {{orders}}
                  WHERE o_orderdate >= TIMESTAMP '{IDLE_CUTOFF}') o
    ON c.c_custkey = o.o_custkey
  WHERE _cents > _avg_cents
  GROUP BY c_nationkey
) LATERAL VIEW explode(array(
    named_struct('m', 'numcust', 'v', CAST(numcust AS DOUBLE)),
    named_struct('m', 'totacctbal', 'v', totacctbal))) t AS mv
""",
        "q6_forecast": f"""
SELECT 'q6_forecast' AS shape, '*' AS k,
       CAST(_rev AS DOUBLE) / 10000.0D AS v
FROM (
  SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round(l_discount * 100) AS BIGINT)) AS _rev,
         count(*) AS _n
  FROM {{lineitem}}
  WHERE l_shipdate >= TIMESTAMP '{FORECAST_FROM}'
    AND l_shipdate < TIMESTAMP '{FORECAST_TO}'
    AND l_discount BETWEEN {fc_lo!r}D AND {fc_hi!r}D
    AND CAST(round(l_discount * 100) AS BIGINT)
        BETWEEN {FORECAST_DISC_LO_C} AND {FORECAST_DISC_HI_C}
    AND l_quantity < {FORECAST_MAX_QTY}
) WHERE _n > 0
""",
        "q10_returned": f"""
SELECT 'q10_returned' AS shape, CAST(c_custkey AS STRING) AS k, v
FROM (
  SELECT /*+ BROADCAST(cust, n) */ cust.c_custkey,
         CAST(pc._rev AS DOUBLE) / 10000.0D AS v, pc._rev AS _o
  FROM (
    SELECT o.o_custkey, sum({rev}) AS _rev
    FROM {{lineitem}} li
    JOIN (SELECT o_orderkey, o_custkey FROM {{orders}}
          WHERE o_orderdate >= TIMESTAMP '{RETURNED_FROM}'
            AND o_orderdate < TIMESTAMP '{RETURNED_TO}') o
      ON li.l_orderkey = o.o_orderkey
    WHERE li.l_returnflag = 'R'
    GROUP BY o.o_custkey
  ) pc
  JOIN (SELECT c_custkey, c_nationkey FROM {{customer}}) cust
    ON pc.o_custkey = cust.c_custkey
  JOIN (SELECT n_nationkey FROM {{nation}}) n
    ON cust.c_nationkey = n.n_nationkey
  ORDER BY _o DESC, c_custkey ASC
  LIMIT {RETURNED_K}
)
""",
        "q14_promo": f"""
SELECT 'q14_promo' AS shape, '*' AS k,
       100.0D * CAST(_promo AS DOUBLE) / CAST(_total AS DOUBLE) AS v
FROM (
  SELECT /*+ BROADCAST(p) */
         sum(CASE WHEN p.p_type = '{PROMO_TYPE}' THEN {rev} ELSE 0 END)
           AS _promo,
         sum({rev}) AS _total,
         count(*) AS _n
  FROM {{lineitem}} li
  JOIN (SELECT p_partkey, p_type FROM {{part}}) p
    ON li.l_partkey = p.p_partkey
  WHERE l_shipdate >= TIMESTAMP '{PROMO_FROM}'
    AND l_shipdate < TIMESTAMP '{PROMO_TO}'
) WHERE _n > 0
""",
        "q17_smallqty": f"""
SELECT 'q17_smallqty' AS shape, '*' AS k,
       CAST(_rev AS DOUBLE) / 100.0D / 7.0D AS v
FROM (
  SELECT sum(_ep) AS _rev, count(*) AS _n
  FROM (
    SELECT _qty, _ep,
           sum(_qty) OVER (PARTITION BY l_partkey) AS _sum_qty,
           count(*) OVER (PARTITION BY l_partkey) AS _cnt
    FROM (
      SELECT /*+ BROADCAST(p) */ li.l_partkey,
             CAST(l_quantity AS BIGINT) AS _qty,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS _ep
      FROM {{lineitem}} li
      JOIN (SELECT p_partkey FROM {{part}}
            WHERE p_brand = '{SMALLQTY_BRAND}') p
        ON li.l_partkey = p.p_partkey
    )
  ) WHERE 5 * _qty * _cnt < _sum_qty
) WHERE _n > 0
""",
        "q20_dominant": f"""
SELECT 'q20_dominant' AS shape, s_name AS k,
       CAST(n_dominant AS DOUBLE) AS v
FROM (
  SELECT /*+ BROADCAST(supp) */ supp.s_name,
         CAST(count(*) AS BIGINT) AS n_dominant
  FROM (
    SELECT l_suppkey FROM (
      SELECT l_suppkey, _qty,
             sum(_qty) OVER (PARTITION BY l_partkey) AS _total
      FROM (
        SELECT /*+ BROADCAST(pr) */ l_partkey, l_suppkey,
               sum(CAST(l_quantity AS BIGINT)) AS _qty
        FROM {{lineitem}} li
        JOIN (SELECT p_partkey FROM {{part}}
              WHERE startswith(p_name, '{DOMINANT_PREFIX}')) pr
          ON li.l_partkey = pr.p_partkey
        WHERE l_shipdate >= TIMESTAMP '{DOMINANT_FROM}'
          AND l_shipdate < TIMESTAMP '{DOMINANT_TO}'
        GROUP BY l_partkey, l_suppkey
      )
    ) WHERE 2 * _qty > _total
  ) q
  JOIN (SELECT s_suppkey, s_name FROM {{supplier}}) supp
    ON q.l_suppkey = supp.s_suppkey
  GROUP BY supp.s_name
)
""",
        "q21_waiting": f"""
SELECT 'q21_waiting' AS shape, s_name AS k, CAST(numwait AS DOUBLE) AS v
FROM (
  SELECT /*+ BROADCAST(supp) */ supp.s_name,
         CAST(count(*) AS BIGINT) AS numwait
  FROM (
    SELECT l_suppkey FROM (
      SELECT l_suppkey, _late,
             size(collect_set(l_suppkey)
                  OVER (PARTITION BY l_orderkey)) AS _n_supp,
             size(collect_set(CASE WHEN _late THEN l_suppkey END)
                  OVER (PARTITION BY l_orderkey)) AS _n_late
      FROM (
        SELECT li.l_orderkey, li.l_suppkey,
               (li.l_shipdate >= o.o_orderdate
                + INTERVAL {WAITING_LATE_DAYS} DAYS) AS _late
        FROM (SELECT l_orderkey, l_suppkey, l_shipdate FROM {{lineitem}}) li
        JOIN (SELECT o_orderkey, o_orderdate FROM {{orders}}
              WHERE o_orderstatus = 'F') o
          ON li.l_orderkey = o.o_orderkey
      )
    ) WHERE _late AND _n_supp > 1 AND _n_late = 1
  ) q
  JOIN (SELECT /*+ BROADCAST(n) */ s_suppkey, s_name
        FROM {{supplier}} s
        JOIN (SELECT n_nationkey FROM {{nation}}
              WHERE n_name = '{WAITING_NATION}') n
          ON s.s_nationkey = n.n_nationkey) supp
    ON q.l_suppkey = supp.s_suppkey
  GROUP BY supp.s_name
  ORDER BY numwait DESC, s_name ASC
  LIMIT {WAITING_K}
)
""",
        "q8_mktshare": f"""
SELECT 'q8_mktshare' AS shape, CAST(o_year AS STRING) AS k,
       CAST(_nat AS DOUBLE) / CAST(_tot AS DOUBLE) AS v
FROM (
  SELECT o_year,
         sum(CASE WHEN _supp_nation = '{MKT_NATION}' THEN _rev_q ELSE 0 END)
           AS _nat,
         sum(_rev_q) AS _tot
  FROM (
    SELECT /*+ BROADCAST(pk, sn) */ o.o_year, sn._supp_nation,
           {rev} AS _rev_q
    FROM {{lineitem}} li
    JOIN (SELECT p_partkey FROM {{part}} WHERE p_type = '{MKT_TYPE}') pk
      ON li.l_partkey = pk.p_partkey
    JOIN (SELECT /*+ BROADCAST(cr) */ o_orderkey,
                 CAST(year(o_orderdate) AS INT) AS o_year
          FROM {{orders}} o2
          JOIN (SELECT /*+ BROADCAST(nr) */ c_custkey
                FROM {{customer}} c
                JOIN (SELECT /*+ BROADCAST(r) */ n_nationkey
                      FROM {{nation}} n
                      JOIN {{region}} r ON n.n_regionkey = r.r_regionkey
                      WHERE r.r_name = '{MKT_REGION}') nr
                  ON c.c_nationkey = nr.n_nationkey) cr
            ON o2.o_custkey = cr.c_custkey
          WHERE o_orderdate >= TIMESTAMP '{MKT_FROM}'
            AND o_orderdate < TIMESTAMP '{MKT_TO}') o
      ON li.l_orderkey = o.o_orderkey
    JOIN (SELECT /*+ BROADCAST(nn) */ s_suppkey, nn.n_name AS _supp_nation
          FROM {{supplier}} s
          JOIN (SELECT n_nationkey, n_name FROM {{nation}}) nn
            ON s.s_nationkey = nn.n_nationkey) sn
      ON li.l_suppkey = sn.s_suppkey
  ) GROUP BY o_year
)
""",
        "q15_topsupp": f"""
SELECT 'q15_topsupp' AS shape, s_name AS k,
       CAST(_rev_q AS DOUBLE) / 10000.0D AS v
FROM (
  SELECT /*+ BROADCAST(supp) */ supp.s_name, r._rev_q
  FROM (
    SELECT l_suppkey, _rev_q, max(_rev_q) OVER () AS _max_q
    FROM (
      SELECT l_suppkey, sum({rev}) AS _rev_q
      FROM {{lineitem}}
      WHERE l_shipdate >= TIMESTAMP '{TOPSUPP_FROM}'
        AND l_shipdate < TIMESTAMP '{TOPSUPP_TO}'
      GROUP BY l_suppkey
    )
  ) r
  JOIN (SELECT s_suppkey, s_name FROM {{supplier}}) supp
    ON r.l_suppkey = supp.s_suppkey
  WHERE r._rev_q = r._max_q
)
""",
        "q16_suppcnt": f"""
SELECT 'q16_suppcnt' AS shape,
       concat_ws('|', p_brand, p_type, CAST(p_size AS STRING)) AS k,
       CAST(supplier_cnt AS DOUBLE) AS v
FROM (
  SELECT /*+ BROADCAST(p, bl) */ p_brand, p_type, p_size,
         count(DISTINCT l_suppkey) AS supplier_cnt
  FROM (SELECT l_partkey, l_suppkey FROM {{lineitem}}) li
  JOIN (SELECT p_partkey, p_brand, p_type, p_size FROM {{part}}
        WHERE p_brand <> '{SUPPCNT_EXCL_BRAND}'
          AND p_type <> '{SUPPCNT_EXCL_TYPE}'
          AND p_size IN ({sizes})) p
    ON li.l_partkey = p.p_partkey
  LEFT ANTI JOIN (SELECT s_suppkey FROM {{supplier}}
                  WHERE s_acctbal < 0) bl
    ON li.l_suppkey = bl.s_suppkey
  GROUP BY p_brand, p_type, p_size
)
""",
        "q9_profit": f"""
SELECT 'q9_profit' AS shape,
       concat_ws('|', nation, CAST(o_year AS STRING)) AS k, v
FROM (
  SELECT /*+ BROADCAST(p, sn) */ sn.nation, o.o_year,
         CAST(sum({rev}
                  - CAST(l_quantity AS BIGINT) * p._cost_c * 100)
              AS DOUBLE) / 10000.0D AS v
  FROM {{lineitem}} li
  JOIN (SELECT p_partkey,
               CAST(round(p_retailprice * 100) AS BIGINT) AS _cost_c
        FROM {{part}} WHERE contains(p_name, '{PROFIT_NAME_PART}')) p
    ON li.l_partkey = p.p_partkey
  JOIN (SELECT /*+ BROADCAST(nn) */ s_suppkey, nn.n_name AS nation
        FROM {{supplier}} s
        JOIN (SELECT n_nationkey, n_name FROM {{nation}}) nn
          ON s.s_nationkey = nn.n_nationkey) sn
    ON li.l_suppkey = sn.s_suppkey
  JOIN (SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year
        FROM {{orders}}) o
    ON li.l_orderkey = o.o_orderkey
  GROUP BY sn.nation, o.o_year
)
""",
    }
    return _SUITE_ARM_SX
