"""Driver-contract queries: every operator exposed as a (Spark, DuckDB
oracle) pair over the TESTDATA tables.

Each entry in :data:`QUERIES` is ``name -> (callable(spark, sf_dir) ->
DataFrame, oracle_sql | None)``. Column names/aliases match between the
two sides exactly (the driver sorts columns by name and value-hashes).
Cross-engine determinism rules used throughout:

- hashes via md5 (identical hex in both engines); md5→int via
  Spark ``conv(substr(md5 x),16,10)`` ≡ DuckDB ``('0x'||substr)::bigint``
- aggregates over doubles rounded (2-6 dp) in BOTH engines
- rankings ordered by rounded measure + id tiebreak in BOTH engines
- timestamps stringified with the same format in BOTH engines
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ig_etl_sync_spark.functions.vectors import l2_norm
from ig_etl_sync_spark.operators import dedup as D
from ig_etl_sync_spark.operators import similarity as S
from ig_etl_sync_spark.operators import textops as T
from ig_etl_sync_spark.operators.reconcile import reconcile, snapshot_of
from ig_etl_sync_spark.sources.catalog import load_table

# ---------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _parallel_build(*thunks):
    """Construct independent query branches on a thread pool (guide
    §2.6): operator constructions run their pins eagerly (a lazy
    checkpoint executes its subtree at call time under AQE), so
    building a multi-route query serially leaves the cluster idle
    between subtree jobs. Plans and results are identical — only the
    job submission order changes. Returns the thunks' results in
    order."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futs = [pool.submit(t) for t in thunks]
        return [f.result() for f in futs]


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Spread a small-file (single-scan-partition) input for
    compute-bound per-row work. Explicit count: AQE would coalesce a
    byte-small shuffle back to 1 partition."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(key))


_MD5_INT_SQL = "('0x' || substr(md5({x}), 1, 8))::BIGINT"

_TOKENS_SQL = (
    "list_filter(string_split_regex(trim({x}), '\\s+'), t -> t <> '')"
)

_NORM_TEXT_SQL = (
    "regexp_replace(regexp_replace(lower(trim({x})), '[^\\w\\s]', '', 'g'),"
    " '\\s+', ' ', 'g')"
)


def _shingles_sql(x: str, k: int) -> str:
    """DuckDB equivalent of textops.word_shingles(normalized_text(x), k)."""
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x=x))
    return (
        f"CASE WHEN len({toks}) <= {k} THEN [array_to_string({toks}, ' ')] "
        f"ELSE list_transform(generate_series(0, len({toks}) - {k}), "
        f"i -> array_to_string(({toks})[i+1:i+{k}], ' ')) END"
    )


# ---------------------------------------------------------------------
# 1. Relational core (the surface the engine composes; Catalyst-native)
# ---------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-agg; pushdown + partial agg showcase."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                            AS sum_qty,
       round(sum(l_extendedprice), 2)                       AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)    AS sum_disc_price,
       round(avg(l_quantity), 4)                            AS avg_qty,
       round(avg(l_discount), 4)                            AS avg_disc,
       count(*)                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact × small dims: both dim joins broadcast (no fact shuffle
    before the agg)."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q02_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def q03_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + agg + deterministic top-10."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(
            revenue.alias("revenue"),
            F.date_format(F.first("o_orderdate"), "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


Q03_SQL = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(any_value(o_orderdate), '%Y-%m-%d') AS o_orderdate
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q04_segment_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per market segment — window/rank surface."""
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rank")
    )


Q04_SQL = """
SELECT c_mktsegment, c_custkey, c_acctbal,
       row_number() OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
FROM customer
QUALIFY rank <= 3
"""


def q05_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS/semi-join surface: orders having a lineitem shipped >90
    days after the order date, counted per priority."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


Q05_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


def q06_filtered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg — the pushdown benchmark."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q06_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------
# 2. CDC / snapshot-diff (SURVEY §2.3 R1/R3) over the events table
# ---------------------------------------------------------------------
#
# Deterministic scenario: the snapshot is yesterday's state (event_id
# not divisible by 7, with value drifted ×2 on ids divisible by 5); the
# incoming batch is today's feed (event_id not divisible by 11).
#   create  = new key (in incoming, not snapshot) OR changed value
#   delete  = key only in snapshot

def _fmt4(col: F.Column) -> F.Column:
    """NULL-safe 4-dp stringify with the rounding done IN-ENGINE first:
    Spark round (HALF_UP = half away from zero) ≡ DuckDB round, so the
    later %.4f / {:.4f} format never sees a representable half-value
    (Java HALF_UP and fmt round-half-even diverge exactly there, e.g.
    0.03125). NULL propagates as NULL (Java format would print 'null')."""
    return F.when(
        col.isNull(), F.lit(None).cast("string")
    ).otherwise(F.format_string("%.4f", F.round(col, 4)))


def _cdc_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = _t(spark, sf_dir, "events")
    incoming = ev.where(F.col("event_id") % 11 != 0).select(
        F.col("event_id").cast("string").alias("external_id"),
        F.col("event_type"),
        _fmt4(F.col("value")).alias("value_str"),
    )
    snapshot_records = ev.where(F.col("event_id") % 7 != 0).select(
        F.col("event_id").cast("string").alias("external_id"),
        F.col("event_type"),
        F.when(
            F.col("event_id") % 5 == 0, _fmt4(F.col("value") * 2)
        ).otherwise(_fmt4(F.col("value"))).alias("value_str"),
    )
    return incoming, snapshot_records


def cdc_creates(spark: SparkSession, sf_dir: str) -> DataFrame:
    incoming, snap_records = _cdc_frames(spark, sf_dir)
    snapshot = snapshot_of(snap_records, prefer_cols=("value_str",))
    diff = reconcile(incoming, snapshot, prefer_cols=("value_str",))
    return diff.to_create.select("external_id", "event_type", "value_str")


CDC_CREATES_SQL = """
WITH incoming AS (
    SELECT event_id::VARCHAR AS external_id, event_type,
           format('{:.4f}', round(value, 4)) AS value_str
    FROM events WHERE event_id % 11 <> 0
), snap AS (
    SELECT event_id::VARCHAR AS external_id,
           CASE WHEN event_id % 5 = 0 THEN format('{:.4f}', round(value * 2, 4))
                ELSE format('{:.4f}', round(value, 4)) END AS value_str
    FROM events WHERE event_id % 7 <> 0
)
SELECT i.external_id, i.event_type, i.value_str
FROM incoming i LEFT JOIN snap s USING (external_id)
WHERE s.external_id IS NULL OR s.value_str <> i.value_str
"""


def cdc_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    incoming, snap_records = _cdc_frames(spark, sf_dir)
    snapshot = snapshot_of(snap_records, prefer_cols=("value_str",))
    diff = reconcile(incoming, snapshot, prefer_cols=("value_str",))
    return diff.to_delete.select("external_id")


CDC_DELETES_SQL = """
SELECT s.external_id
FROM (SELECT event_id::VARCHAR AS external_id FROM events WHERE event_id % 7 <> 0) s
LEFT JOIN (SELECT event_id::VARCHAR AS external_id FROM events WHERE event_id % 11 <> 0) i
USING (external_id)
WHERE i.external_id IS NULL
"""


# ---------------------------------------------------------------------
# 3. Graph sink semantics (SURVEY §2.1 S4-S6, §2.4 J2) — relational form
# ---------------------------------------------------------------------

def graph_edge_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/J2: edges kept only when BOTH endpoints exist (double semi-join)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    edges = orders.select(
        F.col("o_orderkey").cast("string").alias("a_id"),
        F.col("o_custkey").cast("string").alias("b_id"),
    ).dropDuplicates(["a_id", "b_id"])
    nodes_a = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").cast("string").alias("a_id")
    )
    nodes_b = cust.where(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").cast("string").alias("b_id")
    )
    return (
        edges.join(nodes_a, "a_id", "left_semi").join(nodes_b, "b_id", "left_semi")
    )


GRAPH_EDGE_VALIDATION_SQL = """
WITH edges AS (
    SELECT DISTINCT o_orderkey::VARCHAR AS a_id, o_custkey::VARCHAR AS b_id
    FROM orders)
SELECT a_id, b_id FROM edges
WHERE a_id IN (SELECT o_orderkey::VARCHAR FROM orders WHERE o_orderstatus = 'F')
  AND b_id IN (SELECT c_custkey::VARCHAR FROM customer WHERE c_acctbal > 0)
"""


def graph_node_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 MERGE semantics as a query: prev ANTI updates UNION updates."""
    cust = _t(spark, sf_dir, "customer")
    prev = cust.where(F.col("c_custkey") % 3 != 0).select(
        F.col("c_custkey").cast("string").alias("external_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    updates = cust.where(F.col("c_custkey") % 4 == 0).select(
        F.col("c_custkey").cast("string").alias("external_id"),
        F.concat(F.lit("upd-"), F.col("c_custkey")).alias("name"),
        F.round(F.col("c_acctbal") + 100, 2).alias("acctbal"),
    )
    kept = prev.join(updates.select("external_id"), "external_id", "left_anti")
    return kept.unionByName(updates)


GRAPH_NODE_UPSERT_SQL = """
WITH prev AS (
    SELECT c_custkey::VARCHAR AS external_id, c_name AS name, c_acctbal AS acctbal
    FROM customer WHERE c_custkey % 3 <> 0),
upd AS (
    SELECT c_custkey::VARCHAR AS external_id,
           'upd-' || c_custkey::VARCHAR AS name,
           round(c_acctbal + 100, 2) AS acctbal
    FROM customer WHERE c_custkey % 4 = 0)
SELECT * FROM prev WHERE external_id NOT IN (SELECT external_id FROM upd)
UNION ALL SELECT * FROM upd
"""


def graph_detach_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: deleting supplier nodes (one nation) cascades to their edges."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    edges = li.select(
        F.col("l_suppkey").cast("string").alias("a_id"),
        F.col("l_partkey").cast("string").alias("b_id"),
    ).dropDuplicates(["a_id", "b_id"])
    deleted = (
        sup.join(F.broadcast(nat.where(F.col("n_name") == "GERMANY")),
                 sup.s_nationkey == nat.n_nationkey, "left_semi")
        .select(F.col("s_suppkey").cast("string").alias("a_id"))
    )
    return edges.join(deleted, "a_id", "left_anti")


GRAPH_DETACH_CASCADE_SQL = """
WITH edges AS (
    SELECT DISTINCT l_suppkey::VARCHAR AS a_id, l_partkey::VARCHAR AS b_id
    FROM lineitem),
deleted AS (
    SELECT s_suppkey::VARCHAR AS a_id FROM supplier
    JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'GERMANY')
SELECT a_id, b_id FROM edges WHERE a_id NOT IN (SELECT a_id FROM deleted)
"""


def graph_detach_cascade_txnlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 driven END-TO-END through :class:`GraphStore` on the
    ``txnlog`` (commit-log) backend: create supplier/part nodes and
    supplies-edges, then DELETE one nation's suppliers and let the
    DETACH cascade prune their edges — the oracle is the same
    relational twin, so a green row certifies the store's MERGE +
    cascade machinery, not just the dataframe algebra."""
    import atexit
    import shutil
    import tempfile

    from ig_etl_sync_spark.operators.graph import GraphStore

    root = tempfile.mkdtemp(prefix="spark_graft_detach_")
    # the returned DataFrame reads these files lazily — reclaim only at
    # interpreter exit, after the driver has collected
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    store = GraphStore(spark, root, backend="txnlog", n_buckets=8)
    # ONE lineitem scan + identity dedup feeds the part keys AND the
    # edge batch (cached: two consumers, and cache() skips the
    # plan+codegen cost localCheckpoint pays at call time); write_edges
    # is told the frame is already unique so it skips its own dedup
    edges = (
        li.select(
            F.col("l_suppkey").cast("string").alias("a_id"),
            F.col("l_partkey").cast("string").alias("b_id"),
        )
        .dropDuplicates(["a_id", "b_id"])
        .cache()
    )
    # S8 batched sync: the three creates share ONE staging round (all
    # tables staged concurrently) and land one commit claim per table —
    # the reference's one-transaction-per-sync-function semantics
    with store.sync():
        store.write_nodes(
            "supplier",
            to_create=sup.select(
                F.col("s_suppkey").cast("string").alias("external_id"),
                F.col("s_name").alias("name"),
            ),
        )
        store.write_nodes(
            "part",
            to_create=edges.select(F.col("b_id").alias("external_id")).distinct(),
        )
        store.write_edges(
            "supplier", "supplies", "part", edges, assume_unique=True
        )
    doomed = (
        sup.join(
            F.broadcast(nat.where(F.col("n_name") == "GERMANY")),
            sup.s_nationkey == nat.n_nationkey,
            "left_semi",
        )
        .select(F.col("s_suppkey").cast("string").alias("external_id"))
    )
    # the delete sync: node removal + DETACH cascade, one batch
    with store.sync():
        store.write_nodes("supplier", to_delete=doomed)
    # the result reads committed files, not the scratch frame
    edges.unpersist(blocking=False)
    return store.edges("supplier", "supplies", "part").select("a_id", "b_id")


# ---------------------------------------------------------------------
# 4. Transform layer (SURVEY §2.2): nest → explode round trip + JSON
# ---------------------------------------------------------------------

def nested_explode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/T9/J3 machinery: build the nested doc shape (order → array of
    line structs) then explode back with the parent key carried."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    nested = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey")
        .agg(F.collect_list(F.struct("l_linenumber", "l_quantity")).alias("lines"))
    )
    return nested.select(
        "o_orderkey", F.explode("lines").alias("ln")
    ).select(
        "o_orderkey",
        F.col("ln.l_linenumber").alias("l_linenumber"),
        F.col("ln.l_quantity").alias("l_quantity"),
    )


NESTED_EXPLODE_SQL = """
SELECT l_orderkey AS o_orderkey, l_linenumber, l_quantity
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: stringly-JSON property extraction + aggregate."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


JSON_PROPS_SQL = """
SELECT event_type,
       sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       count(*) AS n_events
FROM events
GROUP BY event_type
"""


def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 via Spark 4 VariantType: parse props ONCE into the binary
    variant form, then typed path extraction — the scale path for
    repeated access to stringly-JSON (vs get_json_object re-parsing)."""
    from ig_etl_sync_spark.sources.variant import to_variant, variant_get

    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn("doc", to_variant("props"))
    return (
        parsed.select(
            "event_type", variant_get("doc", "$.k", "bigint").alias("k")
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n_with_k"),
        )
    )


VARIANT_PROPS_SQL = """
SELECT event_type,
       sum(json_extract_string(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       max(json_extract_string(props, '$.k')::BIGINT) AS max_k,
       count(json_extract_string(props, '$.k')::BIGINT) AS n_with_k
FROM events
GROUP BY event_type
"""


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 batch shape of the streaming windowed agg: 1-hour tumbling."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


def user_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 events per user by value (windowed top-k per key)."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") % 50 == 0)
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 2)
        .select("user_id", "event_id", F.round("value", 4).alias("value"), "rank")
    )


USER_TOP_EVENTS_SQL = """
SELECT user_id, event_id, round(value, 4) AS value,
       row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rank
FROM events WHERE user_id % 50 = 0
QUALIFY rank <= 2
"""


# ---------------------------------------------------------------------
# 5. Text analysis (X4)
# ---------------------------------------------------------------------

def text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            T.token_count("text").alias("ntok"),
            F.length("text").alias("nchar"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("total_tokens"),
            F.sum("nchar").alias("total_chars"),
        )
    )


TEXT_STATS_SQL = f"""
SELECT lang, count(*) AS n_docs,
       sum(len({_TOKENS_SQL.format(x='text')}))::BIGINT AS total_tokens,
       sum(length(text))::BIGINT AS total_chars
FROM documents
GROUP BY lang
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality components (ratios rounded identically)."""
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return docs.select(
        "doc_id",
        F.round(T.alpha_ratio("text"), 4).alias("alpha_ratio"),
        F.round(T.punct_ratio("text"), 4).alias("punct_ratio"),
        F.round(T.stopword_ratio("text"), 4).alias("stopword_ratio"),
        T.bpe_ish_token_count("text").alias("n_bpe_tokens"),
    )


_EN_STOP = ", ".join(f"'{w}'" for w in T.STOPWORDS["en"])
TEXT_QUALITY_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         {_TOKENS_SQL.format(x='lower(text)')} AS ltoks
  FROM documents)
SELECT doc_id,
       round(CASE WHEN length(text)=0 THEN 0.0
             ELSE len(regexp_extract_all(text, '[A-Za-z]'))::DOUBLE / length(text) END, 4) AS alpha_ratio,
       round(CASE WHEN length(text)=0 THEN 0.0
             ELSE len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]{{}}-]'))::DOUBLE / length(text) END, 4) AS punct_ratio,
       round(CASE WHEN len(ltoks)=0 THEN 0.0
             ELSE len(list_filter(ltoks, t -> t IN ({_EN_STOP})))::DOUBLE / len(ltoks) END, 4) AS stopword_ratio,
       len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_bpe_tokens
FROM base
"""


def lang_id_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return docs.select("doc_id", T.lang_id("text").alias("lang_pred"))


def _lang_id_sql() -> str:
    score_cols = []
    for lang, words in T.STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        score_cols.append(
            f"len(list_filter(ltoks, t -> t IN ({lst}))) AS s_{lang}"
        )
    langs = list(T.STOPWORDS)
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    # Same tiebreak order as the Spark when-chain: declaration order.
    cases = " ".join(
        f"WHEN s_{lg} = best AND best > 0 THEN '{lg}'" for lg in langs
    )
    return f"""
WITH base AS (
  SELECT doc_id, {_TOKENS_SQL.format(x='lower(text)')} AS ltoks FROM documents),
scored AS (
  SELECT doc_id, {', '.join(score_cols)} FROM base),
best AS (
  SELECT doc_id, *, {best} AS best FROM scored)
SELECT doc_id, CASE {cases} ELSE 'und' END AS lang_pred FROM best
"""


def exact_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: exact dedup groups by normalized-content fingerprint."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(T.fingerprint_md5("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_dups"))
    )


EXACT_DEDUP_SQL = f"""
SELECT md5({_NORM_TEXT_SQL.format(x='text')}) AS fingerprint,
       min(doc_id) AS keep_doc_id, count(*) AS n_dups
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------
# 6. Dedup suite (X1/X2) with md5-reproducible internals
# ---------------------------------------------------------------------

_MINHASH_HASHES = 8
_MINHASH_K = 5


def minhash_signature_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature, folded to one md5 for compact compare."""
    docs = _t(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(
        docs, num_hashes=_MINHASH_HASHES, shingle_k=_MINHASH_K
    )
    return sigs.select(
        "doc_id",
        F.md5(F.concat_ws(",", F.transform("signature", lambda v: v.cast("string")))).alias("sig_hash"),
    )


def _minhash_sql() -> str:
    from ig_etl_sync_spark.operators.dedup import _MINHASH_P, minhash_coeffs

    sh = _shingles_sql("text", _MINHASH_K)
    h = _MD5_INT_SQL.format(x="s")
    mins = []
    for i in range(_MINHASH_HASHES):
        a, b = minhash_coeffs(i)
        mins.append(
            f"list_min(list_transform(hs, h -> ({a}::BIGINT * h + {b}) % {_MINHASH_P}))"
            f"::VARCHAR AS m{i}"
        )
    concat = " || ',' || ".join(f"m{i}" for i in range(_MINHASH_HASHES))
    return f"""
WITH sh AS (SELECT doc_id, {sh} AS sh FROM documents),
hs AS (SELECT doc_id, list_transform(sh, s -> {h}) AS hs FROM sh),
sigs AS (SELECT doc_id, {', '.join(mins)} FROM hs)
SELECT doc_id, md5({concat}) AS sig_hash FROM sigs
"""


def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard pairs ≥ 0.6 via prefix-filter blocking
    (PPJoin) — identical result set to the all-pairs form (the filter is
    exact, never lossy) but the plan is equi-joins only, no cartesian.
    The operator threshold sits just under the displayed 0.6 cut so a
    raw 0.5999995 that rounds UP to 0.600000 still survives blocking."""
    docs = _t(spark, sf_dir, "documents")
    pairs = D.prefix_filter_jaccard_pairs(docs, n=3, threshold=0.599999)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).where(F.col("jaccard") >= 0.6)


def _ngram_jaccard_sql() -> str:
    sh = _shingles_sql("text", 3)
    return f"""
WITH g AS (SELECT doc_id, list_distinct({sh}) AS g FROM documents)
SELECT * FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(len(list_intersect(a.g, b.g))::DOUBLE /
               (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 6) AS jaccard
  FROM g a, g b
  WHERE a.doc_id < b.doc_id)
WHERE jaccard >= 0.6
"""


def ngram_jaccard_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14 scale posture (round 8): per-doc stats over the PPJoin
    BLOCKED CANDIDATE relation — the `bitext_margin_pairs_scaled`
    pattern applied to n-gram Jaccard. `ngram_jaccard`'s oracle is
    deliberately the all-pairs form (the blocking-correctness oracle),
    infeasible at sf1 (1.25B pairs); THIS query's contract is the
    blocked relation itself (prefix + length + positional filters, then
    verify), whose DuckDB replay of the SAME blocking is sf1-feasible —
    so the scale dial carries hash-matched evidence at 10× the shipped
    driver SF. Output is per-doc (output-LINEAR): candidate-partner
    count, verified-match count (rounded jaccard >= 0.6), and the
    deterministic best partner (max rounded jaccard, min id tiebreak
    via one lexicographic struct-min)."""
    docs = _t(spark, sf_dir, "documents")
    cands = D.prefix_filter_jaccard_candidates(docs, n=3, threshold=0.599999)
    # materialize the narrow verified relation ONCE: the symmetrizing
    # explode and the three aggregates would otherwise inline the
    # array-intersect verify into each consumer (co-projection hazard)
    pairs = cands.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jr")
    ).localCheckpoint(eager=False)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("doc_id"),
                    F.col("id_b").alias("partner"),
                    F.col("jr"),
                ),
                F.struct(
                    F.col("id_b").alias("doc_id"),
                    F.col("id_a").alias("partner"),
                    F.col("jr"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    return (
        sym.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(F.when(F.col("jr") >= 0.6, 1).otherwise(0))
            .cast("long")
            .alias("n_matches"),
            F.min(
                F.struct(
                    (-F.col("jr")).alias("nj"), F.col("partner").alias("p")
                )
            ).alias("_b"),
        )
        .select(
            "doc_id",
            "n_candidates",
            "n_matches",
            (-F.col("_b.nj")).alias("best_jaccard"),
            F.col("_b.p").alias("best_match_id"),
        )
    )


def _ngram_jaccard_scaled_sql() -> str:
    """Replays the PPJoin blocking EXACTLY: same (md5_int32, gram)
    global order, same integer-exact prefix length, length filter, and
    Lemma-2 positional bound (num/den from the SAME Fraction call as
    the operator), then the candidate verify + per-doc agg."""
    from fractions import Fraction

    t = Fraction(0.599999).limit_denominator(1_000_000)
    num, den = t.numerator, t.denominator
    sh = _shingles_sql("text", 3)
    md5 = _MD5_INT_SQL.format(x="tok")
    return f"""
WITH sh AS MATERIALIZED (
  SELECT doc_id, list_distinct({sh}) AS g FROM documents),
u AS MATERIALIZED (SELECT doc_id, len(g) AS sz, unnest(g) AS tok FROM sh),
ranked AS MATERIALIZED (
  SELECT doc_id, sz, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY {md5}, tok) - 1
           AS pos
  FROM u),
prefix AS MATERIALIZED (
  SELECT doc_id, sz, tok, pos FROM ranked
  WHERE pos < sz - (sz * {num} + {den - 1}) // {den} + 1),
cand AS MATERIALIZED (
  SELECT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
           min(a.pos) AS min_pa, min(b.pos) AS min_pb
    FROM prefix a JOIN prefix b ON a.tok = b.tok
    WHERE a.doc_id < b.doc_id
      AND least(a.sz, b.sz) * {den} >= greatest(a.sz, b.sz) * {num}
    GROUP BY 1, 2, 3, 4)
  WHERE (1 + least(sz_a - 1 - min_pa, sz_b - 1 - min_pb)) * {num + den}
        >= (sz_a + sz_b) * {num}),
ver AS MATERIALIZED (
  SELECT id_a, id_b,
         round(CASE WHEN uni = 0 THEN 0.0
                    ELSE inter::DOUBLE / uni END, 6) AS jr
  FROM (
    SELECT id_a, id_b, inter, la + lb - inter AS uni FROM (
      SELECT id_a, id_b, len(list_intersect(a.g, b.g)) AS inter,
             len(a.g) AS la, len(b.g) AS lb
      FROM cand JOIN sh a ON cand.id_a = a.doc_id
                JOIN sh b ON cand.id_b = b.doc_id))),
sym AS (SELECT unnest([id_a, id_b]) AS doc_id,
               unnest([id_b, id_a]) AS partner, jr FROM ver)
SELECT doc_id,
       count(*)::BIGINT AS n_candidates,
       sum(CASE WHEN jr >= 0.6 THEN 1 ELSE 0 END)::BIGINT AS n_matches,
       (-struct_extract(min({{'nj': -jr, 'p': partner}}), 'nj'))::DOUBLE
         AS best_jaccard,
       struct_extract(min({{'nj': -jr, 'p': partner}}), 'p')
         AS best_match_id
FROM sym GROUP BY doc_id
"""


def clustering_coeff_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X71: local clustering coefficients over the mutual top-3
    co-supply graph — exact ppm `2T·1e6 div d(d−1)` per node, degree
    and triangle counts alongside
    (``graph_algos.clustering_coefficients``)."""
    from ig_etl_sync_spark.operators.graph_algos import clustering_coefficients

    edges = _cosupply_topk_edges(spark, sf_dir)
    return clustering_coefficients(edges)


CLUSTERING_COEFF_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS a, b.l_suppkey AS b, count(*)::BIGINT AS w
  FROM ps a JOIN ps b
    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2),
bidir AS (
  SELECT a AS n, b AS p, w FROM pairs
  UNION ALL SELECT b AS n, a AS p, w FROM pairs),
kept AS (
  SELECT n, p FROM (
    SELECT *, row_number() OVER (
        PARTITION BY n ORDER BY w DESC, p ASC) AS r
    FROM bidir) rb
  WHERE r <= 3),
e AS MATERIALIZED (
  SELECT DISTINCT least(n, p) AS lo, greatest(n, p) AS hi FROM kept),
tri AS (
  SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
  FROM e ab JOIN e bc ON ab.hi = bc.lo
  WHERE EXISTS (SELECT 1 FROM e ac WHERE ac.lo = ab.lo AND ac.hi = bc.hi)),
t AS (SELECT node, count(*)::BIGINT AS n_triangles
      FROM (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY node),
deg AS (SELECT node, count(*)::BIGINT AS degree FROM (
          SELECT lo AS node FROM e UNION ALL SELECT hi AS node FROM e)
        GROUP BY node)
SELECT deg.node, degree,
       coalesce(n_triangles, 0)::BIGINT AS n_triangles,
       CASE WHEN degree >= 2
            THEN (2 * coalesce(n_triangles, 0) * 1000000)
                 // (degree * (degree - 1))
            ELSE 0 END::BIGINT AS cc_ppm
FROM deg LEFT JOIN t ON deg.node = t.node
"""


_MTA_WINDOW_US = 8 * 3600 * 1_000_000


def multi_touch_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X68: linear multi-touch attribution — per-user credit totals
    with exact ppm splits (latest touch absorbs the div remainder)
    (``sessions.multi_touch_attribution``)."""
    from ig_etl_sync_spark.operators.sessions import multi_touch_attribution

    ev = _t(spark, sf_dir, "events")
    return multi_touch_attribution(ev, window_us=_MTA_WINDOW_US)


MULTI_TOUCH_SQL = f"""
WITH pairs AS (
  SELECT t.user_id AS u, t.event_id AS touch_id, epoch_us(t.ts) AS tc,
         p.event_id AS conv_id
  FROM events t
  JOIN events p
    ON t.user_id = p.user_id
   AND t.event_type = 'click' AND p.event_type = 'purchase'
   AND epoch_us(t.ts) < epoch_us(p.ts)
   AND epoch_us(t.ts) >= epoch_us(p.ts) - {_MTA_WINDOW_US}),
ranked AS (
  SELECT u, conv_id,
         count(*) OVER (PARTITION BY conv_id) AS n,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY tc DESC, touch_id DESC) AS rn
  FROM pairs),
credited AS (
  SELECT u, conv_id,
         (1000000 // n) + CASE WHEN rn = 1
             THEN 1000000 - n * (1000000 // n) ELSE 0 END AS credit
  FROM ranked)
SELECT u AS user_id, count(DISTINCT conv_id)::BIGINT AS touched_convs,
       sum(credit)::BIGINT AS credit_ppm
FROM credited GROUP BY u
"""


_RDV_SHARDS = tuple(f"shard-{i:02d}" for i in range(8))


def rendezvous_shard_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X67: rendezvous-hash document→shard assignment, verified via
    per-shard count + doc-id checksum (any single reassignment changes
    two rows) (``layout.rendezvous_assign``)."""
    from ig_etl_sync_spark.operators.layout import rendezvous_assign

    docs = _t(spark, sf_dir, "documents")
    return (
        rendezvous_assign(docs, "doc_id", list(_RDV_SHARDS))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
    )


def _rendezvous_sql() -> str:
    shard_rows = ", ".join(f"('{s}')" for s in _RDV_SHARDS)
    h = _MD5_INT_SQL.format(x="s || ':' || doc_id::VARCHAR")
    return f"""
WITH shards(s) AS (VALUES {shard_rows}),
draws AS (
  SELECT doc_id, s,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY {h} DESC, s DESC) AS rn
  FROM documents CROSS JOIN shards)
SELECT s AS shard, count(*)::BIGINT AS n_docs,
       sum(doc_id)::BIGINT AS id_checksum
FROM draws WHERE rn = 1 GROUP BY s
"""


_WINNOW_K = 5
_WINNOW_W = 4
_WINNOW_TOP = 100


def winnow_fingerprint_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X66: MOSS winnowing fingerprint matches — document pairs sharing
    window-min k-gram hashes, top-100 by shared count
    (``spans.winnow_match_pairs``)."""
    from ig_etl_sync_spark.operators.spans import winnow_match_pairs

    docs = _t(spark, sf_dir, "documents")
    return winnow_match_pairs(
        docs, k=_WINNOW_K, w=_WINNOW_W, top_n=_WINNOW_TOP
    )


def _winnow_sql() -> str:
    sh = _shingles_sql("text", _WINNOW_K)
    h = _MD5_INT_SQL.format(x="g")
    w = _WINNOW_W
    return f"""
WITH sh AS MATERIALIZED (SELECT doc_id, {sh} AS sh FROM documents),
ex AS MATERIALIZED (
  SELECT doc_id, unnest(sh) AS g, generate_subscripts(sh, 1) AS pos,
         len(sh) AS n
  FROM sh),
hx AS (SELECT doc_id, {h} AS v, pos, n FROM ex),
wm AS (SELECT doc_id,
         min(v) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp,
         pos, n
       FROM hx),
fps AS MATERIALIZED (
  SELECT DISTINCT doc_id, fp FROM wm
  WHERE pos <= n - {w} + 1 OR (n < {w} AND pos = 1))
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS shared_fps
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY shared_fps DESC, id_a, id_b
LIMIT {_WINNOW_TOP}
"""


_VOCAB_PSI_TOP = 30


def vocab_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X65: categorical PSI between the even- and odd-doc halves'
    token distributions — top-30 reference tokens + __other__ bucket
    (``profiling.categorical_drift_psi``)."""
    from ig_etl_sync_spark.operators.profiling import categorical_drift_psi
    from ig_etl_sync_spark.operators.textops import tokens

    docs = _t(spark, sf_dir, "documents")
    tok = lambda pred: (  # noqa: E731
        docs.where(pred).select(
            F.explode(tokens(F.lower(F.col("text")))).alias("w")
        )
    )
    return categorical_drift_psi(
        tok("doc_id % 2 = 0"), tok("doc_id % 2 = 1"), "w", top_m=_VOCAB_PSI_TOP
    )


def _vocab_psi_sql() -> str:
    toks = _TOKENS_SQL.format(x="lower(text)")
    return f"""
WITH rt AS MATERIALIZED (
  SELECT unnest({toks}) AS w FROM documents WHERE doc_id % 2 = 0),
ct AS MATERIALIZED (
  SELECT unnest({toks}) AS w FROM documents WHERE doc_id % 2 = 1),
top AS MATERIALIZED (
  SELECT w AS k FROM (SELECT w, count(*) AS c FROM rt GROUP BY w)
  ORDER BY c DESC, w LIMIT {_VOCAB_PSI_TOP}),
buckets AS (SELECT k AS category FROM top
            UNION ALL SELECT '__other__'),
rm AS (SELECT coalesce(t.k, '__other__') AS category, count(*)::BIGINT AS np
       FROM rt LEFT JOIN top t ON rt.w = t.k GROUP BY 1),
cm AS (SELECT coalesce(t.k, '__other__') AS category, count(*)::BIGINT AS nq
       FROM ct LEFT JOIN top t ON ct.w = t.k GROUP BY 1),
j AS MATERIALIZED (
  SELECT category, coalesce(np, 0) AS np, coalesce(nq, 0) AS nq
  FROM buckets LEFT JOIN rm USING (category) LEFT JOIN cm USING (category)),
tot AS (SELECT sum(np)::BIGINT AS tp, sum(nq)::BIGINT AS tq FROM j)
SELECT category,
  round(np / tp + 1e-06, 6) AS p_ref,
  round(nq / tq + 1e-06, 6) AS q_cur,
  round((np / tp + 1e-06 - (nq / tq + 1e-06))
        * ln((np / tp + 1e-06) / (nq / tq + 1e-06)), 6) AS contrib
FROM j, tot
ORDER BY category
"""


_PMI_MIN_COUNT = 5
_PMI_K = 50


def pmi_collocations_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X64: top-50 adjacent-word collocations by PMI lift
    (``ranking.pmi_collocations``) — exact BIGINT counts, one
    fixed-association IEEE lift expression, ranked by (rounded lift
    DESC, w1, w2)."""
    from ig_etl_sync_spark.operators.ranking import pmi_collocations

    docs = _t(spark, sf_dir, "documents")
    return pmi_collocations(docs, min_count=_PMI_MIN_COUNT, k=_PMI_K)


def _pmi_sql() -> str:
    toks = _TOKENS_SQL.format(x="lower(text)")
    return f"""
WITH tok AS MATERIALIZED (SELECT {toks} AS t FROM documents),
uni AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS c
  FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w),
bigc AS MATERIALIZED (
  SELECT w1, w2, count(*)::BIGINT AS c_ab
  FROM (SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        FROM tok)
  GROUP BY w1, w2),
nu AS (SELECT sum(c)::BIGINT AS nu FROM uni),
nb AS (SELECT sum(c_ab)::BIGINT AS nb FROM bigc)
SELECT w1, w2, c_ab,
  round(((c_ab::DOUBLE * nu.nu) * nu.nu) /
        ((nb.nb::DOUBLE * ca.c) * cb.c), 4) AS lift
FROM bigc
JOIN uni ca ON bigc.w1 = ca.w
JOIN uni cb ON bigc.w2 = cb.w
CROSS JOIN nu CROSS JOIN nb
WHERE c_ab >= {_PMI_MIN_COUNT}
ORDER BY lift DESC, w1, w2 LIMIT {_PMI_K}
"""


def containment_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X63: exact asymmetric containment pairs (>= 80% of A's 3-grams
    inside B) via probe-prefix / full-index blocking — quote detection,
    the relation Jaccard misses when the container dwarfs the contained
    doc. Operator threshold sits just under the displayed 0.8 cut so a
    raw 0.7999995 that rounds UP still survives blocking."""
    docs = _t(spark, sf_dir, "documents")
    pairs = D.containment_pairs(docs, n=3, threshold=0.799999)
    return pairs.select(
        "id_a", "id_b", F.round("containment", 6).alias("containment")
    ).where(F.col("containment") >= 0.8)


def _containment_sql() -> str:
    sh = _shingles_sql("text", 3)
    return f"""
WITH g AS MATERIALIZED (SELECT doc_id, list_distinct({sh}) AS g FROM documents)
SELECT * FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(len(list_intersect(a.g, b.g))::DOUBLE / len(a.g), 6)
           AS containment
  FROM g a, g b
  WHERE a.doc_id <> b.doc_id AND len(a.g) > 0)
WHERE containment >= 0.8
"""


def containment_quotes_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X63 scale posture (round 8): per-contained-doc stats over the
    probe-prefix / full-index BLOCKED CANDIDATE relation.
    `containment_quotes`'s all-pairs oracle is infeasible at sf1 (2.5B
    ordered pairs); this contract is the blocked relation itself —
    prefix side explodes only ~(1-t) of A's grams, B side is the full
    inverted index — replayed by the same blocking in DuckDB
    (sf1-feasible). Output is per contained doc (output-LINEAR):
    candidate-container count, verified-container count (rounded
    containment >= 0.8), and the deterministic best container."""
    docs = _t(spark, sf_dir, "documents")
    cands = D.containment_candidates(docs, n=3, threshold=0.799999)
    # narrow relation materialized once (same co-projection reasoning
    # as ngram_jaccard_scaled: three aggregates consume the verify)
    pairs = cands.select(
        "id_a", "id_b", F.round("containment", 6).alias("cr")
    ).localCheckpoint(eager=False)
    return (
        pairs.groupBy("id_a")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(F.when(F.col("cr") >= 0.8, 1).otherwise(0))
            .cast("long")
            .alias("n_containers"),
            F.min(
                F.struct((-F.col("cr")).alias("nc"), F.col("id_b").alias("p"))
            ).alias("_b"),
        )
        .select(
            F.col("id_a").alias("doc_id"),
            "n_candidates",
            "n_containers",
            (-F.col("_b.nc")).alias("best_containment"),
            F.col("_b.p").alias("best_container_id"),
        )
    )


def _containment_scaled_sql() -> str:
    from fractions import Fraction

    t = Fraction(0.799999).limit_denominator(1_000_000)
    num, den = t.numerator, t.denominator
    sh = _shingles_sql("text", 3)
    md5 = _MD5_INT_SQL.format(x="tok")
    return f"""
WITH sh AS MATERIALIZED (
  SELECT doc_id, list_distinct({sh}) AS g FROM documents),
u AS MATERIALIZED (SELECT doc_id, len(g) AS sz, unnest(g) AS tok FROM sh),
ranked AS MATERIALIZED (
  SELECT doc_id, sz, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY {md5}, tok) - 1
           AS pos
  FROM u),
prefix AS MATERIALIZED (
  SELECT doc_id, sz, tok FROM ranked
  WHERE pos < sz - (sz * {num} + {den - 1}) // {den} + 1),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM prefix a JOIN u b ON a.tok = b.tok
  WHERE a.doc_id <> b.doc_id AND a.sz * {num} <= b.sz * {den}),
ver AS MATERIALIZED (
  SELECT id_a, id_b,
         round(CASE WHEN la = 0 THEN 0.0
                    ELSE inter::DOUBLE / la END, 6) AS cr
  FROM (SELECT id_a, id_b, len(list_intersect(a.g, b.g)) AS inter,
               len(a.g) AS la
        FROM cand JOIN sh a ON cand.id_a = a.doc_id
                  JOIN sh b ON cand.id_b = b.doc_id))
SELECT id_a AS doc_id,
       count(*)::BIGINT AS n_candidates,
       sum(CASE WHEN cr >= 0.8 THEN 1 ELSE 0 END)::BIGINT AS n_containers,
       (-struct_extract(min({{'nc': -cr, 'p': id_b}}), 'nc'))::DOUBLE
         AS best_containment,
       struct_extract(min({{'nc': -cr, 'p': id_b}}), 'p')
         AS best_container_id
FROM ver GROUP BY id_a
"""


_SIMHASH_BITS = 32


def simhash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.simhash(docs, bits=_SIMHASH_BITS)


def _simhash_sql() -> str:
    h = _MD5_INT_SQL.format(x="tok")
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)::BIGINT AS b{b}"
        for b in range(_SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {2**b}::BIGINT ELSE 0 END)"
        for b in range(_SIMHASH_BITS)
    )
    toks = _TOKENS_SQL.format(x="lower(text)")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct({toks})) AS tok FROM documents),
hashed AS (SELECT doc_id, {h} AS h FROM tok),
votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
SELECT doc_id, {fp} AS simhash FROM votes
"""


# ---------------------------------------------------------------------
# 7. Similarity search (X3)
# ---------------------------------------------------------------------

def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    return emb.select("vec_id", F.round(l2_norm("embedding"), 6).alias("norm"))


EMBEDDING_NORMS_SQL = """
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding,
             x -> x::DOUBLE * x::DOUBLE))), 6) AS norm
FROM embeddings
"""


_MARGIN_K = 4
_MARGIN_T_PPM = 1_050_000


def bitext_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X102: margin-criterion pair mining between the label-0 and
    label-1 embedding pools (``similarity.margin_pair_mining``) — the
    Artetxe & Schwenk ratio margin with exact BIGINT rationals over
    micro-unit quantized cosines."""
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    return S.margin_pair_mining(
        emb,
        F.col("label") == 0,
        F.col("label") == 1,
        k=_MARGIN_K,
        margin_threshold_ppm=_MARGIN_T_PPM,
    )


_MARGIN_PLANES = 4
_MARGIN_TABLES = 2


def bitext_margin_pairs_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X102 scale posture: the same margin mining from LSH-bucketed
    candidates (planes=4, tables=2 — the multimodal_near_dup dial);
    k-NN neighborhood stats over the candidate set, the operator's
    defined contract at scale, replayed exactly by the oracle."""
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    return S.margin_pair_mining(
        emb,
        F.col("label") == 0,
        F.col("label") == 1,
        k=_MARGIN_K,
        margin_threshold_ppm=_MARGIN_T_PPM,
        planes=_MARGIN_PLANES,
        tables=_MARGIN_TABLES,
    )


_MARGIN_COS_Q = (
    "round(round(list_cosine_similarity(va, vb), 6) * 1000000)::BIGINT"
)


def _margin_pairs_brute_cte() -> str:
    return f"""
pairs AS MATERIALIZED (
  SELECT * FROM (
    SELECT id_a, id_b, {_MARGIN_COS_Q} AS c FROM a, b)
  WHERE c > 0)"""


def _margin_pairs_lsh_cte() -> str:
    unions = []
    for t in range(_MARGIN_TABLES):
        ba = _bucket_sql(_MARGIN_PLANES, offset=t * _MARGIN_PLANES, vec="va")
        bb = _bucket_sql(_MARGIN_PLANES, offset=t * _MARGIN_PLANES, vec="vb")
        unions.append(
            f"""SELECT id_a, id_b, {_MARGIN_COS_Q} AS c
    FROM (SELECT *, {ba} AS bk FROM a) a{t}
    JOIN (SELECT *, {bb} AS bk FROM b) b{t} USING (bk)"""
        )
    u = "\n    UNION ALL\n    ".join(unions)
    return f"""
pairs AS MATERIALIZED (
  SELECT DISTINCT id_a, id_b, c FROM (
    {u})
  WHERE c > 0)"""


def _margin_sql(*, lsh: bool = False) -> str:
    pairs_cte = _margin_pairs_lsh_cte() if lsh else _margin_pairs_brute_cte()
    return f"""
WITH a AS (SELECT vec_id AS id_a,
                  list_transform(embedding, x -> x::DOUBLE) AS va
           FROM embeddings WHERE label = 0),
b AS (SELECT vec_id AS id_b,
             list_transform(embedding, x -> x::DOUBLE) AS vb
      FROM embeddings WHERE label = 1),
{pairs_cte},
ranked AS MATERIALIZED (
  SELECT id_a, id_b, c,
         row_number() OVER (PARTITION BY id_a
                            ORDER BY c DESC, id_b ASC) AS ra,
         row_number() OVER (PARTITION BY id_b
                            ORDER BY c DESC, id_a ASC) AS rb
  FROM pairs),
sa AS (SELECT id_a, sum(c)::BIGINT AS sa, count(*)::BIGINT AS ka
       FROM ranked WHERE ra <= {_MARGIN_K} GROUP BY id_a),
sb AS (SELECT id_b, sum(c)::BIGINT AS sb, count(*)::BIGINT AS kb
       FROM ranked WHERE rb <= {_MARGIN_K} GROUP BY id_b),
scored AS MATERIALIZED (
  SELECT p.id_a, p.id_b, p.c AS cosine_q,
         (2 * p.c * 1000000 * ka * kb
          // (sa * kb + sb * ka))::BIGINT AS margin_ppm
  FROM pairs p JOIN sa USING (id_a) JOIN sb USING (id_b)
  WHERE sa * kb + sb * ka > 0),
ba AS (SELECT id_a, id_b, cosine_q, margin_ppm FROM (
  SELECT *, row_number() OVER (PARTITION BY id_a
                               ORDER BY margin_ppm DESC, id_b ASC) AS r
  FROM scored) WHERE r = 1),
bb AS (SELECT id_a AS bba, id_b AS bbb FROM (
  SELECT id_a, id_b,
         row_number() OVER (PARTITION BY id_b
                            ORDER BY margin_ppm DESC, id_a ASC) AS r
  FROM scored) WHERE r = 1)
SELECT ba.id_a, ba.id_b, ba.cosine_q, ba.margin_ppm,
       (bba IS NOT NULL) AS mutual,
       (bba IS NOT NULL AND margin_ppm >= {_MARGIN_T_PPM}) AS accepted
FROM ba LEFT JOIN bb ON ba.id_a = bba AND ba.id_b = bbb
"""


def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-5 cosine neighbors for query vecs (id<8)."""
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    queries = emb.where(F.col("vec_id") < 8)
    return S.brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id", "score", "rank"
    )


EMBEDDING_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(
             list_transform(q.qv, x -> x::DOUBLE),
             list_transform(e.embedding, x -> x::DOUBLE)), 6) AS score
  FROM q, embeddings e
  WHERE e.vec_id <> q.query_id)
SELECT query_id, neighbor_id, score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, neighbor_id ASC) AS rank
FROM scored
QUALIFY rank <= 5
"""


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine near-dup pairs (brute-force verifier form). Output is the
    deterministic top-``_PAIR_LIMIT`` (cosine DESC, id tiebreak) like
    every other pair-list contract: the plan is inherently O(n²) — it
    exists to verify the LSH route — but its RESULT no longer grows
    quadratically with SF (TakeOrdered streams the pair set through
    per-partition heaps; ordering is on the in-engine ROUNDED cosine,
    so the DuckDB twin ranks identically)."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = D.embedding_near_dup_pairs(emb, threshold=0.4)
    return pairs.orderBy(
        F.col("cosine").desc(), F.col("id_a").asc(), F.col("id_b").asc()
    ).limit(_PAIR_LIMIT)


EMBEDDING_NEAR_DUP_SQL = """
SELECT * FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_cosine_similarity(
             list_transform(a.embedding, x -> x::DOUBLE),
             list_transform(b.embedding, x -> x::DOUBLE)), 6) AS cosine
  FROM embeddings a, embeddings b
  WHERE a.vec_id < b.vec_id)
WHERE cosine >= 0.4
ORDER BY cosine DESC, id_a ASC, id_b ASC
LIMIT 100000
"""


# ---------------------------------------------------------------------
# 8. Extended relational surface: stats, rollup, set ops, anti join
# ---------------------------------------------------------------------

def q07_quantity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles + dispersion per return flag (exact interpolated
    median ≡ DuckDB quantile_cont)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 4).alias("p95_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("stddev_qty"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
    )


Q07_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4)  AS median_qty,
       round(quantile_cont(l_quantity, 0.95), 4) AS p95_qty,
       round(stddev_samp(l_quantity), 4)         AS stddev_qty,
       round(min(l_quantity), 2)                 AS min_qty,
       round(max(l_quantity), 2)                 AS max_qty
FROM lineitem
GROUP BY l_returnflag
"""


def q08_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (nation, order year) — grouping-sets surface. NULL rollup
    markers coalesced to 'ALL' so the compare is representation-free."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select(
            "n_name",
            F.year("o_orderdate").cast("string").alias("o_year"),
            "o_totalprice",
        )
    )
    return (
        joined.rollup("n_name", "o_year")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            F.coalesce("o_year", F.lit("ALL")).alias("o_year"),
            "total",
            "n",
        )
    )


Q08_SQL = """
SELECT coalesce(n_name, 'ALL') AS n_name,
       coalesce(o_year, 'ALL') AS o_year,
       round(sum(o_totalprice), 2) AS total,
       count(*) AS n
FROM (
    SELECT n_name, year(o_orderdate)::VARCHAR AS o_year, o_totalprice
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey)
GROUP BY ROLLUP (n_name, o_year)
"""


def q09_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op surface: customers with orders EXCEPT those with urgent
    orders."""
    orders = _t(spark, sf_dir, "orders")
    all_c = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    urgent = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    return all_c.exceptAll(urgent)


Q09_SQL = """
SELECT DISTINCT o_custkey AS custkey FROM orders
EXCEPT
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def q10_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join surface (NOT EXISTS): customers with no URGENT order."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


Q10_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def q11_distinct_suppliers_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) surface over a join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.countDistinct("l_suppkey").alias("n_suppliers"),
             F.count(F.lit(1)).alias("n_items"))
    )


Q11_SQL = """
SELECT p_brand, count(DISTINCT l_suppkey) AS n_suppliers, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q12_correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate stats surface: correlation + sample covariance of
    quantity vs extended price per return flag."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("covar_qty_disc"),
        F.count(F.lit(1)).alias("n"),
    )


Q12_SQL = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_samp(l_quantity, l_discount), 4) AS covar_qty_disc,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


def q13_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all marginals over (returnflag, linestatus)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n",
            "sum_qty",
        )
    )


Q13_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) — per-session stats."""
    from ig_etl_sync_spark.operators.sessions import session_stats

    ev = _t(spark, sf_dir, "events")
    return session_stats(ev, gap_seconds=1800)


EVENT_SESSIONS_SQL = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), tagged AS (
    SELECT user_id, ts,
           (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
    FROM flagged)
SELECT user_id, session_id, count(*) AS n_events,
       floor((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0)::BIGINT
           AS duration_sec
FROM tagged
GROUP BY user_id, session_id
"""


def user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history: one row per run of identical event_type per user,
    with half-open [valid_from, valid_to) validity in µs and a current
    marker. Single Exchange on user_id (lag-filter + lead share one
    window partitioning — see operators/scd.py plan notes)."""
    from ig_etl_sync_spark.operators.scd import scd2_history

    ev = _t(spark, sf_dir, "events")
    h = scd2_history(ev, ["user_id"], ["event_type"], "ts", tiebreak_cols=["event_id"])
    return h.select(
        "user_id",
        "event_type",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
    )


def _user_state_history_sql() -> str:
    from ig_etl_sync_spark.operators.scd import scd2_sql

    h = scd2_sql("events", ["user_id"], ["event_type"], "ts", ["event_id"])
    return f"""
WITH h AS ({h})
SELECT user_id, event_type, epoch_us(valid_from) AS valid_from_us,
       epoch_us(valid_to) AS valid_to_us, is_current
FROM h
"""


_PIT_TS = "2024-01-15 12:00:00"


def user_state_at_instant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup over the SCD2 history: each user's state at
    one instant — at scale this is the narrow filter that partition-
    prunes a valid_from-partitioned history table."""
    from ig_etl_sync_spark.operators.scd import scd2_history, scd2_point_in_time

    ev = _t(spark, sf_dir, "events")
    h = scd2_history(ev, ["user_id"], ["event_type"], "ts", tiebreak_cols=["event_id"])
    pit = scd2_point_in_time(h, F.to_timestamp(F.lit(_PIT_TS)))
    return pit.select(
        "user_id", "event_type", F.unix_micros("valid_from").alias("valid_from_us")
    ).orderBy("user_id")


def _user_state_at_instant_sql() -> str:
    from ig_etl_sync_spark.operators.scd import scd2_sql

    h = scd2_sql("events", ["user_id"], ["event_type"], "ts", ["event_id"])
    return f"""
WITH h AS ({h})
SELECT user_id, event_type, epoch_us(valid_from) AS valid_from_us
FROM h
WHERE valid_from <= TIMESTAMP '{_PIT_TS}'
  AND (valid_to IS NULL OR TIMESTAMP '{_PIT_TS}' < valid_to)
ORDER BY user_id
"""


# ---------------------------------------------------------------------
# 9. Temporal joins (as-of, range) — operators Spark lacks natively
# ---------------------------------------------------------------------

def user_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-frame window: 3-row moving average of value per user,
    ordered by event time (ROWS BETWEEN 2 PRECEDING AND CURRENT)."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") % 25 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("rolling_avg"),
    )


ROLLING_SQL = """
SELECT user_id, event_id,
       round(avg(value) OVER (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
           AS rolling_avg
FROM events WHERE user_id % 25 = 0
"""


def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each click gets the user's latest purchase
    value at-or-before the click (union-trick as-of, one key shuffle)."""
    from ig_etl_sync_spark.operators.temporal import as_of_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))  # unique (user, ts) both engines
    )
    joined = as_of_join(clicks, purchases, on="user_id")
    # ts_r is the match indicator (non-null iff a prior purchase
    # exists); filtering on value_r would diverge from the inner ASOF
    # oracle if a matched purchase carried a NULL value.
    return joined.where(F.col("ts_r").isNotNull()).select(
        "event_id",
        "user_id",
        F.col("value_r").alias("purchase_value"),
        F.date_format("ts_r", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


ASOF_SQL = """
WITH clicks AS (
    SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
purch AS (
    SELECT user_id, ts, max(value) AS value FROM events
    WHERE event_type = 'purchase' GROUP BY user_id, ts)
SELECT c.event_id, c.user_id, p.value AS purchase_value,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM clicks c ASOF JOIN purch p ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each click gets the user's EARLIEST purchase
    at-or-after the click (same union-trick plan, sort reversed)."""
    from ig_etl_sync_spark.operators.temporal import as_of_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    joined = as_of_join(clicks, purchases, on="user_id", direction="forward")
    return joined.where(F.col("ts_r").isNotNull()).select(
        "event_id",
        "user_id",
        F.col("value_r").alias("purchase_value"),
        F.date_format("ts_r", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


ASOF_FWD_SQL = """
WITH clicks AS (
    SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
purch AS (
    SELECT user_id, ts, max(value) AS value FROM events
    WHERE event_type = 'purchase' GROUP BY user_id, ts)
SELECT c.event_id, c.user_id, p.value AS purchase_value,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM clicks c ASOF JOIN purch p ON c.user_id = p.user_id AND c.ts <= p.ts
"""


def range_clicks_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join: clicks within 5 minutes before each error,
    counted per error (bucketed equi-join, no per-key cartesian)."""
    from ig_etl_sync_spark.operators.temporal import range_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select("user_id", "event_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    pairs = range_join(
        errors, clicks, on="user_id", lower_sec=-300, upper_sec=0,
        left_ts="ts", right_ts="click_ts",
    )
    return pairs.groupBy("event_id").agg(F.count(F.lit(1)).alias("n_clicks"))


RANGE_SQL = """
SELECT e.event_id, count(*) AS n_clicks
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'error') e
JOIN (SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id
 AND epoch_us(c.click_ts) >= epoch_us(e.ts) - 300000000
 AND epoch_us(c.click_ts) <= epoch_us(e.ts)
GROUP BY e.event_id
"""


# ---------------------------------------------------------------------
# Approximate-RECALL pipelines with exact-replay oracles: every stage
# (hyperplane buckets, minhash bands, simhash prefixes, IVF centroids)
# is md5-derived with plan-time-literal coefficients, so DuckDB can
# replay bucketing + verify bit-for-bit. "Approximate" refers to recall
# vs the exact counterparts (embedding_topk / embedding_near_dup), not
# to nondeterminism. Float caveat: hyperplane sign tests and centroid
# distance ranks compare doubles computed in both engines — decision
# boundaries sit far from the accumulated error (~1e-12 relative), and
# parity is re-verified at every SF the driver runs.
# ---------------------------------------------------------------------

_LSH_PLANES, _LSH_PROBE, _LSH_TABLES = 6, 2, 2


def lsh_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane LSH top-5 with full multi-probe (Hamming ≤ 2) over 2
    independent plane tables — measured recall@5 ≈ 0.82 vs brute force
    at sf0.001 (the old planes=8 single-bit-probe config sat at 0.13)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    return S.lsh_topk(
        emb,
        queries,
        k=5,
        planes=_LSH_PLANES,
        probe_hamming=_LSH_PROBE,
        tables=_LSH_TABLES,
    )


def _bucket_sql(planes: int, offset: int = 0, vec: str = "v") -> str:
    """DuckDB twin of similarity.hyperplane_signature(planes, offset):
    both sides take their weights from the SAME
    similarity.hyperplane_weights helper, so the formula cannot
    desynchronize between operator and oracle."""
    terms = []
    for p in range(offset, offset + planes):
        w = "[" + ", ".join(str(x) for x in S.hyperplane_weights(p)) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec}, {w}) >= 0 "
            f"THEN {2 ** (p - offset)} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")::BIGINT"


def _lsh_topk_sql() -> str:
    planes, probe, tables = _LSH_PLANES, _LSH_PROBE, _LSH_TABLES
    masks = (
        "[" + ", ".join(str(m) for m in S.probe_masks(planes, probe)) + "]::BIGINT[]"
    )
    buckets = ", ".join(
        f"{_bucket_sql(planes, offset=t * planes)} AS b{t}" for t in range(tables)
    )
    probes = "\nUNION ALL\n".join(
        f"  SELECT vec_id AS query_id, xor(b{t}, m) AS bucket, {t} AS tbl\n"
        f"  FROM sig, unnest({masks}) AS t{t}(m) WHERE vec_id < 8"
        for t in range(tables)
    )
    cands = "\nUNION\n".join(
        f"  SELECT q.query_id, c.vec_id AS neighbor_id\n"
        f"  FROM (SELECT vec_id, b{t} AS bucket FROM sig) c\n"
        f"  JOIN (SELECT query_id, bucket FROM probes WHERE tbl = {t}) q\n"
        f"    USING (bucket) WHERE c.vec_id <> q.query_id"
        for t in range(tables)
    )
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
sig AS (
  SELECT vec_id, v, {buckets} FROM v),
probes AS (
{probes}),
cand AS (
{cands}),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         round(list_cosine_similarity(qv.v, cv.v), 6) AS score
  FROM cand
  JOIN v qv ON qv.vec_id = cand.query_id
  JOIN v cv ON cv.vec_id = cand.neighbor_id)
SELECT query_id, neighbor_id, score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, neighbor_id ASC) AS rank
FROM scored
QUALIFY rank <= 5
"""


def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.near_dup_pairs_minhash(docs, threshold=0.7)


def _minhash_pair_ctes(source: str) -> str:
    """CTE chain replaying dedup.near_dup_pairs_minhash over ``source``:
    16-hash signatures → 4-band LSH blocking → exact shingle-Jaccard.
    Ends with ``mh_pairs(id_a, id_b, jaccard)`` — compose with
    ``WITH {ctes} SELECT ... FROM mh_pairs``."""
    from ig_etl_sync_spark.operators.dedup import _MINHASH_P, minhash_coeffs

    sh = _shingles_sql("text", 5)
    h = _MD5_INT_SQL.format(x="s")
    mins = []
    for i in range(16):
        a, b = minhash_coeffs(i)
        mins.append(
            f"list_min(list_transform(hs, h -> ({a}::BIGINT * h + {b}) % {_MINHASH_P})) AS m{i}"
        )
    band_hashes = ", ".join(
        "md5(" + " || ',' || ".join(f"m{i}::VARCHAR" for i in range(b * 4, b * 4 + 4)) + ")"
        for b in range(4)
    )
    # AS MATERIALIZED: sh/bands/g are each referenced 2+ times (and
    # consumers like the cluster query wrap mh_pairs in a RECURSIVE
    # closure) — DuckDB's default CTE inlining re-evaluates the whole
    # shingle+hash pipeline per reference, which turned the sf1 cluster
    # oracle from minutes into >30 min. Results are identical.
    return f"""sh AS MATERIALIZED (SELECT doc_id, {sh} AS sh FROM {source}),
hs AS (SELECT doc_id, list_transform(sh, s -> {h}) AS hs FROM sh),
sigs AS (SELECT doc_id, {', '.join(mins)} FROM hs),
bands AS MATERIALIZED (
  SELECT doc_id, unnest([0, 1, 2, 3]) AS band_id,
         unnest([{band_hashes}]) AS band_hash
  FROM sigs),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band_id, band_hash)
  WHERE a.doc_id < b.doc_id),
g AS MATERIALIZED (SELECT doc_id, list_distinct(sh) AS g FROM sh),
mh_pairs AS MATERIALIZED (
  SELECT id_a, id_b,
         CASE WHEN len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)) = 0
              THEN 0.0
              ELSE len(list_intersect(a.g, b.g))::DOUBLE /
                   (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
         END AS jaccard
  FROM cand JOIN g a ON cand.id_a = a.doc_id JOIN g b ON cand.id_b = b.doc_id)"""


def _minhash_near_dup_sql() -> str:
    return f"""
WITH {_minhash_pair_ctes('documents')}
SELECT id_a, id_b, jaccard FROM mh_pairs WHERE jaccard >= 0.7
"""


#: bound on pair-list contract outputs: near-dup pair sets are
#: quadratic WITHIN duplicate families (sf1 measured: 213M simhash
#: pairs, 74M LSH-cosine pairs — unbounded collect is impossible at
#: scale by NATURE of the result, not the plan). The contract reports
#: the deterministic top-N; TakeOrderedAndProject streams the full
#: pair set through per-partition heaps. At sf0.01 every pair list is
#: far below the bound, so driver-scale results are unchanged.
_PAIR_LIMIT = 100_000


def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pairs = D.simhash_near_dup_pairs(docs, max_hamming=3)
    return pairs.orderBy(
        F.col("hamming").asc(), F.col("id_a").asc(), F.col("id_b").asc()
    ).limit(_PAIR_LIMIT)


def _simhash_near_dup_sql() -> str:
    """Replays simhash fingerprints → pigeonhole block join (the exact
    Manku-style blocking: h+1 blocks, a ≤h-Hamming pair must agree on
    ≥1) → exact Hamming verify ≤ 3. Block bounds come from the SAME
    dedup.simhash_block_bounds helper as the operator."""
    from ig_etl_sync_spark.operators.dedup import simhash_block_bounds

    h = _MD5_INT_SQL.format(x="tok")
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)::BIGINT AS b{b}"
        for b in range(_SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {2**b}::BIGINT ELSE 0 END)"
        for b in range(_SIMHASH_BITS)
    )
    toks = _TOKENS_SQL.format(x="lower(text)")
    bounds = simhash_block_bounds(_SIMHASH_BITS, 3)
    block_vals = ", ".join(
        f"(simhash >> {shift}) & {(1 << width) - 1}" for shift, width in bounds
    )
    block_ids = ", ".join(str(i) for i in range(len(bounds)))
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct({toks})) AS tok FROM documents),
hashed AS (SELECT doc_id, {h} AS h FROM tok),
votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id),
fps AS MATERIALIZED (SELECT doc_id, {fp} AS simhash FROM votes),
blocked AS (
  SELECT doc_id, simhash,
         unnest([{block_ids}]) AS block_id,
         unnest([{block_vals}]) AS block_val
  FROM fps)
SELECT DISTINCT id_a, id_b, hamming FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
  FROM blocked a JOIN blocked b USING (block_id, block_val)
  WHERE a.doc_id < b.doc_id)
WHERE hamming <= 3
ORDER BY hamming ASC, id_a ASC, id_b ASC
LIMIT 100000
"""


def simhash_near_dup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2-simhash scale posture (round 8): per-doc degree sequence of
    the pigeonhole-blocked near-dup relation
    (``dedup.simhash_dup_degree``). The full pair LIST is
    output-quadratic within duplicate families (213M pairs at sf1 — by
    nature of the result, not the plan), which is why
    `simhash_near_dup` reports a top-N and its sf1 oracle was skipped;
    the degree relation is output-LINEAR while pinning blocking +
    Hamming verify end-to-end, so its DuckDB replay of the SAME
    pigeonhole blocks hash-matches at full sf1."""
    docs = _t(spark, sf_dir, "documents")
    return D.simhash_dup_degree(docs, bits=_SIMHASH_BITS, max_hamming=3)


def _simhash_near_dup_scaled_sql() -> str:
    from ig_etl_sync_spark.operators.dedup import simhash_block_bounds

    h = _MD5_INT_SQL.format(x="tok")
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)::BIGINT AS b{b}"
        for b in range(_SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {2**b}::BIGINT ELSE 0 END)"
        for b in range(_SIMHASH_BITS)
    )
    toks = _TOKENS_SQL.format(x="lower(text)")
    bounds = simhash_block_bounds(_SIMHASH_BITS, 3)
    block_vals = ", ".join(
        f"(simhash >> {shift}) & {(1 << width) - 1}" for shift, width in bounds
    )
    block_ids = ", ".join(str(i) for i in range(len(bounds)))
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct({toks})) AS tok FROM documents),
hashed AS (SELECT doc_id, {h} AS h FROM tok),
votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id),
fps AS MATERIALIZED (SELECT doc_id, {fp} AS simhash FROM votes),
blocked AS MATERIALIZED (
  SELECT doc_id, simhash,
         unnest([{block_ids}]) AS block_id,
         unnest([{block_vals}]) AS block_val
  FROM fps),
pairs AS MATERIALIZED (
  SELECT DISTINCT id_a, id_b, hamming FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
    FROM blocked a JOIN blocked b USING (block_id, block_val)
    WHERE a.doc_id < b.doc_id)
  WHERE hamming <= 3),
sym AS (SELECT unnest([id_a, id_b]) AS doc_id,
               unnest([id_b, id_a]) AS partner, hamming FROM pairs)
SELECT doc_id,
       count(*)::BIGINT AS n_dups,
       sum(CASE WHEN hamming = 0 THEN 1 ELSE 0 END)::BIGINT AS n_exact,
       struct_extract(min({{'h': hamming, 'p': partner}}), 'h')::INTEGER
         AS min_hamming,
       struct_extract(min({{'h': hamming, 'p': partner}}), 'p')
         AS best_partner
FROM sym GROUP BY doc_id
"""


def ivf_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantized ANN. Centroid choice, list assignment, and
    probing are all md5/rank-deterministic (similarity.py:214) — the
    oracle replays them; recall is approximate vs embedding_topk but
    the ROWS are exactly reproducible."""
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    queries = emb.where(F.col("vec_id") < 8)
    return S.ivf_topk(emb, queries, k=5)


IVF_TOPK_SQL = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
cent AS (
  SELECT row_number() OVER (ORDER BY ck, vec_id) AS centroid_id, v AS cv
  FROM (
    SELECT vec_id, v, {_MD5_INT_SQL.format(x='vec_id::VARCHAR')} AS ck
    FROM v ORDER BY ck, vec_id LIMIT 16)),
c_assign AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT x.vec_id, x.v, c.centroid_id,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY list_distance(x.v, c.cv) ASC,
                                       c.centroid_id ASC) AS rn
    FROM v x, cent c)
  WHERE rn = 1),
q_assign AS (
  SELECT vec_id AS query_id, v AS qv, centroid_id FROM (
    SELECT x.vec_id, x.v, c.centroid_id,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY list_distance(x.v, c.cv) ASC,
                                       c.centroid_id ASC) AS rn
    FROM v x, cent c
    WHERE x.vec_id < 8)
  WHERE rn <= 4),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.qv, c.v), 6) AS score
  FROM c_assign c JOIN q_assign q USING (centroid_id)
  WHERE c.vec_id <> q.query_id)
SELECT query_id, neighbor_id, score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, neighbor_id ASC) AS rank
FROM scored
QUALIFY rank <= 5
"""


def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path near-dup: hyperplane-bucket blocking + exact verify.
    Bucket misses make recall approximate vs embedding_near_dup; the
    produced rows are md5-deterministic and oracle-replayed."""
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    pairs = S.lsh_bucketed_pairs(emb, threshold=0.4, planes=4, tables=2)
    return pairs.orderBy(
        F.col("cosine").desc(), F.col("id_a").asc(), F.col("id_b").asc()
    ).limit(_PAIR_LIMIT)


def _embedding_near_dup_lsh_sql() -> str:
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
sig AS (
  SELECT vec_id, v,
         {_bucket_sql(4, offset=0)} AS b0,
         {_bucket_sql(4, offset=4)} AS b1
  FROM v),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sig a JOIN sig b ON a.b0 = b.b0 AND a.vec_id < b.vec_id
  UNION
  SELECT a.vec_id, b.vec_id
  FROM sig a JOIN sig b ON a.b1 = b.b1 AND a.vec_id < b.vec_id)
SELECT * FROM (
  SELECT id_a, id_b,
         round(list_cosine_similarity(a.v, b.v), 6) AS cosine
  FROM pairs JOIN v a ON pairs.id_a = a.vec_id
             JOIN v b ON pairs.id_b = b.vec_id)
WHERE cosine >= 0.4
ORDER BY cosine DESC, id_a ASC, id_b ASC
LIMIT 100000
"""


_MM_EMB_TAU = 0.45


def multimodal_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X80: joint dup DECISION across modalities — the union of the
    text route (minhash-LSH blocked, Jaccard >= 0.7) and the embedding
    route (hyperplane-LSH blocked, cosine >= 0.45) over the SAME items
    (doc_id ≡ vec_id), each pair tagged ``text`` / ``embedding`` /
    ``both``. Paraphrases (same meaning, rewritten words) only trip
    the embedding route; templated text with swapped entities only the
    text route — a curation pipeline wants the union AND the
    provenance. Both routes are the blocked scale paths, never
    all-pairs; output is the deterministic (id_a, id_b)-ordered
    top-N like every pair contract."""
    from ig_etl_sync_spark.operators.dedup import near_dup_pairs_minhash

    docs = _t(spark, sf_dir, "documents")
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    tp, ep = _parallel_build(
        lambda: near_dup_pairs_minhash(
            docs, "doc_id", "text", 16, 4, 5, 0.7
        ).select("id_a", "id_b", F.lit("text").alias("src")),
        lambda: S.lsh_bucketed_pairs(
            emb, threshold=_MM_EMB_TAU, planes=4, tables=2
        ).select("id_a", "id_b", F.lit("embedding").alias("src")),
    )
    return (
        tp.unionByName(ep)
        .groupBy("id_a", "id_b")
        .agg(
            F.when(F.count(F.lit(1)) == 2, F.lit("both"))
            .otherwise(F.min("src"))
            .alias("signal")
        )
        .orderBy("id_a", "id_b")
        .limit(_PAIR_LIMIT)
    )


def multimodal_near_dup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X80 at the SCALE posture: the embedding route runs planes=8
    (256 buckets per table) — the `embedding_isolation_scaled` recipe
    applied to the joint decision. Candidates shrink ~16× vs the
    planes=4 twin, which makes the DuckDB all-candidate twin
    sf1-FEASIBLE: the last pinned-at-driver-SF LSH dial now has
    contract-level scale-posture evidence instead of a documented
    oracle skip. Sparser embedding recall is the dial's documented
    trade, replayed exactly by the oracle; the text route is
    unchanged."""
    from ig_etl_sync_spark.operators.dedup import near_dup_pairs_minhash

    docs = _t(spark, sf_dir, "documents")
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    tp, ep = _parallel_build(
        lambda: near_dup_pairs_minhash(
            docs, "doc_id", "text", 16, 4, 5, 0.7
        ).select("id_a", "id_b", F.lit("text").alias("src")),
        lambda: S.lsh_bucketed_pairs(
            emb, threshold=_MM_EMB_TAU, planes=8, tables=2
        ).select("id_a", "id_b", F.lit("embedding").alias("src")),
    )
    return (
        tp.unionByName(ep)
        .groupBy("id_a", "id_b")
        .agg(
            F.when(F.count(F.lit(1)) == 2, F.lit("both"))
            .otherwise(F.min("src"))
            .alias("signal")
        )
        .orderBy("id_a", "id_b")
        .limit(_PAIR_LIMIT)
    )


def _multimodal_near_dup_sql(planes: int = 4) -> str:
    return f"""
WITH {_minhash_pair_ctes('documents')},
v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
esig AS (
  SELECT vec_id, v,
         {_bucket_sql(planes, offset=0)} AS b0,
         {_bucket_sql(planes, offset=planes)} AS b1
  FROM v),
ecand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM esig a JOIN esig b ON a.b0 = b.b0 AND a.vec_id < b.vec_id
  UNION
  SELECT a.vec_id, b.vec_id
  FROM esig a JOIN esig b ON a.b1 = b.b1 AND a.vec_id < b.vec_id),
ever AS (
  SELECT id_a, id_b
  FROM (SELECT id_a, id_b,
               round(list_cosine_similarity(a.v, b.v), 6) AS cosine
        FROM ecand JOIN v a ON ecand.id_a = a.vec_id
                   JOIN v b ON ecand.id_b = b.vec_id)
  WHERE cosine >= {_MM_EMB_TAU}),
u AS (
  SELECT id_a, id_b, 'text' AS src FROM mh_pairs WHERE jaccard >= 0.7
  UNION ALL
  SELECT id_a, id_b, 'embedding' AS src FROM ever)
SELECT id_a, id_b,
       CASE WHEN count(*) = 2 THEN 'both' ELSE min(src) END AS signal
FROM u GROUP BY id_a, id_b
ORDER BY id_a, id_b
LIMIT {_PAIR_LIMIT}
"""


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X83: contrastive hard-negative mining — per anchor, the top-3
    most-cosine-similar DIFFERENT-label vectors among deterministic
    LSH-bucket candidates (``similarity.hard_negative_pairs``); ranked
    on the rounded cosine + id tiebreak, replayed exactly by the
    oracle's window form. Registered at planes=8 (the scale posture —
    256 buckets/table): candidate fan-in stays bucket-bounded AND the
    all-candidate DuckDB twin stays sf1-feasible, the
    embedding_isolation_scaled lesson applied from day one."""
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    return S.hard_negative_pairs(emb, k=3, planes=8, tables=2)


def _hard_negative_sql(k: int = 3, planes: int = 4, tables: int = 2) -> str:
    buckets = ", ".join(
        f"{_bucket_sql(planes, offset=t * planes)} AS b{t}"
        for t in range(tables)
    )
    cand = "\n  UNION\n".join(
        f"""  SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
         b.vec_id AS neg_id, b.label AS neg_label
  FROM sig a JOIN sig b
    ON a.b{t} = b.b{t} AND a.vec_id <> b.vec_id AND a.label <> b.label"""
        for t in range(tables)
    )
    return f"""
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
sig AS MATERIALIZED (SELECT vec_id, label, v, {buckets} FROM v),
cand AS MATERIALIZED (
{cand}),
scored AS (
  SELECT anchor_id, anchor_label, neg_id, neg_label,
         round(list_cosine_similarity(a.v, b.v), 6) AS cosine
  FROM cand JOIN v a ON cand.anchor_id = a.vec_id
            JOIN v b ON cand.neg_id = b.vec_id)
SELECT anchor_id, anchor_label, neg_id, neg_label, cosine FROM (
  SELECT *, row_number() OVER (
      PARTITION BY anchor_id ORDER BY cosine DESC, neg_id ASC) AS r
  FROM scored)
WHERE r <= {k}
"""


def label_outlier_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X84: mislabel-suspect shortlist — per label, the 20 vectors
    farthest from their own label centroid, integer-exact throughout
    (``profiling.label_centroid_outliers``; quantization and floor-mean
    centroids share the k-means contract)."""
    from ig_etl_sync_spark.operators.profiling import label_centroid_outliers

    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    return label_centroid_outliers(emb, top_n=20)


LABEL_OUTLIER_SQL = """
WITH q AS MATERIALIZED (
  SELECT vec_id, label,
         list_transform(embedding,
             x -> floor((x::DOUBLE + 2.0) * 1000000)::BIGINT) AS qv
  FROM embeddings),
ex AS MATERIALIZED (
  SELECT label, generate_subscripts(qv, 1) AS d, unnest(qv) AS x FROM q),
m AS (
  SELECT label, d, (sum(x) // count(*))::BIGINT AS m
  FROM ex GROUP BY label, d),
cent AS MATERIALIZED (
  SELECT label, list(m ORDER BY d) AS cv FROM m GROUP BY label),
dist AS (
  SELECT q.vec_id, q.label,
         list_sum(list_transform(list_zip(q.qv, c.cv),
             s -> (s[1] - s[2]) * (s[1] - s[2])))::BIGINT AS dist2
  FROM q JOIN cent c USING (label))
SELECT vec_id, label, dist2, rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY label ORDER BY dist2 DESC, vec_id ASC)::BIGINT AS rank
  FROM dist)
WHERE rank <= 20
"""


def source_overlap_matrix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X85: cross-source contamination matrix — exact pairwise shingle-
    set Jaccard (ppm) between every pair of sources sharing at least
    one shingle (``profiling.source_overlap_matrix``). The corpus-level
    mixing-due-diligence twin of the per-doc near-dup family."""
    from ig_etl_sync_spark.operators.profiling import source_overlap_matrix

    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return source_overlap_matrix(docs, shingle_k=5)


def _source_overlap_sql(k: int = 5) -> str:
    sh = _shingles_sql("text", k)
    return f"""
WITH shl AS MATERIALIZED (
  SELECT source, list_distinct({sh}) AS sh FROM documents),
gs AS MATERIALIZED (
  SELECT DISTINCT source AS g, unnest(sh) AS s FROM shl),
sizes AS (SELECT g, count(*)::BIGINT AS n FROM gs GROUP BY g),
inter AS (
  SELECT a.g AS group_a, b.g AS group_b, count(*)::BIGINT AS n_shared
  FROM gs a JOIN gs b ON a.s = b.s AND a.g < b.g
  GROUP BY 1, 2)
SELECT group_a, group_b, n_shared, sa.n AS n_a, sb.n AS n_b,
       (n_shared * 1000000 // (sa.n + sb.n - n_shared))::BIGINT
           AS jaccard_ppm
FROM inter
JOIN sizes sa ON sa.g = group_a
JOIN sizes sb ON sb.g = group_b
"""


_OVERLAP_SKETCH_M = 64


def source_overlap_sketch_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X103: sketch-route source-overlap estimates — per-source HLL
    registers over the shingle stream, pairwise union merge +
    inclusion-exclusion (``profiling.source_overlap_sketch``); the
    one-scan, kilobyte-state scale twin of X85's exact join."""
    from ig_etl_sync_spark.operators.profiling import source_overlap_sketch

    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return source_overlap_sketch(
        docs, shingle_k=5, m=_OVERLAP_SKETCH_M
    )


def _source_overlap_sketch_sql(k: int = 5, m: int = 64) -> str:
    from ig_etl_sync_spark.operators.sketches import (
        HLL_ALPHA_64,
        _lc_table,
    )

    sh = _shingles_sql("text", k)
    max_rank = (32 - m.bit_length() + 1) + 1
    h = _MD5_INT_SQL.format(x="s")
    z = f"(sum(1.0 / (1::BIGINT << _m)) + ({m} - count(*)))"
    raw = f"({HLL_ALPHA_64 * m * m} / {z})"
    lc_list = "[" + ", ".join(repr(x) for x in _lc_table(m)) + "]"
    est = (
        f"CASE WHEN {raw} <= {2.5 * m} AND ({m} - count(*)) > 0 "
        f"THEN ({lc_list})[({m} - count(*))::INT] ELSE round({raw}, 4) END"
    )
    inter = "greatest(0.0, round(ea.e + eb.e - eu, 4))"
    return f"""
WITH ex AS MATERIALIZED (
  SELECT source AS g, unnest({sh}) AS s FROM documents),
hashed AS (SELECT g, {h} AS _h FROM ex),
regs AS MATERIALIZED (
  SELECT g, _h % {m} AS _b,
         max(CASE WHEN _h // {m} = 0 THEN {max_rank}
             ELSE length(bin((_h // {m}) & -(_h // {m}))) END) AS _m
  FROM hashed GROUP BY g, _b),
estg AS MATERIALIZED (SELECT g, {est} AS e FROM regs GROUP BY g),
gp AS (SELECT a.g AS group_a, b.g AS group_b
       FROM (SELECT DISTINCT g FROM regs) a,
            (SELECT DISTINCT g FROM regs) b
       WHERE a.g < b.g),
pru AS (
  SELECT group_a, group_b, _b, max(_m) AS _m FROM (
    SELECT gp.group_a, gp.group_b, r._b, r._m
    FROM gp JOIN regs r ON r.g = gp.group_a
    UNION ALL
    SELECT gp.group_a, gp.group_b, r._b, r._m
    FROM gp JOIN regs r ON r.g = gp.group_b)
  GROUP BY 1, 2, 3),
estu AS (SELECT group_a, group_b, {est} AS eu
         FROM pru GROUP BY group_a, group_b)
SELECT group_a, group_b, ea.e AS est_a, eb.e AS est_b, eu AS est_union,
       {inter} AS inter_est,
       floor({inter} * 1000000.0 / eu)::BIGINT AS jaccard_est_ppm
FROM estu
JOIN estg ea ON ea.g = group_a
JOIN estg eb ON eb.g = group_b
"""


def cdc_chunk_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X86: content-defined chunking (Rabin/FastCDC family) — per-source
    chunk-level dedup yield under rolling-hash boundaries
    (``spans.cdc_chunk_stats``; k=4 gram, divisor=16 → ~16-token
    expected chunks). Boundaries re-synchronize after edits, so the
    chunk stream exposes sub-document redundancy fixed blocks miss."""
    from ig_etl_sync_spark.operators.spans import cdc_chunk_stats

    docs = _t(spark, sf_dir, "documents")
    return cdc_chunk_stats(docs, k=4, divisor=16)


def _cdc_chunk_sql(k: int = 4, divisor: int = 16, seed: str = "cdc-v1") -> str:
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    sh = _shingles_sql("text", k)
    h = _MD5_INT_SQL.format(x=f"'{seed}:' || g")
    return f"""
WITH tok AS MATERIALIZED (SELECT doc_id, {toks} AS t FROM documents),
tokix AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(t, 1) - 1 AS pos, unnest(t) AS w
  FROM tok),
shl AS MATERIALIZED (SELECT doc_id, {sh} AS sh FROM documents),
grams AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(sh, 1) - 1 AS gpos, unnest(sh) AS g
  FROM shl),
cuts AS (
  SELECT doc_id, gpos + {k} AS pos FROM grams WHERE {h} % {divisor} = 0),
flagged AS (
  SELECT t.doc_id, t.pos, t.w,
         CASE WHEN c.pos IS NOT NULL THEN 1 ELSE 0 END AS cut
  FROM tokix t LEFT JOIN cuts c ON t.doc_id = c.doc_id AND t.pos = c.pos),
chunked AS (
  SELECT doc_id, pos, w,
         sum(cut) OVER (PARTITION BY doc_id ORDER BY pos)::BIGINT
             AS chunk_id
  FROM flagged),
chunks AS (
  SELECT doc_id, chunk_id,
         md5(string_agg(w, ' ' ORDER BY pos)) AS chunk_md5
  FROM chunked GROUP BY doc_id, chunk_id)
SELECT source, count(*)::BIGINT AS n_chunks,
       count(DISTINCT chunk_md5)::BIGINT AS n_distinct_chunks,
       ((count(*) - count(DISTINCT chunk_md5)) * 1000000
        // count(*))::BIGINT AS dup_ppm
FROM chunks JOIN documents USING (doc_id)
GROUP BY source
"""


def padding_efficiency_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X87: length-bucketed batch packing + exact padding-waste audit
    (``dataprep.padding_efficiency``; bucket_width=32, batch=16,
    salted two-pass global rank — no whole-bucket window)."""
    from ig_etl_sync_spark.operators.dataprep import padding_efficiency

    docs = _t(spark, sf_dir, "documents")
    return padding_efficiency(
        docs, bucket_width=32, batch_size=16, salt=8
    )


def _padding_efficiency_sql(
    bucket_width: int = 32,
    batch_size: int = 16,
    salt: int = 8,
    seed: str = "pad-v1",
) -> str:
    toks = _TOKENS_SQL.format(x="text")
    h = _MD5_INT_SQL.format(x=f"'{seed}:' || doc_id::VARCHAR")
    return f"""
WITH base AS MATERIALIZED (
  SELECT doc_id, len({toks})::BIGINT AS n_tok, {h} AS h
  FROM documents),
sl AS (
  SELECT doc_id, n_tok, (n_tok // {bucket_width})::BIGINT AS len_bucket,
         h, h % {salt} AS s
  FROM base),
r AS (
  SELECT len_bucket, n_tok,
         row_number() OVER (
           PARTITION BY len_bucket ORDER BY s ASC, h ASC, doc_id ASC) AS rr
  FROM sl),
pb AS (
  SELECT len_bucket, ((rr - 1) // {batch_size})::BIGINT AS batch_id,
         count(*)::BIGINT AS bn, sum(n_tok)::BIGINT AS breal,
         max(n_tok)::BIGINT AS bmax
  FROM r GROUP BY 1, 2),
agg AS (
  SELECT len_bucket, sum(bn)::BIGINT AS n_docs,
         count(*)::BIGINT AS n_batches,
         sum(breal)::BIGINT AS real_tokens,
         sum(bmax * bn)::BIGINT AS padded_tokens
  FROM pb GROUP BY len_bucket)
SELECT len_bucket, n_docs, n_batches, real_tokens, padded_tokens,
       CASE WHEN padded_tokens = 0 THEN 0
            ELSE (padded_tokens - real_tokens) * 1000000 // padded_tokens
       END::BIGINT AS waste_ppm
FROM agg
"""


def surprisal_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X89: CCNet per-language perplexity terciles (Wenzek et al.
    2020) over the exact unigram-surprisal score
    (``textops.surprisal_buckets``): head/middle/tail assignment by
    value-level cumulative counts (cross-multiplied integers), no
    per-language corpus window."""
    from ig_etl_sync_spark.operators.textops import surprisal_buckets

    docs = _t(spark, sf_dir, "documents")
    return surprisal_buckets(docs)


def _surprisal_buckets_sql() -> str:
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    return f"""
WITH ex AS MATERIALIZED (
  SELECT doc_id, unnest({toks}) AS term FROM documents),
tf AS MATERIALIZED (
  SELECT term, count(*)::BIGINT AS tf FROM ex GROUP BY term),
tot AS (SELECT sum(tf)::BIGINT AS n FROM tf),
surp AS MATERIALIZED (
  SELECT doc_id,
         (sum(length(bin(n // tf)) - 1)::BIGINT * 1000000
          // count(*)::BIGINT) AS surprisal_ppm
  FROM ex JOIN tf USING (term), tot
  GROUP BY doc_id),
scored AS MATERIALIZED (
  SELECT d.lang, s.surprisal_ppm
  FROM surp s JOIN documents d USING (doc_id)),
vc AS (
  SELECT lang, surprisal_ppm, count(*)::BIGINT AS vn
  FROM scored GROUP BY lang, surprisal_ppm),
bounds AS (
  SELECT lang, surprisal_ppm,
         CASE WHEN 3 * c <= n THEN 'head'
              WHEN 3 * c <= 2 * n THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM (
    SELECT lang, surprisal_ppm,
           sum(vn) OVER (PARTITION BY lang ORDER BY surprisal_ppm
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS c,
           sum(vn) OVER (PARTITION BY lang)::BIGINT AS n
    FROM vc))
SELECT s.lang, b.bucket, count(*)::BIGINT AS n_docs,
       (sum(s.surprisal_ppm)::BIGINT // count(*)::BIGINT)::BIGINT
           AS mean_surprisal_ppm
FROM scored s JOIN bounds b USING (lang, surprisal_ppm)
GROUP BY s.lang, b.bucket
"""


def cluster_dilution_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X95: transitive-closure dilution audit over the near-dup
    clusters (``clustering.cluster_dilution``): per cluster, the
    direct-pair graph density (ppm) and weakest verified link — the
    chained-over-deletion evidence that justifies soft weighting (X82)
    on a corpus. Deterministic top-100 by (size DESC, cluster_id)."""
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    from ig_etl_sync_spark.operators.clustering import cluster_dilution

    return cluster_dilution(docs, top_n=100)


def _cluster_dilution_sql() -> str:
    return f"""
WITH RECURSIVE {_minhash_pair_ctes('documents')},
dup AS MATERIALIZED (
  SELECT id_a, id_b, jaccard FROM mh_pairs WHERE jaccard >= 0.7),
e AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM dup
  UNION SELECT id_b, id_a FROM dup),
walk(u, lbl) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e) n
  UNION
  SELECT e.u, w.lbl FROM e JOIN walk w ON e.v = w.u),
comp AS MATERIALIZED (
  SELECT u AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY u),
csize AS (
  SELECT cluster_id, count(*)::BIGINT AS size FROM comp
  GROUP BY cluster_id),
per AS (
  SELECT c.cluster_id, count(*)::BIGINT AS n_pairs,
         min(d.jaccard) AS min_jaccard
  FROM dup d JOIN comp c ON d.id_a = c.doc_id
  GROUP BY c.cluster_id)
SELECT cluster_id, size, n_pairs,
       (2 * n_pairs * 1000000 // (size * (size - 1)))::BIGINT
           AS density_ppm,
       min_jaccard
FROM per JOIN csize USING (cluster_id)
ORDER BY size DESC, cluster_id ASC
LIMIT 100
"""


def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X94: measured recall@5 of every ANN route (hyperplane-LSH
    multi-probe, IVF, PQ/ADC) against the brute-force truth on the
    same fixed query set — the route-selection evidence a pipeline
    needs before trading exactness for speed, produced by the engine
    itself instead of quoted from a paper. All four rankings are the
    registered deterministic ops; the audit joins four ≤40-row lists.
    ``recall_ppm = |route ∩ brute| * 1e6 div |brute|`` per query."""
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    queries = emb.where(F.col("vec_id") < 8)
    # The four branches are independent and each construction runs its
    # internal pins eagerly (lazy checkpoints execute their subtree at
    # call time under AQE) — build them on a thread pool so those
    # subtree jobs overlap instead of serializing on the driver
    # (guide §2.6, _parallel_build; plans and results identical, only
    # submission order changes).

    def _brute():
        b = S.brute_force_topk(emb, queries, k=5).select(
            "query_id", "neighbor_id"
        )
        # bounded (≤40 rows) but feeds all three route joins
        return b.localCheckpoint(eager=False)

    brute, lsh, ivf, pq = _parallel_build(
        _brute,
        lambda: S.lsh_topk(
            emb,
            queries,
            k=5,
            planes=_LSH_PLANES,
            probe_hamming=_LSH_PROBE,
            tables=_LSH_TABLES,
        ),
        lambda: S.ivf_topk(emb, queries, k=5),
        lambda: S.pq_topk(emb, queries, k=5, m=8, ks=16, rerank=5),
    )
    routes = {"lsh": lsh, "ivf": ivf, "pq": pq}
    out = None
    for name, df in routes.items():
        hit = df.select(
            "query_id", "neighbor_id", F.lit(1).cast("long").alias("_c")
        )
        per = (
            brute.join(hit, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_brute"),
                F.sum(F.coalesce(F.col("_c"), F.lit(0)))
                .cast("long")
                .alias("n_overlap"),
            )
            .select(
                F.lit(name).alias("route"),
                "query_id",
                "n_brute",
                "n_overlap",
                F.expr("n_overlap * 1000000 div n_brute")
                .cast("long")
                .alias("recall_ppm"),
            )
        )
        out = per if out is None else out.unionByName(per)
    return out


def _ann_recall_sql() -> str:
    routes = {
        "lsh": _lsh_topk_sql(),
        "ivf": IVF_TOPK_SQL,
        "pq": _pq_topk_sql(),
    }
    ctes = ",\n".join(
        f"r_{name} AS MATERIALIZED (\n"
        f"  SELECT query_id, neighbor_id FROM ({sql}\n))"
        for name, sql in routes.items()
    )
    unions = "\nUNION ALL ".join(
        f"SELECT '{name}' AS route, query_id, n_brute, n_overlap,"
        f" (n_overlap * 1000000 // n_brute)::BIGINT AS recall_ppm FROM (\n"
        f"  SELECT b.query_id, count(*)::BIGINT AS n_brute,\n"
        f"         sum(CASE WHEN r.neighbor_id IS NOT NULL THEN 1 ELSE 0"
        f" END)::BIGINT AS n_overlap\n"
        f"  FROM brute b LEFT JOIN r_{name} r\n"
        f"    ON b.query_id = r.query_id"
        f" AND b.neighbor_id = r.neighbor_id\n"
        f"  GROUP BY b.query_id)"
        for name in routes
    )
    return f"""
WITH brute AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM ({EMBEDDING_TOPK_SQL}
)),
{ctes}
{unions}
"""


#: 2024-01-22T00:00:00Z in microseconds — a ~70/30 cut of the events
#: table's January span
_SPLIT_CUT_US = 1_705_881_600_000_000


def temporal_split_leakage_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X96: time-based holdout leakage audit over events
    (``dataprep.temporal_split_leakage``): per event type, how many
    future-side users also appear on the training side — µs-exact cut,
    ppm-exact ratios."""
    from ig_etl_sync_spark.operators.dataprep import temporal_split_leakage

    ev = _t(spark, sf_dir, "events")
    return temporal_split_leakage(ev, _SPLIT_CUT_US)


TEMPORAL_SPLIT_LEAKAGE_SQL = f"""
WITH flagged AS (
  SELECT event_type, user_id,
         epoch_us(ts) < {_SPLIT_CUT_US} AS is_train
  FROM events),
per_key AS (
  SELECT event_type, user_id,
         max(CASE WHEN is_train THEN 1 ELSE 0 END) AS tr,
         max(CASE WHEN is_train THEN 0 ELSE 1 END) AS te
  FROM flagged GROUP BY event_type, user_id),
agg AS (
  SELECT event_type, sum(tr)::BIGINT AS users_train,
         sum(te)::BIGINT AS users_test,
         sum(tr * te)::BIGINT AS users_both
  FROM per_key GROUP BY event_type)
SELECT event_type, users_train, users_test, users_both,
       CASE WHEN users_test = 0 THEN 0
            ELSE users_both * 1000000 // users_test END::BIGINT AS leak_ppm
FROM agg
"""


def transition_predictor_acc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X97: majority-transition next-event baseline accuracy
    (``sessions.transition_predictor_accuracy``) — the X30 Markov
    model evaluated as a predictor; the number any sequence model must
    beat. Exact integer ppm."""
    from ig_etl_sync_spark.operators.sessions import (
        transition_predictor_accuracy,
    )

    ev = _t(spark, sf_dir, "events")
    return transition_predictor_accuracy(ev)


TRANSITION_PREDICTOR_SQL = """
WITH pairs AS (
  SELECT event_type AS src_type,
         lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS dst_type
  FROM events),
cnt AS (
  SELECT src_type, dst_type, count(*)::BIGINT AS n
  FROM pairs WHERE dst_type IS NOT NULL
  GROUP BY src_type, dst_type),
pred AS (
  SELECT src_type, dst_type AS predicted_next FROM (
    SELECT src_type, dst_type,
           row_number() OVER (
             PARTITION BY src_type ORDER BY n DESC, dst_type ASC) AS r
    FROM cnt) WHERE r = 1)
SELECT c.src_type, p.predicted_next,
       sum(c.n)::BIGINT AS n_transitions,
       sum(CASE WHEN c.dst_type = p.predicted_next THEN c.n
                ELSE 0 END)::BIGINT AS n_correct,
       (sum(CASE WHEN c.dst_type = p.predicted_next THEN c.n
                 ELSE 0 END)::BIGINT * 1000000
        // sum(c.n)::BIGINT)::BIGINT AS accuracy_ppm
FROM cnt c JOIN pred p USING (src_type)
GROUP BY c.src_type, p.predicted_next
"""


_LSHREC_SAMPLE = 200
_LSHREC_PLANES = 4
_LSHREC_TABLES = 2


def lsh_recall_audit_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X93: measured LSH recall per cosine band on a deterministic
    seeded sample (``similarity.lsh_recall_audit``) — the S-curve of
    the production planes dial MEASURED against brute-force truth
    (buckets are data-independent, so sample recall is an unbiased
    estimate of corpus recall at any scale)."""
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    return S.lsh_recall_audit(
        emb,
        sample=_LSHREC_SAMPLE,
        planes=_LSHREC_PLANES,
        tables=_LSHREC_TABLES,
    )


def _lsh_recall_sql() -> str:
    planes, tables = _LSHREC_PLANES, _LSHREC_TABLES
    h = _MD5_INT_SQL.format(x="'lshrec-v1:' || vec_id::VARCHAR")
    bsel = ", ".join(
        f"{_bucket_sql(planes, offset=t * planes)} AS b{t}"
        for t in range(tables)
    )
    collide = " OR ".join(f"s1.b{t} = s2.b{t}" for t in range(tables))
    return f"""
WITH vall AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
samp AS MATERIALIZED (
  SELECT vec_id, v FROM vall
  ORDER BY {h} ASC, vec_id ASC
  LIMIT {_LSHREC_SAMPLE}),
sig AS MATERIALIZED (SELECT vec_id, {bsel} FROM samp),
truth AS MATERIALIZED (
  SELECT id_a, id_b, cosine FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM samp a JOIN samp b ON a.vec_id < b.vec_id)
  WHERE cosine >= 0.3),
lshp AS (
  SELECT s1.vec_id AS id_a, s2.vec_id AS id_b, 1::BIGINT AS c
  FROM sig s1 JOIN sig s2
    ON s1.vec_id < s2.vec_id AND ({collide})),
banded AS (
  SELECT CASE WHEN cosine >= 0.3 AND cosine < 0.5 THEN '0.30-0.50'
              WHEN cosine >= 0.5 AND cosine < 0.7 THEN '0.50-0.70'
              ELSE '0.70-1.00' END AS band,
         coalesce(l.c, 0)::BIGINT AS c
  FROM truth t LEFT JOIN lshp l USING (id_a, id_b))
SELECT band, count(*)::BIGINT AS n_truth, sum(c)::BIGINT AS n_caught,
       (sum(c)::BIGINT * 1000000 // count(*)::BIGINT)::BIGINT
           AS recall_ppm
FROM banded GROUP BY band
"""


#: surprisal_ppm observed range is ~4.0-4.5e6 (floor-log2 quantized);
#: the grid brackets it with slack on both sides
_SWEEP_GRID = list(range(3_900_000, 4_650_000, 50_000))


def quality_score_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X91: cheap-filter calibration — the exact operating curve of the
    unigram-surprisal score (X53) against the Gopher rule-pack verdict
    (X44) as ground truth (``profiling.threshold_sweep``): at which
    cutoff does the one-pass score reproduce the 8-rule gate, and at
    what precision/recall? Grid exploded as a literal array (no theta
    join); all ratios exact ppm."""
    from ig_etl_sync_spark.operators.profiling import threshold_sweep
    from ig_etl_sync_spark.operators.textops import (
        gopher_quality_flags,
        unigram_surprisal,
    )

    docs = _t(spark, sf_dir, "documents")
    s = unigram_surprisal(docs).select("doc_id", "surprisal_ppm")
    g = gopher_quality_flags(docs).select(
        "doc_id", (~F.col("passes")).alias("fail")
    )
    return threshold_sweep(
        s.join(g, "doc_id"), "surprisal_ppm", "fail", _SWEEP_GRID
    )


def _quality_sweep_sql() -> str:
    grid = ", ".join(str(t) for t in _SWEEP_GRID)
    return f"""
WITH surp AS MATERIALIZED (
  SELECT doc_id, surprisal_ppm FROM ({_surprisal_sql()})),
gop AS MATERIALIZED (
  SELECT doc_id, NOT passes AS fail FROM ({_gopher_sql()})),
scored AS (
  SELECT surprisal_ppm AS s, fail FROM surp JOIN gop USING (doc_id)),
vc AS (
  SELECT s, count(*)::BIGINT AS n,
         sum(CASE WHEN fail THEN 1 ELSE 0 END)::BIGINT AS np
  FROM scored GROUP BY s),
tot AS (
  SELECT count(*)::BIGINT AS tn_all,
         sum(CASE WHEN fail THEN 1 ELSE 0 END)::BIGINT AS tp_all
  FROM scored),
grid AS (SELECT unnest([{grid}]::BIGINT[]) AS threshold),
cnt AS (
  SELECT threshold, sum(n)::BIGINT AS ppred, sum(np)::BIGINT AS tp
  FROM vc JOIN grid ON vc.s >= grid.threshold
  GROUP BY threshold),
fin AS (
  SELECT threshold, coalesce(tp, 0)::BIGINT AS tp,
         (coalesce(ppred, 0) - coalesce(tp, 0))::BIGINT AS fp,
         (tp_all - coalesce(tp, 0))::BIGINT AS fn,
         (tn_all - coalesce(ppred, 0) - tp_all
          + coalesce(tp, 0))::BIGINT AS tn
  FROM grid LEFT JOIN cnt USING (threshold) CROSS JOIN tot)
SELECT threshold, tp, fp, fn, tn,
  CASE WHEN tp + fp = 0 THEN 0
       ELSE tp * 1000000 // (tp + fp) END::BIGINT AS precision_ppm,
  CASE WHEN tp + fn = 0 THEN 0
       ELSE tp * 1000000 // (tp + fn) END::BIGINT AS recall_ppm,
  CASE WHEN 2 * tp + fp + fn = 0 THEN 0
       ELSE 2 * tp * 1000000 // (2 * tp + fp + fn) END::BIGINT AS f1_ppm
FROM fin
"""


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X92: language-ID audit — the confusion matrix of the stopword
    lang-ID heuristic (X4) against the labeled ``lang`` column, with
    per-true-language shares in exact ppm. The eval twin every
    classifier-shaped curation signal needs before it gates data."""
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    pred = docs.select("doc_id", "lang", T.lang_id("text").alias("lang_pred"))
    per = pred.groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    # Totals derive from `per`, not from `pred`: the lang_id corpus
    # pass then feeds ONE aggregation (shared shuffle / ReusedExchange)
    # instead of re-evaluating per diamond branch.
    tot = per.groupBy("lang").agg(F.sum("n_docs").cast("long").alias("_t"))
    return (
        per.join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "lang_pred",
            "n_docs",
            F.expr("n_docs * 1000000 div _t").cast("long").alias(
                "share_ppm"
            ),
        )
    )


def _lang_confusion_sql() -> str:
    return f"""
WITH pred AS MATERIALIZED (
  SELECT doc_id, lang_pred FROM ({_lang_id_sql()})),
j AS (
  SELECT d.lang, p.lang_pred FROM documents d JOIN pred p USING (doc_id)),
per AS (
  SELECT lang, lang_pred, count(*)::BIGINT AS n_docs
  FROM j GROUP BY lang, lang_pred),
tot AS (SELECT lang, count(*)::BIGINT AS t FROM j GROUP BY lang)
SELECT per.lang, per.lang_pred, per.n_docs,
       (per.n_docs * 1000000 // tot.t)::BIGINT AS share_ppm
FROM per JOIN tot USING (lang)
"""


_MMR_K = 10
_MMR_POOL = 40
_MMR_ANCHOR = 0


def mmr_context_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X90: MMR diverse top-k (Carbonell & Goldstein 1998) — greedy
    relevance-minus-redundancy selection over the exact top-pool around
    a fixed anchor (``similarity.mmr_diverse_topk``; round-6dp cosines,
    exact double greedy scores, id tiebreaks — every round replayed by
    the unrolled SQL twin)."""
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    return S.mmr_diverse_topk(
        emb, anchor_id=_MMR_ANCHOR, k=_MMR_K, pool=_MMR_POOL
    )


def _mmr_sql(k: int = _MMR_K, pool: int = _MMR_POOL) -> str:
    rounds = []
    finals = [
        "SELECT vec_id, 1::BIGINT AS mmr_rank, rel, score AS mmr_score FROM p1"
    ]
    rounds.append(f"""
p1 AS MATERIALIZED (
  SELECT vec_id, rel, rel - 0.0::DOUBLE AS score FROM cand
  ORDER BY rel - 0.0::DOUBLE DESC, vec_id ASC LIMIT 1),
sel1 AS (SELECT vec_id FROM p1)""")
    for i in range(2, k + 1):
        j = i - 1
        rounds.append(f"""
p{i} AS MATERIALIZED (
  SELECT vec_id, rel, ms, rel - ms AS score FROM (
    SELECT c.vec_id, c.rel,
           max(round(list_cosine_similarity(c.v, s.v), 6)) AS ms
    FROM cand c,
         (SELECT cc.v FROM cand cc JOIN sel{j} USING (vec_id)) s
    WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{j})
    GROUP BY c.vec_id, c.rel)
  ORDER BY rel - ms DESC, vec_id ASC LIMIT 1),
sel{i} AS (SELECT vec_id FROM sel{j}
           UNION ALL SELECT vec_id FROM p{i})""")
        finals.append(
            f"SELECT vec_id, {i}::BIGINT AS mmr_rank, rel,"
            f" score AS mmr_score FROM p{i}"
        )
    body = ",".join(rounds)
    union = "\nUNION ALL ".join(finals)
    return f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
anchor AS (SELECT v AS av FROM v WHERE vec_id = {_MMR_ANCHOR}),
cand AS MATERIALIZED (
  SELECT vec_id, v, rel FROM (
    SELECT e.vec_id, e.v,
           round(list_cosine_similarity(e.v, a.av), 6) AS rel
    FROM v e CROSS JOIN anchor a
    WHERE e.vec_id <> {_MMR_ANCHOR})
  ORDER BY rel DESC, vec_id ASC LIMIT {pool}),{body}
{union}
"""


_RRF_K = 60
_RRF_DEPTH = 50
_RRF_ANCHOR = 0


def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X88: hybrid retrieval — reciprocal-rank fusion
    (``ranking.rrf_fuse``, Cormack et al. 2009) of the BM25 lexical
    top-50 (the ``bm25_top_docs`` scorer) with the embedding top-50
    around a fixed anchor vector (doc_id ≡ vec_id, the X80
    convention). Both input lists are bounded retrieval ops; the
    fusion itself never rescans the corpus. Exact integer ppb
    contributions (``1e9 div (k + rank)``)."""
    from pyspark.sql import Window

    from ig_etl_sync_spark.operators.ranking import bm25_topk, rrf_fuse

    docs = _t(spark, sf_dir, "documents")
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    # rank windows run post-limit on <= _RRF_DEPTH rows — bounded, the
    # repo's post-limit unpartitioned-window pattern
    lex = bm25_topk(
        docs, _BM25_TERMS, k=_RRF_DEPTH, k1=_BM25_K1, b=_BM25_B, round_dp=4
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        ),
    )
    sem = (
        S.brute_force_topk(
            emb,
            emb.where(F.col("vec_id") == _RRF_ANCHOR),
            k=_RRF_DEPTH,
        )
        .select(F.col("neighbor_id").alias("doc_id"), "rank")
    )
    return rrf_fuse(
        {"lex": lex.select("doc_id", "rank"), "sem": sem},
        k_const=_RRF_K,
        top_n=20,
    )


def _rrf_sql() -> str:
    return f"""
WITH {_bm25_ctes()},
lex AS MATERIALIZED (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank
  FROM (SELECT doc_id, round(raw, 4) AS score
        FROM bm25_scored WHERE raw > 0
        ORDER BY score DESC, doc_id ASC LIMIT {_RRF_DEPTH})),
anchor AS (
  SELECT list_transform(embedding, x -> x::DOUBLE) AS av
  FROM embeddings WHERE vec_id = {_RRF_ANCHOR}),
semscored AS (
  SELECT e.vec_id AS doc_id,
         round(list_cosine_similarity(
             list_transform(e.embedding, x -> x::DOUBLE), a.av), 6) AS score
  FROM embeddings e CROSS JOIN anchor a
  WHERE e.vec_id <> {_RRF_ANCHOR}),
sem AS MATERIALIZED (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank
  FROM (SELECT doc_id, score FROM semscored
        ORDER BY score DESC, doc_id ASC LIMIT {_RRF_DEPTH})),
u AS (SELECT doc_id, rank FROM lex
      UNION ALL SELECT doc_id, rank FROM sem),
fused AS (
  SELECT doc_id,
         sum(1000000000 // ({_RRF_K} + rank))::BIGINT AS rrf_ppb
  FROM u GROUP BY doc_id)
SELECT f.doc_id, coalesce(l.rank, 0)::BIGINT AS lex_rank,
       coalesce(s.rank, 0)::BIGINT AS sem_rank, f.rrf_ppb
FROM fused f
LEFT JOIN lex l USING (doc_id)
LEFT JOIN sem s USING (doc_id)
ORDER BY f.rrf_ppb DESC, f.doc_id ASC
LIMIT 20
"""


_ISO_TAU = 0.3


def embedding_isolation_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X72: isolation screen — per-vector verified-neighbor counts
    (cosine >= 0.3) under the deterministic LSH candidate graph plus
    an isolated flag (``similarity.embedding_isolation``)."""
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    return S.embedding_isolation(emb, threshold=_ISO_TAU, planes=4, tables=2)


def embedding_isolation_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X72 at the SCALE posture: planes=8 (256 buckets per table), the
    setting a 100 TB corpus actually runs — candidates shrink by
    2^Δplanes (~16× vs the planes=4 twin), which ALSO makes the DuckDB
    all-candidate twin sf1-feasible, turning the operator's scale dial
    into hard oracle evidence instead of a documented skip. Neighbor
    counts are sparser by design (more bucket misses) — that is the
    documented recall/density trade of the dial, replayed exactly by
    the oracle."""
    emb = _spread(_t(spark, sf_dir, "embeddings"), "vec_id")
    return S.embedding_isolation(emb, threshold=_ISO_TAU, planes=8, tables=2)


def _embedding_isolation_sql(planes: int = 4) -> str:
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings),
sig AS (
  SELECT vec_id, v,
         {_bucket_sql(planes, offset=0)} AS b0,
         {_bucket_sql(planes, offset=planes)} AS b1
  FROM v),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sig a JOIN sig b ON a.b0 = b.b0 AND a.vec_id < b.vec_id
  UNION
  SELECT a.vec_id, b.vec_id
  FROM sig a JOIN sig b ON a.b1 = b.b1 AND a.vec_id < b.vec_id),
verified AS MATERIALIZED (
  SELECT id_a, id_b
  FROM pairs JOIN v a ON pairs.id_a = a.vec_id
             JOIN v b ON pairs.id_b = b.vec_id
  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {_ISO_TAU}),
cnt AS (
  SELECT vec_id, count(*)::BIGINT AS n_neighbors FROM (
    SELECT id_a AS vec_id FROM verified
    UNION ALL SELECT id_b FROM verified)
  GROUP BY vec_id)
SELECT e.vec_id,
       coalesce(n_neighbors, 0)::BIGINT AS n_neighbors,
       (coalesce(n_neighbors, 0) = 0) AS isolated
FROM embeddings e LEFT JOIN cnt ON e.vec_id = cnt.vec_id
"""


def training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-pipeline: the full training-corpus prep composition — exact
    dedup → minhash near-dup removal → quality/language gate
    (operators/dataprep.py). Every stage md5-deterministic; the oracle
    replays all three."""
    from ig_etl_sync_spark.operators.dataprep import prepare_training_corpus

    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return prepare_training_corpus(docs)


def _training_prep_sql() -> str:
    norm = _NORM_TEXT_SQL.format(x="text")
    toks = _TOKENS_SQL.format(x="text")
    ltoks = _TOKENS_SQL.format(x="lower(text)")
    score_cols = []
    for lang, words in T.STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        score_cols.append(f"len(list_filter(ltoks, t -> t IN ({lst}))) AS s_{lang}")
    langs = list(T.STOPWORDS)
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    cases = " ".join(f"WHEN s_{lg} = best AND best > 0 THEN '{lg}'" for lg in langs)
    return f"""
WITH fp AS (SELECT doc_id, md5({norm}) AS fp FROM documents),
keep1 AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp),
surv AS (SELECT d.* FROM documents d JOIN keep1 USING (doc_id)),
{_minhash_pair_ctes('surv')},
dup AS (SELECT DISTINCT id_b FROM mh_pairs WHERE jaccard >= 0.7),
surv2 AS (SELECT * FROM surv WHERE doc_id NOT IN (SELECT id_b FROM dup)),
base AS (SELECT doc_id, text, {ltoks} AS ltoks FROM surv2),
scored AS (
  SELECT doc_id, {', '.join(score_cols)},
         len({toks}) AS n_tokens,
         round(CASE WHEN length(text) = 0 THEN 0.0
               ELSE len(regexp_extract_all(text, '[A-Za-z]'))::DOUBLE / length(text)
               END, 4) AS alpha_ratio
  FROM base),
pred AS (
  SELECT doc_id, n_tokens, alpha_ratio,
         CASE {cases} ELSE 'und' END AS lang_pred
  FROM (SELECT *, {best} AS best FROM scored))
SELECT doc_id, lang_pred, n_tokens, alpha_ratio
FROM pred
WHERE n_tokens BETWEEN 20 AND 1000
  AND alpha_ratio >= 0.6
  AND lang_pred <> 'und'
"""


def q14_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group: Spark ``percentile``
    (linear interpolation) ≡ DuckDB ``quantile_cont``. The exact form is
    the correctness baseline for ``approx_percentile``/t-digest at
    scale — same plan shape (one groupBy shuffle), sketchless."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


Q14_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99,
       count(*) AS n
FROM events
GROUP BY event_type
"""


def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sampling: 20 hash-smallest docs per lang."""
    from ig_etl_sync_spark.operators.dataprep import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", 20).select("doc_id", "lang")


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
             PARTITION BY lang
             ORDER BY {_MD5_INT_SQL.format(x='doc_id::VARCHAR')} ASC,
                      doc_id ASC) AS sr
  FROM documents)
WHERE sr <= 20
"""


def corpus_sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget downsampling at 10k tokens (rate-based, two-pass —
    no global cumulative window; see dataprep.token_budget_sample)."""
    from ig_etl_sync_spark.operators.dataprep import token_budget_sample

    docs = _t(spark, sf_dir, "documents")
    return token_budget_sample(docs, 10_000).select("doc_id", "lang")


TOKEN_BUDGET_SAMPLE_SQL = f"""
WITH tot AS (
  SELECT sum(len({_TOKENS_SQL.format(x='text')}))::BIGINT AS t FROM documents)
SELECT doc_id, lang FROM documents, tot
WHERE CASE WHEN t <= 10000 THEN TRUE
      ELSE {_MD5_INT_SQL.format(x='doc_id::VARCHAR')} % 10000
           < (10000 * 10000) // t END
"""


def corpus_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-sampling: 120 docs sampled WITHOUT replacement with inclusion
    probability ∝ token count (Efraimidis-Spirakis A-ES over
    md5-uniform keys; dataprep.weighted_sample_topn) — the sample's
    token mass mirrors the corpus. Selection-only output."""
    from ig_etl_sync_spark.operators.dataprep import weighted_sample_topn
    from ig_etl_sync_spark.operators.textops import token_count

    docs = _t(spark, sf_dir, "documents")
    docs = docs.withColumn("n_tokens", token_count(F.col("text")).cast("long"))
    return weighted_sample_topn(docs, 120, "n_tokens").select(
        "doc_id", "lang", "n_tokens"
    )


WEIGHTED_SAMPLE_SQL = f"""
WITH base AS (
  SELECT doc_id, lang,
         len({_TOKENS_SQL.format(x='text')})::BIGINT AS n_tokens,
         ({_MD5_INT_SQL.format(x='doc_id::VARCHAR')} + 1.0)
             / 4294967296.0 AS u
  FROM documents),
keyed AS (
  SELECT doc_id, lang, n_tokens,
         round(pow(u, 1.0 / n_tokens::DOUBLE), 8) AS wkey
  FROM base WHERE n_tokens > 0)
SELECT doc_id, lang, n_tokens
FROM keyed
ORDER BY wkey DESC, doc_id ASC
LIMIT 120
"""


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-pipeline: sequence packing — per-pack doc count and token
    total for a 2048-token budget over 8 hash buckets (see
    dataprep.pack_sequences: two-level bucket trick, no global
    sort)."""
    from ig_etl_sync_spark.operators.dataprep import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    packed = pack_sequences(docs, budget=2048, n_buckets=8)
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("pack_id")
    )


def _sequence_packing_sql() -> str:
    toks = _TOKENS_SQL.format(x="text")
    hk = _MD5_INT_SQL.format(x="doc_id::VARCHAR")
    return f"""
WITH base AS (
  SELECT doc_id, len({toks})::BIGINT AS n_tokens, {hk} AS hk
  FROM documents),
b2 AS (SELECT *, hk % 8 AS bucket FROM base),
run AS (
  SELECT doc_id, n_tokens, bucket,
         (sum(n_tokens) OVER (PARTITION BY bucket ORDER BY hk, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
             AS running
  FROM b2),
packs AS (
  -- stride 2^40 mirrors dataprep.pack_sequences (collision-free far
  -- beyond 100 TB; decimal 1e6 collided at ~2.1e9 tokens/bucket)
  SELECT bucket * 1099511627776 + ((running - n_tokens) // 2048)
             AS pack_id,
         n_tokens
  FROM run)
SELECT pack_id, count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens
FROM packs GROUP BY pack_id ORDER BY pack_id
"""


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-temporal: ordered conversion funnel signup → click → purchase
    with first-qualifying-event chaining, µs-exact
    (operators/sessions.funnel_counts)."""
    from ig_etl_sync_spark.operators.sessions import funnel_counts

    ev = _t(spark, sf_dir, "events")
    return funnel_counts(ev, ["signup", "click", "purchase"])


FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(epoch_us(ts)) AS t FROM events
  WHERE event_type = 'signup' GROUP BY 1),
s2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t GROUP BY 1),
s3 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t GROUP BY 1)
SELECT 1::BIGINT AS stage, 'signup' AS step,
       (SELECT count(*) FROM s1)::BIGINT AS n_keys
UNION ALL
SELECT 2::BIGINT, 'click', (SELECT count(*) FROM s2)::BIGINT
UNION ALL
SELECT 3::BIGINT, 'purchase', (SELECT count(*) FROM s3)::BIGINT
"""


def pii_redaction_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-text: PII scrubbing — deterministic synthetic PII (an email,
    an IP, a phone derived from doc_id) is injected into each doc,
    then redacted (textops.redact_pii) with progressive per-kind
    counts; md5 of the cleaned text value-checks the whole scrub.
    doc_id < 100."""
    from ig_etl_sync_spark.operators.textops import pii_counts, redact_pii

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0.0."),
            (F.col("doc_id") % 250).cast("string"),
            F.lit(" call +1 415 555 0199"),
        ).alias("text"),
    )
    return injected.select(
        "doc_id",
        *pii_counts("text"),
        F.md5(redact_pii("text")).alias("clean_md5"),
    )


def _pii_sql() -> str:
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ip = r"\b(\d{1,3}\.){3}\d{1,3}\b"
    phone = r"\+?\d[\d ().-]{7,}\d\b"
    return f"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || doc_id::VARCHAR ||
         '@example.com from 10.0.0.' || (doc_id % 250)::VARCHAR ||
         ' call +1 415 555 0199' AS text
  FROM documents WHERE doc_id < 100),
s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{email}'))::BIGINT AS n_email,
         regexp_replace(text, '{email}', '<EMAIL>', 'g') AS t1
  FROM injected),
s2 AS (
  SELECT doc_id, n_email,
         len(regexp_extract_all(t1, '{ip}'))::BIGINT AS n_ip,
         regexp_replace(t1, '{ip}', '<IP>', 'g') AS t2
  FROM s1),
s3 AS (
  SELECT doc_id, n_email, n_ip,
         len(regexp_extract_all(t2, '{phone}'))::BIGINT AS n_phone,
         regexp_replace(t2, '{phone}', '<PHONE>', 'g') AS clean
  FROM s2)
SELECT doc_id, n_email, n_ip, n_phone, md5(clean) AS clean_md5 FROM s3
"""


def value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-profiling: PSI drift of events.value — click events as the
    reference distribution, purchase events as the current one, 10
    equal-width bins from the reference range
    (operators/profiling.psi_drift)."""
    from ig_etl_sync_spark.operators.profiling import psi_drift

    ev = _t(spark, sf_dir, "events")
    ref = ev.where("event_type = 'click'")
    cur = ev.where("event_type = 'purchase'")
    return psi_drift(ref, cur, "value", bins=10)


PSI_DRIFT_SQL = """
WITH spec AS (
  SELECT min(value) AS mn, max(value) AS mx
  FROM events WHERE event_type = 'click'),
pb AS (
  SELECT least(greatest(floor((value - mn) * 10 / (mx - mn)), 0), 9)::BIGINT
           AS bin_id, count(*)::BIGINT AS np
  FROM events, spec WHERE event_type = 'click' GROUP BY 1),
qb AS (
  SELECT least(greatest(floor((value - mn) * 10 / (mx - mn)), 0), 9)::BIGINT
           AS bin_id, count(*)::BIGINT AS nq
  FROM events, spec WHERE event_type = 'purchase' GROUP BY 1),
bins AS (SELECT unnest(generate_series(0, 9))::BIGINT AS bin_id),
joined AS (
  SELECT b.bin_id, coalesce(np, 0) AS np, coalesce(nq, 0) AS nq
  FROM bins b LEFT JOIN pb USING (bin_id) LEFT JOIN qb USING (bin_id)),
tot AS (SELECT sum(np)::BIGINT AS tp, sum(nq)::BIGINT AS tq FROM joined),
pq AS (
  SELECT bin_id, np / tp::DOUBLE + 0.000001 AS p,
         nq / tq::DOUBLE + 0.000001 AS q
  FROM joined, tot)
SELECT bin_id, round(p, 6) AS p_ref, round(q, 6) AS q_cur,
       round((p - q) * ln(p / q), 6) AS contrib
FROM pq ORDER BY bin_id
"""


def click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-streaming (batch twin): attribution join — purchases within
    one hour after each click by the same user, via the SAME
    interval_join the streaming path runs (streaming/joins.py; on
    batch frames it compiles to the plain inequality join). Per-click
    purchase count + value sum, top 30 by count."""
    from ig_etl_sync_spark.streaming.joins import interval_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = ev.where("event_type = 'purchase'").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts", "value"
    )
    j = interval_join(
        clicks, purchases, "user_id", lower_sec=0, upper_sec=3600
    )
    return (
        j.groupBy("click_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy(F.col("n_purchases").desc(), F.col("click_id").asc())
        .limit(30)
    )


ATTRIBUTION_SQL = """
SELECT c.event_id AS click_id, count(*)::BIGINT AS n_purchases,
       round(sum(p.value), 2) AS sum_value
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND epoch_us(p.ts) >= epoch_us(c.ts)
 AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000::BIGINT
WHERE c.event_type = 'click'
GROUP BY c.event_id
ORDER BY n_purchases DESC, click_id ASC
LIMIT 30
"""


def value_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-profiling: robust outlier monitoring of events.value per
    event_type — modified z-score (median/MAD, Iglewicz-Hoaglin)
    rounded in-engine before the 3.5 threshold
    (operators/profiling.mad_outliers)."""
    from ig_etl_sync_spark.operators.profiling import mad_outliers

    ev = _t(spark, sf_dir, "events")
    scored = mad_outliers(ev, "value", ["event_type"], threshold=3.5)
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("is_outlier"), 1)).alias("n_outliers"),
            F.max(F.abs(F.col("mod_z"))).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


OUTLIER_STATS_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1),
dev AS (
  SELECT e.event_type, value, med, abs(value - med) AS adev
  FROM events e JOIN med USING (event_type)),
mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1),
scored AS (
  SELECT d.event_type,
         CASE WHEN mad > 0
              THEN round(0.6745 * (value - med) / mad, 4) END AS mod_z
  FROM dev d JOIN mad USING (event_type))
SELECT event_type, count(*)::BIGINT AS n_events,
       count(CASE WHEN abs(mod_z) > 3.5 THEN 1 END)::BIGINT AS n_outliers,
       max(abs(mod_z)) AS max_abs_z
FROM scored GROUP BY event_type ORDER BY event_type
"""


def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-join: entity-resolution fuzzy self-join of supplier names at
    Levenshtein distance ≤ 1 via exact rare-q-gram prefix blocking
    (operators/joins.fuzzy_match_join_rare_gram; 6× the length-blocked
    form at sf1 — template-named values share a block under length
    blocking). The DuckDB oracle keeps the simple length-block SQL:
    the blockings are result-identical (property-tested), so parity
    doubles as the blocking-soundness check."""
    from ig_etl_sync_spark.operators.joins import fuzzy_match_join_rare_gram

    supp = _t(spark, sf_dir, "supplier")
    pairs = fuzzy_match_join_rare_gram(supp, supp, "s_name", max_dist=1)
    nodes = pairs.select(F.col("a").alias("name")).unionByName(
        pairs.select(F.col("b").alias("name"))
    )
    return (
        nodes.groupBy("name")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .orderBy(F.col("n_matches").desc(), F.col("name").asc())
        .limit(30)
    )


FUZZY_NAME_SQL = """
WITH s AS (SELECT DISTINCT s_name FROM supplier),
cand AS (
  SELECT a.s_name AS na, b.s_name AS nb
  FROM s a JOIN s b
    ON len(a.s_name) BETWEEN len(b.s_name) - 1 AND len(b.s_name) + 1
   AND a.s_name < b.s_name),
pairs AS (SELECT na, nb FROM cand WHERE levenshtein(na, nb) <= 1),
nodes AS (SELECT na AS name FROM pairs UNION ALL SELECT nb AS name FROM pairs)
SELECT name, count(*)::BIGINT AS n_matches
FROM nodes GROUP BY name
ORDER BY n_matches DESC, name ASC
LIMIT 30
"""


def _cosupply_topk_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared backbone for the co-supply graph queries: suppliers
    sharing parts, projected to mutual top-3 partner edges (degree ≤ 6
    at any density). One definition — the triangle and k-core queries
    must stay on the SAME graph."""
    from ig_etl_sync_spark.operators.graph_algos import mutual_topk_graph

    li = _t(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    # Explicit width on the self-join inputs (round 8): the per-part
    # pair expansion is COMPUTE-bound (C(suppliers-per-part, 2) rows
    # out of byte-small inputs), and AQE's byte-based coalescing ran
    # it on 3-5 partitions at sf0.1 — the compute-heavy-small-shuffle
    # trap (CLAUDE.md). Hash both sides to full parallelism; the join
    # then reads the explicit exchanges with no extra shuffle.
    n_parts = spark.sparkContext.defaultParallelism
    a = ps.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("a")
    ).repartition(n_parts, F.col("pk"))
    b = ps.select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("b")
    ).repartition(n_parts, F.col("pk"))
    pairs = (
        a.join(b, "pk")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # Materialized: every consumer is a multi-branch plan (triangle
    # enumeration joins the edge list three times, k-core peels it
    # repeatedly) and Catalyst re-evaluates the lineitem self-join per
    # branch otherwise (repo diamond invariant).
    return mutual_topk_graph(pairs, k=3).localCheckpoint(eager=False)


def triangle_counts_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-graph: triangle counts over the mutual top-3 co-supply
    partner graph. The co-occurrence projection (suppliers sharing
    parts) is near-complete at every SF, so it is first sparsified to
    each node's 3 strongest partners (graph_algos.mutual_topk_graph —
    degree ≤ 6 whatever the density), then triangles are enumerated
    once each over oriented edges (graph_algos.triangle_count).
    Top-30 nodes by triangle participation."""
    from ig_etl_sync_spark.operators.graph_algos import triangle_count

    edges = _cosupply_topk_edges(spark, sf_dir)
    return (
        triangle_count(edges)
        .orderBy(F.col("n_triangles").desc(), F.col("node").asc())
        .limit(30)
    )


TRIANGLES_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS a, b.l_suppkey AS b, count(*)::BIGINT AS w
  FROM ps a JOIN ps b
    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2),
bidir AS (
  SELECT a AS n, b AS p, w FROM pairs
  UNION ALL SELECT b AS n, a AS p, w FROM pairs),
kept AS (
  SELECT n, p FROM (
    SELECT *, row_number() OVER (
        PARTITION BY n ORDER BY w DESC, p ASC) AS r
    FROM bidir) rb
  WHERE r <= 3),
e AS (SELECT DISTINCT least(n, p) AS lo, greatest(n, p) AS hi FROM kept),
tri AS (
  SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
  FROM e ab JOIN e bc ON ab.hi = bc.lo
  WHERE EXISTS (SELECT 1 FROM e ac WHERE ac.lo = ab.lo AND ac.hi = bc.hi)),
nodes AS (SELECT unnest([a, b, c]) AS node FROM tri)
SELECT node, count(*)::BIGINT AS n_triangles
FROM nodes GROUP BY node
ORDER BY n_triangles DESC, node ASC
LIMIT 30
"""


def triangle_counts_oriented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-graph: same co-supply triangle counts as
    ``triangle_counts_cosupply`` but enumerated with DEGREE orientation
    (graph_algos.triangle_count_degree_oriented) — the variant whose
    wedge cost is O(m^1.5) on arbitrary power-law graphs. Shares the
    oracle with the id-oriented query: orientation must never change
    the counts."""
    from ig_etl_sync_spark.operators.graph_algos import (
        triangle_count_degree_oriented,
    )

    edges = _cosupply_topk_edges(spark, sf_dir)
    return (
        triangle_count_degree_oriented(edges)
        .orderBy(F.col("n_triangles").desc(), F.col("node").asc())
        .limit(30)
    )


def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-profiling: ANALYZE-style per-column statistics of orders in
    one table pass (operators/profiling.column_profile). Exact ndv
    here for oracle parity; the 100 TB swap-in is the HLL register
    sketch."""
    from ig_etl_sync_spark.operators.profiling import column_profile

    orders = _t(spark, sf_dir, "orders")
    return column_profile(
        orders,
        [
            ("o_orderkey", "num"),
            ("o_totalprice", "num"),
            ("o_orderstatus", "str"),
            ("o_orderdate", "ts"),
        ],
    )


def _profile_col_sql(c: str, kind: str) -> str:
    if kind == "num":
        mn = f"format('{{:.4f}}', round(min({c})::DOUBLE, 4))"
        mx = f"format('{{:.4f}}', round(max({c})::DOUBLE, 4))"
    elif kind == "ts":
        mn = f"strftime(min({c}), '%Y-%m-%d %H:%M:%S')"
        mx = f"strftime(max({c}), '%Y-%m-%d %H:%M:%S')"
    else:
        mn, mx = f"min({c})::VARCHAR", f"max({c})::VARCHAR"
    return (
        f"SELECT '{c}' AS column, count(*)::BIGINT AS n_rows,"
        f" count({c})::BIGINT AS n_non_null,"
        f" count(DISTINCT {c})::BIGINT AS n_distinct,"
        f" {mn} AS min_str, {mx} AS max_str FROM orders"
    )


TABLE_PROFILE_SQL = " UNION ALL ".join(
    _profile_col_sql(c, k)
    for c, k in [
        ("o_orderkey", "num"),
        ("o_totalprice", "num"),
        ("o_orderstatus", "str"),
        ("o_orderdate", "ts"),
    ]
)


def fk_violation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-profiling: referential check of lineitem.l_suppkey against a
    PARTIAL supplier dimension (s_nationkey < 3) — the partially-synced
    dimension scenario; returns orphan counts per missing key
    (operators/profiling.referential_violations), top 30."""
    from ig_etl_sync_spark.operators.profiling import referential_violations

    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").where(F.col("s_nationkey") < 3)
    return referential_violations(li, supp, "l_suppkey", "s_suppkey").limit(30)


FK_VIOLATIONS_SQL = """
-- NOT EXISTS (not NOT IN): matches the operator's left_anti +
-- fk IS NOT NULL semantics on nullable keys (profiling.py)
SELECT l_suppkey, count(*)::BIGINT AS n_orphans
FROM lineitem l
WHERE l.l_suppkey IS NOT NULL
  AND NOT EXISTS (
    SELECT 1 FROM supplier s
    WHERE s.s_nationkey < 3 AND s.s_suppkey = l.l_suppkey)
GROUP BY l_suppkey
ORDER BY n_orphans DESC, l_suppkey ASC
LIMIT 30
"""


def kmv_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-sketch: KMV distinct-count estimate of parts per returnflag.
    md5-hash order statistics — sketch state (the k smallest hashes)
    is bit-identical in the oracle, so even the *estimate* hash-matches."""
    from ig_etl_sync_spark.operators.sketches import kmv_distinct

    li = _t(spark, sf_dir, "lineitem")
    return kmv_distinct(li, "l_partkey", k=64, group_cols=["l_returnflag"])


def _kmv_sql() -> str:
    from ig_etl_sync_spark.operators.sketches import kmv_sql

    return kmv_sql("l_partkey", "lineitem", 64, ["l_returnflag"])


def hll_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-sketch: HLL-style register sketch (m=64) of distinct customers
    per order priority. Registers use integer-only rank math (no log2)
    and power-of-two float sums, so the estimate is cross-engine exact."""
    from ig_etl_sync_spark.operators.sketches import hll_distinct

    o = _t(spark, sf_dir, "orders")
    return hll_distinct(o, "o_custkey", m=64, group_cols=["o_orderpriority"])


def _hll_sql() -> str:
    from ig_etl_sync_spark.operators.sketches import hll_sql

    return hll_sql("o_custkey", "orders", 64, ["o_orderpriority"])


def hll_small_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-sketch: HLL with the standard small-range (linear counting)
    correction — distinct users per event type sits at ~150 < 2.5·m,
    exactly the regime where the raw estimator's bias is worst. The
    ``m·ln(m/V)`` values are a plan-time literal table (V has only m
    possible values), so no engine ``ln`` is ever evaluated and the
    corrected estimate still hash-matches DuckDB. Exact distinct is
    joined alongside (broadcast — 5 rows) for the accuracy story."""
    from ig_etl_sync_spark.operators.sketches import hll_distinct

    ev = _t(spark, sf_dir, "events")
    est = hll_distinct(ev, "user_id", m=64, group_cols=["event_type"], corrected=True)
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.join(F.broadcast(exact), "event_type").orderBy("event_type")


def _hll_small_range_sql() -> str:
    from ig_etl_sync_spark.operators.sketches import hll_sql

    est = hll_sql("user_id", "events", 64, ["event_type"], corrected=True)
    return f"""
WITH est AS ({est}),
exact AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
          FROM events GROUP BY event_type)
SELECT est.event_type, est.hll_est, est.hll_buckets, exact.exact_distinct
FROM est JOIN exact USING (event_type) ORDER BY event_type
"""


def cms_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-sketch: count-min (d=4, w=256) frequency estimates for the 20
    most active users, alongside exact counts (CMS never under-counts;
    the sketch is d*w rows → broadcast-joined, items never shuffle)."""
    from ig_etl_sync_spark.operators.sketches import cms_lookup, cms_sketch

    ev = _t(spark, sf_dir, "events")
    sketch = cms_sketch(ev, "user_id", depth=4, width=256)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cms_lookup(sketch, exact, "user_id", depth=4, width=256)
    return est.orderBy(F.desc("exact_cnt"), "user_id").limit(20)


_CMS_BUCKET_SQL = (
    "('0x' || substr(md5('cms' || {i}::VARCHAR || ':' || {x}::VARCHAR), 1, 8))"
    "::BIGINT % 256"
)

CMS_HEAVY_USERS_SQL = f"""
WITH d AS (SELECT unnest(generate_series(0, 3)) AS i),
sk AS (
  SELECT i, {_CMS_BUCKET_SQL.format(i='i', x='user_id')} AS b,
         count(*)::BIGINT AS c
  FROM events CROSS JOIN d
  GROUP BY 1, 2),
exact AS (
  SELECT user_id, count(*)::BIGINT AS exact_cnt FROM events GROUP BY user_id)
SELECT user_id, exact_cnt, min(c) AS cms_est
FROM exact CROSS JOIN d
JOIN sk ON sk.i = d.i
       AND sk.b = {_CMS_BUCKET_SQL.format(i='d.i', x='exact.user_id')}
GROUP BY user_id, exact_cnt
ORDER BY exact_cnt DESC, user_id
LIMIT 20
"""


def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-clustering: minhash near-dup pairs → connected components →
    canonical-survivor decision (operators/clustering.py). The step
    pair-wise dedup misses: transitive chains collapse to ONE cluster
    with one kept doc. Oracle replays the fixpoint via recursive CTE."""
    from ig_etl_sync_spark.operators.clustering import resolve_dup_clusters

    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    pairs = D.near_dup_pairs_minhash(docs, threshold=0.7).select("id_a", "id_b")
    return resolve_dup_clusters(pairs)


def _near_dup_clusters_sql() -> str:
    return f"""
WITH RECURSIVE {_minhash_pair_ctes('documents')},
dup AS (SELECT id_a, id_b FROM mh_pairs WHERE jaccard >= 0.7),
e AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM dup
  UNION SELECT id_b, id_a FROM dup),
walk(u, lbl) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e) n
  UNION
  SELECT e.u, w.lbl FROM e JOIN walk w ON e.v = w.u),
comp AS (SELECT u AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY u)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       doc_id = cluster_id AS keep
FROM comp
"""


def near_dup_canonical_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X106: quality-aware canonical selection over the minhash
    near-dup clusters (``clustering.resolve_dup_clusters_scored``) —
    keep the LONGEST member (exact token count, id tiebreak), the
    production keep-best policy min-id approximates."""
    from ig_etl_sync_spark.operators.clustering import (
        resolve_dup_clusters_scored,
    )
    from ig_etl_sync_spark.operators.textops import token_count

    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    pairs = D.near_dup_pairs_minhash(docs, threshold=0.7).select(
        "id_a", "id_b"
    )
    scores = docs.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("score")
    )
    return resolve_dup_clusters_scored(pairs, scores)


def _near_dup_canonical_sql() -> str:
    toks = _TOKENS_SQL.format(x="text")
    return f"""
WITH RECURSIVE {_minhash_pair_ctes('documents')},
dup AS (SELECT id_a, id_b FROM mh_pairs WHERE jaccard >= 0.7),
e AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM dup
  UNION SELECT id_b, id_a FROM dup),
walk(u, lbl) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e) n
  UNION
  SELECT e.u, w.lbl FROM e JOIN walk w ON e.v = w.u),
comp AS MATERIALIZED (
  SELECT u AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY u),
sc AS (SELECT doc_id, len({toks})::BIGINT AS score FROM documents)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id)::BIGINT AS cluster_size,
       score,
       row_number() OVER (PARTITION BY cluster_id
                          ORDER BY score DESC NULLS LAST, doc_id ASC) = 1
           AS keep
FROM comp LEFT JOIN sc USING (doc_id)
"""


def corpus_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X81: per-source document cap (RefinedWeb-style domain cap) —
    keep <= 40 docs per source by seeded-hash order, selected with the
    exact two-phase skew-bounded rank (``dataprep.source_frequency_cap``;
    the oracle is the single-window form, value-identical)."""
    from ig_etl_sync_spark.operators.dataprep import source_frequency_cap

    docs = _t(spark, sf_dir, "documents")
    return source_frequency_cap(docs, 40).select("doc_id", "source")


CORPUS_SOURCE_CAP_SQL = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_MD5_INT_SQL.format(x="'cap-v1:' || doc_id::VARCHAR")} ASC,
                    doc_id ASC) AS r
  FROM documents)
WHERE r <= 40
"""


def soft_dedup_doc_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X82: soft deduplication — every doc weighted 1/|near-dup
    cluster| in exact ppm (``dataprep.soft_dedup_weights``): n copies
    contribute one doc's training mass in expectation instead of
    hard-dropping n-1 (the data-constrained alternative). Oracle
    replays LSH pairs -> recursive connected components -> integer
    floor division."""
    from ig_etl_sync_spark.operators.dataprep import soft_dedup_weights

    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return soft_dedup_weights(docs)


def _soft_dedup_weights_sql() -> str:
    return f"""
WITH RECURSIVE {_minhash_pair_ctes('documents')},
dup AS (SELECT id_a, id_b FROM mh_pairs WHERE jaccard >= 0.7),
e AS MATERIALIZED (
  SELECT id_a AS u, id_b AS v FROM dup
  UNION SELECT id_b, id_a FROM dup),
walk(u, lbl) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e) n
  UNION
  SELECT e.u, w.lbl FROM e JOIN walk w ON e.v = w.u),
comp AS (SELECT u AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY u),
sizes AS (SELECT doc_id,
                 count(*) OVER (PARTITION BY cluster_id) AS cluster_size
          FROM comp)
SELECT d.doc_id,
       coalesce(s.cluster_size, 1)::BIGINT AS cluster_size,
       (1000000 // coalesce(s.cluster_size, 1))::BIGINT AS weight_ppm
FROM documents d LEFT JOIN sizes s USING (doc_id)
"""


def q15_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average decorrelated into a
    self-join. The brand filter broadcasts into BOTH branches (semi-join
    prune before the per-part agg), so the heavy side aggregates only
    the selected parts' rows — the decorrelation Catalyst can't do for
    a true correlated scalar subquery is done structurally here.
    Float parity note: l_quantity is integer-valued, so sum/avg are
    exact in double regardless of partial-agg order — the 0.5*avg
    threshold compares bit-identically across engines."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    pk = F.broadcast(part.select("p_partkey"))
    li_b = li.join(pk, li.l_partkey == pk.p_partkey).drop("p_partkey")
    half_avg = li_b.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("_half_avg")
    )
    return (
        li_b.join(half_avg, "l_partkey")
        .where(F.col("l_quantity") < F.col("_half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


Q15_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)
"""


def q16_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group-filter on the fact table FIRST (one
    partial-agg shuffle reduces 60k line rows to ~3k qualifying
    orders), then join the shrunken result to orders and broadcast the
    customer dim — never the other way around."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .where(F.col("total_qty") > 180)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )


Q16_SQL = """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 4) AS total_qty
  FROM lineitem GROUP BY l_orderkey) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE total_qty > 180
ORDER BY total_qty DESC, o_orderkey ASC
LIMIT 20
"""


def q17_event_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-navigation surface: lag delta + ntile quartile per user,
    ordered by µs timestamp + event_id tiebreak (the CLAUDE.md temporal
    invariant — second-cast ordering would tie differently). One
    user-keyed shuffle serves both window functions (same spec)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
        F.ntile(4).over(w).alias("quartile"),
    )


Q17_SQL = """
SELECT user_id, event_id,
       round(value - lag(value) OVER w, 4) AS delta_prev,
       ntile(4) OVER w AS quartile
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
"""


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-text: Gopher-style repetition filters (type-token ratio, modal
    word fraction, modal bigram fraction) — the boilerplate/spam
    signals length+alpha gates miss (textops.repetition_stats)."""
    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return T.repetition_stats(docs)


TEXT_REPETITION_SQL = f"""
WITH base AS MATERIALIZED (
  -- referenced by ttr/wc/bg — inlining re-splits the text per branch
  SELECT doc_id, {_TOKENS_SQL.format(x='lower(text)')} AS toks FROM documents),
ttr AS (
  SELECT doc_id,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE len(list_distinct(toks))::DOUBLE / len(toks) END AS ttr
  FROM base),
wc AS (
  SELECT doc_id, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest(toks) AS t FROM base)
  GROUP BY doc_id, t),
words AS (
  SELECT doc_id, max(c)::DOUBLE / sum(c)::BIGINT AS max_word FROM wc GROUP BY doc_id),
bg AS (
  SELECT doc_id, count(*)::BIGINT AS c
  FROM (SELECT doc_id,
               unnest(CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
                      ELSE list_transform(generate_series(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i+1]) END) AS t
        FROM base)
  GROUP BY doc_id, t),
bigrams AS (
  SELECT doc_id, max(c)::DOUBLE / sum(c)::BIGINT AS top_bigram FROM bg GROUP BY doc_id)
SELECT t.doc_id, round(t.ttr, 4) AS ttr,
       round(coalesce(w.max_word, 0.0), 4) AS max_word_ratio,
       round(coalesce(b.top_bigram, 0.0), 4) AS top_bigram_ratio
FROM ttr t
LEFT JOIN words w ON t.doc_id = w.doc_id
LEFT JOIN bigrams b ON t.doc_id = b.doc_id
"""


def q18_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: double-EXISTS (another supplier on the order /
    no OTHER late supplier) decorrelated into ONE per-order aggregate —
    `countDistinct(supp)` + `countDistinct(supp WHERE late)` — instead
    of two correlated self-join probes of the fact table. One agg
    shuffle + one semi-join back; top-10 suppliers by blamed orders."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "late"
        ),
    )
    # two-level agg instead of double countDistinct: one (order, supp)
    # partial-agg collapses the fact rows, then plain counts — no
    # Expand operator duplicating the 60k-row input per distinct column
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late")
    )
    po = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("ns"),
        F.count_if("late").alias("nl"),
    )
    blamed = per_supp.where("late").join(
        po.where((F.col("ns") >= 2) & (F.col("nl") == 1)), "l_orderkey"
    ).select("l_suppkey", "l_orderkey")
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(10)
    )


Q18_SQL = """
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
po AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS ns,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nl
  FROM lo GROUP BY l_orderkey),
blamed AS (
  SELECT DISTINCT lo.l_suppkey, lo.l_orderkey
  FROM lo JOIN po USING (l_orderkey)
  WHERE lo.late AND po.ns >= 2 AND po.nl = 1)
SELECT s_suppkey, s_name, count(*)::BIGINT AS numwait
FROM blamed JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey ASC
LIMIT 10
"""


def q19_prospect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global positive-balance
    average) decorrelated into a broadcast nested-loop of a 1-row
    frame, then anti-join customers-without-orders, grouped by nation.
    The 1-row crossJoin is the set-oriented form of a scalar subquery —
    no collect, no second action."""
    cust = _t(spark, sf_dir, "customer")
    # "prospect" = no URGENT order (every customer has SOME order at
    # this SF, mirroring q10's anti-join predicate)
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


Q19_SQL = """
SELECT c_nationkey, count(*)::BIGINT AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


def q20_event_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame surface the navigation query (q17) doesn't cover:
    a RANGE frame over event *time* (1-hour trailing sum — peers by µs
    value, not row position), percent_rank/cume_dist over a
    tie-broken value ordering, and first/last_value over an explicit
    full-partition ROWS frame. The trailing sum is fixed-point: each
    value quantizes to integer micros via floor(v*1e6 + 0.5) — floor
    of the same IEEE double is bit-identical in both engines, unlike a
    double→DECIMAL cast (Spark HALF_UP vs DuckDB float-multiply at
    half boundaries) — the window sums BIGINTs exactly, and the /1e6
    display division of the same int is the same double everywhere.
    Same discipline as PageRank. percent_rank/cume_dist are ratios of
    identical small ints; their round(.,6) is display-final (residual
    half-boundary exposure only when k/(n-1) is a 7-digit power-of-2
    decimal AND the float-multiply lands exactly on .5 — the exact
    cases quantize identically, so accepted). One user-keyed shuffle
    serves all three window specs."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w_time = (
        Window.partitionBy("user_id").orderBy(us)
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    w_value = Window.partitionBy("user_id").orderBy("value", "event_id")
    w_full = (
        Window.partitionBy("user_id").orderBy(us, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    micros = F.floor(F.col("value") * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    return ev.select(
        "user_id",
        "event_id",
        (F.sum(micros).over(w_time) / F.lit(1_000_000.0)).alias("roll_1h_sum"),
        F.round(F.percent_rank().over(w_value), 6).alias("pr_value"),
        F.round(F.cume_dist().over(w_value), 6).alias("cd_value"),
        F.first("event_type").over(w_full).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
    )


Q20_SQL = """
SELECT user_id, event_id,
       (sum(floor(value * 1000000.0 + 0.5)::BIGINT) OVER wt)::BIGINT
           / 1000000.0 AS roll_1h_sum,
       round(percent_rank() OVER wv, 6) AS pr_value,
       round(cume_dist() OVER wv, 6) AS cd_value,
       first_value(event_type) OVER wf AS first_type,
       last_value(event_type) OVER wf AS last_type
FROM events
WINDOW
  wt AS (PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW),
  wv AS (PARTITION BY user_id ORDER BY value, event_id),
  wf AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q26_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (beyond q08's rollup / q13's cube):
    revenue by returnflag alone, by linestatus alone, and the grand
    total, in ONE aggregation pass (Expand-based, same plan family as
    cube). Explicit per-column grouping() flags instead of
    grouping_id() so the indicator is engine-neutral; NULL group
    values rendered '(all)' in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_q26_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, '(all)') AS returnflag,
               coalesce(l_linestatus, '(all)') AS linestatus,
               cast(grouping(l_returnflag) AS BIGINT) AS g_rf,
               cast(grouping(l_linestatus) AS BIGINT) AS g_ls,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM _q26_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY g_rf, g_ls, returnflag, linestatus
        """
    )


Q26_SQL = """
SELECT coalesce(l_returnflag, '(all)') AS returnflag,
       coalesce(l_linestatus, '(all)') AS linestatus,
       grouping(l_returnflag)::BIGINT AS g_rf,
       grouping(l_linestatus)::BIGINT AS g_ls,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY g_rf, g_ls, returnflag, linestatus
"""


def q21_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shape: per-part minimum-cost supplier via correlated
    scalar subquery — expressed Spark-side as a partition-min window
    over the (part, supplier) aggregate, the idiomatic decorrelation.

    The tie set (avg == partition min) is defined on FIXED-POINT
    integers, never a rounded double: prices quantize to exact cents
    (floor(p*100+0.5) — cent-valued doubles sit ~1e-10 from the
    integer, so floor of the identical IEEE value matches everywhere),
    and avg_scaled = sum_cents*10000 div count is exact BIGINT floor
    division (operands positive, so Spark `div` ≡ DuckDB `//`). A
    round(avg(double),2)-defined tie set would inherit the half-
    boundary instability CLAUDE.md bans from comparisons. Display
    avg_price = avg_scaled/1e6: same int → same double, no rounding."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    cents = F.floor(
        F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(cents).alias("_sum_cents"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "l_partkey",
            "l_suppkey",
            F.expr("_sum_cents * 10000L div _n").alias("_avg_scaled"),
        )
    )
    w = Window.partitionBy("l_partkey")
    best = ps.withColumn("_min", F.min("_avg_scaled").over(w)).where(
        F.col("_avg_scaled") == F.col("_min")
    )
    return (
        best.join(
            F.broadcast(part.where(F.col("p_size") < 10)),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "p_partkey",
            "s_name",
            (F.col("_avg_scaled") / F.lit(1_000_000.0)).alias("avg_price"),
        )
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH ps AS (
  -- fixed-point: exact cents, exact BIGINT floor division (mirrors
  -- the Spark side; no rounded-double tie set)
  SELECT l_partkey, l_suppkey,
         (sum(floor(l_extendedprice * 100.0 + 0.5)::BIGINT)::BIGINT
              * 10000) // count(*) AS avg_scaled
  FROM lineitem GROUP BY 1, 2),
mp AS (SELECT l_partkey, min(avg_scaled) AS min_scaled FROM ps GROUP BY 1)
SELECT p_partkey, s_name, avg_scaled / 1000000.0 AS avg_price
FROM ps JOIN mp USING (l_partkey)
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_size < 10 AND avg_scaled = min_scaled
ORDER BY p_partkey, s_name
LIMIT 100
"""


def q22_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shape: shipping volume between two nations, either
    direction, by ship year. Nation joins broadcast; the only real
    shuffles are orders⋈customer and the final 3-key aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("_ck"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("_sk"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q22_SQL = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
         year(l_shipdate)::BIGINT AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE (n2.n_name = 'NATION_1' AND n1.n_name = 'NATION_2')
     OR (n2.n_name = 'NATION_2' AND n1.n_name = 'NATION_1')) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q23_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shape: parts whose revenue (from low-key-nation
    suppliers) exceeds a global-scalar threshold — 2× the mean part
    value, which selects a stable heavy head at every SF (Q11's
    fixed-fraction cut empties out as the part count scales). The
    scalar arrives via a broadcast single-row cross join, never a
    driver collect."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    val = li.join(
        F.broadcast(supp.where(F.col("s_nationkey") < 5)),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    per_part = val.groupBy("l_partkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2
        ).alias("part_value")
    )
    total = per_part.agg(
        F.round(F.avg("part_value") * 2, 4).alias("_threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_value") > F.col("_threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
        .limit(50)
    )


Q23_SQL = """
WITH per_part AS (
  SELECT l_partkey, round(sum(l_extendedprice * l_quantity), 2) AS part_value
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey < 5
  GROUP BY l_partkey)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > (SELECT round(avg(part_value) * 2, 4) FROM per_part)
ORDER BY part_value DESC, l_partkey ASC
LIMIT 50
"""


def q24_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shape: distribution of customers by order count,
    INCLUDING zero-order customers — the left outer join + double
    aggregation pattern (count skips the nulls the outer join
    manufactures)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    co = cust.join(
        orders.where(F.col("o_orderpriority") != "1-URGENT"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_outer",
    )
    counts = co.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q24_SQL = """
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q25_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shape: discounted revenue under a 3-arm disjunction of
    conjunctive (brand, size, quantity) predicates — the pattern that
    exercises Catalyst's CNF conversion: the part-side disjuncts reach
    the part scan as pushed filters instead of running post-join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).where(
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


Q25_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 20 AND 40)
"""


def pq_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-similarity: product-quantization ANN — md5-sampled codebooks,
    shuffle-free HOF encoding, asymmetric-distance top-k. Queries =
    vec_id < 8 (as ivf_topk_sample). Fully deterministic: the oracle
    replays codebook construction, encoding argmin, and ADC sums."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 8)
    return S.pq_topk(emb, queries, k=5, m=8, ks=16, rerank=5)


def _pq_d2_sql(a: str, b: str) -> str:
    """Sequential squared-L2 between two 8-dim list slices (mirrors
    similarity._d2_sql's left-to-right fold order)."""
    return (
        f"list_sum(list_transform(generate_series(1, 8),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )


def _pq_topk_sql() -> str:
    d2_enc = _pq_d2_sql("list_slice(x.v, c.s * 8 + 1, c.s * 8 + 8)", "c.cent")
    return f"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> x::DOUBLE /
             sqrt(list_sum(list_transform(embedding,
                  y -> y::DOUBLE * y::DOUBLE)))) AS v
  FROM embeddings),
samp AS (
  SELECT row_number() OVER (ORDER BY ck, vec_id) - 1 AS code, v
  FROM (
    SELECT vec_id, v, {_MD5_INT_SQL.format(x='vec_id::VARCHAR')} AS ck
    FROM v ORDER BY ck, vec_id LIMIT 16)),
sub AS (
  SELECT s.s, samp.code, list_slice(samp.v, s.s * 8 + 1, s.s * 8 + 8) AS cent
  FROM samp, (SELECT unnest(generate_series(0, 7)) AS s) s),
enc AS (
  SELECT vec_id, s, code FROM (
    SELECT x.vec_id, c.s, c.code,
           row_number() OVER (PARTITION BY x.vec_id, c.s
                              ORDER BY {d2_enc} ASC, c.code ASC) AS rn
    FROM v x, sub c)
  WHERE rn = 1),
dt AS (
  SELECT x.vec_id AS query_id, c.s, c.code, {d2_enc} AS d2
  FROM v x, sub c WHERE x.vec_id < 8),
scored AS (
  SELECT dt.query_id, e.vec_id AS neighbor_id, round(sum(dt.d2), 6) AS approx_dist
  FROM enc e JOIN dt ON dt.s = e.s AND dt.code = e.code
  WHERE e.vec_id <> dt.query_id
  GROUP BY 1, 2),
shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY approx_dist ASC, neighbor_id ASC) AS sr
    FROM scored)
  WHERE sr <= 25),
e0 AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v0
  FROM embeddings),
exact AS (
  SELECT s.query_id, s.neighbor_id,
         round(list_cosine_similarity(qe.v0, ce.v0), 6) AS score
  FROM shortlist s
  JOIN e0 ce ON ce.vec_id = s.neighbor_id
  JOIN e0 qe ON qe.vec_id = s.query_id)
SELECT query_id, neighbor_id, score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, neighbor_id ASC) AS rank
FROM exact
QUALIFY rank <= 5
"""


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-sketch: per-type equi-depth histogram of event values — two
    partial-agg passes (percentile boundaries → HOF bucketing), never a
    per-group total sort (sketches.equi_depth_histogram)."""
    from ig_etl_sync_spark.operators.sketches import equi_depth_histogram

    ev = _t(spark, sf_dir, "events")
    return equi_depth_histogram(ev, "value", buckets=8, group_cols=["event_type"])


def _value_histogram_sql() -> str:
    from ig_etl_sync_spark.operators.sketches import equi_depth_sql

    return equi_depth_sql("value", "events", 8, ["event_type"])


def pivot_qty_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot compiled to conditional aggregates: ONE groupBy
    shuffle with map-side combine, no distinct-discovery job, no second
    pivot_first Exchange (operators/reshape.pivot_wide has the 100 TB
    story). Cells carry SQL FILTER semantics — the oracle is literally
    the FILTER form."""
    from ig_etl_sync_spark.operators.reshape import pivot_wide

    li = _t(spark, sf_dir, "lineitem")
    out = pivot_wide(
        li,
        keys=["l_linestatus"],
        pivot_col="l_returnflag",
        values=["A", "N", "R"],
        aggs={
            "qty": (F.sum, "l_quantity"),
            "n": (F.count, "l_quantity"),
        },
    )
    return out.select(
        "l_linestatus",
        *[F.round(f"qty_{v}", 2).alias(f"qty_{v}") for v in ("A", "N", "R")],
        *[F.col(f"n_{v}") for v in ("A", "N", "R")],
    )


PIVOT_SQL = """
SELECT l_linestatus,
  round(sum(l_quantity) FILTER (l_returnflag = 'A'), 2) AS qty_A,
  round(sum(l_quantity) FILTER (l_returnflag = 'N'), 2) AS qty_N,
  round(sum(l_quantity) FILTER (l_returnflag = 'R'), 2) AS qty_R,
  count(l_quantity) FILTER (l_returnflag = 'A') AS n_A,
  count(l_quantity) FILTER (l_returnflag = 'N') AS n_N,
  count(l_quantity) FILTER (l_returnflag = 'R') AS n_R
FROM lineitem
WHERE l_returnflag IN ('A', 'N', 'R')
GROUP BY l_linestatus
"""


def unpivot_flag_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long unpivot (melt) of a per-flag aggregate: narrow generator, no
    extra shuffle beyond the agg's own."""
    from ig_etl_sync_spark.operators.reshape import unpivot_long

    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 4).alias("sum_disc"),
    )
    return unpivot_long(
        wide,
        ids=["l_returnflag"],
        value_cols=["sum_qty", "sum_price", "sum_disc"],
        var_name="measure",
        value_name="amount",
    )


UNPIVOT_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         round(sum(l_quantity), 2)      AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         round(sum(l_discount), 4)      AS sum_disc
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS amount FROM wide
UNION ALL
SELECT l_returnflag, 'sum_price', sum_price FROM wide
UNION ALL
SELECT l_returnflag, 'sum_disc', sum_disc FROM wide
"""


def merkle_bucket_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle level-0: per-bucket XOR digests of a snapshot — the tiny
    frame persisted per snapshot version so a sync compares n_buckets
    rows before touching data rows (operators/merkle.py module docstring
    has the 100 TB pruning story)."""
    from ig_etl_sync_spark.functions.hashing import md5_int32
    from ig_etl_sync_spark.operators.merkle import bucket_digests, md5_row_digest

    _, snap_records = _cdc_frames(spark, sf_dir)
    snap = snap_records.select(
        "external_id", md5_int32(F.col("value_str")).alias("change_hash")
    )
    return bucket_digests(snap, 64, row_digest=md5_row_digest)


MERKLE_DIGESTS_SQL = f"""
WITH snap AS (
    SELECT event_id::VARCHAR AS external_id,
           CASE WHEN event_id % 5 = 0 THEN format('{{:.4f}}', round(value * 2, 4))
                ELSE format('{{:.4f}}', round(value, 4)) END AS value_str
    FROM events WHERE event_id % 7 <> 0
), hashed AS (
    SELECT external_id,
           {_MD5_INT_SQL.format(x='value_str')} AS change_hash
    FROM snap
)
SELECT {_MD5_INT_SQL.format(x='external_id')} % 64 AS bucket,
       bit_xor({_MD5_INT_SQL.format(x="external_id || chr(31) || change_hash::VARCHAR")}) AS digest,
       count(*) AS n
FROM hashed
GROUP BY bucket
"""


def merkle_diff_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-pruned CDC diff. The oracle is the CLASSIC full diff
    (CDC_CREATES_SQL): hash-equality here proves the bucket pruning is
    result-invariant — the correctness property that lets the pruned
    plan replace the full join at scale."""
    from ig_etl_sync_spark.operators.merkle import merkle_diff

    incoming, snap_records = _cdc_frames(spark, sf_dir)
    snapshot = snapshot_of(snap_records, prefer_cols=("value_str",))
    m = merkle_diff(incoming, snapshot, n_buckets=64, prefer_cols=("value_str",))
    return m.diff.to_create.select("external_id", "event_type", "value_str")


_TWA_START, _TWA_END = "2024-01-10 00:00:00", "2024-01-20 00:00:00"


def user_value_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's piecewise-constant value
    signal over a 10-day window: segment = event value held until the
    next event (lead), weight = µs overlap with the window
    (operators/temporal.time_weighted_avg; one window + one agg
    shuffle, both on user_id)."""
    from ig_etl_sync_spark.operators.temporal import time_weighted_avg

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = ev.select(
        "user_id", "ts", "value", F.lead("ts").over(w).alias("ts_to")
    )
    return time_weighted_avg(
        iv, ["user_id"], "value", "ts", "ts_to", _TWA_START, _TWA_END
    )


TWA_SQL = f"""
WITH iv AS (
  SELECT user_id, ts, value,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ts_to
  FROM events),
seg AS (
  SELECT user_id, value,
         least(epoch_us(coalesce(ts_to, TIMESTAMP '{_TWA_END}')),
               epoch_us(TIMESTAMP '{_TWA_END}'))
         - greatest(epoch_us(ts), epoch_us(TIMESTAMP '{_TWA_START}')) AS w
  FROM iv)
SELECT user_id,
       round(sum(value * w) / sum(w), 6) AS twa,
       sum(w)::BIGINT AS covered_us
FROM seg WHERE w > 0
GROUP BY user_id
"""


def span_dup_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span dedup (Lee et al. 2022 family): per-doc
    duplicated-span fraction over word-8 spans shared by ≥2 docs —
    operators/spans.py has the suffix-array-free distributed shape."""
    from ig_etl_sync_spark.operators.spans import span_dup_stats

    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    return span_dup_stats(docs, "doc_id", "text", k=8, min_docs=2)


def _span_sql(k: int = 8) -> str:
    sh = _shingles_sql("text", k)
    return f"""
sp AS (
  SELECT doc_id, md5(span) AS span_md5
  FROM (SELECT doc_id, unnest({sh}) AS span FROM documents)
)"""


SPAN_STATS_SQL = f"""
WITH {_span_sql(8)},
freq AS (
  SELECT span_md5
  FROM (SELECT DISTINCT span_md5, doc_id FROM sp)
  GROUP BY span_md5 HAVING count(*) >= 2),
flagged AS (
  SELECT doc_id, count(*) AS n_dup FROM sp
  WHERE span_md5 IN (SELECT span_md5 FROM freq)
  GROUP BY doc_id),
tot AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY doc_id)
SELECT t.doc_id, t.n_spans,
       coalesce(f.n_dup, 0)::BIGINT AS n_dup_spans,
       round(coalesce(f.n_dup, 0) / t.n_spans, 6) AS dup_ratio
FROM tot t LEFT JOIN flagged f USING (doc_id)
"""


def span_top_duplicated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter spans: the 20 spans shared by the most documents
    (boilerplate detector). Ranked by (n_docs, n_occ, span_md5) for a
    deterministic cross-engine order."""
    from ig_etl_sync_spark.operators.spans import doc_spans, span_frequencies

    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    freq = span_frequencies(doc_spans(docs, "doc_id", "text", 8), "doc_id")
    return (
        freq.where(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.desc("n_occ"), "span_md5")
        .limit(20)
    )


SPAN_TOP_SQL = f"""
WITH {_span_sql(8)},
freq AS (
  SELECT span_md5, count(DISTINCT doc_id) AS n_docs, count(*)::BIGINT AS n_occ
  FROM sp GROUP BY span_md5)
SELECT span_md5, n_docs, n_occ FROM freq
WHERE n_docs >= 2
ORDER BY n_docs DESC, n_occ DESC, span_md5
LIMIT 20
"""


def span_coverage_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X73: exact ExactSubstr CUT (Lee et al. 2022 §4.1,
    ``spans.span_token_coverage``): per-doc duplicated-token coverage
    as the interval union of cross-doc word-8 spans, plus the
    span-excised ``clean_text`` rebuild — the transform a dedup
    pipeline actually feeds forward, where ``span_dup_stats`` only
    scores."""
    from ig_etl_sync_spark.operators.spans import span_token_coverage

    docs = _t(spark, sf_dir, "documents")
    return span_token_coverage(docs, "doc_id", "text", k=8, min_docs=2)


def _span_starts_ctes(k: int = 8, min_docs: int = 2) -> str:
    """Shared CTE chain: tok/base (tokens + counts) and ds = the
    duplicated-span-start relation (doc_id, pos) — the DuckDB twin of
    ``spans.duplicated_span_starts``."""
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    sh = _shingles_sql("text", k)
    return f"""
tok AS MATERIALIZED (
  SELECT doc_id, {toks} AS t FROM documents),
base AS MATERIALIZED (SELECT doc_id, len(t)::BIGINT AS n_tokens FROM tok),
shl AS MATERIALIZED (SELECT doc_id, {sh} AS sh FROM documents),
sp AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(sh, 1) - 1 AS pos,
         md5(unnest(sh)) AS span_md5
  FROM shl),
dupf AS MATERIALIZED (
  SELECT span_md5 FROM (SELECT DISTINCT span_md5, doc_id FROM sp)
  GROUP BY span_md5 HAVING count(*) >= {min_docs}),
ds AS MATERIALIZED (
  SELECT sp.doc_id, sp.pos FROM sp JOIN dupf USING (span_md5))"""


def _span_coverage_sql(k: int = 8, min_docs: int = 2) -> str:
    return f"""
WITH {_span_starts_ctes(k, min_docs)},
covd AS MATERIALIZED (
  SELECT DISTINCT doc_id, idx FROM (
    SELECT ds.doc_id, unnest(range(pos, least(pos + {k}, n_tokens))) AS idx
    FROM ds JOIN base USING (doc_id))),
stats AS (
  SELECT doc_id, count(*)::BIGINT AS covered_tokens FROM covd GROUP BY doc_id),
dstart AS (
  SELECT doc_id, count(*)::BIGINT AS dup_starts FROM ds GROUP BY doc_id),
tokix AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(t, 1) - 1 AS idx, unnest(t) AS w
  FROM tok),
clean AS (
  SELECT t.doc_id, string_agg(t.w, ' ' ORDER BY t.idx) AS clean_text
  FROM tokix t ANTI JOIN covd c ON t.doc_id = c.doc_id AND t.idx = c.idx
  GROUP BY t.doc_id)
SELECT b.doc_id, b.n_tokens,
       coalesce(d.dup_starts, 0)::BIGINT AS dup_starts,
       coalesce(s.covered_tokens, 0)::BIGINT AS covered_tokens,
       (coalesce(s.covered_tokens, 0)::BIGINT * 1000000
        // b.n_tokens)::BIGINT AS dup_coverage_ppm,
       coalesce(c.clean_text, '') AS clean_text
FROM base b
LEFT JOIN stats s USING (doc_id)
LEFT JOIN dstart d USING (doc_id)
LEFT JOIN clean c USING (doc_id)
WHERE b.n_tokens > 0
"""


def span_coverage_chark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X98: char-level ExactSubstr cut (Lee et al. 2022 §4.1's actual
    unit — duplicated CHARACTER substrings): per-doc coverage and
    token-granular excision from char 16-gram duplication over the
    spaceless normalized stream (``spans.char_span_coverage``).
    Catches boilerplate that straddles word boundaries (in-word
    whitespace/punctuation variants) which the word-span cut (X73,
    ``span_coverage_clean``) provably misses."""
    from ig_etl_sync_spark.operators.spans import char_span_coverage

    docs = _t(spark, sf_dir, "documents")
    return char_span_coverage(docs, "doc_id", "text", k=16, min_docs=2)


def _span_chark_sql(k: int = 16, min_docs: int = 2) -> str:
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    return f"""
WITH ctok AS MATERIALIZED (
  SELECT doc_id, {toks} AS t FROM documents),
cbase AS MATERIALIZED (
  SELECT doc_id, array_to_string(t, '') AS cs,
         length(array_to_string(t, ''))::BIGINT AS nc,
         len(t)::BIGINT AS n_tokens
  FROM ctok),
cpos0 AS (
  SELECT doc_id, cs,
         unnest(range(1, greatest(nc - {k} + 1, 1) + 1)) AS i
  FROM cbase WHERE nc > 0),
csp AS MATERIALIZED (
  SELECT doc_id, i - 1 AS cpos, md5(substr(cs, i::INT, {k})) AS g
  FROM cpos0),
cdup AS MATERIALIZED (
  SELECT g FROM (SELECT DISTINCT g, doc_id FROM csp)
  GROUP BY g HAVING count(*) >= {min_docs}),
cds AS MATERIALIZED (
  SELECT csp.doc_id, cpos FROM csp JOIN cdup USING (g)),
isl0 AS (
  SELECT d.doc_id, cpos, least(cpos + {k}, nc)::BIGINT AS e,
         max(least(cpos + {k}, nc)) OVER (
           PARTITION BY d.doc_id ORDER BY cpos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM cds d JOIN cbase USING (doc_id)),
isl1 AS (
  SELECT doc_id, cpos, e,
         sum(CASE WHEN pmax IS NULL OR cpos > pmax THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY cpos
                 ROWS UNBOUNDED PRECEDING)::BIGINT AS iid
  FROM isl0),
islands AS MATERIALIZED (
  SELECT doc_id, min(cpos)::BIGINT AS s, max(e)::BIGINT AS e
  FROM isl1 GROUP BY doc_id, iid),
tokpos AS MATERIALIZED (
  SELECT doc_id, idx, w,
         (sum(length(w)) OVER (PARTITION BY doc_id ORDER BY idx
              ROWS UNBOUNDED PRECEDING) - length(w))::BIGINT AS ts,
         (sum(length(w)) OVER (PARTITION BY doc_id ORDER BY idx
              ROWS UNBOUNDED PRECEDING))::BIGINT AS te
  FROM (SELECT doc_id, generate_subscripts(t, 1) - 1 AS idx, unnest(t) AS w
        FROM ctok)),
ccovd AS MATERIALIZED (
  SELECT DISTINCT p.doc_id, p.idx
  FROM tokpos p JOIN islands i
    ON p.doc_id = i.doc_id AND p.ts >= i.s AND p.te <= i.e),
cstats AS (
  SELECT doc_id, count(*)::BIGINT AS covered_tokens
  FROM ccovd GROUP BY doc_id),
cstarts AS (
  SELECT doc_id, count(*)::BIGINT AS dup_starts FROM cds GROUP BY doc_id),
cclean AS (
  SELECT t.doc_id, string_agg(t.w, ' ' ORDER BY t.idx) AS clean_text
  FROM tokpos t ANTI JOIN ccovd c ON t.doc_id = c.doc_id AND t.idx = c.idx
  GROUP BY t.doc_id)
SELECT b.doc_id, b.n_tokens,
       coalesce(d.dup_starts, 0)::BIGINT AS dup_starts,
       coalesce(s.covered_tokens, 0)::BIGINT AS covered_tokens,
       (coalesce(s.covered_tokens, 0)::BIGINT * 1000000
        // b.n_tokens)::BIGINT AS dup_coverage_ppm,
       coalesce(c.clean_text, '') AS clean_text
FROM cbase b
LEFT JOIN cstats s USING (doc_id)
LEFT JOIN cstarts d USING (doc_id)
LEFT JOIN cclean c USING (doc_id)
WHERE b.n_tokens > 0
"""


def longest_dup_span_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X73 policy statistic (``spans.longest_dup_span``): each doc's
    longest duplicated substring via gaps-and-islands over the
    duplicated word-8 span starts — cut-vs-drop decisions key on run
    LENGTH, which coverage alone cannot distinguish."""
    from ig_etl_sync_spark.operators.spans import longest_dup_span

    docs = _t(spark, sf_dir, "documents")
    return longest_dup_span(docs, "doc_id", "text", k=8, min_docs=2)


def _longest_span_sql(k: int = 8, min_docs: int = 2) -> str:
    return f"""
WITH {_span_starts_ctes(k, min_docs)},
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM ds),
runs AS (
  SELECT doc_id, (max(pos) - min(pos) + {k})::BIGINT AS len
  FROM isl GROUP BY doc_id, grp),
longest AS (SELECT doc_id, max(len)::BIGINT AS l FROM runs GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens,
       least(coalesce(l, 0), b.n_tokens)::BIGINT AS longest_span_tokens
FROM base b LEFT JOIN longest USING (doc_id)
WHERE b.n_tokens > 0
"""


_SHUFFLE_SHARDS = 8


def training_shuffle_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle
    (``layout.training_shuffle_order``): seeded md5 permutation →
    (shard, pos) addresses; same seed replays byte-identically in any
    engine."""
    from ig_etl_sync_spark.operators.layout import training_shuffle_order

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return training_shuffle_order(docs, "doc_id", _SHUFFLE_SHARDS)


def _training_shuffle_sql() -> str:
    key = "doc_id::VARCHAR"
    h32 = _MD5_INT_SQL.format(x=f"'shuffle-v1:' || {key}")
    return f"""
WITH d AS (
  SELECT doc_id,
         ({h32} % {_SHUFFLE_SHARDS})::INT AS shard,
         md5('shuffle-v1:' || {key}) AS ord
  FROM documents)
SELECT doc_id, shard,
       (row_number() OVER (PARTITION BY shard ORDER BY ord, {key})
        - 1)::BIGINT AS pos
FROM d
"""


def doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X74: add-one-smoothed bigram LM cross-entropy per document
    (``textops.bigram_surprisal``) — the CCNet-style perplexity filter
    in exact floor-log2 integers; the word-order signal the unigram
    form (X53) cannot see."""
    from ig_etl_sync_spark.operators.textops import bigram_surprisal

    return bigram_surprisal(_t(spark, sf_dir, "documents"))


def _bigram_surprisal_sql() -> str:
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    return f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, {toks} AS t FROM documents),
v AS (SELECT count(DISTINCT w)::BIGINT AS vsz
      FROM (SELECT unnest(t) AS w FROM tok)),
ex AS MATERIALIZED (
  SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM tok),
c2 AS MATERIALIZED (
  SELECT w1, w2, count(*)::BIGINT AS c2 FROM ex GROUP BY w1, w2),
c1 AS MATERIALIZED (
  SELECT w1, count(*)::BIGINT AS c1 FROM ex GROUP BY w1)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       (sum(length(bin((c1.c1 + v.vsz) // (c2.c2 + 1))) - 1)::BIGINT
        * 1000000 // count(*)::BIGINT) AS bigram_surprisal_ppm
FROM ex JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
GROUP BY doc_id
"""


def doc_backoff_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X99: interpolated bigram→unigram backoff-LM cross-entropy per
    document (``textops.backoff_surprisal``, λ = 3/4) — the KenLM-shape
    smoothed n-gram gate CCNet actually runs, where X74 is add-one
    smoothing. Exact floor-log2 of the cross-multiplied rational
    mixture; no float anywhere."""
    from ig_etl_sync_spark.operators.textops import backoff_surprisal

    return backoff_surprisal(_t(spark, sf_dir, "documents"))


def _backoff_surp_ctes(lam_num: int = 3, lam_den: int = 4) -> str:
    """CTE chain ending in ``bsurp(doc_id, n_bigrams,
    backoff_surprisal_ppm)`` — the DuckDB twin of
    ``textops.backoff_surprisal``."""
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    mix = (
        f"({lam_den} * c1 * n) // "
        f"({lam_num} * c2 * n + {lam_den - lam_num} * c1 * tf)"
    )
    return f"""
btok AS MATERIALIZED (
  SELECT doc_id, {toks} AS t FROM documents),
buf AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS tf
  FROM (SELECT unnest(t) AS w FROM btok) GROUP BY w),
btot AS (SELECT sum(tf)::BIGINT AS n FROM buf),
bex AS MATERIALIZED (
  SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM btok),
bc2 AS MATERIALIZED (
  SELECT w1, w2, count(*)::BIGINT AS c2 FROM bex GROUP BY w1, w2),
bc1 AS MATERIALIZED (
  SELECT w1, count(*)::BIGINT AS c1 FROM bex GROUP BY w1),
bsurp AS MATERIALIZED (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
         (sum(length(bin({mix})) - 1)::BIGINT
          * 1000000 // count(*)::BIGINT) AS backoff_surprisal_ppm
  FROM bex JOIN bc2 USING (w1, w2) JOIN bc1 USING (w1)
       JOIN buf ON bex.w2 = buf.w CROSS JOIN btot
  GROUP BY doc_id)"""


def _backoff_surprisal_sql() -> str:
    return f"""
WITH {_backoff_surp_ctes()}
SELECT doc_id, n_bigrams, backoff_surprisal_ppm FROM bsurp
"""


def backoff_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X99 feeding X89: CCNet per-language perplexity terciles over the
    BACKOFF-LM score (``surprisal_buckets(score='backoff')``) — the
    published gate's shape end-to-end: smoothed n-gram LM → per-language
    head/middle/tail assignment by exact cross-multiplied integers."""
    from ig_etl_sync_spark.operators.textops import surprisal_buckets

    docs = _t(spark, sf_dir, "documents")
    return surprisal_buckets(docs, score="backoff")


def _backoff_buckets_sql() -> str:
    return f"""
WITH {_backoff_surp_ctes()},
bscored AS MATERIALIZED (
  SELECT d.lang, s.backoff_surprisal_ppm AS surprisal_ppm
  FROM bsurp s JOIN documents d USING (doc_id)),
bvc AS (
  SELECT lang, surprisal_ppm, count(*)::BIGINT AS vn
  FROM bscored GROUP BY lang, surprisal_ppm),
bbounds AS (
  SELECT lang, surprisal_ppm,
         CASE WHEN 3 * c <= n THEN 'head'
              WHEN 3 * c <= 2 * n THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM (
    SELECT lang, surprisal_ppm,
           sum(vn) OVER (PARTITION BY lang ORDER BY surprisal_ppm
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS c,
           sum(vn) OVER (PARTITION BY lang)::BIGINT AS n
    FROM bvc))
SELECT s.lang, b.bucket, count(*)::BIGINT AS n_docs,
       (sum(s.surprisal_ppm)::BIGINT // count(*)::BIGINT)::BIGINT
           AS mean_surprisal_ppm
FROM bscored s JOIN bbounds b USING (lang, surprisal_ppm)
GROUP BY s.lang, b.bucket
"""


#: X107's in-domain seed — a fixed source subset, so the contract is a
#: pure function of the corpus (the oracle repeats the same predicate).
_ML_SEED_SOURCES = ("src0", "src1", "src2", "src3")


def moore_lewis_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X107: Moore-Lewis contrastive data selection
    (``textops.contrastive_lm_scores``, λ = 3/4) — every document
    scored by the cross-entropy DIFFERENCE between the in-domain seed
    LM (sources src0–src3) and the general pool LM, both X99 backoff
    mixtures counted in one conditional-aggregation pass; exact
    floor-log2 integers end to end, select ascending ``ml_score_ppm``."""
    from ig_etl_sync_spark.operators.textops import contrastive_lm_scores

    docs = _t(spark, sf_dir, "documents").withColumn(
        "is_seed", F.col("source").isin(*_ML_SEED_SOURCES)
    )
    return contrastive_lm_scores(docs)


def _moore_lewis_sql(lam_num: int = 3, lam_den: int = 4) -> str:
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    seeds = ", ".join(f"'{s}'" for s in _ML_SEED_SOURCES)
    ln, ld, lr = lam_num, lam_den, lam_den - lam_num

    def bits(c1: str, c2: str, tf: str, n: str) -> str:
        d = f"({n} + v)"
        mix = (
            f"({ld} * {c1} * {d}) // "
            f"({ln} * {c2} * {d} + {lr} * {c1} * ({tf} + 1))"
        )
        return (
            f"(length(bin(CASE WHEN {c1} > 0 THEN {mix}"
            f" ELSE {d} // ({tf} + 1) END)) - 1)::BIGINT"
        )

    return f"""
WITH mlt AS MATERIALIZED (
  SELECT doc_id, (source IN ({seeds})) AS sd, {toks} AS t
  FROM documents),
mlu AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS tfg,
         (count(*) FILTER (WHERE sd))::BIGINT AS tfi
  FROM (SELECT sd, unnest(t) AS w FROM mlt) GROUP BY w),
mltot AS (
  SELECT sum(tfg)::BIGINT AS ng, sum(tfi)::BIGINT AS ni,
         count(*)::BIGINT AS v
  FROM mlu),
mlex AS MATERIALIZED (
  SELECT doc_id, sd, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM mlt),
mlc2 AS MATERIALIZED (
  SELECT w1, w2, count(*)::BIGINT AS c2g,
         (count(*) FILTER (WHERE sd))::BIGINT AS c2i
  FROM mlex GROUP BY w1, w2),
mlc1 AS MATERIALIZED (
  SELECT w1, count(*)::BIGINT AS c1g,
         (count(*) FILTER (WHERE sd))::BIGINT AS c1i
  FROM mlex GROUP BY w1)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       (sum(bi)::BIGINT * 1000000 // count(*)::BIGINT)
           AS seed_surprisal_ppm,
       (sum(bp)::BIGINT * 1000000 // count(*)::BIGINT)
           AS pool_surprisal_ppm,
       ((sum(bi)::BIGINT * 1000000 // count(*)::BIGINT)
        - (sum(bp)::BIGINT * 1000000 // count(*)::BIGINT))
           AS ml_score_ppm
FROM (
  SELECT doc_id,
         {bits("c1i", "c2i", "tfi", "ni")} AS bi,
         {bits("c1g", "c2g", "tfg", "ng")} AS bp
  FROM mlex JOIN mlc2 USING (w1, w2) JOIN mlc1 USING (w1)
       JOIN mlu ON mlex.w2 = mlu.w CROSS JOIN mltot)
GROUP BY doc_id
"""


def curriculum_anneal_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X110: quality-annealed curriculum ordering
    (``layout.curriculum_order``) — deterministic (shard, pos)
    addresses where every shard replays the same perplexity-tercile
    progression (tail=0 → middle=1 → head=2: worst data first,
    most-fluent last), seeded md5 shuffle within each phase."""
    from ig_etl_sync_spark.operators.layout import curriculum_order
    from ig_etl_sync_spark.operators.textops import (
        surprisal_bucket_assignments,
    )

    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")
    phases = surprisal_bucket_assignments(docs).select(
        "doc_id",
        F.when(F.col("bucket") == "tail", 0)
        .when(F.col("bucket") == "middle", 1)
        .otherwise(2)
        .alias("phase"),
    )
    base = (
        docs.select("doc_id")
        .join(phases, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("phase"), F.lit(0)).cast("long").alias("phase"),
        )
    )
    return curriculum_order(base, "doc_id", _SHUFFLE_SHARDS, "phase").select(
        "doc_id", "shard", "pos", "phase"
    )


def _curriculum_sql() -> str:
    ntoks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    key = "doc_id::VARCHAR"
    h32 = _MD5_INT_SQL.format(x=f"'curriculum-v1:' || {key}")
    return f"""
WITH csx AS MATERIALIZED (
  SELECT doc_id, unnest({ntoks}) AS term FROM documents),
cstf AS MATERIALIZED (
  SELECT term, count(*)::BIGINT AS tf FROM csx GROUP BY term),
cstot AS (SELECT sum(tf)::BIGINT AS n FROM cstf),
csurp AS MATERIALIZED (
  SELECT doc_id,
         (sum(length(bin(n // tf)) - 1)::BIGINT * 1000000
          // count(*)::BIGINT) AS surprisal_ppm
  FROM csx JOIN cstf USING (term), cstot
  GROUP BY doc_id),
cscored AS MATERIALIZED (
  SELECT s.doc_id, d.lang, s.surprisal_ppm
  FROM csurp s JOIN documents d USING (doc_id)),
cvc AS (
  SELECT lang, surprisal_ppm, count(*)::BIGINT AS vn
  FROM cscored GROUP BY lang, surprisal_ppm),
cbounds AS (
  SELECT lang, surprisal_ppm,
         CASE WHEN 3 * c <= n THEN 'head'
              WHEN 3 * c <= 2 * n THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM (
    SELECT lang, surprisal_ppm,
           sum(vn) OVER (PARTITION BY lang ORDER BY surprisal_ppm
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS c,
           sum(vn) OVER (PARTITION BY lang)::BIGINT AS n
    FROM cvc)),
cph AS MATERIALIZED (
  SELECT d.doc_id,
         coalesce(CASE b.bucket WHEN 'tail' THEN 0 WHEN 'middle' THEN 1
                  WHEN 'head' THEN 2 END, 0)::BIGINT AS phase
  FROM documents d
  LEFT JOIN cscored s ON s.doc_id = d.doc_id
  LEFT JOIN cbounds b
    ON b.lang = s.lang AND b.surprisal_ppm = s.surprisal_ppm),
cd AS (
  SELECT doc_id, phase,
         ({h32} % {_SHUFFLE_SHARDS})::INT AS shard,
         md5('curriculum-v1:' || {key}) AS ord
  FROM cph)
SELECT doc_id, shard,
       (row_number() OVER (PARTITION BY shard
                           ORDER BY phase, ord, {key}) - 1)::BIGINT AS pos,
       phase
FROM cd
"""


def doremi_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X109: DoReMi-shaped domain reweighting
    (``dataprep.doremi_domain_weights``) — per-source mixture weights
    from excess loss (whole-corpus backoff LM vs each domain's own
    specialist LM), exponentiated-gradient update as an exact base-2
    bit shift, uniform smoothing at 200000 ppm. Every number BIGINT."""
    from ig_etl_sync_spark.operators.dataprep import doremi_domain_weights

    return doremi_domain_weights(_t(spark, sf_dir, "documents"))


def _doremi_sql(
    lam_num: int = 3,
    lam_den: int = 4,
    eta_num: int = 1,
    eta_den: int = 1,
    smooth_ppm: int = 200_000,
) -> str:
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    ln, ld, lr = lam_num, lam_den, lam_den - lam_num

    def bits(c1: str, c2: str, tf: str, n: str) -> str:
        d = f"({n} + v)"
        mix = (
            f"({ld} * {c1} * {d}) // "
            f"({ln} * {c2} * {d} + {lr} * {c1} * ({tf} + 1))"
        )
        return (
            f"(length(bin(CASE WHEN {c1} > 0 THEN {mix}"
            f" ELSE {d} // ({tf} + 1) END)) - 1)::BIGINT"
        )

    eta_sc = eta_den * 1_000_000
    return f"""
WITH drt AS MATERIALIZED (
  SELECT source AS g, {toks} AS t FROM documents),
dru AS MATERIALIZED (
  SELECT g, unnest(t) AS w FROM drt),
drtfa AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS tfg FROM dru GROUP BY w),
drtfd AS MATERIALIZED (
  SELECT g, w, count(*)::BIGINT AS tfd FROM dru GROUP BY g, w),
drtot AS (SELECT sum(tfg)::BIGINT AS ng, count(*)::BIGINT AS v FROM drtfa),
drnd AS (SELECT g, count(*)::BIGINT AS nd FROM dru GROUP BY g),
drex AS MATERIALIZED (
  SELECT g, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM drt),
drc2a AS MATERIALIZED (
  SELECT w1, w2, count(*)::BIGINT AS c2g FROM drex GROUP BY w1, w2),
drc1a AS MATERIALIZED (
  SELECT w1, count(*)::BIGINT AS c1g FROM drex GROUP BY w1),
drc2d AS MATERIALIZED (
  SELECT g, w1, w2, count(*)::BIGINT AS c2d FROM drex GROUP BY g, w1, w2),
drc1d AS MATERIALIZED (
  SELECT g, w1, count(*)::BIGINT AS c1d FROM drex GROUP BY g, w1),
drsc AS MATERIALIZED (
  SELECT e.g AS g,
         {bits("a1.c1g", "a2.c2g", "ta.tfg", "tt.ng")} AS bs,
         {bits("d1.c1d", "d2.c2d", "td.tfd", "dn.nd")} AS bo
  FROM drex e
  JOIN drc2a a2 ON e.w1 = a2.w1 AND e.w2 = a2.w2
  JOIN drc1a a1 ON e.w1 = a1.w1
  JOIN drtfa ta ON e.w2 = ta.w
  JOIN drc2d d2 ON e.g = d2.g AND e.w1 = d2.w1 AND e.w2 = d2.w2
  JOIN drc1d d1 ON e.g = d1.g AND e.w1 = d1.w1
  JOIN drtfd td ON e.g = td.g AND e.w2 = td.w
  JOIN drnd dn ON e.g = dn.g
  CROSS JOIN drtot tt),
drpd AS MATERIALIZED (
  SELECT g, count(*)::BIGINT AS nb,
         (sum(bs)::BIGINT * 1000000 // count(*)::BIGINT) AS ls,
         (sum(bo)::BIGINT * 1000000 // count(*)::BIGINT) AS lo
  FROM drsc GROUP BY g),
drupd AS (
  SELECT g, nb, ls, lo,
         greatest(0::BIGINT, ls - lo)::BIGINT AS exc,
         ({eta_num} * greatest(0::BIGINT, ls - lo) // {eta_sc})::BIGINT
             AS sh
  FROM drpd),
drmx AS (
  SELECT max(sh)::BIGINT AS mx, count(*)::BIGINT AS gc FROM drupd),
drraw AS (
  SELECT g, nb, ls, lo, exc, sh, gc,
         (1000000000::BIGINT >> least(mx - sh, 62))::BIGINT AS raw
  FROM drupd, drmx),
drs AS (SELECT sum(raw)::BIGINT AS s FROM drraw)
SELECT g AS source, nb AS n_bigrams, ls AS shared_surprisal_ppm,
       lo AS own_surprisal_ppm, exc AS excess_ppm, sh AS shift_bits,
       ((({1_000_000 - smooth_ppm} * (raw * 1000000 // s))
         + {smooth_ppm} * (1000000 // gc)) // 1000000)::BIGINT
           AS weight_ppm
FROM drraw, drs
"""


#: X108's cascade, in pipeline order: dedup -> language -> structure -> LM.
_FUNNEL_RULES = ("near_dup", "lang_mismatch", "c4_drop", "lm_tail")


def quality_filter_funnel_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X108: gate-cascade attribution (``profiling.quality_filter_funnel``)
    — four production rules (minhash near-dup non-canonical, lang-ID
    mismatch, C4 doc drop, unigram-perplexity tercile tail) composed
    into one funnel: per rule, flagged / unique / order-dependent
    marginal doc counts, flagged token mass, and the surviving-corpus
    size after each step. All counts exact BIGINT; the oracle nests
    each rule's existing replay chain as a subquery."""
    from ig_etl_sync_spark.operators.clustering import resolve_dup_clusters
    from ig_etl_sync_spark.operators.profiling import quality_filter_funnel
    from ig_etl_sync_spark.operators.textops import (
        c4_line_filters,
        surprisal_bucket_assignments,
        token_count,
    )

    docs = _spread(_t(spark, sf_dir, "documents"), "doc_id")

    def _nd():
        pairs = D.near_dup_pairs_minhash(docs, threshold=0.7).select(
            "id_a", "id_b"
        )
        return (
            resolve_dup_clusters(pairs)
            .where(~F.col("keep"))
            .select("doc_id", F.lit(True).alias("near_dup"))
        )

    def _tail():
        return surprisal_bucket_assignments(docs).select(
            "doc_id", (F.col("bucket") == "tail").alias("lm_tail")
        )

    # the near-dup chain (pins + CC-loop jobs) and the surprisal
    # tercile chain (pinned score relation) both execute at
    # construction — overlap them (guide §2.6, _parallel_build); the
    # lang-id and C4 rules are lazy projections and need no thread
    nd, tail = _parallel_build(_nd, _tail)
    lid = docs.select(
        "doc_id", (T.lang_id("text") != F.col("lang")).alias("lang_mismatch")
    )
    shaped = docs.select(
        "doc_id",
        F.regexp_replace(F.col("text"), _C4_SHAPE_PAT, "$1.\n$3\n").alias(
            "text"
        ),
    )
    c4 = c4_line_filters(shaped).select(
        "doc_id", (~F.col("keep")).alias("c4_drop")
    )
    flags = (
        docs.select(
            "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
        )
        .join(nd, "doc_id", "left")
        .join(lid, "doc_id", "left")
        .join(c4, "doc_id", "left")
        .join(tail, "doc_id", "left")
    )
    return quality_filter_funnel(
        flags, list(_FUNNEL_RULES), weight_col="n_tokens"
    )


def _quality_funnel_sql() -> str:
    toks = _TOKENS_SQL.format(x="text")
    ntoks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    rule_aggs = " UNION ALL ".join(
        f"""
  SELECT {i + 1}::BIGINT AS ord, '{r}' AS rule,
         sum(f{i + 1}::BIGINT)::BIGINT AS n_flagged,
         sum((f{i + 1} AND nf = 1)::BIGINT)::BIGINT AS n_unique,
         sum((fo = {i + 1})::BIGINT)::BIGINT AS n_marginal,
         sum(CASE WHEN f{i + 1} THEN w ELSE 0 END)::BIGINT
             AS n_tokens_flagged
  FROM fpd"""
        for i, r in enumerate(_FUNNEL_RULES)
    )
    return f"""
WITH fnd AS MATERIALIZED (
  SELECT doc_id FROM ({_near_dup_clusters_sql()}) WHERE NOT keep),
flid AS MATERIALIZED (
  SELECT doc_id, lang_pred FROM ({_lang_id_sql()})),
fc4 AS MATERIALIZED (
  SELECT doc_id, keep FROM ({_c4_sql()})),
fsx AS MATERIALIZED (
  SELECT doc_id, unnest({ntoks}) AS term FROM documents),
fstf AS MATERIALIZED (
  SELECT term, count(*)::BIGINT AS tf FROM fsx GROUP BY term),
fstot AS (SELECT sum(tf)::BIGINT AS n FROM fstf),
fsurp AS MATERIALIZED (
  SELECT doc_id,
         (sum(length(bin(n // tf)) - 1)::BIGINT * 1000000
          // count(*)::BIGINT) AS surprisal_ppm
  FROM fsx JOIN fstf USING (term), fstot
  GROUP BY doc_id),
fscored AS MATERIALIZED (
  SELECT s.doc_id, d.lang, s.surprisal_ppm
  FROM fsurp s JOIN documents d USING (doc_id)),
fvc AS (
  SELECT lang, surprisal_ppm, count(*)::BIGINT AS vn
  FROM fscored GROUP BY lang, surprisal_ppm),
fbounds AS (
  SELECT lang, surprisal_ppm,
         CASE WHEN 3 * c <= n THEN 'head'
              WHEN 3 * c <= 2 * n THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM (
    SELECT lang, surprisal_ppm,
           sum(vn) OVER (PARTITION BY lang ORDER BY surprisal_ppm
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS c,
           sum(vn) OVER (PARTITION BY lang)::BIGINT AS n
    FROM fvc)),
ftail AS MATERIALIZED (
  SELECT s.doc_id, b.bucket
  FROM fscored s JOIN fbounds b USING (lang, surprisal_ppm)),
fflags AS MATERIALIZED (
  SELECT d.doc_id,
         len({toks})::BIGINT AS w,
         (fnd.doc_id IS NOT NULL) AS f1,
         coalesce(l.lang_pred <> d.lang, FALSE) AS f2,
         coalesce(NOT c.keep, FALSE) AS f3,
         coalesce(t.bucket = 'tail', FALSE) AS f4
  FROM documents d
  LEFT JOIN fnd ON fnd.doc_id = d.doc_id
  LEFT JOIN flid l ON l.doc_id = d.doc_id
  LEFT JOIN fc4 c ON c.doc_id = d.doc_id
  LEFT JOIN ftail t ON t.doc_id = d.doc_id),
ftot AS (SELECT count(*)::BIGINT AS total FROM fflags),
fpd AS MATERIALIZED (
  SELECT w, f1, f2, f3, f4,
         (f1::INT + f2::INT + f3::INT + f4::INT) AS nf,
         CASE WHEN f1 THEN 1 WHEN f2 THEN 2 WHEN f3 THEN 3
              WHEN f4 THEN 4 ELSE 0 END AS fo
  FROM fflags),
fpr AS ({rule_aggs})
SELECT ord, rule, n_flagged, n_unique, n_marginal, n_tokens_flagged,
       (ftot.total
        - sum(n_marginal) OVER (ORDER BY ord
                                ROWS UNBOUNDED PRECEDING))::BIGINT
           AS n_remaining_after
FROM fpr, ftot
"""


def streaming_lm_gate_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X100 end-to-end: a TWO-batch :class:`StreamingLMQualityGate`
    lifecycle — standing unigram/bigram count tables extended per
    batch, each batch scored SELF-INCLUSIVELY under the X99 backoff
    mixture over counts-so-far, scores appended epoch-keyed. Batch 1 =
    every non-src0 document, batch 2 = src0. The oracle replays batch
    1's scores against batch 1's counts and batch 2's against the
    union's counts — certifying the incremental standing-model path
    reproduces the whole-population recompute at each step (the LM
    twin of ``streaming_span_cut_corpus``)."""
    import atexit
    import shutil
    import tempfile

    from ig_etl_sync_spark.sources.versioned import make_table
    from ig_etl_sync_spark.streaming.lm_gate import StreamingLMQualityGate

    root = tempfile.mkdtemp(prefix="spark_graft_lmgate_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents")
    b1 = docs.where(F.col("source") != _SPAN_PROBE_SRC).select(
        "doc_id", "text"
    )
    b2 = docs.where(F.col("source") == _SPAN_PROBE_SRC).select(
        "doc_id", "text"
    )
    gate = StreamingLMQualityGate(
        make_table(spark, f"{root}/uni", "txnlog"),
        make_table(spark, f"{root}/bi", "txnlog"),
        make_table(spark, f"{root}/scores", "txnlog"),
    )
    gate.process_batch(b1, 0)
    gate.process_batch(b2, 1)
    return gate.scores.read().select("doc_id", "n_bigrams", "surprisal_ppm")


def streaming_mixture_gate_corpus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X105 end-to-end: a TWO-batch
    :class:`~ig_etl_sync_spark.streaming.mixture_gate.
    StreamingMixtureGate` lifecycle — standing admitted-token state,
    per-batch X52-rule quota decisions, seeded-md5 admission order.
    Batch 1 = non-src0 docs, batch 2 = src0. The oracle unrolls both
    batch decisions (batch 1 from zero state, batch 2 from batch 1's
    admitted counts) — certifying the incremental gate reproduces the
    whole-population replay at each step."""
    import atexit
    import shutil
    import tempfile

    from ig_etl_sync_spark.sources.versioned import make_table
    from ig_etl_sync_spark.streaming.mixture_gate import StreamingMixtureGate

    root = tempfile.mkdtemp(prefix="spark_graft_mixgate_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents")
    b1 = docs.where(F.col("source") != _SPAN_PROBE_SRC).select(
        "doc_id", "lang", "text"
    )
    b2 = docs.where(F.col("source") == _SPAN_PROBE_SRC).select(
        "doc_id", "lang", "text"
    )
    gate = StreamingMixtureGate(
        make_table(spark, f"{root}/counts", "txnlog"),
        make_table(spark, f"{root}/corpus", "txnlog"),
        target_ppm=_MIXTURE_PPM,
    )
    gate.process_batch(b1, 0)
    gate.process_batch(b2, 1)
    return gate.corpus.read().select(
        "doc_id",
        "lang",
        "n_tokens",
        F.col("mepoch").cast("int").alias("mepoch"),
    )


def _mixture_gate_sql() -> str:
    toks = _TOKENS_SQL.format(x="text")
    vals = ", ".join(
        f"('{k}', {v})" for k, v in sorted(_MIXTURE_PPM.items())
    )
    draw = _MD5_INT_SQL.format(x="'mix:' || doc_id::VARCHAR")

    def batch(n: int, src_pred: str, prior_cte: str | None) -> str:
        a_join = (
            f"LEFT JOIN {prior_cte} p USING (lang)" if prior_cte else ""
        )
        a_val = "coalesce(p._A, 0)" if prior_cte else "0"
        return f"""
b{n} AS MATERIALIZED (
  SELECT d.doc_id, d.lang, len({toks})::BIGINT AS _nt,
         {draw} % 1000000 AS _h
  FROM documents d JOIN targets USING (lang)
  WHERE {src_pred}),
g{n} AS (
  SELECT t.lang, t._w, {a_val}::BIGINT AS _A,
         coalesce(bb._B, 0)::BIGINT AS _B
  FROM (SELECT lang, _w FROM targets) t
  {a_join}
  LEFT JOIN (SELECT lang, sum(_nt)::BIGINT AS _B FROM b{n} GROUP BY lang)
       bb USING (lang)),
t{n} AS (SELECT min((_A + _B) * 1000000 // _w)::BIGINT AS _T
         FROM g{n} WHERE _A + _B > 0),
al{n} AS (
  SELECT lang, greatest(0, _T * _w // 1000000 - _A)::BIGINT AS _allow
  FROM g{n}, t{n}),
adm{n} AS MATERIALIZED (
  SELECT doc_id, lang, _nt AS n_tokens, {n} AS mepoch FROM (
    SELECT b.*, al._allow,
           sum(_nt) OVER (PARTITION BY b.lang ORDER BY _h, doc_id
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS _cum
    FROM b{n} b JOIN al{n} al USING (lang))
  WHERE _cum <= _allow)"""

    b1 = batch(1, "d.source <> 'src0'", None)
    prior = (
        "pr AS (SELECT lang, sum(n_tokens)::BIGINT AS _A "
        "FROM adm1 GROUP BY lang)"
    )
    b2 = batch(2, "d.source = 'src0'", "pr")
    return f"""
WITH targets(lang, _w) AS (VALUES {vals}),{b1},
{prior},{b2}
SELECT doc_id, lang, n_tokens, mepoch::INT AS mepoch FROM adm1
UNION ALL
SELECT doc_id, lang, n_tokens, mepoch::INT AS mepoch FROM adm2
"""


def _lm_gate_pop_sql(prefix: str, pop_where: str, model_where: str) -> str:
    """One population's replay: docs matching ``pop_where`` scored
    under the backoff mixture whose counts come from ``model_where``
    (the standing-model state at that batch's ingest)."""
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    p = prefix
    mix = "(4 * c1 * n) // (3 * c2 * n + 1 * c1 * tf)"
    return f"""
{p}tok AS MATERIALIZED (
  SELECT doc_id, {toks} AS t FROM documents WHERE {model_where}),
{p}uf AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS tf
  FROM (SELECT unnest(t) AS w FROM {p}tok) GROUP BY w),
{p}tot AS ({p}tot_body),
{p}bex AS MATERIALIZED (
  SELECT doc_id, unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
  FROM {p}tok),
{p}c2 AS MATERIALIZED (
  SELECT w1, w2, count(*)::BIGINT AS c2 FROM {p}bex GROUP BY w1, w2),
{p}c1 AS MATERIALIZED (
  SELECT w1, sum(c2)::BIGINT AS c1 FROM {p}c2 GROUP BY w1),
{p}sc AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
         (sum(length(bin({mix})) - 1)::BIGINT
          * 1000000 // count(*)::BIGINT) AS surprisal_ppm
  FROM {p}bex JOIN {p}c2 USING (w1, w2) JOIN {p}c1 USING (w1)
       JOIN {p}uf ON {p}bex.w2 = {p}uf.w CROSS JOIN {p}tot
  WHERE doc_id IN (SELECT doc_id FROM documents WHERE {pop_where})
  GROUP BY doc_id)""".replace(
        f"{p}tot_body", f"SELECT sum(tf)::BIGINT AS n FROM {p}uf"
    )


def _lm_gate_sql() -> str:
    p1 = _lm_gate_pop_sql(
        "g1", f"source <> '{_SPAN_PROBE_SRC}'", f"source <> '{_SPAN_PROBE_SRC}'"
    )
    p2 = _lm_gate_pop_sql("g2", f"source = '{_SPAN_PROBE_SRC}'", "TRUE")
    return f"""
WITH {p1},
{p2}
SELECT doc_id, n_bigrams, surprisal_ppm FROM g1sc
UNION ALL
SELECT doc_id, n_bigrams, surprisal_ppm FROM g2sc
"""


# 2^16 bits ≈ 8 KiB: ~20 bits/key at sf0.01's ~3k urgent orders
# (fp ≈ 0.1%); the words query scales as bits/32 rows regardless of SF.
_BLOOM_BITS, _BLOOM_HASHES = 1 << 16, 3


def bloom_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter of urgent-order customer keys, rebuilt bit-for-bit
    by the DuckDB oracle (md5 double hashing, 32-bit words — see
    operators/bloom.py for the broadcast-prefilter scale story)."""
    from ig_etl_sync_spark.operators.bloom import bloom_build

    urgent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return bloom_build(
        urgent.select("o_custkey"), "o_custkey", _BLOOM_BITS, _BLOOM_HASHES
    )


def _bloom_pos_sql(key_sql: str, n_bits: int) -> str:
    # h1/h2 = md5 bits [0,32) and [32,64)|1 — ONE digest per key,
    # mirroring bloom._h1h2
    h1 = f"('0x' || substr(md5({key_sql}), 1, 8))::BIGINT"
    h2 = f"(('0x' || substr(md5({key_sql}), 9, 8))::BIGINT | 1)"
    return f"(({h1} + i * {h2}) % {n_bits})"


BLOOM_WORDS_SQL = f"""
WITH pos AS (
  SELECT {_bloom_pos_sql("o_custkey::VARCHAR", _BLOOM_BITS)} AS p
  FROM orders, generate_series(0, {_BLOOM_HASHES - 1}) AS t(i)
  WHERE o_orderpriority = '1-URGENT')
SELECT p // 32 AS word_idx,
       bit_or(1::BIGINT << (p % 32)::INT) AS word
FROM pos GROUP BY word_idx
"""


def bloom_prefilter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe every lineitem order key against the bloom of urgent
    orders: n_pass (bloom survivors), n_true (exact members), n_missed
    (members the bloom rejected — MUST be 0: the no-false-negative
    guarantee, checked by the oracle on both engines)."""
    from ig_etl_sync_spark.operators.bloom import bloom_build, bloom_probe_frame, collect_words

    urgent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    words = collect_words(
        bloom_build(urgent.select("o_orderkey"), "o_orderkey", _BLOOM_BITS, _BLOOM_HASHES),
        _BLOOM_BITS,
    )
    li = _t(spark, sf_dir, "lineitem")
    member = urgent.select("o_orderkey").distinct().withColumn("_m", F.lit(1))
    probed = bloom_probe_frame(
        li.select("l_orderkey"), "l_orderkey", words, _BLOOM_BITS, _BLOOM_HASHES
    ).join(F.broadcast(member), li.l_orderkey == member.o_orderkey, "left")
    return probed.agg(
        F.sum(F.when(F.col("_pass"), 1).otherwise(0)).cast("bigint").alias("n_pass"),
        F.sum(F.when(F.col("_m").isNotNull(), 1).otherwise(0)).cast("bigint").alias("n_true"),
        F.sum(
            F.when(F.col("_m").isNotNull() & ~F.col("_pass"), 1).otherwise(0)
        ).cast("bigint").alias("n_missed"),
    )


BLOOM_STATS_SQL = f"""
WITH pos AS (
  SELECT {_bloom_pos_sql("o_orderkey::VARCHAR", _BLOOM_BITS)} AS p
  FROM orders, generate_series(0, {_BLOOM_HASHES - 1}) AS t(i)
  WHERE o_orderpriority = '1-URGENT'),
words AS (
  SELECT p // 32 AS word_idx, bit_or(1::BIGINT << (p % 32)::INT) AS word
  FROM pos GROUP BY word_idx),
dense AS (
  SELECT g.i AS word_idx, coalesce(w.word, 0) AS word
  FROM generate_series(0, {_BLOOM_BITS // 32 - 1}) AS g(i)
  LEFT JOIN words w ON w.word_idx = g.i),
warr AS (SELECT list(word ORDER BY word_idx) AS a FROM dense),
probed AS (
  SELECT
    ((SELECT a FROM warr)[({_bloom_pos_sql("l_orderkey::VARCHAR", _BLOOM_BITS).replace("i *", "0 *")} // 32) + 1]
       >> ({_bloom_pos_sql("l_orderkey::VARCHAR", _BLOOM_BITS).replace("i *", "0 *")} % 32)::INT) & 1 = 1
    AND ((SELECT a FROM warr)[({_bloom_pos_sql("l_orderkey::VARCHAR", _BLOOM_BITS).replace("i *", "1 *")} // 32) + 1]
       >> ({_bloom_pos_sql("l_orderkey::VARCHAR", _BLOOM_BITS).replace("i *", "1 *")} % 32)::INT) & 1 = 1
    AND ((SELECT a FROM warr)[({_bloom_pos_sql("l_orderkey::VARCHAR", _BLOOM_BITS).replace("i *", "2 *")} // 32) + 1]
       >> ({_bloom_pos_sql("l_orderkey::VARCHAR", _BLOOM_BITS).replace("i *", "2 *")} % 32)::INT) & 1 = 1
    AS pass,
    l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
    AS member
  FROM lineitem)
SELECT count(*) FILTER (pass) AS n_pass,
       count(*) FILTER (member) AS n_true,
       count(*) FILTER (member AND NOT pass) AS n_missed
FROM probed
"""


def incremental_orders_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained aggregate: base agg (orders with key %13
    != 0) folded with creates (%13 == 0) and deletes (%17 == 0 of the
    base) WITHOUT rescanning base rows — operators/incremental.py. The
    oracle is the from-scratch recompute over the surviving rows: hash
    equality proves maintenance ≡ recompute. Money kept in integer
    cents so the maintained sum is bit-equal (no float drift)."""
    from ig_etl_sync_spark.operators.incremental import (
        apply_delta,
        delta_summary,
        summarize,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    base_rows = orders.where(F.col("o_orderkey") % 13 != 0)
    plus = orders.where(F.col("o_orderkey") % 13 == 0)
    minus = base_rows.where(F.col("o_orderkey") % 17 == 0)

    keys = ["o_orderpriority"]
    sums = {"total_cents": "cents"}
    base = summarize(base_rows, keys, sums)
    return apply_delta(base, delta_summary(plus, minus, keys, sums), keys)


INCREMENTAL_SQL = """
SELECT o_orderpriority,
       sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS total_cents,
       count(*) AS n_rows
FROM orders
WHERE o_orderkey % 13 = 0
   OR (o_orderkey % 13 <> 0 AND o_orderkey % 17 <> 0)
GROUP BY o_orderpriority
"""


def _zvalue_sql(a: str, b: str, bits: int) -> str:
    """DuckDB replay of layout.zvalue: identical shift/mask/or chain."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"(((({a} & {mask}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b} & {mask}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


_ZORDER_BITS = 8
_ZORDER_BUCKET_BITS = 6


def zorder_bucket_stats_li(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout skipping stats over lineitem
    (l_partkey × l_suppkey): bucket = top 6 bits of the min/max-scaled
    z-value = the file boundaries a repartitionByRange(64, z) writer
    would produce; per-bucket min/max of BOTH dims shows the two-sided
    pruning bound."""
    from ig_etl_sync_spark.operators.layout import zorder_bucket_stats

    li = _t(spark, sf_dir, "lineitem")
    return zorder_bucket_stats(
        li,
        "l_partkey",
        "l_suppkey",
        bucket_bits=_ZORDER_BUCKET_BITS,
        bits=_ZORDER_BITS,
    )


def _zorder_stats_sql() -> str:
    m = 1 << _ZORDER_BITS
    sa = f"floor((l_partkey - mna) * {m} / (mxa - mna + 1))::BIGINT"
    sb = f"floor((l_suppkey - mnb) * {m} / (mxb - mnb + 1))::BIGINT"
    z = _zvalue_sql(f"({sa})", f"({sb})", _ZORDER_BITS)
    shift = 2 * _ZORDER_BITS - _ZORDER_BUCKET_BITS
    return f"""
WITH stats AS (
  SELECT min(l_partkey) AS mna, max(l_partkey) AS mxa,
         min(l_suppkey) AS mnb, max(l_suppkey) AS mxb
  FROM lineitem)
SELECT ({z} >> {shift}) AS bucket,
       count(*) AS n_rows,
       min(l_partkey) AS min_l_partkey,
       max(l_partkey) AS max_l_partkey,
       min(l_suppkey) AS min_l_suppkey,
       max(l_suppkey) AS max_l_suppkey
FROM lineitem CROSS JOIN stats
GROUP BY bucket
"""


_PR_ITERS = 3
_PR_DAMPING = 0.85


def pagerank_cust_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the (customer ↔ supplier) trade
    graph derived from orders ⋈ lineitem, symmetrized so the bipartite
    graph has no dangling nodes. Decimal-sum determinism scheme —
    every digit DuckDB-replayable (see operators/graph_algos.py)."""
    from ig_etl_sync_spark.operators.graph_algos import pagerank

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # Round 8: the loop runs on BIGINT node ids (customer 2k, supplier
    # 2k+1 — a bijection, so the graph is isomorphic and every rank is
    # bit-identical) and the output maps back to the oracled "c:"/"s:"
    # strings in one final projection. String keys paid regex-free but
    # measurably slower hashing/compare in the 4 key-clustered
    # exchanges (edge distinct, degree agg, per-iteration contrib agg);
    # disjoint_symmetry halves the edge-dedup shuffle (the c/s
    # namespaces can never collide).
    edges = orders.join(
        li, orders.o_orderkey == li.l_orderkey
    ).select(
        (F.col("o_custkey").cast("long") * 2).alias("src"),
        (F.col("l_suppkey").cast("long") * 2 + 1).alias("dst"),
    )
    pr = pagerank(
        edges,
        damping=_PR_DAMPING,
        iters=_PR_ITERS,
        undirected=True,
        disjoint_symmetry=True,
    )
    return pr.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c:"), F.expr("node div 2").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("s:"), F.expr("(node - 1) div 2").cast("string"))
        )
        .alias("node"),
        "rank",
    )


def _pagerank_sql() -> str:
    """Unrolled-CTE replay of the fixed iteration count in the SAME
    fixed-point integer arithmetic as the operator: BIGINT ranks
    scaled by 10^12, floor divisions (``//``, which for the
    non-negative quantities here equals Spark's ``div``), exact
    integer neighbor sums — no float op until the output division of
    identical integers."""
    d_num = round(_PR_DAMPING * 100)
    scale = 10**12
    ctes = [
        """raw AS (
  SELECT DISTINCT 'c:' || o_custkey::VARCHAR AS src,
                  's:' || l_suppkey::VARCHAR AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""",
        "e AS (SELECT src, dst FROM raw UNION SELECT dst, src FROM raw)",
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        """nodes AS (SELECT DISTINCT node FROM
  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e))""",
        "nn AS (SELECT count(*)::BIGINT AS n FROM nodes)",
        f"r0 AS (SELECT node, ({scale} // n)::BIGINT AS rank "
        "FROM nodes CROSS JOIN nn)",
    ]
    for k in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""c{k} AS (
  SELECT e.dst AS node, (r.rank // d.deg)::BIGINT AS c
  FROM e JOIN r{k - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src)"""
        )
        ctes.append(
            f"s{k} AS (SELECT node, sum(c)::BIGINT AS s FROM c{k} GROUP BY node)"
        )
        ctes.append(
            f"""r{k} AS (
  SELECT nodes.node,
         ((({100 - d_num} * {scale}) // (100 * n))
          + ((coalesce(s.s, 0) * {d_num}) // 100))::BIGINT AS rank
  FROM nodes CROSS JOIN nn LEFT JOIN s{k} s ON nodes.node = s.node)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, (rank // 1000000)::BIGINT / 1000000.0 AS rank"
        f" FROM r{_PR_ITERS}\n"
    )


_DECON_BENCH_N = 20
_DECON_K = 3


def benchmark_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus decontamination vs an md5-sampled stand-in
    benchmark set: the 20 hash-smallest docs play the eval suite; every
    other doc is checked for word-trigram overlap with them. See
    operators/dataprep.decontaminate."""
    from ig_etl_sync_spark.functions.hashing import md5_int32
    from ig_etl_sync_spark.operators.dataprep import decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = (
        docs.select(
            "doc_id",
            "text",
            md5_int32(F.col("doc_id").cast("string")).alias("_hk"),
        )
        .orderBy(F.col("_hk").asc(), F.col("doc_id").asc())
        .limit(_DECON_BENCH_N)
    )
    train = docs.join(
        F.broadcast(bench.select("doc_id")), "doc_id", "left_anti"
    )
    return decontaminate(
        _spread(train, "doc_id"), bench.select("text"), shingle_k=_DECON_K
    )


def _decontaminate_sql() -> str:
    hk = _MD5_INT_SQL.format(x="doc_id::VARCHAR")
    sh = _shingles_sql("text", _DECON_K)
    return f"""
WITH bench_ids AS (
  SELECT doc_id FROM documents ORDER BY {hk} ASC, doc_id ASC
  LIMIT {_DECON_BENCH_N}),
bg AS (
  SELECT DISTINCT unnest(grams) AS g
  FROM (SELECT list_distinct({sh}) AS grams
        FROM documents WHERE doc_id IN (SELECT doc_id FROM bench_ids))),
tdocs AS MATERIALIZED (
  -- stage the gram list ONCE per doc: inlining it into both len()
  -- and unnest() re-evaluates the whole shingle pipeline per output
  -- ROW (the sf1 gate sat >1 h here; staged it is ~2 min)
  SELECT doc_id, list_distinct({sh}) AS grams
  FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM bench_ids)),
t AS (
  SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS g FROM tdocs)
SELECT t.doc_id,
       any_value(t.n_grams) AS n_grams,
       count(*) AS n_contaminated,
       round(count(*)::DOUBLE / any_value(t.n_grams), 4) AS frac
FROM t JOIN bg ON t.g = bg.g
GROUP BY t.doc_id
"""


_BM25_TERMS = ["join", "filter", "window", "stream"]
_BM25_K1 = 1.2
_BM25_B = 0.75


def bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text BM25 relevance top-20 over documents — shuffle-free
    corpus pass (array-expression tf, single-row broadcast stats,
    TakeOrderedAndProject top-k). See operators/ranking.py."""
    from ig_etl_sync_spark.operators.ranking import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(
        docs, _BM25_TERMS, k=20, k1=_BM25_K1, b=_BM25_B, round_dp=4
    )


def tfidf_doc_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-text: characteristic-term extraction — top-3 terms per doc by
    smoothed TF-IDF (sklearn form), ranked by rounded score + term
    tiebreak. Corpus-wide df/N stats; output restricted to doc_id <
    200 to bound the compared row count. See
    operators/ranking.tfidf_top_terms for the one-explode plan shape."""
    from ig_etl_sync_spark.operators.ranking import tfidf_top_terms

    docs = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, k=3).where(F.col("doc_id") < 200)


def _tfidf_sql() -> str:
    """DuckDB replay of tfidf_top_terms: identical tokenization
    (_TOKENS_SQL + length>=3 filter), identical FP association order
    ((cnt/dl) * (ln((1+n)/(1+df)) + 1)), ranking by the ROUNDED score
    so the per-doc top-3 cut replays exactly."""
    toks = _TOKENS_SQL.format(x="lower(text)")
    return f"""
WITH tok AS MATERIALIZED (
  -- staged: td co-references ts in len() and unnest(); if tok
  -- inlines, the token pipeline re-evaluates per unnested row
  -- (the decontaminate-oracle trap, CLAUDE.md)
  SELECT doc_id, list_filter({toks}, t -> length(t) >= 3) AS ts
  FROM documents),
td AS (
  SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM tok),
tc AS (
  SELECT doc_id, term, any_value(dl) AS dl, count(*)::BIGINT AS cnt
  FROM td GROUP BY doc_id, term),
dfx AS (SELECT term, count(*)::BIGINT AS df FROM tc GROUP BY term),
n AS (SELECT count(*)::BIGINT AS n FROM documents),
scored AS (
  SELECT doc_id, term,
         round((cnt::DOUBLE / dl::DOUBLE)
               * (ln((1.0::DOUBLE + n::DOUBLE)
                     / (1.0::DOUBLE + df::DOUBLE)) + 1.0::DOUBLE),
               6) AS tfidf
  FROM tc JOIN dfx USING (term) CROSS JOIN n)
SELECT doc_id, term, tfidf FROM (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
  FROM scored) ranked
WHERE rn <= 3 AND doc_id < 200
"""


def _bm25_sql() -> str:
    """DuckDB replay of bm25_topk: identical tokenization
    (_TOKENS_SQL), identical FP association order, constants emitted
    via repr() of the Python-precomputed doubles so both engines parse
    the bit-identical literal."""
    terms = _BM25_TERMS
    k1 = repr(_BM25_K1)
    k1p1 = repr(_BM25_K1 + 1.0)  # Python precomputes in the Spark expr too
    one_minus_b = repr(1.0 - _BM25_B)
    b = repr(_BM25_B)
    toks = _TOKENS_SQL.format(x="lower(text)")
    tf_cols = ",\n         ".join(
        f"len(list_filter(ltoks, t -> t = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n         ".join(
        f"count(*) FILTER (WHERE tf{i} > 0) AS df{i}"
        for i in range(len(terms))
    )
    # explicit ::DOUBLE casts — DuckDB would otherwise run the 0.5
    # literals as exact DECIMALs; Spark does IEEE doubles throughout
    contribs = "\n       + ".join(
        f"ln(1.0::DOUBLE + ((n - df{i})::DOUBLE + 0.5::DOUBLE)"
        f" / (df{i}::DOUBLE + 0.5::DOUBLE))"
        f" * (tf{i}::DOUBLE * {k1p1}"
        f" / (tf{i}::DOUBLE + {k1} * ({one_minus_b} + {b}"
        f" * dl::DOUBLE / avgdl)))"
        for i in range(len(terms))
    )
    return f"""
WITH {_bm25_ctes()}
SELECT doc_id, round(raw, 4) AS score
FROM bm25_scored WHERE raw > 0
ORDER BY score DESC, doc_id ASC
LIMIT 20
"""


def _bm25_ctes() -> str:
    """The BM25 scoring chain as reusable CTE definitions (terminal
    relation ``bm25_scored(doc_id, raw)``) — shared by the standalone
    top-k query and the RRF hybrid fusion."""
    terms = _BM25_TERMS
    k1 = repr(_BM25_K1)
    k1p1 = repr(_BM25_K1 + 1.0)
    one_minus_b = repr(1.0 - _BM25_B)
    b = repr(_BM25_B)
    toks = _TOKENS_SQL.format(x="lower(text)")
    tf_cols = ",\n         ".join(
        f"len(list_filter(ltoks, t -> t = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n         ".join(
        f"count(*) FILTER (WHERE tf{i} > 0) AS df{i}"
        for i in range(len(terms))
    )
    contribs = "\n       + ".join(
        f"ln(1.0::DOUBLE + ((n - df{i})::DOUBLE + 0.5::DOUBLE)"
        f" / (df{i}::DOUBLE + 0.5::DOUBLE))"
        f" * (tf{i}::DOUBLE * {k1p1}"
        f" / (tf{i}::DOUBLE + {k1} * ({one_minus_b} + {b}"
        f" * dl::DOUBLE / avgdl)))"
        for i in range(len(terms))
    )
    return f"""bm25_toks AS (
  SELECT doc_id, {toks} AS ltoks FROM documents),
bm25_perdoc AS (
  SELECT doc_id, len(ltoks) AS dl,
         {tf_cols}
  FROM bm25_toks),
bm25_stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl,
         {df_cols}
  FROM bm25_perdoc),
bm25_scored AS (
  SELECT doc_id,
       {contribs} AS raw
  FROM bm25_perdoc CROSS JOIN bm25_stats)"""


# ---------------------------------------------------------------------
# 12. Round-3 additions: event analytics (cohorts, Markov transitions),
#     time-series regularization, skew-salted join parity, BFS graph
#     distances, vocabulary coverage, inverted index
# ---------------------------------------------------------------------

def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over the events table."""
    from ig_etl_sync_spark.operators.sessions import cohort_retention

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(ev, period="week")


COHORT_RETENTION_SQL = """
WITH acts AS MATERIALIZED (
  SELECT DISTINCT user_id AS k, date_trunc('week', ts) AS p FROM events),
coh AS (SELECT k, min(p) AS c FROM acts GROUP BY k),
mat AS (
  SELECT strftime(c, '%Y-%m-%d') AS cohort,
         (date_diff('day', c::DATE, p::DATE) // 7)::BIGINT AS period_offset,
         count(DISTINCT k)::BIGINT AS n_active
  FROM acts JOIN coh USING (k)
  GROUP BY c, p)
SELECT cohort, period_offset, n_active,
       ((n_active * 10000)
        // (max(CASE WHEN period_offset = 0 THEN n_active END)
            OVER (PARTITION BY cohort))::BIGINT)::BIGINT AS retention_bp
FROM mat
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts + fixed-point ppm probs."""
    from ig_etl_sync_spark.operators.sessions import transition_matrix

    ev = _t(spark, sf_dir, "events")
    return transition_matrix(ev)


TRANSITION_MATRIX_SQL = """
WITH pairs AS (
  SELECT event_type AS src_type,
         lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS dst_type
  FROM events),
agg AS (
  SELECT src_type, dst_type, count(*)::BIGINT AS n_transitions
  FROM pairs WHERE dst_type IS NOT NULL
  GROUP BY src_type, dst_type)
SELECT src_type, dst_type, n_transitions,
       ((n_transitions * 1000000)
        // (sum(n_transitions) OVER (PARTITION BY src_type))::BIGINT
       )::BIGINT AS prob_ppm
FROM agg
"""


_SPAN_PROBE_SRC = "src0"


def span_probe_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X77 driven END-TO-END through :class:`SpanDupIndex`: build the
    standing (span, doc) index from every non-src0 document, then
    probe the src0 batch against INDEX ∪ BATCH — the incremental
    ExactSubstr ingest shape (O(batch) probe against a persistent
    versioned table). The oracle is the FULL-corpus coverage SQL
    restricted to batch ids, so a green row certifies the index
    lifecycle reproduces the whole-corpus recompute exactly."""
    import atexit
    import shutil
    import tempfile

    from ig_etl_sync_spark.operators.spans import SpanDupIndex

    root = tempfile.mkdtemp(prefix="spark_graft_spanidx_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents")
    ref = docs.where(F.col("source") != _SPAN_PROBE_SRC)
    batch = docs.where(F.col("source") == _SPAN_PROBE_SRC)
    idx = SpanDupIndex(spark, root, backend="txnlog", k=8, min_docs=2)
    idx.build(ref)
    return idx.probe(batch)


def _span_probe_sql(k: int = 8, min_docs: int = 2) -> str:
    base = _span_coverage_sql(k, min_docs)
    return base.replace(
        "WHERE b.n_tokens > 0",
        f"""WHERE b.n_tokens > 0
  AND b.doc_id IN (SELECT doc_id FROM documents
                   WHERE source = '{_SPAN_PROBE_SRC}')""",
    )


def streaming_span_cut_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X55+X77 end-to-end: a TWO-batch :class:`StreamingCorpusIngest`
    with the optional ExactSubstr span cut enabled, oracled on the
    STORED corpus text (round-6 task: the span-cut ingest path was
    pytest-only). Batch 1 = every non-src0 document, batch 2 = src0.
    Per batch the ingest exact-dedups (min-id per fingerprint),
    minhash-near-dup-dedups in-batch, probes the standing minhash
    index (batch 2 drops docs near-duplicating accepted batch-1 docs),
    extends the standing SPAN index with the survivors' pre-cut spans,
    and stores each survivor's text with already-duplicated spans
    excised (original bytes kept when nothing was cut).

    The oracle replays acceptance by filtering the COMBINED minhash
    pair relation by batch populations (band hashes depend only on the
    doc — the ``cross_corpus_near_dups`` parity argument), then replays
    the cut as the full-coverage SQL over TWO populations: batch-1 rows
    against accepted-batch-1 docs only (the index state at their
    ingest), batch-2 rows against all accepted docs — certifying the
    incremental standing-state path reproduces the whole-corpus
    recompute at each step."""
    import atexit
    import shutil
    import tempfile

    from ig_etl_sync_spark.operators.dedup import MinhashDedupIndex
    from ig_etl_sync_spark.operators.spans import SpanDupIndex
    from ig_etl_sync_spark.sources.versioned import make_table
    from ig_etl_sync_spark.streaming.ingest import StreamingCorpusIngest

    root = tempfile.mkdtemp(prefix="spark_graft_sscut_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents")
    b1 = docs.where(F.col("source") != _SPAN_PROBE_SRC).select("doc_id", "text")
    b2 = docs.where(F.col("source") == _SPAN_PROBE_SRC).select("doc_id", "text")
    idx = MinhashDedupIndex(spark, f"{root}/idx", backend="txnlog")
    corpus = make_table(spark, f"{root}/corpus", "txnlog")
    span_idx = SpanDupIndex(
        spark, f"{root}/spans", backend="txnlog", k=8, min_docs=2
    )
    ingest = StreamingCorpusIngest(
        idx, corpus, threshold=0.7, span_index=span_idx
    )
    ingest.process_batch(b1, 0)
    ingest.process_batch(b2, 1)
    return corpus.read().select(
        "doc_id", F.col("text").alias("stored_text")
    )


def _span_cut_pop_ctes(prefix: str, pop: str, k: int, min_docs: int) -> str:
    """Population-parameterized twin of ``_span_starts_ctes`` + the
    clean-text rebuild, CTE names prefixed so two populations coexist
    in one oracle. Same MATERIALIZED discipline (and the same
    never-co-reference-a-list-expr-with-its-own-unnest staging)."""
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    sh = _shingles_sql("text", k)
    p = prefix
    return f"""
{p}tok AS MATERIALIZED (SELECT doc_id, {toks} AS t FROM {pop}),
{p}base AS MATERIALIZED (
  SELECT doc_id, len(t)::BIGINT AS n_tokens FROM {p}tok),
{p}shl AS MATERIALIZED (SELECT doc_id, {sh} AS sh FROM {pop}),
{p}sp AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(sh, 1) - 1 AS pos,
         md5(unnest(sh)) AS span_md5
  FROM {p}shl),
{p}dupf AS MATERIALIZED (
  SELECT span_md5 FROM (SELECT DISTINCT span_md5, doc_id FROM {p}sp)
  GROUP BY span_md5 HAVING count(*) >= {min_docs}),
{p}ds AS MATERIALIZED (
  SELECT {p}sp.doc_id, {p}sp.pos FROM {p}sp JOIN {p}dupf USING (span_md5)),
{p}covd AS MATERIALIZED (
  SELECT DISTINCT doc_id, idx FROM (
    SELECT {p}ds.doc_id, unnest(range(pos, least(pos + {k}, n_tokens))) AS idx
    FROM {p}ds JOIN {p}base USING (doc_id))),
{p}stats AS (
  SELECT doc_id, count(*)::BIGINT AS covered_tokens
  FROM {p}covd GROUP BY doc_id),
{p}tokix AS MATERIALIZED (
  SELECT doc_id, generate_subscripts(t, 1) - 1 AS idx, unnest(t) AS w
  FROM {p}tok),
{p}clean AS (
  SELECT t.doc_id, string_agg(t.w, ' ' ORDER BY t.idx) AS clean_text
  FROM {p}tokix t ANTI JOIN {p}covd c
    ON t.doc_id = c.doc_id AND t.idx = c.idx
  GROUP BY t.doc_id)"""


def _streaming_span_cut_sql(
    k: int = 8, min_docs: int = 2, t: float = 0.7
) -> str:
    fp = "md5(" + _NORM_TEXT_SQL.format(x="text") + ")"
    return f"""
WITH {_minhash_pair_ctes('documents')},
sc_b1 AS (SELECT doc_id, text FROM documents
          WHERE source <> '{_SPAN_PROBE_SRC}'),
sc_b2 AS (SELECT doc_id, text FROM documents
          WHERE source = '{_SPAN_PROBE_SRC}'),
-- per-batch exact dedup: min-id winner per normalized fingerprint
ex1 AS (SELECT min(doc_id) AS doc_id FROM sc_b1 GROUP BY {fp}),
ex2 AS (SELECT min(doc_id) AS doc_id FROM sc_b2 GROUP BY {fp}),
-- in-batch near-dup: the larger id of every verified pair drops
dj1 AS (SELECT DISTINCT id_b AS doc_id FROM mh_pairs
        WHERE jaccard >= {t}
          AND id_a IN (SELECT doc_id FROM ex1)
          AND id_b IN (SELECT doc_id FROM ex1)),
acc1 AS MATERIALIZED (
  SELECT ex1.doc_id FROM ex1 ANTI JOIN dj1 USING (doc_id)),
dj2 AS (SELECT DISTINCT id_b AS doc_id FROM mh_pairs
        WHERE jaccard >= {t}
          AND id_a IN (SELECT doc_id FROM ex2)
          AND id_b IN (SELECT doc_id FROM ex2)),
s2 AS (SELECT ex2.doc_id FROM ex2 ANTI JOIN dj2 USING (doc_id)),
-- standing-index probe: batch-2 docs near-duplicating ANY accepted
-- batch-1 doc drop (either pair orientation)
djp AS (SELECT DISTINCT doc_id FROM (
    SELECT id_b AS doc_id FROM mh_pairs WHERE jaccard >= {t}
      AND id_a IN (SELECT doc_id FROM acc1)
      AND id_b IN (SELECT doc_id FROM s2)
    UNION ALL
    SELECT id_a FROM mh_pairs WHERE jaccard >= {t}
      AND id_b IN (SELECT doc_id FROM acc1)
      AND id_a IN (SELECT doc_id FROM s2))),
acc2 AS MATERIALIZED (
  SELECT s2.doc_id FROM s2 ANTI JOIN djp USING (doc_id)),
-- span-cut populations: batch-1 docs were cut against the index as of
-- THEIR ingest (accepted batch 1 only); batch-2 against all accepted
sc_pop1 AS MATERIALIZED (
  SELECT d.doc_id, d.text FROM documents d JOIN acc1 USING (doc_id)),
sc_pop2 AS MATERIALIZED (
  SELECT d.doc_id, d.text FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM acc1
                     UNION ALL SELECT doc_id FROM acc2)),
{_span_cut_pop_ctes('c1_', 'sc_pop1', k, min_docs)},
{_span_cut_pop_ctes('c2_', 'sc_pop2', k, min_docs)}
SELECT p.doc_id,
       CASE WHEN coalesce(s.covered_tokens, 0) > 0
            THEN coalesce(c.clean_text, '') ELSE p.text END AS stored_text
FROM sc_pop1 p
LEFT JOIN c1_stats s USING (doc_id)
LEFT JOIN c1_clean c USING (doc_id)
UNION ALL
SELECT p.doc_id,
       CASE WHEN coalesce(s.covered_tokens, 0) > 0
            THEN coalesce(c.clean_text, '') ELSE p.text END AS stored_text
FROM sc_pop2 p
JOIN acc2 USING (doc_id)
LEFT JOIN c2_stats s USING (doc_id)
LEFT JOIN c2_clean c USING (doc_id)
"""


def table_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X69 driven END-TO-END through a versioned table: commit two
    deterministic orders snapshots (v2 adds a custkey band, drops
    another, and doubles every third order's price), then time-travel
    diff the two COMMITTED versions. The oracle classifies the same
    two subset queries by value comparison — exact, because the
    change-hash is a pure function of the payload (no collisions at
    md5 width), so hash-differs ⇔ values-differ."""
    import atexit
    import shutil
    import tempfile

    from ig_etl_sync_spark.operators.reconcile import diff_table_versions
    from ig_etl_sync_spark.sources.versioned import make_table

    root = tempfile.mkdtemp(prefix="spark_graft_ttdiff_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    orders = _t(spark, sf_dir, "orders")
    v1_rows = orders.where(F.col("o_custkey") % 10 < 7).select(
        F.col("o_orderkey").cast("string").alias("external_id"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    v2_rows = orders.where(
        (F.col("o_custkey") % 10 >= 2) & (F.col("o_custkey") % 10 <= 8)
    ).select(
        F.col("o_orderkey").cast("string").alias("external_id"),
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")).alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    t = make_table(spark, root, "txnlog")
    t.write(v1_rows)
    v1 = t.latest_version()
    t.write(v2_rows)
    v2 = t.latest_version()
    return diff_table_versions(t, "external_id", v1, v2)


TABLE_VERSION_DIFF_SQL = """
WITH v1 AS (
  SELECT o_orderkey::VARCHAR AS k, o_totalprice AS p, o_orderstatus AS s
  FROM orders WHERE o_custkey % 10 < 7),
v2 AS (
  SELECT o_orderkey::VARCHAR AS k,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
              ELSE o_totalprice END AS p,
         o_orderstatus AS s
  FROM orders WHERE o_custkey % 10 BETWEEN 2 AND 8)
SELECT coalesce(v2.k, v1.k) AS external_id,
       CASE WHEN v1.k IS NULL THEN 'create'
            WHEN v2.k IS NULL THEN 'delete'
            ELSE 'update' END AS change
FROM v2 FULL OUTER JOIN v1 ON v2.k = v1.k
WHERE v1.k IS NULL OR v2.k IS NULL OR v1.p <> v2.p OR v1.s <> v2.s
"""


# salt_buckets obeys the operator's sizing rule (docs/bucket >> 2n):
# 4 buckets x 8 shards needs >= ~64 docs/bucket — true from sf0.001 up.
# At corpus scale the dial grows with the data (see the docstring);
# parallelism here is a driver-SF pin, like the isolation planes.
_BALANCE_SHARDS, _BALANCE_SALT = 8, 4


def token_balanced_shards_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X78: near-equal-token sharding via the scale-safe two-level
    snake (``layout.token_balanced_shards``) — bucket-partitioned
    windows only, no global single-task sort."""
    from ig_etl_sync_spark.operators.layout import token_balanced_shards

    docs = _t(spark, sf_dir, "documents")
    return token_balanced_shards(
        docs, _BALANCE_SHARDS, salt_buckets=_BALANCE_SALT
    )


def _token_balance_sql() -> str:
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    h = _MD5_INT_SQL.format(x="'balance-v1:' || doc_id::VARCHAR")
    n, b = _BALANCE_SHARDS, _BALANCE_SALT
    return f"""
WITH sized AS (
  SELECT doc_id, len({toks})::BIGINT AS n_tokens,
         ({h} % {b}) AS b
  FROM documents),
ranked AS (
  SELECT doc_id, n_tokens,
         (row_number() OVER (PARTITION BY b
                             ORDER BY n_tokens DESC, doc_id ASC) - 1)
         % {2 * n} AS fold
  FROM sized)
SELECT doc_id, n_tokens,
       (CASE WHEN fold < {n} THEN fold ELSE {2 * n - 1} - fold END)::INT
         AS shard
FROM ranked
"""


def user_event_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X76: per-user Markov sequence surprisal
    (``sessions.sequence_surprisal``) — behavioral predictability under
    the corpus's own add-one transition model, exact floor-log2
    integers; the event-domain twin of X74."""
    from ig_etl_sync_spark.operators.sessions import sequence_surprisal

    return sequence_surprisal(_t(spark, sf_dir, "events"))


USER_EVENT_SURPRISAL_SQL = """
WITH pr AS MATERIALIZED (
  SELECT user_id, event_type AS src,
         lead(event_type) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS dst
  FROM events),
p AS MATERIALIZED (SELECT user_id, src, dst FROM pr WHERE dst IS NOT NULL),
c2 AS MATERIALIZED (
  SELECT src, dst, count(*)::BIGINT AS c2 FROM p GROUP BY src, dst),
c1 AS MATERIALIZED (SELECT src, count(*)::BIGINT AS c1 FROM p GROUP BY src),
v AS (SELECT count(DISTINCT event_type)::BIGINT AS vsz FROM events)
SELECT user_id, count(*)::BIGINT AS n_transitions,
       (sum(length(bin((c1.c1 + v.vsz) // (c2.c2 + 1))) - 1)::BIGINT
        * 1000000 // count(*)::BIGINT) AS surprisal_ppm
FROM p JOIN c2 USING (src, dst) JOIN c1 USING (src) CROSS JOIN v
GROUP BY user_id
"""


def salted_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈dim join whose oracle is the PLAIN SQL join —
    the parity that proves the salt pattern (operators/joins.py:18)
    is semantics-preserving: the small side is replicated salt×, the
    big side picks one replica deterministically, and the (key, salt)
    equi-join therefore matches each big row exactly once."""
    from ig_etl_sync_spark.operators.joins import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = salted_join(li, part, "p_partkey", salt=8)
    return j.groupBy("p_brand").agg(
        F.round(F.sum("_rev"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


SALTED_JOIN_SQL = """
SELECT p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def resample_ffill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly grid + forward fill for a user subset (operators/
    temporal.resample_ffill)."""
    from ig_etl_sync_spark.operators.temporal import resample_ffill

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") % 50 == 0)
    return resample_ffill(ev, step="hour")


RESAMPLE_FFILL_SQL = """
WITH src AS (SELECT * FROM events WHERE user_id % 50 = 0),
cells AS MATERIALIZED (
  SELECT user_id, h, value FROM (
    SELECT user_id, date_trunc('hour', ts) AS h, value,
           row_number() OVER (
               PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn
    FROM src) WHERE rn = 1),
bounds AS (SELECT user_id, min(h) AS mn, max(h) AS mx FROM cells GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS h
  FROM bounds),
j AS (
  SELECT g.user_id, g.h, c.value
  FROM grid g LEFT JOIN cells c ON g.user_id = c.user_id AND g.h = c.h)
SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS grid_ts,
       last_value(value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY h
           ROWS UNBOUNDED PRECEDING) AS value_ffill
FROM j
"""


_BFS_TOPK = 3
_BFS_MAX_HOPS = 8


def nation_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances over the mutual-top-k-sparsified nation trade
    graph, seeded at the smallest nation key in the sparsified edge
    set. Pure integer computation end-to-end (graph_algos.bfs_hops);
    the oracle replays it as a recursive CTE with UNION dedup."""
    from ig_etl_sync_spark.operators.graph_algos import bfs_hops, mutual_topk_graph

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    raw = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.col("c_nationkey").alias("a"), F.col("s_nationkey").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sym = (
        raw.select(
            F.least("a", "b").alias("u"),
            F.greatest("a", "b").alias("v"),
            F.col("cnt"),
        )
        .groupBy("u", "v")
        .agg(F.sum("cnt").alias("w"))
    )
    edges = mutual_topk_graph(
        sym, k=_BFS_TOPK, a_col="u", b_col="v", w_col="w"
    ).localCheckpoint(eager=False)  # diamond: seeds agg + BFS loop
    seeds = edges.agg(F.min("src").alias("node"))
    dist = bfs_hops(edges, seeds, undirected=True, max_hops=_BFS_MAX_HOPS)
    return dist.select(F.col("node").cast("long").alias("node"), "hops")


NATION_BFS_SQL = f"""
WITH RECURSIVE raw AS (
  SELECT c_nationkey AS a, s_nationkey AS b, count(*)::BIGINT AS cnt
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE c_nationkey <> s_nationkey
  GROUP BY a, b),
sym AS MATERIALIZED (
  SELECT least(a, b) AS u, greatest(a, b) AS v, sum(cnt)::BIGINT AS w
  FROM raw GROUP BY u, v),
dir AS (SELECT u AS n, v AS p, w FROM sym UNION ALL SELECT v, u, w FROM sym),
topk AS (
  SELECT n, p FROM (
    SELECT n, p, row_number() OVER (
        PARTITION BY n ORDER BY w DESC, p ASC) AS rn
    FROM dir) t WHERE rn <= {_BFS_TOPK}),
e AS MATERIALIZED (
  SELECT DISTINCT least(n, p) AS src, greatest(n, p) AS dst FROM topk),
bidir AS MATERIALIZED (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
walk(node, d) AS (
  SELECT (SELECT min(src) FROM e), 0
  UNION
  SELECT b.dst, w.d + 1
  FROM walk w JOIN bidir b ON b.src = w.node
  WHERE w.d < {_BFS_MAX_HOPS})
SELECT node::BIGINT AS node, min(d)::BIGINT AS hops
FROM walk GROUP BY node
"""


_VOCAB_TOP_N = 100


def vocab_top_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head with cumulative corpus coverage (ppm)."""
    from ig_etl_sync_spark.operators.ranking import vocab_coverage

    docs = _t(spark, sf_dir, "documents")
    return vocab_coverage(docs, top_n=_VOCAB_TOP_N)


def _vocab_coverage_sql() -> str:
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    return f"""
WITH toks AS (SELECT unnest({toks}) AS token FROM documents),
counts AS MATERIALIZED (
  SELECT token, count(*)::BIGINT AS cnt FROM toks GROUP BY token),
tot AS (SELECT sum(cnt)::BIGINT AS total FROM counts),
head AS (
  SELECT token, cnt FROM counts
  ORDER BY cnt DESC, token ASC LIMIT {_VOCAB_TOP_N})
SELECT row_number() OVER (ORDER BY cnt DESC, token ASC)::BIGINT AS rank,
       token, cnt,
       (((sum(cnt) OVER (ORDER BY cnt DESC, token ASC
                         ROWS UNBOUNDED PRECEDING))::BIGINT * 1000000)
        // total)::BIGINT AS coverage_ppm
FROM head CROSS JOIN tot
"""


def event_value_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family window surface (ntile / percent_rank / cume_dist)
    over a unique total order (value, event_id) — the ordering has no
    ties, so every rank function is deterministic, and pr/cd are
    divisions of identical integers (IEEE-exact in any engine)."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") % 25 == 0)
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


NTILES_SQL = """
SELECT event_id, event_type,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd
FROM events WHERE user_id % 25 = 0
WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
"""


def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase exact NDV (operators/aggs.py) — the skew-proof
    rewrite of COUNT(DISTINCT): the first shuffle key includes the
    value, spreading hot event_types across reducers."""
    from ig_etl_sync_spark.operators.aggs import two_phase_count_distinct

    ev = _t(spark, sf_dir, "events")
    return two_phase_count_distinct(ev, ["event_type"], "user_id")


DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS ndv
FROM events GROUP BY event_type
"""


_KCORE_K = 3
_KCORE_ROUNDS = 8


def kcore_cosupply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core of the mutual top-3 co-supply partner graph (same graph
    as triangle_counts_cosupply) — the dense backbone that survives
    iterative peeling. Early exit fires only on a no-change round, so
    the fixed-round SQL unroll matches at any scale."""
    from ig_etl_sync_spark.operators.graph_algos import kcore

    edges = _cosupply_topk_edges(spark, sf_dir)
    return kcore(edges, k=_KCORE_K, max_rounds=_KCORE_ROUNDS)


def _kcore_sql() -> str:
    """Unrolled peeling replay: same mutual-top-3 graph prefix as
    TRIANGLES_SQL, then _KCORE_ROUNDS degree-filter rounds. Survivor
    edge lists are referenced twice per round (next degree count +
    next anti-join) → AS MATERIALIZED per the repo CTE rule."""
    ctes = [
        "ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)",
        """pairs AS (
  SELECT a.l_suppkey AS a, b.l_suppkey AS b, count(*)::BIGINT AS w
  FROM ps a JOIN ps b
    ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2)""",
        """bidir AS (
  SELECT a AS n, b AS p, w FROM pairs
  UNION ALL SELECT b AS n, a AS p, w FROM pairs)""",
        """kept AS (
  SELECT n, p FROM (
    SELECT *, row_number() OVER (
        PARTITION BY n ORDER BY w DESC, p ASC) AS r
    FROM bidir) rb
  WHERE r <= 3)""",
        "canon AS (SELECT DISTINCT least(n, p) AS lo, greatest(n, p) AS hi FROM kept)",
        """e0 AS MATERIALIZED (
  SELECT lo AS src, hi AS dst FROM canon
  UNION ALL SELECT hi, lo FROM canon)""",
    ]
    for i in range(1, _KCORE_ROUNDS + 1):
        ctes.append(
            f"d{i} AS (SELECT src, count(*)::BIGINT AS c "
            f"FROM e{i - 1} GROUP BY src)"
        )
        ctes.append(
            f"b{i} AS MATERIALIZED (SELECT src FROM d{i} WHERE c < {_KCORE_K})"
        )
        ctes.append(
            f"""e{i} AS MATERIALIZED (
  SELECT t.src, t.dst FROM e{i - 1} t
  ANTI JOIN b{i} x ON t.src = x.src
  ANTI JOIN b{i} y ON t.dst = y.src)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT src AS node, count(*)::BIGINT AS core_deg "
        f"FROM e{_KCORE_ROUNDS} GROUP BY src"
    )


def user_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic rolling z-score (profiling.rolling_zscore): the
    anomaly signal whose float pipeline consumes only identical
    BIGINTs — integer-quantized rolling sums, one int division, one
    IEEE sqrt — so the UNROUNDED double is bit-identical."""
    from ig_etl_sync_spark.operators.profiling import rolling_zscore

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") % 25 == 0)
    return rolling_zscore(ev, "user_id", "ts", "value", "event_id")


ROLLING_ZSCORE_SQL = """
WITH rolled AS (
  SELECT user_id, event_id,
         floor(value * 100)::BIGINT AS x,
         sum(floor(value * 100)::BIGINT) OVER w::BIGINT AS s,
         sum(floor(value * 100)::BIGINT * floor(value * 100)::BIGINT)
             OVER w::BIGINT AS q,
         count(*) OVER w::BIGINT AS n
  FROM events WHERE user_id % 25 = 0
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
SELECT user_id, event_id,
       CASE WHEN n >= 2 AND n * q - s * s > 0 THEN
         (n * x - s)::DOUBLE
         / (n::DOUBLE * sqrt((n * q - s * s)::DOUBLE
                             / (n * (n - 1))::DOUBLE))
       END AS z
FROM rolled
"""


def conversion_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per click the MIN delay to a
    same-user purchase within 1 h (the attribution join's latency
    signal), summarized with DISCRETE percentiles over exact µs
    BIGINTs — every output value is an integer a purchase actually
    took, bit-identical cross-engine."""
    from ig_etl_sync_spark.streaming.joins import interval_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = ev.where("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    j = interval_join(
        clicks,
        purchases.withColumnRenamed("p_ts", "ts"),
        "user_id",
        lower_sec=0,
        upper_sec=3600,
    )
    # the right ts comes back suffixed (collision with the left's "ts")
    delays = j.groupBy("click_id").agg(
        F.min(F.unix_micros("ts_r") - F.unix_micros("ts")).alias("delay_us")
    )
    return delays.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY delay_us)")
        .cast("long")
        .alias("p50_us"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY delay_us)")
        .cast("long")
        .alias("p90_us"),
        F.max("delay_us").alias("max_us"),
    )


CONVERSION_LATENCY_SQL = """
WITH j AS (
  SELECT c.event_id AS click_id,
         min(epoch_us(p.ts) - epoch_us(c.ts))::BIGINT AS delay_us
  FROM events c JOIN events p
    ON p.user_id = c.user_id
   AND p.event_type = 'purchase' AND c.event_type = 'click'
   AND epoch_us(p.ts) - epoch_us(c.ts) >= 0
   AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
  GROUP BY c.event_id)
SELECT count(*)::BIGINT AS n_converted,
       quantile_disc(delay_us, 0.5)::BIGINT AS p50_us,
       quantile_disc(delay_us, 0.9)::BIGINT AS p90_us,
       max(delay_us)::BIGINT AS max_us
FROM j
"""


def unconverted_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absence-of-followup (temporal ANTI join): clicks with NO
    purchase by the same user within the next hour — the complement of
    click_purchase_attribution, the churn/abandonment signal
    (temporal.absence_within)."""
    from ig_etl_sync_spark.operators.temporal import absence_within

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = ev.where("event_type = 'purchase'").select("user_id", "ts")
    out = absence_within(
        clicks, purchases, "user_id", window_seconds=3600
    )
    return out.select(
        "user_id", "click_id", F.unix_micros("ts").alias("click_us")
    )


UNCONVERTED_SQL = """
SELECT c.user_id, c.event_id AS click_id, epoch_us(c.ts) AS click_us
FROM events c
WHERE c.event_type = 'click'
  AND NOT EXISTS (
    SELECT 1 FROM events p
    WHERE p.event_type = 'purchase'
      AND p.user_id = c.user_id
      AND epoch_us(p.ts) > epoch_us(c.ts)
      AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
  )
"""


_DWA_ALPHA = 0.5
_DWA_DEPTH = 8


def user_decay_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-window EWMA (temporal.decay_weighted_avg): integer
    weights + integer value quanta, one final division of identical
    ints — bit-identical cross-engine, shipped unrounded."""
    from ig_etl_sync_spark.operators.temporal import decay_weighted_avg

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") % 25 == 0)
    return decay_weighted_avg(
        ev, "user_id", "ts", "value", "event_id",
        alpha=_DWA_ALPHA, depth=_DWA_DEPTH,
    )


def _decay_avg_sql() -> str:
    wscale = 1 << 20
    weights = [round((_DWA_ALPHA**i) * wscale) for i in range(_DWA_DEPTH)]
    lags = ",\n         ".join(
        f"lag(x, {i}) OVER w AS x{i}" for i in range(1, _DWA_DEPTH)
    )
    terms_n = " + ".join(
        f"(CASE WHEN x{i if i else ''} IS NOT NULL THEN x{i if i else ''} * {wi}::BIGINT ELSE 0::BIGINT END)"
        for i, wi in enumerate(weights)
    )
    terms_d = " + ".join(
        f"(CASE WHEN x{i if i else ''} IS NOT NULL THEN {wi}::BIGINT ELSE 0::BIGINT END)"
        for i, wi in enumerate(weights)
    )
    return f"""
WITH b AS (
  SELECT user_id, event_id, ts, floor(value * 100)::BIGINT AS x
  FROM events WHERE user_id % 25 = 0),
l AS (
  SELECT user_id, event_id, x,
         {lags}
  FROM b
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
SELECT user_id, event_id,
       ({terms_n})::DOUBLE / (({terms_d}) * 100)::DOUBLE AS dwa
FROM l
"""


def value_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type stats (dataprep.winsorize): bounds are
    DISCRETE percentiles — exact data elements, so the clip compare is
    bit-identical cross-engine (no interpolation ulps)."""
    from ig_etl_sync_spark.operators.dataprep import winsorize

    ev = _t(spark, sf_dir, "events")
    w = winsorize(ev, "value", ["event_type"], p_lo=0.01, p_hi=0.99)
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("v_winsorized"), 4).alias("avg_w"),
        F.min("_lo").alias("lo"),
        F.max("_hi").alias("hi"),
    )


WINSORIZE_SQL = """
WITH b AS MATERIALIZED (
  SELECT event_type,
         quantile_disc(value, 0.01) AS lo,
         quantile_disc(value, 0.99) AS hi
  FROM events GROUP BY event_type),
j AS (
  SELECT e.event_type, least(greatest(e.value, b.lo), b.hi) AS vw,
         b.lo, b.hi
  FROM events e JOIN b USING (event_type))
SELECT event_type, count(*)::BIGINT AS n, round(avg(vw), 4) AS avg_w,
       min(lo) AS lo, max(hi) AS hi
FROM j GROUP BY event_type
"""


def class_balanced_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic label balancing (dataprep.class_balanced_sample):
    every class down-sampled to the smallest class's size by md5-hash
    rank — replayable, no RNG."""
    from ig_etl_sync_spark.operators.dataprep import class_balanced_sample

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "label")
    return class_balanced_sample(emb, "label", "vec_id")


CLASS_BALANCE_SQL = f"""
WITH ranked AS (
  SELECT vec_id, label,
         row_number() OVER (
             PARTITION BY label
             ORDER BY {_MD5_INT_SQL.format(x="vec_id::VARCHAR")}, vec_id
         ) AS rn
  FROM embeddings),
m AS (SELECT min(c)::BIGINT AS m FROM (
  SELECT count(*) AS c FROM embeddings GROUP BY label) t)
SELECT vec_id, label FROM ranked CROSS JOIN m WHERE rn <= m
"""


_CHUNK_TOKENS = 64
_CHUNK_OVERLAP = 8


def document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size token chunks (context-window prep) —
    dataprep.chunk_documents, single explode-only pass."""
    from ig_etl_sync_spark.operators.dataprep import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(
        docs, chunk_tokens=_CHUNK_TOKENS, overlap=_CHUNK_OVERLAP
    )


def _document_chunks_sql() -> str:
    ct, ov = _CHUNK_TOKENS, _CHUNK_OVERLAP
    stride = ct - ov
    toks = _TOKENS_SQL.format(x="text")
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
c AS (
  SELECT doc_id, toks,
         greatest(1, greatest(len(toks) - {ov} + {stride} - 1, 0)
                     // {stride})::INT AS nc
  FROM t),
ex AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, nc - 1)) AS chunk_id
  FROM c),
ch AS (
  SELECT doc_id, chunk_id,
         toks[chunk_id * {stride} + 1 : chunk_id * {stride} + {ct}] AS ctoks
  FROM ex)
SELECT doc_id, chunk_id::BIGINT AS chunk_id,
       len(ctoks)::BIGINT AS n_tokens,
       array_to_string(ctoks, ' ') AS chunk_text
FROM ch
"""


_KMEANS_K = 8
_KMEANS_ITERS = 3


def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point distributed k-means over the embeddings table —
    every step integer arithmetic on non-negative quantities, so the
    oracle replays all of it (operators/kmeans.py)."""
    from ig_etl_sync_spark.operators.kmeans import kmeans_assign

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_assign(emb, k=_KMEANS_K, iters=_KMEANS_ITERS)


def _kmeans_ctes(k, iters: int) -> tuple[list[str], str]:
    """Unrolled-CTE replay of kmeans_assign: same quantization (three
    IEEE double ops then floor), same seed (the k ids that sort first
    by (md5_int32(id), id) — a replayable pseudo-random draw, NOT the
    k smallest ids), same integer floor-div centroid means, same
    (dist, cid) tie-break.
    ``k`` is either a fixed int (``LIMIT k`` on the seed) or a scalar
    SQL expression over ``q`` (e.g. ``greatest(2, floor(sqrt(
    count(*)::DOUBLE))::BIGINT)`` for the k≈√n design point) — the
    expression form rank-filters the seed instead of LIMITing it, so
    the cluster count replays from the DATA exactly like the Spark
    side's driver-computed ``isqrt(n)``.
    Shared chains are AS MATERIALIZED per the repo's DuckDB-CTE rule.
    Returns (ctes, name-of-final-assignment-CTE)."""
    dist = (
        "list_sum(list_transform(list_zip(a.qv, c.cv),"
        " s -> (s[1] - s[2]) * (s[1] - s[2])))::BIGINT"
    )
    if isinstance(k, int):
        c0 = f"""c0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, qv AS cv
  FROM (SELECT vec_id, qv,
               {_MD5_INT_SQL.format(x="vec_id::VARCHAR")} AS h
        FROM q ORDER BY h, vec_id LIMIT {k}) seed)"""
    else:
        c0 = f"""kk AS (SELECT {k} AS kval FROM q),
c0 AS MATERIALIZED (
  SELECT rn - 1 AS cid, qv AS cv
  FROM (SELECT vec_id, qv,
               row_number() OVER (ORDER BY {_MD5_INT_SQL.format(x="vec_id::VARCHAR")}, vec_id) AS rn
        FROM q) seed, kk
  WHERE rn <= kk.kval)"""
    ctes = [
        """q AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding,
      x -> floor((x::DOUBLE + 2.0) * 1000000)::BIGINT) AS qv
  FROM embeddings)""",
        c0,
    ]
    for i in range(1, iters + 2):  # iters sweeps + final assignment
        ctes.append(
            f"""a{i} AS MATERIALIZED (
  SELECT vec_id, qv, cid AS cluster, dist2 FROM (
    SELECT a.vec_id, a.qv, c.cid, {dist} AS dist2,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY {dist}, c.cid) AS rn
    FROM q a CROSS JOIN c{i - 1} c) t WHERE rn = 1)"""
        )
        if i == iters + 1:
            break
        ctes.append(
            f"""s{i} AS (
  SELECT cluster, u.p AS pos, sum(u.v)::BIGINT // count(*)::BIGINT AS m
  FROM (SELECT cluster,
               unnest(list_transform(qv, (x, idx) -> {{'p': idx, 'v': x}})) AS u
        FROM a{i}) ex
  GROUP BY cluster, u.p)"""
        )
        ctes.append(
            f"n{i} AS (SELECT cluster AS cid, list(m ORDER BY pos) AS ncv "
            f"FROM s{i} GROUP BY cluster)"
        )
        ctes.append(
            f"""c{i} AS MATERIALIZED (
  SELECT c.cid, coalesce(n.ncv, c.cv) AS cv
  FROM c{i - 1} c LEFT JOIN n{i} n ON c.cid = n.cid)"""
        )
    return ctes, f"a{iters + 1}"


def _kmeans_sql() -> str:
    ctes, final = _kmeans_ctes(_KMEANS_K, _KMEANS_ITERS)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT vec_id, cluster, dist2 FROM {final}"
    )


_SEMDEDUP_K = 16
_SEMDEDUP_ITERS = 2
#: low enough that the drop rule actually fires on the synthetic
#: near-orthogonal embeddings (21 drops at sf0.01) — the oracle then
#: exercises clustering, priority, AND the cosine screen, not just the
#: k-means replay.
_SEMDEDUP_TAU = 0.4


def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup screening over the embeddings table: fixed-point
    k-means clusters, then within-cluster cosine pruning keeping the
    farthest-from-centroid representative (operators/dedup.py:706)."""
    emb = _t(spark, sf_dir, "embeddings")
    return D.semantic_dedup(
        emb, k=_SEMDEDUP_K, iters=_SEMDEDUP_ITERS, threshold=_SEMDEDUP_TAU
    )


def semantic_dedup_design_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at the paper's cost-model design point: k ≈ √n so the
    expected cluster size is √n and the within-cluster pair scan stays
    O(n^1.5) total as the corpus grows (Abbas et al. 2023 use 50k
    clusters for 100M+ points — the fixed-k=16 twin above is kept for
    driver-row continuity, but ITS pinned plan is 14× past the design
    point at sf1). k is derived from the data (``isqrt(n)``, floored,
    min 2) by a driver-side count — a bounded scalar — and the oracle
    replays the same k via ``floor(sqrt(count(*)))`` in the seed CTE."""
    import math

    emb = _t(spark, sf_dir, "embeddings")
    k = max(2, math.isqrt(emb.count()))
    return D.semantic_dedup(
        emb, k=k, iters=_SEMDEDUP_ITERS, threshold=_SEMDEDUP_TAU
    )


_SEMDEDUP_K_SQL = "greatest(2, floor(sqrt(count(*)::DOUBLE))::BIGINT)"


def _semdedup_sql(k=_SEMDEDUP_K) -> str:
    """Replays the k-means chain (same unrolled CTEs), then the exact
    pairwise drop rule: a row is dropped iff a strictly-higher-priority
    same-cluster row (dist2 DESC, id ASC — pure integers) is cosine-
    similar at >= tau on the round-6 value (the embedding_near_dup
    comparison pattern)."""
    ctes, final = _kmeans_ctes(k, _SEMDEDUP_ITERS)
    ctes = ctes + [
        f"""base AS MATERIALIZED (
  SELECT a.vec_id, a.cluster, a.dist2,
         list_transform(e.embedding, x -> x::DOUBLE) AS v
  FROM {final} a JOIN embeddings e USING (vec_id))""",
        f"""dropped AS (
  SELECT DISTINCT a.vec_id
  FROM base a JOIN base b
    ON a.cluster = b.cluster
   AND (b.dist2 > a.dist2 OR (b.dist2 = a.dist2 AND b.vec_id < a.vec_id))
  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {_SEMDEDUP_TAU})""",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT base.vec_id, base.cluster, base.dist2,
       (d.vec_id IS NULL) AS kept
FROM base LEFT JOIN dropped d ON base.vec_id = d.vec_id
"""
    )


_POSTINGS_MIN_DF = 5


def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level inverted index over the documents table."""
    from ig_etl_sync_spark.operators.ranking import inverted_index

    docs = _t(spark, sf_dir, "documents")
    return inverted_index(docs, min_df=_POSTINGS_MIN_DF)


def _inverted_index_sql() -> str:
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    return f"""
WITH ex AS (SELECT doc_id, unnest({toks}) AS term FROM documents),
pairs AS (SELECT DISTINCT doc_id, term FROM ex)
SELECT term, count(*)::BIGINT AS df,
       array_to_string(list_sort(list(doc_id)), ',') AS postings
FROM pairs GROUP BY term HAVING count(*) >= {_POSTINGS_MIN_DF}
"""


_POSTINGS_MAX_DF_PPM = 780_000  # fractional cap 0.78, exact-integer form


def inverted_index_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index with the ultra-common-term cap ON (fractional
    ``max_df=0.78``): the df pre-pass drops stop-word-like terms BEFORE
    any posting list is collected, so the hot term never serializes on
    one task.  Exercises the 100 TB posture of ``inverted_index``."""
    from ig_etl_sync_spark.operators.ranking import inverted_index

    docs = _t(spark, sf_dir, "documents")
    return inverted_index(docs, min_df=_POSTINGS_MIN_DF, max_df=0.78)


def _inverted_index_capped_sql() -> str:
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    # df*1e6 <= ppm*n_docs in BIGINT — the same exact-integer rule the
    # Spark operator applies, immune to float-fraction rounding.
    return f"""
WITH ex AS (SELECT doc_id, unnest({toks}) AS term FROM documents),
pairs AS MATERIALIZED (SELECT DISTINCT doc_id, term FROM ex),
nd AS (SELECT count(DISTINCT doc_id)::BIGINT AS n_docs FROM pairs)
SELECT term, count(*)::BIGINT AS df,
       array_to_string(list_sort(list(doc_id)), ',') AS postings
FROM pairs, nd GROUP BY term, n_docs
HAVING count(*) >= {_POSTINGS_MIN_DF}
   AND count(*)::BIGINT * 1000000 <= {_POSTINGS_MAX_DF_PPM}::BIGINT * n_docs
"""


# ---------------------------------------------------------------------
# round-4 additions: Gopher rules, group split, cross-corpus dedup,
# embedding standardization
# ---------------------------------------------------------------------


def gopher_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: the Gopher/MassiveText composite rule pack over documents
    (``textops.gopher_quality_flags``) — all exact-integer ratio
    comparisons, one fused projection."""
    from ig_etl_sync_spark.operators.textops import gopher_quality_flags

    return gopher_quality_flags(_t(spark, sf_dir, "documents"))


def _gopher_sql() -> str:
    from ig_etl_sync_spark.operators.textops import (
        GOPHER_MAX_BULLET_LINES_PER_10,
        GOPHER_MAX_ELLIPSIS_LINES_PER_10,
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MAX_SYMBOL_PER_10_WORDS,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_WORDS_PER_10,
        GOPHER_MIN_DISTINCT_STOPWORDS,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MIN_WORDS,
        STOPWORDS,
    )

    toks = _TOKENS_SQL.format(x="text")
    ltoks = _TOKENS_SQL.format(x="lower(text)")
    stop = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
WITH m AS (
  SELECT doc_id,
    len({toks})::BIGINT AS n_words,
    coalesce(list_sum(list_transform({toks}, t -> length(t))), 0)::BIGINT AS wc,
    len(list_filter(string_split_regex(text, '\\n'),
                    ln -> trim(ln) <> ''))::BIGINT AS n_lines,
    (len(regexp_extract_all(text, '#'))
     + len(regexp_extract_all(text, '\\.\\.\\.')))::BIGINT AS sym,
    len(list_filter(string_split_regex(text, '\\n'),
        ln -> trim(ln) <> '' AND regexp_matches(trim(ln), '^[-*•]')))::BIGINT AS bul,
    len(list_filter(string_split_regex(text, '\\n'),
        ln -> trim(ln) <> '' AND regexp_matches(rtrim(ln), '\\.\\.\\.$')))::BIGINT AS ell,
    len(list_filter({toks}, w -> regexp_matches(w, '[A-Za-z]')))::BIGINT AS alw,
    len(list_intersect(list_distinct({ltoks}), [{stop}]))::BIGINT AS nst
  FROM documents)
SELECT doc_id, n_words, n_lines,
  (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}) AS f_word_count,
  (wc >= {GOPHER_MIN_MEAN_WORD_LEN} * n_words
   AND wc <= {GOPHER_MAX_MEAN_WORD_LEN} * n_words) AS f_mean_word_len,
  (sym * 10 <= {GOPHER_MAX_SYMBOL_PER_10_WORDS} * n_words) AS f_symbol_ratio,
  (bul * 10 <= {GOPHER_MAX_BULLET_LINES_PER_10} * n_lines) AS f_bullet_lines,
  (ell * 10 <= {GOPHER_MAX_ELLIPSIS_LINES_PER_10} * n_lines) AS f_ellipsis_lines,
  (alw * 10 >= {GOPHER_MIN_ALPHA_WORDS_PER_10} * n_words) AS f_alpha_words,
  (nst >= {GOPHER_MIN_DISTINCT_STOPWORDS}) AS f_stopwords,
  ((n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
   AND wc >= {GOPHER_MIN_MEAN_WORD_LEN} * n_words
   AND wc <= {GOPHER_MAX_MEAN_WORD_LEN} * n_words
   AND sym * 10 <= {GOPHER_MAX_SYMBOL_PER_10_WORDS} * n_words
   AND bul * 10 <= {GOPHER_MAX_BULLET_LINES_PER_10} * n_lines
   AND ell * 10 <= {GOPHER_MAX_ELLIPSIS_LINES_PER_10} * n_lines
   AND alw * 10 >= {GOPHER_MIN_ALPHA_WORDS_PER_10} * n_words
   AND nst >= {GOPHER_MIN_DISTINCT_STOPWORDS}) AS passes
FROM m
"""


_HLL_ROLLUP_SRC = """(SELECT o_custkey, r_name, n_name
   FROM orders
   JOIN customer ON o_custkey = c_custkey
   JOIN nation ON c_nationkey = n_nationkey
   JOIN region ON n_regionkey = r_regionkey)"""


def hll_rollup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13+: ordering-customer distinct-count sketch rolled up
    nation -> region -> global by REGISTER MERGE — one raw scan, every
    coarser level aggregates the <= groups*64-row leaf sketch
    (``sketches.hll_rollup``); small-range correction on (nation
    groups sit well under 2.5*m here)."""
    from ig_etl_sync_spark.operators.sketches import hll_rollup

    base = (
        _t(spark, sf_dir, "orders")
        .select("o_custkey")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select(
                    "n_nationkey", "n_name", "n_regionkey"
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("o_custkey", "r_name", "n_name")
    )
    return hll_rollup(
        base, "o_custkey", ["r_name", "n_name"], m=64, corrected=True
    )


def _hll_rollup_sql() -> str:
    from ig_etl_sync_spark.operators.sketches import hll_rollup_sql

    return hll_rollup_sql(
        "o_custkey", _HLL_ROLLUP_SRC, 64, ["r_name", "n_name"], corrected=True
    )


_PC1_ITERS = 6
_PC1_DIMS = 64


def embedding_pc1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X61: fixed-point power iteration — every embedding's integer
    projection onto the dominant covariance eigenvector
    (``pca.power_iteration_pc1``)."""
    from ig_etl_sync_spark.operators.pca import power_iteration_pc1

    emb = _t(spark, sf_dir, "embeddings")
    return power_iteration_pc1(emb, iters=_PC1_ITERS, dims=_PC1_DIMS)


def _pc_base_ctes() -> list[str]:
    """Quantize + floor-mean-center CTEs shared by the PC oracles."""
    from ig_etl_sync_spark.operators.kmeans import _OFFSET, _SCALE

    return [
        f"""q AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding,
      x -> floor((x::DOUBLE + {_OFFSET}) * {_SCALE})::BIGINT) AS qv
  FROM embeddings)""",
        """msum AS (
  SELECT d, (sum(x)::BIGINT // count(*)::BIGINT) AS m
  FROM (SELECT unnest(qv) AS x, generate_subscripts(qv, 1) AS d FROM q)
  GROUP BY d)""",
        "mv AS (SELECT list(m ORDER BY d) AS mv FROM msum)",
        """cent AS MATERIALIZED (
  SELECT vec_id,
         list_transform(list_zip(qv, w.mv), s -> s[1] - s[2]) AS cq
  FROM q, mv w)""",
    ]


def _pc_iter_ctes(src: str, vp: str, iters: int) -> list[str]:
    """One power-iteration unroll over centered frame ``src`` (column
    ``cq``); direction CTEs named ``{vp}0..{vp}iters``. `//` ≡ Spark
    ``div`` for signed BIGINT (both truncate)."""
    from ig_etl_sync_spark.operators.pca import S_SCALE, V_SCALE

    ctes = [
        f"""{vp}0 AS (SELECT list_transform(generate_series(1, {_PC1_DIMS}),
                          x -> {V_SCALE}::BIGINT) AS v)"""
    ]
    for k in range(1, iters + 1):
        ctes += [
            f"""{vp}d{k} AS MATERIALIZED (
  SELECT vec_id, cq,
    list_sum(list_transform(list_zip(cq, w.v), s -> s[1] * s[2]))::BIGINT
      AS dot
  FROM {src}, {vp}{k - 1} w)""",
            f"{vp}dv{k} AS (SELECT (max(abs(dot)) // {S_SCALE} + 1) AS dv"
            f" FROM {vp}d{k})",
            f"""{vp}u{k} AS MATERIALIZED (
  SELECT d, sum(x * s)::BIGINT AS u
  FROM (SELECT unnest(cq) AS x, generate_subscripts(cq, 1) AS d,
               (dot // w.dv) AS s
        FROM {vp}d{k}, {vp}dv{k} w)
  GROUP BY d)""",
            f"""{vp}{k} AS (
  SELECT list(u // w.um ORDER BY d) AS v
  FROM {vp}u{k},
       (SELECT (max(abs(u)) // {V_SCALE} + 1) AS um FROM {vp}u{k}) w)""",
        ]
    return ctes


def _pc1_sql() -> str:
    """Unrolled replay of power_iteration_pc1: same quantization as the
    k-means twin, floor per-dim mean, then per iteration the dot pass,
    the data-adaptive trunc-div score, the dims-row update, and L∞
    renormalization."""
    ctes = _pc_base_ctes() + _pc_iter_ctes("cent", "v", _PC1_ITERS)
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT c.vec_id,
  list_sum(list_transform(list_zip(c.cq, w.v), s -> s[1] * s[2]))::BIGINT
    AS pc1_proj
FROM cent c, v{_PC1_ITERS} w
"""


def embedding_top2_pcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X61+: top-2 principal projections — PC1 power iteration, then
    DIVISION-FREE integer Gram-Schmidt deflation (``cq·(vd·vd) −
    vd·(vd·cq)``, exactly orthogonal in BIGINTs), then power iteration
    on the renormalized deflated frame
    (``pca.power_iteration_top2``)."""
    from ig_etl_sync_spark.operators.pca import power_iteration_top2

    emb = _t(spark, sf_dir, "embeddings")
    return power_iteration_top2(emb, iters=_PC1_ITERS, dims=_PC1_DIMS)


def _pc2_sql() -> str:
    """PC1 chain + exact integer deflation + the second unroll."""
    from ig_etl_sync_spark.operators.pca import D_SCALE, Q_SCALE, V_SCALE

    ctes = _pc_base_ctes() + _pc_iter_ctes("cent", "v", _PC1_ITERS)
    ctes += [
        f"""vd AS (SELECT list_transform(v, x -> x // {V_SCALE // D_SCALE})
                  AS vd FROM v{_PC1_ITERS})""",
        """s2 AS (SELECT CASE WHEN s = 0 THEN 1 ELSE s END AS s2 FROM
  (SELECT list_sum(list_transform(vd, x -> x * x))::BIGINT AS s FROM vd))""",
        """defl AS MATERIALIZED (
  SELECT vec_id,
         list_transform(list_zip(cq, w.vd),
                        s -> s[1] * t.s2 - s[2] * p) AS cq2
  FROM (SELECT vec_id, cq,
               list_sum(list_transform(list_zip(cq, w2.vd),
                                       s -> s[1] * s[2]))::BIGINT AS p
        FROM cent, vd w2) b, vd w, s2 t)""",
        f"""mm AS (SELECT (max(list_max(list_transform(cq2, x -> abs(x))))
                  ::BIGINT // {Q_SCALE} + 1) AS qd FROM defl)""",
        """cent2 AS MATERIALIZED (
  SELECT vec_id, list_transform(cq2, x -> x // w.qd) AS cq
  FROM defl, mm w)""",
    ]
    ctes += _pc_iter_ctes("cent2", "w", _PC1_ITERS)
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT a.vec_id, a.pc1_proj, b.pc2_proj
FROM (SELECT c.vec_id,
        list_sum(list_transform(list_zip(c.cq, w.v),
                                s -> s[1] * s[2]))::BIGINT AS pc1_proj
      FROM cent c, v{_PC1_ITERS} w) a
JOIN (SELECT c.vec_id,
        list_sum(list_transform(list_zip(c.cq, w.v),
                                s -> s[1] * s[2]))::BIGINT AS pc2_proj
      FROM cent2 c, w{_PC1_ITERS} w) b USING (vec_id)
"""


#: the synthetic documents are single-line unpunctuated word soup, so the
#: contract query first shapes them into alternating 6-word terminated /
#: 4-word unterminated lines with ONE regex both engines share — otherwise
#: every C4 verdict is the same constant and the hash proves nothing.
_C4_SHAPE_PAT = r"((\w+ ){5}\w+) ((\w+ ){3}\w+) "


def c4_line_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4+: the C4 line-level cleaning pass over documents
    (``textops.c4_line_filters``) — keep prose-looking lines (terminal
    punctuation, >=5 words, no policy phrases), judge the doc, and emit
    the cleaned text itself.  All exact string/integer predicates."""
    from ig_etl_sync_spark.operators.textops import c4_line_filters

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(F.col("text"), _C4_SHAPE_PAT, "$1.\n$3\n").alias(
            "text"
        ),
    )
    return c4_line_filters(docs)


def _c4_sql() -> str:
    from ig_etl_sync_spark.operators.textops import (
        C4_DOC_DROP_LOWER,
        C4_LINE_DROP_PHRASES,
        C4_MIN_KEPT_LINES,
        C4_MIN_WORDS_PER_LINE,
    )

    no_phrase = " AND ".join(
        f"NOT contains(lower(ln), '{p}')" for p in C4_LINE_DROP_PHRASES
    )
    words = "list_filter(string_split_regex(trim(ln), '\\s+'), w -> w <> '')"
    shape_pat = _C4_SHAPE_PAT
    return f"""
WITH shaped AS (
  SELECT doc_id,
    regexp_replace(text, '{shape_pat}',
                   '\\1.' || chr(10) || '\\3' || chr(10), 'g') AS text
  FROM documents),
staged AS MATERIALIZED (
  SELECT doc_id,
    len(list_filter(string_split_regex(text, '\\n'),
                    ln -> trim(ln) <> ''))::BIGINT AS n_lines,
    list_filter(string_split_regex(text, '\\n'),
        ln -> trim(ln) <> ''
          AND regexp_matches(rtrim(ln), '[.!?"]$')
          AND len({words}) >= {C4_MIN_WORDS_PER_LINE}
          AND {no_phrase}) AS kept,
    NOT contains(lower(text), '{C4_DOC_DROP_LOWER[0]}') AS f_no_lorem,
    NOT contains(text, chr(123)) AS f_no_brace
  FROM shaped)
SELECT doc_id, n_lines,
  len(kept)::BIGINT AS kept_lines,
  coalesce(list_sum(list_transform(kept, ln -> len({words}))), 0)::BIGINT
    AS kept_words,
  f_no_lorem, f_no_brace,
  (len(kept) >= {C4_MIN_KEPT_LINES}) AS f_min_lines,
  (f_no_lorem AND f_no_brace AND len(kept) >= {C4_MIN_KEPT_LINES}) AS keep,
  coalesce(array_to_string(kept, chr(10)), '') AS clean_text
FROM staged
"""


_SPLIT_VAL_PPM = 250_000


def corpus_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe holdout: every document of a source lands in the
    same split (md5 group draw); per-source assignment plus doc/char
    tallies."""
    from ig_etl_sync_spark.operators.dataprep import group_holdout_split

    docs = _t(spark, sf_dir, "documents")
    return (
        group_holdout_split(docs, "source", val_ppm=_SPLIT_VAL_PPM)
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


def _group_split_sql() -> str:
    h = _MD5_INT_SQL.format(x="source")
    return f"""
SELECT source,
       CASE WHEN {h} % 1000000 < {_SPLIT_VAL_PPM}
            THEN 'val' ELSE 'train' END AS split,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS n_chars
FROM documents GROUP BY source, split
"""


def cross_corpus_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: the odd-md5 half of documents is the NEW
    batch, the even-md5 half the standing REFERENCE; band join is
    strictly new x ref (``dedup.cross_corpus_near_dups``)."""
    from ig_etl_sync_spark.functions.hashing import md5_int32

    docs = _t(spark, sf_dir, "documents")
    parity = md5_int32(F.col("doc_id").cast("string")) % 2
    return D.cross_corpus_near_dups(
        docs.where(parity == 1), docs.where(parity == 0), threshold=0.7
    )


def _cross_corpus_sql() -> str:
    h = _MD5_INT_SQL.format(x="doc_id::VARCHAR")
    # The combined-banding pair set filtered to parity-mixed pairs is
    # exactly the new x ref band join (band hashes depend only on the
    # signature), so the shared minhash CTE chain oracles this too.
    return f"""
WITH {_minhash_pair_ctes('documents')}
SELECT CASE WHEN {h.replace('doc_id', 'id_a')} % 2 = 1 THEN id_a ELSE id_b END AS new_id,
       CASE WHEN {h.replace('doc_id', 'id_a')} % 2 = 1 THEN id_b ELSE id_a END AS ref_id,
       jaccard
FROM mh_pairs
WHERE jaccard >= 0.7
  AND {h.replace('doc_id', 'id_a')} % 2 <> {h.replace('doc_id', 'id_b')} % 2
"""


def embedding_standardized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-scores (exploded form) via the exact-integer
    moments of ``similarity.standardize_embeddings``."""
    from ig_etl_sync_spark.operators.similarity import standardize_embeddings

    return standardize_embeddings(_t(spark, sf_dir, "embeddings"))


def _standardize_sql() -> str:
    return """
WITH ex AS (
  SELECT vec_id, (u.p - 1)::INTEGER AS pos, u.q AS q
  FROM (SELECT vec_id,
               unnest(list_transform(embedding,
                      (x, i) -> {'p': i,
                                 'q': floor(x::DOUBLE * 1000)::BIGINT})) AS u
        FROM embeddings) t),
st AS (
  SELECT pos, count(*)::BIGINT AS n, sum(q)::BIGINT AS s,
         sum(q * q)::BIGINT AS ss
  FROM ex GROUP BY pos)
SELECT ex.vec_id, ex.pos,
       CASE WHEN st.n * st.ss - st.s * st.s <= 0 THEN 0.0
            ELSE (st.n * ex.q - st.s)::DOUBLE
                 / sqrt((st.n * st.ss - st.s * st.s)::DOUBLE)
       END AS z
FROM ex JOIN st USING (pos)
"""


def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic JL projection of the 64-d embeddings to 8 exact
    fixed-point coordinates (``similarity.random_projection``)."""
    from ig_etl_sync_spark.operators.similarity import random_projection

    return random_projection(_t(spark, sf_dir, "embeddings"), out_dim=8)


def _random_projection_sql() -> str:
    entries = []
    for p in range(8):
        w = "[" + ", ".join(
            str(x) for x in S.hyperplane_weights(p, 64)
        ) + "]::BIGINT[]"
        entries.append(
            f"{{'p': {p}, 'y': (list_sum(list_transform(generate_series(1, 64), "
            f"i -> q[i] * ({w})[i])))::BIGINT::DOUBLE / 1000000.0}}"
        )
    return f"""
WITH q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x -> floor(x::DOUBLE * 1000)::BIGINT) AS q
  FROM embeddings)
SELECT vec_id, u.p::INTEGER AS pos, u.y AS y
FROM (SELECT vec_id, unnest([{', '.join(entries)}]) AS u FROM q) t
"""


def session_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-session analysis: overlap-join the sessions of users
    0-7 against every other user's sessions via the time-bucket-blocked
    ``temporal.interval_overlap_join`` (exactly-once emission in
    max(starts)'s bucket); the oracle is the direct inequality join, so
    a hash match proves the blocking is lossless AND duplicate-free."""
    from ig_etl_sync_spark.operators.sessions import session_intervals
    from ig_etl_sync_spark.operators.temporal import interval_overlap_join

    iv = session_intervals(_t(spark, sf_dir, "events"))
    out = interval_overlap_join(
        iv.where(F.col("user_id") < 8),
        iv.where(F.col("user_id") >= 8),
        bucket_micros=3_600_000_000,
    )
    return out.select(
        F.col("a_user_id"),
        F.col("a_session_id"),
        F.col("b_user_id"),
        F.col("b_session_id"),
        "overlap_us",
    )


_MIXTURE_PPM = {
    "en": 400_000, "de": 150_000, "fr": 150_000, "es": 150_000,
    "zh": 150_000,
}


def corpus_mixture_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture recipe → per-language keep rates over documents
    (``dataprep.mixture_sampling_rates``): exact integer planning."""
    from ig_etl_sync_spark.operators.dataprep import mixture_sampling_rates

    return mixture_sampling_rates(
        _t(spark, sf_dir, "documents"), "lang", _MIXTURE_PPM
    )


def _mixture_sql() -> str:
    toks = _TOKENS_SQL.format(x="text")
    vals = ", ".join(f"('{k}', {v})" for k, v in sorted(_MIXTURE_PPM.items()))
    return f"""
WITH targets(lang, target_ppm) AS (VALUES {vals}),
toks AS MATERIALIZED (
  SELECT d.lang, sum(len({toks}))::BIGINT AS tokens, t.target_ppm::BIGINT
             AS target_ppm
  FROM documents d JOIN targets t ON d.lang = t.lang
  GROUP BY d.lang, t.target_ppm),
cap AS (SELECT min(tokens * 1000000 // target_ppm)::BIGINT AS t_cap FROM toks)
SELECT lang, tokens, target_ppm,
       ((t_cap * target_ppm // 1000000) * 1000000 // tokens)::BIGINT
           AS keep_ppm
FROM toks, cap
"""


_UNIMAX_EPOCHS = 2
_UNIMAX_BUDGET_PPM = 1_500_000  # 1.5 corpus passes worth of tokens


def unimax_lang_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X101: UniMax budget-driven language allocation
    (``dataprep.unimax_allocation``) — water-filling with a 2-epoch
    repeat cap; the up-sampling complement to X52's downsample-only
    recipe. At every SF the four tail languages cap at 2 epochs and
    ``en`` absorbs the remainder."""
    from ig_etl_sync_spark.operators.dataprep import unimax_allocation

    return unimax_allocation(
        _t(spark, sf_dir, "documents"),
        "lang",
        epochs=_UNIMAX_EPOCHS,
        budget_ppm=_UNIMAX_BUDGET_PPM,
    )


def _unimax_ctes() -> str:
    """The UniMax water-filling chain through ``alloc`` — shared by the
    X101 oracle and X104's plan-realization oracle."""
    toks = _TOKENS_SQL.format(x="text")
    e, bp = _UNIMAX_EPOCHS, _UNIMAX_BUDGET_PPM
    return f"""toks AS MATERIALIZED (
  SELECT lang, sum(len({toks}))::BIGINT AS n_tokens
  FROM documents GROUP BY lang),
base AS (
  SELECT lang, n_tokens, ({e} * n_tokens)::BIGINT AS cap_tokens,
         (sum(n_tokens) OVER () * {bp} // 1000000)::BIGINT AS b_budget,
         count(*) OVER ()::BIGINT AS k,
         row_number() OVER (ORDER BY {e} * n_tokens, lang)::BIGINT AS i,
         coalesce(sum({e} * n_tokens) OVER (
             ORDER BY {e} * n_tokens, lang
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0)::BIGINT AS cum_before
  FROM toks),
flags AS (
  SELECT *, CASE WHEN cap_tokens * (k - i + 1) <= b_budget - cum_before
            THEN 1 ELSE 0 END AS flag
  FROM base),
cp AS (
  SELECT *, min(flag) OVER (ORDER BY cap_tokens, lang
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS capped
  FROM flags),
fin AS (
  SELECT *,
    coalesce(sum(CASE WHEN capped THEN cap_tokens END) OVER (), 0)::BIGINT
        AS s_capped,
    sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER ()::BIGINT AS p,
    sum(CASE WHEN capped THEN 0 ELSE 1 END) OVER (ORDER BY cap_tokens, lang
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS ur
  FROM cp),
alloc AS (
  SELECT lang, n_tokens, cap_tokens, capped,
    (CASE WHEN capped THEN cap_tokens
          ELSE (b_budget - s_capped) // (k - p)
               + CASE WHEN ur <= (b_budget - s_capped) % (k - p)
                 THEN 1 ELSE 0 END
     END)::BIGINT AS alloc_tokens
  FROM fin)"""


def _unimax_sql() -> str:
    return f"""
WITH {_unimax_ctes()}
SELECT lang, n_tokens, cap_tokens, capped, alloc_tokens,
       (CASE WHEN n_tokens = 0 THEN 0
             ELSE alloc_tokens * 1000000 // n_tokens END)::BIGINT
           AS epochs_ppm
FROM alloc
"""


def unimax_realized_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X104: materialize the X101 plan into the repeated-doc relation a
    training run consumes (``dataprep.realize_sampling_plan``): whole
    epochs by explode, the fractional epoch by an unbiased seeded md5
    draw per doc — replayable, no RNG state."""
    from ig_etl_sync_spark.operators.dataprep import (
        realize_sampling_plan,
        unimax_allocation,
    )

    docs = _t(spark, sf_dir, "documents")
    plan = unimax_allocation(
        docs, "lang", epochs=_UNIMAX_EPOCHS, budget_ppm=_UNIMAX_BUDGET_PPM
    )
    return realize_sampling_plan(docs, plan, group_col="lang").select(
        "doc_id", "lang", "n_copies", "copy"
    )


def _unimax_realize_sql() -> str:
    draw = _MD5_INT_SQL.format(x="'realize:' || d.doc_id::VARCHAR")
    return f"""
WITH {_unimax_ctes()},
plan AS (
  SELECT lang,
         (CASE WHEN n_tokens = 0 THEN 0
               ELSE alloc_tokens * 1000000 // n_tokens END)::BIGINT
             AS epochs_ppm
  FROM alloc),
realized AS (
  SELECT d.doc_id, d.lang,
         (p.epochs_ppm // 1000000
          + CASE WHEN {draw} % 1000000 < p.epochs_ppm % 1000000
            THEN 1 ELSE 0 END)::BIGINT AS n_copies
  FROM documents d JOIN plan p USING (lang))
SELECT doc_id, lang, n_copies,
       unnest(generate_series(0, (n_copies - 1)::INT))::BIGINT AS "copy"
FROM realized WHERE n_copies > 0
"""


def doc_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer unigram surprisal scores
    (``textops.unigram_surprisal``) — float-log-free perplexity proxy."""
    from ig_etl_sync_spark.operators.textops import unigram_surprisal

    return unigram_surprisal(_t(spark, sf_dir, "documents"))


def _surprisal_sql() -> str:
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    return f"""
WITH ex AS MATERIALIZED (
  SELECT doc_id, unnest({toks}) AS term FROM documents),
tf AS MATERIALIZED (
  SELECT term, count(*)::BIGINT AS tf FROM ex GROUP BY term),
tot AS (SELECT sum(tf)::BIGINT AS n FROM tf)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       (sum(length(bin(n // tf)) - 1)::BIGINT * 1000000
        // count(*)::BIGINT) AS surprisal_ppm
FROM ex JOIN tf USING (term), tot
GROUP BY doc_id
"""


_DSIR_BUCKETS = 256
_DSIR_TARGET = ("src0", "src1", "src2")


def dsir_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance scores (``dataprep.dsir_importance``):
    hashed unigram+bigram LM likelihood ratio in exact floor-log2
    integers; target distribution = three sources, pool = the rest."""
    from ig_etl_sync_spark.operators.dataprep import dsir_importance

    docs = _t(spark, sf_dir, "documents")
    return dsir_importance(
        docs,
        F.col("source").isin(*_DSIR_TARGET),
        buckets=_DSIR_BUCKETS,
    )


def _dsir_sql() -> str:
    """Replay: same tokenization, same index-lambda bigrams, same md5
    bucket hash, same per-bucket floor-log2 weights (the length(bin())
    ``-1`` cancels in every difference, so it is omitted)."""
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    tgt = ", ".join(f"'{s}'" for s in _DSIR_TARGET)
    b = _DSIR_BUCKETS
    return f"""
WITH tk AS MATERIALIZED (
  SELECT doc_id, source IN ({tgt}) AS is_t, {toks} AS t FROM documents),
g AS MATERIALIZED (
  SELECT doc_id, is_t,
         list_concat(t, CASE WHEN len(t) >= 2
           THEN list_transform(t[1:len(t)-1], (x,i) -> x || ' ' || t[i+1])
           ELSE [] END) AS grams FROM tk),
ex AS MATERIALIZED (
  SELECT doc_id, is_t, {_MD5_INT_SQL.format(x="gram")} % {b} AS b
  FROM (SELECT doc_id, is_t, unnest(grams) AS gram FROM g) u),
c AS MATERIALIZED (
  SELECT b, sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS ct,
         sum(CASE WHEN is_t THEN 0 ELSE 1 END)::BIGINT AS cr
  FROM ex GROUP BY b),
w AS MATERIALIZED (
  SELECT b, (length(bin(ct + 1)) - length(bin(cr + 1)))::BIGINT AS wb FROM c),
tot AS (SELECT (length(bin(sum(cr)::BIGINT + {b}))
              - length(bin(sum(ct)::BIGINT + {b})))::BIGINT AS shift FROM c)
SELECT doc_id, count(*)::BIGINT AS n_grams,
       (sum(wb)::BIGINT + count(*)::BIGINT * shift)::BIGINT AS dsir_bits
FROM ex JOIN w USING (b), tot
WHERE NOT is_t
GROUP BY doc_id, shift
"""


_PROBE_ITERS, _PROBE_LR = 5, 512


def quality_probe_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-point linear-probe training
    (``linear.linear_probe_train``): fit is-English from (bias, length,
    token-count) features by 5 full-batch GD sweeps — the engine
    TRAINS the quality filter it applies, and the whole trajectory
    replays as unrolled CTEs (k-means/PageRank discipline)."""
    from ig_etl_sync_spark.operators.linear import linear_probe_train
    from ig_etl_sync_spark.operators.textops import token_count

    docs = _t(spark, sf_dir, "documents")
    feats = docs.select(
        F.lit(1024).cast("long").alias("bias"),
        F.expr("least(n_chars, 2048) div 2").cast("long").alias("len_feat"),
        (F.least(token_count(F.col("text")), F.lit(512)) * 2)
        .cast("long")
        .alias("tok_feat"),
        F.when(F.col("lang") == "en", F.lit(1024))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_en"),
    )
    return linear_probe_train(
        feats,
        ["bias", "len_feat", "tok_feat"],
        "is_en",
        iters=_PROBE_ITERS,
        lr_num=_PROBE_LR,
    )


def _probe_sql() -> str:
    from ig_etl_sync_spark.operators.linear import W_SCALE, X_SCALE

    toks = _TOKENS_SQL.format(x="text")
    dot = "x0*w0 + x1*w1 + x2*w2"
    ctes = [
        f"""d AS MATERIALIZED (
  SELECT 1024::BIGINT AS x0,
         (least(n_chars, 2048) // 2)::BIGINT AS x1,
         (least(len({toks}), 512) * 2)::BIGINT AS x2,
         (CASE WHEN lang = 'en' THEN 1024 ELSE 0 END)::BIGINT AS y
  FROM documents)""",
        "c0 AS (SELECT 0::BIGINT AS w0, 0::BIGINT AS w1, 0::BIGINT AS w2)",
    ]
    for i in range(1, _PROBE_ITERS + 1):
        ctes.append(
            f"""g{i} AS (
  SELECT sum(x0*r)::BIGINT AS g0, sum(x1*r)::BIGINT AS g1,
         sum(x2*r)::BIGINT AS g2, count(*)::BIGINT AS n,
         min(w0)::BIGINT AS w0, min(w1)::BIGINT AS w1,
         min(w2)::BIGINT AS w2
  FROM (SELECT x0, x1, x2, w0, w1, w2,
               ({dot}) // {W_SCALE} - y AS r
        FROM d, c{i - 1}) t)"""
        )
        ctes.append(
            f"""c{i} AS (
  SELECT (w0 - ({_PROBE_LR} * (g0 // n)) // {X_SCALE})::BIGINT AS w0,
         (w1 - ({_PROBE_LR} * (g1 // n)) // {X_SCALE})::BIGINT AS w1,
         (w2 - ({_PROBE_LR} * (g2 // n)) // {X_SCALE})::BIGINT AS w2
  FROM g{i})"""
        )
    last = f"c{_PROBE_ITERS}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT min(w0)::BIGINT AS w_bias, min(w1)::BIGINT AS w_len_feat,
       min(w2)::BIGINT AS w_tok_feat,
       sum(abs(({dot}) // {W_SCALE} - y))::BIGINT AS l1_loss
FROM d, {last}
"""
    )


SESSION_OVERLAP_SQL = """
WITH flagged AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), tagged AS (
    SELECT user_id, ts,
           (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
    FROM flagged
), iv AS MATERIALIZED (
    SELECT user_id, session_id,
           epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
    FROM tagged GROUP BY user_id, session_id)
SELECT a.user_id AS a_user_id, a.session_id AS a_session_id,
       b.user_id AS b_user_id, b.session_id AS b_session_id,
       (least(a.end_us, b.end_us) - greatest(a.start_us, b.start_us))::BIGINT
           AS overlap_us
FROM iv a JOIN iv b
  ON a.user_id < 8 AND b.user_id >= 8
 AND a.start_us <= b.end_us AND b.start_us <= a.end_us
"""


_BPE_MERGES, _BPE_MIN_FREQ = 8, 2


def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction (``operators/bpe.bpe_merge_table``):
    8 merges learned from the corpus word-frequency dictionary —
    BIGINT pair counts, (count DESC, pair ASC) argmax, canonical
    left-to-right merge application. The per-round argmax is a
    bounded one-row collect (the k-means-codebook loop pattern); the
    oracle replays each round as unrolled materialized CTEs."""
    from ig_etl_sync_spark.operators.bpe import bpe_merge_table as learn

    docs = _t(spark, sf_dir, "documents")
    return learn(docs, num_merges=_BPE_MERGES, min_freq=_BPE_MIN_FREQ)


def _bpe_sql() -> str:
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    ctes = [
        f"""tok AS (SELECT unnest({toks}) AS w FROM documents),
d0 AS MATERIALIZED (
  SELECT w, count(*)::BIGINT AS f,
         array_to_string(list_transform(generate_series(1, length(w)),
                                        i -> substr(w, i, 1)), ' ')
           || ' </w>' AS s
  FROM tok GROUP BY w)"""
    ]
    for r in range(1, _BPE_MERGES + 1):
        p = r - 1
        l_, r_ = f"(SELECT l FROM b{r})", f"(SELECT r FROM b{r})"
        ctes.append(
            f"""px{r} AS (SELECT f, string_split(s, ' ') AS a FROM d{p}),
pp{r} AS (
  SELECT f, unnest(list_filter(
      list_transform(generate_series(1, len(a)),
                     i -> struct_pack(l := a[i], r := a[i+1])),
      q -> q.r IS NOT NULL)) AS q
  FROM px{r}),
p{r} AS MATERIALIZED (
  SELECT q.l AS l, q.r AS r, sum(f)::BIGINT AS pf FROM pp{r}
  GROUP BY q.l, q.r),
b{r} AS MATERIALIZED (
  SELECT l, r, pf FROM p{r} WHERE pf >= {_BPE_MIN_FREQ}
  ORDER BY pf DESC, l ASC, r ASC LIMIT 1),
d{r} AS MATERIALIZED (
  SELECT w, f,
         CASE WHEN (SELECT count(*) FROM b{r}) = 1 THEN
           trim(regexp_replace(
             replace(' ' || replace(s, ' ', '  ') || ' ',
                     ' ' || {l_} || '  ' || {r_} || ' ',
                     ' ' || {l_} || {r_} || ' '),
             ' +', ' ', 'g'))
         ELSE s END AS s
  FROM d{p})"""
        )
    rows = "\nUNION ALL ".join(
        f'SELECT {r}::BIGINT AS rank, l AS "left", r AS "right",'
        f" l || r AS merged, pf AS pair_freq FROM b{r}"
        for r in range(1, _BPE_MERGES + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT * FROM ({rows}) ORDER BY rank"


def bpe_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE table (``operators/bpe.bpe_segment``):
    per-document subword token counts. The Spark side replays the
    merge chain as a fused replace expression per word occurrence;
    the oracle instead reads the unrolled chain's FINAL dict (its
    ``s`` column is the fully merged segmentation) — two independent
    computation paths that must count identically."""
    from ig_etl_sync_spark.operators.bpe import bpe_merge_table as learn
    from ig_etl_sync_spark.operators.bpe import bpe_segment

    docs = _t(spark, sf_dir, "documents")
    mt = learn(docs, num_merges=_BPE_MERGES, min_freq=_BPE_MIN_FREQ)
    return bpe_segment(docs.select("doc_id", "text"), mt).select(
        "doc_id", "bpe_tokens"
    )


def value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable bottom-k quantile sketch (``sketches.quantile_sketch``):
    per-event-type q25/q50/q90/q99 from the 256 rows with the smallest
    md5(value:id) draw — deterministic uniform row sample, mergeable
    across shards by re-taking the bottom-k, output values are sampled
    elements (zero float arithmetic, no rounding contract needed)."""
    from ig_etl_sync_spark.operators.sketches import quantile_sketch

    ev = _t(spark, sf_dir, "events")
    return quantile_sketch(
        ev, "value", "event_id", k=256, group_cols=("event_type",)
    )


def _value_quantile_sketch_sql() -> str:
    from ig_etl_sync_spark.operators.sketches import quantile_sketch_sql

    return quantile_sketch_sql(
        "value", "event_id", "events", k=256, group_cols=("event_type",)
    )


def _bpe_segment_sql() -> str:
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    base = _bpe_sql().rsplit("\nSELECT * FROM", 1)[0]
    return (
        base
        + f""",
docw AS (SELECT doc_id, unnest({toks}) AS w FROM documents)
SELECT doc_id, sum(len(string_split(s, ' ')))::BIGINT AS bpe_tokens
FROM docw JOIN d{_BPE_MERGES} USING (w)
GROUP BY doc_id
"""
    )


def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X79: tokenizer fertility report — raw chars per induced-BPE
    subword token, grouped by language (the standard "is the tokenizer
    fair to each language" audit; low fertility = the vocabulary
    over-fragments that language). Composes the X56 trainer + apply
    path; exact-integer ppm."""
    from ig_etl_sync_spark.operators.bpe import bpe_merge_table as learn
    from ig_etl_sync_spark.operators.bpe import bpe_segment

    docs = _t(spark, sf_dir, "documents")
    mt = learn(docs, num_merges=_BPE_MERGES, min_freq=_BPE_MIN_FREQ)
    seg = bpe_segment(docs.select("doc_id", "text"), mt).select(
        "doc_id", "bpe_tokens"
    )
    return (
        docs.select("doc_id", "lang", "n_chars")
        .join(seg, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("bpe_tokens").cast("long").alias("bpe_tokens"),
            F.expr("sum(n_chars) * 1000000 div sum(bpe_tokens)")
            .cast("long")
            .alias("fertility_ppm"),
        )
    )


def _bpe_fertility_sql() -> str:
    toks = _TOKENS_SQL.format(x=_NORM_TEXT_SQL.format(x="text"))
    base = _bpe_sql().rsplit("\nSELECT * FROM", 1)[0]
    return (
        base
        + f""",
docw AS (SELECT doc_id, unnest({toks}) AS w FROM documents),
seg AS (
  SELECT doc_id, sum(len(string_split(s, ' ')))::BIGINT AS bpe_tokens
  FROM docw JOIN d{_BPE_MERGES} USING (w)
  GROUP BY doc_id)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(bpe_tokens)::BIGINT AS bpe_tokens,
       (sum(n_chars)::BIGINT * 1000000
        // sum(bpe_tokens)::BIGINT)::BIGINT AS fertility_ppm
FROM documents JOIN seg USING (doc_id)
GROUP BY lang
"""
    )


# ---------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------

# Registry order is DELIBERATE: the driver's CORRECTNESS snapshot samples
# the first ~50 entries, so the queries with the LEAST prior driver
# evidence register FIRST. Round 4: the 12 queries never sampled in any
# of r01-r03 lead, followed by round-4 additions, then round-3's set; the
# relational core (driver-green in r01 AND r02) brings up the rear.
QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    # never driver-sampled across r01-r03 (VERDICT r3 item 1 list)
    "asof_next_purchase": (asof_next_purchase, ASOF_FWD_SQL),
    "click_purchase_attribution": (click_purchase_attribution, ATTRIBUTION_SQL),
    "cms_heavy_users": (cms_heavy_users, CMS_HEAVY_USERS_SQL),
    "fk_violation_counts": (fk_violation_counts, FK_VIOLATIONS_SQL),
    "fuzzy_name_matches": (fuzzy_name_matches, FUZZY_NAME_SQL),
    "table_profile_orders": (table_profile_orders, TABLE_PROFILE_SQL),
    "triangle_counts_cosupply": (triangle_counts_cosupply, TRIANGLES_SQL),
    "triangle_counts_oriented": (triangle_counts_oriented, TRIANGLES_SQL),
    "value_drift_psi": (value_drift_psi, PSI_DRIFT_SQL),
    "value_histogram": (value_histogram, _value_histogram_sql()),
    "value_outlier_stats": (value_outlier_stats, OUTLIER_STATS_SQL),
    "zorder_bucket_stats": (zorder_bucket_stats_li, _zorder_stats_sql()),
    # round-4 additions
    "semantic_dedup_screen": (semantic_dedup_embeddings, _semdedup_sql()),
    "span_coverage_clean": (span_coverage_clean, _span_coverage_sql()),
    "span_coverage_chark": (span_coverage_chark, _span_chark_sql()),
    "doc_bigram_surprisal": (doc_bigram_surprisal, _bigram_surprisal_sql()),
    "doc_backoff_surprisal": (
        doc_backoff_surprisal, _backoff_surprisal_sql(),
    ),
    "backoff_ccnet_buckets": (backoff_ccnet_buckets, _backoff_buckets_sql()),
    "moore_lewis_selection": (moore_lewis_selection, _moore_lewis_sql()),
    "quality_filter_funnel": (quality_filter_funnel_docs, _quality_funnel_sql()),
    "doremi_mixture_weights": (doremi_mixture_weights, _doremi_sql()),
    "curriculum_anneal_order": (curriculum_anneal_order, _curriculum_sql()),
    "streaming_lm_gate_scores": (streaming_lm_gate_scores, _lm_gate_sql()),
    "streaming_mixture_gate_corpus": (
        streaming_mixture_gate_corpus, _mixture_gate_sql(),
    ),
    "longest_dup_span_docs": (longest_dup_span_docs, _longest_span_sql()),
    "training_shuffle_docs": (training_shuffle_docs, _training_shuffle_sql()),
    "user_event_surprisal": (user_event_surprisal, USER_EVENT_SURPRISAL_SQL),
    "span_probe_incremental": (span_probe_incremental, _span_probe_sql()),
    "streaming_span_cut_corpus": (
        streaming_span_cut_corpus, _streaming_span_cut_sql(),
    ),
    "token_balanced_shards": (token_balanced_shards_docs, _token_balance_sql()),
    "table_version_diff": (table_version_diff, TABLE_VERSION_DIFF_SQL),
    "bpe_fertility_by_lang": (bpe_fertility_by_lang, _bpe_fertility_sql()),
    "multimodal_near_dup": (multimodal_near_dup, _multimodal_near_dup_sql()),
    "multimodal_near_dup_scaled": (
        multimodal_near_dup_scaled, _multimodal_near_dup_sql(planes=8),
    ),
    "hard_negative_mining": (
        hard_negative_mining, _hard_negative_sql(planes=8),
    ),
    "label_outlier_screen": (label_outlier_screen, LABEL_OUTLIER_SQL),
    "source_overlap_matrix": (
        source_overlap_matrix_docs, _source_overlap_sql(),
    ),
    "source_overlap_sketch": (
        source_overlap_sketch_docs, _source_overlap_sketch_sql(),
    ),
    "cdc_chunk_dedup": (cdc_chunk_stats_docs, _cdc_chunk_sql()),
    "padding_efficiency": (
        padding_efficiency_docs, _padding_efficiency_sql(),
    ),
    "hybrid_rrf_retrieval": (hybrid_rrf_retrieval, _rrf_sql()),
    "surprisal_ccnet_buckets": (
        surprisal_ccnet_buckets, _surprisal_buckets_sql(),
    ),
    "mmr_context_selection": (mmr_context_selection, _mmr_sql()),
    "quality_score_sweep": (quality_score_sweep, _quality_sweep_sql()),
    "lang_id_confusion": (lang_id_confusion, _lang_confusion_sql()),
    "lsh_recall_audit": (lsh_recall_audit_emb, _lsh_recall_sql()),
    "temporal_split_leakage": (
        temporal_split_leakage_events, TEMPORAL_SPLIT_LEAKAGE_SQL,
    ),
    "transition_predictor_acc": (
        transition_predictor_acc, TRANSITION_PREDICTOR_SQL,
    ),
    "ann_recall_audit": (ann_recall_audit, _ann_recall_sql()),
    "cluster_dilution_audit": (
        cluster_dilution_audit, _cluster_dilution_sql(),
    ),
    "semantic_dedup_design_point": (
        semantic_dedup_design_point, _semdedup_sql(_SEMDEDUP_K_SQL),
    ),
    "dsir_doc_scores": (dsir_doc_scores, _dsir_sql()),
    "embedding_pc1_projection": (embedding_pc1_projection, _pc1_sql()),
    "embedding_top2_pcs": (embedding_top2_pcs, _pc2_sql()),
    "inverted_index_capped": (inverted_index_capped, _inverted_index_capped_sql()),
    "graph_detach_cascade_txnlog": (
        graph_detach_cascade_txnlog, GRAPH_DETACH_CASCADE_SQL,
    ),
    "gopher_quality_checks": (gopher_quality_checks, _gopher_sql()),
    "c4_line_filters": (c4_line_filter_docs, _c4_sql()),
    "corpus_group_split": (corpus_group_split, _group_split_sql()),
    "cross_corpus_near_dup": (cross_corpus_near_dup, _cross_corpus_sql()),
    "embedding_standardized": (embedding_standardized, _standardize_sql()),
    "embedding_random_projection": (
        embedding_random_projection, _random_projection_sql(),
    ),
    "session_overlap_pairs": (session_overlap_pairs, SESSION_OVERLAP_SQL),
    "corpus_mixture_rates": (corpus_mixture_rates, _mixture_sql()),
    "unimax_lang_allocation": (unimax_lang_allocation, _unimax_sql()),
    "unimax_realized_corpus": (
        unimax_realized_corpus, _unimax_realize_sql(),
    ),
    "doc_surprisal": (doc_surprisal, _surprisal_sql()),
    "quality_probe_weights": (quality_probe_weights, _probe_sql()),
    "bpe_merge_table": (bpe_merge_table, _bpe_sql()),
    "bpe_doc_tokens": (bpe_doc_tokens, _bpe_segment_sql()),
    "value_quantile_sketch": (value_quantile_sketch, _value_quantile_sketch_sql()),
    "hll_rollup_customers": (hll_rollup_customers, _hll_rollup_sql()),
    "containment_quotes": (containment_quotes, _containment_sql()),
    "containment_quotes_scaled": (
        containment_quotes_scaled, _containment_scaled_sql(),
    ),
    "pmi_collocations_top": (pmi_collocations_top, _pmi_sql()),
    "vocab_drift_psi": (vocab_drift_psi, _vocab_psi_sql()),
    "winnow_fingerprint_matches": (winnow_fingerprint_matches, _winnow_sql()),
    "rendezvous_shard_counts": (rendezvous_shard_counts, _rendezvous_sql()),
    "multi_touch_credit": (multi_touch_credit, MULTI_TOUCH_SQL),
    "clustering_coeff_cosupply": (clustering_coeff_cosupply, CLUSTERING_COEFF_SQL),
    "embedding_isolation_screen": (
        embedding_isolation_screen, _embedding_isolation_sql(),
    ),
    "embedding_isolation_scaled": (
        embedding_isolation_scaled, _embedding_isolation_sql(planes=8),
    ),
    # round-3 additions
    "cohort_retention_weekly": (cohort_retention_weekly, COHORT_RETENTION_SQL),
    "event_transition_matrix": (event_transition_matrix, TRANSITION_MATRIX_SQL),
    "salted_join_parity": (salted_join_parity, SALTED_JOIN_SQL),
    "resample_ffill_hourly": (resample_ffill_hourly, RESAMPLE_FFILL_SQL),
    "nation_bfs_hops": (nation_bfs_hops, NATION_BFS_SQL),
    "vocab_top_coverage": (vocab_top_coverage, _vocab_coverage_sql()),
    "inverted_index_postings": (inverted_index_postings, _inverted_index_sql()),
    "kmeans_embedding_clusters": (kmeans_embedding_clusters, _kmeans_sql()),
    "kcore_cosupply": (kcore_cosupply, _kcore_sql()),
    "event_value_ntiles": (event_value_ntiles, NTILES_SQL),
    "distinct_users_per_type": (distinct_users_per_type, DISTINCT_USERS_SQL),
    "document_chunks": (document_chunks, _document_chunks_sql()),
    "user_rolling_zscore": (user_rolling_zscore, ROLLING_ZSCORE_SQL),
    "value_winsorized_stats": (value_winsorized_stats, WINSORIZE_SQL),
    "class_balanced_embeddings": (class_balanced_embeddings, CLASS_BALANCE_SQL),
    "user_decay_avg": (user_decay_avg, _decay_avg_sql()),
    "unconverted_clicks": (unconverted_clicks, UNCONVERTED_SQL),
    "conversion_latency_stats": (conversion_latency_stats, CONVERSION_LATENCY_SQL),
    # flagship LLM-pipeline operators (VERDICT r2 item 1 list)
    "training_data_prep": (training_data_prep, _training_prep_sql()),
    "minhash_near_dup": (minhash_near_dup, _minhash_near_dup_sql()),
    "pq_topk_sample": (pq_topk_sample, _pq_topk_sql()),
    "pagerank_trade_graph": (pagerank_cust_supp, _pagerank_sql()),
    "bm25_top_docs": (bm25_top_docs, _bm25_sql()),
    "near_dup_clusters": (near_dup_clusters, _near_dup_clusters_sql()),
    "near_dup_canonical_quality": (
        near_dup_canonical_quality, _near_dup_canonical_sql(),
    ),
    "corpus_source_cap": (corpus_source_cap, CORPUS_SOURCE_CAP_SQL),
    "soft_dedup_doc_weights": (
        soft_dedup_doc_weights, _soft_dedup_weights_sql(),
    ),
    "event_funnel": (event_funnel, FUNNEL_SQL),
    "pii_redaction_check": (pii_redaction_check, _pii_sql()),
    # remaining queries missing from the r02 driver snapshot
    "exact_dedup_fingerprint": (exact_dedup_fingerprint, EXACT_DEDUP_SQL),
    "simhash_near_dup": (simhash_near_dup, _simhash_near_dup_sql()),
    "simhash_near_dup_scaled": (
        simhash_near_dup_scaled, _simhash_near_dup_scaled_sql(),
    ),
    "embedding_near_dup_lsh": (embedding_near_dup_lsh, _embedding_near_dup_lsh_sql()),
    "lsh_topk_sample": (lsh_topk_sample, _lsh_topk_sql()),
    "ivf_topk_sample": (ivf_topk_sample, IVF_TOPK_SQL),
    "embedding_topk": (embedding_topk, EMBEDDING_TOPK_SQL),
    "bitext_margin_pairs": (bitext_margin_pairs, _margin_sql()),
    "bitext_margin_pairs_scaled": (
        bitext_margin_pairs_scaled, _margin_sql(lsh=True),
    ),
    "embedding_norms": (embedding_norms, EMBEDDING_NORMS_SQL),
    "embedding_near_dup": (embedding_near_dup, EMBEDDING_NEAR_DUP_SQL),
    "minhash_signature_check": (minhash_signature_check, _minhash_sql()),
    "ngram_jaccard": (ngram_jaccard, _ngram_jaccard_sql()),
    "ngram_jaccard_scaled": (
        ngram_jaccard_scaled, _ngram_jaccard_scaled_sql(),
    ),
    "simhash_check": (simhash_check, _simhash_sql()),
    "benchmark_decontaminate": (benchmark_decontaminate, _decontaminate_sql()),
    "sequence_packing": (sequence_packing, _sequence_packing_sql()),
    "corpus_sample_stratified": (corpus_sample_stratified, STRATIFIED_SAMPLE_SQL),
    "corpus_sample_token_budget": (corpus_sample_token_budget, TOKEN_BUDGET_SAMPLE_SQL),
    "corpus_sample_weighted": (corpus_sample_weighted, WEIGHTED_SAMPLE_SQL),
    "text_stats_by_lang": (text_stats_by_lang, TEXT_STATS_SQL),
    "text_quality": (text_quality, TEXT_QUALITY_SQL),
    "text_repetition": (text_repetition, TEXT_REPETITION_SQL),
    "lang_id_pred": (lang_id_pred, _lang_id_sql()),
    "tfidf_doc_terms": (tfidf_doc_terms, _tfidf_sql()),
    "kmv_distinct_parts": (kmv_distinct_parts, _kmv_sql()),
    "hll_distinct_customers": (hll_distinct_customers, _hll_sql()),
    "hll_small_range": (hll_small_range, _hll_small_range_sql()),
    "asof_last_purchase": (asof_last_purchase, ASOF_SQL),
    "range_clicks_before_error": (range_clicks_before_error, RANGE_SQL),
    # relational core + transforms (driver-green rows in r01 and r02)
    "q01_pricing_summary": (q01_pricing_summary, Q01_SQL),
    "q02_revenue_by_nation": (q02_revenue_by_nation, Q02_SQL),
    "q03_top_orders": (q03_top_orders, Q03_SQL),
    "q04_segment_top_customers": (q04_segment_top_customers, Q04_SQL),
    "q05_late_shipment_priority": (q05_late_shipment_priority, Q05_SQL),
    "q06_filtered_revenue": (q06_filtered_revenue, Q06_SQL),
    "cdc_creates": (cdc_creates, CDC_CREATES_SQL),
    "cdc_deletes": (cdc_deletes, CDC_DELETES_SQL),
    "graph_edge_validation": (graph_edge_validation, GRAPH_EDGE_VALIDATION_SQL),
    "graph_node_upsert": (graph_node_upsert, GRAPH_NODE_UPSERT_SQL),
    "graph_detach_cascade": (graph_detach_cascade, GRAPH_DETACH_CASCADE_SQL),
    "q07_quantity_stats": (q07_quantity_stats, Q07_SQL),
    "q08_rollup_revenue": (q08_rollup_revenue, Q08_SQL),
    "q09_except_customers": (q09_except_customers, Q09_SQL),
    "q10_customers_without_orders": (q10_customers_without_orders, Q10_SQL),
    "q11_distinct_suppliers_per_brand": (q11_distinct_suppliers_per_brand, Q11_SQL),
    "q12_correlation_stats": (q12_correlation_stats, Q12_SQL),
    "q13_cube_counts": (q13_cube_counts, Q13_SQL),
    "q14_value_percentiles": (q14_value_percentiles, Q14_SQL),
    "q15_small_qty_revenue": (q15_small_qty_revenue, Q15_SQL),
    "q16_large_volume_customers": (q16_large_volume_customers, Q16_SQL),
    "q17_event_navigation": (q17_event_navigation, Q17_SQL),
    "q18_waiting_suppliers": (q18_waiting_suppliers, Q18_SQL),
    "incremental_orders_agg": (incremental_orders_agg, INCREMENTAL_SQL),
    "bloom_words": (bloom_words, BLOOM_WORDS_SQL),
    "bloom_prefilter_stats": (bloom_prefilter_stats, BLOOM_STATS_SQL),
    "span_dup_stats_docs": (span_dup_stats_docs, SPAN_STATS_SQL),
    "span_top_duplicated": (span_top_duplicated, SPAN_TOP_SQL),
    "merkle_bucket_digests": (merkle_bucket_digests, MERKLE_DIGESTS_SQL),
    "merkle_diff_replay": (merkle_diff_replay, CDC_CREATES_SQL),
    "pivot_qty_by_flag": (pivot_qty_by_flag, PIVOT_SQL),
    "unpivot_flag_measures": (unpivot_flag_measures, UNPIVOT_SQL),
    "q19_prospect_customers": (q19_prospect_customers, Q19_SQL),
    "q20_event_range_frames": (q20_event_range_frames, Q20_SQL),
    "q21_min_price_supplier": (q21_min_price_supplier, Q21_SQL),
    "q22_nation_trade_volume": (q22_nation_trade_volume, Q22_SQL),
    "q23_important_parts": (q23_important_parts, Q23_SQL),
    "q24_customer_order_distribution": (q24_customer_order_distribution, Q24_SQL),
    "q25_disjunctive_revenue": (q25_disjunctive_revenue, Q25_SQL),
    "q26_grouping_sets": (q26_grouping_sets, Q26_SQL),
    "nested_explode_roundtrip": (nested_explode_roundtrip, NESTED_EXPLODE_SQL),
    "json_props_extract": (json_props_extract, JSON_PROPS_SQL),
    "variant_props_extract": (variant_props_extract, VARIANT_PROPS_SQL),
    "events_hourly": (events_hourly, EVENTS_HOURLY_SQL),
    "user_top_events": (user_top_events, USER_TOP_EVENTS_SQL),
    "event_sessions": (event_sessions, EVENT_SESSIONS_SQL),
    "user_value_twa": (user_value_twa, TWA_SQL),
    "user_state_history": (user_state_history, _user_state_history_sql()),
    "user_state_at_instant": (user_state_at_instant, _user_state_at_instant_sql()),
    "user_rolling_avg": (user_rolling_avg, ROLLING_SQL),
}


# Round-5 rotation: the driver samples the first ~50 registry entries
# per round, so the queries whose LATEST driver-green row is oldest
# (never sampled, then r01, then r02 — the relational core and CDC/graph
# block both last sampled in r02) lead this round. Everything r03/r04-
# green keeps its literal order behind them.
_DRIVER_ROTATION_R05 = [
    "semantic_dedup_design_point",  # new this round — no driver row yet
    "embedding_isolation_scaled",  # new this round — no driver row yet
    "span_coverage_clean",  # new this round — no driver row yet
    "doc_bigram_surprisal",  # new this round — no driver row yet
    "longest_dup_span_docs",  # new this round — no driver row yet
    "training_shuffle_docs",  # new this round — no driver row yet
    "user_event_surprisal",  # new this round — no driver row yet
    "span_probe_incremental",  # new this round — no driver row yet
    "token_balanced_shards",  # new this round — no driver row yet
    "table_version_diff",  # new this round — no driver row yet
    "bpe_fertility_by_lang",  # new this round — no driver row yet
    "multimodal_near_dup",  # new this round — no driver row yet
    "asof_last_purchase", "range_clicks_before_error",  # latest row r01
    # latest row r02:
    "bloom_prefilter_stats", "bloom_words", "cdc_creates", "cdc_deletes",
    "event_sessions", "events_hourly", "graph_detach_cascade",
    "graph_edge_validation", "graph_node_upsert", "incremental_orders_agg",
    "json_props_extract", "merkle_bucket_digests", "merkle_diff_replay",
    "nested_explode_roundtrip", "pivot_qty_by_flag",
    "q01_pricing_summary", "q02_revenue_by_nation", "q03_top_orders",
    "q04_segment_top_customers", "q05_late_shipment_priority",
    "q06_filtered_revenue", "q07_quantity_stats", "q08_rollup_revenue",
    "q09_except_customers", "q10_customers_without_orders",
    "q11_distinct_suppliers_per_brand", "q12_correlation_stats",
    "q13_cube_counts", "q14_value_percentiles", "q15_small_qty_revenue",
    "q16_large_volume_customers", "q17_event_navigation",
    "q18_waiting_suppliers", "q19_prospect_customers",
    "q20_event_range_frames", "q21_min_price_supplier",
    "q22_nation_trade_volume", "q23_important_parts",
    "q24_customer_order_distribution", "q25_disjunctive_revenue",
    "q26_grouping_sets", "span_dup_stats_docs", "span_top_duplicated",
    "unpivot_flag_measures", "user_rolling_avg", "user_state_at_instant",
    "user_state_history", "user_top_events", "user_value_twa",
    "variant_props_extract",
]
QUERIES = {
    **{n: QUERIES[n] for n in _DRIVER_ROTATION_R05},
    **{n: v for n, v in QUERIES.items() if n not in set(_DRIVER_ROTATION_R05)},
}

# Round-6 rotation (same mechanism): the driver's r05 snapshot sampled
# the first 50 of the r05 head, so the stalest evidence is now the 2
# round-6 queries (never sampled), the 14 whose latest row is r02
# (q22–q26, span stats, unpivot, user-state/window block), then the 40
# r03-era rows (dedup/similarity family, samplers, text features,
# sketches). 56 entries — the ~6 tail r03 queries ride in r07.
_DRIVER_ROTATION_R06 = [
    "streaming_span_cut_corpus",  # new this round — no driver row yet
    "multimodal_near_dup_scaled",  # new this round — no driver row yet
    "corpus_source_cap",  # new this round — no driver row yet
    "soft_dedup_doc_weights",  # new this round — no driver row yet
    "hard_negative_mining",  # new this round — no driver row yet
    "label_outlier_screen",  # new this round — no driver row yet
    # latest row r02:
    "q22_nation_trade_volume", "q23_important_parts",
    "q24_customer_order_distribution", "q25_disjunctive_revenue",
    "q26_grouping_sets", "span_dup_stats_docs", "span_top_duplicated",
    "unpivot_flag_measures", "user_rolling_avg", "user_state_at_instant",
    "user_state_history", "user_top_events", "user_value_twa",
    "variant_props_extract",
    # latest row r03:
    "distinct_users_per_type", "document_chunks", "user_rolling_zscore",
    "value_winsorized_stats", "class_balanced_embeddings",
    "user_decay_avg", "unconverted_clicks", "conversion_latency_stats",
    "training_data_prep", "minhash_near_dup", "pq_topk_sample",
    "pagerank_trade_graph", "bm25_top_docs", "near_dup_clusters",
    "event_funnel", "pii_redaction_check", "exact_dedup_fingerprint",
    "simhash_near_dup", "embedding_near_dup_lsh", "lsh_topk_sample",
    "ivf_topk_sample", "embedding_topk", "embedding_norms",
    "embedding_near_dup", "minhash_signature_check", "ngram_jaccard",
    "simhash_check", "benchmark_decontaminate", "sequence_packing",
    "corpus_sample_stratified", "corpus_sample_token_budget",
    "corpus_sample_weighted", "text_stats_by_lang", "text_quality",
    "text_repetition", "lang_id_pred", "tfidf_doc_terms",
    "kmv_distinct_parts", "hll_distinct_customers", "hll_small_range",
]
QUERIES = {
    **{n: QUERIES[n] for n in _DRIVER_ROTATION_R06},
    **{n: v for n, v in QUERIES.items() if n not in set(_DRIVER_ROTATION_R06)},
}

# Round-7 rotation (same mechanism): front-load the 13 round-6
# second-wave queries that have NEVER appeared in a driver CORRECTNESS
# snapshot (VERDICT r06 "What's wrong #1"), then the 10 whose latest
# driver row is r03, then r04-stale picks to fill the driver's ~50-query
# sample window. `label_outlier_screen` and `cluster_dilution_audit`
# double as the sf1-representative scale probes (VERDICT task 7); their
# sf1 walls are recorded in SCALE.md the same round.
_DRIVER_ROTATION_R07 = [
    # new this round — no driver row yet:
    "moore_lewis_selection", "quality_filter_funnel",
    "doremi_mixture_weights", "curriculum_anneal_order",
    "span_coverage_chark", "doc_backoff_surprisal", "backoff_ccnet_buckets",
    "streaming_lm_gate_scores", "unimax_lang_allocation",
    "bitext_margin_pairs", "bitext_margin_pairs_scaled",
    "source_overlap_sketch", "unimax_realized_corpus",
    "streaming_mixture_gate_corpus", "near_dup_canonical_quality",
    # never driver-checked (round-6 second wave):
    "source_overlap_matrix", "cdc_chunk_dedup", "padding_efficiency",
    "hybrid_rrf_retrieval", "surprisal_ccnet_buckets",
    "mmr_context_selection", "quality_score_sweep", "lang_id_confusion",
    "lsh_recall_audit", "temporal_split_leakage",
    "transition_predictor_acc", "ann_recall_audit",
    "cluster_dilution_audit",
    # sf1-representative scale probe (driver-samples the stress family):
    "label_outlier_screen",
    # latest row r03:
    "text_stats_by_lang", "text_quality", "lang_id_pred",
    "corpus_sample_token_budget", "corpus_sample_weighted",
    "text_repetition", "tfidf_doc_terms", "kmv_distinct_parts",
    "hll_distinct_customers", "hll_small_range",
    # latest row r04:
    "asof_next_purchase", "bpe_doc_tokens", "bpe_merge_table",
    "c4_line_filters", "click_purchase_attribution",
    "clustering_coeff_cosupply", "cms_heavy_users",
    "cohort_retention_weekly", "containment_quotes", "corpus_group_split",
    "corpus_mixture_rates", "cross_corpus_near_dup", "doc_surprisal",
    "dsir_doc_scores", "embedding_isolation_screen",
    "embedding_pc1_projection", "embedding_random_projection",
    "embedding_standardized", "embedding_top2_pcs",
    "event_transition_matrix", "event_value_ntiles",
    "fk_violation_counts", "fuzzy_name_matches", "gopher_quality_checks",
    "graph_detach_cascade_txnlog", "hll_rollup_customers",
    "inverted_index_capped", "inverted_index_postings", "kcore_cosupply",
    "kmeans_embedding_clusters",
]
QUERIES = {
    **{n: QUERIES[n] for n in _DRIVER_ROTATION_R07},
    **{n: v for n, v in QUERIES.items() if n not in set(_DRIVER_ROTATION_R07)},
}

# Round-8 rotation (same mechanism): front-load the 3 sf1-feasible
# scaled twins registered this round (never in a driver snapshot),
# then the cohort whose latest driver row is r04 (the stalest after
# the r07 rotation — derived from the CORRECTNESS_r01..r07 union),
# topped up with the oldest r05 rows to fill the ~50-query window.
# No query's latest driver evidence is older than r05 after this
# snapshot (VERDICT r07 "Next round" #6).
_DRIVER_ROTATION_R08 = [
    # new this round — no driver row yet:
    "ngram_jaccard_scaled", "simhash_near_dup_scaled",
    "containment_quotes_scaled",
    # latest row r04:
    "cross_corpus_near_dup", "doc_surprisal", "dsir_doc_scores",
    "embedding_isolation_screen", "embedding_pc1_projection",
    "embedding_random_projection", "embedding_standardized",
    "embedding_top2_pcs", "event_transition_matrix",
    "event_value_ntiles", "fk_violation_counts", "fuzzy_name_matches",
    "gopher_quality_checks", "graph_detach_cascade_txnlog",
    "hll_rollup_customers", "inverted_index_capped",
    "inverted_index_postings", "kcore_cosupply",
    "kmeans_embedding_clusters", "multi_touch_credit",
    "nation_bfs_hops", "pmi_collocations_top", "quality_probe_weights",
    "rendezvous_shard_counts", "resample_ffill_hourly",
    "salted_join_parity", "semantic_dedup_screen",
    "session_overlap_pairs", "table_profile_orders",
    "triangle_counts_cosupply", "triangle_counts_oriented",
    "value_drift_psi", "value_histogram", "value_outlier_stats",
    "value_quantile_sketch", "vocab_drift_psi", "vocab_top_coverage",
    "winnow_fingerprint_matches", "zorder_bucket_stats",
    # oldest r05 rows (fill to the sample window):
    "asof_last_purchase", "bloom_prefilter_stats", "bloom_words",
    "bpe_fertility_by_lang", "cdc_creates", "cdc_deletes",
    "doc_bigram_surprisal", "embedding_isolation_scaled",
]
QUERIES = {
    **{n: QUERIES[n] for n in _DRIVER_ROTATION_R08},
    **{n: v for n, v in QUERIES.items() if n not in set(_DRIVER_ROTATION_R08)},
}

# Round-9 rotation (same mechanism): front-load the FULL cohort whose
# latest driver row is r05 (the stalest after the r08 rotation — 42
# queries, derived from the CORRECTNESS_r01..r08 union), topped up with
# 8 r06-stale rows to fill the driver's ~50-query sample window —
# preferring the r06 rows whose paths this optimization round touches
# (the CC rework rides near_dup_clusters / soft_dedup_doc_weights /
# training_data_prep; the ingest job-count work rides
# streaming_span_cut_corpus). After this snapshot no query's latest
# driver evidence is older than r06 (VERDICT r08 "Next round" #5).
_DRIVER_ROTATION_R09 = [
    # latest row r05:
    "event_sessions", "events_hourly", "graph_detach_cascade",
    "graph_edge_validation", "graph_node_upsert", "incremental_orders_agg",
    "json_props_extract", "longest_dup_span_docs", "merkle_bucket_digests",
    "merkle_diff_replay", "multimodal_near_dup", "nested_explode_roundtrip",
    "pivot_qty_by_flag", "q01_pricing_summary", "q02_revenue_by_nation",
    "q03_top_orders", "q04_segment_top_customers",
    "q05_late_shipment_priority", "q06_filtered_revenue",
    "q07_quantity_stats", "q08_rollup_revenue", "q09_except_customers",
    "q10_customers_without_orders", "q11_distinct_suppliers_per_brand",
    "q12_correlation_stats", "q13_cube_counts", "q14_value_percentiles",
    "q15_small_qty_revenue", "q16_large_volume_customers",
    "q17_event_navigation", "q18_waiting_suppliers",
    "q19_prospect_customers", "q20_event_range_frames",
    "q21_min_price_supplier", "range_clicks_before_error",
    "semantic_dedup_design_point", "span_coverage_clean",
    "span_probe_incremental", "table_version_diff",
    "token_balanced_shards", "training_shuffle_docs",
    "user_event_surprisal",
    # r06-stale fill, round-9-touched paths first:
    "near_dup_clusters", "soft_dedup_doc_weights",
    "streaming_span_cut_corpus", "training_data_prep",
    "pagerank_trade_graph", "benchmark_decontaminate",
    "sequence_packing", "bm25_top_docs",
]
QUERIES = {
    **{n: QUERIES[n] for n in _DRIVER_ROTATION_R09},
    **{n: v for n, v in QUERIES.items() if n not in set(_DRIVER_ROTATION_R09)},
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue-by-nation multi-join agg at sf0.001."""
    return q02_revenue_by_nation(spark, "/root/testdata/sf0.001")
