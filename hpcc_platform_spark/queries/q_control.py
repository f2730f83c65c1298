"""Control-flow / workflow / distribution coverage (SURVEY.md §2.8, §2.11,
§2.12): LOOP, GRAPH, PIPE, LIMIT, DISTRIBUTE, PERSIST."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from hpcc_platform_spark.operators import (
    distribute_hash,
    graph_loop,
    limit_skip,
    loop_count,
    rollup_adjacent,
)
from hpcc_platform_spark.plans import PersistCache
from hpcc_platform_spark.queries.registry import query, tables
from hpcc_platform_spark.sources.inline import inline_dataset
from hpcc_platform_spark.sources import pipe_through


@query(
    "loop_count",
    oracle="""
    SELECT n_nationkey, CAST(n_nationkey * 8 + 7 AS BIGINT) AS value
    FROM nation
    """,
    category="control",
)
def loop_count_q(spark, sf_dir):
    """LOOP(ds, 3, body) (TAKloopcount :987): three applications of
    v ← 2v+1 starting from the key; the oracle checks the closed form
    8k+7 — proving the driver-side loop re-applies the transform."""
    (nation,) = tables(spark, sf_dir, "nation")
    start = nation.select(
        "n_nationkey", F.col("n_nationkey").cast("long").alias("value")
    )
    out = loop_count(
        start, 3, lambda df, i: df.withColumn("value", F.col("value") * 2 + 1)
    )
    return out


@query(
    "graph_loop",
    oracle="""
    SELECT n_nationkey, CAST(8 AS BIGINT) AS v FROM nation
    """,
    category="control",
)
def graph_loop_q(spark, sf_dir):
    """GRAPH loop (TAKgraphloop :995): body reads BOTH previous results
    (ROWSET semantics) — Fibonacci recurrence v_i = v_{i-1} + v_{i-2}
    from v_0 = 1 gives 8 after 4 steps, checked in closed form."""
    (nation,) = tables(spark, sf_dir, "nation")
    base = nation.select("n_nationkey", F.lit(1).cast("long").alias("v"))

    def body(results, i):
        prev = results[-1].alias("p1")
        prev2 = results[-2 if len(results) >= 2 else -1].alias("p2")
        return prev.join(
            prev2.select(
                F.col("n_nationkey").alias("k2"), F.col("v").alias("v2")
            ),
            F.col("n_nationkey") == F.col("k2"),
        ).select("n_nationkey", (F.col("v") + F.col("v2")).alias("v"))

    return graph_loop(base, 4, body)


@query(
    "pipe_through",
    oracle="SELECT r_regionkey, r_name FROM region",
    category="control",
)
def pipe_through_q(spark, sf_dir):
    """PIPE(ds, 'cat') (TAKpipethrough :922): rows stream through an
    external process per partition with CSV framing; identity command
    proves the ser/de roundtrip."""
    (region,) = tables(spark, sf_dir, "region")
    return pipe_through(
        region.select("r_regionkey", "r_name"),
        ["cat"],
        "r_regionkey int, r_name string",
    )


@query(
    "pipe_through_xml",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    category="control",
)
def pipe_through_xml_q(spark, sf_dir):
    """PIPE with XML framing (the reference's second framing:
    IXmlToRowTransformer, thorlcr/activities/piperead/thprslave.cpp):
    rows serialize as <Row><field>v</field>...</Row> through the external
    process and parse back incrementally; identity command proves the XML
    ser/de roundtrip including entity escaping."""
    (nation,) = tables(spark, sf_dir, "nation")
    return pipe_through(
        nation.select("n_nationkey", "n_name", "n_regionkey"),
        ["cat"],
        "n_nationkey int, n_name string, n_regionkey int",
        framing="xml",
    )


@query(
    "limit_skip",
    oracle="SELECT n_nationkey, n_name FROM nation",
    category="control",
)
def limit_skip_q(spark, sf_dir):
    """LIMIT(ds, n, SKIP) (TAKskiplimit :975): bound not exceeded → dataset
    passes through unchanged (the exceeded path raises/empties — tests/)."""
    (nation,) = tables(spark, sf_dir, "nation")
    return limit_skip(nation.select("n_nationkey", "n_name"), 1000)


@query(
    "distribute_local_agg",
    oracle="""
    SELECT l_orderkey, COUNT(*) AS n_lines, ROUND(SUM(l_quantity), 4) AS qty
    FROM lineitem GROUP BY l_orderkey
    """,
    category="control",
)
def distribute_local_agg(spark, sf_dir):
    """DISTRIBUTE(ds, HASH(key)) + LOCAL aggregate (TAKhashdistribute :905):
    explicit hash partitioning followed by a grouped agg on the same key —
    Catalyst reuses the exchange (no second shuffle), mirroring the
    reference's distribute-once-use-many idiom."""
    (li,) = tables(spark, sf_dir, "lineitem")
    parted = distribute_hash(li, ["l_orderkey"])
    return rollup_adjacent(
        parted,
        ["l_orderkey"],
        [
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 4).alias("qty"),
        ],
    )


@query(
    "persist_cache",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n, ROUND(SUM(c_acctbal), 4) AS total_bal
    FROM customer GROUP BY c_mktsegment
    """,
    category="control",
)
def persist_cache_q(spark, sf_dir):
    """PERSIST (workflow engine, WFModePersist workunit.hpp:585-603):
    content-hash materialization — first call computes+writes parquet,
    repeat calls with unchanged plan+inputs read back. Values identical
    either way (the oracle sees through the cache)."""
    (cust,) = tables(spark, sf_dir, "customer")
    agg = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("c_acctbal"), 4).alias("total_bal"),
    )
    cache = PersistCache(
        spark, os.path.join(tempfile.gettempdir(), "hpcc_platform_spark_persist")
    )
    return cache.persist(agg, "cust_segment_rollup")


@query(
    "catch_row_errors",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_custkey % 7 = 0 THEN -1.0
                ELSE ROUND(o_totalprice / (o_custkey % 7), 4) END AS ratio,
           CAST(o_custkey % 7 = 0 AS BOOLEAN) AS failed
    FROM orders
    """,
    category="control",
)
def catch_row_errors(spark, sf_dir):
    """Row-level CATCH (TAKcatch family :1022-1024): the risky expression
    runs through try_divide — a row error becomes NULL instead of killing
    the stage (the only safe contract at 1000 executors) — then ONFAIL
    substitutes a marker value. SKIP is the same plumbing with a filter
    (operators.catchop.rows_skip_on_null)."""
    from hpcc_platform_spark.operators.catchop import rows_substitute_on_null

    (orders,) = tables(spark, sf_dir, "orders")
    risky = orders.select(
        "o_orderkey",
        F.round(F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 7), 4).alias("ratio"),
    ).withColumn("failed", F.col("ratio").isNull())
    return rows_substitute_on_null(risky, {"ratio": -1.0})


@query(
    "limit_onfail_row",
    oracle="""
    SELECT CAST(-1 AS BIGINT) AS o_orderkey, CAST(-1.0 AS DOUBLE) AS o_totalprice
    WHERE (SELECT COUNT(*) FROM orders) > 100
    """,
    category="control",
)
def limit_onfail_row(spark, sf_dir):
    """LIMIT(ds, n, ONFAIL(transform)) (TAKcreaterowlimit :1009): the bound
    is exceeded, so the dataset collapses to the single ONFAIL marker row.
    The count guard scans only n+1 rows (incremental take), not the input."""
    from pyspark.sql import Row

    from hpcc_platform_spark.operators.limit import limit_onfail

    (orders,) = tables(spark, sf_dir, "orders")
    return limit_onfail(
        orders.select("o_orderkey", "o_totalprice"),
        100,
        Row(o_orderkey=-1, o_totalprice=-1.0),
    )


@query(
    "published_query_stored",
    oracle="""
    SELECT c.c_custkey, c.c_name, ROUND(SUM(o.o_totalprice), 4) AS spend
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY c.c_custkey, c.c_name
    HAVING SUM(o.o_totalprice) > 100000
    """,
    category="control",
)
def published_query_stored(spark, sf_dir):
    """Published query + STORED parameters (Roxie compile-once pattern,
    devdoc/roxie.md:16-37; STORED = workflow inputs): inputs persisted
    once, each request re-plans the parameterized builder against the
    cache — the low-latency serving shape."""
    from hpcc_platform_spark.plans.published import PublishedQuery

    cust, orders = tables(spark, sf_dir, "customer", "orders")

    def builder(inputs, segment: str, min_spend: float):
        c, o = inputs["customer"], inputs["orders"]
        return (
            c.where(F.col("c_mktsegment") == segment)
            .join(o, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_custkey", "c_name")
            .agg(F.round(F.sum("o_totalprice"), 4).alias("spend"))
            .where(F.col("spend") > min_spend)
        )

    q = PublishedQuery({"customer": cust, "orders": orders}, builder)
    try:
        return q(segment="BUILDING", min_spend=100000.0)
    finally:
        pass  # cache stays for the session (published queries serve many calls)


@query(
    "when_success_action",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    category="control",
)
def when_success_action(spark, sf_dir):
    """WHEN/SUCCESS (TAKwhen_dataset :1027, thorlcr/activities/when/):
    the aggregate materializes eagerly and fires the SUCCESS callback (here
    an audit counter); the returned DataFrame reuses the checkpointed
    result — trigger semantics without recompute."""
    from hpcc_platform_spark.operators.workflow import when_action

    (orders,) = tables(spark, sf_dir, "orders")
    agg = (
        orders.where(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    fired = {"success": 0}

    def on_success():
        fired["success"] += 1

    out = when_action(agg, success=on_success)
    assert fired["success"] == 1
    return out


@query(
    "distribute_merge_sorted",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, TRUE AS locally_sorted, TRUE AS ranges_disjoint
    FROM orders
    """,
    category="control",
)
def distribute_merge_sorted(spark, sf_dir):
    """DISTRIBUTE ... MERGE (TAKhashdistributemerge :1032): repartition
    maintaining sort order — Spark's repartitionByRange + sortWithinPartitions
    (sampled range split points, the same design as the reference's sorted
    redistribution). Verified structurally: every partition internally
    sorted AND partition key ranges pairwise disjoint, so the concatenation
    of partitions in range order IS the globally sorted dataset — no merge
    pass needed downstream."""
    import pandas as pd

    (orders,) = tables(spark, sf_dir, "orders")
    dist = (
        orders.select("o_orderkey", "o_custkey")
        .repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey", "o_orderkey")
    )

    def check(pdfs):
        cnt, ok, lo, hi = 0, True, None, None
        for pdf in pdfs:
            if not len(pdf):
                continue
            ok = ok and bool(
                pdf[["o_custkey", "o_orderkey"]]
                .apply(tuple, axis=1)
                .is_monotonic_increasing
            )
            lo = pdf["o_custkey"].iloc[0] if lo is None else lo
            hi = pdf["o_custkey"].iloc[-1]
            cnt += len(pdf)
        yield pd.DataFrame({"cnt": [cnt], "ok": [ok], "lo": [lo], "hi": [hi]})

    parts = [
        r
        for r in dist.mapInPandas(check, "cnt long, ok boolean, lo long, hi long").collect()
        if r.cnt
    ]
    parts.sort(key=lambda r: r.lo)
    disjoint = all(parts[i].hi <= parts[i + 1].lo for i in range(len(parts) - 1))
    n = sum(r.cnt for r in parts)
    return inline_dataset(
        spark,
        [(n, all(r.ok for r in parts), disjoint)],
        "n_rows long, locally_sorted boolean, ranges_disjoint boolean",
    )


@query(
    "loop_transitive_closure",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT n_nationkey AS a, (n_nationkey * 2 + 1) % 25 AS b FROM nation
    ), r AS (
      SELECT 0 AS node
      UNION
      SELECT e.b FROM r JOIN edges e ON e.a = r.node
    )
    SELECT node FROM r
    """,
    category="control",
)
def loop_transitive_closure(spark, sf_dir):
    """LOOP iteration (TAKloopcount :987, thorlcr/activities/loop/):
    transitive closure by path doubling — each round squares the known
    path set (E ∪ E∘E), so ceil(log2(|V|)) rounds reach the fixpoint with
    NO per-round convergence probe. At 1000 executors this is the round
    structure that matters: 5 shuffles for a 25-node diameter instead of
    20 frontier expansions each paying a full job. Oracle: DuckDB
    recursive CTE — identical fixpoint."""
    import math

    from hpcc_platform_spark.operators.loop import loop_count

    (nation,) = tables(spark, sf_dir, "nation")
    edges = nation.select(
        F.col("n_nationkey").alias("a"),
        ((F.col("n_nationkey") * 2 + 1) % 25).alias("b"),
    )
    n_nodes = 25
    rounds = math.ceil(math.log2(n_nodes))

    # Per-round partitioning: keyed repartition sized to the cluster (NOT
    # coalesce(1) — that serializes every round through one task). The path
    # set stays hash-partitioned by join key `a` across rounds, so each
    # squaring join reuses the partitioning.
    n_parts = max(2, spark.sparkContext.defaultParallelism)

    def square(paths, _i):
        hop = paths.select(F.col("a").alias("x"), F.col("b").alias("m")).join(
            paths.select(F.col("a").alias("m"), F.col("b").alias("y")), "m"
        ).select(F.col("x").alias("a"), F.col("y").alias("b"))
        return paths.unionAll(hop).distinct().repartition(n_parts, F.col("a"))

    closure = loop_count(edges, rounds, square, checkpoint_every=2)
    reach = closure.where(F.col("a") == 0).select(F.col("b").alias("node"))
    start = inline_dataset(spark, [(0,)], "node long")
    return start.unionAll(reach).distinct()

@query(
    "graph_pagerank",
    oracle="""
    WITH edges AS (
      SELECT n_nationkey AS src, (n_nationkey * 2 + 1) % 25 AS dst FROM nation
      UNION ALL
      SELECT n_nationkey, (n_nationkey * 3 + 2) % 25 FROM nation
    ), deg AS (
      SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
    ), r0 AS (
      SELECT n_nationkey AS node, 1.0 / 25 AS rank FROM nation
    ), r1 AS (
      SELECT n.n_nationkey AS node,
             0.15 / 25 + 0.85 * COALESCE(SUM(r0.rank / deg.outdeg), 0) AS rank
      FROM nation n
      LEFT JOIN edges e ON e.dst = n.n_nationkey
      LEFT JOIN r0 ON r0.node = e.src
      LEFT JOIN deg ON deg.src = e.src
      GROUP BY n.n_nationkey
    ), r2 AS (
      SELECT n.n_nationkey AS node,
             0.15 / 25 + 0.85 * COALESCE(SUM(r1.rank / deg.outdeg), 0) AS rank
      FROM nation n
      LEFT JOIN edges e ON e.dst = n.n_nationkey
      LEFT JOIN r1 ON r1.node = e.src
      LEFT JOIN deg ON deg.src = e.src
      GROUP BY n.n_nationkey
    ), r3 AS (
      SELECT n.n_nationkey AS node,
             0.15 / 25 + 0.85 * COALESCE(SUM(r2.rank / deg.outdeg), 0) AS rank
      FROM nation n
      LEFT JOIN edges e ON e.dst = n.n_nationkey
      LEFT JOIN r2 ON r2.node = e.src
      LEFT JOIN deg ON deg.src = e.src
      GROUP BY n.n_nationkey
    )
    SELECT node, ROUND(rank, 6) AS rank FROM r3
    """,
    category="control",
)
def graph_pagerank(spark, sf_dir):
    """GRAPH iteration (TAKgraphloop :995): 3 fixed PageRank rounds
    (damping 0.85) over a deterministic 2-out-degree graph — each round is
    one join + one aggregation, the canonical iterative-numeric dataflow.
    The oracle unrolls the same three rounds as CTEs. At scale the rank
    vector co-partitions with the edge list (both keyed by node) so each
    round is a single co-located shuffle."""
    from hpcc_platform_spark.operators.loop import loop_count

    (nation,) = tables(spark, sf_dir, "nation")
    edges = nation.select(
        F.col("n_nationkey").alias("src"),
        ((F.col("n_nationkey") * 2 + 1) % 25).alias("dst"),
    ).unionAll(
        nation.select(
            F.col("n_nationkey").alias("src"),
            ((F.col("n_nationkey") * 3 + 2) % 25).alias("dst"),
        )
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    ranks0 = nodes.select("node", (F.lit(1.0) / 25).alias("rank"))

    # Rank vector stays hash-partitioned by node across rounds (sized to
    # the cluster, not coalesce(1)) so each round's edge join and the
    # groupBy("node") reuse the partitioning.
    n_parts = max(2, spark.sparkContext.defaultParallelism)

    def step(ranks, _i):
        contrib = (
            edges.join(ranks, ranks["node"] == edges["src"])
            .join(deg, "src")
            .select(F.col("dst"), (F.col("rank") / F.col("outdeg")).alias("c"))
        )
        return (
            nodes.join(contrib, contrib["dst"] == nodes["node"], "left")
            .groupBy("node")
            .agg((F.lit(0.15 / 25) + 0.85 * F.coalesce(F.sum("c"), F.lit(0.0))).alias("rank"))
            .repartition(n_parts, F.col("node"))
        )

    final = loop_count(ranks0, 3, step, checkpoint_every=1)
    return final.select("node", F.round("rank", 6).alias("rank"))


@query(
    "workflow_schedule",
    oracle="""
    WITH reg AS (SELECT COUNT(*) AS n FROM region),
         nat AS (SELECT COUNT(*) AS n FROM nation)
    SELECT 1 AS fire_seq, 'CRON' AS event, 'cron' AS handler,
           '2026-01-15T10:30:00' AS event_text, 'tick' AS result
    UNION ALL
    SELECT 2, 'start', 'on_start', '<Event><from>cron</from></Event>',
           CAST((SELECT n FROM reg) AS VARCHAR)
    UNION ALL
    SELECT 3, 'loaded', 'on_loaded',
           '<Event><table>region</table><rows>' ||
             CAST((SELECT n FROM reg) AS VARCHAR) || '</rows></Event>',
           CAST((SELECT n FROM nat) AS VARCHAR)
    UNION ALL
    SELECT 4, 'done', 'on_done',
           '<Event><total>' ||
             CAST((SELECT reg.n + nat.n FROM reg, nat) AS VARCHAR) ||
             '</total></Event>',
           CAST((SELECT reg.n + nat.n FROM reg, nat) AS VARCHAR)
    UNION ALL
    SELECT 5, 'done', 'waiter',
           '<Event><total>' ||
             CAST((SELECT reg.n + nat.n FROM reg, nat) AS VARCHAR) ||
             '</total></Event>',
           'acked'
    """,
    category="scheduler",
)
def workflow_schedule(spark, sf_dir):
    """Workflow event scheduler (WHEN/NOTIFY/EVENT/WAIT/CRON —
    common/workunit/workflow.cpp state machine;
    ecl/schedulectrl/scheduleread.hpp:45-62 name+text matching;
    testing/regress/ecl/schedule1.ecl chain shape): a CRON tick NOTIFYs
    'start', whose handler counts a table and NOTIFYs 'loaded' with an XML
    payload; that handler reads EVENTEXTRA fields and NOTIFYs 'done',
    consumed by both a WHEN handler and a WAIT continuation. The firing log
    (global order + payloads + results) is the oracle-checked output; a
    second cron entry whose spec doesn't match the tick proves cron
    filtering. Deterministic: injected clock, FIFO event queue,
    registration-order dispatch."""
    from datetime import datetime

    from hpcc_platform_spark.plans import EventScheduler

    region, nation = tables(spark, sf_dir, "region", "nation")
    sched = EventScheduler(spark)

    def on_cron(ev):
        sched.notify("start", "<Event><from>cron</from></Event>")
        return "tick"

    def on_start(ev):
        n = region.count()
        sched.notify(
            "loaded", f"<Event><table>region</table><rows>{n}</rows></Event>"
        )
        return n

    def on_loaded(ev):
        rows = int(ev.extra("rows"))
        total = rows + nation.count()
        sched.notify("done", f"<Event><total>{total}</total></Event>")
        return nation.count()

    def on_done(ev):
        return ev.extra("total")

    sched.cron("* * * * *", on_cron, count=1, label="cron")
    sched.cron("0 0 1 1 *", on_cron, count=1, label="never")  # filtered out
    sched.when("start", on_start, count=1, label="on_start")
    sched.when(
        "loaded", on_loaded, text_filter="*<table>region</table>*", label="on_loaded"
    )
    sched.when("done", on_done, label="on_done")
    sched.wait("done", lambda ev: "acked", label="waiter")

    sched.tick(datetime(2026, 1, 15, 10, 30))
    return sched.log_df()


@query(
    "apply_action_counts",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(s_nationkey) AS BIGINT) AS key_sum
    FROM supplier
    """,
    category="control",
)
def apply_action_counts(spark, sf_dir):
    """APPLY(ds, action) (TAKapply :904): the per-partition side-effect
    operator — one action invocation per partition (connection/file-handle
    granularity), not per row. The side effect here feeds accumulators;
    returning their totals as a one-row DataFrame makes the action's
    execution (every partition, every row, exactly once) oracle-checkable."""
    from hpcc_platform_spark.operators import apply_action

    (supp,) = tables(spark, sf_dir, "supplier")
    rows_acc = spark.sparkContext.accumulator(0)
    keysum_acc = spark.sparkContext.accumulator(0)

    def per_partition(it):
        n = ks = 0
        for row in it:
            n += 1
            ks += row.s_nationkey
        rows_acc.add(n)
        keysum_acc.add(ks)

    apply_action(supp.select("s_suppkey", "s_nationkey"), per_partition)
    return inline_dataset(
        spark, [(rows_acc.value, keysum_acc.value)], "n_rows bigint, key_sum bigint"
    )
