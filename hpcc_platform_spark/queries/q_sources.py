"""Source/sink coverage queries (SURVEY.md §2.1).

Roundtrip pattern: materialize through the format under test into a scratch
dir, read back, and compare against the DuckDB oracle over the original
parquet — proving the writer+reader pair preserves values.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from hpcc_platform_spark.queries.registry import query, tables
from hpcc_platform_spark.sources.inline import inline_dataset
from hpcc_platform_spark.sources import (
    build_index,
    inline_dataset,
    read_csv,
    read_index,
    read_json,
    read_superfile,
    write_csv,
    write_json,
    write_parquet,
)

_SCRATCH = os.path.join(tempfile.gettempdir(), "hpcc_platform_spark_scratch")


def _scratch(name: str) -> str:
    os.makedirs(_SCRATCH, exist_ok=True)
    return os.path.join(_SCRATCH, name)


@query(
    "inline_table",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'alpha', 10.5), (2, 'beta', 20.25), (3, 'gamma', NULL)
    ) AS t(id, name, score)
    """,
    category="sources",
)
def inline_table(spark, sf_dir):
    """Inline DATASET([...]) literal (TAKinlinetable :1034)."""
    return inline_dataset(
        spark,
        [(1, "alpha", 10.5), (2, "beta", 20.25), (3, "gamma", None)],
        "id int, name string, score double",
    )


@query(
    "csv_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM region",
    category="sources",
)
def csv_roundtrip(spark, sf_dir):
    """CSV write+read with dialect options (TAKcsvwrite :921 /
    TAKcsvread :977, ICsvParameters eclhelper.hpp:2109-2112): pipe
    separator + quote, explicit schema (no inference in the engine path)."""
    (region,) = tables(spark, sf_dir, "region")
    path = _scratch("region_csv")
    write_csv(region.select("r_regionkey", "r_name"), path, separator="|")
    return read_csv(
        spark, path, schema="r_regionkey int, r_name string", separator="|"
    )


@query(
    "json_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    category="sources",
)
def json_roundtrip(spark, sf_dir):
    """JSON write+read (TAKjsonwrite :1079 / TAKjsonread :1080)."""
    (nation,) = tables(spark, sf_dir, "nation")
    path = _scratch("nation_json")
    write_json(nation, path)
    return read_json(
        spark, path, schema="n_nationkey int, n_name string, n_regionkey int"
    )


@query(
    "index_keyed_read",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice FROM part
    WHERE p_partkey BETWEEN 1000 AND 1200
    """,
    category="sources",
)
def index_keyed_read(spark, sf_dir):
    """INDEX build + KEYED read (TAKindexwrite :923, TAKindexread :963):
    range-partitioned sorted parquet; the KEYED range filter reaches the
    scan as PushedFilters + row-group pruning (the jhtree segment-monitor
    analogue)."""
    (part,) = tables(spark, sf_dir, "part")
    path = _scratch("part_index")
    build_index(part, path, keyed=["p_partkey"], n_parts=4)
    out = read_index(
        spark,
        path,
        keyed_filter=F.col("p_partkey").between(1000, 1200),
        columns=["p_partkey", "p_name", "p_retailprice"],
    )
    return out


@query(
    "superfile_read",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderstatus IN ('F', 'O')
    """,
    category="sources",
)
def superfile_read(spark, sf_dir):
    """Superfile union-of-files (dadfs.hpp:493-497): two part-files written
    separately, read back as one logical dataset via multi-path read."""
    (orders,) = tables(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    p1, p2 = _scratch("orders_part_f"), _scratch("orders_part_o")
    write_parquet(base.where(F.col("o_orderstatus") == "F"), p1)
    write_parquet(base.where(F.col("o_orderstatus") == "O"), p2)
    return read_superfile(spark, [p1, p2])


@query(
    "xml_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_acctbal FROM supplier",
    category="sources",
)
def xml_roundtrip(spark, sf_dir):
    """XML write+read (TAKxmlwrite :933 / TAKxmlread :978): Spark 4 native
    XML source with rowTag — the row-path extraction the reference does via
    XPath row tags (thorxmlread.cpp)."""
    (supp,) = tables(spark, sf_dir, "supplier")
    path = _scratch("supplier_xml")
    supp.select("s_suppkey", "s_name", "s_acctbal").write.mode("overwrite").format(
        "xml"
    ).option("rowTag", "supplier").save(path)
    return (
        spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema("s_suppkey long, s_name string, s_acctbal double")
        .load(path)
    )


@query(
    "partitioned_write_prune",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
    """,
    category="sources",
)
def partitioned_write_prune(spark, sf_dir):
    """NWAY DISTRIBUTE / partitioned write (TAKnwaydistribute :1086 +
    TAKdiskwrite): write hive-partitioned by status, read back one
    partition — the filter becomes partition pruning (zero non-F files
    touched), the Spark analogue of writing per-category part files."""
    (orders,) = tables(spark, sf_dir, "orders")
    path = _scratch("orders_by_status")
    write_parquet(
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"),
        path,
        partition_by=["o_orderstatus"],
    )
    return (
        spark.read.parquet(path)
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "fetch_by_position",
    oracle="""
    WITH idx AS (
      SELECT l_partkey, l_orderkey, l_linenumber FROM lineitem
      WHERE l_partkey BETWEEN 500 AND 520
    )
    SELECT b.l_orderkey, b.l_linenumber, b.l_partkey, b.l_quantity, b.l_extendedprice
    FROM idx i JOIN lineitem b
      ON i.l_orderkey = b.l_orderkey AND i.l_linenumber = b.l_linenumber
     AND i.l_partkey = b.l_partkey
    """,
    category="sources",
)
def fetch_by_position(spark, sf_dir):
    """FETCH (TAKfetch :926): an index probe yields row positions
    (fileposition payload in the reference, thorlcr/activities/fetch/);
    fetching the base rows is a join on the surrogate position — here the
    natural key (orderkey, linenumber) stands in for the physical offset."""
    (li,) = tables(spark, sf_dir, "lineitem")
    idx = (
        li.where(F.col("l_partkey").between(500, 520))
        .select("l_partkey", "l_orderkey", "l_linenumber")
    )
    base = li.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )
    return idx.join(
        base, ["l_orderkey", "l_linenumber", "l_partkey"], "inner"
    ).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )


@query(
    "workunit_results",
    oracle="""
    WITH top_cust AS (
      SELECT o_custkey, ROUND(SUM(o_totalprice), 4) AS spend
      FROM orders GROUP BY o_custkey ORDER BY spend DESC, o_custkey LIMIT 10
    )
    SELECT t.o_custkey, t.spend, c.c_name
    FROM top_cust t JOIN customer c ON t.o_custkey = c.c_custkey
    """,
    category="sources",
)
def workunit_results(spark, sf_dir):
    """Workunit result slots (TAKworkunitwrite :902 / TAKworkunitread :927):
    stage a named result, then a second query reads it back through the
    registry's view — the OUTPUT(NAMED)/DATASET(WORKUNIT) pattern."""
    from hpcc_platform_spark.sources import WorkunitResults

    orders, cust = tables(spark, sf_dir, "orders", "customer")
    wu = WorkunitResults(spark, prefix="q")
    top = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("spend"))
        .orderBy(F.col("spend").desc(), "o_custkey")
        .limit(10)
    )
    wu.write("top_cust", top)
    staged = wu.read("top_cust")
    return staged.join(cust, staged.o_custkey == cust.c_custkey).select(
        "o_custkey", "spend", "c_name"
    )


@query(
    "soapcall_enrich",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           CAST(length(c_name) AS INT) AS name_len,
           CASE WHEN c_acctbal >= 5000 THEN 'high'
                WHEN c_acctbal >= 0 THEN 'mid'
                ELSE 'neg' END AS bal_tier
    FROM customer
    """,
    category="sources",
)
def soapcall_enrich(spark, sf_dir):
    """SOAPCALL (TAKsoap_rowdataset :941-944, thorsoapcall.cpp): per-batch
    service calls via mapInPandas with retry plumbing. The transport here is
    a deterministic fake (no network in-container) whose response the
    oracle replicates; swapping in an HTTP POST wrapper changes nothing in
    the dataflow — batching, retries, and schema are the tested surface."""
    from hpcc_platform_spark.sources.soapcall import soapcall

    def fake_service(reqs: list[dict]) -> list[dict]:
        # Stands in for a SOAP/HTTP endpoint: echoes key + derived fields.
        return [
            {
                "c_custkey": r["c_custkey"],
                "name_upper": r["c_name"].upper(),
                "name_len": len(r["c_name"]),
                "bal_tier": (
                    "high" if r["c_acctbal"] >= 5000
                    else "mid" if r["c_acctbal"] >= 0 else "neg"
                ),
            }
            for r in reqs
        ]

    (cust,) = tables(spark, sf_dir, "customer")
    return soapcall(
        cust.select("c_custkey", "c_name", "c_acctbal"),
        transport=fake_service,
        response_schema="c_custkey long, name_upper string, name_len int, bal_tier string",
        batch_rows=100,
        retries=2,
    )


@query(
    "schema_evolution_read",
    oracle="""
    SELECT s_suppkey, s_name,
           CASE WHEN s_suppkey % 2 = 0 THEN s_acctbal ELSE NULL END AS s_acctbal
    FROM supplier
    """,
    category="sources",
)
def schema_evolution_read(spark, sf_dir):
    """Record-layout translation (thorread.hpp:33-64 actual/expected/
    projected; RecordTranslationMode): two generations of the same file —
    old parts lack a column — read as one dataset with mergeSchema; the
    missing column is NULL-filled for old rows, exactly the reference's
    actual→expected mapping. Split is by parity so the oracle can replicate
    which rows carry the evolved column."""
    (supp,) = tables(spark, sf_dir, "supplier")
    base = _scratch("supplier_evolving")
    old = os.path.join(base, "gen=0")
    new = os.path.join(base, "gen=1")
    supp.where(F.col("s_suppkey") % 2 == 1).select("s_suppkey", "s_name").write.mode(
        "overwrite"
    ).parquet(old)
    supp.where(F.col("s_suppkey") % 2 == 0).select(
        "s_suppkey", "s_name", "s_acctbal"
    ).write.mode("overwrite").parquet(new)
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(old, new)
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@query(
    "keydiff_keypatch",
    oracle="""
    WITH old AS (
      SELECT p_partkey AS k, ROUND(p_retailprice, 2) AS v
      FROM part WHERE p_partkey % 11 <> 3
    ), new AS (
      SELECT p_partkey AS k,
             ROUND(p_retailprice + CASE WHEN p_partkey % 17 = 0 THEN 1 ELSE 0 END, 2) AS v
      FROM part WHERE p_partkey % 13 <> 5
    )
    SELECT COALESCE(old.k, new.k) AS p_partkey,
           CASE WHEN new.k IS NULL THEN 'DEL'
                WHEN old.k IS NULL THEN 'ADD'
                ELSE 'UPD' END AS action,
           new.v AS new_price
    FROM old FULL OUTER JOIN new ON old.k = new.k
    WHERE new.k IS NULL OR old.k IS NULL OR old.v <> new.v
    """,
    category="sources",
)
def keydiff_keypatch(spark, sf_dir):
    """KEYDIFF/KEYPATCH (tools/keydiff, thorlcr/activities/keydiff/ — delta
    between two versions of a sorted index, shipped as a patch file): two
    generations of a keyed table are diffed into DEL/ADD/UPD patch rows.
    Spark-first: a single full-outer sort-merge join on the key replaces the
    reference's paired sequential index scans; with both generations
    bucketed by key the join is exchange-free, and the patch (typically tiny
    vs the index) streams out without materializing either side."""
    (part,) = tables(spark, sf_dir, "part")
    pk = F.col("p_partkey")
    old = part.where(pk % 11 != 3).select(
        pk.alias("ok"), F.round("p_retailprice", 2).alias("ov")
    )
    new = part.where(pk % 13 != 5).select(
        pk.alias("nk"),
        F.round(
            F.col("p_retailprice") + F.when(pk % 17 == 0, 1).otherwise(0), 2
        ).alias("nv"),
    )
    j = old.join(new, old["ok"] == new["nk"], "full_outer")
    return j.where(
        F.col("nk").isNull() | F.col("ok").isNull() | (F.col("ov") != F.col("nv"))
    ).select(
        F.coalesce("ok", "nk").alias("p_partkey"),
        F.when(F.col("nk").isNull(), "DEL")
        .when(F.col("ok").isNull(), "ADD")
        .otherwise("UPD")
        .alias("action"),
        F.col("nv").alias("new_price"),
    )


@query(
    "superfile_append",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    """,
    category="sources",
)
def superfile_append(spark, sf_dir):
    """Transactional superfile append (AddSuperFile within
    StartSuperFileTransaction/Finish — ecllibrary/std/File.ecl:982-1065;
    IDistributedSuperFile::addSubFile dadfs.hpp:504-509): the incremental
    ingest idiom. One generation lands per status; later generations are
    appended atomically through the manifest catalog, and the read sees
    the whole container as one multi-path scan. The oracle is the full
    orders table — proving read-across-append completeness."""
    from hpcc_platform_spark.sources.superfile import SuperFileCatalog

    (orders,) = tables(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    parts = {}
    for status in ("F", "O", "P"):
        p = _scratch(f"orders_gen_{status}")
        write_parquet(base.where(F.col("o_orderstatus") == status), p)
        parts[status] = p
    cat = SuperFileCatalog(_scratch("superfile_catalog"))
    cat.create("orders_all", [parts["F"]])  # initial generation
    with cat.transaction() as txn:  # atomic multi-append
        txn.add_sub_file("orders_all", parts["O"])
        txn.add_sub_file("orders_all", parts["P"])
    return cat.read(spark, "orders_all")


@query(
    "layout_translation_widen",
    oracle="""
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
           CAST(CAST(s_acctbal AS FLOAT) AS DOUBLE) AS s_acctbal,
           CAST(NULL AS VARCHAR) AS audit_tag
    FROM supplier
    """,
    category="sources",
)
def layout_translation_widen(spark, sf_dir):
    """Record-layout translation triple (thorread.hpp:33-64;
    RecordTranslationMode rtldynfield.hpp:106-115, Payload mode): the disk
    generation stores s_suppkey narrow (int) and s_acctbal as float32; the
    declared layout widens both (bigint/double) and adds a field the disk
    doesn't have (NULL-filled). The translator is a projection of casts,
    folded into the scan by Catalyst. Strict modes ('none',
    'remove_only') raise instead — covered in tests."""
    from hpcc_platform_spark.sources.translate import read_translated

    (supp,) = tables(spark, sf_dir, "supplier")
    gen = _scratch("supplier_narrow_gen")
    supp.select(
        F.col("s_suppkey").cast("int").alias("s_suppkey"),
        "s_name",
        F.col("s_acctbal").cast("float").alias("s_acctbal"),
    ).write.mode("overwrite").parquet(gen)
    return read_translated(
        spark,
        gen,
        "s_suppkey bigint, s_name string, s_acctbal double, audit_tag string",
        mode="payload",
    )


@query(
    "fixed_width_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_orderdate
    FROM orders WHERE o_orderkey <= 1000
    """,
    category="sources",
)
def fixed_width_roundtrip(spark, sf_dir):
    """Fixed-width flat file (the reference's native THOR record layout —
    fixed-length records, no delimiters; TAKdiskread :957 fixed-size fast
    path): write a declared layout, read it back by byte ranges. The read
    is a text scan with substring slicing fused into the scan projection —
    pure codegen. The oracle sees through the roundtrip."""
    from hpcc_platform_spark.sources import (
        FixedLayout,
        read_fixed_width,
        write_fixed_width,
    )

    (orders,) = tables(spark, sf_dir, "orders")
    layout = FixedLayout(
        [
            ("o_orderkey", 12, "long"),
            ("o_orderstatus", 1, "string"),
            ("o_orderpriority", 15, "string"),
            ("o_orderdate", 8, "date"),
        ]
    )
    path = _scratch("orders_fixed")
    write_fixed_width(
        orders.where(F.col("o_orderkey") <= 1000).select(
            "o_orderkey", "o_orderstatus", "o_orderpriority",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        ),
        path,
        layout,
    )
    out = read_fixed_width(spark, path, layout)
    return out.select(
        "o_orderkey", "o_orderstatus", "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
    )


@query(
    "index_scan_aggregate",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_orderkey,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_orderkey,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    """,
    category="sources",
)
def index_scan_aggregate(spark, sf_dir):
    """Aggregation fused INTO the scan (TAKindexcount :966 /
    TAKindexaggregate :965, eclhelper.hpp:957-968): COUNT and MIN/MAX
    answered from parquet row-group footers via V2 aggregate pushdown —
    the plan's scan output IS the aggregate (plan-asserted in
    tests/test_sources_plans.py), zero data pages read, exactly jhtree's
    "the index header already knows this" shortcut."""
    from hpcc_platform_spark.sources.index import scan_count, scan_min_max

    path = f"{sf_dir}/lineitem.parquet"
    n = scan_count(spark, path)
    mm = scan_min_max(spark, path, ["l_orderkey", "l_extendedprice"])
    return inline_dataset(
        spark,
        [
            (
                n,
                mm["l_orderkey"][0],
                mm["l_orderkey"][1],
                float(mm["l_extendedprice"][0]),
                float(mm["l_extendedprice"][1]),
            )
        ],
        "n_rows long, min_orderkey long, max_orderkey long, "
        "min_price double, max_price double",
    )


@query(
    "zorder_clustered_read",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(l_orderkey) AS BIGINT) AS sum_orderkey,
           ROUND(SUM(l_quantity), 4) AS sum_qty
    FROM lineitem
    WHERE l_partkey BETWEEN 500 AND 600
    """,
    category="sources",
)
def zorder_clustered_read(spark, sf_dir):
    """Z-order (Morton-curve) clustering — the multi-column pruning
    superset the reference's prefix-only B+tree lacks: lineitem written
    clustered on (l_orderkey, l_partkey), then filtered on the SECONDARY
    column; footer min/max stats stay tight on both columns
    (span-tightening asserted in tests/test_sources_plans.py), so the
    filter prunes row groups a leading-key sort could not."""
    from hpcc_platform_spark.sources.zorder import write_zordered

    li = tables(spark, sf_dir, "lineitem")[0].select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    path = _scratch("zorder_lineitem")
    write_zordered(li, path, ["l_orderkey", "l_partkey"], n_parts=8)
    back = spark.read.parquet(path).where(F.col("l_partkey").between(500, 600))
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_orderkey").alias("sum_orderkey"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


@query(
    "orc_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey < 3000
    """,
    category="sources",
)
def orc_roundtrip(spark, sf_dir):
    """ORC write+read: a second columnar-with-statistics format beside
    parquet (the reference's format dispatch is pluggable,
    common/thorhelper/thorread.cpp:368-494; Spark ships ORC natively).
    Predicate/column pushdown applies the same as parquet — indexes and
    z-order writes work over ORC unchanged."""
    (orders,) = tables(spark, sf_dir, "orders")
    path = _scratch("orders_orc")
    orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    ).write.mode("overwrite").orc(path)
    return spark.read.orc(path).where(F.col("o_orderkey") < 3000)
