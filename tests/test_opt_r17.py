"""Round-17 optimization gates: the rewritten operator internals must be
(a) plan-shaped as claimed and (b) value-identical to the lowering they
replaced.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_numbered_plans_single_exchange(spark):
    """numbered() must range-exchange once and NOT re-shuffle by __pid__
    (the pre-r17 window lowering added Exchange hashpartitioning(__pid__))."""
    from hpcc_platform_spark.operators.numbering import (
        numbered,
        release_numbering_caches,
    )

    df = spark.range(0, 5000).withColumn("k", (F.col("id") * 37) % 4999)
    out, total = numbered(df, ["k"], name="rn", num_partitions=8)
    plan = _executed_plan(out)
    assert total == 5000
    assert "hashpartitioning(__pid__" not in plan
    assert "SinglePartition" not in plan
    assert "Window" not in plan
    release_numbering_caches()


def test_numbered_ties_are_dense_and_complete(spark):
    """Heavy ties: every rank 1..N exactly once, ordered by the key."""
    from hpcc_platform_spark.operators.numbering import (
        numbered,
        release_numbering_caches,
    )

    df = spark.range(0, 2000).withColumn("k", F.col("id") % 7)
    out, _ = numbered(df, ["k"], name="rn", num_partitions=8)
    rows = out.select("k", "rn").collect()
    release_numbering_caches()
    assert sorted(r.rn for r in rows) == list(range(1, 2001))
    by_rank = [r.k for r in sorted(rows, key=lambda r: r.rn)]
    assert by_rank == sorted(by_rank)


def test_dedup_keyed_min_by_equals_window_path(spark):
    """The KEEP 1 min_by fast path must pick the same survivors as the
    row_number window lowering, including NULL order keys (NULLS FIRST)."""
    from hpcc_platform_spark.operators.dedup import dedup_keyed

    rows = [
        (k, v if v % 5 else None, f"p{k}_{v}")
        for k in range(40)
        for v in range((k % 7) + 1)
    ]
    df = spark.createDataFrame(rows, "k int, o int, payload string")
    fast = dedup_keyed(df, ["k"], ["o", "payload"])
    # reference lowering (what dedup_keyed did before r17)
    w = Window.partitionBy("k").orderBy("o", "payload")
    ref = (
        df.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__rn__")
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, ref.collect()))
    assert fast.columns == df.columns
    # desc() orderings must still take the window path (struct ordering
    # cannot express them)
    plan_desc = dedup_keyed(
        df, ["k"], [F.col("o").desc(), F.col("payload")]
    )._jdf.queryExecution().executedPlan().toString()
    assert "row_number" in plan_desc


def test_exact_dedup_docs_aggregate_semantics(spark):
    """groupBy(min,count) rewrite: lowest id survives, copies counted."""
    from hpcc_platform_spark.pipeline.dedup import exact_dedup_docs

    df = spark.createDataFrame(
        [(1, "aa"), (5, "aa"), (3, "aa"), (2, "bb"), (9, "cc"), (7, "cc")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_copies for r in exact_dedup_docs(df).collect()}
    assert got == {1: 3, 2: 1, 7: 2}
    plan = exact_dedup_docs(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_pack_sequences_global_no_single_partition(spark):
    """Global packing must not funnel through one task, and must bin
    exactly like the naive unpartitioned window it replaced."""
    from hpcc_platform_spark.pipeline.chunking import pack_sequences
    from hpcc_platform_spark.operators.numbering import (
        release_numbering_caches,
    )

    chunks = spark.createDataFrame(
        [(d, c, (d * 13 + c * 7) % 90 + 10) for d in range(30) for c in range(4)],
        "doc_id long, chunk_index long, n_chunk_tokens int",
    )
    out = pack_sequences(chunks, budget=200)
    rows = out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    release_numbering_caches()
    assert "SinglePartition" not in plan
    w = Window.orderBy("doc_id", "chunk_index").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = chunks.withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_chunk_tokens").over(w) - F.col("n_chunk_tokens")) / 200
        ).cast("long"),
    )
    expect = {(r.doc_id, r.chunk_index): r.bin_id for r in ref.collect()}
    got = {(r.doc_id, r.chunk_index): r.bin_id for r in rows}
    assert got == expect


def test_textstats_tokenize_once_per_row(spark):
    """r17 session 5: the tokenization / trigram extraction / argmax
    struct must be bound as real columns so each is evaluated once per
    row — as free expressions they get textually inlined into every
    consumer (per-language scores, both output columns) and interpreted
    higher-order-function eval re-runs each copy (measured language_id
    3.4 s -> 1.1 s at sf0.1). CollapseProject keeps the boundary only
    while the alias stays non-cheap and multiply-referenced; this pins
    that shape."""
    from hpcc_platform_spark.pipeline.textstats import (
        language_id,
        language_id_ngram,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog"), (2, "")],
        "doc_id long, text string",
    )
    plan = language_id(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("split(text") == 1, plan
    plan = language_id_ngram(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("sequence(1,") == 1, plan
    # values unchanged by the rebinding
    got = {r.doc_id: (r.lang_pred, r.lang_score) for r in language_id(df).collect()}
    assert got[1] == ("en", 0.375) and got[2] == ("und", 0.0)


def test_dedup_clusters_single_shuffle_convergence(spark):
    """r17 session 5: dedup_clusters carries each vertex's previous label
    through the min-fold, so convergence detection is a filter over the
    checkpointed round result — no extra join per round — and the
    symmetrized pair set is checkpointed once so rounds never re-execute
    the upstream pair pipeline. Clusters and star must agree."""
    from hpcc_platform_spark.pipeline.dedup import (
        dedup_clusters,
        dedup_clusters_star,
    )

    pairs = spark.createDataFrame(
        [(5, 2), (2, 9), (9, 7), (20, 30), (30, 20), (40, 40)],
        "id_a long, id_b long",
    )
    a = {(r.id, r.canonical_id) for r in dedup_clusters(pairs).collect()}
    b = {(r.id, r.canonical_id) for r in dedup_clusters_star(pairs).collect()}
    assert a == b
    assert {(5, 2), (2, 2), (9, 2), (7, 2), (20, 20), (30, 20), (40, 40)} == a


def test_single_fold_signatures_match_per_permutation_folds(spark):
    """r17 session 5: simhash64 and minhash_signatures fold ONCE over the
    token/shingle array with an array accumulator (constant-size
    expression tree, one traversal) instead of one fold per bit /
    permutation. The fingerprints must be bit-for-bit identical to the
    original per-permutation construction, rebuilt here as the reference."""
    from hpcc_platform_spark.pipeline.dedup import (
        _shingles,
        minhash_signatures,
        simhash64,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs"),
         (3, "sphinx of black quartz judge my vow")],
        "doc_id long, text string",
    )

    # simhash64 reference: 64 independent ±1 vote folds, sign -> bit.
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    hashes = F.transform(words, lambda w: F.xxhash64(w))

    def vote(i):
        mask = (1 << i) if i < 63 else -(1 << 63)
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, 1
        ).otherwise(-1)

    ref = 0
    votes = [F.aggregate(hashes, F.lit(0), vote(i)) for i in range(64)]
    sim = F.lit(0).cast("long")
    for i in range(64):
        mask = (1 << i) if i < 63 else -(1 << 63)
        sim = sim.bitwiseOR(
            F.when(votes[i] > 0, F.lit(mask).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    expect = {r.doc_id: r.ref for r in df.select("doc_id", sim.alias("ref")).collect()}
    got = {r.doc_id: r.simhash for r in simhash64(df).collect()}
    assert got == expect

    # minhash reference: per-permutation array_min(transform(...)), both modes.
    for mode in ("xxhash64", "md5"):
        def perm(i):
            if mode == "md5":
                return lambda s: F.md5(F.concat(F.lit(f"{i}:"), s).cast("binary"))
            return lambda s: F.xxhash64(s, F.lit(i))

        sh = _shingles("text", 3).alias("sh")
        ref_sig = df.select(
            "doc_id",
            F.array(*[F.array_min(F.transform(sh, perm(i))) for i in range(16)]).alias("s"),
        )
        expect = {r.doc_id: list(r.s) for r in ref_sig.collect()}
        got = {
            r.doc_id: list(r.signature)
            for r in minhash_signatures(df, num_hashes=16, hash_mode=mode).collect()
        }
        assert got == expect, mode


def test_ivf_assign_is_map_only_and_matches_crossjoin_argmax(spark):
    """r17 session 6: _assign lowers nearest-centroid assignment to a
    map-only array_max fold over a 1-row broadcast centroid array — no
    shuffle Exchange anywhere (the old form crossJoined ×C and shuffled
    every vector through a groupBy(id) SortAggregate). Values must match
    the old crossJoin+max(struct) lowering bit-for-bit, including the
    (cos desc, cid asc) tie-break."""
    from pyspark.sql.functions import broadcast

    from hpcc_platform_spark.pipeline.similarity import _assign

    def _norm(vcol):
        vd = F.transform(vcol, lambda x: x.cast("double"))
        return F.sqrt(
            F.aggregate(F.transform(vd, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        )

    # 40 vectors incl. exact duplicates of centroid vectors (cos ties).
    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)]) for i in range(40)
    ]
    rows += [(100 + i, rows[i][1]) for i in range(4)]  # tie-break exercisers
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = df.where((F.col("vec_id") % 10) == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cvec"),
        _norm(F.col("embedding")).alias("cnorm"),
    )

    new = _assign(df, cents, "embedding", "vec_id")

    plan = new._jdf.queryExecution().executedPlan().toString()
    # The data side must carry zero shuffles: the only exchanges allowed
    # are the centroid collect_list's 1-row SinglePartition final and its
    # broadcast. No keyed exchange, no sort aggregate over the corpus.
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "SortAggregate" not in plan

    old = (
        df.withColumn("__vnorm__", _norm(F.col("embedding")))
        .crossJoin(broadcast(cents))
        .withColumn(
            "__ccos__",
            F.aggregate(
                F.zip_with(
                    F.transform(F.col("embedding"), lambda x: x.cast("double")),
                    F.transform(F.col("cvec"), lambda x: x.cast("double")),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (F.col("__vnorm__") * F.col("cnorm")),
        )
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("__ccos__"),
                    (-F.col("cid")).alias("ncid"),
                    F.col("embedding").alias("v"),
                )
            ).alias("best")
        )
        .select(
            F.col("vec_id"),
            F.col("best.v").alias("embedding"),
            (-F.col("best.ncid")).alias("cid"),
        )
    )
    assert new.schema == old.schema
    assert new.exceptAll(old).count() == 0 and old.exceptAll(new).count() == 0
