"""Similarity search over embedding columns (array<float>).

Baseline: exact brute-force cosine top-k — one map + TakeOrderedAndProject
(per-partition heaps), no global sort, no UDF. Scale path: LSH bucketing
(random hyperplane signs) so each query probes a bucket neighborhood
instead of the full corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _num(x: float) -> str:
    """A float as a Spark-SQL DOUBLE literal token (handles e-notation)."""
    v = float(x)
    if v != v or v in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite literal {v!r} in vector constant")
    return repr(v) + "D"


def _dlit_array(vals: Sequence[float]) -> F.Column:
    """array<double> literal built from ONE parsed SQL expression.

    Building literal vectors element-by-element (``F.array(*[F.lit(x) ...])``)
    costs one py4j round trip per element — measured 0.7 s of pure driver
    time for 6×64 hyperplanes, paid on EVERY query construction — and
    leaves a 64-node subtree per vector for Catalyst to analyze. A single
    ``F.expr`` parse is ~200× cheaper to build and constant-folds to one
    Literal during optimization."""
    return F.expr("array(" + ",".join(_num(x) for x in vals) + ")")


def _dlit_matrix(rows: Sequence[Sequence[float]]) -> F.Column:
    """array<array<double>> literal via one parsed SQL expression (see
    _dlit_array)."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_num(x) for x in r) + ")" for r in rows
        )
        + ")"
    )


def _cosine(vec_col: str, qvec: Sequence[float]) -> F.Column:
    """Cosine similarity between a column array<float> and a literal query
    vector — F.zip_with dot product + norms, all JVM-side (no UDF)."""
    q = _dlit_array(qvec)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, q, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    nv = F.sqrt(
        F.aggregate(F.transform(v, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x)
    )
    nq = float(sum(x * x for x in qvec)) ** 0.5
    return dot / (nv * F.lit(nq))


def brute_force_topk(
    df: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k by cosine: orderBy(desc(cos), id).limit(k) →
    TakeOrderedAndProject. At 1000 executors this is one scan + a k-row
    merge on the driver — the right exact baseline at any scale."""
    cos = _cosine(vec_col, qvec)
    return (
        df.withColumn("__cos__", cos)
        .orderBy(F.col("__cos__").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round("__cos__", round_digits).alias("cos_sim"))
    )


def lsh_bucket_topk(
    df: DataFrame,
    qvec: Sequence[float],
    hyperplanes: Sequence[Sequence[float]],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH — bucket = sign-bit string
    of dot(v, h_j); only the query's bucket is scanned exactly.

    ``hyperplanes`` must be generated deterministically by the caller (e.g.
    seeded numpy) so plans are reproducible. At scale, write the corpus
    partitioned by bucket so a probe prunes partitions instead of scanning.
    """
    def bucket_of(vcol: F.Column) -> F.Column:
        return _sign_bucket(vcol, hyperplanes)

    q_bits = "".join(
        "1" if sum(a * b for a, b in zip(qvec, h)) >= 0 else "0" for h in hyperplanes
    )
    bucketed = df.withColumn("__bucket__", bucket_of(F.col(vec_col)))
    probe = bucketed.where(F.col("__bucket__") == q_bits)
    return brute_force_topk(probe, qvec, k=k, vec_col=vec_col, id_col=id_col)


def _sign_bucket(vcol: F.Column, hyperplanes: Sequence[Sequence[float]]) -> F.Column:
    """Random-hyperplane sign signature as a bit-string column.

    One ``transform`` over a single 2-D literal (array of hyperplanes)
    instead of one fold expression per plane: the per-plane dot product is
    the identical zip_with/aggregate in the identical order (same signs,
    same bucket strings), but the expression tree is constant-size — the
    per-plane form built P×D literal nodes that dominated BOTH driver-side
    query construction and Catalyst planning."""
    bits = F.transform(
        _dlit_matrix(hyperplanes),
        lambda h: F.when(
            F.aggregate(
                F.zip_with(vcol, h, lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return F.array_join(bits, "")


def pair_cosine(a_col: str, b_col: str) -> F.Column:
    """Cosine similarity between two array<float> columns (double math,
    sequential fold — matches a dot/(|a||b|) oracle formula exactly)."""
    av = F.transform(F.col(a_col), lambda x: x.cast("double"))
    bv = F.transform(F.col(b_col), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(
        F.aggregate(F.transform(av, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(bv, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    return dot / (na * nb)


def embedding_near_dup_pairs(
    df: DataFrame,
    hyperplanes: Sequence[Sequence[float]],
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-dup: candidates = pairs sharing an LSH sign
    bucket (equi-join on the bit-string — a key shuffle, never n² pairs),
    verified by exact cosine >= threshold.

    The bucket join is the 100 TB shape: candidate cardinality is
    sum-over-buckets of |bucket|², bounded by making the signature longer;
    skewed buckets split via AQE skew-join. Recall is tunable by signature
    length (fewer bits → higher recall, more candidates).
    """
    # Normalize once per row (n× 64-element folds), so each candidate pair
    # pays only the dot product — at scale the pair side dominates by the
    # candidate multiplier, so hoisting the norms is a ~3× expression cut.
    v_dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(F.transform(v_dbl, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    # The bucketed projection feeds BOTH sides of the self-join; without
    # an explicit persist Spark recomputes the scan + per-row norm/bucket
    # folds once per side (no CSE across join branches — SURVEY §4.1).
    # auto_persist halves the per-row signature work and the input scan;
    # MEMORY_AND_DISK spills rather than OOMing at corpus scale, and the
    # cached relation is the lightweight (id, v, norm, bucket) projection,
    # never the full row.
    from hpcc_platform_spark.plans.persist import auto_persist

    bucketed = auto_persist(df.select(
        F.col(id_col),
        v_dbl.alias("__v__"),
        norm.alias("__norm__"),
        _sign_bucket(F.col(vec_col), hyperplanes).alias("__bucket__"),
    ))
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col("__v__").alias("va"),
        F.col("__norm__").alias("na"), "__bucket__",
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col("__v__").alias("vb"),
        F.col("__norm__").alias("nb"), "__bucket__",
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    cos = dot / (F.col("na") * F.col("nb"))
    return (
        a.join(b, ["__bucket__"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("__cos__", cos)
        .where(F.col("__cos__") >= threshold)
        .select("id_a", "id_b", F.round("__cos__", 4).alias("cos_sim"))
    )


def ivf_topk(
    df: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    centroid_stride: int = 50,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: deterministic centroids
    (every ``centroid_stride``-th vector by id — a seeded k-means drop-in),
    map-side assignment of each vector to its nearest centroid via a
    broadcast join, probe only the ``nprobe`` centroid cells nearest the
    query, exact re-rank inside the probed cells.

    Scale path: persist the assignment partitioned by centroid id; a probe
    then prunes to nprobe/C of the corpus before any distance math. The
    broadcast centroid table is tiny (C rows) so assignment adds no
    meaningful shuffle beyond the groupBy(id) argmin.
    """
    from pyspark.sql.functions import broadcast

    def _norm(vcol):
        vd = F.transform(vcol, lambda x: x.cast("double"))
        return F.sqrt(
            F.aggregate(F.transform(vd, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        )

    cents = df.where((F.col(id_col) % centroid_stride) == 0).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    return _assign_and_probe(df, cents, qvec, k, nprobe, vec_col, id_col)


def ivf_topk_kmeans(
    df: DataFrame,
    qvec: Sequence[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """IVF with REAL k-means centroids (pyspark.ml KMeans, seeded) — the
    production replacement for ``ivf_topk``'s stride-sampled seam. Same
    probe dataflow; only centroid training differs (k-means|| init, a few
    Lloyd iterations — one job over the corpus, amortized across every
    subsequent query). No cross-engine oracle (k-means is engine-specific);
    recall vs exact brute force is pinned in tests."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = df.select(
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=10).fit(train)

    def _norm_list(v):
        return sum(x * x for x in v) ** 0.5

    centers = [list(map(float, c)) for c in model.clusterCenters()]
    cents = df.sparkSession.createDataFrame(
        [(i, c, _norm_list(c)) for i, c in enumerate(centers)],
        "cid int, cvec array<double>, cnorm double",
    )
    return _assign_and_probe(df, cents, qvec, k, nprobe, vec_col, id_col)


def _assign_and_probe(
    df: DataFrame,
    cents: DataFrame,
    qvec: Sequence[float],
    k: int,
    nprobe: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    # Assign: argmax cosine over centroids, ties → lowest cid (max struct
    # of (cos, -cid) matches the oracle's ORDER BY cos DESC, cid). Norms
    # are hoisted to once per row / per centroid; the n×C pair expression
    # is a single dot product. (_assign is shared with the persisted-index
    # builder ivf_index_build.)
    assigned = _assign(df, cents, vec_col, id_col)
    probe_cids = [
        int(r["cid"])
        for r in brute_force_topk(
            cents, qvec, k=nprobe, vec_col="cvec", id_col="cid"
        ).collect()
    ]
    probed = assigned.where(F.col("cid").isin(probe_cids))
    return brute_force_topk(probed, qvec, k=k, vec_col=vec_col, id_col=id_col)


def ivf_index_build(
    df: DataFrame,
    path: str,
    centroid_stride: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the IVF index the way the 100 TB path demands: vector →
    nearest-centroid assignment written `partitionBy(cid)` so every probe
    is PARTITION PRUNING (the scan never touches unprobed cells), plus the
    centroid table in an underscore sidecar dir (invisible to the main
    parquet listing, same convention as the KEYED index metadata).

    Same stride-centroid + tie-break semantics as ivf_topk, so the
    cross-engine oracle transfers to the probed results unchanged."""
    from pyspark.sql.functions import broadcast  # noqa: F401 (parity with ivf_topk)

    def _norm(vcol):
        vd = F.transform(vcol, lambda x: x.cast("double"))
        return F.sqrt(
            F.aggregate(F.transform(vd, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        )

    cents = df.where((F.col(id_col) % centroid_stride) == 0).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    assigned = _assign(df, cents, vec_col, id_col)
    # _assign is map-only now, so cluster rows by cell before the
    # partitioned write: one shuffle keyed on cid gives one file per cell
    # (the probe-pruning layout) instead of scan-tasks × cells fragments.
    # The shuffle width is pinned to the configured partition count:
    # without it AQE coalesces a small build to ONE task that opens every
    # cell's writer serially (measured 1.75 -> 1.50 s at sf0.1); at scale
    # the same knob spreads cells across the configured write width while
    # keeping each cell in one task (hash on cid).
    n_shuffle = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    assigned.repartition(n_shuffle, F.col("cid")).write.mode(
        "overwrite"
    ).partitionBy("cid").parquet(path)
    cents.write.mode("overwrite").parquet(f"{path}/_centroids")


def ivf_index_probe(
    spark,
    path: str,
    qvec: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe a built IVF index: rank the stored centroids against the
    query (C rows — driver-cheap), then scan ONLY the nprobe matching
    partitions (`cid IN (...)` lands in PartitionFilters — asserted in
    tests) and exact re-rank inside them."""
    cents = spark.read.parquet(f"{path}/_centroids")
    probe_cids = [
        int(r["cid"])
        for r in brute_force_topk(cents, qvec, k=nprobe, vec_col="cvec", id_col="cid").collect()
    ]
    cells = spark.read.parquet(path).where(F.col("cid").isin(probe_cids))
    return brute_force_topk(cells, qvec, k=k, vec_col=vec_col, id_col=id_col)


def _assign(df: DataFrame, cents: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Nearest-centroid assignment (argmax cosine, ties → lowest cid) —
    the shared first half of _assign_and_probe, reused by the persisted
    index builder.

    Map-only Arrow lowering (guide §4.2): the centroid table is collected
    (C rows by IVF's own contract — the same class of driver-side lookup
    as the probe's own centroid ranking) and each Arrow batch picks its
    nearest centroid with ONE numpy pass. The math replicates the JVM fold
    bit-for-bit: per (row, centroid), products are accumulated strictly
    left-to-right in float64 (a d-loop over vectorized (n×C) adds — NOT
    matmul, whose pairwise/BLAS summation reorders), norms fold the same
    way, and ties pick the lowest cid (centroids pre-sorted ascending;
    np.argmax returns the first maximum, and NaN ranks greatest exactly
    like Spark's double ordering). Rows whose vector is NULL, ragged, or
    carries a NULL element get a NULL dot against every centroid in the
    fold form, which ties all candidates and falls to the lowest cid —
    replicated explicitly. The previous pure-JVM fold (array_max over a
    1-row broadcast centroid array) was interpreted per row — measured
    ~400 µs/row (0.87 s for a 2000-row corpus at C=40, D=64) vs one
    vectorized batch pass; at corpus scale the per-row interpreted HOF is
    the whole cost of the assignment map. Kept as _assign_fold for shapes
    the Arrow path does not cover (ragged CENTROIDS)."""
    cid_type = cents.schema["cid"].dataType
    cent_rows = sorted(
        cents.select("cid", "cvec", "cnorm").collect(), key=lambda r: r["cid"]
    )
    base = df.select(id_col, vec_col)
    if not cent_rows:
        # Empty centroid table ≡ the old crossJoin-with-empty: no output.
        return base.where(F.lit(False)).withColumn(
            "cid", F.lit(None).cast(cid_type)
        )
    dims = {len(r["cvec"]) for r in cent_rows}
    if len(dims) != 1 or any(
        x is None for r in cent_rows for x in r["cvec"]
    ):
        return _assign_fold(df, cents, vec_col, id_col)

    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    cmat = np.array([[float(x) for x in r["cvec"]] for r in cent_rows])
    cnorm = np.array([float(r["cnorm"]) for r in cent_rows])
    cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
    ndim = cmat.shape[1]
    if isinstance(cid_type, LongType):
        cid_pa = pa.int64()
    elif isinstance(cid_type, IntegerType):
        cid_pa = pa.int32()
    else:
        return _assign_fold(df, cents, vec_col, id_col)
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, True),
            StructField(vec_col, df.schema[vec_col].dataType, True),
            StructField("cid", cid_type, True),
        ]
    )

    def assign_batches(batches):
        import pyarrow.compute as pc

        for batch in batches:
            n = batch.num_rows
            ids, emb = batch.column(0), batch.column(1)
            if n == 0:
                yield pa.RecordBatch.from_arrays(
                    [ids, emb, pa.array([], type=cid_pa)],
                    names=[id_col, vec_col, "cid"],
                )
                continue
            valid = pc.is_valid(emb).to_numpy(zero_copy_only=False)
            lens = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
            flat = emb.flatten()
            ok = bool(valid.all()) and bool(
                (lens == ndim).all()
            ) and flat.null_count == 0
            best = np.zeros(n, dtype=np.int64)
            if ok:
                vmat = (
                    flat.to_numpy(zero_copy_only=False)
                    .astype(np.float64)
                    .reshape(n, ndim)
                )
            else:
                # salvage the well-formed rows; degenerate rows (NULL /
                # ragged / NULL element) tie every centroid in the fold
                # form and take the lowest cid = index 0 after the sort
                rows = emb.to_pylist()
                good = [
                    i
                    for i, r in enumerate(rows)
                    if r is not None
                    and len(r) == ndim
                    and not any(x is None for x in r)
                ]
                vmat = np.array(
                    [[float(x) for x in rows[i]] for i in good]
                ).reshape(len(good), ndim)
            acc = np.zeros((vmat.shape[0], cmat.shape[0]))
            vsq = np.zeros(vmat.shape[0])
            for d in range(ndim):  # strict left-to-right fold order
                acc += vmat[:, d : d + 1] * cmat[None, :, d]
                vsq += vmat[:, d] * vmat[:, d]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = acc / (np.sqrt(vsq)[:, None] * cnorm[None, :])
            picks = np.argmax(cos, axis=1) if vmat.shape[0] else []
            if ok:
                best = np.asarray(picks, dtype=np.int64)
            else:
                for i, p in zip(good, picks):
                    best[i] = p
            yield pa.RecordBatch.from_arrays(
                [ids, emb, pa.array(cids[best], type=cid_pa)],
                names=[id_col, vec_col, "cid"],
            )

    return base.mapInArrow(assign_batches, out_schema)


def _assign_fold(
    df: DataFrame, cents: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Pure-JVM fold lowering of nearest-centroid assignment (the r17
    form): array_max over per-centroid (cos, -cid) structs against a
    1-row IdentityBroadcast centroid array. Reference semantics for the
    Arrow path (bit-equality pinned in tests) and the fallback for
    centroid shapes the vectorized path declines."""
    from pyspark.sql.functions import broadcast

    def _norm(vcol):
        vd = F.transform(vcol, lambda x: x.cast("double"))
        return F.sqrt(
            F.aggregate(F.transform(vd, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        )

    cents_row = cents.agg(
        F.collect_list(F.struct("cid", "cvec", "cnorm")).alias("__cents__")
    )

    def scored(c):
        dot = F.aggregate(
            F.zip_with(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                F.transform(c["cvec"], lambda x: x.cast("double")),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.struct(
            (dot / (F.col("__vnorm__") * c["cnorm"])).alias("__ccos__"),
            (-c["cid"]).alias("ncid"),
        )

    return (
        df.withColumn("__vnorm__", _norm(F.col(vec_col)))
        .crossJoin(broadcast(cents_row))
        # Empty centroid table ≡ the old crossJoin-with-empty: no output.
        .where(F.size(F.col("__cents__")) > 0)
        .withColumn("__best__", F.array_max(F.transform(F.col("__cents__"), scored)))
        .select(
            F.col(id_col),
            F.col(vec_col),
            (-F.col("__best__.ncid")).alias("cid"),
        )
    )
