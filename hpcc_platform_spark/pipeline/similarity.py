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


def _cosine(vec_col: str, qvec: Sequence[float]) -> F.Column:
    """Cosine similarity between a column array<float> and a literal query
    vector — F.zip_with dot product + norms, all JVM-side (no UDF)."""
    q = F.array(*[F.lit(float(x)) for x in qvec])
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
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vcol,
                        F.array(*[F.lit(float(x)) for x in h]),
                        lambda a, b: a.cast("double") * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for h in hyperplanes
        ]
        return F.concat(*bits)

    q_bits = "".join(
        "1" if sum(a * b for a, b in zip(qvec, h)) >= 0 else "0" for h in hyperplanes
    )
    bucketed = df.withColumn("__bucket__", bucket_of(F.col(vec_col)))
    probe = bucketed.where(F.col("__bucket__") == q_bits)
    return brute_force_topk(probe, qvec, k=k, vec_col=vec_col, id_col=id_col)
