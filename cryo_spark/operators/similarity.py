"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: one narrow pass (JVM zip_with dot
  product), orderBy-limit — Spark's TakeOrdered keeps only k rows per
  partition, so the shuffle carries k×partitions rows, not the table.
- IVF-style bucketed variant: deterministic random-hyperplane
  signatures narrow the scan to matching buckets first (probe with
  hamming-adjacent buckets for recall); the 100 TB path where the
  brute-force scan is too wide.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cryo_spark.operators.util import spread


def _dot_with_literal(vec_col: Column, query: list[float]) -> Column:
    return F.aggregate(
        F.zip_with(
            vec_col,
            F.array(*[F.lit(float(x)) for x in query]),
            lambda x, y: x.cast("double") * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query``. Deterministic
    tie-break on id."""
    emb = spread(emb)
    qnorm = float(np.sqrt(np.dot(query, query)))
    cos = _dot_with_literal(F.col(vec_col), query) / (_norm(F.col(vec_col)) * F.lit(qnorm))
    return (
        emb.select(F.col(id_col), F.round(cos, 8).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_sql(
    table: str, query: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> str:
    qlist = "[" + ", ".join(repr(float(x)) for x in query) + "]"
    # mirror the Spark float->double arithmetic: cast elements to double
    return f"""
SELECT {id_col},
  round(list_sum(list_transform(list_zip({vec_col}, {qlist}),
        x -> x[1]::DOUBLE * x[2]::DOUBLE))
    / (sqrt(list_sum(list_transform({vec_col}, x -> x::DOUBLE * x::DOUBLE)))
       * sqrt(list_sum(list_transform({qlist}::DOUBLE[], x -> x * x)))), 8) AS cosine
FROM {table}
ORDER BY cosine DESC, {id_col}
LIMIT {k}
"""


def bucketed_ann(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket of the query
    (plus all 1-bit-flip probe buckets) filtered first, then exact
    cosine within. Deterministic given ``seed``."""
    dim = len(query)
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_planes, dim))
    qsig = sum((1 << p) for p in range(n_planes) if float(planes[p] @ np.asarray(query)) >= 0)
    # multiprobe: query bucket plus every bucket within hamming
    # distance 2 — trades a wider (still tiny) probe set for recall
    probes = [qsig] + [qsig ^ (1 << p) for p in range(n_planes)] + [
        qsig ^ (1 << p) ^ (1 << q)
        for p in range(n_planes)
        for q in range(p + 1, n_planes)
    ]
    emb = spread(emb)
    sig: Column | None = None
    for p in range(n_planes):
        dot = _dot_with_literal(F.col(vec_col), [float(x) for x in planes[p]])
        bit = F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    qnorm = float(np.sqrt(np.dot(query, query)))
    cos = _dot_with_literal(F.col(vec_col), query) / (_norm(F.col(vec_col)) * F.lit(qnorm))
    return (
        emb.withColumn("_bucket", sig)
        .filter(F.col("_bucket").isin(probes))
        .select(F.col(id_col), F.round(cos, 8).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )
