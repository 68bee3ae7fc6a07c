"""Semantic deduplication (SemDeDup, Abbas et al. 2023 shape):
k-means-cluster the embedding space, then drop near-duplicate
vectors WITHIN each cluster — the way web-scale pipelines prune
semantically-redundant documents without an all-pairs cosine pass.

Scale design (the 100 TB story):
- clustering cost is bounded: centroids train driver-side on a
  deterministic TakeOrdered sample (``similarity.train_centroids``,
  <=4096 rows regardless of corpus size); full-table assignment is a
  narrow Arrow-batched GEMM (``similarity.ivf_assign``).
- the quadratic part is confined per cluster: one applyInPandas task
  per cluster does a single in-memory GEMM over that cluster's
  vectors — cost sum(|c|^2) instead of N^2, exactly the SemDeDup
  trade. One shuffle, keyed by cluster id.
- per-task memory is a cluster of vectors; size clusters accordingly
  (n_centroids ~ N / target_cluster_rows). A pathological mega-
  cluster can be re-blocked with ``dedup.embedding_near_dups_exact``
  restricted to that cluster — same keep rule composes.

Keep rule (deterministic): within a cluster, a vector is a duplicate
iff some LOWER-id vector lies within ``threshold`` cosine — the
greedy id-order sweep from the paper (iterate points in a fixed
order, drop anything too close to a survivor... with the
simplification that closeness to ANY earlier point drops, matching
the paper's reported-equivalent "random keeper" configuration) made
reproducible by using ids as the order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cryo_spark.operators.similarity import ivf_assign, train_centroids


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 4096,
    iters: int = 10,
    seed: int = 42,
) -> DataFrame:
    """(id, cluster_id, is_duplicate): k-means assignment plus the
    within-cluster near-dup verdict. Filter ``~is_duplicate`` for the
    pruned corpus."""
    cents = train_centroids(
        emb, n_centroids, id_col=id_col, vec_col=vec_col,
        sample=sample, iters=iters, seed=seed,
    )
    assigned = ivf_assign(emb, cents, vec_col=vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), "list_id"
    )

    def prune(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        m = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        cos = np.round(m @ m.T, 6)
        # strictly-lower-triangular: cos[i, j] for j < i compares row
        # i against every LOWER-id row — the greedy id-order sweep
        dup = (np.tril(cos >= threshold, k=-1)).any(axis=1)
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "cluster_id": np.full(len(pdf), key[0], dtype=np.int32),
                "is_duplicate": dup,
            }
        )

    out = assigned.groupBy("list_id").applyInPandas(
        prune, "id long, cluster_id int, is_duplicate boolean"
    )
    return out.select(
        F.col("id").alias(id_col), "cluster_id", "is_duplicate"
    )
