"""Vector-tier scale stress: N synthetic 64-dim vectors (default
200k — 100x the sf0.1 embeddings table) on local[32].

Measures what SCALE.md's vector-tier claims assert but nothing
previously timed at volume:

1. exact cosine top-k (the brute-force scan every tier is judged
   against),
2. LSH top-k (engine-neutral integer-signature tier) — latency +
   recall@10,
3. IVF index build (driver k-means on the bounded sample + the one
   distributed assign pass) and the amortized per-query probe scan,
4. PQ encode + IVF-PQ ADC query over m-byte codes.

Vectors are deterministic JVM arithmetic (xxhash64(vec_id, dim) mapped
to [-0.5, 0.5]) — no driver-side generation, no data shipped, any
cluster layout reproduces the same corpus.

Usage: python tools/stress_ann.py [n_vectors]
Numbers are recorded in SCALE.md (round-12 measured findings).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cryo_spark import get_spark
from cryo_spark.operators import similarity


def graph_stress(spark, emb, n: int, dim: int) -> None:
    """Round 14: whole-corpus kNN GRAPH — corpus-as-queries through
    the same one-bucket-join path, the SemDeDup input shape that was
    the r13 scale flag (per-row Python probe fold; now one int64 GEMM
    per Arrow batch). Recall is measured on PLANTED CLONE FAMILIES
    (50 families x 5 jittered members at cosine ~0.9999 — the
    "duplicate cluster" shape the graph exists to find; near-uniform
    corpus rows are the usual information-theoretic worst case):
    recall = fraction of intra-family edges recovered in each member's
    top-10.

    Plane count follows the SCALING LAW the 1M run exists to confirm
    (round 15): planes = round(log2(n / 24)) keeps E[bucket] ~ flat
    (24-30 rows), so per-query candidate work stays ~n_probes x
    E[bucket] ~ 400-500 dots — ROW-COUNT-INDEPENDENT; total work then
    grows linearly in n, not quadratically. 200k -> 13 planes,
    1M -> 15 planes (+log2(5) ~ +2.3)."""
    import math

    g_planes = max(13, int(round(math.log2(max(n, 48) / 24))))
    fam, per = 50, 5
    fam_base = (F.floor(F.col("id") / per) * (n // fam)).cast("long")
    clone = F.array(*[
        (
            (F.xxhash64(fam_base, F.lit(i)) % 100_000).cast("double")
            / 100_000.0
            + ((F.xxhash64(F.col("id") + n, F.lit(1000 + i)) % 100)
               .cast("double") - 50.0) / 5000.0
        ).cast("float")
        for i in range(dim)
    ])
    planted2 = spark.range(0, fam * per, 1, 8).select(
        (F.col("id") + n).alias("vec_id"), clone.alias("embedding")
    )
    graph_corpus = emb.unionByName(planted2).localCheckpoint()
    t = time.time()
    g = similarity.knn_graph(
        graph_corpus, k=10, n_planes=g_planes, n_probes=16
    ).localCheckpoint()
    n_edges = g.count()
    t_graph = time.time() - t
    intra = g.filter(
        (F.col("src") >= n) & (F.col("dst") >= n)
        & (F.floor((F.col("src") - n) / per)
           == F.floor((F.col("dst") - n) / per))
    ).count()
    r_graph = intra / (fam * per * (per - 1))
    print(
        f"knn_graph: {t_graph:.2f}s for the full {n + fam * per}-row "
        f"graph ({(n + fam * per) / t_graph:,.0f} rows/s, {n_edges} "
        f"edges, {g_planes} planes x 16 probes), planted-family "
        f"recall@10 {r_graph:.2f}"
    )
    assert r_graph >= 0.9, r_graph

    # round 14: graph_dedup on the same planted corpus — the end-to-end
    # dedup DECISION at volume (edges >= threshold -> components ->
    # min-id keepers). Every planted family should collapse onto its
    # min id; near-uniform corpus rows stay keepers.
    t = time.time()
    verdict = similarity.graph_dedup(
        graph_corpus, threshold=0.999, k=10, n_planes=g_planes,
        n_probes=16,
    ).localCheckpoint()
    n_dups = verdict.filter(F.col("is_duplicate")).count()
    t_gd = time.time() - t
    collapsed = verdict.filter(
        (F.col("vec_id") >= n) & F.col("is_duplicate")
    ).count()
    print(
        f"graph_dedup: {t_gd:.2f}s for {n + fam * per} rows, {n_dups} "
        f"duplicates flagged ({collapsed}/{fam * (per - 1)} planted "
        f"family members collapsed)"
    )
    assert collapsed >= int(0.9 * fam * (per - 1)), collapsed


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    only_graph = len(sys.argv) > 2 and sys.argv[2] == "graph"
    spark = get_spark(app_name="stress_ann")
    spark.sparkContext.setLogLevel("ERROR")

    dim = 64
    vec = F.array(*[
        (
            (F.xxhash64(F.col("vec_id"), F.lit(i)) % 100_000).cast("double")
            / 100_000.0
        ).cast("float")
        for i in range(dim)
    ])
    emb = (
        spark.range(0, n, 1, 32)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .localCheckpoint()  # materialize once: every tier reads the
        # same corpus instead of re-deriving 64 hashes per row per tier
    )
    emb.count()
    query = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    print(f"corpus: {n} x {dim} float32 vectors")

    if only_graph:
        # `stress_ann.py 1000000 graph`: just the kNN-graph/graph_dedup
        # tier (the round-15 1M plane-scaling-law confirmation) without
        # paying the exact/LSH/IVF/PQ tiers at that volume
        graph_stress(spark, emb, n, dim)
        spark.stop()
        return 0

    t = time.time()
    exact = similarity.cosine_topk(emb, query, k=10).collect()
    t_exact = time.time() - t
    exact_ids = {r.vec_id for r in exact}
    print(f"exact_topk: {t_exact:.2f}s (the full-scan baseline)")

    t = time.time()
    lsh = similarity.lsh_topk(emb, query, k=10).collect()
    t_lsh = time.time() - t
    r_lsh = len(exact_ids & {r.vec_id for r in lsh}) / 10
    print(f"lsh_topk: {t_lsh:.2f}s, recall@10 {r_lsh:.2f}")
    assert r_lsh >= 0.3, r_lsh  # plumbing floor, not a quality claim

    # round 13: query-directed multi-probe (auto-sized planes, probes
    # ordered by exact-integer flip margin) — the recall tier.
    # RECALL is measured on a PLANTED NEIGHBORHOOD: near-uniform
    # random vectors are every LSH family's information-theoretic
    # worst case (a uniform query's "nearest" neighbors are barely
    # correlated with it, so recall is just bucket coverage — the same
    # reason the IVF floors below are plumbing floors). Real
    # embeddings cluster; 50 planted neighbors at cosine ~0.99 model
    # that, and the exact top-10 for the query IS the planted set, so
    # the recall number means "does margin-ordered probing find the
    # true cluster", not "can 19% bucket coverage beat noise".
    # Target: recall@10 >= 0.8 at <= 2x the single-tier query time.
    n_planes = similarity.default_n_planes(n)
    base = F.array(*[F.lit(float(x)).cast("float") for x in query])
    jitter = F.array(*[
        (
            F.element_at(base, i + 1).cast("double")
            + ((F.xxhash64(F.col("vec_id"), F.lit(i)) % 100).cast("double")
               - 50.0) / 5000.0
        ).cast("float")
        for i in range(dim)
    ])
    planted = (
        spark.range(n, n + 50, 1, 4)
        .select(F.col("id").alias("vec_id"), jitter.alias("embedding"))
    )
    clustered = emb.unionByName(planted).localCheckpoint()
    exact_p = {
        r.vec_id
        for r in similarity.cosine_topk(clustered, query, k=10).collect()
    }
    t = time.time()
    mp = similarity.lsh_topk_multiprobe(
        clustered, query, k=10, n_planes=n_planes, n_probes=16
    ).collect()
    t_mp = time.time() - t
    r_mp = len(exact_p & {r.vec_id for r in mp}) / 10
    print(
        f"lsh_topk_multiprobe: {t_mp:.2f}s ({n_planes} planes, 16 "
        f"probes, planted neighborhood), recall@10 {r_mp:.2f}"
    )
    assert r_mp >= 0.8, r_mp
    assert t_mp <= 2 * t_lsh + 0.5, (t_mp, t_lsh)

    # IVF: index built once (the persisted-index model), queries
    # amortize it — time build and query separately
    t = time.time()
    smp = similarity.sample_matrix(emb)
    cents = similarity.train_centroids(emb, n_centroids=16, sample_rows=smp)
    assigned = similarity.ivf_assign(emb, cents).localCheckpoint()
    n_assigned = assigned.count()
    t_build = time.time() - t
    # near-UNIFORM vectors are the coarse quantizer's worst case
    # (real embeddings cluster; uniform ones barely do, so a true
    # neighbor's list correlates weakly with the query's) — probe
    # half the lists and use a plumbing floor, not a quality claim
    t = time.time()
    ivf = similarity.ivf_topk(
        emb, query, k=10, n_centroids=16, n_probe=8,
        assigned=assigned, centroids=cents,
    ).collect()
    t_ivf = time.time() - t
    r_ivf = len(exact_ids & {r.vec_id for r in ivf}) / 10
    print(
        f"ivf: build {t_build:.2f}s ({n_assigned / t_build:,.0f} vec/s "
        f"assign), query {t_ivf:.2f}s (8/16 lists), recall@10 {r_ivf:.2f}"
    )
    assert r_ivf >= 0.4, r_ivf

    # round 13: embedding incremental index at volume — sign+save the
    # corpus once (bucketed), then probe a 1% delta against it
    from cryo_spark.operators import incremental

    table = "stress_emb_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    t = time.time()
    incremental.save_embedding_index(
        incremental.embedding_index(emb), table
    )
    t_ebuild = time.time() - t
    delta = emb.filter(F.col("vec_id") % 100 == 0)
    # sign the delta with the INDEX's stored (n_planes, seed) — a
    # day-sized batch would auto-size differently and (by design)
    # trip the mismatch guard
    didx = incremental.embedding_index_for_table(spark, table, delta)
    t = time.time()
    npairs = incremental.incremental_embedding_pairs_from_table(
        spark, table, didx, min_cosine=0.99
    ).count()
    t_eprobe = time.time() - t
    print(
        f"embedding_index: build+save {t_ebuild:.2f}s "
        f"({n / t_ebuild:,.0f} vec/s), 1% delta probe {t_eprobe:.2f}s "
        f"({npairs} pairs >= 0.99)"
    )
    plan = incremental.incremental_embedding_pairs_from_table(
        spark, table, didx
    )._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    # 0 pairs >= 0.99 is EXPECTED on near-uniform vectors; prove the
    # join surface is live by counting raw bucket candidates
    ncand = incremental.incremental_embedding_pairs_from_table(
        spark, table, didx, min_cosine=-1.0
    ).count()
    assert ncand > 0, "bucket join produced no candidates at volume"

    # round 13: BATCHED serving against the same persisted index —
    # 1,000 queries answered by ONE bucket join, zero corpus movement
    queries = emb.filter(F.col("vec_id") % 200 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    nq = queries.count()
    t = time.time()
    served = similarity.lsh_topk_batch_from_index(
        spark, table, queries, k=10, n_probes=16
    )
    nrows = served.count()
    t_serve = time.time() - t
    print(
        f"batched_ann_serving: {t_serve:.2f}s for {nq} queries x top-10 "
        f"({nq / t_serve:,.0f} queries/s, {nrows} result rows, one "
        f"bucket join, corpus never moves)"
    )
    assert nrows > 0

    # round 14: the SAME 1,000 queries against a SERVING-SIZED index
    # (13 planes -> 8,192 buckets, E[bucket] ~ 24 at 200k, vs the
    # dedup-sized auto default of ~780/bucket). Serving cost is the
    # bucket join's candidate dots (n_probes x E[bucket] per query) —
    # the plane count, not the probe emitter, is the knob.
    table13 = "stress_emb_idx13"
    spark.sql(f"DROP TABLE IF EXISTS {table13}")
    incremental.save_embedding_index(
        incremental.embedding_index(emb, n_planes=13), table13,
        n_buckets=64,
    )
    t = time.time()
    served13 = similarity.lsh_topk_batch_from_index(
        spark, table13, queries, k=10, n_probes=16
    )
    nrows13 = served13.count()
    t_serve13 = time.time() - t
    print(
        f"batched_ann_serving_13planes: {t_serve13:.2f}s for {nq} "
        f"queries ({nq / t_serve13:,.0f} queries/s, {nrows13} rows) — "
        f"vs {t_serve:.2f}s on the auto-planes index"
    )
    spark.sql(f"DROP TABLE IF EXISTS {table13}")
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    graph_stress(spark, emb, n, dim)

    t = time.time()
    books = similarity.pq_train(emb, sample_rows=smp)
    codes = similarity.pq_encode(assigned, books).localCheckpoint()
    n_codes = codes.count()
    t_enc = time.time() - t
    t = time.time()
    ivfpq = (
        similarity.ivfpq_topk(
            emb, query, k=10, n_probe=8,
            centroids=cents, codebooks=books, codes_df=codes,
        )
    ).collect()
    t_pq = time.time() - t
    r_pq = len(exact_ids & {r.vec_id for r in ivfpq}) / 10
    print(
        f"ivfpq: encode {t_enc:.2f}s ({n_codes / t_enc:,.0f} vec/s), "
        f"query {t_pq:.2f}s, recall@10 {r_pq:.2f}"
    )
    assert r_pq >= 0.1, r_pq  # ADC on near-uniform vectors: plumbing floor

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
