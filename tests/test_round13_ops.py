"""Round-13 regression tests: the spread() plan probe, the
connected-components single-job driver probe, the logs_decoded
scope-delta substance, and the plan-fingerprint cache-body elision."""

from __future__ import annotations

from pyspark.sql import functions as F


# ------------------ spread(): analyzed-plan probe, no hidden execution


def test_spread_narrow_scan_repartitions(spark, sf_dir):
    """A narrow chain over a small file scan still gets spread to
    defaultParallelism — the case the helper exists for."""
    from cryo_spark.operators.util import spread

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = spread(docs.select("doc_id", "text"))
    assert (
        out.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )


def test_spread_wide_ancestor_is_noop_and_runs_no_jobs(spark, sf_dir):
    """A frame with a join/aggregate upstream is returned UNCHANGED
    and — the round-13 fix — probing it runs zero Spark jobs (the old
    `.rdd` probe executed every upstream AQE query stage at
    plan-construction time and then repartitioned the AQE-coalesced
    result, adding a full-corpus exchange above every join)."""
    from cryo_spark.operators.util import spread

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    agg = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    joined = docs.join(agg, "source")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    out = spread(joined)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert out is joined
    assert after == before, "spread probed a wide frame with a job"
    # same for an aggregate and a checkpoint leaf
    assert spread(agg) is agg
    ck = docs.limit(5).localCheckpoint()
    assert spread(ck) is ck  # LogicalRDD leaf


def test_spread_column_named_join_not_fooled(spark, sf_dir):
    """The wide-ancestor probe anchors to plan-node positions — a
    column literally named `Join` (or `Sort`) in a narrow scan plan
    must not suppress the repartition."""
    from cryo_spark.operators.util import spread

    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id"),
        F.col("text").alias("Join"),
        F.lit("Sort").alias("Sort"),
    )
    out = spread(df)
    assert (
        out.rdd.getNumPartitions()
        >= spark.sparkContext.defaultParallelism
    )


# ------------------ connected components: single bounded probe job


def test_cc_driver_probe_single_job_and_bounded(spark):
    """The small-graph fast path decides AND fetches with one
    limit-bounded collect: at most threshold+1 rows ever cross to the
    driver, and the verdict matches the distributed loop."""
    from cryo_spark.operators import dedup

    edges = [(1, 2), (2, 3), (5, 6), (7, 7), (8, 9), (9, 8)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {
        (r.id, r.component)
        for r in dedup.connected_components(pairs).collect()
    }
    slow = {
        (r.id, r.component)
        for r in dedup.connected_components(
            pairs, driver_threshold=0
        ).collect()
    }
    assert fast == slow
    assert fast == {
        (1, 1), (2, 1), (3, 1), (5, 5), (6, 5), (8, 8), (9, 8),
    }
    # over-threshold probe falls through to the distributed loop
    big = dedup.connected_components(pairs, driver_threshold=2)
    assert {
        (r.id, r.component) for r in big.collect()
    } == fast


def test_cc_empty_pairs(spark):
    from cryo_spark.operators import dedup

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.connected_components(pairs).count() == 0


# ------------------ logs_decoded: the 2.1x-vs-r1 scope delta is substance


def test_logs_decoded_scope_delta_ab(spark):
    """BASELINE.md's dataset_logs_decoded attribution: the r1-scope
    rendering (`be_uint(word).cast("string")`, a decimal(38,0) chain
    over the LOW 16 BYTES) silently WRAPS any u256 value mod 2^128 —
    and NULLs 16-byte values past 38 digits — while the current
    Arrow-UDF path renders all 78 digits exactly. The measured 1.86x
    (see BASELINE.md) is the price of exactness, not a plan
    regression."""
    from cryo_spark.functions import be_uint, u256_string_udf

    big = 2**255 + 12345     # 77 digits: r1 scope wraps to the low word
    wide16 = 10**38 + 7      # fits 16 bytes but overflows decimal(38)
    small = 10**20
    rows = [
        (bytearray(v.to_bytes(32, "big")),) for v in (big, wide16, small)
    ]
    df = spark.createDataFrame(rows, "word binary")
    got = df.select(
        u256_string_udf(F.col("word")).alias("exact"),
        be_uint(F.col("word")).cast("string").alias("r1_scope"),
    ).collect()
    by_exact = {r.exact: r.r1_scope for r in got}
    assert by_exact[str(big)] == "12345"       # wrapped mod 2^128
    assert by_exact[str(wide16)] is None       # decimal(38) overflow
    assert by_exact[str(small)] == str(small)  # only narrow values agree


# ------------------ plan fingerprint: cached-plan bodies elided


def test_plan_fingerprint_ignores_cache_materialization_state(spark):
    """A query over a persisted frame must fingerprint identically
    before and after the cache materializes — the inner AQE plan
    flips isFinalPlan/ResultQueryStage text at materialization
    (round 13: corpus_funnel's pin moved with construction order)."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench_mod", pathlib.Path(__file__).parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    base = (
        spark.range(500)
        .groupBy((F.col("id") % 5).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    try:
        q = base.filter(F.col("n") > 0).select("k")
        fp_before = bench.plan_fingerprint(q)[0]
        base.count()  # materialize the cache
        q2 = base.filter(F.col("n") > 0).select("k")
        fp_after = bench.plan_fingerprint(q2)[0]
        assert fp_before == fp_after
    finally:
        base.unpersist()


# ------------------ multi-probe LSH (query-directed probing)


def test_lsh_probe_masks_properties(spark):
    """Masks are deterministic, unique, start at the home bucket, and
    expand in non-decreasing flip-cost order."""
    from cryo_spark.operators import similarity

    query = [0.1 * ((i % 7) - 3) for i in range(64)]
    qsig, masks = similarity.lsh_probe_masks(
        query, n_planes=8, seed=42, n_probes=12
    )
    qsig2, masks2 = similarity.lsh_probe_masks(
        query, n_planes=8, seed=42, n_probes=12
    )
    assert (qsig, masks) == (qsig2, masks2)
    assert masks[0] == 0
    assert len(masks) == 12 and len(set(masks)) == 12
    assert all(0 <= m < 256 for m in masks)
    # max_flips bounds popcount
    _, narrow = similarity.lsh_probe_masks(
        query, n_planes=8, seed=42, n_probes=12, max_flips=1
    )
    assert all(bin(m).count("1") <= 1 for m in narrow)
    assert len(narrow) == 9  # home + 8 single flips exhaust the space


def test_lsh_topk_multiprobe_matches_duckdb(spark):
    """The multi-probe tier's DuckDB twin reproduces the row set
    bit-for-bit — same integer signatures, same literal probe masks,
    same round-8 rescoring."""
    import duckdb

    from cryo_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    query = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]
    ]
    got = [
        (r.vec_id, r.cosine)
        for r in similarity.lsh_topk_multiprobe(
            emb, query, k=10, n_planes=6, n_probes=16
        ).collect()
    ]
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/embeddings.parquet')"
    )
    want = con.sql(
        similarity.lsh_topk_multiprobe_sql(
            "embeddings", query, k=10, n_planes=6, n_probes=16
        )
    ).fetchall()
    con.close()
    assert len(got) == 10
    assert got == [(a, b) for a, b in want]


def test_lsh_multiprobe_recall_dominates_single_bucket(spark):
    """More probes recover strictly more of the exact top-k than the
    home bucket alone on the real table."""
    from cryo_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    query = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    exact = {
        r.vec_id
        for r in similarity.cosine_topk(emb, query, k=10).collect()
    }

    def recall(n_probes):
        hits = {
            r.vec_id
            for r in similarity.lsh_topk_multiprobe(
                emb, query, k=10, n_planes=6, n_probes=n_probes
            ).collect()
        }
        return len(hits & exact) / 10

    assert recall(16) >= recall(1)
    assert recall(16) >= 0.5


# ------------------ auto-sized n_planes + fused stats job


def test_hard_negatives_auto_planes_scale(spark):
    """A 100k-row frame auto-picks >= 7 planes (the r12 verdict's
    planted test) and the pure helper matches the documented curve."""
    from cryo_spark.operators import similarity

    assert similarity.default_n_planes(500) == 6
    assert similarity.default_n_planes(1000) == 6
    assert similarity.default_n_planes(100_000) >= 7
    assert similarity.default_n_planes(10**8) == 17
    assert similarity.default_n_planes(10**12) == 24  # capped


def test_hard_negatives_no_extra_job_when_pinned(spark):
    """With n_planes AND dim supplied, hard_negatives construction
    runs ZERO jobs (the old dim probe was its own driver job even
    when unused — r12 verdict task 8); with both omitted it runs
    exactly ONE fused stats job."""
    from cryo_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    tracker = spark.sparkContext.statusTracker()

    def jobs():
        return len(tracker.getJobIdsForGroup(None) or [])

    before = jobs()
    similarity.hard_negatives(emb, k=2, n_planes=6, dim=64)
    assert jobs() == before, "pinned call ran a construction job"
    similarity.hard_negatives(emb, k=2, n_planes=6, dim=64, method="gemm")
    assert jobs() == before, "pinned gemm call ran a construction job"
    # dim inference is FUSED into the auto-planes count: omitting dim
    # adds zero jobs over omitting it not (AQE may split the one agg
    # into multiple jobs, so compare the two auto variants, not an
    # absolute count)
    j0 = jobs()
    similarity.hard_negatives(emb, k=2, dim=64)  # auto planes only
    auto_planes_jobs = jobs() - j0
    j1 = jobs()
    similarity.hard_negatives(emb, k=2)  # auto planes AND auto dim
    fused_jobs = jobs() - j1
    assert auto_planes_jobs >= 1
    assert fused_jobs == auto_planes_jobs, (fused_jobs, auto_planes_jobs)
