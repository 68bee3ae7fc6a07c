"""Round-6 operators: DSIR importance resampling, incremental
minhash-index dedup, and the MLlib quality classifier."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cryo_spark.operators import classifier, dedup, dsir, incremental

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _oracle_con(sf_dir: str = SF_DIR):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols).reset_index(drop=True).astype(str)


# ---------------------------------------------------------------- dsir


def test_dsir_bucket_hash_matches_duckdb(spark):
    """The md5-derived bucket must be engine-portable — it is the
    foundation of the oracle contract."""
    df = spark.createDataFrame(
        [("hello world",), ("spark sql",), ("",), ("Ünïcode tæxt",)],
        "g string",
    )
    got = {
        r.g: r.b
        for r in df.select(
            "g", dsir._bucket_col(F.col("g"), 4096).alias("b")
        ).collect()
    }
    con = duckdb.connect()
    for g, b in got.items():
        want = con.sql(
            f"SELECT {dsir._bucket_sql('?', 4096)}", params=[g]
        ).fetchone()[0]
        assert b == want, g
    con.close()


def test_dsir_select_matches_duckdb_oracle(spark):
    docs = _docs(spark)
    target = docs.filter(F.col("lang") == "en")
    out = dsir.dsir_select(docs, target, k=25).toPandas()
    con = _oracle_con()
    con.sql("CREATE VIEW tgt AS SELECT * FROM documents WHERE lang='en'")
    want = con.sql(dsir.dsir_select_sql("documents", "tgt", 25)).df()
    con.close()
    assert _canon(out).equals(_canon(want))


def test_dsir_gumbel_variant_matches_duckdb_and_differs(spark):
    docs = _docs(spark)
    target = docs.filter(F.col("lang") == "en")
    out = dsir.dsir_select(docs, target, k=25, gumbel_seed="g1").toPandas()
    con = _oracle_con()
    con.sql("CREATE VIEW tgt AS SELECT * FROM documents WHERE lang='en'")
    want = con.sql(
        dsir.dsir_select_sql("documents", "tgt", 25, gumbel_seed="g1")
    ).df()
    con.close()
    assert _canon(out).equals(_canon(want))
    hard = dsir.dsir_select(docs, target, k=25).toPandas()
    # the resampler must actually perturb the selection...
    assert set(out.doc_id) != set(hard.doc_id)
    # ...and be seed-deterministic
    again = dsir.dsir_select(docs, target, k=25, gumbel_seed="g1").toPandas()
    assert _canon(out).equals(_canon(again))


def test_dsir_prefers_target_like_docs(spark):
    """Planted check: raw corpus of 'web noise' + a few docs drawn
    from the target vocabulary — those must win the top ranks."""
    target_rows = [
        (100 + i, f"science paper method result data model test {i}")
        for i in range(10)
    ]
    noise_rows = [
        (i, f"buy cheap pills now click here win prize {i} {i * 7}")
        for i in range(40)
    ]
    planted = [
        (900 + i, "science paper method result data analysis")
        for i in range(3)
    ]
    schema = "doc_id long, text string"
    raw = spark.createDataFrame(noise_rows + planted, schema)
    target = spark.createDataFrame(target_rows, schema)
    top = dsir.dsir_select(raw, target, k=3).toPandas()
    assert set(top.doc_id) == {900, 901, 902}
    # weights of planted docs strictly above every noise doc
    allw = dsir.dsir_weights(raw, target).toPandas()
    planted_min = allw[allw.doc_id >= 900].logw.min()
    noise_max = allw[allw.doc_id < 900].logw.max()
    assert planted_min > noise_max


def test_dsir_select_plans_take_ordered(spark):
    """Top-k must be per-task heaps (TakeOrderedAndProject), not a
    global single-partition sort of the weights table."""
    docs = _docs(spark)
    target = docs.filter(F.col("lang") == "en")
    plan = (
        dsir.dsir_select(docs, target, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------- incremental index


def test_incremental_equals_batch(spark):
    """index(base)+delta must reproduce the from-scratch run exactly:
    same pairs, same signature estimates."""
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    bi = incremental.minhash_index(base)
    ni = incremental.minhash_index(new)
    full = incremental.minhash_index(docs)
    batch = incremental.signature_pairs(full).toPandas()
    incr = pd.concat(
        [
            incremental.signature_pairs(bi).toPandas(),
            incremental.incremental_pairs(bi, ni).toPandas(),
        ]
    )
    assert _canon(batch).equals(_canon(incr))


def test_incremental_candidates_match_lsh(spark):
    """The index path's candidate set must equal the oracle-proven
    dedup.minhash_lsh_candidates at the same (k, bands)."""
    docs = _docs(spark)
    full = incremental.minhash_index(docs)
    got = incremental.signature_pairs(full).toPandas()[["id_a", "id_b"]]
    want = dedup.minhash_lsh_candidates(docs, k=16, bands=4).toPandas()
    assert _canon(got).equals(_canon(want))


def test_incremental_index_roundtrip(spark, tmp_path):
    """The index survives a parquet write/read (the persisted-index
    workflow) and keeps producing identical pairs."""
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "mh_index")
    incremental.minhash_index(base).write.parquet(path)
    loaded = spark.read.parquet(path)
    direct = incremental.incremental_pairs(
        incremental.minhash_index(base), incremental.minhash_index(new)
    ).toPandas()
    via_disk = incremental.incremental_pairs(
        loaded, incremental.minhash_index(new)
    ).toPandas()
    assert _canon(direct).equals(_canon(via_disk))


def test_est_jaccard_bounds_and_identity(spark):
    docs = _docs(spark).limit(20)
    idx = incremental.minhash_index(docs)
    self_pairs = (
        idx.alias("a")
        .join(idx.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"))
        .select(
            incremental.est_jaccard(
                F.col("a.sig"), F.col("b.sig")
            ).alias("e")
        )
        .collect()
    )
    assert all(r.e == 1.0 for r in self_pairs)
    pairs = incremental.signature_pairs(idx).collect()
    assert all(0.0 <= r.est_jaccard <= 1.0 for r in pairs)


def test_with_est_false_returns_same_candidates(spark):
    """The bare-candidate fast path (used by the contract entry,
    where an exact verify supersedes the estimate) must agree with
    the estimating path on the pair set."""
    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    bi = incremental.minhash_index(base)
    ni = incremental.minhash_index(new)
    bare = incremental.incremental_pairs(bi, ni, with_est=False)
    assert bare.columns == ["id_a", "id_b"]
    est = incremental.incremental_pairs(bi, ni)[["id_a", "id_b"]]
    assert _canon(bare.toPandas()).equals(_canon(est.toPandas()))


def test_incremental_empty_delta(spark):
    docs = _docs(spark)
    bi = incremental.minhash_index(docs)
    ni = incremental.minhash_index(docs.filter(F.lit(False)))
    assert incremental.incremental_pairs(bi, ni).count() == 0


# ------------------------------------------------------------ classifier


def _planted_corpus(spark, n=200):
    """Separable corpus: 'clean prose' vs 'spam' vocabulary."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            t = f"the model result shows clear method and data analysis {i}"
            y = 1.0
        else:
            t = f"click here buy now cheap deal win free prize {i} {i * 3}"
            y = 0.0
        rows.append((i, t, y))
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_classifier_separates_planted_corpus(spark):
    labeled = _planted_corpus(spark)
    train = labeled.filter(F.col("doc_id") % 5 != 0)
    test = labeled.filter(F.col("doc_id") % 5 == 0)
    m = classifier.train_quality_classifier(train)
    scored = classifier.score_quality(test, m).join(
        test.select("doc_id", "label"), "doc_id"
    )
    assert classifier.auc(scored) >= 0.95


def test_classifier_score_is_narrow_plan(spark):
    """Corpus scoring must stay a map-only pass — no Exchange in the
    scoring subtree (the 100 TB side is never shuffled)."""
    labeled = _planted_corpus(spark, n=40)
    m = classifier.train_quality_classifier(labeled)
    plan = (
        classifier.score_quality(_docs(spark), m)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_classifier_featurize_deterministic(spark):
    df = _docs(spark).limit(30)
    a = classifier.featurize(df).select("doc_id", "features").collect()
    b = classifier.featurize(df).select("doc_id", "features").collect()
    assert {r.doc_id: r.features for r in a} == {
        r.doc_id: r.features for r in b
    }


def test_auc_known_values(spark):
    perfect = spark.createDataFrame(
        [(1.0, 0.9), (1.0, 0.8), (0.0, 0.2), (0.0, 0.1)],
        "label double, quality_prob double",
    )
    assert classifier.auc(perfect) == 1.0
    inverted = spark.createDataFrame(
        [(0.0, 0.9), (0.0, 0.8), (1.0, 0.2), (1.0, 0.1)],
        "label double, quality_prob double",
    )
    assert classifier.auc(inverted) == 0.0


# ------------------------------------------------- random projection


def test_project_embeddings_matches_numpy(spark):
    import numpy as np

    from cryo_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = similarity.project_embeddings(emb, out_dim=8, seed=3).select(
        "vec_id", "embedding", "projected"
    ).toPandas()
    dim = len(out.embedding.iloc[0])
    rng = np.random.default_rng(3)
    mat, _ = np.linalg.qr(rng.standard_normal((dim, 8)))
    want = np.stack(out.embedding.map(np.asarray).to_numpy()) @ mat
    got = np.stack(out.projected.map(np.asarray).to_numpy())
    assert float(np.abs(want - got).max()) < 1e-12


def test_project_embeddings_preserves_distances(spark):
    """JL property: pairwise distances survive an orthonormal
    projection to a reasonable dimension within loose relative
    error (sanity bound, not a tight JL constant)."""
    import numpy as np

    from cryo_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(50)
    out = similarity.project_embeddings(emb, out_dim=32, seed=5).select(
        "embedding", "projected"
    ).toPandas()
    x = np.stack(out.embedding.map(np.asarray).to_numpy())
    y = np.stack(out.projected.map(np.asarray).to_numpy())
    dx = np.linalg.norm(x[:, None, :] - x[None, :, :], axis=2)
    dy = np.linalg.norm(y[:, None, :] - y[None, :, :], axis=2)
    iu = np.triu_indices(len(x), k=1)
    ratio = dy[iu] / np.where(dx[iu] == 0, 1, dx[iu])
    assert 0.4 < ratio.mean() < 1.1
    assert ratio.max() <= 1.0 + 1e-9  # orthonormal: never expands


def test_project_embeddings_deterministic_and_bounds(spark):
    from cryo_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(10)
    a = similarity.project_embeddings(emb, out_dim=4, seed=9).select(
        "vec_id", "projected"
    ).collect()
    b = similarity.project_embeddings(emb, out_dim=4, seed=9).select(
        "vec_id", "projected"
    ).collect()
    assert {r.vec_id: r.projected for r in a} == {
        r.vec_id: r.projected for r in b
    }
    with pytest.raises(ValueError):
        dim = len(emb.select("embedding").first()[0])
        similarity.project_embeddings(emb, out_dim=dim + 1).collect()


# ---------------------------------------------------- fuzzy decontam


def test_fuzzy_decontaminate_flags_near_copies(spark):
    from cryo_spark.operators import decontam

    eval_text = (
        "which of the following best describes the process by which "
        "plants convert sunlight water and carbon dioxide into "
        "glucose and oxygen during the light dependent reactions"
    )
    near_copy = eval_text.replace("glucose", "sugar")  # paraphrased leak
    clean = (
        "the quarterly report shows revenue growth across all "
        "regions with particular strength in the northern markets "
        "and steady margins through the fiscal year"
    )
    docs = spark.createDataFrame(
        [(1, near_copy), (2, clean), (3, eval_text)],  # 3 = verbatim leak
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(1, eval_text)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in decontam.fuzzy_decontaminate(docs, eval_docs).collect()
    }
    assert len(out) == 3  # one row per training doc
    assert out[3].contaminated and out[3].max_est_jaccard == 1.0
    assert out[3].contaminated_by == 1
    assert out[1].contaminated and out[1].max_est_jaccard >= 0.5
    assert not out[2].contaminated and out[2].max_est_jaccard == 0.0


def test_fuzzy_decontaminate_shared_ids_never_self_pair(spark):
    """A corpus doc and an eval doc sharing the same id value must
    still pair (the two id spaces live on opposite join sides and
    never mix)."""
    from cryo_spark.operators import decontam

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    eval_docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    out = decontam.fuzzy_decontaminate(docs, eval_docs).collect()[0]
    assert out.contaminated and out.contaminated_by == 7


def test_fuzzy_decontaminate_negative_and_string_ids(spark):
    """Ids outside [0, inf) longs work: read_documents emits SIGNED
    xxhash64 ids, and benchmark sets often carry string ids. The old
    ``-id - 1`` offset trick folded eval id -1 onto corpus id 0 and
    nulled string ids; both regimes must flag correctly now."""
    from cryo_spark.operators import decontam

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten eleven"
    # negative ids on both sides, including the -1/0 collision pair
    docs = spark.createDataFrame(
        [(0, text), (-1, other)], "doc_id long, text string"
    )
    eval_docs = spark.createDataFrame(
        [(-1, text)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in decontam.fuzzy_decontaminate(docs, eval_docs).collect()
    }
    assert out[0].contaminated and out[0].contaminated_by == -1
    assert not out[-1].contaminated and out[-1].contaminated_by is None
    # string ids end-to-end: contaminated_by keeps the eval id verbatim
    sdocs = spark.createDataFrame(
        [("d-a", text), ("d-b", other)], "doc_id string, text string"
    )
    sevals = spark.createDataFrame(
        [("ev-1", text), ("ev-0", text)], "doc_id string, text string"
    )
    sout = {
        r.doc_id: r
        for r in decontam.fuzzy_decontaminate(sdocs, sevals).collect()
    }
    # identical eval texts tie on est — deterministic toward the
    # smaller eval id
    assert sout["d-a"].contaminated and sout["d-a"].contaminated_by == "ev-0"
    assert not sout["d-b"].contaminated


# ------------------------------------------------ daily-ingest workflow


def test_daily_ingest_index_workflow(spark, tmp_path):
    """The 100 TB operating loop end-to-end at toy scale: day 1 lands
    a corpus, builds + persists the signature index, and dedups
    within itself; day 2 dedups its batch against the LOADED index
    (base text untouched), appends to the index, and the two-day
    survivor set equals a from-scratch run over everything; DSIR then
    selects from the deduped pool deterministically."""
    docs = _docs(spark)
    day1 = docs.filter(F.col("doc_id") % 2 == 0)
    day2 = docs.filter(F.col("doc_id") % 2 == 1)
    idx_path = str(tmp_path / "index")

    # --- day 1
    idx1 = incremental.minhash_index(day1)
    idx1.write.parquet(idx_path)
    dup1 = {
        r.id_b
        for r in incremental.signature_pairs(
            spark.read.parquet(idx_path), min_est=0.9
        ).collect()
    }

    # --- day 2: only the delta is signed; the index is read back
    loaded = spark.read.parquet(idx_path)
    idx2 = incremental.minhash_index(day2)
    pairs2 = incremental.incremental_pairs(loaded, idx2, min_est=0.9)
    # arrival-priority keepers: a day-1 doc is already shipped, so in
    # a cross-day pair the DAY-2 side is always the duplicate (even
    # when its id is smaller); within day 2, smaller id wins
    dup2 = {
        r.doc_id
        for r in incremental.delta_duplicates(pairs2, idx2).collect()
    }
    idx2.write.mode("append").parquet(idx_path)

    # --- equivalence with a from-scratch run over both days under
    # the same arrival-priority keeper rule (pair sets are identical
    # by the incremental==batch theorem, so the dup sets must match)
    def keeper_rank(i):
        return (0 if i % 2 == 0 else 1, i)  # (day, id)

    full_dups = set()
    for r in incremental.signature_pairs(
        spark.read.parquet(idx_path), min_est=0.9
    ).collect():
        full_dups.add(
            max(r.id_a, r.id_b, key=keeper_rank)
        )
    assert dup1 | dup2 == full_dups

    # --- select training docs from the deduped pool
    survivors = docs.join(
        spark.createDataFrame(
            [(i,) for i in sorted(full_dups)] or [(-1,)], "doc_id long"
        ),
        "doc_id",
        "left_anti",
    )
    target = docs.filter(F.col("lang") == "en")
    sel = dsir.dsir_select(survivors, target, k=20, gumbel_seed="d")
    got = sel.collect()
    assert len(got) == 20
    assert not {r.doc_id for r in got} & full_dups


def test_delta_duplicates_rejects_base_base_pairs(spark):
    """Out-of-contract input fails loudly: a pair with NO new-batch
    side (e.g. a caller passed signature_pairs output instead of
    incremental_pairs) used to silently nominate id_b as the
    duplicate — an arbitrary drop of already-shipped data."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    docs = _docs(spark)
    idx = incremental.minhash_index(docs)
    base = idx.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0)
    new = idx.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1)
    # full signature_pairs over EVERYTHING contains base-base pairs
    all_pairs = incremental.signature_pairs(idx, min_est=0.9)
    with pytest.raises(SparkRuntimeException, match="base-base pair"):
        incremental.delta_duplicates(all_pairs, new).collect()
    # the in-contract stream still works and never raises
    ok = incremental.incremental_pairs(base, new, min_est=0.9)
    incremental.delta_duplicates(ok, new).collect()


def test_dsir_apply_partial_ratio_table_matches_rows_path(spark):
    """A ratio table missing buckets (full-B precondition violated)
    must not silently DROP docs from dsir_apply: absent buckets score
    0.0 but still count toward n_grams — bit-equal to
    dsir_apply_rows' table.get(b, 0.0) on the same input."""
    docs = _docs(spark).limit(40)
    target = docs.filter(F.col("lang") == "en")
    ratios = dsir.dsir_ratios(docs, target, n_buckets=512)
    # keep only half the buckets: some docs now have ZERO covered grams
    partial = ratios.filter(F.col("bucket") < 256)
    a = (
        dsir.dsir_apply(docs, partial, n_buckets=512)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dsir.dsir_apply_rows(docs, partial, n_buckets=512)
        .select("doc_id", "n_grams", "logw")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    # no doc vanished
    assert len(a) == docs.filter(F.col("text").isNotNull()).count()


# -------------------------------------------- pipeline DSIR stage


def test_pipeline_dsir_stage_oracle(spark):
    """prepare_training_corpus with the optional DSIR targeting stage
    stays a bit-exact CTE-chain differential (the stage runs on the
    redacted text, between redaction and mixing)."""
    from cryo_spark.operators.corpus import (
        prepare_training_corpus,
        prepare_training_corpus_sql,
    )

    docs = _docs(spark)
    target = docs.filter(F.col("source") == "src0")
    out = prepare_training_corpus(docs, dsir_target=target, dsir_k=30)
    got = _canon(out.toPandas())
    con = _oracle_con()
    want = con.sql(
        prepare_training_corpus_sql(
            "documents",
            dsir_target_table=(
                "(SELECT * FROM documents WHERE source='src0') AS __t0"
            ),
            dsir_k=30,
        )
    ).df()
    con.close()
    assert len(got) == 30
    assert got.equals(_canon(want))


def test_pipeline_dsir_stage_composes_with_budget(spark):
    """DSIR targeting then temperature mixing: the mix draws only
    from the DSIR-selected pool and the budget binds."""
    from cryo_spark.operators.corpus import prepare_training_corpus

    docs = _docs(spark)
    target = docs.filter(F.col("source") == "src0")
    pool = prepare_training_corpus(docs, dsir_target=target, dsir_k=40)
    mixed = prepare_training_corpus(
        docs, dsir_target=target, dsir_k=40, budget=20
    )
    pool_ids = {r.doc_id for r in pool.select("doc_id").collect()}
    mixed_rows = mixed.collect()
    n_sources = pool.select("source").distinct().count()
    # temperature_mix budgets are approximate: per-source quotas
    # round up, so the draw can exceed the budget by < #sources
    assert 0 < len(mixed_rows) <= 20 + n_sources
    assert {r.doc_id for r in mixed_rows} <= pool_ids


# ------------------------------------------- partition-invariance pins


def test_round6_ops_invariant_under_repartitioning(spark):
    """DSIR selection and incremental candidate pairs give identical
    results on a 1-partition and a 17-partition copy of the input —
    the 'stable on any cluster layout' claim, pinned."""
    docs = _docs(spark)
    one = docs.coalesce(1)
    many = docs.repartition(17)

    target = lambda d: d.filter(F.col("lang") == "en")  # noqa: E731
    sel = lambda d: sorted(  # noqa: E731
        (r.doc_id, r.rank)
        for r in dsir.dsir_select(
            d, target(d), k=25, gumbel_seed="inv"
        ).collect()
    )
    assert sel(one) == sel(many)

    def pairs(d):
        base = incremental.minhash_index(d.filter(F.col("doc_id") % 2 == 0))
        new = incremental.minhash_index(d.filter(F.col("doc_id") % 2 == 1))
        return sorted(
            (r.id_a, r.id_b, r.est_jaccard)
            for r in incremental.incremental_pairs(base, new).collect()
        )

    assert pairs(one) == pairs(many)


def test_band_rows_rejects_non_divisible_bands(spark):
    docs = _docs(spark).limit(10)
    idx = incremental.minhash_index(docs)  # k=16
    with pytest.raises(Exception, match="must divide"):
        incremental.signature_pairs(idx, bands=5).count()


def test_auc_ties_average_not_inflated(spark):
    """A constant-score (learned-nothing) model must score AUC 0.5 —
    row_number with a label tie-break would inflate it to 1.0 and
    defeat the quality gate (review finding, round 6)."""
    flat = spark.createDataFrame(
        [(1.0, 0.5), (1.0, 0.5), (0.0, 0.5), (0.0, 0.5)],
        "label double, quality_prob double",
    )
    assert classifier.auc(flat) == 0.5


# ------------------------------------------------ corpus I/O + report


def test_corpus_report_matches_duckdb(spark):
    from cryo_spark.operators.corpus import corpus_report, corpus_report_sql

    got = _canon(corpus_report(_docs(spark)).toPandas())
    con = _oracle_con()
    want = _canon(con.sql(corpus_report_sql("documents")).df())
    con.close()
    assert got.equals(want)


def test_read_documents_formats(spark, tmp_path):
    import json
    import os

    from cryo_spark.sources.documents import read_documents

    jl = tmp_path / "docs.jsonl"
    jl.write_text(
        "\n".join(
            json.dumps({"text": t}) for t in ["alpha beta", "gamma delta"]
        )
    )
    txtdir = tmp_path / "txt"
    os.makedirs(txtdir)
    (txtdir / "a.txt").write_text("line one\nline two\n")

    jdf = read_documents(spark, str(jl), fmt="jsonl")
    assert set(jdf.columns) >= {"doc_id", "text"}
    assert jdf.count() == 2
    tdf = read_documents(spark, str(txtdir), fmt="text")
    assert {r.text for r in tdf.collect()} == {"line one", "line two"}
    wdf = read_documents(spark, str(txtdir), fmt="text", whole_files=True)
    assert wdf.count() == 1 and "line two" in wdf.first().text

    # deterministic ids: identical re-read yields identical ids
    a = {r.doc_id for r in jdf.collect()}
    b = {r.doc_id for r in read_documents(spark, str(jl), fmt="jsonl").collect()}
    assert a == b and len(a) == 2

    with pytest.raises(ValueError, match="unsupported"):
        read_documents(spark, str(jl), fmt="xml")
    with pytest.raises(ValueError, match="no 'text'"):
        read_documents(spark, f"{SF_DIR}/embeddings.parquet")


def test_jsonl_shard_roundtrip(spark, tmp_path):
    from cryo_spark.operators import sampling
    from cryo_spark.operators.shards import (
        read_training_shards,
        write_training_shards,
    )

    docs = sampling.split_assign(
        _docs(spark).select(
            "doc_id", "text", (F.col("n_chars") / 4).cast("long").alias("n_tokens")
        )
    )
    path = str(tmp_path / "shards")
    counts = write_training_shards(docs, path, shard_tokens=2000, fmt="jsonl")
    assert counts and all(n >= 1 for n in counts.values())
    back = read_training_shards(spark, path, fmt="jsonl")
    assert back.count() == docs.count()
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in docs.select("doc_id").collect()
    }


def test_banded_index_table_equivalence_and_base_no_shuffle(spark):
    """The bucketed band-row table reproduces incremental_pairs
    exactly, and the base side of the delta join is consumed straight
    from its buckets — no Exchange above the bucketed scan (only the
    delta side shuffles, which is the whole point)."""
    import re

    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    bi = incremental.minhash_index(base)
    ni = incremental.minhash_index(new)
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        incremental.save_banded_index(bi, "b_mh_index", n_buckets=8)
        # force SMJ — the big-big shape where bucketing matters
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        via_table = incremental.incremental_pairs_from_table(
            spark, "b_mh_index", ni
        )
        direct = incremental.incremental_pairs(bi, ni)
        assert _canon(via_table.toPandas()).equals(_canon(direct.toPandas()))

        # plan pin: the bucketed scan is consumed in place
        # ("Bucketed: true") and the join plans strictly fewer hash
        # exchanges than the same join against an unbucketed base —
        # the saved exchange IS the corpus-sized one
        nb = incremental._band_rows(ni, 4)
        cond = lambda u: (  # noqa: E731
            (F.col("n.band_id") == F.col(f"{u}.band_id"))
            & (F.col("n.band_hash") == F.col(f"{u}.band_hash"))
        )
        bucketed = nb.alias("n").join(
            spark.table("b_mh_index").alias("u"), cond("u")
        )
        plain = nb.alias("n").join(
            incremental._band_rows(bi, 4).alias("u"), cond("u")
        )
        p_b = bucketed._jdf.queryExecution().executedPlan().toString()
        p_p = plain._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in p_b, p_b
        assert p_b.count("Exchange hashpartitioning") < p_p.count(
            "Exchange hashpartitioning"
        ), (p_b, p_p)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS b_mh_index")


def test_dsir_ratio_table_persists_and_applies(spark, tmp_path):
    """Train once / apply daily: a persisted ratio table scores a
    NEW batch (grams unseen in training) identically to an in-memory
    one, and covers all B buckets so unseen grams are well-defined."""
    docs = _docs(spark)
    target = docs.filter(F.col("lang") == "en")
    ratios = dsir.dsir_ratios(docs, target, n_buckets=512)
    assert ratios.count() == 512
    path = str(tmp_path / "ratios")
    ratios.write.parquet(path)
    loaded = spark.read.parquet(path)
    newday = spark.createDataFrame(
        [(9001, "totally novel vocabulary zz qq xx yy"), (9002, "the fast key")],
        "doc_id long, text string",
    )
    a = dsir.dsir_apply(newday, ratios, n_buckets=512).toPandas()
    b = dsir.dsir_apply(newday, loaded, n_buckets=512).toPandas()
    assert _canon(a).equals(_canon(b))
    assert set(a.doc_id) == {9001, 9002}  # unseen grams still score


# --------------------------------------- round-5 review regressions


def test_resample_ffill_key_between_ticks_no_crash(spark):
    """A key whose events all fall strictly between two grid ticks
    owns no ticks (matching generate_series) instead of crashing
    with 'Illegal sequence boundaries' (review finding)."""
    from datetime import datetime

    from cryo_spark.operators.sessions import resample_ffill

    rows = [
        (1, datetime(2024, 1, 1, 0, 1, 1), 5.0),   # 61s: between ticks
        (2, datetime(2024, 1, 1, 0, 0, 0), 1.0),   # on-tick control
        (2, datetime(2024, 1, 1, 0, 2, 30), 2.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = resample_ffill(df, step_seconds=60).collect()
    assert not [r for r in out if r.user_id == 1]
    assert len([r for r in out if r.user_id == 2]) == 3  # 0,60,120


def test_bpe_apply_string_id_col(spark):
    from cryo_spark.operators import tokenizer

    df = spark.createDataFrame(
        [("u1", "low lower lowest"), ("u2", "new newer")],
        "url string, text string",
    )
    merges = tokenizer.train_bpe(
        spark.createDataFrame([(1, "low low lower")], "doc_id long, text string"),
        n_merges=10,
    )
    out = tokenizer.bpe_apply(df, merges, id_col="url")
    assert {r.url for r in out.collect()} == {"u1", "u2"}
    assert dict(out.dtypes)["url"] == "string"


def test_pipeline_sql_non_default_text_col_executes(spark):
    """prepare_training_corpus_sql must emit runnable SQL for a
    corpus whose text column is not named 'text' (review finding:
    the post-span-dedup CTEs always expose 'text')."""
    from cryo_spark.operators.corpus import (
        prepare_training_corpus,
        prepare_training_corpus_sql,
    )

    con = _oracle_con()
    con.sql(
        "CREATE VIEW docs_body AS "
        "SELECT doc_id, text AS body, lang, source FROM documents"
    )
    want = con.sql(
        prepare_training_corpus_sql("docs_body", text_col="body")
    ).df()
    con.close()
    docs = _docs(spark).withColumnRenamed("text", "body")
    got = prepare_training_corpus(docs, text_col="body").toPandas()
    assert _canon(got).equals(_canon(want))


def test_dsir_apply_rows_matches_exploded_path(spark):
    """The stream-legal row-wise scorer must reproduce the exploded
    join+agg path bit-for-bit (same md5 buckets, same rounding)."""
    docs = _docs(spark)
    target = docs.filter(F.col("lang") == "en")
    ratios = dsir.dsir_ratios(docs, target)
    a = (
        dsir.dsir_apply(docs, ratios)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    b = (
        dsir.dsir_apply_rows(docs, ratios)
        .select("doc_id", "n_grams", "logw")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (a.n_grams == b.n_grams).all()
    assert (a.logw == b.logw).all()
    # dict input equals frame input
    as_dict = {r.bucket: r.log_ratio for r in ratios.collect()}
    c = (
        dsir.dsir_apply_rows(docs, as_dict)
        .select("doc_id", "logw")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (a.logw == c.logw).all()


def test_classifier_model_roundtrip(spark, tmp_path):
    """The trained filter persists and reloads (MLlib native save) —
    completing the daily loop's persist-everything story alongside
    the minhash index and the DSIR ratio table."""
    from pyspark.ml.classification import LogisticRegressionModel

    labeled = _planted_corpus(spark, n=80)
    m = classifier.train_quality_classifier(labeled)
    path = str(tmp_path / "quality_model")
    m.write().overwrite().save(path)
    loaded = LogisticRegressionModel.load(path)
    docs = _docs(spark).limit(20)
    a = classifier.score_quality(docs, m).toPandas().set_index("doc_id")
    b = classifier.score_quality(docs, loaded).toPandas().set_index("doc_id")
    assert (a.sort_index().quality_prob == b.sort_index().quality_prob).all()


def test_dsir_bucket_hash_property(spark):
    """Property pin: for arbitrary unicode grams, Spark's bucket
    expression equals DuckDB's AND Python's (the three live
    implementations: oracle SQL, exploded path, row-wise scorer)."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts_seen = []

    @given(st.text(max_size=40))
    @settings(max_examples=60, deadline=None)
    def collect(t):
        texts_seen.append(t)

    collect()
    texts = list({t for t in texts_seen if "\x00" not in t}) or ["x"]
    df = spark.createDataFrame([(t,) for t in texts], "g string")
    got = {
        r.g: r.b
        for r in df.select(
            "g", dsir._bucket_col(F.col("g"), 4096).alias("b")
        ).collect()
    }
    con = duckdb.connect()
    for t in texts:
        want_sql = con.sql(
            f"SELECT {dsir._bucket_sql('?', 4096)}", params=[t]
        ).fetchone()[0]
        want_py = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 4096
        assert got[t] == want_sql == want_py, repr(t)
    con.close()


# ---------------------------------- second-review regression pins


def test_dsir_apply_rows_whitespace_and_null_parity(spark):
    """Exact parity with the exploded path on the awkward inputs the
    first pin missed: leading/trailing tabs+newlines (ubiquitous in
    crawled text) and null text (dropped by BOTH paths)."""
    docs = spark.createDataFrame(
        [
            (1, "foo bar\n"),
            (2, "\talpha beta"),
            (3, None),
            (4, "  spaced  out  "),
            (5, "plain text here"),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, "foo bar baz"), (11, "alpha beta gamma")],
        "doc_id long, text string",
    )
    ratios = dsir.dsir_ratios(docs, target, n_buckets=512)
    a = (
        dsir.dsir_apply(docs, ratios, n_buckets=512)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    b = (
        dsir.dsir_apply_rows(docs, ratios, n_buckets=512)
        .select("doc_id", "n_grams", "logw")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(a.index) == list(b.index) == [1, 2, 4, 5]  # null dropped
    assert (a.n_grams == b.n_grams).all()
    assert (a.logw == b.logw).all()


def test_dedup_spans_retains_null_text_docs(spark):
    """A null-text doc (e.g. a JSONL row missing its text field) must
    survive span dedup as (id, '', 0, 0), not vanish."""
    from cryo_spark.operators.spans import dedup_spans

    df = spark.createDataFrame(
        [(1, None), (2, "hello world entirely unique words")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_spans(df).collect()}
    assert set(out) == {1, 2}
    assert out[1].text == "" and out[1].n_spans == 0 and out[1].n_kept == 0
    assert out[2].n_kept == out[2].n_spans


def test_write_training_shards_empty_input(spark, tmp_path):
    """An all-filtered corpus exports cleanly: {} shard counts, no
    schema-inference crash on the empty directory."""
    from cryo_spark.operators import sampling
    from cryo_spark.operators.shards import write_training_shards

    empty = sampling.split_assign(
        _docs(spark)
        .filter(F.lit(False))
        .select("doc_id", "text", F.lit(1).cast("long").alias("n_tokens"))
    )
    for fmt in ("parquet", "jsonl"):
        path = str(tmp_path / f"shards_{fmt}")
        assert write_training_shards(empty, path, 1000, fmt=fmt) == {}


def test_banded_index_bands_mismatch_raises(spark):
    docs = _docs(spark).limit(30)
    idx = incremental.minhash_index(docs)
    try:
        incremental.save_banded_index(idx, "b_mh_chk", bands=4, n_buckets=4)
        with pytest.raises(ValueError, match="saved with bands=4"):
            incremental.incremental_pairs_from_table(
                spark, "b_mh_chk", idx, bands=8
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS b_mh_chk")
