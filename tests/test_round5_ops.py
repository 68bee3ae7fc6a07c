"""Round-5 operators: duplicate-span removal, corpus n-gram stats,
tf-idf keyword extraction, temperature-weighted source mixing."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cryo_spark.operators import sampling, text
from cryo_spark.operators.spans import dedup_spans, dedup_spans_sql, span_rows

SF_DIR = "/root/testdata/sf0.001"


def _oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    out = con.sql(sql).df()
    con.close()
    return out


def _canon(pdf):
    cols = sorted(pdf.columns)
    return (
        pdf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    )


# ---------------------------------------------------------------- spans


def test_span_rows_grid(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m"), (2, "x y"), (3, "")],
        "doc_id long, text string",
    )
    rows = span_rows(df, span_words=5).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.span_idx, r.span))
    assert sorted(by_doc[1]) == [
        (0, "a b c d e"), (1, "f g h i j"), (2, "k l m")
    ]
    assert sorted(by_doc[2]) == [(0, "x y")]
    # empty text still yields one (empty) span — the doc row survives
    assert sorted(by_doc[3]) == [(0, "")]


def test_dedup_spans_removes_planted_boilerplate(spark):
    boiler = "the quick brown fox jumps over the lazy dog again ok"
    df = spark.createDataFrame(
        [
            (1, boiler + " unique tail one two three four five six seven"),
            (2, boiler + " different content eight nine ten eleven twelve"),
            (3, boiler),  # fully boilerplate
        ],
        "doc_id long, text string",
    )
    # 11-word boilerplate + span_words=11: doc grid aligns exactly
    out = {r.doc_id: r for r in dedup_spans(df, span_words=11).collect()}
    assert out[1].text.startswith(boiler)  # first occurrence keeps it
    assert boiler not in out[2].text and out[2].n_kept < out[2].n_spans
    assert out[3].text == "" and out[3].n_kept == 0  # row retained


def test_dedup_spans_oracle_sf(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = _canon(dedup_spans(docs).toPandas())
    o = _canon(_oracle(SF_DIR, dedup_spans_sql("documents")))
    assert s.equals(o)


def test_dedup_spans_conserves_spans(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = dedup_spans(docs)
    agg = out.agg(
        F.sum("n_kept").alias("kept"), F.sum("n_spans").alias("total")
    ).first()
    # kept spans = number of distinct spans in the corpus (each
    # distinct span survives exactly once)
    n_distinct = (
        span_rows(docs).select("span").distinct().count()
    )
    assert agg.kept == n_distinct
    assert agg.kept <= agg.total


# ------------------------------------------------------------- n-grams


def test_top_ngrams_counts_and_order(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x"), (3, "q")],
        "doc_id long, text string",
    )
    rows = text.top_ngrams(df, n=2, k=3).collect()
    assert [(r.ngram, r.occurrences) for r in rows] == [
        ("a b", 3),  # twice in doc1, once in doc2
        ("b a", 1),
        ("b c", 1),
    ]
    # short doc emits its whole text as one gram
    all_rows = text.top_ngrams(df, n=2, k=100).collect()
    assert ("q", 1) in [(r.ngram, r.occurrences) for r in all_rows]


def test_top_ngrams_oracle_sf(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = _canon(text.top_ngrams(docs, n=3, k=50).toPandas())
    o = _canon(_oracle(SF_DIR, text.top_ngrams_sql("documents", n=3, k=50)))
    assert s.equals(o)


# ------------------------------------------------------------- keywords


def test_keyword_extract_ranks_rare_terms_first(spark):
    # "zebra" appears once in doc1 only; "common" in every doc
    df = spark.createDataFrame(
        [
            (1, "common zebra common"),
            (2, "common common filler"),
            (3, "common filler filler"),
        ],
        "doc_id long, text string",
    )
    out = text.keyword_extract(df, k=1).collect()
    top = {r.doc_id: r.term for r in out}
    # doc1: zebra tf=1 df=1 -> 3.0; common tf=2 df=3 -> 2.0
    assert top[1] == "zebra"
    assert all(r.rank == 1 for r in out)


def test_keyword_extract_oracle_sf(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = _canon(text.keyword_extract(docs, k=4).toPandas())
    o = _canon(_oracle(SF_DIR, text.keyword_extract_sql("documents", k=4)))
    assert s.equals(o)


# ------------------------------------------------------- temperature mix


def test_temperature_mix_alpha_one_is_proportional(spark):
    rows = [(i, f"t{i}", "big" if i < 80 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = sampling.temperature_mix(
        df, budget=50, alpha=1.0, strata_col="source"
    )
    by_src = {
        r.source: r.n for r in out.groupBy("source").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert by_src == {"big": 40, "small": 10}


def test_temperature_mix_alpha_zero_is_uniform(spark):
    rows = [(i, f"t{i}", "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = sampling.temperature_mix(df, budget=20, alpha=0.0)
    by_src = {
        r.source: r.n for r in out.groupBy("source").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert by_src == {"big": 10, "small": 10}


def test_temperature_mix_flattens_between(spark):
    rows = [(i, f"t{i}", "big" if i < 96 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # counts 96/4, alpha=0.5 -> weights sqrt: 9.8/2 -> quota 25*{0.83,0.17}
    out = sampling.temperature_mix(df, budget=24, alpha=0.5)
    by_src = {
        r.source: r.n for r in out.groupBy("source").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert by_src["small"] == 4  # capped at stratum size... or boosted
    assert by_src["big"] == 20
    # natural proportions would have given small ~1 of 24: flattened up


def test_temperature_mix_deterministic_and_nested(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sampling.temperature_mix(docs, budget=30, alpha=0.5)
    b = sampling.temperature_mix(docs, budget=30, alpha=0.5)
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b
    # raising the budget only ADDS rows (superset stability)
    big = sorted(
        r.doc_id
        for r in sampling.temperature_mix(docs, budget=60, alpha=0.5)
        .select("doc_id").collect()
    )
    assert set(ids_a) <= set(big)


def test_temperature_mix_oracle_sf(spark):
    # alpha=1.0 keeps the quota arithmetic exact-integer at THIS
    # corpus's non-uniform source counts (a sqrt-weight denominator
    # sums ~20 irrational doubles, whose summation ORDER differs
    # between engines — a last-ulp drift could flip a round(.5)
    # quota). The contract entry uses alpha=0.5 over the sf0.01
    # uniform counts, where sqrt is exact; fractional-alpha math is
    # covered by the 2-source planted tests (2-term sums commute
    # exactly in IEEE).
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = _canon(
        sampling.temperature_mix(docs, budget=25, alpha=1.0).toPandas()
    )
    o = _canon(
        _oracle(SF_DIR, sampling.temperature_mix_sql("documents", 25, 1.0))
    )
    assert s.equals(o)


# ---------------------------------------------------------- semantic dedup


def _clustered_vectors():
    """Two tight groups (near-identical members) + two far singletons."""
    import numpy as np

    rng = np.random.default_rng(7)
    base_a = np.array([1.0, 0.0, 0.0, 0.0])
    base_b = np.array([0.0, 1.0, 0.0, 0.0])
    rows = []
    for i in range(4):  # ids 0-3: group A clones (tiny jitter)
        rows.append((i, (base_a + rng.normal(0, 1e-3, 4)).tolist()))
    for i in range(4, 7):  # ids 4-6: group B clones
        rows.append((i, (base_b + rng.normal(0, 1e-3, 4)).tolist()))
    rows.append((7, [0.0, 0.0, 1.0, 0.0]))
    rows.append((8, [0.0, 0.0, 0.0, 1.0]))
    return rows


def test_semantic_dedup_drops_clones_keeps_min_id(spark):
    from cryo_spark.operators.semdedup import semantic_dedup

    df = spark.createDataFrame(
        _clustered_vectors(), "vec_id long, embedding array<float>"
    )
    out = {
        r.vec_id: r for r in semantic_dedup(
            df, threshold=0.99, n_centroids=3, sample=9
        ).collect()
    }
    assert len(out) == 9  # verdict for every row
    # min id of each clone group survives, the rest are duplicates
    assert not out[0].is_duplicate and all(out[i].is_duplicate for i in (1, 2, 3))
    assert not out[4].is_duplicate and all(out[i].is_duplicate for i in (5, 6))
    assert not out[7].is_duplicate and not out[8].is_duplicate
    # clone groups land in one cluster each
    assert len({out[i].cluster_id for i in (0, 1, 2, 3)}) == 1
    assert len({out[i].cluster_id for i in (4, 5, 6)}) == 1


def test_semantic_dedup_single_cluster_matches_exact_pairs_rule(spark):
    """With one cluster the verdict must equal the rule derived from
    the oracle-proven exact all-pairs cosine: drop i iff some pair
    (a < i) at >= threshold exists."""
    from cryo_spark.operators.dedup import embedding_near_dups_exact
    from cryo_spark.operators.semdedup import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    thr = 0.45  # testdata embeddings are near-uniform; 0.45 yields pairs
    sem = semantic_dedup(emb, threshold=thr, n_centroids=1, sample=64)
    dropped = {r.vec_id for r in sem.filter("is_duplicate").collect()}
    pairs = embedding_near_dups_exact(emb, threshold=thr).collect()
    expect = {r.id_b for r in pairs}
    assert dropped == expect
    assert len(dropped) > 0  # non-vacuous


def test_semantic_dedup_deterministic(spark):
    from cryo_spark.operators.semdedup import semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(map(tuple, semantic_dedup(emb, n_centroids=4).collect()))
    b = sorted(map(tuple, semantic_dedup(emb, n_centroids=4).collect()))
    assert a == b


# ------------------------------------------------------ repeated regions


def test_repeated_regions_planted_offset_shifted(spark):
    """A verbatim repeat at a DIFFERENT offset in another doc is
    recovered as one maximal region in both docs — the case the
    fixed-grid span dedup misses."""
    from cryo_spark.operators.spans import repeated_regions

    repeat = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [
            (1, repeat + " tail a b c d e f g h"),
            (2, "shift " + repeat + " other x y z w v u t"),
            (3, "totally different words without any overlap here at all ok"),
        ],
        "doc_id long, text string",
    )
    out = repeated_regions(df, k=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(
            (r.region_start, r.region_end)
        )
    # doc1: repeat occupies tokens [0, 10) -> one region covering it
    assert by_doc[1] == [(0, 10)]
    # doc2: repeat occupies tokens [1, 11)
    assert by_doc[2] == [(1, 11)]
    assert 3 not in by_doc


def test_repeated_regions_oracle_sf(spark):
    from cryo_spark.operators.spans import (
        repeated_regions, repeated_regions_sql,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = _canon(repeated_regions(docs, k=6).toPandas())
    o = _canon(_oracle(SF_DIR, repeated_regions_sql("documents", k=6)))
    assert s.equals(o)
    assert len(s) > 0  # non-vacuous at this corpus


def test_repeated_regions_within_doc_repeat(spark):
    """min_count counts OCCURRENCES, so a gram repeated twice inside
    one doc is a repeat too (self-plagiarism / loops)."""
    from cryo_spark.operators.spans import repeated_regions

    phrase = "alpha beta gamma delta"
    df = spark.createDataFrame(
        [(1, phrase + " filler words here " + phrase)],
        "doc_id long, text string",
    )
    out = repeated_regions(df, k=4, min_count=2).collect()
    regions = sorted((r.region_start, r.region_end) for r in out)
    assert regions == [(0, 4), (7, 11)]


def test_dedup_repeated_regions_cuts_later_occurrence(spark):
    from cryo_spark.operators.spans import dedup_repeated_regions

    repeat = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [
            (1, repeat + " tail a b c d e f g h"),
            (2, "shift " + repeat + " other x y z w v u t"),
            (3, "totally different words without any overlap here at all ok"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_repeated_regions(df, k=8).collect()}
    assert out[1].text.startswith(repeat) and out[1].n_removed == 0
    assert out[2].text == "shift other x y z w v u t"
    assert out[2].n_removed == 10
    assert out[3].n_removed == 0


def test_dedup_repeated_regions_oracle_sf(spark):
    from cryo_spark.operators.spans import (
        dedup_repeated_regions, dedup_repeated_regions_sql,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s_df = dedup_repeated_regions(docs, k=6)
    s = _canon(s_df.toPandas())
    o = _canon(_oracle(SF_DIR, dedup_repeated_regions_sql("documents", k=6)))
    assert s.equals(o)
    # non-vacuous + conservation: something was removed, and removal
    # never exceeds the doc's tokens
    agg = s_df.agg(
        F.sum("n_removed").alias("rm"), F.sum("n_tokens").alias("nt")
    ).first()
    assert 0 < agg.rm < agg.nt


# --------------------------------------- randomized brute-force differentials


def _norm_toks(text: str) -> list[str]:
    import re

    return re.sub(r"\s+", " ", text.strip()).split(" ")


def _rand_corpus(seed: int, n_docs: int = 12):
    import random

    rng = random.Random(seed)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    return [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25))))
        for i in range(n_docs)
    ]


def _brute_dedup_spans(docs, k):
    seen, out = set(), {}
    for doc_id, text in sorted(docs):
        toks = _norm_toks(text)
        spans = [
            " ".join(toks[i: i + k]) for i in range(0, len(toks), k)
        ]
        kept = [sp for sp in spans if sp not in seen and not seen.add(sp)]
        out[doc_id] = (" ".join(kept), len(spans), len(kept))
    return out


def _brute_regions(docs, k, min_count):
    from collections import Counter

    cnt, per_doc = Counter(), {}
    for doc_id, text in docs:
        toks = _norm_toks(text)
        grams = (
            [(" ".join(toks[i: i + k]), i) for i in range(len(toks) - k + 1)]
            if len(toks) >= k
            else [(" ".join(toks), 0)]
        )
        per_doc[doc_id] = grams
        for g, _ in grams:
            cnt[g] += 1
    regions = []
    for doc_id, grams in per_doc.items():
        hits = sorted(p for g, p in grams if cnt[g] >= min_count)
        start = prev = None
        for p in hits:
            if start is None:
                start = prev = p
            elif p > prev + k:
                regions.append((doc_id, start, prev + k))
                start = prev = p
            else:
                prev = p
        if start is not None:
            regions.append((doc_id, start, prev + k))
    return sorted(regions)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_dedup_spans_matches_bruteforce_random(spark, seed):
    docs = _rand_corpus(seed)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_spans, r.n_kept)
        for r in dedup_spans(df, span_words=3).collect()
    }
    assert got == _brute_dedup_spans(docs, 3)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_repeated_regions_matches_bruteforce_random(spark, seed):
    from cryo_spark.operators.spans import repeated_regions

    docs = _rand_corpus(seed)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.region_start, r.region_end)
        for r in repeated_regions(df, k=3).collect()
    )
    assert got == _brute_regions(docs, 3, 2)


def test_temperature_rates_hash_sample_tracks_quota(spark):
    """The 0-shuffle scale path: temperature_rates + hash_sample
    lands within sampling noise of temperature_mix's exact quotas."""
    rows = [
        (i, f"t{i}", "big" if i < 1600 else "small") for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    rates = sampling.temperature_rates(df, budget=500, alpha=0.5)
    got = {
        r.source: r.n
        for r in sampling.hash_sample(df, rates)
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    exact = {
        r.source: r.n
        for r in sampling.temperature_mix(df, budget=500, alpha=0.5)
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for s in exact:
        assert abs(got[s] - exact[s]) <= 4 * (exact[s] ** 0.5) + 2, (
            s, got[s], exact[s]
        )


# --------------------------------------------------------- sessionization


def test_sessionize_planted_gaps(spark):
    from datetime import datetime

    from cryo_spark.operators.sessions import sessionize

    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, t(0), 1.0), (1, t(10), 2.0),   # session A: 0-10
        (1, t(50), 3.0),                   # gap 40 min -> session B
        (2, t(5), 4.0),                    # other user, own session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sorted(
        (r.user_id, r.session_start % 86400 // 60, r.session_end % 86400 // 60,
         r.n_events, r.total_value)
        for r in sessionize(df, gap_seconds=1800).collect()
    )
    assert out == [
        (1, 0, 10, 2, 3.0),
        (1, 50, 50, 1, 3.0),
        (2, 5, 5, 1, 4.0),
    ]


def test_sessionize_oracle_events(spark):
    from cryo_spark.operators.sessions import sessionize, sessionize_sql

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    s = _canon(sessionize(ev, gap_seconds=900).toPandas())

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    o = _canon(con.sql(sessionize_sql("events", gap_seconds=900)).df())
    con.close()
    assert list(s.columns) == list(o.columns)
    assert len(s) == len(o)
    assert s.equals(o)


# ----------------------------------------------------- composed pipeline


def test_prepare_training_corpus_oracle_and_stages(spark):
    """End-to-end pipeline (filter -> span dedup -> redact -> mix ->
    split) equals the same CTE chain in DuckDB, and stage invariants
    hold: row budget respected, split labels total the output."""
    from cryo_spark.operators.corpus import (
        prepare_training_corpus, prepare_training_corpus_sql,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # alpha=1.0: exact-integer quota math at non-uniform counts (see
    # test_temperature_mix_oracle_sf)
    out = prepare_training_corpus(docs, budget=30, alpha=1.0)
    s = _canon(out.toPandas())
    o = _canon(_oracle(SF_DIR, prepare_training_corpus_sql(
        "documents", budget=30, alpha=1.0)))
    assert s.equals(o)
    rows = out.collect()
    assert 0 < len(rows) <= 30 + 10  # quota rounding slack
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert all(r.n_kept <= r.n_spans for r in rows)


def test_prepare_training_corpus_no_budget_keeps_all(spark):
    from cryo_spark.operators.corpus import (
        prepare_training_corpus, prepare_training_corpus_sql,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = _canon(prepare_training_corpus(docs).toPandas())
    o = _canon(_oracle(SF_DIR, prepare_training_corpus_sql("documents")))
    assert s.equals(o)


# -------------------------------------------------------------- shards


def test_assign_shards_budget_and_determinism(spark):
    from cryo_spark.operators.shards import assign_shards

    rows = [(i, "train" if i % 5 else "val", 100 + (i % 7) * 50)
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, split string, n_tokens long")
    out = assign_shards(df, shard_tokens=1000).collect()
    # per (split, shard): token sum stays under budget + one doc
    from collections import defaultdict

    tot = defaultdict(int)
    for r in out:
        tot[(r.split, r.shard)] += r.n_tokens
    max_doc = max(r.n_tokens for r in out)
    assert all(v <= 1000 + max_doc for v in tot.values())
    # shards are contiguous 0..n-1 per split
    by_split = defaultdict(set)
    for r in out:
        by_split[r.split].add(r.shard)
    for shards in by_split.values():
        assert shards == set(range(len(shards)))
    # deterministic
    again = assign_shards(df, shard_tokens=1000).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_write_read_training_shards_roundtrip(spark, tmp_path):
    from cryo_spark.operators.corpus import prepare_training_corpus
    from cryo_spark.operators.shards import (
        read_training_shards, write_training_shards,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus_df = prepare_training_corpus(docs).withColumn(
        "n_tokens", F.col("n_kept") * 10
    )
    path = str(tmp_path / "shards")
    n_shards = write_training_shards(corpus_df, path, shard_tokens=2000)
    assert set(n_shards) <= {"train", "val", "test"} and n_shards["train"] >= 1
    back = read_training_shards(spark, path)
    # token mass and doc ids survive the roundtrip
    assert back.count() == corpus_df.count()
    assert (
        back.agg(F.sum("n_tokens")).first()[0]
        == corpus_df.agg(F.sum("n_tokens")).first()[0]
    )
    # pruned read lists only the split's directories
    tr = read_training_shards(spark, path, split="train")
    assert tr.count() == corpus_df.filter("split = 'train'").count()
    plan = tr._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(split" in plan or "split#" in plan


# ------------------------------------------------------------ LM scoring


def _brute_lm_scores(docs, add_k=0.5):
    """numpy/python reference mirroring shingle_rows semantics
    (lowercase, ws-normalized; docs shorter than n emit one whole-doc
    gram)."""
    import math
    import re
    from collections import Counter

    def toks(t):
        return re.sub(r"\s+", " ", t.strip().lower()).split(" ")

    def grams(t, n):
        w = toks(t)
        if len(w) >= n:
            return [" ".join(w[i: i + n]) for i in range(len(w) - n + 1)]
        return [" ".join(w)]

    uni, bi = Counter(), Counter()
    for _, t in docs:
        uni.update(grams(t, 1))
        bi.update(grams(t, 2))
    v = len(uni)
    out = {}
    for doc_id, t in docs:
        lps = [
            math.log((bi[g] + add_k) / (uni[g.split(" ")[0]] + add_k * v))
            for g in grams(t, 2)
        ]
        out[doc_id] = (len(lps), sum(lps) / len(lps))
    return out


def test_ngram_lm_score_matches_reference(spark):
    import numpy as np

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r.doc_id: (r.n_bigrams, r.avg_logp)
        for r in text.ngram_lm_score(docs).collect()
    }
    ref = _brute_lm_scores(
        [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    )
    assert set(got) == set(ref)
    for d in ref:
        assert got[d][0] == ref[d][0]
        assert np.isclose(got[d][1], ref[d][1], rtol=1e-9), (
            d, got[d], ref[d]
        )


def test_ngram_lm_score_ranks_typical_above_shuffled(spark):
    """A document whose bigrams are corpus-frequent must outscore one
    built from never-repeated word pairs."""
    base = "the cat sat on the mat " * 5
    df = spark.createDataFrame(
        [(i, base) for i in range(5)]
        + [(99, "zq xv pk jw qn bd lf rg mz wc")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.avg_logp for r in text.ngram_lm_score(df).collect()}
    assert got[0] > got[99]


# ------------------------------------------------------ leakage-safe split


def test_leakage_safe_split_keeps_near_dups_together(spark):
    from cryo_spark.operators import dedup as ddp
    from cryo_spark.operators.sampling import leakage_safe_split

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = ddp.ngram_jaccard_all_pairs(docs, min_jaccard=0.5).select(
        "id_a", "id_b"
    )
    out = leakage_safe_split(
        docs, pairs, {"train": 0.6, "val": 0.2, "test": 0.2}
    )
    assert pairs.count() > 0  # non-vacuous corpus
    # every paired doc shares its split with its counterpart
    sp = out.select("doc_id", "group_key", "split")
    a = pairs.join(sp.withColumnRenamed("doc_id", "id_a"), "id_a").select(
        "id_a", "id_b", F.col("split").alias("split_a")
    )
    both = a.join(
        sp.withColumnRenamed("doc_id", "id_b").select(
            "id_b", F.col("split").alias("split_b")
        ),
        "id_b",
    )
    assert both.filter("split_a != split_b").count() == 0
    # all docs present, all splits drawn
    assert out.count() == docs.count()
    assert set(r.split for r in out.select("split").distinct().collect()) \
        <= {"train", "val", "test"}


def test_leakage_safe_split_oracle(spark):
    """Differential vs DuckDB: recursive closure components + the
    split_assign CASE on the component keeper."""
    from cryo_spark.operators import dedup as ddp
    from cryo_spark.operators.sampling import (
        _bucket_sql, _threshold, leakage_safe_split,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = ddp.ngram_jaccard_all_pairs(docs, min_jaccard=0.5).select(
        "id_a", "id_b"
    )
    got = leakage_safe_split(docs, pairs).select(
        "doc_id", "group_key", "split"
    )
    pairs_sql = ddp.ngram_jaccard_all_pairs_sql("documents", min_jaccard=0.5)
    b = _bucket_sql("group_key", "split0")
    t_train, t_val = _threshold(0.9), _threshold(0.95)
    sql = f"""
WITH RECURSIVE pp AS ({pairs_sql}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pp UNION SELECT id_b, id_a FROM pp
), reach(u, v) AS (
  SELECT u, v FROM edges
  UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), comp AS (
  SELECT u AS id, least(u, min(v)) AS component FROM reach GROUP BY u
), keyed AS (
  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS group_key
  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
)
SELECT doc_id, group_key,
  CASE WHEN {b} < '{t_train}' THEN 'train'
       WHEN {b} < '{t_val}' THEN 'val' ELSE 'test' END AS split
FROM keyed
"""
    s = _canon(got.toPandas())
    o = _canon(_oracle(SF_DIR, sql))
    assert s.equals(o)


def test_prepare_training_corpus_near_dup_stage(spark):
    """near_dup=True collapses Jaccard clusters and still matches the
    WITH RECURSIVE CTE oracle end to end."""
    from cryo_spark.operators.corpus import (
        prepare_training_corpus, prepare_training_corpus_sql,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s_df = prepare_training_corpus(docs, near_dup=True)
    s = _canon(s_df.toPandas())
    o = _canon(
        _oracle(SF_DIR, prepare_training_corpus_sql("documents", near_dup=True))
    )
    assert s.equals(o)
    # the stage only ever REMOVES rows relative to near_dup=False
    base = prepare_training_corpus(docs).count()
    assert s_df.count() <= base


def test_assign_shards_two_phase_equals_single_window(spark):
    """The bucketed two-phase prefix sum must be bit-identical to the
    naive single-window formulation (the bucket is a prefix of the
    ordering hash, so the orders coincide)."""
    from pyspark.sql import Window

    from cryo_spark.operators.shards import assign_shards

    rows = [(i, ["train", "val"][i % 2], 50 + (i % 13) * 20)
            for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, split string, n_tokens long")
    got = {r.doc_id: r.shard for r in assign_shards(df, 1500).collect()}
    order = F.md5(F.concat(F.lit("shard0:"), F.col("doc_id").cast("string")))
    w = (
        Window.partitionBy("split")
        .orderBy(order, F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = {
        r.doc_id: r.shard
        for r in df.withColumn(
            "shard",
            F.floor(
                F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(1500)
            ).cast("int"),
        ).collect()
    }
    assert got == naive


# ------------------------------------------------------------- resample


def test_resample_ffill_planted(spark):
    from datetime import datetime, timedelta

    from cryo_spark.operators.sessions import resample_ffill

    t = lambda s: datetime(2024, 1, 1) + timedelta(seconds=s)  # noqa: E731
    rows = [(1, t(5), 10.0), (1, t(65), 20.0), (1, t(200), 30.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r.user_id, r.tick % 86400): r.value
        for r in resample_ffill(df, step_seconds=60).collect()
    }
    # grid: ticks at 60, 120, 180 (ceil(5/60)*60 .. floor(200/60)*60)
    assert out == {(1, 60): 10.0, (1, 120): 20.0, (1, 180): 20.0}


def test_resample_ffill_oracle_events(spark):
    from cryo_spark.operators.sessions import (
        resample_ffill, resample_ffill_sql,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    s = _canon(resample_ffill(ev, step_seconds=300).toPandas())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    o = _canon(con.sql(resample_ffill_sql("events", step_seconds=300)).df())
    con.close()
    assert len(s) == len(o) and s.equals(o)


# ------------------------------------------- partition-invariance pins


def test_round5_ops_invariant_under_repartitioning(spark):
    """The determinism claims say 'stable under repartitioning, any
    cluster layout' — pin it: temperature_mix, assign_shards, and
    dedup_spans give identical results on a 1-partition and a
    17-partition copy of the same input."""
    from cryo_spark.operators.shards import assign_shards

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    one = docs.coalesce(1)
    many = docs.repartition(17)

    mix = lambda d: sorted(  # noqa: E731
        r.doc_id for r in sampling.temperature_mix(d, 40, 0.5).collect()
    )
    assert mix(one) == mix(many)

    with_tok = lambda d: sampling.split_assign(  # noqa: E731
        d.select("doc_id", (F.col("n_chars") / 4).cast("long").alias("n_tokens"))
    )
    sh = lambda d: sorted(  # noqa: E731
        (r.doc_id, r.split, r.shard)
        for r in assign_shards(with_tok(d), 2000).collect()
    )
    assert sh(one) == sh(many)

    sd = lambda d: sorted(  # noqa: E731
        (r.doc_id, r.text) for r in dedup_spans(d).collect()
    )
    assert sd(one) == sd(many)


def test_sessionize_and_resample_adaptive_to_nanos_encoding(spark):
    """The driver testdata has shipped events.ts as int64 NANOSECONDS
    in some rounds — both time operators must give identical results
    for the two encodings (a bare cast would read nanos as seconds)."""
    from datetime import datetime, timedelta

    from cryo_spark.operators.sessions import resample_ffill, sessionize

    t0 = datetime(2024, 1, 1)
    rows = [(1, t0 + timedelta(seconds=s), float(s)) for s in (5, 65, 2000)]
    ts_df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    nanos_df = spark.createDataFrame(
        [
            (u, int(ts.replace(tzinfo=None).timestamp() * 1e9), v)
            for u, ts, v in rows
        ],
        "user_id long, ts long, value double",
    )
    for op in (
        lambda d: sessionize(d, gap_seconds=900),
        lambda d: resample_ffill(d, step_seconds=60),
    ):
        a = sorted(map(tuple, op(ts_df).collect()))
        b = sorted(map(tuple, op(nanos_df).collect()))
        assert a == b and a


# ----------------------------------------------------- product quantization


def test_pq_roundtrip_recall_and_determinism(spark):
    import numpy as np

    from cryo_spark.operators.similarity import (
        cosine_topk, pq_encode, pq_topk, pq_train,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = pq_train(emb, m=8, n_codes=16)
    assert books.shape == (8, 16, 8)
    codes = pq_encode(emb, books)
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert all(len(r.codes) == 8 and all(0 <= c < 16 for c in r.codes)
               for r in rows)
    # deterministic end to end
    again = pq_train(emb, m=8, n_codes=16)
    assert np.array_equal(books, again)

    query = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    got = [r.vec_id for r in pq_topk(codes, books, query, k=10).collect()]
    assert len(got) == 10
    # the query vector itself must rank first (its own codes minimize
    # the ADC distance)
    assert got[0] == 0
    exact = {
        r.vec_id for r in cosine_topk(emb, query, k=10).collect()
    }
    recall = len(set(got) & exact) / 10.0
    # near-uniform random embeddings are PQ's worst case; the floor
    # only detects broken encoding/lookup, not quantization quality
    assert recall >= 0.2, (recall, got, exact)


def test_pq_clones_retrieve_each_other(spark):
    import numpy as np

    from cryo_spark.operators.similarity import pq_encode, pq_topk, pq_train

    rng = np.random.default_rng(3)
    base = rng.normal(0, 1, 16)
    rows = [(i, (base + rng.normal(0, 1e-3, 16)).tolist()) for i in range(5)]
    rows += [(i, rng.normal(0, 1, 16).tolist()) for i in range(5, 40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_train(df, m=4, n_codes=8, sample=40)
    codes = pq_encode(df, books)
    got = [r.vec_id for r in pq_topk(codes, books, rows[0][1], k=5).collect()]
    assert set(got) == {0, 1, 2, 3, 4}  # the clone cluster


def test_ivfpq_prunes_and_retrieves(spark):
    from cryo_spark.operators.similarity import cosine_topk, ivfpq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    query = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    got = [
        r.vec_id for r in ivfpq_topk(emb, query, k=10, n_probe=8).collect()
    ]
    assert len(got) == 10 and got[0] == 0
    exact = {r.vec_id for r in cosine_topk(emb, query, k=10).collect()}
    assert len(set(got) & exact) / 10.0 >= 0.2  # plumbing floor


# --------------------------------------------------------------- BPE


def test_train_bpe_classic_example(spark):
    """Sennrich-style sanity: on a corpus dominated by 'low'-family
    words, early merges build the shared stem."""
    from cryo_spark.operators.tokenizer import bpe_apply, train_bpe

    rows = [(i, "low low low low low lower lower newest newest widest")
            for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, n_merges=10, sample=4)
    # the dominant word assembles within the first 3 merges
    # (tie-breaks may pick ('o','w') before ('l','o') — both valid)
    assert ("low", "</w>") in merges[:3]
    out = {r.doc_id: r for r in bpe_apply(df, merges).collect()}
    assert all(r.n_tokens == len(r.tokens) for r in out.values())
    # 'low</w>' should have merged to a single token by 10 merges
    assert "low</w>" in out[0].tokens


def test_bpe_apply_compresses_and_is_deterministic(spark):
    from cryo_spark.operators.tokenizer import bpe_apply, train_bpe

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = train_bpe(docs, n_merges=100)
    assert merges == train_bpe(docs, n_merges=100)  # reproducible
    out = bpe_apply(docs, merges)
    n_bpe = out.agg(F.sum("n_tokens")).first()[0]
    # char-level baseline: tokens without any merges
    n_chars = bpe_apply(docs, []).agg(F.sum("n_tokens")).first()[0]
    n_words = docs.select(
        F.sum(text.token_count("text")).alias("n")
    ).first()["n"]
    # merges compress toward (but never beyond) word-level
    assert n_words <= n_bpe < n_chars
    # roundtrip: concatenating a doc's tokens reproduces its
    # normalized characters (merges never lose or invent text)
    row = out.filter("doc_id = 0").first()
    doc = docs.filter("doc_id = 0").first()["text"]
    joined = "".join(row.tokens).replace("</w>", " ").strip()
    import re
    assert joined == re.sub(r"\s+", " ", doc.strip().lower())
