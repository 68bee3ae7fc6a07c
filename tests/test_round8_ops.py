"""Round-8 operators: line-level dedup (CCNet shape) wiring, URL
canonicalization + dedup, per-domain caps, classifier threshold
calibration, compressed-corpus ingestion."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cryo_spark.operators.spans import dedup_lines, dedup_lines_sql

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


# ----------------------------------------------------------- dedup_lines


BANNER = "This site uses cookies to improve your experience."
FOOTER = "Copyright 2026 Example Corp. All rights reserved."


def _planted(spark):
    return spark.createDataFrame(
        [
            (1, f"{BANNER}\nUnique opening line one.\n\n{FOOTER}"),
            (2, f"{BANNER}\nTotally different body two.\n{FOOTER}"),
            (3, f"{BANNER}\n{FOOTER}"),  # all boilerplate
            (4, "Only original content here.\n\nSecond original line."),
            (5, None),  # null text survives as ('', 0, 0)
        ],
        "doc_id long, text string",
    )


def test_dedup_lines_drop_removes_planted_boilerplate(spark):
    out = {r.doc_id: r for r in dedup_lines(_planted(spark)).collect()}
    # banner + footer appear in 3 docs -> removed EVERYWHERE in drop mode
    for d in (1, 2, 3):
        assert BANNER not in out[d].text and FOOTER not in out[d].text
    assert out[1].text == "Unique opening line one.\n"  # blank line kept
    assert out[2].text == "Totally different body two."
    # fully-boilerplate doc survives as an empty row, not a dropped row
    assert out[3].text == "" and out[3].n_kept == 0 and out[3].n_lines == 2
    # untouched doc passes through verbatim, including its blank line
    assert out[4].text == "Only original content here.\n\nSecond original line."
    assert out[4].n_kept == out[4].n_lines == 3
    assert out[5].text == "" and out[5].n_lines == 0 and out[5].n_kept == 0


def test_dedup_lines_keep_first_keeps_global_keeper(spark):
    out = {
        r.doc_id: r
        for r in dedup_lines(_planted(spark), mode="keep_first").collect()
    }
    # globally-first occurrence = (min doc_id, min line_idx): doc 1
    assert out[1].text.startswith(BANNER)
    assert FOOTER in out[1].text
    for d in (2, 3):
        assert BANNER not in out[d].text and FOOTER not in out[d].text


def test_dedup_lines_keep_first_collapses_within_doc_repeats(spark):
    # the duplicated line's keeper is (doc 1, line 0); the SAME doc's
    # later repeats are not the keeper and must collapse too
    df = spark.createDataFrame(
        [
            (1, "repeat me\nmiddle\nrepeat me"),
            (2, "repeat me\nother"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_lines(df, mode="keep_first").collect()}
    assert out[1].text == "repeat me\nmiddle"
    assert out[1].n_kept == 2 and out[1].n_lines == 3
    assert out[2].text == "other"


def test_dedup_lines_min_docs_boundary(spark):
    df = spark.createDataFrame(
        [
            (1, "twice\nthrice"),
            (2, "twice\nthrice"),
            (3, "thrice\nsolo"),
        ],
        "doc_id long, text string",
    )
    # min_docs=3: only 'thrice' (3 distinct docs) is boilerplate;
    # 'twice' (2 docs) survives everywhere
    out = {r.doc_id: r for r in dedup_lines(df, min_docs=3).collect()}
    assert out[1].text == "twice" and out[2].text == "twice"
    assert out[3].text == "solo"
    # min_docs=2 removes both repeated lines
    out2 = {r.doc_id: r for r in dedup_lines(df, min_docs=2).collect()}
    assert out2[1].text == "" and out2[3].text == "solo"


def test_dedup_lines_matches_on_trimmed_content(spark):
    # '  padded  ' and 'padded' are the same line key; survivors keep
    # their ORIGINAL (untrimmed) bytes
    df = spark.createDataFrame(
        [(1, "  padded  \nkeep1"), (2, "padded\nkeep2")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_lines(df, mode="keep_first").collect()}
    assert out[1].text == "  padded  \nkeep1"
    assert out[2].text == "keep2"


@pytest.mark.parametrize("mode", ["drop", "keep_first"])
def test_dedup_lines_oracle_sf(spark, mode):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = _canon(dedup_lines(docs, mode=mode).toPandas())
    o = _canon(_oracle(SF_DIR, dedup_lines_sql("documents", mode=mode)))
    assert s.equals(o)


@pytest.mark.parametrize("mode", ["drop", "keep_first"])
def test_dedup_lines_oracle_planted_edges(spark, mode, tmp_path):
    # null text / empty text / blank-only / whitespace-variant /
    # within-doc repeats, differentially against the DuckDB oracle
    df = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "\n\n"),
            (4, " dup \nunique a\n dup "),
            (5, "dup\nunique b"),
            (6, "dup"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    o = _canon(con.sql(dedup_lines_sql("documents", mode=mode)).df())
    con.close()
    s = _canon(dedup_lines(df, mode=mode).toPandas())
    assert s.equals(o)


def test_dedup_lines_rejects_unknown_mode(spark):
    with pytest.raises(ValueError):
        dedup_lines(_planted(spark), mode="nope")


def test_prepare_training_corpus_line_dedup_stage_oracle(spark, tmp_path):
    from cryo_spark.operators.corpus import (
        prepare_training_corpus, prepare_training_corpus_sql,
    )
    import __spark_entry__ as entrymod

    # testdata docs are single-line (line dedup would be an identity)
    # — wrap every 6th word to a newline, identically in both engines
    # (the same derivation the llm_line_dedup contract entry uses), so
    # the stage genuinely rewrites text inside the pipeline chain
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wrapped = docs.withColumn("text", entrymod._wrap_lines_expr("text"))
    path = str(tmp_path / "wrapped.parquet")
    wrapped.write.mode("overwrite").parquet(path)

    s = _canon(prepare_training_corpus(wrapped, line_dedup=True).toPandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW wrapped AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    o = _canon(
        con.sql(prepare_training_corpus_sql("wrapped", line_dedup=True)).df()
    )
    con.close()
    assert len(s) > 0 and s.equals(o)
    # the stage must actually bite: with it off, kept text differs
    base = prepare_training_corpus(wrapped).toPandas()
    assert base["text"].str.len().sum() > s["text"].str.len().sum()
