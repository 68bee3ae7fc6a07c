"""Round-16 operator tests: z-order string/binary clustering (the r15
ADVICE medium — string columns cast to double produced NULL, so the
z-value was constant and clustering silently no-op'd), the persisted
range probe, synonym-SQL quote escaping, and driver-side decoder
resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------ z-order: string/binary numeric views


def test_zorder_numeric_string_is_lexicographic_and_nonconstant(spark):
    """Strings map to their leading-8-byte big-endian integer view —
    monotone in lexicographic order and NON-constant for hex-hash
    columns (the silent no-op the r15 advisor flagged: cast-to-double
    on '0x89ab...' was NULL for every row)."""
    from cryo_spark.operators import skew

    df = spark.createDataFrame(
        [("0x00ab",), ("0x89cd",), ("0xff01",), (None,)], ["h"]
    )
    vals = [
        r.v
        for r in df.select(skew._zorder_numeric(df, "h").alias("v"))
        .collect()
    ]
    assert vals[3] is None  # NULL stays NULL (zorder_value maps it to lo)
    nn = vals[:3]
    assert len(set(nn)) == 3, "hex strings must get DISTINCT numeric views"
    # lexicographic order preserved: '0x00ab' < '0x89cd' < '0xff01'
    assert nn[0] < nn[1] < nn[2]


def test_zorder_numeric_binary_and_unsupported(spark):
    from cryo_spark.operators import skew

    df = spark.createDataFrame(
        [(bytearray(b"\x00\x01"),), (bytearray(b"\xff\xee"),)], ["b"]
    )
    vals = [
        r.v
        for r in df.select(skew._zorder_numeric(df, "b").alias("v"))
        .collect()
    ]
    assert vals[0] < vals[1]

    arr = spark.createDataFrame([([1, 2],)], ["a"])
    with pytest.raises(ValueError, match="unsupported type"):
        skew._zorder_numeric(arr, "a")


def test_write_lake_zorder_string_column_clusters(spark, tmp_path):
    """END-TO-END proof the advisor's no-op is fixed: write_lake with
    zorder on a hex-string address column must co-locate equal
    addresses so a point probe reads a strict subset of files (with
    the constant-z bug every file covered every address)."""
    import random

    from cryo_spark import io as cio

    rng = random.Random(16)
    addrs = ["0x%040x" % rng.getrandbits(160) for _ in range(40)]
    rows = [
        (1, rng.randrange(0, 2_000_000), rng.choice(addrs))
        for _ in range(4000)
    ]
    df = spark.createDataFrame(rows, ["chain_id", "block_number", "address"])
    root = str(tmp_path / "lake")
    cio.write_lake(
        df.repartition(8),
        root,
        "tx",
        bucket_size=1_000_000,
        max_records_per_file=300,
        mode="overwrite",
        zorder=["address"],
    )
    back = spark.read.parquet(root + "/tx")
    assert back.count() == 4000
    # file-stat pruning: per-file address min/max ranges must not all
    # span the whole space — count files whose [min,max] covers a probe
    import pyarrow.parquet as pq
    import glob

    files = glob.glob(root + "/tx/**/*.parquet", recursive=True)
    assert len(files) > 1
    probe = addrs[0]
    covering = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "address"
            )
            st = col.statistics
            lo = st.min if st is not None else None
            hi = st.max if st is not None else None
            if isinstance(lo, bytes):
                lo, hi = lo.decode(), hi.decode()
            if st is None or lo <= probe <= hi:
                covering += 1
                break
    assert covering < len(files), (
        "z-order on a string column must prune SOME files for a point "
        f"probe (covering {covering}/{len(files)})"
    )


# ------------------ synonym SQL twin: quote escaping


def test_stub_synonym_encoder_sql_escapes_quotes(spark):
    """Apostrophe-bearing synonyms ("don't" -> "do not") must build a
    valid, non-injectable DuckDB CASE arm and still match the Spark
    adapter bit-for-bit."""
    import duckdb

    from cryo_spark.operators import encode

    docs = spark.createDataFrame(
        [("d1", "don't stop"), ("d2", "do_not stop"), ("d3", "it's fine")],
        ["doc_id", "text"],
    )
    syn = {"don't": "do_not", "it's": "it_is"}
    enc = encode.stub_synonym_encoder(dim=8, synonyms=syn)
    got = {
        r.doc_id: tuple(r.embedding)
        for r in encode.encode_documents(docs, enc, dim=8).collect()
    }
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    sql = encode.stub_synonym_encoder_sql("docs", dim=8, synonyms=syn)
    want = {
        row[0]: tuple(row[1])
        for row in con.execute(sql).fetchall()
    }
    assert got == want
    # the synonym actually applied: d1 ("don't") == d2 ("do_not")
    assert got["d1"] == got["d2"]


# ------------------ decoder knob: driver-side resolution


def test_resolve_decoder_driver_side():
    from cryo_spark.operators import multimodal as mm

    d = mm.resolve_decoder("auto")
    assert d in ("vendored", "pil")
    assert mm.resolve_decoder("vendored") == "vendored"
    with pytest.raises(ValueError):
        mm.resolve_decoder("nope")


# ------------------ learned multi-class language ID (round 16)


@pytest.fixture(scope="module")
def langid_parts(spark):
    """One trained model shared by the langid tests: 28-language
    planted fixture, deterministic hash split, char 3-5-gram
    multinomial LR."""
    from cryo_spark.operators import langid
    from cryo_spark.operators.sampling import _bucket, _threshold

    fx = langid.multilingual_fixture(spark)
    hold = _bucket("doc_id", "lid0") < F.lit(_threshold(0.25))
    train, test = fx.filter(~hold), fx.filter(hold)
    lm = langid.train_langid(train)
    return fx, test, lm


def test_char_grams_exact(spark):
    """Exact gram list: normalized (lower, whitespace-collapsed,
    space-padded) char n-grams. Guards the F.transform arity trap —
    a two-parameter lambda receives (element, index) and silently
    corrupts the gram length."""
    from cryo_spark.operators import langid

    df = spark.createDataFrame([("a", "The  cat")], ["doc_id", "text"])
    g3 = df.select(langid.char_grams("text", (3,)).alias("g")).first().g
    assert g3 == [" th", "the", "he ", "e c", " ca", "cat", "at "]
    both = df.select(langid.char_grams("text", (3, 4)).alias("g")).first().g
    assert both[:7] == g3 and both[7:] == [
        " the", "the ", "he c", "e ca", " cat", "cat "
    ]
    # NULL text -> grams of "  " (padded empty), never a crash
    nulls = spark.createDataFrame(
        [("b", None)], "doc_id string, text string"
    )
    assert nulls.select(langid.char_grams("text", (3,)).alias("g")).first().g == []


def test_langid_accuracy_gate(langid_parts):
    """>=0.95 held-out accuracy over 28 languages (the verdict's done
    bar; measured 1.00 at fix time)."""
    from cryo_spark.operators import langid

    _, test, lm = langid_parts
    assert len(lm.labels) >= 20
    acc = langid.accuracy(langid.with_language(test, lm))
    assert acc >= 0.95, f"held-out accuracy {acc}"


def test_langid_scoring_no_exchange(langid_parts):
    """Scoring the corpus is a narrow broadcast-coefficient pass —
    the same no-Exchange law as classifier.score_quality: featurize +
    transform + argmax must not shuffle the 100 TB side."""
    from cryo_spark.operators import langid

    fx, _, lm = langid_parts
    plan = (
        langid.detect_language_learned(fx, lm)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_langid_save_load_roundtrip(langid_parts, tmp_path):
    from cryo_spark.operators import langid

    _, test, lm = langid_parts
    lm.save(str(tmp_path / "m"))
    back = langid.LangIdModel.load(str(tmp_path / "m"))
    assert back.labels == lm.labels and back.ns == lm.ns
    a = {
        r.doc_id: r.lang_pred
        for r in langid.detect_language_learned(test, lm).collect()
    }
    b = {
        r.doc_id: r.lang_pred
        for r in langid.detect_language_learned(test, back).collect()
    }
    assert a == b


def test_langid_pipeline_lang_stratum(langid_parts, spark):
    """prepare_training_corpus(langid_model=..., lang='ru') keeps
    exactly the Russian docs (the learned verdict REPLACES the
    4-language stopword vote); without a model a non-vote lang raises
    instead of silently dropping everything."""
    from cryo_spark.operators import corpus

    fx, _, lm = langid_parts
    docs = fx.withColumn("source", F.lit("fx")).filter(
        F.col("lang").isin("ru", "en", "el")
    )
    out = corpus.prepare_training_corpus(
        docs.drop("lang"), min_quality=0.0, lang="ru", langid_model=lm
    )
    got = {r.doc_id for r in out.select("doc_id").collect()}
    want = {r.doc_id for r in docs.filter(F.col("lang") == "ru")
            .select("doc_id").collect()}
    # exact-dedup may collapse identical texts; every kept doc must be
    # a planted ru doc and cover >90% of them
    assert got <= want
    assert len(got) >= 0.9 * len(want)

    with pytest.raises(ValueError, match="stopword vote"):
        corpus.prepare_training_corpus(
            docs.drop("lang"), min_quality=0.0, lang="ru"
        )


def test_langid_cli_end_to_end(langid_parts, spark, tmp_path):
    """CLI E2E: --langid-model + --lang el prepares a Greek corpus
    from a mixed-language parquet input."""
    from cryo_spark.api import main
    from cryo_spark.operators import langid

    fx, _, lm = langid_parts
    mdir = tmp_path / "model"
    lm.save(str(mdir))
    inp = tmp_path / "docs.parquet"
    fx.withColumn("source", F.lit("fx")).drop("lang").write.parquet(str(inp))
    out = tmp_path / "out"
    rc = main([
        "corpus", "--input", str(inp), "--output", str(out),
        "--lang", "el", "--langid-model", str(mdir),
        "--min-quality", "0",
    ])
    assert rc == 0
    kept = spark.read.parquet(str(out / "corpus"))
    ids = [r.doc_id for r in kept.select("doc_id").collect()]
    assert ids and all(i.startswith("el-") for i in ids)


# ------------------ encoder adapter: MLP + broadcast weights


def test_mlp_encoder_broadcast_equals_closure(spark):
    """The two weight-shipping spellings (closure-pickled arrays vs
    sparkContext.broadcast handles) must be output-identical — the
    adapter resolves handles per batch via .value."""
    from cryo_spark.operators import encode

    docs = spark.createDataFrame(
        [(i, f"doc number {i} with some shared words") for i in range(64)],
        ["doc_id", "text"],
    )
    w = encode.make_mlp_weights()
    bw = {k: spark.sparkContext.broadcast(v) for k, v in w.items()}
    a = {
        r.doc_id: tuple(r.embedding)
        for r in encode.encode_documents(
            docs, encode.hashed_mlp_encoder(w), dim=256
        ).collect()
    }
    b = {
        r.doc_id: tuple(r.embedding)
        for r in encode.encode_documents(
            docs, encode.hashed_mlp_encoder(bw), dim=256
        ).collect()
    }
    assert a == b and len(a) == 64
    # unit vectors (L2-normalized): downstream cosine ops assume it
    import math

    for v in a.values():
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-3)
