"""Round-15 operator tests: the JPEG decoder rewrite (LUT Huffman +
batched IDCT, single-component non-interleaved scans, hardened
DRI/SOS/SOF length checks), the real-media ``decoder`` throughput
knob, and the \\x0B whitespace-class twin fix (Java \\s includes
vertical tab, RE2's does not — every tokenizer twin now spells the
class explicitly)."""

from __future__ import annotations

import numpy as np
import pytest


def _jpeg():
    from cryo_spark.operators import jpegcodec

    return jpegcodec


def _gray_stream(w=24, h=16, **kw):
    J = _jpeg()
    rows = [bytes(((x * 7 + y * 13) % 256) for x in range(w))
            for y in range(h)]
    return rows, J.encode_jpeg(w, h, 1, rows, **kw)


# ------------------ single-component scans are non-interleaved


def test_jpeg_single_component_sof_sampling_ignored():
    """T.81 A.2: a single-component scan is NON-interleaved — one 8x8
    data unit per MCU in raster order, regardless of the SOF sampling
    factors. A grayscale stream whose SOF keeps 2x2 luma factors
    (what `jpegtran -grayscale` emits) must decode to the SAME pixels
    as the 1x1 spelling, not be run through the interleaved MCU
    layout (which silently produced wrong pixels when dimensions were
    MCU-aligned, or raised mid-stream otherwise)."""
    J = _jpeg()
    for w, h in [(24, 16), (19, 13), (32, 32)]:
        rows, data = _gray_stream(w, h)
        base = J.decode_jpeg(data)  # 1x1 decode of the same scan
        sof = data.find(b"\xff\xc0")
        assert data[sof + 11] == 0x11
        for hv in (0x22, 0x21, 0x12):
            patched = bytearray(data)
            patched[sof + 11] = hv
            got = J.decode_jpeg(bytes(patched))
            assert got == base, (w, h, hex(hv))
            assert got[:3] == (w, h, 1)


def test_jpeg_single_component_sampling_with_restarts():
    """Restart intervals count MCUs = data units in a non-interleaved
    scan; the patched-sampling stream with DRI still decodes
    exactly."""
    J = _jpeg()
    rows, data = _gray_stream(24, 16, restart_interval=3)
    base = J.decode_jpeg(data)
    sof = data.find(b"\xff\xc0")
    patched = bytearray(data)
    patched[sof + 11] = 0x22
    assert J.decode_jpeg(bytes(patched)) == base


# ------------------ malformed-segment ValueError contract


def test_jpeg_malformed_dri_sos_sof_are_valueerror():
    """Truncated DRI/SOS/SOF marker segments raise ValueError (the
    documented contract) — not IndexError, and never a silently wrong
    restart interval."""
    J = _jpeg()
    _, good = _gray_stream()
    sos = good.find(b"\xff\xda")
    # DRI whose segment carries only 1 payload byte
    with pytest.raises(ValueError, match="malformed DRI"):
        J.decode_jpeg(good[:sos] + b"\xff\xdd\x00\x03\x00" + good[sos:])
    # SOS whose header is shorter than 1 + 2*ns + 3
    with pytest.raises(ValueError, match="malformed SOS"):
        J.decode_jpeg(good[:sos] + b"\xff\xda\x00\x04\x01\x01")
    # SOS with zero payload
    with pytest.raises(ValueError, match="malformed SOS"):
        J.decode_jpeg(good[:sos] + b"\xff\xda\x00\x02")
    # SOF claiming 3 components but carrying 1
    sof = good.find(b"\xff\xc0")
    bad = bytearray(good)
    bad[sof + 9] = 3  # nc
    with pytest.raises(ValueError, match="malformed SOF|scan components"):
        J.decode_jpeg(bytes(bad))


def test_jpeg_entropy_stream_error_paths():
    """The inlined bit reader keeps the naive reader's error
    conditions: an RST marker that the stream's DRI=0 never asked for
    is 'unexpected marker'; a DRI stream whose RSTs were stripped is
    'missing restart marker'; entropy data cut mid-block is
    'truncated'."""
    J = _jpeg()
    rows, data = _gray_stream(24, 16, restart_interval=1)
    # patch DRI interval to 0: the decoder now expects NO restarts and
    # trips on the first RST when it needs bits past it
    dri = data.find(b"\xff\xdd")
    z = bytearray(data)
    z[dri + 4:dri + 6] = b"\x00\x00"
    with pytest.raises(ValueError, match="unexpected marker 0xffd"):
        J.decode_jpeg(bytes(z))
    # strip every RST marker: the restart boundary finds EOI instead
    stripped = bytearray()
    i = 0
    while i < len(data):
        if data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7 and i > dri:
            i += 2
            continue
        stripped.append(data[i])
        i += 1
    with pytest.raises(ValueError, match="missing restart marker"):
        J.decode_jpeg(bytes(stripped))
    # cut mid-entropy-data
    _, plain = _gray_stream(24, 16)
    sos = plain.find(b"\xff\xda")
    with pytest.raises(ValueError, match="truncated"):
        J.decode_jpeg(plain[:sos + 20])


def test_jpeg_rewrite_roundtrips_bit_identical_paths():
    """The LUT/batched-IDCT rewrite keeps the pinned roundtrips: gray
    quantizer-1 is exact, RGB within +-2, restart intervals exact,
    4:2:0 decodes; and the decode output is identical whether the
    stream carries restarts or not (same coefficients, same batched
    IDCT)."""
    J = _jpeg()
    rng = np.random.default_rng(15)
    img = rng.integers(0, 256, size=(29, 37, 3), dtype=np.uint8)
    rows = [img[y].tobytes() for y in range(29)]
    _, _, _, out = J.decode_jpeg(J.encode_jpeg(37, 29, 3, rows))
    b = np.frombuffer(b"".join(out), np.uint8).reshape(29, 37, 3)
    assert np.abs(img.astype(int) - b.astype(int)).max() <= 2
    g = img[..., 0]
    grows = [g[y].tobytes() for y in range(29)]
    base = J.decode_jpeg(J.encode_jpeg(37, 29, 1, grows))
    for ri in (1, 2, 5):
        with_ri = J.decode_jpeg(
            J.encode_jpeg(37, 29, 1, grows, restart_interval=ri)
        )
        assert with_ri == base, ri


# ------------------ real-media decoder knob (verdict task 1)


def _pil_missing() -> bool:
    try:
        import PIL  # noqa: F401

        return False
    except ImportError:
        return True


def test_decoder_knob_validation_and_fallback():
    """'auto' resolves to 'pil' only when PIL is importable, falling
    back to the vendored codecs otherwise; 'pil' without PIL is a loud
    ValueError (an explicit opt-in must not silently fall back); junk
    knob values are rejected."""
    from cryo_spark.operators import multimodal, pngcodec

    with pytest.raises(ValueError, match="decoder must be"):
        multimodal._resolve_decoder("libjpeg")
    png = pngcodec.encode_png(
        8, 8, 1, [bytes((x * 31 + y) % 256 for x in range(8))
                  for y in range(8)]
    )
    if _pil_missing():
        assert multimodal._resolve_decoder("auto") == "vendored"
        # auto == vendored bit-for-bit in a PIL-less container
        assert multimodal.real_dhash(png, decoder="auto") == \
            multimodal.real_dhash(png)
        v = multimodal.real_decode(png, dim=16, decoder="auto")
        assert np.array_equal(v, multimodal.real_decode(png, dim=16))
        assert multimodal.real_resize(png, 4, 4, decoder="auto") == \
            multimodal.real_resize(png, 4, 4)
        with pytest.raises(ValueError, match="requires PIL"):
            multimodal.real_dhash(png, decoder="pil")
        with pytest.raises(ValueError, match="requires PIL"):
            multimodal.real_resize(png, 4, 4, decoder="pil")
    else:
        assert multimodal._resolve_decoder("auto") == "pil"
        assert multimodal.real_dhash(png, decoder="pil") is not None


def test_decoder_default_stays_vendored_hash_stable():
    """The DEFAULT path is still the vendored codec — JPEG and PNG of
    the same pixels dhash-collide exactly as round 14 pinned, with no
    decoder argument anywhere."""
    from cryo_spark.operators import multimodal, pngcodec

    J = _jpeg()
    w, h = 24, 16
    grid = np.add.outer(
        np.linspace(0, 200, h), np.linspace(0, 55, w)
    ).astype(np.uint8)
    rows = [grid[y].tobytes() for y in range(h)]
    jpg = J.encode_jpeg(w, h, 1, rows)
    png = pngcodec.encode_png(w, h, 1, rows)
    assert multimodal.real_dhash(jpg) == multimodal.real_dhash(png)


@pytest.mark.skipif(_pil_missing(), reason="PIL not in this container")
def test_real_dhash_family_agreement_under_pil():
    """The dhash family laws hold under decoder='pil' too: clones
    collide, near-identical images stay within a small hamming
    distance, different images differ. (Runs only where PIL exists —
    the vendored default is pinned by test_operators.py.)"""
    from cryo_spark.operators import multimodal, pngcodec

    def grad_png(w, h, shift):
        rows = []
        for y in range(h):
            row = bytes(
                (x * 255 // max(w - 1, 1) + shift) % 256
                for x in range(w)
            )
            rows.append(row)
        return pngcodec.encode_png(w, h, 1, rows)

    a = grad_png(32, 16, 0)
    ha = multimodal.real_dhash(a, decoder="pil")
    assert ha == multimodal.real_dhash(grad_png(32, 16, 0), decoder="pil")
    hb = multimodal.real_dhash(grad_png(32, 16, 3), decoder="pil")
    ham = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
    assert ham <= 8, ham
    flat = pngcodec.encode_png(
        32, 16, 1, [bytes([200] * 32) for _ in range(16)]
    )
    assert ha != multimodal.real_dhash(flat, decoder="pil")


# ------------------ \x0B whitespace twin (ADVICE round 14)


def test_whitespace_x0b_twin_textembed_and_simhash(spark):
    """Documents containing vertical tab \\x0B tokenize identically on
    both engines now that every tokenizer twin uses the explicit
    class [ \\t\\n\\x0b\\f\\r] (Java \\s includes \\x0B, RE2's \\s does
    not): embeddings and simhashes hash-match across Spark and
    DuckDB."""
    import duckdb

    from cryo_spark.operators import dedup, textembed

    rows = [
        (0, "a\x0bb split by vertical tab"),
        (1, "mixed \x0b\t\n\x0c\r all five controls"),
        (2, "\x0bleading and trailing\x0b"),
        (3, "plain text without controls"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got_emb = {r.doc_id: list(r.embedding)
               for r in textembed.text_embeddings(docs, dim=8).collect()}
    got_sim = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want_emb = {
        r[0]: list(r[1])
        for r in con.execute(
            textembed.text_embeddings_sql("documents", dim=8)
        ).fetchall()
    }
    # the simhash twin lives inside simhash_near_dups_sql; pin the
    # tokenizer by checking that \x0B-separated tokens hash like
    # space-separated ones on BOTH engines
    same_tokens = spark.createDataFrame(
        [(0, "a b split by vertical tab")], "doc_id long, text string"
    )
    assert got_sim[0] == dedup.simhash(same_tokens).collect()[0].simhash
    dd_tok = con.execute(
        "SELECT string_split(regexp_replace(trim(lower('a\x0bb c')), "
        "'[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'), ' ')"
    ).fetchone()[0]
    con.close()
    assert dd_tok == ["a", "b", "c"]
    assert got_emb == want_emb


def test_whitespace_x0b_twin_word_stats(spark):
    """word_stats' punct/space character classes agree across engines
    on \\x0B too (the ratios feed quality filters — a divergence here
    silently shifts keep/drop decisions between engines)."""
    import duckdb

    from cryo_spark.operators import text as text_ops

    rows = [(0, "hello\x0bworld the a"), (1, "clean text the of and")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.punct_ratio)
        for r in text_ops.word_stats(docs).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT doc_id, n_tokens, punct_ratio FROM ("
            + text_ops.word_stats_sql("documents")
            + ")"
        ).fetchall()
    }
    con.close()
    assert got == want


# ------------------ graph_dedup served from the persisted index


def _planted_embeddings(spark):
    def vec(seed, eps=0.0):
        return [
            float(((seed * 31 + i * 7) % 19) - 9) / 9.0
            + (eps if i == 0 else 0.0)
            for i in range(16)
        ]

    rows = [
        (0, vec(1)), (1, vec(1, 0.0005)), (2, vec(1, 0.001)),  # family
        (3, vec(5)), (4, vec(5, 0.0008)),                      # pair
        (5, vec(9)), (6, vec(13)),                             # singles
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_graph_dedup_from_index_equals_in_memory(spark):
    """graph_dedup served from a persisted save_embedding_index table
    is row-for-row EQUAL to the in-memory spelling on the same
    embeddings and plane family (same planes/seed/k/probes/threshold),
    and the base side reads straight from its buckets (Bucketed: true,
    no re-sign pass)."""
    from cryo_spark.operators import incremental, similarity

    emb = _planted_embeddings(spark)
    table = "emb_idx_r15_gd"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    incremental.save_embedding_index(
        incremental.embedding_index(emb, n_planes=4), table, n_buckets=4
    )
    mem = similarity.graph_dedup(
        emb, threshold=0.999, k=5, n_planes=4, n_probes=8
    )
    idx = similarity.graph_dedup_from_index(
        spark, table, threshold=0.999, k=5, n_probes=8
    )
    got_mem = {(r.vec_id, r.keeper_id, r.is_duplicate)
               for r in mem.collect()}
    got_idx = {(r.vec_id, r.keeper_id, r.is_duplicate)
               for r in idx.collect()}
    assert got_mem == got_idx
    # sanity: the planted families actually collapsed
    keeper = {r[0]: r[1] for r in got_idx}
    assert keeper[1] == keeper[2] == keeper[0] == 0
    assert keeper[4] == keeper[3] == 3
    assert not any(d for v, k_, d in got_idx if v in (5, 6))
    # the kNN edge join reads the corpus side straight from its
    # buckets (the verdict frame's own plan roots in the component
    # RDD, so pin the edges subplan the verdict consumes)
    edges = similarity.knn_graph_from_index(
        spark, table, k=5, n_probes=8
    )
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_stage2c_from_index_equals_in_memory(spark):
    """The pipeline's semantic-dedup stage served from a persisted
    index (semantic_dedup_index=) keeps/drops the same documents as
    the in-memory stage when the index covers the stage input —
    without re-featurizing or re-signing the corpus."""
    from cryo_spark.operators import corpus, incremental, textembed

    texts = [
        (1, "the quick brown fox jumps over the lazy dog near the "
            "river bank every bright morning", "a"),
        (2, "every bright morning the lazy dog watches the quick "
            "brown fox jumps near the river bank over the", "a"),
        (3, "completely different prose about spark shuffle "
            "partitions and bucketed join strategies at scale", "a"),
        (4, "yet another unrelated document discussing parquet "
            "statistics and predicate pushdown behaviour", "a"),
    ]
    docs = spark.createDataFrame(
        texts, "doc_id long, text string, source string"
    )
    kw = dict(min_quality=0.0, semantic_dedup=True)
    stages_mem = corpus._corpus_stages(docs, **kw)
    sd_frame = dict(
        (name, frame) for name, frame, _ in stages_mem
    )["span_dedup"]
    table = "sem_idx_r15_2c"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # index over the STAGE INPUT (the span-deduped text), at the
    # stage's dim/planes/seed — the documented covering contract
    incremental.save_embedding_index(
        incremental.embedding_index(
            textembed.text_embeddings(
                sd_frame, text_col="text", id_col="doc_id", dim=64
            ),
            n_planes=6, id_col="doc_id",
        ),
        table, n_buckets=4,
    )
    stages_idx = corpus._corpus_stages(
        docs, min_quality=0.0, semantic_dedup_index=table
    )
    mem_ids = {
        r.doc_id
        for r in dict(
            (n, f) for n, f, _ in stages_mem
        )["semantic_dedup"].select("doc_id").collect()
    }
    idx_ids = {
        r.doc_id
        for r in dict(
            (n, f) for n, f, _ in stages_idx
        )["semantic_dedup"].select("doc_id").collect()
    }
    assert mem_ids == idx_ids
    # the word-reorder paraphrase (doc 2) is the one that collapsed
    assert 2 not in mem_ids and {1, 3, 4} <= mem_ids
    spark.sql(f"DROP TABLE IF EXISTS {table}")


# ------------------ semantic delta tier (verdict task 2)


def test_prepare_corpus_delta_semantic(spark):
    """Daily delta with a semantic index: a verbatim clone of a
    shipped doc dies at the MINHASH tier, a word-reorder PARAPHRASE
    (which minhash shingles miss) dies at the SEMANTIC tier, fresh
    text survives; the funnel grows a delta_semantic row, and
    update_index=True makes a day-3 paraphrase of a day-2 doc hit the
    updated semantic index."""
    from pyspark.sql import functions as F

    from cryo_spark.operators import corpus, incremental, textembed

    base = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near "
                "the river bank every bright morning", "s"),
            (2, "spark executors exchange shuffle blocks through the "
                "external shuffle service under fetch pressure", "s"),
        ],
        "doc_id long, text string, source string",
    )
    mh_table, sem_table = "r15_delta_mh", "r15_delta_sem"
    for t in (mh_table, sem_table):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    incremental.save_banded_index(
        incremental.minhash_index(base), mh_table, bands=4
    )
    incremental.save_embedding_index(
        incremental.embedding_index(
            textembed.text_embeddings(base, id_col="doc_id", dim=64),
            id_col="doc_id",
        ),
        sem_table,
    )
    day2 = spark.createDataFrame(
        [
            # verbatim clone of shipped doc 1 -> minhash tier
            (100, "the quick brown fox jumps over the lazy dog near "
                  "the river bank every bright morning", "s"),
            # word-reorder paraphrase of shipped doc 2 -> semantic tier
            (101, "under fetch pressure the external shuffle service "
                  "exchange shuffle blocks through spark executors "
                  "the", "s"),
            # fresh
            (102, "this is an entirely novel document and it is "
                  "about the way adaptive query execution coalesces "
                  "the skewed partitions at runtime", "s"),
        ],
        "doc_id long, text string, source string",
    )
    final, funnel = corpus.prepare_corpus_delta(
        day2, mh_table, update_index=True,
        semantic_index_table=sem_table, min_quality=0.0,
    )
    kept = {r.doc_id for r in final.select("doc_id").collect()}
    assert kept == {102}
    rows = {r.stage: r for r in funnel.collect()}
    assert rows["delta_input"].docs_out == 3
    assert rows["delta_near_dup"].docs_in == 3
    assert rows["delta_near_dup"].docs_out == 2      # minhash drop
    assert rows["delta_semantic"].docs_in == 2
    assert rows["delta_semantic"].docs_out == 1      # paraphrase drop
    assert funnel.first().stage == "delta_input"
    # update_index appended the SURVIVORS' embeddings: a day-3
    # paraphrase of day-2 doc 102 now dies at the semantic tier
    day3 = spark.createDataFrame(
        [(200, "about the way adaptive query execution coalesces "
               "the skewed partitions at runtime this is an "
               "entirely novel document and it is", "s")],
        "doc_id long, text string, source string",
    )
    final3, funnel3 = corpus.prepare_corpus_delta(
        day3, mh_table, semantic_index_table=sem_table,
        min_quality=0.0,
    )
    assert final3.count() == 0
    r3 = {r.stage: r for r in funnel3.collect()}
    assert r3["delta_semantic"].docs_out == 0
    # retry idempotency also holds for the semantic index: re-running
    # the day-2 append adds no duplicate rows
    n_before = spark.table(sem_table).count()
    corpus.prepare_corpus_delta(
        day2, mh_table, update_index=True,
        semantic_index_table=sem_table, min_quality=0.0,
    )
    assert spark.table(sem_table).count() == n_before
    for t in (mh_table, sem_table):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_corpus_cli_semantic_index_delta(spark, tmp_path):
    """CLI E2E for --semantic-index: day 1 bootstraps both indexes
    (--update-index), day 2 drops a word-reorder paraphrase of a
    day-1 doc at the semantic tier and the funnel records a
    delta_semantic row."""
    import json

    from cryo_spark.api import main

    day1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near the "
             "river bank every bright morning", "s"),
         (2, "this is an entirely novel document and it is about "
             "the way adaptive query execution coalesces the skewed "
             "partitions at runtime", "s")],
        "doc_id long, text string, source string",
    )
    # doc 10 is day-1 doc 2's text with the WORD ORDER REVERSED: every
    # bigram shingle changes (minhash sees a disjoint set) while the
    # bag of words — and therefore the signed-hash embedding — is
    # identical (cosine 1.0)
    para = " ".join(reversed(
        "this is an entirely novel document and it is about the way "
        "adaptive query execution coalesces the skewed partitions at "
        "runtime".split()
    ))
    day2 = spark.createDataFrame(
        [(10, para, "s"),
         (11, "the lazy dog sleeps through a completely different "
              "and genuinely new morning story about the old river "
              "and the young fox", "s")],
        "doc_id long, text string, source string",
    )
    d1, d2 = tmp_path / "day1.parquet", tmp_path / "day2.parquet"
    day1.coalesce(1).write.parquet(str(d1))
    day2.coalesce(1).write.parquet(str(d2))
    mh, sem = "r15_cli_mh", "r15_cli_sem"
    for t in (mh, sem):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    rc = main(["corpus", "--input", str(d1),
               "--output", str(tmp_path / "o1"),
               "--min-quality", "0.0",
               "--delta-index", mh, "--semantic-index", sem,
               "--update-index"])
    assert rc == 0
    assert spark.catalog.tableExists(mh)
    assert spark.catalog.tableExists(sem)
    rc = main(["corpus", "--input", str(d2),
               "--output", str(tmp_path / "o2"),
               "--min-quality", "0.0",
               "--delta-index", mh, "--semantic-index", sem])
    assert rc == 0
    funnel = json.load(open(tmp_path / "o2" / "funnel.json"))
    rows = {r["stage"]: r for r in funnel}
    assert rows["delta_semantic"]["docs_in"] == 2
    assert rows["delta_semantic"]["docs_out"] == 1  # paraphrase died
    kept = {
        r.doc_id
        for r in spark.read.parquet(
            str(tmp_path / "o2" / "corpus")
        ).select("doc_id").collect()
    }
    assert kept == {11}
    # --semantic-index without --delta-index is rejected loudly
    rc = main(["corpus", "--input", str(d2),
               "--output", str(tmp_path / "o3"),
               "--semantic-index", sem])
    assert rc == 2
    for t in (mh, sem):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


# ------------------ learned-embedding adapter (verdict task 4)


def test_encode_documents_stub_synonym_e2e(spark):
    """The adapter contract end to end: text -> encode_documents
    (batched mapInPandas, closure-shipped stub encoder) ->
    graph_dedup collapses a planted SYNONYM pair that the signed-hash
    embedding tier provably misses — the tier split the docs promise
    (hash tier: reorder/near-verbatim; adapter tier: synonymy)."""
    from cryo_spark.operators import encode, similarity, textembed

    docs = spark.createDataFrame(
        [
            (1, "the car drives down the road at night"),
            (2, "the automobile drives down the road at night"),
            (3, "a completely unrelated sentence about parquet files"),
        ],
        "doc_id long, text string",
    )
    enc = encode.stub_synonym_encoder(
        dim=32, synonyms={"automobile": "car"}
    )
    emb = encode.encode_documents(docs, enc, batch_size=2)
    verdict = similarity.graph_dedup(
        emb, threshold=0.999, k=5, id_col="doc_id",
        n_planes=4, n_probes=8,
    )
    got = {r.doc_id: (r.keeper_id, r.is_duplicate)
           for r in verdict.collect()}
    assert got[2] == (1, True)       # synonym pair collapsed
    assert got[1] == (1, False)
    assert got[3] == (3, False)
    # the hash tier does NOT collapse it (synonyms hash apart)
    hemb = textembed.text_embeddings(docs, dim=32)
    hv = similarity.graph_dedup(
        hemb, threshold=0.999, k=5, id_col="doc_id",
        n_planes=4, n_probes=8,
    )
    hgot = {r.doc_id: r.is_duplicate for r in hv.collect()}
    assert not hgot[2]
    # and the SAME adapter output feeds the persisted-index path
    from cryo_spark.operators import incremental

    table = "r15_adapter_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    incremental.save_embedding_index(
        incremental.embedding_index(emb, n_planes=4, id_col="doc_id"),
        table, n_buckets=4,
    )
    vidx = similarity.graph_dedup_from_index(
        spark, table, threshold=0.999, k=5, id_col="doc_id",
        n_probes=8,
    )
    assert {r.doc_id: (r.keeper_id, r.is_duplicate)
            for r in vidx.collect()} == got
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_encode_documents_batching_validation_and_nulls(spark):
    """Batch slicing is value-transparent (batch_size 1 vs 1000 give
    identical vectors), NULL text encodes like empty text, a ragged
    encoder fails loudly, and the dim probe rejects non-(n, dim)
    encoders."""
    import pytest as _pytest

    from cryo_spark.operators import encode

    docs = spark.createDataFrame(
        [(i, f"token{i} shared words" if i != 3 else None)
         for i in range(6)],
        "doc_id long, text string",
    )
    enc = encode.stub_synonym_encoder(dim=8)
    a = {r.doc_id: list(r.embedding)
         for r in encode.encode_documents(
             docs, enc, batch_size=1).collect()}
    b = {r.doc_id: list(r.embedding)
         for r in encode.encode_documents(
             docs, enc, batch_size=1000).collect()}
    assert a == b
    assert a[3] == [0.0] * 8  # NULL -> empty text -> zero vector

    def ragged(texts):
        import numpy as _np

        return _np.zeros((len(texts), 8 if len(texts) > 1 else 5))

    with _pytest.raises(Exception, match="expected"):
        encode.encode_documents(
            docs, ragged, batch_size=1, dim=8
        ).collect()
    with _pytest.raises(ValueError, match="n_texts, dim"):
        encode.encode_documents(
            docs, lambda ts: np.zeros(7), batch_size=4
        )
    with _pytest.raises(ValueError, match="batch_size"):
        encode.encode_documents(docs, enc, batch_size=0)


# ------------------ z-order on the pipeline surface (verdict task 5)


def test_write_lake_zorder_prunes_secondary_column(spark, tmp_path):
    """write_lake(zorder=[...]) clusters rows INSIDE each partition
    directory: a point probe on the secondary column covers a strict
    subset of the files z-order wrote, and materially fewer than the
    plain write (where every file spans most of the column). Rows
    round-trip exactly; directory layout is unchanged."""
    import glob

    from pyspark.sql import functions as F

    from cryo_spark import io as cio

    ev = spark.read.parquet(
        "/root/testdata/sf0.01/events.parquet"
    ).select(
        F.col("event_id").alias("block_number"),
        F.lit(1).alias("chain_id"),
        "user_id",
        "value",
    )
    zroot, proot = str(tmp_path / "zlake"), str(tmp_path / "plake")
    cio.write_lake(
        ev, zroot, "events", bucket_size=1 << 40,
        max_records_per_file=ev.count() // 12,
        zorder=["user_id", "value"],
    )
    cio.write_lake(
        ev, proot, "events", bucket_size=1 << 40,
        max_records_per_file=ev.count() // 12,
    )

    def coverage(root):
        files = glob.glob(
            f"{root}/events/chain_id=1/{cio.BUCKET_COL}=*/part-*.parquet"
        )
        assert len(files) > 4, files
        spans = []
        for f in files:
            r = spark.read.parquet(f).agg(
                F.min("user_id").alias("lo"), F.max("user_id").alias("hi")
            ).first()
            spans.append((r.lo, r.hi))
        probes = [
            ev.agg(F.expr(f"percentile_approx(user_id, {q})")).first()[0]
            for q in (0.25, 0.5, 0.75)
        ]
        fr = [
            sum(1 for lo, hi in spans if lo <= p <= hi) / len(spans)
            for p in probes
        ]
        return sum(fr) / len(fr)

    zc, pc = coverage(zroot), coverage(proot)
    assert zc < 1.0                       # strict subset of files
    assert pc >= 0.85, f"plain write should not localize: {pc}"
    assert zc < pc - 0.2, f"z-order should beat plain: {zc} vs {pc}"
    back = spark.read.parquet(f"{zroot}/events")
    assert back.count() == ev.count()
    assert (
        back.agg(F.sum("block_number")).first()[0]
        == ev.agg(F.sum("block_number")).first()[0]
    )


def test_corpus_cli_zorder_shards(spark, tmp_path):
    """CLI E2E for --zorder: the sharded export succeeds, content is
    identical to the unclustered export, and --zorder without
    --shard-tokens is rejected."""
    from cryo_spark.api import main

    SF_DIR = "/root/testdata/sf0.001"
    out_z = tmp_path / "z"
    rc = main(["corpus", "--input", f"{SF_DIR}/documents.parquet",
               "--output", str(out_z), "--shard-tokens", "5000",
               "--zorder", "doc_id,n_tokens"])
    assert rc == 0
    assert (out_z / "shards").is_dir()
    out_p = tmp_path / "p"
    rc = main(["corpus", "--input", f"{SF_DIR}/documents.parquet",
               "--output", str(out_p), "--shard-tokens", "5000"])
    assert rc == 0
    za = spark.read.parquet(str(out_z / "shards"))
    pa = spark.read.parquet(str(out_p / "shards"))
    assert za.count() == pa.count()
    assert (
        {tuple(r) for r in za.select("doc_id", "shard").collect()}
        == {tuple(r) for r in pa.select("doc_id", "shard").collect()}
    )
    rc = main(["corpus", "--input", f"{SF_DIR}/documents.parquet",
               "--output", str(tmp_path / "bad"),
               "--zorder", "doc_id"])
    assert rc == 2


# ------------------ funnel eviction guard (ADVICE r14 #4)


def test_funnel_eviction_guard_falls_back_to_aggregates(spark, monkeypatch):
    """If a cached boundary partition were evicted and recomputed
    during the funnel's one action, the observe accumulators would
    double-count. The guard cross-checks the FINAL boundary's
    observed n_docs against the action's own row count and, on
    mismatch, recomputes every boundary from the (materialized)
    caches — simulated here by poisoning the metric reader; the
    funnel values must come out identical to the honest run."""
    from cryo_spark.operators import corpus

    docs = spark.createDataFrame(
        [(i, f"document number {i} with a few plain english words "
             f"about the usual topics", "s") for i in range(20)],
        "doc_id long, text string, source string",
    )
    honest = [
        (r.stage, r.docs_in, r.docs_out)
        for r in corpus.corpus_funnel(docs, min_quality=0.0).collect()
    ]

    real_read = corpus._read_metric
    calls = {"n": 0}

    def poisoned(qe, name):
        v = real_read(qe, name)
        calls["n"] += 1
        if v is None:
            return None
        return (v[0] * 2, v[1] * 2)  # simulate duplicate accumulation

    monkeypatch.setattr(corpus, "_read_metric", poisoned)
    guarded = [
        (r.stage, r.docs_in, r.docs_out)
        for r in corpus.corpus_funnel(docs, min_quality=0.0).collect()
    ]
    assert calls["n"] >= 1          # the guard actually probed
    assert guarded == honest        # fallback restored exact values


def test_stub_synonym_encoder_sql_twin(spark):
    """The adapter contract entry's oracle: Python stub encoder
    (through the real encode_documents mapInPandas path) and the
    DuckDB SQL twin produce bit-identical embeddings on awkward
    inputs — synonyms mapped, \\x0B whitespace, NULL text, unicode
    tokens."""
    import duckdb

    from cryo_spark.operators import encode

    syn = {"car": "auto", "rapid": "fast"}
    rows = [
        (0, "the car is rapid and the auto is fast"),
        (1, "tab\tand\x0bvertical separators"),
        (2, None),
        (3, "unicode tökens stay pinned"),
        (4, "  leading and trailing  "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: list(r.embedding)
        for r in encode.encode_documents(
            docs, encode.stub_synonym_encoder(dim=16, synonyms=syn),
            batch_size=2, dim=16,
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {
        r[0]: list(r[1])
        for r in con.execute(
            encode.stub_synonym_encoder_sql(
                "documents", dim=16, synonyms=syn
            )
        ).fetchall()
    }
    con.close()
    assert got == want
    # the synonym mapping is live: doc 0's 'car'/'auto' and
    # 'rapid'/'fast' tokens each collapse onto one bucket stream
    single = {
        r.doc_id: list(r.embedding)
        for r in encode.encode_documents(
            docs, encode.stub_synonym_encoder(dim=16), dim=16
        ).collect()
    }
    assert single[0] != got[0]


def test_release_stage_storage_surgical(spark):
    """Handed the pipeline's final frame, release_stage_storage
    unpersists ONLY that run's boundary frames — an unrelated cache in
    the shared session survives (the session-wide clearCache fallback
    remains for untracked inputs)."""
    from pyspark.sql import functions as F

    from cryo_spark.operators import corpus

    other = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).persist()
    other.count()
    docs = spark.createDataFrame(
        [(i, f"plain english document number {i} about the usual "
             f"topics and the same words", "s") for i in range(10)],
        "doc_id long, text string, source string",
    )
    final, funnel = corpus.prepare_with_funnel(docs, min_quality=0.0)
    tracked = getattr(final, "_cryo_persisted", None)
    assert tracked, "final frame must carry the persisted list"
    assert any(f.storageLevel.useMemory for f in tracked)
    corpus.release_stage_storage(final)
    assert all(not f.storageLevel.useMemory for f in tracked)
    # the unrelated cache is untouched
    assert other.storageLevel.useMemory
    other.unpersist()


# ------------------ decoder rewrite differential (vs the r14 naive)


def _naive():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import _jpeg_naive_r14 as naive

    return naive


def test_jpeg_rewrite_differential_valid_streams():
    """The LUT/batched rewrite decodes BIT-IDENTICALLY to the vendored
    round-14 per-bit reference across a seeded sweep of sizes,
    channels, quantizers, samplings and restart intervals (random and
    structured pixel content)."""
    J, N = _jpeg(), _naive()
    rng = np.random.default_rng(1515)
    cases = []
    for _ in range(24):
        w = int(rng.integers(1, 49))
        h = int(rng.integers(1, 41))
        ch = int(rng.choice([1, 3]))
        quant = int(rng.choice([1, 2, 7, 40]))
        sampling = str(rng.choice(["444", "420"])) if ch == 3 else "444"
        ri = int(rng.choice([0, 0, 1, 3]))
        cases.append((w, h, ch, quant, sampling, ri))
    cases += [(8, 8, 1, 1, "444", 0), (16, 16, 3, 1, "420", 2),
              (1, 1, 1, 255, "444", 0), (9, 7, 3, 3, "420", 1)]
    for w, h, ch, quant, sampling, ri in cases:
        if rng.integers(2):
            img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        else:  # smooth gradient (long EOB runs, tiny streams)
            g = np.add.outer(
                np.linspace(0, 200, h), np.linspace(0, 55, w)
            ).astype(np.uint8)
            img = np.stack([g] * ch, axis=-1)
        rows = [img[y].tobytes() for y in range(h)]
        data = J.encode_jpeg(
            w, h, ch, rows, quant=quant, sampling=sampling,
            restart_interval=ri,
        )
        got = J.decode_jpeg(data)
        want = N.decode_jpeg(data)
        assert got == want, (w, h, ch, quant, sampling, ri)


def test_jpeg_rewrite_differential_mutated_streams():
    """Seeded mutation fuzz: corrupt one byte (or truncate) a valid
    stream — the rewrite and the naive reference agree on DECODABILITY
    (both succeed with identical pixels, or both raise), and the
    rewrite never escapes the ValueError contract (no IndexError, no
    hang). Mutations that only perturb entropy DATA can legitimately
    decode to different pixels on a lenient path; equality is asserted
    only when BOTH succeed on an unmutated-marker-structure stream —
    here we simply pin: same-success equality OR both-raise, allowing
    (naive raises, rewrite raises) with any message."""
    J, N = _jpeg(), _naive()
    rng = np.random.default_rng(77)
    img = rng.integers(0, 256, size=(16, 24, 1), dtype=np.uint8)
    rows = [img[y].tobytes() for y in range(16)]
    base = J.encode_jpeg(24, 16, 1, rows, restart_interval=2)
    agree_both_ok = agree_both_raise = 0
    for i in range(300):
        mut = bytearray(base)
        if i % 5 == 4:
            mut = mut[: int(rng.integers(2, len(base)))]  # truncate
        else:
            pos = int(rng.integers(2, len(base)))
            mut[pos] = int(rng.integers(0, 256))
        mut = bytes(mut)
        try:
            got = J.decode_jpeg(mut)
            g_err = None
        except ValueError as e:
            got, g_err = None, str(e)
        except Exception as e:  # noqa: BLE001
            raise AssertionError(
                f"rewrite escaped the ValueError contract: "
                f"{type(e).__name__} at mutation {i}"
            ) from e
        try:
            want = N.decode_jpeg(mut)
            n_err = None
        except ValueError:
            want, n_err = None, "x"
        except Exception:  # noqa: BLE001
            # the NAIVE reference had laxer malformed-segment checks
            # (r15 hardened DRI/SOS/SOF) — it may IndexError where the
            # rewrite raises ValueError; that direction is fine
            want, n_err = None, "x"
        if g_err is None and n_err is None:
            agree_both_ok += 1
            assert got == want, f"mutation {i}: decoded pixels differ"
        elif g_err is not None and n_err is not None:
            agree_both_raise += 1
        else:
            # decodability disagreement: only acceptable in the ONE
            # documented direction — the r15 single-component
            # non-interleaved fix accepts SOF sampling bytes the r14
            # reference choked on; anything else is a regression
            sof = mut.find(b"\xff\xc0")
            assert g_err is None and sof >= 0, (
                f"mutation {i}: rewrite raised where naive decoded "
                f"({g_err!r})"
            )
    # the fuzz must actually exercise both regimes
    assert agree_both_raise >= 50, agree_both_raise
    assert agree_both_ok >= 5, agree_both_ok


def test_streaming_adapter_synonym_candidates(spark, tmp_path):
    """The synonymy tier works on a STREAM: raw text arrivals ->
    encode_documents (mapInPandas composes with streaming frames) ->
    streaming_embedding_candidates vs an index built with the same
    stub encoder — a synonym paraphrase of a shipped doc is flagged on
    arrival (cosine 1.0), fresh text is not."""
    import os

    from cryo_spark import streaming
    from cryo_spark.operators import encode, incremental

    syn = {"automobile": "car"}
    enc = encode.stub_synonym_encoder(dim=32, synonyms=syn)
    base = spark.createDataFrame(
        [(1, "the car drives down the road at night"),
         (2, "a completely different document about parquet files")],
        "doc_id long, text string",
    )
    table = "r15_stream_syn_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    incremental.save_embedding_index(
        incremental.embedding_index(
            encode.encode_documents(base, enc, dim=32),
            n_planes=4, id_col="doc_id",
        ),
        table, n_buckets=4,
    )
    src = str(tmp_path / "arrivals"); os.makedirs(src)
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(101, "the automobile drives down the road at night"),
         (102, "entirely new prose about shuffle partitions")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    emb_stream = encode.encode_documents(stream, enc, dim=32)
    q = streaming.streaming_embedding_candidates(
        emb_stream, table, str(tmp_path / "cands"),
        str(tmp_path / "ckpt"), min_cosine=0.999, id_col="doc_id",
    )
    q.processAllAvailable()
    q.stop()
    got = {
        tuple(sorted((r.id_a, r.id_b))): r.cosine
        for r in spark.read.parquet(str(tmp_path / "cands")).collect()
    }
    assert (1, 101) in got and got[(1, 101)] == 1.0
    assert not any(102 in p for p in got)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
