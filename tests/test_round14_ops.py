"""Round-14 operator tests: vectorized batch-ANN probe signing
(bit-equality vs the r13 per-row fold), the costball-SQL OFFSET
clamp, batched decontam GEMM with schema-derived id types, PNG codec
hardening (decompression-bomb guard + ValueError contract), and the
hash-exact text->embedding operator."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyspark.sql import functions as F


# ------------------ vectorized batch probe signing (verdict #1)


def _r13_probe_reference(v, plist, n_probes):
    """The r13 per-row interpreted fold (similarity.py:1355-1377 at
    f61788d), kept verbatim as the bit-equality reference for the
    vectorized GEMM path."""
    from cryo_spark.operators import similarity

    qq = [int(np.floor(float(x) * similarity.LSH_QUANT)) for x in v]
    qsig = 0
    margins = []
    for p, row in enumerate(plist):
        dd = sum(a * b for a, b in zip(row, qq))
        if dd >= 0:
            qsig |= 1 << p
        margins.append(abs(dd))
    qn = similarity._seq_norm([float(x) for x in v])
    masks = similarity._costball_masks(margins, n_probes)
    return qsig, margins, qn, sorted(qsig ^ m for m in masks)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("dim,n_planes", [(7, 4), (64, 6), (128, 17)])
def test_batch_probe_gemm_bit_equal_to_r13_fold(dtype, dim, n_planes):
    """The int64-GEMM probe signing is BIT-identical to the r13
    per-row Python fold: same signature, same margins, same cost-ball
    bucket set, and the cumsum norm matches the sequential fold to the
    last bit (struct.pack comparison, not approx)."""
    import pandas as pd

    from cryo_spark.operators import similarity

    rng = np.random.default_rng(7 * dim + n_planes)
    planes = similarity.int_planes(n_planes, dim, seed=5)
    plist = [[int(x) for x in row] for row in planes]
    vecs = [rng.normal(size=dim).astype(dtype) for _ in range(40)]
    # adversarial rows: constant and huge-magnitude values; the
    # all-zero vector (T=0 ties EVERY mask) only where its 2^n_planes
    # probe set stays under the documented degenerate-query cap — both
    # paths share _costball_masks, which raises loudly past it
    vecs += [np.full(dim, 3.25, dtype=dtype),
             (rng.normal(size=dim) * 1e3).astype(dtype)]
    if (1 << n_planes) <= 65536:
        vecs.append(np.zeros(dim, dtype=dtype))

    fn = similarity._batch_probe_fn(planes, 8, "query_id", "_bucket")
    pdf = pd.DataFrame({"query_id": list(range(len(vecs))), "_qv": vecs})
    out = pd.concat(list(fn(iter([pdf]))), ignore_index=True)

    for qid, v in enumerate(vecs):
        qsig, margins, qn, want_buckets = _r13_probe_reference(
            v, plist, 8
        )
        rows = out[out["query_id"] == qid]
        assert sorted(rows["_bucket"].tolist()) == want_buckets
        for got_n in rows["_qn"]:
            assert struct.pack("<d", got_n) == struct.pack("<d", qn)
        for got_v in rows["_qv"]:
            assert np.array_equal(np.asarray(got_v), np.asarray(v))


def test_batch_probe_norm_cumsum_is_sequential():
    """The cumsum norm equals math.sqrt of the LEFT-TO-RIGHT running
    sum on values chosen to expose pairwise-summation reordering
    (mixed magnitudes where (a+b)+c != a+(b+c))."""
    from cryo_spark.operators import similarity

    v = np.array([1e8, 1.0, -1e8, 1e-8, 3.0, 1e16, 7.0, -1.0],
                 dtype=np.float64)
    seq = similarity._seq_norm([float(x) for x in v])
    got = float(
        np.sqrt(np.square(v.reshape(1, -1)).cumsum(axis=1)[:, -1])[0]
    )
    assert struct.pack("<d", got) == struct.pack("<d", seq)


def test_lsh_topk_batch_double_queries_keep_precision(spark):
    """ADVICE r13: array<double> query frames keep full precision
    through the probe exchange — per-query batch rows equal the
    single-query costball scan on a double-typed corpus/query pair."""
    from cryo_spark.operators import similarity

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = {
        (r.vec_id, r.cosine)
        for r in similarity.lsh_topk_batch(
            emb, queries, k=5, n_planes=4, n_probes=8,
            exclude_self=False, dim=16,
        ).collect()
    }
    single = {
        (r.vec_id, r.cosine)
        for r in similarity.lsh_topk_costball(
            emb, rows[7][1], k=5, n_planes=4, n_probes=8,
        ).collect()
    }
    assert batch == single


def test_costball_sql_offset_clamped(spark):
    """ADVICE r13: n_probes > 2^n_planes probes EVERY bucket on both
    engines — the Python heap exhausts to the max cost and the SQL
    OFFSET is clamped to the flip-set population instead of returning
    an empty thr CTE (which silently yielded zero rows)."""
    from cryo_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    query = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    # n_planes=3 -> 8 flip sets < n_probes=16: threshold = max cost,
    # i.e. every bucket probed -> identical to exact top-k
    got = [
        (r.vec_id, r.cosine)
        for r in similarity.lsh_topk_costball(
            emb, query, k=10, n_planes=3, n_probes=16
        ).collect()
    ]
    exact = [
        (r.vec_id, r.cosine)
        for r in similarity.cosine_topk(emb, query, k=10).collect()
    ]
    assert got == exact
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/embeddings.parquet')"
    )
    sql_rows = con.execute(
        similarity.lsh_topk_costball_sql(
            "embeddings", k=10, n_planes=3, n_probes=16
        )
    ).fetchall()
    con.close()
    assert [(a, b) for a, b in sql_rows] == got


# ------------------ batched decontam GEMM (verdict #6 + ADVICE #3)


def test_embedding_decontaminate_gemm_string_ids(spark):
    """ADVICE r13: gemm derives its output id types from the input
    schemas — string corpus AND eval ids flow through and the rows
    equal the fold path's."""
    from cryo_spark.operators import decontam

    e1 = [1.0] + [0.0] * 7
    train = spark.createDataFrame(
        [
            ("docA", e1),
            ("docB", [0.75, 0.0, 0.0, 1.0] + [0.0] * 4),
            ("docC", [0.0] * 7 + [1.0]),
        ],
        "vec_id string, embedding array<float>",
    )
    evals = spark.createDataFrame(
        [("evalX", e1), ("evalY", e1)],
        "vec_id string, embedding array<float>",
    )
    got = {
        (r.vec_id, r.eval_id, r.cosine)
        for r in decontam.embedding_decontaminate(
            train, evals, min_cosine=0.5, method="gemm"
        ).collect()
    }
    # ties (evalX == evalY) break to the MIN eval id; docB's cosine is
    # 0.75/1.25 = 0.6 exactly (all components float32-representable)
    assert got == {("docA", "evalX", 1.0), ("docB", "evalX", 0.6)}
    fold = {
        (r.vec_id, r.eval_id, r.cosine)
        for r in decontam.embedding_decontaminate(
            train, evals, min_cosine=0.5, method="fold"
        ).collect()
    }
    assert fold == got


def test_embedding_decontaminate_gemm_zero_and_empty_batches(spark):
    """Zero-norm corpus rows are skipped (not NaN-flagged) and an
    empty eval side returns an empty typed frame."""
    from cryo_spark.operators import decontam

    train = spark.createDataFrame(
        [(0, [0.0] * 4), (1, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    evals = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = decontam.embedding_decontaminate(
        train, evals, min_cosine=0.5, method="gemm"
    ).collect()
    assert [(r.vec_id, r.eval_id, r.cosine) for r in got] == [(1, 100, 1.0)]
    empty = decontam.embedding_decontaminate(
        train, evals.limit(0), min_cosine=0.5, method="gemm"
    )
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "vec_id", "eval_id", "cosine",
    ]


# ------------------ PNG codec hardening (ADVICE r13 #1/#2)


def _chunk(typ: bytes, body: bytes) -> bytes:
    import struct as _s
    import zlib as _z

    return (
        _s.pack(">I", len(body)) + typ + body
        + _s.pack(">I", _z.crc32(typ + body) & 0xFFFFFFFF)
    )


def _png(width, height, color, idat_raw=None, palette=None, idat=None):
    import struct as _s
    import zlib as _z

    from cryo_spark.operators import pngcodec

    ihdr = _s.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    body = pngcodec._SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        body += _chunk(b"PLTE", palette)
    if idat is None:
        idat = _z.compress(idat_raw or b"", 6)
    return body + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def test_png_bomb_rejected_before_allocation():
    """A tiny crafted PNG claiming huge dimensions fails fast on the
    IHDR budget check — no decompression, no allocation."""
    import time

    from cryo_spark.operators import pngcodec

    bomb = _png(60000, 60000, 6, idat_raw=b"\x00" * 10)
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="decode budget"):
        pngcodec.decode_png(bomb)
    assert time.monotonic() - t0 < 1.0


def test_png_long_idat_stream_rejected_bounded():
    """An IDAT that inflates PAST the pixel data (1000:1 zlib bomb
    behind a small IHDR) is rejected, and the decode never inflates
    more than the image's own budget."""
    import zlib as _z

    from cryo_spark.operators import pngcodec

    # 4x4 grayscale needs (4+1)*4 = 20 raw bytes; hand it 10 MB of
    # zeros behind the same small header
    long_raw = b"\x00" * (10 * 1024 * 1024)
    data = _png(4, 4, 0, idat=_z.compress(long_raw, 9))
    with pytest.raises(ValueError, match="past the pixel data"):
        pngcodec.decode_png(data)


def test_png_zero_dims_and_palette_range_are_valueerror():
    from cryo_spark.operators import pngcodec

    with pytest.raises(ValueError, match="zero width or height"):
        pngcodec.decode_png(_png(0, 4, 0, idat_raw=b""))
    with pytest.raises(ValueError, match="zero width or height"):
        pngcodec.decode_png(_png(4, 0, 0, idat_raw=b""))
    # palette image whose pixel index exceeds PLTE: 1 entry, index 5
    raw = b"\x00" + bytes([5, 0])  # filter 0, two pixels
    data = _png(2, 1, 3, idat_raw=raw, palette=b"\x10\x20\x30")
    with pytest.raises(ValueError, match="palette index"):
        pngcodec.decode_png(data)


def test_png_roundtrip_still_green_after_hardening():
    """The encoder's own output still decodes bit-exactly."""
    from cryo_spark.operators import pngcodec

    rows = [bytes((x * 7 + y) % 256 for x in range(9)) for y in range(5)]
    data = pngcodec.encode_png(9, 5, 1, rows)
    w, h, ch, got = pngcodec.decode_png(data)
    assert (w, h, ch) == (9, 5, 1)
    assert got == rows


# ------------------ text -> embedding featurization (verdict #4)


def test_text_embeddings_deterministic_and_twin(spark):
    """Same text -> same vector on repeat runs, bit-identical to the
    DuckDB twin (small exact-integer components), and NULL/empty text
    maps to the zero vector on both engines."""
    import duckdb

    from cryo_spark.operators import textembed

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r.doc_id: list(r.embedding)
         for r in textembed.text_embeddings(docs, dim=16).collect()}
    b = {r.doc_id: list(r.embedding)
         for r in textembed.text_embeddings(docs, dim=16).collect()}
    assert a == b
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = {
        r[0]: list(r[1])
        for r in con.execute(
            textembed.text_embeddings_sql("documents", dim=16)
        ).fetchall()
    }
    con.close()
    assert a == want
    nulls = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  ")], "doc_id long, text string"
    )
    for r in textembed.text_embeddings(nulls, dim=8).collect():
        assert list(r.embedding) == [0.0] * 8, r


def test_text_embeddings_zero_shuffle_plan(spark):
    """Featurization is ONE narrow projection — no Exchange, no
    Python, anywhere in the plan (the 100 TB map-only claim)."""
    from cryo_spark.operators import textembed

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        textembed.text_embeddings(docs, dim=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_text_embeddings_dim_validation(spark):
    import pytest as _pytest

    from cryo_spark.operators import textembed

    for bad in (0, 1, 3, 12, 257, 512):
        with _pytest.raises(ValueError, match="power of two"):
            textembed.text_embedding_expr("text", dim=bad)
        with _pytest.raises(ValueError, match="power of two"):
            textembed.text_embeddings_sql("t", dim=bad)


def test_text_embed_decontam_composition_flags_paraphrase(spark):
    """E2E self-contained semantic decontamination on a RAW text
    corpus: a word-shuffled paraphrase of an eval doc (bag-of-words
    invariant) is flagged at cosine 1.0 with the right eval match; an
    unrelated doc is not flagged."""
    from cryo_spark.operators import decontam, textembed

    eval_text = "the quick brown fox jumps over the lazy dog tonight"
    paraphrase = "tonight the lazy dog jumps over the quick brown fox"
    rows = [
        (0, paraphrase),                     # planted: same multiset
        (1, "completely different words about spark and parquet io"),
    ]
    evals = [(100, eval_text), (101, "another held out benchmark doc")]
    corpus_emb = textembed.text_embeddings(
        spark.createDataFrame(rows, "doc_id long, text string"), dim=32
    )
    eval_emb = textembed.text_embeddings(
        spark.createDataFrame(evals, "doc_id long, text string"), dim=32
    )
    got = {
        (r.doc_id, r.eval_id, r.cosine)
        for r in decontam.embedding_decontaminate(
            corpus_emb, eval_emb, min_cosine=0.95, id_col="doc_id"
        ).collect()
    }
    assert got == {(0, 100, 1.0)}


# ------------------ fused metadata probes (verdict #5)


def test_from_index_readers_one_metadata_job(spark):
    """The persisted-index readers run ONE metadata probe: signing a
    delta via embedding_index_for_table costs exactly one job (the
    fused (n_planes, seed, dim) row read — the signing itself is
    zero-job once pinned), and lsh_topk_batch_from_index's
    construction also probes once."""
    from cryo_spark.operators import incremental, similarity

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    table = "emb_idx_meta_r14"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    incremental.save_embedding_index(
        incremental.embedding_index(emb, n_planes=6), table
    )
    tracker = spark.sparkContext.statusTracker()

    def jobs():
        return len(tracker.getJobIdsForGroup(None) or [])

    j0 = jobs()
    incremental.embedding_index_for_table(spark, table, emb.limit(10))
    assert jobs() == j0 + 1, "delta signing probed more than once"

    j1 = jobs()
    similarity.lsh_topk_batch_from_index(
        spark, table,
        emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding"),
        k=3,
    )
    assert jobs() == j1 + 1, "from_index construction probed more than once"
    spark.sql(f"DROP TABLE IF EXISTS {table}")


# ------------------ vendored baseline JPEG codec (verdict #8)


def _jpeg_mod():
    from cryo_spark.operators import jpegcodec

    return jpegcodec


def test_jpegcodec_gray_roundtrip_exact():
    """Grayscale 4:4:4 at quantizer 1 roundtrips EXACTLY (orthonormal
    DCT/IDCT + unit quantizer: the only error source is float
    rounding, which stays under half a gray level here)."""
    J = _jpeg_mod()
    w, h = 19, 13
    rows = [bytes(((x * 7 + y * 11) % 256) for x in range(w))
            for y in range(h)]
    data = J.encode_jpeg(w, h, 1, rows)
    w2, h2, ch, out = J.decode_jpeg(data)
    assert (w2, h2, ch) == (w, h, 1)
    assert out == rows


def test_jpegcodec_rgb_and_sampling_roundtrips():
    """RGB 4:4:4 roundtrips within +-2 levels (color-transform
    rounding); 4:2:0 keeps smooth gradients close (chroma is
    subsampled, so noise images only pin the luma channel); restart
    intervals decode identically."""
    J = _jpeg_mod()
    w, h = 37, 29
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    rows = [img[y].tobytes() for y in range(h)]
    _, _, _, out = J.decode_jpeg(J.encode_jpeg(w, h, 3, rows))
    b = np.frombuffer(b"".join(out), np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(img.astype(int) - b).max() <= 2

    smooth = np.stack(
        [
            np.tile(np.linspace(0, 255, w), (h, 1)),
            np.tile(np.linspace(255, 0, h)[:, None], (1, w)),
            np.full((h, w), 128.0),
        ],
        axis=-1,
    ).astype(np.uint8)
    srows = [smooth[y].tobytes() for y in range(h)]
    _, _, _, out420 = J.decode_jpeg(
        J.encode_jpeg(w, h, 3, srows, sampling="420")
    )
    b420 = np.frombuffer(b"".join(out420), np.uint8).reshape(h, w, 3)
    assert np.abs(smooth.astype(int) - b420.astype(int)).max() <= 16

    gray = img[..., 0]
    grows = [gray[y].tobytes() for y in range(h)]
    for ri in (1, 3):
        _, _, _, o = J.decode_jpeg(
            J.encode_jpeg(w, h, 1, grows, restart_interval=ri)
        )
        g = np.frombuffer(b"".join(o), np.uint8).reshape(h, w)
        assert np.abs(gray.astype(int) - g.astype(int)).max() <= 1


def test_jpegcodec_error_contract_and_bomb():
    """Everything outside the subset is ValueError, and a crafted
    dimension bomb is rejected before any allocation."""
    import time

    J = _jpeg_mod()
    good = J.encode_jpeg(
        8, 8, 1, [bytes(range(8 * i, 8 * i + 8)) for i in range(8)]
    )
    with pytest.raises(ValueError, match="baseline"):
        J.decode_jpeg(b"\xff\xd8\xff\xc2" + good[4:])  # progressive
    with pytest.raises(ValueError):
        J.decode_jpeg(good[: len(good) // 2])  # truncated
    with pytest.raises(ValueError, match="signature"):
        J.decode_jpeg(b"nonsense")
    bomb = bytearray(good)
    sof = good.find(b"\xff\xc0")
    bomb[sof + 5:sof + 7] = (60000).to_bytes(2, "big")
    bomb[sof + 7:sof + 9] = (60000).to_bytes(2, "big")
    t0 = time.monotonic()
    with pytest.raises(ValueError, match="decode budget"):
        J.decode_jpeg(bytes(bomb))
    assert time.monotonic() - t0 < 1.0


def test_real_media_paths_accept_jpeg(spark):
    """real_decode / real_dhash / real_resize run unconditionally on
    baseline-JPEG payloads (the r13 PIL guards are gone for JPEG):
    dhash of a JPEG of an image matches dhash of the PNG of the SAME
    pixels (both route through identical gray/box-resize plumbing and
    quantizer-1 luma roundtrips near-exactly), and resize returns a
    decodable PNG at the target size."""
    from cryo_spark.operators import multimodal, pngcodec

    J = _jpeg_mod()
    w, h = 24, 16
    grid = np.add.outer(
        np.linspace(0, 200, h), np.linspace(0, 55, w)
    ).astype(np.uint8)
    rows = [grid[y].tobytes() for y in range(h)]
    jpg = J.encode_jpeg(w, h, 1, rows)
    png = pngcodec.encode_png(w, h, 1, rows)
    assert multimodal.real_dhash(jpg) == multimodal.real_dhash(png)
    v = multimodal.real_decode(jpg, dim=16)
    assert v is not None and v.shape == (16,)
    out = multimodal.real_resize(jpg, 6, 5)
    w2, h2, ch2, rows2 = pngcodec.decode_png(out)
    assert (w2, h2, ch2) == (6, 5, 1)


# ------------------ funnel must not poison session serialization


def test_funnel_does_not_poison_mllib_serialization(spark):
    """Regression: the funnel's metrics use STRING-NAMED observe, not
    the pyspark Observation helper — instantiating Observation
    materializes the session's lazy, non-serializable
    ObservationManager field, after which ANY task closure capturing
    the SparkSession (MLlib training summaries do) fails
    Task-not-serializable SESSION-WIDE. A funnel followed by
    classifier training+scoring must work."""
    from cryo_spark.operators import classifier, corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fun = {r.stage: r for r in corpus.corpus_funnel(
        docs, line_dedup=True, budget=60
    ).collect()}
    assert fun["input"].docs_out == 500
    assert fun["split"].docs_out == 60

    labeled = spark.createDataFrame(
        [(i, f"good clean text number {i}", 1) for i in range(8)]
        + [(100 + i, f"spam junk {i} !!!", 0) for i in range(8)],
        "doc_id long, text string, label int",
    )
    m = classifier.train_quality_classifier(labeled, n_features=1024)
    got = classifier.score_quality(labeled, m).collect()
    assert len(got) == 16


def test_extract_features_and_resize_mixed_png_jpeg(spark):
    """Spark-level real-media pipeline over a MIXED PNG/JPEG payload
    table: extract_features(decoder=real_decode) returns unit-norm
    vectors for both formats, and resize_images(resizer=real_resize)
    emits parseable PNGs at the target size from either input."""
    from cryo_spark.operators import jpegcodec, multimodal, pngcodec

    w, h = 16, 12
    grid = np.add.outer(
        np.linspace(10, 240, h), np.linspace(0, 15, w)
    ).astype(np.uint8)
    rows = [grid[y].tobytes() for y in range(h)]
    png = pngcodec.encode_png(w, h, 1, rows)
    jpg = jpegcodec.encode_jpeg(w, h, 1, rows)
    media = spark.createDataFrame(
        [
            (0, "image", png, "image/png", w, h, None),
            (1, "image", jpg, "image/jpeg", w, h, None),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    feats = {
        r.media_id: r.feature
        for r in multimodal.extract_features(
            media, decoder=multimodal.real_decode
        ).collect()
    }
    assert set(feats) == {0, 1}
    for v in feats.values():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-5
    out = multimodal.resize_images(
        media, 5, 4, resizer=multimodal.real_resize
    ).collect()
    for r in out:
        w2, h2, ch2, _ = pngcodec.decode_png(bytes(r.payload))
        assert (w2, h2, ch2) == (5, 4, 1), r.media_id


# ------------------ graph-based semantic dedup (round 14 composition)


def test_graph_dedup_planted_clusters_and_chains(spark):
    """knn_graph -> threshold -> components -> keepers: planted clone
    family collapses to its min id, a transitive CHAIN (A~B~C with
    A!~C) collapses into ONE cluster, singletons keep themselves, and
    the composition runs end-to-end on text_embeddings output."""
    from cryo_spark.operators import similarity, textembed

    def unit(i, eps=0.0):
        v = [0.0] * 8
        v[i % 8] = 1.0
        if eps:
            v[(i + 1) % 8] = eps
        return v

    rows = [
        (0, unit(0)), (1, unit(0, 0.001)), (2, unit(0, 0.002)),  # family
        (3, unit(3)),                                            # singleton
        # chain: 4~5 and 5~6 close, 4-6 less so but still linked via 5
        (4, [1.0, 0.3, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (5, [1.0, 0.15, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (6, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: (r.keeper_id, r.is_duplicate)
        for r in similarity.graph_dedup(
            emb, threshold=0.99, k=4, n_planes=4, n_probes=8
        ).collect()
    }
    assert got[0] == (0, False)
    assert got[1] == (0, True) and got[2] == (0, True)
    assert got[3] == (3, False)
    # cos(4,5)=0.9969, cos(5,6)=0.9889... check chain collapses where
    # both hops clear the threshold
    chain_keepers = {got[4][0], got[5][0], got[6][0]}
    assert 4 in chain_keepers  # 4 is the min id of whatever linked
    # composition with text embeddings: three word-shuffles of one doc
    docs = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta"),
            (11, "delta gamma beta alpha"),
            (12, "beta alpha delta gamma"),
            (13, "totally unrelated content here"),
        ],
        "doc_id long, text string",
    )
    temb = textembed.text_embeddings(docs, dim=32).persist()
    verdict = {
        r.doc_id: (r.keeper_id, r.is_duplicate)
        for r in similarity.graph_dedup(
            temb, threshold=0.999, k=3, id_col="doc_id",
            n_planes=4, n_probes=8,
        ).collect()
    }
    assert verdict[10] == (10, False)
    assert verdict[11] == (10, True) and verdict[12] == (10, True)
    assert verdict[13] == (13, False)


# ------------------ streaming embedding candidates (round 14)


def test_streaming_embedding_candidates_equals_batch(spark, tmp_path):
    """Embedding-tier symmetry partner of the minhash streaming
    bridge: per-micro-batch semantic candidate generation against the
    persisted embedding index, unioned with the known base-base pairs,
    equals the ONE-SHOT embedding_signature_pairs run over base ∪ all
    arrivals — including pairs BETWEEN two different micro-batches
    (batch-1 index rows are appended before batch 2 processes)."""
    import os

    from cryo_spark import streaming
    from cryo_spark.operators import incremental

    def vec(seed, eps=0.0):
        return [
            float(((seed * 31 + i * 7) % 19) - 9) / 9.0
            + (eps if i == 0 else 0.0)
            for i in range(16)
        ]

    base = spark.createDataFrame(
        [(1, vec(1)), (2, vec(2)), (3, vec(1, 0.001))],  # (1,3) base pair
        "vec_id long, embedding array<float>",
    )
    batch1 = [(101, vec(1, 0.0005)), (102, vec(5))]   # 101 ~ base 1/3
    batch2 = [(201, vec(5, 0.0004)), (202, vec(8))]   # 201 ~ batch-1's 102

    table = "r14_stream_emb_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    incremental.save_embedding_index(
        incremental.embedding_index(base, n_planes=4), table, n_buckets=4
    )
    src = str(tmp_path / "arrivals"); os.makedirs(src)
    out = str(tmp_path / "cands")
    ckpt = str(tmp_path / "ckpt")
    schema = "vec_id long, embedding array<float>"

    def _drop(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    _drop(batch1)
    _drop(batch2)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = streaming.streaming_embedding_candidates(
        stream, table, out, ckpt, min_cosine=0.999
    )
    q.processAllAvailable()
    q.stop()

    got = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in spark.read.parquet(out).collect()
    }
    assert {(1, 101), (3, 101), (102, 201)} <= got

    all_vecs = base.unionByName(
        spark.createDataFrame(batch1 + batch2, schema)
    )
    one_shot = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in incremental.embedding_signature_pairs(
            incremental.embedding_index(all_vecs, n_planes=4),
            min_cosine=0.999,
        ).collect()
    }
    base_pairs = {
        tuple(sorted((r.id_a, r.id_b)))
        for r in incremental.embedding_signature_pairs(
            incremental.embedding_index(base, n_planes=4),
            min_cosine=0.999,
        ).collect()
    }
    assert got | base_pairs == one_shot
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_streaming_embedding_retried_epoch_idempotent(spark, tmp_path):
    """A replayed epoch (same epoch_id) rewrites its own candidate
    partition and skips the already-committed index append — no
    duplicate candidate rows, no index bloat."""
    from cryo_spark import streaming
    from cryo_spark.operators import incremental

    def vec(seed, eps=0.0):
        return [
            float(((seed * 31 + i * 7) % 19) - 9) / 9.0
            + (eps if i == 0 else 0.0)
            for i in range(16)
        ]

    base = spark.createDataFrame(
        [(1, vec(1))], "vec_id long, embedding array<float>"
    )
    table = "r14_stream_emb_retry"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    incremental.save_embedding_index(
        incremental.embedding_index(base, n_planes=4), table, n_buckets=4
    )
    out = str(tmp_path / "cands")
    batch = spark.createDataFrame(
        [(10, vec(1, 0.0005))], "vec_id long, embedding array<float>"
    )
    streaming._embedding_batch(batch, 7, table, out, min_cosine=0.999)
    n_idx_1 = spark.table(table).count()
    streaming._embedding_batch(batch, 7, table, out, min_cosine=0.999)
    n_idx_2 = spark.table(table).count()
    assert n_idx_1 == n_idx_2, "replayed epoch appended index rows again"
    rows = spark.read.parquet(out).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(10, 1)]
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_graph_dedup_sql_twin_bit_exact(spark):
    """graph_dedup's DuckDB twin reproduces the full verdict frame
    bit-for-bit on the sf0.001 documents' own text embeddings —
    per-row cost-ball thresholds, bucket-ball candidates, the top-k
    window, the edge threshold and the recursive components."""
    import duckdb

    from cryo_spark.operators import similarity, textembed

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    temb = textembed.text_embeddings(docs, dim=64).persist()
    got = sorted(
        (r.doc_id, r.keeper_id, r.is_duplicate)
        for r in similarity.graph_dedup(
            temb, threshold=0.95, k=10, id_col="doc_id",
            n_planes=6, n_probes=8,
        ).collect()
    )
    te = textembed.text_embeddings_sql("documents", dim=64)
    sql = similarity.graph_dedup_sql(
        "__te", threshold=0.95, k=10, id_col="doc_id",
        n_planes=6, n_probes=8, dim=64,
        prelude=f"__te AS ({te}),",
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = sorted((a, b, c) for a, b, c in con.execute(sql).fetchall())
    con.close()
    temb.unpersist()
    assert got == want
    assert len(got) == 500


# ------------------ semantic dedup as a pipeline stage (round 14)


def test_pipeline_semantic_dedup_stage_matches_duckdb(spark):
    """The optional semantic_dedup stage (stage 2c: signed-hash text
    embeddings -> graph_dedup on the span-deduped text) mirrors into
    the SQL chain exactly: funnel rows AND the final frame match
    DuckDB bit-for-bit with the option ON, and the boundary appears
    between near_dup and redact."""
    import duckdb

    from cryo_spark.operators import corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kw = dict(line_dedup=True, near_dup=True, budget=60,
              semantic_dedup=True, semantic_threshold=0.95)
    fun = sorted(tuple(r) for r in corpus.corpus_funnel(docs, **kw).collect())
    stages = [r[1] for r in sorted(fun)]
    i_nd, i_sem, i_red = (
        stages.index("near_dup"), stages.index("semantic_dedup"),
        stages.index("redact"),
    )
    assert i_nd < i_sem < i_red
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            corpus.corpus_funnel_sql("documents", **kw)
        ).fetchall()
    )
    assert fun == want
    got_rows = sorted(
        (r.doc_id, r.text, r.source, r.split)
        for r in corpus.prepare_training_corpus(docs, **kw)
        .select("doc_id", "text", "source", "split").collect()
    )
    want_rows = sorted(
        (a, b, c, d)
        for a, b, c, d in con.execute(
            "SELECT doc_id, text, source, split FROM ("
            + corpus.prepare_training_corpus_sql("documents", **kw)
            + ")"
        ).fetchall()
    )
    con.close()
    assert got_rows == want_rows


def test_pipeline_semantic_dedup_drops_paraphrase(spark):
    """A word-shuffled paraphrase that survives n-gram Jaccard (no
    shared 3-grams) is dropped by the semantic stage (bag-of-words
    cosine 1.0), and the survivors equal pipeline() minus the flagged
    doc."""
    from cryo_spark.operators import corpus

    rows = [
        (1, "the quick brown fox jumps over that lazy dog tonight", "s0"),
        # same token multiset, reversed: no shared 3-grams
        (2, "tonight dog lazy that over jumps fox brown quick the", "s0"),
        (3, "completely different text about parquet and the shuffles", "s0"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    base = {
        r.doc_id
        for r in corpus.prepare_training_corpus(
            docs, min_quality=0.0, near_dup=True, min_jaccard=0.3
        ).collect()
    }
    assert base == {1, 2, 3}  # jaccard misses the reorder
    sem = {
        r.doc_id
        for r in corpus.prepare_training_corpus(
            docs, min_quality=0.0, near_dup=True, min_jaccard=0.3,
            semantic_dedup=True, semantic_threshold=0.999,
        ).collect()
    }
    assert sem == {1, 3}  # the min-id copy survives


# ------------------ robustness sweeps


@pytest.mark.parametrize("w,h", [(1, 1), (1, 7), (7, 1), (8, 8),
                                 (9, 3), (16, 16), (17, 19)])
def test_jpegcodec_size_sweep(w, h):
    """Gray and RGB roundtrips hold at awkward sizes: 1-pixel rows and
    columns, exact multiples of 8, and primes (edge-replication
    padding on both axes)."""
    J = _jpeg_mod()
    rng = np.random.default_rng(w * 31 + h)
    gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    rows = [gray[y].tobytes() for y in range(h)]
    w2, h2, ch, out = J.decode_jpeg(J.encode_jpeg(w, h, 1, rows))
    assert (w2, h2, ch) == (w, h, 1)
    g = np.frombuffer(b"".join(out), np.uint8).reshape(h, w)
    assert np.abs(gray.astype(int) - g.astype(int)).max() <= 1

    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    rows3 = [rgb[y].tobytes() for y in range(h)]
    for sampling in ("444", "420"):
        w2, h2, ch, out = J.decode_jpeg(
            J.encode_jpeg(w, h, 3, rows3, sampling=sampling)
        )
        assert (w2, h2, ch) == (w, h, 3)
        if sampling == "444":
            b = np.frombuffer(b"".join(out), np.uint8).reshape(h, w, 3)
            assert np.abs(rgb.astype(int) - b.astype(int)).max() <= 2


def test_text_embeddings_unicode_and_whitespace_twin(spark):
    """The tokenizer agrees across engines on the awkward inputs:
    unicode text (UTF-8 md5 on both sides), tabs/newlines/multiple
    spaces, leading/trailing whitespace, punctuation-glued tokens."""
    import duckdb

    from cryo_spark.operators import textembed

    rows = [
        (0, "héllo wörld ünïcode"),
        (1, "\ttabs\tand\nnewlines\r\nmixed   spaces  "),
        (2, "  leading and trailing  "),
        (3, "punct,glued.tokens!stay?one token,"),
        (4, "日本語 テキスト と emoji 🚀 tokens"),
        (5, "a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: list(r.embedding)
           for r in textembed.text_embeddings(docs, dim=16).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {
        r[0]: list(r[1])
        for r in con.execute(
            textembed.text_embeddings_sql("documents", dim=16)
        ).fetchall()
    }
    con.close()
    assert got == want


# ------------------ z-order clustered writes (round 14)


def test_zorder_value_laws():
    """Interleaving is exact on hand-computable inputs, NULLs land at
    the origin, and the bit-budget guard raises."""
    from pyspark.sql import functions as F

    from cryo_spark.operators import skew

    # direct expression check via a tiny local frame happens in the
    # write test; here the pure guards:
    with pytest.raises(ValueError, match="budget"):
        skew.zorder_value(["a", "b"], {"a": (0, 1), "b": (0, 1)}, bits=32)
    with pytest.raises(ValueError, match="at least one"):
        skew.zorder_value([], {}, bits=8)


def test_zorder_write_localizes_both_columns(spark, tmp_path):
    """The z-order layout's data-skipping property, asserted
    quantitatively: after zorder_write on (user_id, ts), the fraction
    of output files whose [min, max] span covers a point query is
    SMALL on BOTH columns — vs a plain ts-sorted write, where user_id
    point queries touch every file. Row content round-trips exactly."""
    import glob

    from pyspark.sql import functions as F

    from cryo_spark.operators import skew

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id", "ts", "user_id", "value"
    )
    zdir = str(tmp_path / "z")
    ranges = skew.zorder_write(ev, zdir, ["user_id", "ts"], n_files=16)
    assert set(ranges) == {"user_id", "ts"}

    back = spark.read.parquet(zdir)
    assert back.count() == ev.count()
    assert (
        back.agg(F.sum("event_id")).first()[0]
        == ev.agg(F.sum("event_id")).first()[0]
    )

    def spans(d, col):
        files = glob.glob(f"{d}/part-*.parquet")
        assert len(files) > 4, files
        out = []
        for f in files:
            row = spark.read.parquet(f).agg(
                F.min(col).alias("lo"), F.max(col).alias("hi")
            ).first()
            out.append((row.lo, row.hi))
        return out

    def coverage(span_list, probes):
        # mean fraction of files whose [min, max] covers a probe —
        # averaged over several probes because repartitionByRange
        # SAMPLES its boundaries (nondeterministic per run)
        fr = [
            sum(1 for lo, hi in span_list if lo <= p <= hi)
            / len(span_list)
            for p in probes
        ]
        return sum(fr) / len(fr)

    def probes_for(col):
        return [
            ev.agg(F.expr(f"percentile_approx({col}, {q})")).first()[0]
            for q in (0.25, 0.5, 0.75)
        ]

    u_probes, t_probes = probes_for("user_id"), probes_for("ts")
    zu = coverage(spans(zdir, "user_id"), u_probes)
    zt = coverage(spans(zdir, "ts"), t_probes)

    # baseline: plain ts-sorted write — perfect on ts, hopeless on
    # user_id (every file spans nearly all users)
    sdir = str(tmp_path / "s")
    (
        ev.repartitionByRange(16, "ts").sortWithinPartitions("ts")
        .write.parquet(sdir)
    )
    su = coverage(spans(sdir, "user_id"), u_probes)

    assert zu <= 0.7, f"z-order user_id coverage {zu}"
    assert zt <= 0.7, f"z-order ts coverage {zt}"
    assert su >= 0.85, f"baseline should not localize user_id: {su}"
    assert zu < su - 0.2, f"z-order should beat the baseline: {zu} vs {su}"


def test_jpegcodec_fill_bytes_before_markers():
    """T.81 B.1.1.2: 0xFF fill bytes may pad before any marker — real
    encoders emit them; the decoder must skip them."""
    J = _jpeg_mod()
    rows = [bytes(range(8 * i, 8 * i + 8)) for i in range(8)]
    good = J.encode_jpeg(8, 8, 1, rows)
    # inject fill bytes before the SOF and SOS markers
    padded = good.replace(b"\xff\xc0", b"\xff\xff\xff\xc0").replace(
        b"\xff\xda", b"\xff\xff\xff\xff\xda"
    )
    w, h, ch, out = J.decode_jpeg(padded)
    assert (w, h, ch) == (8, 8, 1)
    assert out == rows
