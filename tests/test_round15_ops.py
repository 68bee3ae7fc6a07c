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
