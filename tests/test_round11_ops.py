"""Round-11 hardening: ADVICE regression tests (shard branch with a
custom --text-col, chunked-framing confirmation for stored-decoded
bodies, Hadoop-FS-resolved flat-layout sink guard, empty-link-graph
host_rank), plus the round's new surfaces as they land.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cryo_spark.sources.documents import (
    _chunk_framing_confirmed,
    _decode_payload,
    _dechunk,
)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------- ADVICE: corpus CLI shard branch


def test_corpus_cli_shard_tokens_with_custom_text_col(spark, tmp_path, capsys):
    """--text-col body --shard-tokens N WITHOUT --pack-budget: the
    pipeline renames the text to the fixed 'text' column, so the
    shard branch must count tokens on 'text', not args.text_col
    (previously an unresolved-column AnalysisException)."""
    import json

    from cryo_spark.api import main

    src = tmp_path / "in.parquet"
    (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .withColumnRenamed("text", "body")
        .write.parquet(str(src))
    )
    out = tmp_path / "run"
    rc = main([
        "corpus", "--input", str(src), "--output", str(out),
        "--text-col", "body", "--shard-tokens", "5000",
    ])
    assert rc == 0
    assert (out / "shards").is_dir()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_docs"] > 0
    shards = spark.read.parquet(str(out / "shards"))
    assert "n_tokens" in shards.columns
    assert shards.agg(F.sum("n_tokens")).first()[0] > 0


# ------------------------- ADVICE: chunked-framing confirmation


def test_dechunk_hex_looking_decoded_body_kept_raw():
    """A stored-decoded body whose FIRST line parses as hex ('2026',
    minified '0\\n…') must be returned unchanged: the framing is
    confirmed one step past the first declared chunk before any
    reframing happens."""
    # first line '2026' parses as hex 0x2026=8230, the body is longer
    # than 8230 bytes, and the byte run after is NOT another size line
    decoded = b"2026\nThe year in review. " + b"x" * 9000
    assert _dechunk(decoded) == decoded
    assert not _chunk_framing_confirmed(decoded)
    # minified file starting '0\n' — the 0 terminator must be followed
    # only by trailers, not by the rest of a document
    minified = b"0\nvar a=1;function f(){return a}\n"
    assert _dechunk(minified) == minified
    # via the full payload decoder with a preserved chunked header
    raw = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Type: text/plain\r\n\r\n" + minified
    )
    assert _decode_payload(raw, "response").endswith(minified.decode())


def test_dechunk_genuine_framing_still_decodes():
    """Real chunked framing — including the empty-body terminator and
    trailer lines — still decodes exactly as before."""
    framed = b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    assert _dechunk(framed) == b"hello world"
    # empty chunked body: bare terminator
    assert _dechunk(b"0\r\n\r\n") == b""
    # terminator with a trailer header
    assert _dechunk(b"0\r\nX-Check: ok\r\n\r\n") == b""
    # truncated mid-first-chunk: header wins, decode what's there
    assert _dechunk(b"A\r\nhello") == b"hello"
    # truncated exactly at the first chunk boundary
    assert _dechunk(b"5\r\nhello\r\n") == b"hello"
    # LF-only framing (lenient parse)
    assert _dechunk(b"5\nhello\n0\n\n") == b"hello"


# ----------------- ADVICE: Hadoop-FS-resolved flat-layout sink guard


def test_sink_flat_layout_guard_resolves_uris(spark, tmp_path):
    """The layout guard resolves through the Hadoop FileSystem API, so
    URI-form sink paths (the shape remote s3a/hdfs sinks take) are
    checked too — os.path.isdir is always False for those."""
    from cryo_spark.streaming import _sink_has_flat_parts

    flat = tmp_path / "flat"
    flat.mkdir()
    (flat / "part-00000-old.snappy.parquet").write_bytes(b"x")
    assert _sink_has_flat_parts(spark, f"file://{flat}")
    assert _sink_has_flat_parts(spark, str(flat))
    part = tmp_path / "ok"
    (part / "epoch_id=0").mkdir(parents=True)
    (part / "epoch_id=0" / "part-00000.parquet").write_bytes(b"x")
    assert not _sink_has_flat_parts(spark, f"file://{part}")
    assert not _sink_has_flat_parts(spark, str(tmp_path / "missing"))


# ------------------------------ ADVICE: empty-link-graph host_rank


def test_host_rank_empty_graph(spark):
    """A crawl whose pages carry no absolute/protocol-relative links
    produces an empty edge frame; host_rank must return an empty
    (host, rank) frame, not raise ZeroDivisionError."""
    from cryo_spark.operators import linkgraph

    edges = spark.createDataFrame(
        [], "src_host string, dst_host string, n_links long"
    )
    ranks = linkgraph.host_rank(edges, iters=3)
    assert ranks.columns == ["host", "rank"]
    assert ranks.count() == 0
    # and the attach composes as a no-op prior (all 0.0)
    docs = spark.createDataFrame(
        [("a", "https://x.example/p")], "doc_id string, url string"
    )
    out = linkgraph.attach_host_rank(docs, ranks)
    assert out.first().host_rank == 0.0


# ------------------- hash-exact simhash (engine-neutral md5 hash)


def test_simhash_token_hash_matches_duckdb_md5_number_lower(spark):
    """The Spark-side conv/substring byte extraction equals DuckDB's
    md5_number_lower bit-for-bit — the invariant the hash-exact
    simhash oracle rests on (incl. Unicode and the empty token)."""
    import duckdb

    toks = ["hello", "wörld", "a", "tok300", "", "日本語"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    cols = [
        F.conv(F.substring(F.md5("tok"), 17 + 2 * j, 2), 16, 10)
        .cast("int")
        .alias(f"b{j}")
        for j in range(8)
    ]
    for r in df.select("tok", *cols).collect():
        got = sum(r[f"b{j}"] << (8 * j) for j in range(8))
        want = duckdb.sql(
            "select md5_number_lower(?)", params=[r.tok]
        ).fetchone()[0]
        assert got == want, r.tok


def test_simhash_near_dups_sql_twin_matches(spark):
    """simhash_near_dups == its DuckDB SQL twin on a planted frame
    (near pair within hamming 7, far doc excluded, empty docs pair at
    hamming 0)."""
    import duckdb

    from cryo_spark.operators import dedup

    base = " ".join(f"tok{i}" for i in range(400))
    near = base.replace("tok200", "changed")
    far = " ".join(f"other{i}" for i in range(400))
    rows = [(1, base), (2, near), (3, far), (4, ""), (5, "   "), (6, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_near_dups(df).collect()
    }
    con = duckdb.connect()
    con.register("docs_pd", __import__("pandas").DataFrame(
        rows, columns=["doc_id", "text"]
    ))
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_pd")
    want = {
        tuple(r)
        for r in con.sql(dedup.simhash_near_dups_sql("documents")).fetchall()
    }
    assert got == want
    assert (1, 2) in {(a, b) for a, b, _ in got}
    # empty/whitespace/null docs all collapse to signature 0 → pairs
    # at hamming 0 (explode_outer vs LEFT JOIN parity across engines)
    assert (4, 5, 0) in got and (4, 6, 0) in got and (5, 6, 0) in got
    assert not any({a, b} & {3} == {3} and {a, b} & {1, 2} for a, b, _ in got)


def test_simhash_twin_randomized_corpus(spark):
    """Seeded randomized differential (stronger than planted cases):
    the simhash near-dup SQL twin matches Spark over a corpus of
    random unicode/whitespace/edge-case docs, including planted
    near-dup clusters so the pair set is non-trivial."""
    import random

    import duckdb
    import pandas as pd

    from cryo_spark.operators import dedup

    rng = random.Random("r11-simhash-prop")
    alphabet = ["tok", "wörd", "日本", "x", "The", "除", "é", "()"]
    docs = []
    for i in range(40):
        n = rng.randint(0, 60)
        words = [
            alphabet[rng.randrange(len(alphabet))] + str(rng.randrange(50))
            for _ in range(n)
        ]
        sep = rng.choice([" ", "  ", "\t", "\n", " \r\n "])
        docs.append((i, sep.join(words)))
    # planted near-dup cluster: one-token edits of a 80-token doc
    base = " ".join(f"w{j}" for j in range(80))
    for k in range(4):
        docs.append((100 + k, base.replace(f"w{10 * k}", "edited")))
    docs += [(200, ""), (201, "   \t\n"), (202, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_near_dups(df).collect()
    }
    con = duckdb.connect()
    con.register(
        "docs_pd", pd.DataFrame(docs, columns=["doc_id", "text"])
    )
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_pd")
    want = {
        tuple(r)
        for r in con.sql(dedup.simhash_near_dups_sql("documents")).fetchall()
    }
    assert got == want
    planted = {(a, b) for a, b, _ in got if a >= 100 and b < 200}
    assert len(planted) >= 3  # the cluster is actually found


def test_image_dhash_twin_randomized_payloads(spark):
    """Seeded randomized differential for the fake-grid dHash: random
    binary payloads (arbitrary bytes, not just UTF-8) hash identically
    in Spark and DuckDB, including the signed conversion."""
    import random

    import duckdb
    import pandas as pd

    from cryo_spark.operators import multimodal as mm

    rng = random.Random("r11-dhash-prop")
    payloads = [bytes(rng.randrange(256) for _ in range(rng.randint(0, 200)))
                for _ in range(40)]
    rows = [
        (i, "image", p, None, None, None, None)
        for i, p in enumerate(payloads)
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r.media_id: r.dhash for r in mm.image_dhash(media).collect()}
    con = duckdb.connect()
    con.register(
        "m", pd.DataFrame({"media_id": range(len(payloads)),
                           "payload": payloads})
    )
    expr = mm.fake_dhash_duckdb_expr("payload")
    want = {
        mid: (u - (1 << 64) if u >= (1 << 63) else u)
        for mid, u in con.sql(f"select media_id, {expr} from m").fetchall()
    }
    assert got == {k: int(v) for k, v in want.items()}
    # signatures spread: random payloads should not collide
    assert len(set(got.values())) == len(got)


# ---------------- perceptual-hash (dHash) image near-duplicates


def _clone_media(spark):
    from cryo_spark.operators import multimodal as mm

    texts = [
        "the original image payload bytes",
        "the original image payload bytes",   # exact clone -> hamming 0
        "a completely different image here",
        "yet another unrelated payload blob",
    ]
    rows = [
        (i, "image", t.encode(), "image/png", None, None, None)
        for i, t in enumerate(texts)
    ] + [(99, "audio", b"not an image", "audio/wav", None, None, 1000)]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_image_dhash_matches_duckdb_and_finds_clones(spark):
    """Fake-grid dHash signatures equal the DuckDB twin bit-for-bit
    (signed conversion included); byte-identical payloads pair at
    hamming 0; audio rows are excluded by the kind filter."""
    import duckdb
    import pandas as pd

    from cryo_spark.operators import multimodal as mm

    media = _clone_media(spark)
    sigs = {r.media_id: r.dhash for r in mm.image_dhash(media).collect()}
    assert set(sigs) == {0, 1, 2, 3}  # audio row filtered out
    assert sigs[0] == sigs[1] and sigs[0] != sigs[2]
    con = duckdb.connect()
    con.register(
        "m",
        pd.DataFrame(
            {
                "media_id": list(sigs),
                "payload": [
                    r.payload
                    for r in media.filter("kind = 'image'")
                    .orderBy("media_id")
                    .collect()
                ],
            }
        ),
    )
    expr = mm.fake_dhash_duckdb_expr("payload")
    want = {
        mid: (u - (1 << 64) if u >= (1 << 63) else u)
        for mid, u in con.sql(f"select media_id, {expr} from m").fetchall()
    }
    assert sigs == {k: int(v) for k, v in want.items()}
    pairs = {
        (r.id_a, r.id_b, r.hamming)
        for r in mm.image_near_dups(media).collect()
    }
    dpairs = {
        tuple(r)
        for r in con.sql(
            mm.image_near_dups_sql("SELECT media_id, payload FROM m")
        ).fetchall()
    }
    assert pairs == dpairs and (0, 1, 0) in pairs


def test_image_dhash_incremental_equals_batch(spark):
    """base pairs ∪ incremental(new) == from-scratch image_near_dups:
    the (id, sig) index shape rides the shared incremental machinery
    (bands=8, one byte per band), and clones arriving in the delta
    match the persisted base index without rehashing it."""
    from cryo_spark.operators import incremental, multimodal as mm

    media = _clone_media(spark).filter("kind = 'image'")
    base = media.filter("media_id < 2")
    new = media.filter("media_id >= 2")
    bidx = mm.image_dhash_index(base)
    nidx = mm.image_dhash_index(new)
    base_cand = incremental.signature_pairs(
        bidx, bands=8, id_col="media_id", with_est=False
    )
    base_pairs = {
        (r.id_a, r.id_b, r.hamming)
        for r in base_cand.join(
            mm.image_near_dups(base).select("id_a", "id_b", "hamming"),
            ["id_a", "id_b"],
        ).collect()
    }
    inc_pairs = {
        (r.id_a, r.id_b, r.hamming)
        for r in mm.image_incremental_near_dups(bidx, nidx).collect()
    }
    full = {
        (r.id_a, r.id_b, r.hamming)
        for r in mm.image_near_dups(media).collect()
    }
    assert base_pairs | inc_pairs == full
    assert base_pairs & inc_pairs == set()
    # a clone arriving in a LATER delta matches the persisted base
    clone = spark.createDataFrame(
        [(7, "the original image payload bytes".encode())],
        "media_id long, payload binary",
    )
    cidx = mm.image_dhash_index(clone)
    hits = mm.image_incremental_near_dups(
        bidx.unionByName(nidx), cidx
    ).collect()
    assert {(r.id_a, r.id_b, r.hamming) for r in hits} == {
        (0, 7, 0), (1, 7, 0)
    }


def test_video_near_dups_frame_overlap(spark):
    """Video member of the dedup family: identical videos overlap at
    1.0; a TRIMMED copy (shorter duration, same content) still matches
    via containment (its every frame appears in the longer video);
    unrelated videos don't pair."""
    from cryo_spark.operators import multimodal as mm

    vids = [
        (1, "video", b"shared video content", "video/mp4", None, None, 8000),
        (2, "video", b"shared video content", "video/mp4", None, None, 8000),
        (3, "video", b"shared video content", "video/mp4", None, None, 3000),
        (4, "video", b"totally different clip", "video/mp4", None, None, 8000),
        (5, "image", b"not a video", "image/png", None, None, None),
    ]
    media = spark.createDataFrame(vids, mm.MEDIA_SCHEMA)
    pairs = {
        (r.id_a, r.id_b): r
        for r in mm.video_near_dups(media, min_overlap=0.9).collect()
    }
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
    assert pairs[(1, 2)].overlap == 1.0
    assert pairs[(1, 2)].n_frames_a == 9 and pairs[(1, 2)].n_frames_b == 9
    # trimmed pair: the 4-frame clip is fully contained in the 9-frame
    # video (containment 1.0), though Jaccard would be 4/9
    assert pairs[(1, 3)].n_frames_b == 4
    assert pairs[(1, 3)].matched_b == 4 and pairs[(1, 3)].overlap == 1.0
    # per-frame signatures are deterministic across runs
    s1 = {(r.media_id, r.frame_index): r.dhash
          for r in mm.video_frame_dhash(media).collect()}
    s2 = {(r.media_id, r.frame_index): r.dhash
          for r in mm.video_frame_dhash(media).collect()}
    assert s1 == s2 and (4, 0) in s1 and (5, 0) not in s1


def test_audio_near_dups_window_overlap(spark):
    """Audio member of the dedup family: same machinery as video with
    kind='audio' — identical tracks pair at 1.0, a trimmed excerpt
    matches via containment, video rows are ignored, and the real
    fingerprint path rejects non-WAV bytes loudly (since round 12 it
    is a REAL stdlib decode, tested on real PCM in
    test_round12_ops)."""
    from cryo_spark.operators import multimodal as mm

    rows = [
        (1, "audio", b"same song bytes", "audio/wav", None, None, 5000),
        (2, "audio", b"same song bytes", "audio/wav", None, None, 5000),
        (3, "audio", b"same song bytes", "audio/wav", None, None, 2000),
        (4, "audio", b"other melody!!", "audio/wav", None, None, 5000),
        (5, "video", b"same song bytes", "video/mp4", None, None, 5000),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    pairs = {
        (r.id_a, r.id_b): r
        for r in mm.audio_near_dups(media, min_overlap=0.9).collect()
    }
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
    assert pairs[(1, 2)].overlap == 1.0
    assert pairs[(1, 3)].matched_b == pairs[(1, 3)].n_frames_b  # containment
    with pytest.raises(Exception):  # not a WAV container
        mm.real_audio_fingerprint(b"x", 0)


def test_contract_multimodal_video_pairs(spark):
    """The llm_multimodal contract entry carries video_pair rows with
    real volume (source-derived clone families): same-source videos
    pair at containment 1.0, and every op kind is present."""
    import __spark_entry__ as E

    # sf0.01 — the driver's correctness scale; sf0.001 has no
    # identical-text image docs, so dhash_pair is empty there
    out = E.queries()["llm_multimodal"](spark, "/root/testdata/sf0.01")
    ops = {r.op for r in out.select("op").distinct().collect()}
    assert ops == {"features", "frames", "dhash", "dhash_pair",
                   "video_pair", "image_pair"}  # image_pair: round 13
    vp = out.filter(F.col("op") == "video_pair").collect()
    assert len(vp) > 100
    assert all(r.overlap == 1.0 for r in vp)
    # pair ids are videos (doc_id % 3 == 2), ordered
    assert all(r.media_id % 3 == 2 and r.pair_b % 3 == 2 for r in vp)
    assert all(r.media_id < r.pair_b for r in vp)


def test_image_dhash_custom_hasher_arrow_path(spark):
    """The hasher= Arrow path (what a real PIL/decoder deployment
    uses) produces (id, dhash) with NULL payloads handled, and
    image_near_dups composes with it."""
    from cryo_spark.operators import multimodal as mm

    rows = [
        (1, "image", b"aaaa", None, None, None, None),
        (2, "image", b"bbbb", None, None, None, None),
        (3, "image", b"cc", None, None, None, None),
        (4, "image", None, None, None, None, None),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    hasher = lambda b: len(b) * 1000  # noqa: E731 — stand-in decoder
    sigs = {r.media_id: r.dhash for r in mm.image_dhash(media, hasher).collect()}
    assert sigs == {1: 4000, 2: 4000, 3: 2000, 4: None}
    pairs = {
        (r.id_a, r.id_b, r.hamming)
        for r in mm.image_near_dups(media, hasher=hasher).collect()
    }
    assert (1, 2, 0) in pairs and not any(4 in (a, b) for a, b, _ in pairs)
    # video frame path with a custom hasher rides the same machinery
    vrows = [(7, "video", b"vv", None, None, None, 2000)]
    vm = spark.createDataFrame(vrows, mm.MEDIA_SCHEMA)
    vs = mm.video_frame_dhash(vm, hasher=hasher).collect()
    assert len(vs) == 3 and all(r.dhash == 32000 for r in vs)


def test_image_dhash_index_rides_persisted_table(spark):
    """The (id, sig[8]) image index composes with save_banded_index /
    incremental_pairs_from_table exactly as the docstring claims: a
    day-2 image batch dedups against day-1's BUCKETED table (bands=8,
    one byte per band), clones are found, and the k-probe accepts the
    8-long signatures."""
    from cryo_spark.operators import incremental, multimodal as mm

    media = _clone_media(spark).filter("kind = 'image'")
    base = media.filter("media_id < 2")
    new = spark.createDataFrame(
        [(50, "the original image payload bytes".encode()),
         (51, b"brand new day two image")],
        "media_id long, payload binary",
    )
    table = "r11_img_band_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    incremental.save_banded_index(
        mm.image_dhash_index(base), table, bands=8, id_col="media_id"
    )
    cand = incremental.incremental_pairs_from_table(
        spark, table, mm.image_dhash_index(new), bands=8,
        id_col="media_id", with_est=False,
    )
    got = {(r.id_a, r.id_b) for r in cand.collect()}
    assert got == {(0, 50), (1, 50)}  # clones of both shipped copies
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_real_dhash_requires_pil():
    """real_dhash raises the documented NotImplementedError where PIL
    is absent; where PIL exists it produces a signed 64-bit int."""
    from cryo_spark.operators import multimodal as mm

    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="PIL"):
            mm.real_dhash(b"\x89PNG fake")
        return
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (32, 32), 128).save(buf, format="PNG")
    sig = mm.real_dhash(buf.getvalue())
    assert isinstance(sig, int) and -(1 << 63) <= sig < (1 << 63)


# --------------------- CDX-driven selective re-extraction recipe


def _cdx_member(payload: bytes, uri: str) -> bytes:
    import gzip

    sep = b"\r\n"
    rec = (
        b"WARC/1.0" + sep
        + b"WARC-Type: response" + sep
        + f"WARC-Target-URI: {uri}".encode() + sep
        + b"WARC-Date: 2026-08-14T00:00:00Z" + sep
        + f"Content-Length: {len(payload)}".encode() + sep
        + sep + payload + sep + sep
    )
    return gzip.compress(rec)


def _build_cdx_crawl(tmp_path):
    """Two .warc.gz files x 6 captures with host/language/timestamp
    variety + their CDX index with real byte offsets. Returns
    (root, index path, {urlkey: (filename, offset, length)})."""
    import json as _json

    captures = []  # (file_idx, host, lang, ts, body)
    for i in range(12):
        host = f"site{i % 4}.test"
        lang = "eng" if i % 2 == 0 else "fra"
        ts = "20260810000000" if i < 6 else "20260814000000"
        body = (
            f"<html><body><p>Capture {i} from {host} in {lang} with "
            f"plenty of prose to extract cleanly.</p></body></html>"
        )
        captures.append((i % 2, host, lang, ts, i, body))
    lines, spans = [], {}
    for fidx in (0, 1):
        pos, blobs = 0, []
        for f, host, lang, ts, i, body in captures:
            if f != fidx:
                continue
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + body.encode()
            )
            m = _cdx_member(payload, f"https://{host}/p{i}")
            key = f"test,{host.split('.')[0]})/p{i}"
            lines.append(
                f"{key} {ts} "
                + _json.dumps(
                    dict(
                        url=f"https://{host}/p{i}", mime="text/html",
                        status="200", languages=lang,
                        length=str(len(m)), offset=str(pos),
                        filename=f"c{fidx}.warc.gz",
                    )
                )
            )
            spans[key] = (f"c{fidx}.warc.gz", pos, len(m))
            blobs.append(m)
            pos += len(m)
        (tmp_path / f"c{fidx}.warc.gz").write_bytes(b"".join(blobs))
    idx = tmp_path / "crawl.cdx"
    idx.write_text("\n".join(lines))
    return str(tmp_path) + "/", str(idx), spans


def test_reextract_documents_slices(spark, tmp_path):
    """One-call domain/language/date-slice re-extraction: every
    selection applies on the index, and the output is the canonical
    document frame."""
    from cryo_spark.sources.cdx import reextract_documents

    root, idx, _ = _build_cdx_crawl(tmp_path)
    docs = reextract_documents(
        spark, idx, warc_root=root, hosts=["site1.test"]
    ).collect()
    assert {r.url.split("/")[2] for r in docs} == {"site1.test"}
    assert len(docs) == 3 and all("plenty of prose" in r.text for r in docs)
    assert {r.status for r in docs} == {200}
    fr = reextract_documents(
        spark, idx, warc_root=root, languages=["fra"], ts_from="20260814"
    ).collect()
    assert len(fr) == 3  # second-day french captures only
    assert all(int(r.url.rsplit("p", 1)[1]) >= 6 for r in fr)
    both = reextract_documents(
        spark, idx, warc_root=root,
        hosts=["site0.test", "site2.test"], languages=["eng"],
    ).collect()
    assert len(both) == 6  # eng captures land on even hosts here
    # ts_to date prefixes are INCLUSIVE of the whole day: captures at
    # 20260814000000 must be covered by ts_to='20260814' AND by a
    # same-day ts_from (zero-padded start)
    day2 = reextract_documents(
        spark, idx, warc_root=root,
        ts_from="20260814", ts_to="20260814",
    ).count()
    assert day2 == 6
    assert reextract_documents(
        spark, idx, warc_root=root, ts_to="20260813"
    ).count() == 6  # first-day captures only


def test_reextract_touches_only_selected_bytes(spark, tmp_path):
    """The 0.1%-selection-touches-0.1%-of-bytes claim, end to end:
    corrupt EVERY byte outside the selected captures' (offset,
    length) ranges — if the fetch read (or decompressed) anything
    beyond those ranges, the gzip members would be garbage and the
    parse would fail; instead the selected docs extract perfectly."""
    from cryo_spark.sources.cdx import read_cdx, reextract_documents

    root, idx, spans = _build_cdx_crawl(tmp_path)
    keep = {
        k: v for k, v in spans.items() if "site3" in k
    }  # 3 of 12 captures
    for fname in ("c0.warc.gz", "c1.warc.gz"):
        p = tmp_path / fname
        raw = bytearray(p.read_bytes())
        keep_ranges = [
            (off, off + ln) for f, off, ln in keep.values() if f == fname
        ]
        for i in range(len(raw)):
            if not any(a <= i < b for a, b in keep_ranges):
                raw[i] = 0x5A
        p.write_bytes(bytes(raw))
    docs = reextract_documents(
        spark, idx, warc_root=root, hosts=["site3.test"]
    ).collect()
    assert len(docs) == 3
    assert all("plenty of prose" in r.text for r in docs)
    # sanity: a selection OUTSIDE the preserved ranges now fails to
    # parse (the corruption is real) — rows drop, no crash
    other = reextract_documents(
        spark, idx, warc_root=root, hosts=["site0.test"]
    )
    assert other.count() == 0


def test_reextract_sitemap_hosts_and_latest(spark, tmp_path):
    """host_frame composes robots_sitemaps output (re-extract exactly
    the hosts that declare sitemaps), and latest_per_url keeps each
    urlkey's newest capture."""
    from cryo_spark.operators import robots as robots_mod
    from cryo_spark.sources.cdx import read_cdx, reextract_documents

    root, idx, _ = _build_cdx_crawl(tmp_path)
    robots_docs = spark.createDataFrame(
        [
            ("https://site2.test/robots.txt",
             "User-agent: *\nAllow: /\nSitemap: https://site2.test/s.xml"),
            ("https://site0.test/robots.txt", "User-agent: *\nAllow: /"),
        ],
        "url string, text string",
    )
    sm = robots_mod.robots_sitemaps(robots_docs)
    docs = reextract_documents(
        spark, idx, warc_root=root, host_frame=sm
    ).collect()
    assert {r.url.split("/")[2] for r in docs} == {"site2.test"}
    # latest_per_url: duplicate a capture's index line with an older ts
    # pointing at a DIFFERENT record; the newest must win
    lines = open(idx).read().splitlines()
    first = lines[0]
    older = first.replace("20260810000000", "20200101000000")
    open(idx, "w").write("\n".join(lines + [older]))
    cdx = read_cdx(spark, idx)
    key = first.split(" ")[0]
    n_all = reextract_documents(
        spark, cdx.filter(F.col("urlkey") == key), warc_root=root
    ).count()
    n_latest = reextract_documents(
        spark, cdx.filter(F.col("urlkey") == key), warc_root=root,
        latest_per_url=True,
    ).count()
    assert (n_all, n_latest) == (2, 1)


def test_corpus_cli_cdx_format(spark, tmp_path, capsys):
    """corpus --format cdx drives the selective re-extraction recipe
    end to end: a host slice of a CDX-indexed crawl feeds the full
    pipeline, and cdx-only flags are rejected for other formats."""
    import json

    from cryo_spark.api import main

    root, idx, _ = _build_cdx_crawl(tmp_path)
    out = tmp_path / "o"
    rc = main([
        "corpus", "--format", "cdx", "--input", idx,
        "--warc-root", root, "--cdx-hosts", "site1.test",
        "--output", str(out), "--min-quality", "0",
    ])
    assert rc == 0
    funnel = json.load(open(out / "funnel.json"))
    assert funnel[0]["docs_in"] == 3  # 3 of 12 captures selected
    corpus_out = spark.read.parquet(str(out / "corpus"))
    assert corpus_out.count() == 3
    capsys.readouterr()
    # cdx-only flags rejected for parquet input
    rc = main([
        "corpus", "--input", f"{SF_DIR}/documents.parquet",
        "--output", str(tmp_path / "x"), "--cdx-hosts", "a.test",
    ])
    assert rc == 2


# ----------------------------- daily-delta ingest (corpus --delta)


def _delta_days(spark):
    """Day-1 corpus + a day-2 batch where ids 100/101 near-dup day-1
    docs and 102/103 are new."""
    mk = lambda i, t: (i, t, f"src{i % 2}")  # noqa: E731
    base_txt = (
        "the quick brown fox jumps over the lazy dog and keeps on "
        "running through the wide open field all day long without rest"
    )
    other_txt = (
        "completely different prose about spark shuffles broadcast "
        "joins and adaptive query execution at large cluster scale"
    )
    day1 = spark.createDataFrame(
        [mk(1, base_txt), mk(2, other_txt)],
        "doc_id long, text string, source string",
    )
    day2 = spark.createDataFrame(
        [
            mk(100, base_txt),  # exact clone of shipped doc 1 -> drop
            mk(101, base_txt.replace("lazy", "sleepy")),  # near-dup -> drop
            mk(102, "entirely novel day two document about parquet "
                    "bucketing and co located join strategies in spark"),
            mk(103, "another fresh day two article that covers arrow "
                    "batched python workers and pandas udf overheads"),
        ],
        "doc_id long, text string, source string",
    )
    return day1, day2


def test_prepare_corpus_delta_dedups_against_saved_index(spark):
    """prepare_corpus_delta drops day-2 docs that near-dup the
    persisted day-1 index (arrival priority: shipped docs win), the
    funnel covers the delta stages, and update_index=True makes
    day-3 dedup against day-2 docs too."""
    from cryo_spark.operators import corpus, incremental

    day1, day2 = _delta_days(spark)
    table = "r11_delta_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    incremental.save_banded_index(
        incremental.minhash_index(day1), table, bands=4
    )
    final, funnel = corpus.prepare_corpus_delta(
        day2, table, update_index=True, min_quality=0.0
    )
    kept = {r.doc_id for r in final.select("doc_id").collect()}
    assert kept == {102, 103}
    rows = {r.stage: r for r in funnel.collect()}
    assert rows["delta_input"].docs_out == 4
    assert rows["delta_near_dup"].docs_in == 4
    assert rows["delta_near_dup"].docs_out == 2
    assert funnel.first().stage == "delta_input"
    # day-3: a clone of a DAY-2 doc must now hit the updated index
    day3 = spark.createDataFrame(
        [(200, "entirely novel day two document about parquet "
               "bucketing and co located join strategies in spark",
          "src0")],
        "doc_id long, text string, source string",
    )
    final3, _ = corpus.prepare_corpus_delta(day3, table, min_quality=0.0)
    assert final3.count() == 0
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_prepare_corpus_delta_all_dups_empty_survivors(spark):
    """A day-2 batch that duplicates day-1 ENTIRELY: survivors are
    empty, the pipeline still runs, and the funnel reports the full
    attrition instead of erroring on the empty frame."""
    from cryo_spark.operators import corpus, incremental

    day1, _ = _delta_days(spark)
    table = "r11_delta_empty_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    incremental.save_banded_index(
        incremental.minhash_index(day1), table, bands=4
    )
    clone = day1.withColumn("doc_id", F.col("doc_id") + 100)
    final, funnel = corpus.prepare_corpus_delta(
        clone, table, min_quality=0.0
    )
    assert final.count() == 0
    rows = {r.stage: r for r in funnel.collect()}
    assert rows["delta_near_dup"].docs_in == 2
    assert rows["delta_near_dup"].docs_out == 0
    assert rows["split"].docs_out == 0
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_incremental_pairs_from_table_rejects_k_mismatch(spark):
    """A delta batch indexed with a different signature length than
    the saved table must raise — a k mismatch would otherwise find
    (near) zero pairs silently, the same failure class the bands
    probe guards."""
    from cryo_spark.operators import incremental

    day1, day2 = _delta_days(spark)
    table = "r11_k_mismatch_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    incremental.save_banded_index(
        incremental.minhash_index(day1, k=16), table, bands=4
    )
    bad = incremental.minhash_index(day2, k=8)
    with pytest.raises(ValueError, match="k=16.*k=8"):
        incremental.incremental_pairs_from_table(
            spark, table, bad, bands=4
        )
    # matching k still works
    ok = incremental.minhash_index(day2, k=16)
    incremental.incremental_pairs_from_table(
        spark, table, ok, bands=4, with_est=False
    ).count()
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_prepare_corpus_delta_base_side_stays_bucketed(spark):
    """The composed delta path inherits the bucketed-read property:
    no Exchange above the base index scan in the candidate join (only
    the day-sized delta shuffles)."""
    from cryo_spark.operators import incremental

    day1, day2 = _delta_days(spark)
    table = "r11_delta_plan_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    incremental.save_banded_index(
        incremental.minhash_index(day1), table, bands=4
    )
    pairs = incremental.incremental_pairs_from_table(
        spark, table, incremental.minhash_index(day2), bands=4,
        with_est=False,
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan, plan
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_corpus_cli_delta_end_to_end(spark, tmp_path, capsys):
    """CLI day-1 bootstrap (--delta-index + --update-index creates the
    index), then day-2 dedups against it and its funnel carries the
    delta rows."""
    import json

    from cryo_spark.api import main

    day1, day2 = _delta_days(spark)
    d1, d2 = tmp_path / "day1.parquet", tmp_path / "day2.parquet"
    day1.write.parquet(str(d1))
    day2.write.parquet(str(d2))
    table = "r11_cli_delta_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    rc = main([
        "corpus", "--input", str(d1), "--output", str(tmp_path / "o1"),
        "--delta-index", table, "--update-index", "--min-quality", "0",
    ])
    assert rc == 0
    capsys.readouterr()
    rc = main([
        "corpus", "--input", str(d2), "--output", str(tmp_path / "o2"),
        "--delta-index", table, "--min-quality", "0",
    ])
    assert rc == 0
    funnel = json.load(open(tmp_path / "o2" / "funnel.json"))
    stages = [r["stage"] for r in funnel]
    assert stages[:2] == ["delta_input", "delta_near_dup"]
    assert funnel[0]["docs_out"] == 4 and funnel[1]["docs_out"] == 2
    out = spark.read.parquet(str(tmp_path / "o2" / "corpus"))
    assert {r.doc_id for r in out.select("doc_id").collect()} == {102, 103}
    # day-2 ran WITHOUT --update-index: the index must be unchanged
    assert spark.table(table).select("doc_id").distinct().count() == 2
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    capsys.readouterr()


def test_corpus_cli_delta_flag_validation(tmp_path, capsys):
    from cryo_spark.api import main

    rc = main([
        "corpus", "--input", f"{SF_DIR}/documents.parquet",
        "--output", str(tmp_path / "x"), "--update-index",
    ])
    assert rc == 2
    rc = main([
        "corpus", "--input", f"{SF_DIR}/documents.parquet",
        "--output", str(tmp_path / "y"),
        "--delta-index", "r11_missing_idx",
    ])
    assert rc == 2


# ------------------------------- packer bin-id stride hardening


def test_pack_sequences_raises_at_bin_stride(spark):
    """A packer partition whose local bin count reaches the id stride
    must raise (with the partitions=... fix named), never silently
    collide with the next partition's id range."""
    from py4j.protocol import Py4JJavaError

    from cryo_spark.operators import seqprep

    docs = spark.createDataFrame(
        [(i, 10) for i in range(8)], "doc_id long, n_tokens long"
    )
    # budget 10 -> one bin per doc; stride 4 < 8 bins forces the edge
    with pytest.raises(Exception, match="id stride|PythonException") as ei:
        seqprep.pack_sequences(
            docs, budget=10, partitions=1, _bin_stride=4
        ).collect()
    assert "id stride" in str(ei.value) or isinstance(
        ei.value, Py4JJavaError
    )
    # same data under the default stride packs fine and stays dense
    out = seqprep.pack_sequences(docs, budget=10, partitions=1).collect()
    assert len({r.bin_id for r in out}) == 8
