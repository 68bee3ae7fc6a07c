"""Round-10 operators and hardening: header-scoped Content-Type
parsing, header/body split charset decode, RE2-parity whitespace
trims, URL host block/allowlists, the pipeline funnel report,
main-content (boilerplate) extraction, robots-noindex surfacing,
title / declared-language metadata extraction, robots.txt rule
parsing + longest-match application, wire-format body decoding
(chunked / gzip / deflate), HTTP status filtering, the CCNet-style
bigram-LM perplexity filter (stage 1d), data-constrained epoch
mixing (standalone + pipeline + CLI), the packed training-sequence
export (--pack-budget / --bpe-merges / --token-ids, split-local
composite-id packing), and token-id vocab encoding.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cryo_spark.operators import html as html_ops
from cryo_spark.sources.documents import _decode_payload, read_warc_documents

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------- content-type is header-block-scoped


def test_content_type_never_matches_body(spark):
    """A body containing a 'content-type:' line (quoted HTTP example,
    mirrored response, multipart part) must not produce a spurious
    content_type — the parse is scoped to the extracted header block."""
    quoted = (
        "HTTP/1.1 200 OK\r\nServer: x\r\n\r\n"
        "<pre>HTTP/1.1 200 OK\ncontent-type: application/pdf\n</pre>"
    )
    non_http = "random text\ncontent-type: application/zip\nmore"
    df = spark.createDataFrame([(quoted,), (non_http,)], "p string")
    rows = df.select(
        html_ops.http_content_type_expr("p").alias("ct"),
        html_ops.http_charset_expr("p").alias("cs"),
    ).collect()
    # no Content-Type header at all -> '', even though the body has one
    assert rows[0].ct == "" and rows[0].cs == ""
    # non-HTTP payload -> '' (previously misclassified as zip)
    assert rows[1].ct == "" and rows[1].cs == ""


def test_content_type_sql_parity(spark):
    payloads = [
        "HTTP/1.1 200 OK\r\nContent-Type: text/HTML; charset=UTF-8\r\n\r\nb",
        "HTTP/1.1 200 OK\r\n\r\ncontent-type: application/pdf\nbody",
        "not http\ncontent-type: application/zip",
        "HTTP/1.1 404 NF\nContent-Type:\ttext/plain\n\nplain",
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i long, p string"
    )
    got = {
        r.i: (r.ct, r.cs, r.h)
        for r in df.select(
            "i",
            html_ops.http_content_type_expr("p").alias("ct"),
            html_ops.http_charset_expr("p").alias("cs"),
            html_ops.http_headers_expr("p").alias("h"),
        ).collect()
    }
    con = duckdb.connect()
    want = {
        int(i): (ct, cs, h)
        for i, ct, cs, h in con.execute(
            f"SELECT i, {html_ops.http_content_type_sql('p')} AS ct, "
            f"{html_ops.http_charset_sql('p')} AS cs, "
            f"{html_ops.http_headers_sql('p')} AS h "
            f"FROM (SELECT unnest(range({len(payloads)})) i, unnest($1) p)",
            [payloads],
        ).fetchall()
    }
    con.close()
    assert got == want
    assert got[0] == ("text/html", "utf-8", got[0][2])
    assert got[3][0] == "text/plain"


# ------------------------------------- header/body split charset decode


def test_decode_payload_utf16_body_keeps_headers_readable():
    body = "bönjour utf-16".encode("utf-16-le")
    raw = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/plain; charset=utf-16-le\r\n\r\n" + body
    )
    out = _decode_payload(raw, "response")
    # status line intact (previously garbled by whole-payload utf-16)
    assert out.startswith("HTTP/1.1 200 OK")
    assert "bönjour utf-16" in out


def test_decode_payload_charset_in_body_not_honored():
    """charset= appearing in BODY text must not drive the decode."""
    raw = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
        b"example: charset=utf-16 caf\xc3\xa9"
    )
    out = _decode_payload(raw, "response")
    assert out.endswith("café")  # decoded as utf-8, not utf-16


def test_decode_payload_latin1_body():
    raw = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=iso-8859-1\r\n\r\ncaf\xe9"
    )
    assert _decode_payload(raw, "response").endswith("café")


def test_decode_payload_headers_only_and_non_http():
    assert _decode_payload(b"HTTP/1.1 200 OK\r\nX: y", "response").startswith(
        "HTTP/1.1"
    )
    assert _decode_payload(b"plain bytes", "resource") == "plain bytes"


# --------------------------------------------- RE2-parity trim steps


def test_trim_parity_vertical_tab(spark):
    """\\x0B must behave identically in the Spark chain and the DuckDB
    oracle (Java \\s includes it, RE2's does not — the explicit trim
    class sidesteps the divergence)."""
    cases = ["\x0bleading", "trailing\x0b", "\n\t mid\x0b dle \r\n", "\x0b"]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, h string"
    )
    got = {
        r.i: r.t
        for r in df.select(
            "i", html_ops.html_to_text_expr("h").alias("t")
        ).collect()
    }
    con = duckdb.connect()
    expr = html_ops.html_to_text_sql("h")
    want = {
        int(i): t
        for i, t in con.execute(
            f"SELECT i, {expr} AS t FROM (SELECT unnest(range({len(cases)})) i, "
            f"unnest($1) h)", [cases]
        ).fetchall()
    }
    con.close()
    assert got == want


def test_extract_documents_plain_text_fully_trimmed(spark):
    """text/plain bodies get the same full whitespace trim as the HTML
    branch (F.trim strips ASCII spaces only)."""
    payload = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
        "\r\n\t  plain body \t\r\n"
    )
    df = spark.createDataFrame(
        [("response", payload)], "warc_type string, payload string"
    )
    out = html_ops.extract_documents(df).collect()
    assert len(out) == 1
    assert out[0].text == "plain body"
    # SQL twin of the trim chain matches
    con = duckdb.connect()
    t = con.execute(
        f"SELECT {html_ops.trim_text_sql('x')} FROM (SELECT $1 AS x)",
        ["\r\n\t  plain body \t\r\n"],
    ).fetchone()[0]
    con.close()
    assert t == "plain body"


# ------------------------------------- r8 ADVICE fixes: regressions


def test_canonical_url_keeps_content_bearing_ref(spark):
    """Bare ref/referrer params are content-bearing on many sites and
    must survive the default canonicalization; a caller-supplied list
    can still strip them."""
    from cryo_spark.operators import web

    urls = [
        "https://github.com/x/y?ref=main",
        "https://github.com/x/y?ref=dev",
        "https://a.com/p?utm_source=feed&ref=keepme",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.c for r in df.select(web.canonical_url("url").alias("c")).collect()]
    assert got[0] == "github.com/x/y?ref=main"
    assert got[0] != got[1], "distinct ?ref pages must not collapse"
    assert got[2] == "a.com/p?ref=keepme"  # utm stripped, ref kept
    # caller override strips ref too, and SQL twin agrees
    custom = web.tracking_param_re((*web.DEFAULT_TRACKING_PARAMS, "ref"))
    got2 = df.select(web.canonical_url("url", custom).alias("c")).collect()
    assert got2[0].c == got2[1].c == "github.com/x/y"
    con = duckdb.connect()
    sql = web.canonical_url_sql("url", custom)
    want = [
        t[0]
        for t in con.execute(
            f"SELECT {sql} FROM (SELECT unnest($1) AS url)", [urls]
        ).fetchall()
    ]
    con.close()
    assert want[:2] == ["github.com/x/y", "github.com/x/y"]


def test_score_quality_uses_model_width(spark):
    """A model trained at a non-default hash width must score with
    that width by default, and an explicit mismatch must raise."""
    from cryo_spark.operators import classifier

    labeled = spark.createDataFrame(
        [(i, f"good clean text number {i}", 1) for i in range(8)]
        + [(100 + i, f"spam spam junk {i} !!!", 0) for i in range(8)],
        "doc_id long, text string, label int",
    )
    m = classifier.train_quality_classifier(labeled, n_features=1024)
    assert m.numFeatures == 1024
    scored = classifier.score_quality(labeled, m)  # no n_features arg
    explicit = classifier.score_quality(labeled, m, n_features=1024)
    a = {r.doc_id: r.quality_prob for r in scored.collect()}
    b = {r.doc_id: r.quality_prob for r in explicit.collect()}
    assert a == b and len(a) == 16
    with pytest.raises(ValueError, match="does not match"):
        classifier.score_quality(labeled, m, n_features=4096)


def test_near_dup_batch_retried_epoch_is_idempotent(spark, tmp_path):
    """foreachBatch replays a crashed epoch with the SAME epoch_id:
    re-running an epoch must not duplicate candidate rows or index
    band rows."""
    from cryo_spark.operators import incremental
    from cryo_spark.streaming import _near_dup_batch

    a = "the quick brown fox jumps over the lazy dog in the field"
    b = "completely different text about spark shuffles and joins ok"
    base = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    table = "r10_retry_band_idx"
    incremental.save_banded_index(incremental.minhash_index(base), table)
    out = str(tmp_path / "cands")
    batch = spark.createDataFrame(
        [(101, a), (102, b)], "doc_id long, text string"
    )
    _near_dup_batch(batch, 0, table, out)
    once_cands = sorted(
        (r.id_a, r.id_b) for r in spark.read.parquet(out).collect()
    )
    once_idx = spark.table(table).count()
    # simulate the retry: same batch, same epoch id
    _near_dup_batch(batch, 0, table, out)
    again_cands = sorted(
        (r.id_a, r.id_b) for r in spark.read.parquet(out).collect()
    )
    assert again_cands == once_cands, "replayed epoch duplicated candidates"
    assert spark.table(table).count() == once_idx, (
        "replayed epoch re-appended index band rows"
    )
    # a NEW epoch still appends (the guard is per-epoch, not global)
    batch2 = spark.createDataFrame([(201, a)], "doc_id long, text string")
    _near_dup_batch(batch2, 1, table, out)
    assert spark.table(table).count() > once_idx
    got = {(r.id_a, r.id_b) for r in spark.read.parquet(out).collect()}
    assert (1, 101) in got and (1, 201) in got
    spark.sql(f"DROP TABLE IF EXISTS {table}")


# ----------------------------------------- URL host block/allowlists


def _url_docs(spark):
    rows = [
        (1, "https://example.com/a", "keep me body text", "s1"),
        (2, "https://ads.example.com/b", "subdomain of blocked", "s1"),
        (3, "http://notexample.com/c", "lookalike suffix", "s2"),
        (4, "https://www.blocked.org:443/d?x=1", "www+port variant", "s2"),
        (5, "https://deep.sub.blocked.org/e", "deep subdomain", "s3"),
        (6, "https://fine.net/f", "unrelated host", "s3"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, url string, text string, source string"
    )


def test_url_host_filter_block_semantics(spark):
    from cryo_spark.operators import web

    docs = _url_docs(spark)
    doms = ["example.com", "blocked.org"]
    kept = {r.doc_id for r in web.url_host_filter(docs, doms).collect()}
    # exact host + subdomains blocked; notexample.com is NOT a match
    assert kept == {3, 6}
    allow = {
        r.doc_id
        for r in web.url_host_filter(docs, doms, mode="allow").collect()
    }
    assert allow == {1, 2, 4, 5}


def test_url_host_filter_join_path_equivalent(spark):
    """expr and join strategies are result-identical, and the join
    path's corpus side never shuffles (explode + broadcast joins)."""
    from cryo_spark.operators import web

    docs = _url_docs(spark)
    doms = ["example.com", "blocked.org"]
    for mode in ("block", "allow"):
        a = {r.doc_id for r in web.url_host_filter(docs, doms, mode, via="expr").collect()}
        b = {r.doc_id for r in web.url_host_filter(docs, doms, mode, via="join").collect()}
        assert a == b, mode
    plan = (
        web.url_host_filter(docs, doms, via="join")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # both joins broadcast (domain list, then matched-id set); the only
    # hash exchange is the distinct over MATCHED ids — a single narrow
    # doc_id projection, never the corpus rows
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    exch = [ln for ln in plan.split("\n") if "Exchange hashpartitioning" in ln]
    assert "doc_id" in exch[0] and "text" not in exch[0], exch[0]


def test_url_host_filter_duckdb_parity(spark):
    from cryo_spark.operators import web

    docs = _url_docs(spark)
    doms = ["Example.com", "www.blocked.org."]  # normalization applied
    got = sorted(
        r.doc_id for r in web.url_host_filter(docs, doms).collect()
    )
    con = duckdb.connect()
    con.register("t", docs.toPandas())
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM ({web.url_host_filter_sql('t', doms)})"
        ).fetchall()
    )
    con.close()
    assert got == want == [3, 6]


# ------------------------------------------- pipeline funnel report


def _funnel_docs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d = F.col("doc_id")
    return docs.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.when(d % 3 == 0, F.lit("ads.blocked")).otherwise(F.lit("site")),
            F.lit(".example.com/p/"),
            (d % 20).cast("string"),
            F.when(d % 4 == 0, F.lit("?utm_source=x")).otherwise(F.lit("")),
        ),
    )


FUNNEL_KW = dict(
    url_col="url",
    url_blocklist=["blocked.example.com"],
    domain_cap_n=30,
    line_dedup=True,
    near_dup=True,
    budget=150,
)


def test_corpus_funnel_matches_duckdb(spark):
    """Full-option funnel (host blocklist, url dedup, domain cap, line
    dedup, near dup, mixing) is bit-identical to the DuckDB CTE chain."""
    import pandas as pd
    from cryo_spark.operators import corpus

    docs = _funnel_docs(spark)
    got = (
        corpus.corpus_funnel(docs, **FUNNEL_KW)
        .toPandas().sort_values("stage_idx").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents0", docs.toPandas())
    want = (
        con.execute(corpus.corpus_funnel_sql("documents0", **FUNNEL_KW))
        .df().sort_values("stage_idx").reset_index(drop=True)
    )
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert list(got.stage) == [
        "input", "url_blocklist", "url_dedup", "domain_cap",
        "quality_lang_exact", "line_dedup", "span_dedup", "near_dup",
        "redact", "temperature_mix", "split",
    ]


def test_corpus_funnel_counts_are_independent_truth(spark):
    """Funnel rows equal counts computed independently of the funnel
    machinery: docs_out of the last stage == prepare_training_corpus
    row count, the input row == raw counts, and every stage's docs_in
    chains from the previous stage's docs_out."""
    from cryo_spark.operators import corpus, text as text_ops

    docs = _funnel_docs(spark)
    rows = {
        r.stage: r
        for r in corpus.corpus_funnel(docs, **FUNNEL_KW).collect()
    }
    n_raw = docs.count()
    tok_raw = docs.select(
        F.sum(text_ops.token_count("text")).cast("long").alias("t")
    ).first().t
    assert rows["input"].docs_out == n_raw == rows["input"].docs_in
    assert rows["input"].tokens_out == tok_raw
    final = corpus.prepare_training_corpus(docs, **FUNNEL_KW)
    assert rows["split"].docs_out == final.count()
    ordered = sorted(rows.values(), key=lambda r: r.stage_idx)
    for prev, cur in zip(ordered, ordered[1:]):
        assert cur.docs_in == prev.docs_out
        assert cur.tokens_in == prev.tokens_out
        assert cur.docs_out <= cur.docs_in  # every stage only removes
    assert rows["url_blocklist"].docs_out < n_raw  # blocklist really fired


def test_pipeline_blocklist_stage_wired(spark):
    """url_blocklist as pipeline stage 0 drops blocked-host docs from
    the final corpus (and the plain run keeps them)."""
    from cryo_spark.operators import corpus

    docs = _funnel_docs(spark)
    base = corpus.prepare_training_corpus(docs, url_col="url")
    blocked = corpus.prepare_training_corpus(
        docs, url_col="url", url_blocklist=["blocked.example.com"]
    )
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    blocked_ids = {r.doc_id for r in blocked.select("doc_id").collect()}
    assert blocked_ids < base_ids
    gone = base_ids - blocked_ids
    assert gone and all(i % 3 == 0 for i in gone)  # exactly blocked hosts


# ------------------------- main-content (boilerplate) extraction


_ARTICLE = """<html><head><title>T</title><style>p{c:red}</style></head><body>
<div class="nav"><a href="/">Home</a> | <a href="/a">About</a> | <a href="/c">Contact us</a></div>
<h1>The Article Heading</h1>
<p>This is the first paragraph of the article body, long enough to pass the density rule and mostly free of links.</p>
<p>Short but real sentence.</p>
<p>A second paragraph with one <a href="x">inline link</a> inside a long run of ordinary prose that should survive.</p>
<ul><li><a href="/1">Related story one</a></li><li><a href="/2">Related story two</a></li></ul>
<div class="footer"><a href="/privacy">Privacy</a> <a href="/terms">Terms</a> copyright 2026</div>
</body></html>"""

_MC_CASES = [
    _ARTICLE,
    # all boilerplate -> empty result (both engines must agree on '')
    '<body><a href="/">Home</a> | <a href="/x">More</a></body>',
    # hostile marker injection + anchor wrapping nested tags
    "pre\x01fake\x02<a href='x'><span>deep link</span></a> plus a long plain"
    " sentence to keep this line alive beyond thirty characters.",
    # link-farm line above a real paragraph
    '<p><a href="1">aa</a> <a href="2">bb</a> <a href="3">cc</a> <a href="4">'
    'dd</a></p><p>Genuine paragraph text that runs well past the minimum'
    " line length and has no links at all.</p>",
    # short no-punct line (nav-ish) vs short sentence
    "<p>Read more</p><p>It failed.</p>",
]


def test_main_content_keeps_article_drops_chrome(spark):
    """Planted nav/footer/related-links chrome is dropped; the article
    body (incl. a short sentence and a paragraph with one inline link)
    survives with the anchor text inlined."""
    df = spark.createDataFrame([(_ARTICLE,)], "h string")
    out = df.select(html_ops.main_content_expr("h").alias("t")).first().t
    lines = out.splitlines()
    assert lines == [
        "This is the first paragraph of the article body, long enough to"
        " pass the density rule and mostly free of links.",
        "Short but real sentence.",
        "A second paragraph with one inline link inside a long run of"
        " ordinary prose that should survive.",
    ]
    assert "Home" not in out and "Privacy" not in out
    assert "Related story" not in out
    # documented v1 trade: the bare heading goes with the chrome
    assert "Article Heading" not in out


def _py_main_content(html: str, max_ld: float = 0.4, min_len: int = 30) -> str:
    """Pure-Python reference implementation (re module) of the exact
    chain — the differential oracle for the fused Spark expression."""
    import re as _re

    from cryo_spark.operators.html import (
        _ANCHOR_RE, _ENTITY_STEPS, _M1, _M2, _MARKS, _SENTENCE_END,
        _TAG_STEPS, _TRIM_STEPS, _WS_STEPS,
    )

    c = _re.sub(f"[{_MARKS}]", "", html)
    for pat, rep in _TAG_STEPS[:3]:
        c = _re.sub(pat, rep, c)
    c = _re.sub(_ANCHOR_RE, _M1 + r"\1" + _M2, c)
    for pat, rep in _TAG_STEPS[3:]:
        c = _re.sub(pat, rep, c)
    for lit, rep in _ENTITY_STEPS:
        c = c.replace(lit, rep)
    for pat, rep in _WS_STEPS:
        c = _re.sub(pat, rep, c)
    kept = []
    for ln in c.split("\n"):
        stripped = ln.replace(_M1, "").replace(_M2, "")
        tc = len(stripped)
        no_anchor = _re.sub(f"{_M1}[^{_M2}]*{_M2}", "", ln)
        lc = tc - len(no_anchor.replace(_M1, "").replace(_M2, ""))
        core = tc >= min_len and lc <= max_ld * tc
        short = 0 < tc < min_len and lc == 0 and _re.search(
            _SENTENCE_END, stripped
        )
        if core or short:
            kept.append(stripped)
    c = "\n".join(kept)
    for pat, rep in _TRIM_STEPS:
        c = _re.sub(pat, rep, c)
    return c


def test_main_content_python_reference_differential(spark):
    df = spark.createDataFrame([(i, h) for i, h in enumerate(_MC_CASES)],
                               "i long, h string")
    got = {
        r.i: r.t
        for r in df.select(
            "i", html_ops.main_content_expr("h").alias("t")
        ).collect()
    }
    for i, h in enumerate(_MC_CASES):
        assert got[i] == _py_main_content(h), f"case {i}"
    # the short-sentence rule in isolation: nav-ish line out, sentence in
    assert got[4] == "It failed."
    # link farm dropped, genuine paragraph kept
    assert got[3].startswith("Genuine paragraph")


def test_main_content_duckdb_parity(spark):
    """Spark (Java regex + HOF filter) and DuckDB (RE2 + list lambda)
    produce byte-identical main content over the adversarial set."""
    import pandas as pd

    pdf = pd.DataFrame(
        [(i, h) for i, h in enumerate(_MC_CASES)], columns=["i", "h"]
    )
    df = spark.createDataFrame(pdf)
    got = [
        (r.i, r.t)
        for r in df.select(
            "i", html_ops.main_content_expr("h").alias("t")
        ).orderBy("i").collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT i, {html_ops.main_content_sql('h')} AS t FROM t ORDER BY i"
    ).fetchall()
    con.close()
    assert got == want
    assert got[1][1] == ""  # all-boilerplate -> '' in BOTH engines


# --------------------------------------- robots / noindex surfacing


_NOINDEX_PAYLOADS = [
    # header directive
    "HTTP/1.1 200 OK\r\nX-Robots-Tag: noindex\r\nContent-Type: text/html"
    "\r\n\r\n<html>ok</html>",
    # meta tag, name before content
    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html><head>"
    '<meta name="robots" content="noindex, nofollow"></head>'
    "<body>x</body></html>",
    # meta tag, content before name, unquoted
    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    "<meta content='noindex' name=robots><body>x</body>",
    # negative: plain page
    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<body>hello</body>",
    # negative: header directive QUOTED in body text (header parse is
    # header-block-scoped; the meta regex requires a real tag)
    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    "<body>docs say: X-Robots-Tag: noindex</body>",
    # negative: meta googlebot (different agent), meta keywords
    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    '<meta name="keywords" content="noindex"><body>x</body>',
]


def test_noindex_detection_and_parity(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        [(i, p) for i, p in enumerate(_NOINDEX_PAYLOADS)],
        columns=["i", "p"],
    )
    got = [
        (r.i, r.n)
        for r in spark.createDataFrame(pdf)
        .select("i", html_ops.noindex_expr("p").alias("n"))
        .orderBy("i").collect()
    ]
    assert got == [(0, True), (1, True), (2, True), (3, False), (4, False),
                   (5, False)]
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT i, {html_ops.noindex_sql('p')} AS n FROM t ORDER BY i"
    ).fetchall()
    con.close()
    assert got == want


def test_read_warc_documents_noindex_and_main_content(spark, tmp_path):
    """E2E: the WARC reader surfaces noindex as a column (keep-and-flag
    default — never a silent drop) and main_content=True strips chrome
    from HTML payloads while leaving text/plain untouched."""
    import gzip

    def rec(payload: bytes, uri: str) -> bytes:
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + b"WARC-Date: 2026-08-14T00:00:00Z\r\n"
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload + b"\r\n\r\n"
        )

    chrome_page = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b'<body><div><a href="/">Home</a> | <a href="/x">About</a></div>'
        b"<p>The one real paragraph, comfortably longer than the minimum"
        b" content line length.</p></body>"
    )
    noindex_page = (
        b"HTTP/1.1 200 OK\r\nX-Robots-Tag: noindex\r\n"
        b"Content-Type: text/plain\r\n\r\nplain secret text"
    )
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "p.warc.gz").write_bytes(
        gzip.compress(
            rec(chrome_page, "https://a.test/art")
            + rec(noindex_page, "https://a.test/hidden")
        )
    )
    docs = {
        r.url: r
        for r in read_warc_documents(
            spark, str(d), main_content=True
        ).collect()
    }
    assert set(docs) == {"https://a.test/art", "https://a.test/hidden"}
    assert docs["https://a.test/hidden"].noindex is True  # kept + flagged
    assert docs["https://a.test/hidden"].text == "plain secret text"
    art = docs["https://a.test/art"]
    assert art.noindex is False
    assert art.text == (
        "The one real paragraph, comfortably longer than the minimum"
        " content line length."
    )


# --------------------------------- title / declared-lang metadata


def test_html_title_and_lang_extraction(spark):
    import pandas as pd

    cases = [
        ('<html lang="en-US"><head><title> A &amp; B\n  story </title>'
         "</head><body>x</body></html>", "A & B story", "en"),
        ("<HTML LANG=fr><TITLE data-x=1>Bonjour</TITLE></HTML>",
         "Bonjour", "fr"),
        ("<html><body>no title, no lang</body></html>", "", ""),
        # title tag inside a quoted attribute must not leak langs;
        # lang on a non-<html> tag is NOT the document language
        ('<html><body><div lang="de">x</div></body></html>', "", ""),
    ]
    pdf = pd.DataFrame(
        [(i, h) for i, (h, _, _) in enumerate(cases)], columns=["i", "h"]
    )
    got = [
        (r.t, r.l)
        for r in spark.createDataFrame(pdf)
        .select(
            "i",
            html_ops.html_title_expr("h").alias("t"),
            html_ops.html_lang_expr("h").alias("l"),
        )
        .orderBy("i").collect()
    ]
    assert got == [(t, l) for _, t, l in cases]
    con = duckdb.connect()
    con.register("t", pdf)
    want = con.execute(
        f"SELECT {html_ops.html_title_sql('h')} AS t,"
        f" {html_ops.html_lang_sql('h')} AS l FROM t ORDER BY i"
    ).fetchall()
    con.close()
    assert got == want


def test_read_warc_documents_metadata_columns(spark, tmp_path):
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b'<html lang="en"><head><title>The &quot;Page&quot;</title></head>'
        b"<body><p>A body paragraph long enough to survive extraction"
        b" rules.</p></body></html>"
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://m.test/a\r\n"
        b"WARC-Date: 2026-08-14T00:00:00Z\r\n"
        + b"Content-Length: %d\r\n\r\n" % len(payload)
        + payload + b"\r\n\r\n"
    )
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "m.warc").write_bytes(rec)
    r = read_warc_documents(spark, str(d)).first()
    assert r.title == 'The "Page"'
    assert r.html_lang == "en"


# ------------------------------------------- robots.txt awareness


_ROBOTS_TXT = """# crawl policy
User-agent: googlebot
Disallow: /private/

User-agent: *
User-agent: other-bot
Disallow: /search
Allow: /search/about
Disallow: /*?sort=
Disallow: /exact$
Disallow:
"""

_ROBOTS_URLS = [
    ("https://example.com/search", True),           # prefix disallow
    ("https://example.com/search/about", False),    # longer allow wins
    ("https://example.com/searches", True),         # prefix, no boundary (RFC)
    ("https://example.com/page?sort=asc", True),    # * wildcard
    ("https://example.com/exact", True),            # $ anchor hit
    ("https://example.com/exactly", False),         # $ anchor miss
    ("https://example.com/free", False),            # no rule matches
    ("https://other.com/anything", False),          # host has no robots.txt
    ("https://example.com/private/x", False),       # googlebot-only group
]


def _robots_frame(spark):
    return spark.createDataFrame(
        [("https://www.Example.com/robots.txt", _ROBOTS_TXT)],
        "url string, text string",
    )


def test_robots_rules_and_apply_semantics(spark):
    from cryo_spark.operators import robots as robots_ops

    rules = robots_ops.robots_rules(_robots_frame(spark), agent="mybot")
    got_rules = {
        (r.rule, r.prefix) for r in rules.collect()
    }
    # googlebot group excluded; empty Disallow dropped as a no-op
    assert got_rules == {
        ("disallow", "/search"),
        ("allow", "/search/about"),
        ("disallow", "/*?sort="),
        ("disallow", "/exact$"),
    }
    docs = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(_ROBOTS_URLS)],
        "i long, url string",
    )
    got = {
        r.i: r.robots_disallowed
        for r in robots_ops.apply_robots(docs, rules).collect()
    }
    assert got == {i: d for i, (_, d) in enumerate(_ROBOTS_URLS)}
    # drop=True removes exactly the disallowed docs and the flag column
    kept = robots_ops.apply_robots(docs, rules, drop=True)
    assert {r.i for r in kept.collect()} == {
        i for i, (_, d) in enumerate(_ROBOTS_URLS) if not d
    }
    assert "robots_disallowed" not in kept.columns


def test_robots_exact_agent_group_excludes_star(spark):
    """RFC 9309: when a host has a group naming the agent exactly, the
    * groups do NOT apply to that agent."""
    from cryo_spark.operators import robots as robots_ops

    rules = robots_ops.robots_rules(_robots_frame(spark), agent="GoogleBot")
    got = {(r.rule, r.prefix) for r in rules.collect()}
    assert got == {("disallow", "/private/")}  # star group ignored
    docs = spark.createDataFrame(
        [(0, "https://example.com/private/x"), (1, "https://example.com/search")],
        "i long, url string",
    )
    verdicts = {
        r.i: r.robots_disallowed
        for r in robots_ops.apply_robots(docs, rules).collect()
    }
    assert verdicts == {0: True, 1: False}


def _py_robots_rules(robots_texts, agent="*"):
    """Pure-Python reference parser (same documented semantics) — the
    differential oracle for the window/HOF Spark implementation."""
    import re as _re

    out = set()
    for host, text in robots_texts:
        groups, cur_agents, cur_rules, in_ua_run = [], [], [], False
        for raw in text.split("\n"):
            ln = raw.rstrip("\r")
            ln = _re.sub(r"#.*$", "", ln).strip()
            m = _re.match(r"^([A-Za-z\-]+)[ \t]*:(.*)$", ln)
            if not m:
                continue
            field, value = m.group(1).lower(), m.group(2).strip()
            if field == "user-agent":
                if not in_ua_run:
                    if cur_agents:
                        groups.append((cur_agents, cur_rules))
                    cur_agents, cur_rules = [], []
                    in_ua_run = True
                cur_agents.append(value.lower())
            elif field in ("allow", "disallow"):
                in_ua_run = False
                if value:
                    cur_rules.append((field, value))
        if cur_agents:
            groups.append((cur_agents, cur_rules))
        exact = [g for g in groups if agent.lower() in g[0]]
        chosen = exact or [g for g in groups if "*" in g[0]]
        for _, rules in chosen:
            for rule, prefix in rules:
                out.add((host, rule, prefix))
    return out


def test_robots_rules_python_reference_differential(spark):
    from cryo_spark.operators import robots as robots_ops

    adversarial = [
        ("a.com", _ROBOTS_TXT),
        # CRLF endings, tabs, mixed case fields, comment-only lines
        ("b.com", "USER-AGENT:\tmybot\r\n# note\r\nDISALLOW: /x\r\n"
                  "Allow:/x/ok\r\nSitemap: https://b.com/map.xml\r\n"),
        # two groups for the same agent merge; interleaved star group
        ("c.com", "User-agent: mybot\nDisallow: /one\n\n"
                  "User-agent: *\nDisallow: /star-only\n\n"
                  "User-agent: mybot\nDisallow: /two\n"),
        # rules before any group header are dropped
        ("d.com", "Disallow: /orphan\nUser-agent: mybot\nDisallow: /ok\n"),
        ("e.com", ""),
    ]
    df = spark.createDataFrame(
        [(f"https://{h}/robots.txt", t) for h, t in adversarial],
        "url string, text string",
    )
    got = {
        (r.host, r.rule, r.prefix)
        for r in robots_ops.robots_rules(df, agent="mybot").collect()
    }
    assert got == _py_robots_rules(adversarial, agent="mybot")
    assert ("c.com", "disallow", "/one") in got
    assert ("c.com", "disallow", "/two") in got
    assert ("c.com", "disallow", "/star-only") not in got
    assert ("d.com", "disallow", "/orphan") not in got


def test_robots_from_warc_end_to_end(spark, tmp_path):
    """The crawl's own robots.txt responses become the rules table and
    gate the crawl's documents — no second fetch, one broadcast join."""
    import gzip

    from cryo_spark.operators import robots as robots_ops
    from cryo_spark.sources.documents import read_warc

    def rec(payload: bytes, uri: str) -> bytes:
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + b"WARC-Date: 2026-08-14T00:00:00Z\r\n"
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload + b"\r\n\r\n"
        )

    robots_payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
        b"User-agent: *\nDisallow: /secret\n"
    )
    page = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<body><p>A paragraph long enough to pass extraction density"
        b" rules with room to spare.</p></body>"
    )
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "m.warc.gz").write_bytes(gzip.compress(
        rec(robots_payload, "https://s.test/robots.txt")
        + rec(page, "https://s.test/secret/doc")
        + rec(page, "https://s.test/public/doc")
    ))
    recs = read_warc(spark, str(d))
    rules = robots_ops.robots_rules_from_warc(recs, agent="mybot")
    docs = read_warc_documents(spark, str(d))
    flagged = {
        r.url: r.robots_disallowed
        for r in robots_ops.apply_robots(docs, rules).collect()
    }
    # the robots.txt body itself also lands as a text/plain document;
    # policy column flags the disallowed page only
    assert flagged["https://s.test/secret/doc"] is True
    assert flagged["https://s.test/public/doc"] is False


def test_apply_robots_plan_is_broadcast(spark):
    """The corpus side must not shuffle: rules aggregate on their own
    (host-count-sized) side and reach the docs via broadcast."""
    from cryo_spark.operators import robots as robots_ops

    rules = robots_ops.robots_rules(_robots_frame(spark), agent="mybot")
    docs = spark.createDataFrame(
        [(0, "https://example.com/x")], "i long, url string"
    )
    plan = (
        robots_ops.apply_robots(docs, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_pipeline_robots_stage_wired(spark):
    """robots_rules as a pipeline stage drops disallowed docs before
    any text processing, and the funnel reports the boundary."""
    from cryo_spark.operators import corpus, robots as robots_ops

    docs = _funnel_docs(spark)
    rules = robots_ops.robots_rules(
        spark.createDataFrame(
            [("https://site.example.com/robots.txt",
              "User-agent: *\nDisallow: /p/1\n")],
            "url string, text string",
        )
    )
    base = corpus.prepare_training_corpus(docs, url_col="url")
    gated = corpus.prepare_training_corpus(
        docs, url_col="url", robots_rules=rules
    )
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}
    gated_ids = {r.doc_id for r in gated.select("doc_id").collect()}
    assert gated_ids < base_ids
    # /p/1, /p/10..19 on site.example.com are the disallowed paths
    gone_urls = {
        r.url
        for r in docs.filter(F.col("doc_id").isin(base_ids - gated_ids))
        .select("url").collect()
    }
    assert gone_urls and all(
        "//site.example.com/p/1" in u for u in gone_urls
    )
    funnel = {
        r.stage: r
        for r in corpus.corpus_funnel(
            docs, url_col="url", robots_rules=rules
        ).collect()
    }
    assert "robots" in funnel
    assert funnel["robots"].docs_out < funnel["robots"].docs_in


# ------------------------------------------------- corpus CLI surface


def test_corpus_cli_dry_and_parquet_run(spark, tmp_path, capsys):
    import json

    from cryo_spark.api import main

    rc = main(["corpus", "--input", f"{SF_DIR}/documents.parquet",
               "--output", str(tmp_path / "x"), "--dry"])
    assert rc == 0
    assert '"pipeline"' in capsys.readouterr().out

    out = tmp_path / "run"
    rc = main(["corpus", "--input", f"{SF_DIR}/documents.parquet",
               "--output", str(out), "--budget", "100",
               "--shard-tokens", "5000"])
    assert rc == 0
    funnel = json.load(open(out / "funnel.json"))
    stages = [r["stage"] for r in funnel]
    assert stages[0] == "input" and stages[-1] == "split"
    assert funnel[0]["docs_in"] == 500  # sf0.001 documents table
    # budget stage really mixed down; shards written per split
    mix = next(r for r in funnel if r["stage"] == "temperature_mix")
    assert mix.get("docs_out") <= 110
    assert (out / "shards").is_dir()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_docs"] == funnel[-1]["docs_out"]


def test_corpus_cli_warc_with_robots(spark, tmp_path, capsys):
    import gzip
    import json

    from cryo_spark.api import main

    def rec(payload: bytes, uri: str) -> bytes:
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + b"WARC-Date: 2026-08-14T00:00:00Z\r\n"
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload + b"\r\n\r\n"
        )

    def page(i: int) -> bytes:
        return (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b'<body><div><a href="/">Home</a></div><p>The quick brown fox'
            b" jumps over the lazy dog and this sentence number %d carries"
            b" enough ordinary english prose to pass the quality and"
            b" language filters used by the corpus pipeline.</p></body>"
            % i
        )

    robots = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
              b"User-agent: *\nDisallow: /secret\n")
    raw = rec(robots, "https://s.test/robots.txt")
    for i in range(12):
        uri = (f"https://s.test/doc/{i}" if i % 3
               else f"https://s.test/secret/{i}")
        raw += rec(page(i), uri)
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "m.warc.gz").write_bytes(gzip.compress(raw))
    out = tmp_path / "out"
    rc = main(["corpus", "--input", str(d), "--format", "warc",
               "--output", str(out), "--main-content",
               "--robots-agent", "trainbot"])
    assert rc == 0
    funnel = {r["stage"]: r for r in json.load(open(out / "funnel.json"))}
    # 12 pages + the robots.txt doc itself = 13 in; 4 /secret/ docs
    # (i = 0, 3, 6, 9) dropped by the robots stage
    assert funnel["input"]["docs_in"] == 13
    assert funnel["robots"]["docs_in"] - funnel["robots"]["docs_out"] == 4
    kept = spark.read.parquet(str(out / "corpus"))
    assert kept.count() == funnel["split"]["docs_out"]


# ----------------------------------- round-10 self-audit hardening


def test_lang_and_meta_attrs_require_whitespace(spark):
    """\\b alone would let data-lang=/xml:lang=/data-content= spoof the
    attribute parses ('-' and ':' are word boundaries)."""
    cases = [
        ('<html data-lang="de"><body>x</body></html>', ""),
        ("<html xml:lang='fr'><body>x</body></html>", ""),
        ('<html xml:lang="fr" lang="fr"><body>x</body></html>', "fr"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, h string"
    )
    got = [
        r.l
        for r in df.select("i", html_ops.html_lang_expr("h").alias("l"))
        .orderBy("i").collect()
    ]
    assert got == [want for _, want in cases]
    # meta: data-content carrying 'noindex' must not flag the page
    p = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        '<meta name="robots" data-content="noindex"><body>x</body>'
    )
    df2 = spark.createDataFrame([(p,)], "p string")
    assert df2.select(html_ops.noindex_expr("p").alias("n")).first().n is False


def test_robots_mid_dollar_is_literal(spark):
    """RFC 9309: '$' anchors only at rule end; mid-rule it is a
    literal octet, not a never-matching mid-pattern anchor."""
    from cryo_spark.operators import robots as robots_ops

    rules = robots_ops.robots_rules(
        spark.createDataFrame(
            [("https://d.test/robots.txt",
              "User-agent: *\nDisallow: /a$b\nDisallow: /end$\n")],
            "url string, text string",
        )
    )
    docs = spark.createDataFrame(
        [(0, "https://d.test/a$b/page"), (1, "https://d.test/end"),
         (2, "https://d.test/endless")],
        "i long, url string",
    )
    got = {
        r.i: r.robots_disallowed
        for r in robots_ops.apply_robots(docs, rules).collect()
    }
    assert got == {0: True, 1: True, 2: False}


def test_apply_robots_preserves_caller_host_column(spark):
    from cryo_spark.operators import robots as robots_ops

    rules = robots_ops.robots_rules(_robots_frame(spark), agent="mybot")
    docs = spark.createDataFrame(
        [(0, "https://example.com/search", "my-own-host-value")],
        "i long, url string, host string",
    )
    out = robots_ops.apply_robots(docs, rules).first()
    assert out.host == "my-own-host-value"
    assert out.robots_disallowed is True


# ----------------------- wire-format bodies + HTTP status handling


def test_decode_payload_gzip_body():
    import gzip as _gz

    body = _gz.compress("compressed café page".encode())
    raw = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Content-Type: text/plain; charset=utf-8\r\n\r\n" + body
    )
    out = _decode_payload(raw, "response")
    assert out.endswith("compressed café page")
    assert out.startswith("HTTP/1.1 200 OK")


def test_decode_payload_deflate_raw_and_zlib():
    import zlib

    text = b"deflate body text"
    for blob in (
        zlib.compress(text)[2:-4],  # raw deflate (RFC form)
        zlib.compress(text),        # zlib-wrapped ("deflate means zlib")
    ):
        raw = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + blob
        )
        assert _decode_payload(raw, "response").endswith("deflate body text")


def test_decode_payload_chunked_and_combined():
    import gzip as _gz

    gz = _gz.compress(b"chunked gzip body")
    chunks = (
        f"{len(gz[:7]):x}\r\n".encode() + gz[:7] + b"\r\n"
        + f"{len(gz[7:]):x}\r\n".encode() + gz[7:] + b"\r\n0\r\n\r\n"
    )
    raw = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + chunks
    )
    assert _decode_payload(raw, "response").endswith("chunked gzip body")
    # plain chunked without compression
    raw2 = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    )
    assert _decode_payload(raw2, "response").endswith("hello world")


def test_decode_payload_corrupt_and_bomb_fall_back():
    import zlib

    # corrupt stream: raw bytes flow through, never raises
    raw = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot-gzip"
    assert _decode_payload(raw, "response").endswith("not-gzip")
    # decompression bomb past the cap: raw bytes kept, never OOMs
    bomb = zlib.compress(b"x" * 10_000_000)
    raw2 = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + bomb
    )
    out = _decode_payload(raw2, "response", max_bytes=1000)
    assert len(out) < 2 * len(bomb) + 200  # not the 10 MB expansion


def test_extract_documents_filters_error_pages(spark):
    ok = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
          "<p>Real page body text.</p>")
    nf = ("HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n"
          "<p>Pretty error page chrome.</p>")
    raw = "no status line raw document"
    df = spark.createDataFrame(
        [("response", p) for p in (ok, nf, raw)],
        "warc_type string, payload string",
    )
    texts = {r.text for r in html_ops.extract_documents(df).collect()}
    # 404 body dropped by default; raw (status-less) passes
    assert texts == {"Real page body text.", "no status line raw document"}
    all_texts = {
        r.text
        for r in html_ops.extract_documents(df, status_range=None).collect()
    }
    assert "Pretty error page chrome." in all_texts


def test_http_status_expr_and_sql_parity(spark):
    import pandas as pd

    payloads = [
        "HTTP/1.1 200 OK\r\n\r\nx",
        "HTTP/1.0 404 Not Found\r\n\r\nx",
        "HTTP/2 301\r\n\r\nx",
        "not http at all",
    ]
    pdf = pd.DataFrame(
        [(i, p) for i, p in enumerate(payloads)], columns=["i", "p"]
    )
    got = [
        r.s
        for r in spark.createDataFrame(pdf)
        .select("i", html_ops.http_status_expr("p").alias("s"))
        .orderBy("i").collect()
    ]
    assert got == [200, 404, 301, None]
    con = duckdb.connect()
    con.register("t", pdf)
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {html_ops.http_status_sql('p')} FROM t ORDER BY i"
        ).fetchall()
    ]
    con.close()
    assert got == want


def test_read_warc_documents_surfaces_status(spark, tmp_path):
    def rec(payload: bytes, uri: str) -> bytes:
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + b"WARC-Date: 2026-08-14T00:00:00Z\r\n"
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload + b"\r\n\r\n"
        )

    import gzip as _gz

    gz_body = _gz.compress(
        b"<p>A gzip-encoded page body with plenty of ordinary prose to"
        b" pass the extraction rules.</p>"
    )
    ok = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
          b"Content-Encoding: gzip\r\n\r\n" + gz_body)
    nf = (b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n"
          b"<p>Error page body that must not land in the corpus.</p>")
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "m.warc").write_bytes(
        rec(ok, "https://w.test/ok") + rec(nf, "https://w.test/missing")
    )
    docs = read_warc_documents(spark, str(d)).collect()
    assert [r.url for r in docs] == ["https://w.test/ok"]  # 404 dropped
    assert docs[0].status == 200
    assert docs[0].text.startswith("A gzip-encoded page body")


# ------------------------------- good-neighbor smoothing (jusText)


_SMOOTH_HTML = """<body>
<div><a href="/">Home</a> | <a href="/a">About</a> | <a href="/c">Contact</a></div>
<h1>Introduction</h1>
<p>This opening paragraph of the article is comfortably longer than the minimum content line length.</p>
<div><a href="/x">x</a> <a href="/y">y</a></div>
<h2>Archive</h2>
<div><a href="/1">one</a> <a href="/2">two</a></div>
<p>Closing paragraph also long enough to count as core content by the density rule.</p>
</body>"""


def _py_main_content_smooth(html: str, max_ld: float = 0.4,
                            min_len: int = 30) -> str:
    import re as _re

    from cryo_spark.operators.html import (
        _ANCHOR_RE, _ENTITY_STEPS, _M1, _M2, _MARKS, _SENTENCE_END,
        _TAG_STEPS, _TRIM_STEPS, _WS_STEPS,
    )

    c = _re.sub(f"[{_MARKS}]", "", html)
    for pat, rep in _TAG_STEPS[:3]:
        c = _re.sub(pat, rep, c)
    c = _re.sub(_ANCHOR_RE, _M1 + r"\1" + _M2, c)
    for pat, rep in _TAG_STEPS[3:]:
        c = _re.sub(pat, rep, c)
    for lit, rep in _ENTITY_STEPS:
        c = c.replace(lit, rep)
    for pat, rep in _WS_STEPS:
        c = _re.sub(pat, rep, c)
    lines = c.split("\n")

    def feats(ln):
        stripped = ln.replace(_M1, "").replace(_M2, "")
        tc = len(stripped)
        no_anchor = _re.sub(f"{_M1}[^{_M2}]*{_M2}", "", ln)
        lc = tc - len(no_anchor.replace(_M1, "").replace(_M2, ""))
        return stripped, tc, lc

    core = []
    for ln in lines:
        _, tc, lc = feats(ln)
        core.append(tc >= min_len and lc <= max_ld * tc)
    kept = []
    for i, ln in enumerate(lines):
        stripped, tc, lc = feats(ln)
        short = 0 < tc < min_len and lc == 0
        sent = short and _re.search(_SENTENCE_END, stripped)
        neigh = short and (
            (i > 0 and core[i - 1]) or (i + 1 < len(lines) and core[i + 1])
        )
        if core[i] or sent or neigh:
            kept.append(stripped)
    c = "\n".join(kept)
    for pat, rep in _TRIM_STEPS:
        c = _re.sub(pat, rep, c)
    return c


def test_main_content_smoothing_rescues_adjacent_headings(spark):
    df = spark.createDataFrame([(_SMOOTH_HTML,)], "text string")
    base = html_ops.extract_main_content(df, "text", "o").first().o
    sm = html_ops.extract_main_content(
        df, "text", "o", smooth=True
    ).first().o
    # heading above the article body: rescued only by smoothing
    assert "Introduction" not in base
    assert sm.splitlines()[0] == "Introduction"
    # short heading surrounded by link chrome stays dropped either way
    assert "Archive" not in base and "Archive" not in sm
    # chrome never leaks
    for t in ("Home", "About", "one", "two"):
        assert t not in sm


def test_main_content_smooth_python_reference_differential(spark):
    cases = [*_MC_CASES, _SMOOTH_HTML]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(cases)], "i long, text string"
    )
    got = {
        r.i: r.o
        for r in html_ops.extract_main_content(
            df, "text", "o", smooth=True
        ).select("i", "o").collect()
    }
    for i, h in enumerate(cases):
        assert got[i] == _py_main_content_smooth(h), f"case {i}"


# --------------------------------------- streaming WARC ingestion


def test_warc_per_record_gzip_members_and_batching(spark, tmp_path):
    """The CommonCrawl layout — one gzip member PER RECORD,
    concatenated — must decode across member boundaries, and a member
    with more records than one output batch (2048) must land complete
    through the chunked yields."""
    import gzip as _gz

    def rec(i: int) -> bytes:
        payload = f"payload number {i}".encode()
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: https://m.test/{i}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload + b"\r\n\r\n"
        )

    n = 3000  # > one 2048-record output batch
    d = tmp_path / "crawl"
    d.mkdir()
    # per-record members, the real .warc.gz shape
    (d / "m.warc.gz").write_bytes(
        b"".join(_gz.compress(rec(i)) for i in range(n))
    )
    from cryo_spark.sources.documents import read_warc

    out = read_warc(spark, str(d))
    assert out.count() == n
    rows = out.orderBy("record_idx").collect()
    assert rows[0].payload == "payload number 0"
    assert rows[-1].payload == f"payload number {n - 1}"
    assert rows[-1].record_idx == n - 1
    # ids stay the deterministic (path, record_idx) hash
    assert len({r.doc_id for r in rows}) == n


def test_warc_streaming_memory_is_record_bounded():
    """A member far larger than the per-record cap parses fine when
    its individual records are small — the cap guards RECORDS, the
    stream never materializes the member."""
    from cryo_spark.sources.documents import (
        _gunzip_chunks, _iter_warc_stream,
    )

    def rec(i: int) -> bytes:
        payload = b"x" * 100
        return (
            b"WARC/1.0\r\nWARC-Type: resource\r\n"
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload + b"\r\n\r\n"
        )

    def chunks():
        for i in range(2000):
            yield rec(i)

    # total stream = ~250 KB with max_record_bytes=1000: per-record
    # cap does NOT trip (records are 100 B), count is exact
    n = sum(
        1 for _ in _iter_warc_stream(chunks(), "f.warc", max_record_bytes=1000)
    )
    assert n == 2000


# ----------------------------- review-pass regressions (round 10)


def test_smooth_last_line_short_chrome_no_ansi_crash(spark):
    """A doc whose LAST rendered line is short, link-free and
    unpunctuated (footer chrome) must not blow up the neighbor lookup
    under ANSI mode (element_at past the array end throws; the lookups
    go through try_element_at)."""
    html = (
        "<p>Leading paragraph with plenty of ordinary prose to qualify"
        " as core content under the density rule.</p>"
        "<p>Menu</p><p>Contact</p>"
    )
    df = spark.createDataFrame([(html,)], "text string")
    out = html_ops.extract_main_content(df, "text", "o", smooth=True).first().o
    # 'Menu' is adjacent to core -> rescued; trailing 'Contact' is not
    assert out.splitlines()[0].startswith("Leading paragraph")
    assert "Menu" in out and "Contact" not in out
    # and the python reference agrees byte-for-byte
    assert out == _py_main_content_smooth(html)
    # first-line heading (prev lookup at index 0) also safe
    html2 = "<h1>Hi</h1><p>Body text long enough to pass the minimum content rule.</p>"
    df2 = spark.createDataFrame([(html2,)], "text string")
    out2 = html_ops.extract_main_content(df2, "text", "o", smooth=True).first().o
    assert out2 == _py_main_content_smooth(html2)


def test_dechunk_falls_back_on_unchunked_body():
    """A Transfer-Encoding: chunked header over a NON-chunk-framed
    stored body (stored-decoded corpora, mislabeling servers) must
    keep the bytes as captured, not wipe the document to ''."""
    body = b"<html><body>Hello decoded world</body></html>"
    raw = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
        b"Content-Type: text/html\r\n\r\n" + body
    )
    assert _decode_payload(raw, "response").endswith(body.decode())
    # no line structure at all: same fallback
    raw2 = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nplainblob"
    )
    assert _decode_payload(raw2, "response").endswith("plainblob")


def test_prepare_with_funnel_single_chain_consistency(spark):
    """prepare_with_funnel's final frame and funnel report come from
    one staged chain and agree with the separately-composed calls."""
    from cryo_spark.operators import corpus

    docs = _funnel_docs(spark)
    final, funnel = corpus.prepare_with_funnel(docs, **FUNNEL_KW)
    rows = {r.stage: r for r in funnel.collect()}
    assert rows["split"].docs_out == final.count()
    ref = corpus.prepare_training_corpus(docs, **FUNNEL_KW)
    assert {r.doc_id for r in final.select("doc_id").collect()} == {
        r.doc_id for r in ref.select("doc_id").collect()
    }


def test_streaming_candidate_sink_rejects_old_flat_layout(spark, tmp_path):
    import pandas as pd

    from cryo_spark.streaming import _near_dup_batch

    out = tmp_path / "cands"
    out.mkdir()
    (out / "part-00000-old.snappy.parquet").write_bytes(b"x")
    batch = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["hello world text"]})
    )
    with pytest.raises(ValueError, match="pre-round-10 append layout"):
        _near_dup_batch(
            batch, 0, index_table=str(tmp_path / "idx"),
            out_path=str(out),
        )


def test_corpus_cli_rejects_warc_flags_for_parquet(tmp_path, capsys):
    from cryo_spark.api import main

    rc = main(["corpus", "--input", f"{SF_DIR}/documents.parquet",
               "--output", str(tmp_path / "o"), "--robots-agent", "bot"])
    assert rc == 2
    assert "--robots-agent" in capsys.readouterr().err


def test_warc_payload_digest_surfaced(spark, tmp_path):
    """WARC-Payload-Digest (the crawler's own content hash) lands as a
    column — crawl-level exact dedup can key on it with zero text
    hashing; records without the header carry NULL."""
    payload = b"HTTP/1.1 200 OK\r\n\r\nhello"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://dg.test/a\r\n"
        b"WARC-Payload-Digest: sha1:ABCDEF0123456789\r\n"
        + b"Content-Length: %d\r\n\r\n" % len(payload)
        + payload + b"\r\n\r\n"
    )
    rec2 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://dg.test/b\r\n"
        + b"Content-Length: %d\r\n\r\n" % len(payload)
        + payload + b"\r\n\r\n"
    )
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "m.warc").write_bytes(rec + rec2)
    from cryo_spark.sources.documents import read_warc

    rows = {r.target_uri: r for r in read_warc(spark, str(d)).collect()}
    assert rows["https://dg.test/a"].payload_digest == "sha1:ABCDEF0123456789"
    assert rows["https://dg.test/b"].payload_digest is None


def test_extract_documents_drops_mojibake_binaries(spark, tmp_path):
    """A binary payload served with NO Content-Type header (treated as
    HTML by the '' rule) decodes to replacement-char mojibake — the
    density guard drops it; ordinary text with a stray bad byte
    survives."""
    import gzip as _gz

    pdf_ish = b"HTTP/1.1 200 OK\r\nServer: x\r\n\r\n%PDF-1.4 " + bytes(
        range(128, 256)
    ) * 20
    ok = (
        b"HTTP/1.1 200 OK\r\nServer: x\r\n\r\n<p>Mostly fine text with "
        b"one stray byte \xff in a long ordinary paragraph that keeps "
        b"the replacement density far under the threshold.</p>"
    )
    def rec(payload: bytes, uri: str) -> bytes:
        return (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload + b"\r\n\r\n"
        )

    d = tmp_path / "crawl"
    d.mkdir()
    (d / "m.warc.gz").write_bytes(
        _gz.compress(rec(pdf_ish, "https://b.test/pdf")
                     + rec(ok, "https://b.test/ok"))
    )
    urls = {r.url for r in read_warc_documents(spark, str(d)).collect()}
    assert urls == {"https://b.test/ok"}


# --------------------------- template skeletons + sitemap surfacing


def test_html_skeleton_groups_templates(spark):
    """Same template, different text -> same skeleton; different
    layout -> different skeleton; script bodies don't perturb it."""
    import pandas as pd

    a1 = ('<html><head><title>A</title></head><body><div class="x">'
          "<p>first article text</p></div></body></html>")
    a2 = ('<html><head><title>B</title><script>var q="<td>";</script>'
          '</head><body><div class="y"><p>totally different words</p>'
          "</div></body></html>")
    b = "<html><body><ul><li>x</li><li>y</li></ul></body></html>"
    pdf = pd.DataFrame({"i": [0, 1, 2], "h": [a1, a2, b]})
    got = [
        r.s
        for r in spark.createDataFrame(pdf)
        .select("i", html_ops.html_skeleton_expr("h").alias("s"))
        .orderBy("i").collect()
    ]
    # a2's extra <script> is stripped pre-hash, so a1/a2 share a
    # skeleton despite different text and attribute values
    assert got[0] == got[1] != got[2]
    con = duckdb.connect()
    con.register("t", pdf)
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {html_ops.html_skeleton_sql('h')} FROM t ORDER BY i"
        ).fetchall()
    ]
    con.close()
    assert got == want


def test_robots_sitemaps_extraction(spark):
    from cryo_spark.operators import robots as robots_ops

    txt = ("User-agent: *\nDisallow: /x\n"
           "Sitemap: https://a.com/map.xml\r\n"
           "sitemap:\thttps://a.com/map2.xml\n"
           "# Sitemap: https://a.com/commented.xml is just a comment? no"
           "\nSitemap: https://a.com/map.xml\n")
    df = spark.createDataFrame(
        [("https://www.A.com/robots.txt", txt)], "url string, text string"
    )
    got = {
        (r.host, r.sitemap_url)
        for r in robots_ops.robots_sitemaps(df).collect()
    }
    assert got == {
        ("a.com", "https://a.com/map.xml"),
        ("a.com", "https://a.com/map2.xml"),
    }


# --------------------------- CCNet-shaped bigram-LM perplexity filter


def test_corpus_pipeline_lm_filter_stage(spark):
    """The stage 1d perplexity filter has no SQL oracle (ln + approx
    quantile), so its anchor is composition laws on the staged chain:
    keep-all is the identity, the drop set is score-separated from the
    keep set, unscored (bigram-less) docs are kept, and the stage only
    ever shrinks the doc set."""
    from cryo_spark.operators import text as text_ops
    from cryo_spark.operators.corpus import (
        _corpus_stages,
        prepare_training_corpus,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ids_base = {
        r.doc_id
        for r in prepare_training_corpus(docs).select("doc_id").collect()
    }

    # lm_keep_frac=1.0 → threshold at the min score, drop is
    # strictly-below → identity
    ids_all = {
        r.doc_id
        for r in prepare_training_corpus(docs, lm_keep_frac=1.0)
        .select("doc_id")
        .collect()
    }
    assert ids_all == ids_base

    stages = {
        name: frame
        for name, frame, _ in _corpus_stages(docs, lm_keep_frac=0.5)
    }
    ids_in = {
        r.doc_id
        for r in stages["quality_lang_exact"].select("doc_id").collect()
    }
    ids_out = {
        r.doc_id for r in stages["lm_filter"].select("doc_id").collect()
    }
    assert ids_out < ids_in  # proper shrink at 0.5 on this corpus

    # independent rescoring of the stage's actual input: every dropped
    # doc scores strictly below every kept scored doc (threshold
    # separation), and every unscored doc is kept
    scores = {
        r.doc_id: r.avg_logp
        for r in text_ops.ngram_lm_score(
            stages["quality_lang_exact"]
        ).collect()
    }
    dropped = ids_in - ids_out
    assert dropped <= set(scores)  # unscored docs can never drop
    kept_scored = [scores[i] for i in ids_out if i in scores]
    assert max(scores[i] for i in dropped) < min(kept_scored)
    # roughly half the scored docs survive (quantile is element-exact
    # at this size; ties can only widen the kept side)
    assert len(kept_scored) >= len(scores) // 2

    for bad in (0.0, 1.5, -0.2):
        with pytest.raises(ValueError):
            prepare_training_corpus(docs, lm_keep_frac=bad)


def test_corpus_funnel_has_lm_filter_boundary(spark):
    from cryo_spark.operators.corpus import corpus_funnel, release_stage_storage

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fun = {r.stage: r for r in corpus_funnel(docs, lm_keep_frac=0.5).collect()}
    assert "lm_filter" in fun
    row = fun["lm_filter"]
    assert row.docs_out < row.docs_in
    assert row.tokens_out <= row.tokens_in
    # boundary stitching: lm_filter's input is the previous stage's out
    prev = fun["quality_lang_exact"]
    assert row.docs_in == prev.docs_out
    release_stage_storage(docs)

    base = {r.stage for r in corpus_funnel(docs).collect()}
    assert "lm_filter" not in base
    release_stage_storage(docs)


def test_corpus_cli_packed_export(spark, tmp_path, capsys):
    """--pack-budget writes trainer-ready packed sequences: split-pure
    bins of token arrays with conserved token totals; --bpe-merges
    swaps in the corpus-trained tokenizer; --bpe-merges alone errors."""
    import json

    from cryo_spark.api import main

    out = tmp_path / "packed"
    rc = main(["corpus", "--input", f"{SF_DIR}/documents.parquet",
               "--output", str(out), "--pack-budget", "256"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    bins = spark.read.parquet(str(out / "packed"))
    rows = bins.collect()
    assert summary["n_bins"] == len(rows)
    assert summary["n_docs"] == sum(r.n_docs for r in rows)
    assert summary["n_tokens"] == sum(len(r.tokens) for r in rows)
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert all(len(r.tokens) <= 256 or r.n_docs == 1 for r in rows)
    # funnel docs survive into exactly one bin each
    funnel = json.load(open(out / "funnel.json"))
    assert summary["n_docs"] == funnel[-1]["docs_out"]

    out2 = tmp_path / "bpe"
    rc = main(["corpus", "--input", f"{SF_DIR}/documents.parquet",
               "--output", str(out2), "--pack-budget", "256",
               "--bpe-merges", "50", "--no-funnel"])
    assert rc == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["n_docs"] == summary["n_docs"]  # same corpus, same docs

    rc = main(["corpus", "--input", f"{SF_DIR}/documents.parquet",
               "--output", str(tmp_path / "bad"), "--bpe-merges", "10"])
    assert rc == 2
    assert "requires --pack-budget" in capsys.readouterr().err


def test_corpus_cli_packed_shards(spark, tmp_path, capsys):
    """--pack-budget + --shard-tokens: packed bins land in
    split/shard directories with in-shard token sums bounded."""
    import json

    from cryo_spark.api import main

    out = tmp_path / "ps"
    rc = main(["corpus", "--input", f"{SF_DIR}/documents.parquet",
               "--output", str(out), "--pack-budget", "256",
               "--shard-tokens", "3000", "--no-funnel"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["shards"]  # at least one split has shards
    shards = spark.read.parquet(str(out / "shards"))
    assert {"split", "shard", "bin_id", "tokens"} <= set(shards.columns)
    per = {
        (r.split, r.shard): r.t
        for r in shards.groupBy("split", "shard")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    # every shard except possibly a split's last respects the budget
    # up to one bin of overshoot (exclusive-prefix assignment)
    assert all(t <= 3000 + 256 for t in per.values())


# -------------------------- data-constrained (epoch) temperature mix


def _epoch_docs(spark):
    rows = [(i, "big") for i in range(100)] + [
        (1000 + i, "small") for i in range(10)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_epoch_mix_matches_duckdb(spark):
    from cryo_spark.operators.sampling import epoch_mix, epoch_mix_sql

    df = _epoch_docs(spark)
    got = sorted(
        (r.doc_id, r.source, r.epoch)
        for r in epoch_mix(df, budget=60, alpha=0.3).collect()
    )
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = sorted(
        map(
            tuple,
            con.execute(
                epoch_mix_sql("t", budget=60, alpha=0.3)
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 0


def test_epoch_mix_upsampling_laws(spark):
    from cryo_spark.operators.sampling import epoch_mix, temperature_mix

    df = _epoch_docs(spark)
    out = epoch_mix(df, budget=60, alpha=0.3, max_epochs=4).collect()
    # quotas: alpha=0.3 upweights 'small' past its 10 docs → repeats
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault((r.doc_id, r.source), []).append(r.epoch)
    copies = {k: sorted(v) for k, v in by_doc.items()}
    assert all(v == list(range(len(v))) for v in copies.values())
    assert max(len(v) for v in copies.values()) >= 2  # really upsampled
    assert all(len(v) <= 4 for v in copies.values())  # epoch cap
    # realized per-source totals equal the capped quotas exactly
    import collections

    per_src = collections.Counter(s for (_, s), v in copies.items() for _ in v)
    c = {"big": 100, "small": 10}
    z = sum(n ** 0.3 for n in c.values())
    for s, n in c.items():
        assert per_src[s] == min(round(60 * n ** 0.3 / z), 4 * n)

    # max_epochs=1 degenerates to temperature_mix's doc set, epoch 0
    one = epoch_mix(df, budget=60, alpha=0.3, max_epochs=1).collect()
    assert all(r.epoch == 0 for r in one)
    tm = temperature_mix(df, budget=60, alpha=0.3)
    assert {r.doc_id for r in one} == {r.doc_id for r in tm.collect()}

    with pytest.raises(ValueError):
        epoch_mix(df, budget=60, max_epochs=0)


# --------------------------------------- token-id encoding + vocab


def test_build_vocab_and_encode_ids_roundtrip(spark):
    from cryo_spark.operators.tokenizer import build_vocab, encode_ids

    df = spark.createDataFrame(
        [(1, ["a", "b", "a", "c"]), (2, ["b", "a"]), (3, [])],
        "doc_id long, tokens array<string>",
    )
    vocab = build_vocab(df)
    # frequency-ranked, ties lexicographic: a(3)=0, b(2)=1, c(1)=2
    assert vocab == {"a": 0, "b": 1, "c": 2}
    assert build_vocab(df) == vocab  # deterministic

    enc = {r.doc_id: r for r in encode_ids(df, vocab).collect()}
    assert list(enc[1].token_ids) == [0, 1, 0, 2]
    assert list(enc[2].token_ids) == [1, 0]
    assert list(enc[3].token_ids) == []
    # alignment: ids decode back to the token strings
    inv = {i: t for t, i in vocab.items()}
    for r in enc.values():
        assert [inv[i] for i in r.token_ids] == list(r.tokens)

    # unknown tokens get the one-past-the-table id, never aliased
    df2 = spark.createDataFrame(
        [(9, ["a", "zz"])], "doc_id long, tokens array<string>"
    )
    got = encode_ids(df2, vocab).first()
    assert list(got.token_ids) == [0, len(vocab)]
    got = encode_ids(df2, vocab, unk_id=-1).first()
    assert list(got.token_ids) == [0, -1]


def test_corpus_cli_packed_token_ids(spark, tmp_path, capsys):
    """--token-ids writes vocab.json and id arrays aligned with the
    packed token arrays; --token-ids without --pack-budget errors."""
    import json

    from cryo_spark.api import main

    out = tmp_path / "ids"
    rc = main(["corpus", "--input", f"{SF_DIR}/documents.parquet",
               "--output", str(out), "--pack-budget", "256",
               "--token-ids", "--no-funnel"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    vocab = json.load(open(summary["vocab"]))
    assert summary["vocab_size"] == len(vocab) > 0
    bins = spark.read.parquet(str(out / "packed")).collect()
    inv = {i: t for t, i in vocab.items()}
    for b in bins:
        assert len(b.token_ids) == len(b.tokens)
        # every id decodes to its aligned token (vocab built on this
        # corpus: no unks possible)
        assert [inv[i] for i in b.token_ids] == list(b.tokens)

    rc = main(["corpus", "--input", f"{SF_DIR}/documents.parquet",
               "--output", str(tmp_path / "bad"), "--token-ids"])
    assert rc == 2
    assert "requires --pack-budget" in capsys.readouterr().err


def test_prepare_training_corpus_epoch_mix_oracle(spark):
    """Pipeline with max_epochs equals the identical CTE chain in
    DuckDB end to end (epoch_mix is oracle-exact, unlike the
    pipeline-only knobs), repeats really happen at an
    over-corpus budget, and every copy of a doc shares one split."""
    from cryo_spark.operators.corpus import (
        corpus_funnel,
        prepare_training_corpus,
        prepare_training_corpus_sql,
        release_stage_storage,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kw = dict(budget=900, alpha=1.0, max_epochs=3)
    out = prepare_training_corpus(docs, **kw)
    pdf = out.toPandas()

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = con.sql(
        prepare_training_corpus_sql("documents", **kw)
    ).df()
    con.close()

    def canon(p):
        p = p[sorted(p.columns)]
        return sorted(map(tuple, p.itertuples(index=False)))

    assert canon(pdf) == canon(want) and len(pdf) > 0
    assert "epoch" in pdf.columns
    assert pdf["epoch"].max() >= 1  # budget 900 > survivors: repeats ran
    # leakage law: all copies of a doc land in one split
    assert (pdf.groupby("doc_id")["split"].nunique() == 1).all()

    fun = {r.stage for r in corpus_funnel(docs, **kw).collect()}
    assert "epoch_mix" in fun and "temperature_mix" not in fun
    release_stage_storage(docs)


def test_corpus_cli_max_epochs(tmp_path, capsys):
    from cryo_spark.api import main

    rc = main(["corpus", "--input", f"{SF_DIR}/documents.parquet",
               "--output", str(tmp_path / "bad"), "--max-epochs", "3"])
    assert rc == 2
    assert "requires --budget" in capsys.readouterr().err


def test_corpus_cli_max_epochs_with_pack_budget(spark, tmp_path, capsys):
    """Review regression: --max-epochs + --pack-budget must pack each
    (doc, epoch) copy exactly once — the doc_id-only join would
    cross-multiply k copies into k^2 bin memberships. Token totals
    must equal (copies x per-doc tokens) exactly."""
    import json

    from cryo_spark.api import main

    out = tmp_path / "ep"
    rc = main(["corpus", "--input", f"{SF_DIR}/documents.parquet",
               "--output", str(out), "--budget", "900", "--alpha", "1.0",
               "--max-epochs", "3", "--pack-budget", "256",
               "--no-funnel"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    bins = spark.read.parquet(str(out / "packed"))
    rows = bins.collect()
    # identity is (doc_id, epoch): every copy appears exactly once
    members = [
        (m.doc_id, m.epoch) for b in rows for m in b.doc_ids
    ]
    assert len(members) == len(set(members))
    assert summary["n_docs"] == len(members)
    by_doc: dict = {}
    for d, e in members:
        by_doc.setdefault(d, []).append(e)
    assert any(len(v) > 1 for v in by_doc.values())  # upsampling ran
    assert all(sorted(v) == list(range(len(v))) for v in by_doc.values())
    # token conservation: n_tokens summed over bins == sum over copies
    # of the doc's token count (k copies -> exactly k x tokens)
    from cryo_spark.operators.corpus import prepare_training_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = prepare_training_corpus(
        docs, budget=900, alpha=1.0, max_epochs=3
    ).select(
        "doc_id",
        F.size(F.expr(r"regexp_extract_all(text, '\\w+|[^\\w\\s]', 0)"))
        .alias("nt"),
    )
    want = sum(r.nt for r in base.collect())
    assert summary["n_tokens"] == want


def test_pack_bins_string_ids_not_dropped(spark):
    """Review regression: non-numeric ids must survive — the old
    cast('long') turned string doc ids into NULL join keys and
    silently emptied the result."""
    from cryo_spark.operators.seqprep import pack_bins

    docs = spark.createDataFrame(
        [("u1", ["a", "b"]), ("u2", ["c"])],
        "doc_id string, tokens array<string>",
    )
    rows = pack_bins(docs, budget=8).collect()
    got = sorted(d for b in rows for d in b.doc_ids)
    assert got == ["u1", "u2"]


def test_assign_shards_composite_id_deterministic(spark):
    """Composite (doc_id, epoch) identity: duplicate doc_ids no
    longer tie on the ordering key, so shard assignment is stable
    across runs and partitionings."""
    from cryo_spark.operators.shards import assign_shards

    rows = [(i, e, "train", 7) for i in range(20) for e in range(3)]
    df = spark.createDataFrame(
        rows, "doc_id long, epoch int, split string, n_tokens long"
    )
    a = {
        (r.doc_id, r.epoch): r.shard
        for r in assign_shards(df, 40, id_col=["doc_id", "epoch"]).collect()
    }
    b = {
        (r.doc_id, r.epoch): r.shard
        for r in assign_shards(
            df.repartition(7), 40, id_col=["doc_id", "epoch"]
        ).collect()
    }
    assert a == b and len(a) == len(rows)


def test_build_vocab_max_size_caps_and_unks(spark):
    from cryo_spark.operators.tokenizer import build_vocab, encode_ids

    df = spark.createDataFrame(
        [(1, ["a", "a", "a", "b", "b", "c"])],
        "doc_id long, tokens array<string>",
    )
    vocab = build_vocab(df, max_size=2)
    assert vocab == {"a": 0, "b": 1}
    got = encode_ids(df, vocab).first()
    assert list(got.token_ids) == [0, 0, 0, 1, 1, 2]  # c -> unk=len
