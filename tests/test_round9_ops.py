"""Round-9 operators: WARC payload → clean text (HTTP split +
HTML→text) and framing/charset/size-guard hardening of the WARC
reader. (URL blocklist filtering and the pipeline funnel report
landed in round 10 — see test_round10_ops.py.)"""

from __future__ import annotations

import gzip

import duckdb
import pytest
from pyspark.sql import functions as F

from cryo_spark.operators import html as html_ops
from cryo_spark.sources.documents import (
    _parse_warc_bytes,
    read_warc,
    read_warc_documents,
)

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------- WARC framing fixes


def _warc_record(payload: bytes, uri: str, sep: bytes = b"\r\n",
                 extra: bytes = b"") -> bytes:
    return (
        b"WARC/1.0" + sep
        + b"WARC-Type: response" + sep
        + f"WARC-Target-URI: {uri}".encode() + sep
        + b"WARC-Date: 2026-08-14T00:00:00Z" + sep
        + extra
        + f"Content-Length: {len(payload)}".encode() + sep
        + sep + payload + sep + sep
    )


def test_lf_framed_record_with_crlf_blank_in_payload():
    """ADVICE r8 (medium): an LF-framed WARC header whose payload
    contains a CRLF blank line (any HTTP response) must end the header
    at the LF blank line — the old code found the later \\r\\n\\r\\n
    first and mis-framed every subsequent record."""
    p1 = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhello one"
    p2 = b"second payload"
    raw = _warc_record(p1, "https://a.test/x", sep=b"\n") + _warc_record(
        p2, "https://a.test/y", sep=b"\n"
    )
    out = _parse_warc_bytes(raw, "f.warc")
    assert len(out) == 2
    assert out[0][3] == "https://a.test/x"
    assert out[0][6] == p1.decode()
    assert out[1][3] == "https://a.test/y"
    assert out[1][6] == p2.decode()


def test_crlf_framed_record_unaffected_by_lf_pair_in_payload():
    # CRLF header, payload contains a bare \n\n before any CRLF pair:
    # the header boundary must still be the CRLF blank line
    p = b"line1\n\nline2"
    raw = _warc_record(p, "https://a.test/z", sep=b"\r\n")
    out = _parse_warc_bytes(raw, "f.warc")
    assert len(out) == 1
    assert out[0][6] == p.decode()


def test_member_size_guard_rejects_oversized(tmp_path):
    raw = _warc_record(b"x" * 100, "https://a.test/big")
    with pytest.raises(ValueError, match="max_member_bytes"):
        _parse_warc_bytes(raw, "big.warc", max_member_bytes=50)
    # a gzip bomb is caught by the PER-RECORD cap (round 10: the
    # parser streams, so total decompressed size is no longer a
    # memory hazard — a single ballooning record still fails fast)
    bomb = gzip.compress(_warc_record(b"y" * 10_000, "https://a.test/b"))
    assert len(bomb) < 1000
    with pytest.raises(ValueError, match="max_record_bytes"):
        _parse_warc_bytes(bomb, "bomb.warc.gz", max_member_bytes=1000)
    # and the guard surfaces through the Spark path too
    d = tmp_path / "warc"
    d.mkdir()
    (d / "big.warc").write_bytes(raw)
    with pytest.raises(Exception, match="max_member_bytes"):
        read_warc(
            __import__("cryo_spark").get_spark(), str(d), max_member_bytes=50
        ).collect()


def test_charset_aware_payload_decode():
    body = "café crème".encode("latin-1")
    p = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/plain; charset=ISO-8859-1\r\n\r\n" + body
    )
    out = _parse_warc_bytes(_warc_record(p, "https://a.test/l1"), "f.warc")
    assert "café crème" in out[0][6]
    # unknown charset label falls back to utf-8/replace, never raises
    p2 = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=no-such-cs\r\n\r\nok"
    )
    out2 = _parse_warc_bytes(_warc_record(p2, "https://a.test/l2"), "f.warc")
    assert out2[0][6].endswith("ok")


# ------------------------------------------------- HTML -> clean text


def _extract_one(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(html_ops.html_to_text_expr("h").alias("t")).first().t


def test_html_to_text_strips_scripts_styles_comments(spark):
    h = (
        "<html><head><title>T</title><style>p {color:red}</style>"
        "<script type='text/js'>var a = '<p>not text</p>';</script></head>"
        "<body><!-- hidden --><p>Visible text.</p></body></html>"
    )
    out = _extract_one(spark, h)
    assert "Visible text." in out
    assert "color" not in out and "not text" not in out
    assert "hidden" not in out
    assert "T" in out  # title text survives as a line


def test_html_to_text_entities_and_whitespace(spark):
    h = "<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39;&nbsp;&amp; e &amp;lt; f</p>"
    out = _extract_one(spark, h)
    # double-escaped &amp;lt; resolves exactly one level, to literal &lt;
    assert out == 'a <b> "c" \'d\' & e &lt; f'


def test_html_to_text_block_tags_preserve_lines(spark):
    h = "<div>one</div><p>two</p><br>three<li>four</li>"
    out = _extract_one(spark, h)
    assert out.splitlines() == ["one", "two", "three", "four"]


def test_html_to_text_duckdb_differential(spark):
    """The oracle chain (html_to_text_sql, RE2) and the Spark chain
    (Java regex) produce byte-identical text over adversarial HTML."""
    cases = [
        "<html><body><p>plain para</p></body></html>",
        "<SCRIPT>upper case</SCRIPT>kept<STYLE a=b>x{}</STYLE>",
        "no tags at all, just  spaced\t text",
        "<p>nested <b>bold <i>italic</i></b> end</p>",
        "<br/><br />self closing<hr/>",
        "&amp;amp; double &nbsp;&nbsp; spaces",
        "<div attr='<'>attr with lt</div>",
        "<table><tr><td>c1</td><td>c2</td></tr></table>",
        "",
        "   \t  ",
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i long, h string")
    got = {
        r.i: r.t
        for r in df.select("i", html_ops.html_to_text_expr("h").alias("t")).collect()
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


def test_http_split_exprs(spark):
    payload = (
        "HTTP/1.1 200 OK\r\nServer: x\r\n"
        "Content-Type: text/HTML; charset=UTF-8\r\n\r\n<p>Body</p>"
    )
    df = spark.createDataFrame([(payload,), ("not http",)], "p string")
    rows = df.select(
        html_ops.http_body_expr("p").alias("b"),
        html_ops.http_headers_expr("p").alias("h"),
        html_ops.http_content_type_expr("p").alias("ct"),
        html_ops.http_charset_expr("p").alias("cs"),
    ).collect()
    assert rows[0].b == "<p>Body</p>"
    assert rows[0].h.startswith("HTTP/1.1 200 OK")
    assert rows[0].ct == "text/html"
    assert rows[0].cs == "utf-8"
    # non-HTTP payloads pass through with empty header metadata
    assert rows[1].b == "not http" and rows[1].ct == ""
    # DuckDB parity for the body split (the oracle-visible half)
    con = duckdb.connect()
    b = con.execute(
        f"SELECT {html_ops.http_body_sql('p')} FROM (SELECT $1 AS p)",
        [payload],
    ).fetchone()[0]
    con.close()
    assert b == "<p>Body</p>"


def test_decode_entities_numeric_refs(spark):
    df = spark.createDataFrame([("it&#8217;s &Ouml;",)], "text string")
    out = html_ops.decode_entities(df).first().text
    assert out == "it’s Ö"


# ------------------------------------------------- E2E: WARC -> docs


def _html_warc_bytes() -> bytes:
    html_body = (
        "<html><head><title>Page A</title><style>b{}</style></head>"
        "<body><script>var x=1;</script><p>Hello &amp; welcome.</p>"
        "<div>Second line</div></body></html>"
    ).encode()
    p_html = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        + html_body
    )
    p_plain = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n  raw text doc  "
    )
    p_pdf = (
        b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n%PDF-1.4"
    )
    p_empty = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p> </p>"
    req = b"GET / HTTP/1.1\r\nHost: a.test\r\n\r\n"
    raw = b""
    for uri, p in (
        ("https://a.test/html", p_html),
        ("https://a.test/plain", p_plain),
        ("https://a.test/pdf", p_pdf),
        ("https://a.test/empty", p_empty),
    ):
        raw += _warc_record(p, uri)
    # a request record: wrong warc_type, must be filtered out
    raw += (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://a.test/html\r\n"
        + f"Content-Length: {len(req)}\r\n\r\n".encode()
        + req + b"\r\n\r\n"
    )
    return raw


def test_read_warc_documents_end_to_end(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "part.warc.gz").write_bytes(gzip.compress(_html_warc_bytes()))
    docs = read_warc_documents(spark, str(d)).collect()
    by_url = {r.url: r for r in docs}
    # pdf (content-type), empty (min_chars) and request (type) dropped
    assert set(by_url) == {"https://a.test/html", "https://a.test/plain"}
    a = by_url["https://a.test/html"]
    assert a.text.splitlines() == ["Page A", "Hello & welcome.", "Second line"]
    assert a.content_type == "text/html"
    assert by_url["https://a.test/plain"].text == "raw text doc"
    # schema is the canonical documents shape the operators consume
    # (round 10 added noindex — robots policy surfaced, not dropped —
    # and the title/html_lang metadata keys)
    # round 12 added capture_id — the cross-ingestion-path join key
    assert set(docs[0].asDict()) == {
        "doc_id", "url", "warc_date", "capture_id", "content_type",
        "status", "noindex", "title", "html_lang", "text",
    }


def test_read_warc_documents_feeds_text_operators(spark, tmp_path):
    """The composition contract: extracted docs run straight through a
    text-suite operator with url-keyed dedup, no adapter glue."""
    from cryo_spark.operators import web

    d = tmp_path / "crawl2"
    d.mkdir()
    (d / "p.warc").write_bytes(_html_warc_bytes())
    docs = read_warc_documents(spark, str(d))
    verdict = web.url_dedup(docs, url_col="url")
    assert verdict.filter(~F.col("is_duplicate")).count() == 2
