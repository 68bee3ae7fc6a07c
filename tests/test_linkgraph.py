"""Link graph + host rank: href extraction from raw HTML, host edge
aggregation, and the PageRank power iteration pinned against an
independent numpy reference implementation of the same public
formulation (rank' = (1-d)/N + d·(Σ in rank/out-degree + dangling/N)).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cryo_spark.operators.linkgraph import (
    attach_host_rank,
    host_link_graph,
    host_rank,
    html_links_expr,
    html_links_sql,
)


HTML = """
<html><body>
<a href="https://other.test/page">abs</a>
<a href='http://single.test/q?x=1#frag'>single-quoted</a>
<a href="//proto.test/rel">protocol-relative</a>
<a href="/root-relative">same host</a>
<a href="relative/path">same host too</a>
<img src="https://cdn.test/img.png">
<script src="https://scripts.test/app.js"></script>
<a HREF="HTTPS://upper.test/">case</a>
<p>plain text https://nothref.test/ not an attribute</p>
</body></html>
"""


def test_html_links_expr(spark):
    df = spark.createDataFrame([(HTML,)], "payload string")
    links = df.select(html_links_expr("payload").alias("l")).first().l
    assert "https://other.test/page" in links
    assert "http://single.test/q?x=1#frag" in links
    assert "//proto.test/rel" in links
    assert "https://cdn.test/img.png" in links
    assert "https://scripts.test/app.js" in links
    assert "HTTPS://upper.test/" in links
    # root-/path-relative and bare text URLs are NOT host-naming links
    assert not any("root-relative" in l or "relative/path" in l for l in links)
    assert not any("nothref" in l for l in links)


def test_html_links_matches_duckdb(spark):
    import duckdb

    df = spark.createDataFrame([(HTML,)], "payload string")
    got = df.select(html_links_expr("payload").alias("l")).first().l
    dk = duckdb.execute(
        f"SELECT {html_links_sql('?::VARCHAR')} AS l", [HTML]
    ).fetchone()[0]
    assert list(got) == list(dk)


def test_host_link_graph(spark):
    rows = [
        ("https://a.test/p1", '<a href="https://b.test/x"></a>'
                              '<a href="https://b.test/y"></a>'
                              '<a href="//c.test/z"></a>'
                              '<a href="https://a.test/self"></a>'),
        ("https://a.test/p2", '<a href="https://b.test/w"></a>'),
        ("https://b.test/p", '<a href="https://a.test/"></a>'),
    ]
    df = spark.createDataFrame(rows, "target_uri string, payload string")
    edges = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_link_graph(df).collect()
    }
    # b linked from 3 a-pages' links, c once, self-edge a->a dropped
    assert edges[("a.test", "b.test")] == 3
    assert edges[("a.test", "c.test")] == 1
    assert edges[("b.test", "a.test")] == 1
    assert ("a.test", "a.test") not in edges


def _numpy_pagerank(edge_list, d=0.85, iters=10, weighted=False):
    hosts = sorted({h for e in edge_list for h in e[:2]})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    out_w = np.zeros(n)
    for s, t, w in edge_list:
        out_w[idx[s]] += w if weighted else 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        for s, t, w in edge_list:
            share = (w if weighted else 1) / out_w[idx[s]]
            nxt[idx[t]] += r[idx[s]] * share
        dangling = r[out_w == 0].sum()
        r = (1 - d) / n + d * (nxt + dangling / n)
    return {h: r[idx[h]] for h in hosts}


@pytest.mark.parametrize("weighted", [False, True])
def test_host_rank_matches_numpy(spark, weighted):
    edge_list = [
        ("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 1),
        ("d", "a", 5), ("d", "b", 1),
        ("a", "e", 1),  # e has no out-edges: dangling
    ]
    edges = spark.createDataFrame(
        edge_list, "src_host string, dst_host string, n_links long"
    )
    got = {
        r.host: r.rank
        for r in host_rank(edges, iters=8, weighted=weighted).collect()
    }
    want = _numpy_pagerank(edge_list, iters=8, weighted=weighted)
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=1e-12)
    # ranks are a distribution: sum to 1 exactly (dangling mass
    # redistributed, not leaked)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_host_rank_sink_accumulates(spark):
    """A pure sink (everyone links in, no out-links) must end with the
    highest rank — the basic sanity property of the signal."""
    edge_list = [("s1", "hub", 1), ("s2", "hub", 1), ("s3", "hub", 1),
                 ("s1", "s2", 1)]
    edges = spark.createDataFrame(
        edge_list, "src_host string, dst_host string, n_links long"
    )
    got = {r.host: r.rank for r in host_rank(edges, iters=6).collect()}
    assert got["hub"] == max(got.values())


def test_attach_host_rank_broadcast(spark):
    docs = spark.createDataFrame(
        [(1, "https://a.test/x"), (2, "https://unknown.test/y")],
        "doc_id long, url string",
    )
    ranks = spark.createDataFrame(
        [("a.test", 0.7), ("b.test", 0.3)], "host string, rank double"
    )
    out = attach_host_rank(docs, ranks)
    rows = {r.doc_id: r.host_rank for r in out.collect()}
    assert rows[1] == pytest.approx(0.7)
    assert rows[2] == 0.0  # absent host -> 0, not NULL
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_host_rank_pipeline_stage(spark):
    """host_ranks + min_host_rank compose as a stage-0 URL control:
    docs on low-rank hosts exit at the host_rank boundary, the funnel
    reports it, and absent hosts rank 0 (dropped under any positive
    floor)."""
    from cryo_spark.operators.corpus import corpus_funnel

    prose = (
        "The quick brown fox jumps over the lazy dog and this page "
        "number %d carries enough ordinary english prose to pass the "
        "quality and language filters used by the corpus pipeline."
    )
    docs = spark.createDataFrame(
        [
            (i,
             prose % i,
             "web",
             f"https://{'good' if i % 2 else 'spam'}.test/p/{i}")
            for i in range(10)
        ],
        "doc_id long, text string, source string, url string",
    )
    ranks = spark.createDataFrame(
        [("good.test", 0.8), ("spam.test", 0.01)], "host string, rank double"
    )
    funnel = corpus_funnel(
        docs, url_col="url", host_ranks=ranks, min_host_rank=0.1
    )
    rows = {r.stage: r for r in funnel.collect()}
    assert "host_rank" in rows
    assert rows["host_rank"].docs_in == 10
    assert rows["host_rank"].docs_out == 5  # the spam.test half exits

    # url_col is required when host_ranks is passed
    with pytest.raises(ValueError, match="host_ranks"):
        corpus_funnel(docs.drop("url"), host_ranks=ranks)


def test_corpus_cli_min_host_rank(spark, tmp_path):
    """--min-host-rank ranks the crawl's own link graph and gates the
    pipeline; rejected for non-warc formats."""
    import gzip
    import json

    from cryo_spark.api import main

    def rec(body: bytes, uri: str) -> bytes:
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        )
        return gzip.compress(
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + b"WARC-Date: 2026-08-14T00:00:00Z\r\n"
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload + b"\r\n\r\n"
        )

    prose = (
        b"<p>The quick brown fox jumps over the lazy dog and this page"
        b" carries enough ordinary english prose to pass the quality"
        b" and language filters used by the corpus pipeline.</p>"
    )
    # hub.test is linked by every page; lonely.test by nobody
    raw = b""
    for i in range(4):
        raw += rec(
            prose + b'<a href="https://hub.test/x"></a>',
            f"https://s{i}.test/p",
        )
    raw += rec(prose, "https://hub.test/x")
    raw += rec(prose, "https://lonely.test/y")
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "m.warc.gz").write_bytes(raw)
    out = tmp_path / "out"
    rc = main(["corpus", "--input", str(d), "--format", "warc",
               "--output", str(out), "--min-host-rank", "0.3",
               "--host-rank-iters", "4"])
    assert rc == 0
    funnel = {r["stage"]: r for r in json.load(open(out / "funnel.json"))}
    hr = funnel["host_rank"]
    # hub.test survives (everyone links it); the four s*.test sources
    # and lonely.test sit at/below the teleport floor
    assert hr["docs_in"] == 6 and hr["docs_out"] == 1

    rc = main(["corpus", "--input", f"{tmp_path}", "--format", "parquet",
               "--output", str(out), "--min-host-rank", "0.5"])
    assert rc == 2


def test_linkgraph_from_warc_end_to_end(spark, tmp_path):
    """read_warc records feed host_link_graph directly (payload +
    target_uri defaults), closing the crawl → graph → signal loop."""
    import gzip

    from cryo_spark.sources.documents import read_warc

    def rec(body: bytes, uri: str) -> bytes:
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        )
        return gzip.compress(
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + b"WARC-Date: 2026-08-14T00:00:00Z\r\n"
            + f"Content-Length: {len(payload)}\r\n\r\n".encode()
            + payload + b"\r\n\r\n"
        )

    raw = rec(b'<a href="https://x.test/1"></a>', "https://w.test/a") + rec(
        b'<a href="https://w.test/b"></a><a href="https://x.test/2"></a>',
        "https://y.test/b",
    )
    d = tmp_path / "lg"
    d.mkdir()
    (d / "m.warc.gz").write_bytes(raw)
    edges = host_link_graph(read_warc(spark, str(d)))
    got = {(r.src_host, r.dst_host): r.n_links for r in edges.collect()}
    assert got == {
        ("w.test", "x.test"): 1,
        ("y.test", "w.test"): 1,
        ("y.test", "x.test"): 1,
    }
