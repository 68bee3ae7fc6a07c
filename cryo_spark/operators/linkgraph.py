"""Web link graph + host-rank quality signal.

Crawl-scale corpus recipes (CommonCrawl's cc-pagerank releases,
RefinedWeb-style URL quality filtering) rank HOSTS by link structure
and use the rank as a document quality prior: pages on hosts nobody
links to are disproportionately spam/SEO chaff. Three stages, each a
standard Spark shape:

1. :func:`html_links_expr` — outbound link extraction from RAW HTML
   (``href``/``src`` attributes) as one JVM ``regexp_extract_all``:
   runs in the ingestion scan's projection, zero Python, zero
   shuffles. Host-graph semantics only need links that NAME a host
   (absolute ``scheme://`` and protocol-relative ``//host/…`` forms);
   root-/path-relative links point at the page's own host, i.e.
   self-edges the host graph drops anyway — extracting them would add
   noise, not edges (documented trade).

2. :func:`host_link_graph` — explode links, canonicalize hosts
   (shared ``web.canonical_host``), aggregate to weighted distinct
   edges ``(src_host, dst_host, n_links)``. One shuffle on the edge
   key; self-edges dropped.

3. :func:`host_rank` — PageRank power iteration expressed as
   DataFrame joins/aggregations (the public textbook formulation:
   rank' = (1-d)/N + d·(Σ in-neighbor rank/out-degree + dangling
   mass/N)). Each iteration is ONE shuffle (edge⨝rank on src, agg on
   dst); lineage is cut with ``localCheckpoint`` every iteration so
   10 iterations do not build a 10-deep recursive plan (the same
   driver-plan blow-up documented for the funnel in SCALE.md).
   Dangling mass is redistributed exactly, so ranks sum to 1 every
   iteration — the convergence/consistency property the tests pin
   against an independent numpy reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cryo_spark.operators.web import canonical_host

#: href/src attribute values that carry a host: absolute
#: scheme://… or protocol-relative //… — single- or double-quoted.
#: [^"'<>\\s]+ keeps the match inside one attribute value.
_LINK_RE = (
    r"(?i)\b(?:href|src)[ \t]*=[ \t]*[\"']"
    r"((?:https?:)?//[^\"'<>\\ \t\r\n]+)"
)


def html_links_expr(col: str | Column) -> Column:
    """Array of outbound host-naming link targets (absolute and
    protocol-relative URLs) in an HTML document, in document order.
    Fragments/query strings are preserved — downstream host extraction
    ignores them, and page-level consumers may want them."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(_LINK_RE), 1)


def html_links_sql(expr: str) -> str:
    pat = _LINK_RE.replace("'", "''")
    return f"regexp_extract_all({expr}, '{pat}', 1)"


def host_link_graph(
    df: DataFrame,
    html_col: str = "payload",
    url_col: str = "target_uri",
    links_col: str | None = None,
) -> DataFrame:
    """Weighted host-level link graph from raw HTML documents:
    ``(src_host, dst_host, n_links)`` with self-edges dropped.

    ``//host/…`` protocol-relative targets are normalized with an
    ``https:`` prefix so ``canonical_host`` parses them. One
    aggregation shuffle on (src_host, dst_host); the extraction
    itself rides the scan projection. Page-count weighting note:
    ``n_links`` counts LINK OCCURRENCES (a footer linking a partner
    on every page counts per page) — :func:`host_rank` normalizes by
    out-degree, so a link farm's thousand outbound edges each carry
    1/1000th of its rank (the property that makes rank hard to
    inflate by emitting more links).

    ``links_col`` switches the source from raw HTML to a
    pre-extracted link array (``sources.documents.read_wat_links``'s
    ``links`` column — WAT metadata): targets are taken from each
    element's ``url`` field under the SAME host-naming filter
    (absolute / protocol-relative only), so WARC- and WAT-built
    graphs agree by construction."""
    src = canonical_host(url_col)
    if links_col is not None:
        target = F.explode(F.col(links_col)).alias("l")
        links = (
            df.select(src.alias("src_host"), target)
            .select("src_host", F.col("l")["url"].alias("link"))
            .filter(F.col("link").rlike(r"(?i)^(?:https?:)?//"))
        )
    else:
        link = F.explode(html_links_expr(html_col)).alias("link")
        links = df.select(src.alias("src_host"), link)
    dst = canonical_host(
        F.when(
            F.col("link").startswith("//"),
            F.concat(F.lit("https:"), F.col("link")),
        ).otherwise(F.col("link"))
    )
    return (
        links.select("src_host", dst.alias("dst_host"))
        .filter(
            (F.col("src_host") != "")
            & (F.col("dst_host") != "")
            & (F.col("src_host") != F.col("dst_host"))
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


def host_rank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    weighted: bool = False,
) -> DataFrame:
    """PageRank over a host edge frame ``(src_host, dst_host[,
    n_links])`` → ``(host, rank)``, ranks summing to 1.

    ``weighted=True`` splits a source's rank across out-edges
    proportional to ``n_links`` instead of uniformly. Hosts appearing
    only as link TARGETS participate (they accumulate rank and
    contribute their dangling mass back); each iteration is one
    edge⨝rank join on ``src_host`` + one aggregation on ``dst_host``,
    with ``localCheckpoint`` cutting lineage so the driver plan stays
    O(1) per iteration, not O(2^iters). The rank frame is
    #hosts-sized (small next to the corpus); the edge frame is read
    once and cached across iterations."""
    # loop-invariant frames materialize ONCE (localCheckpoint): hosts,
    # normalized edges, and the linker set are read every iteration —
    # recomputing them from lineage would re-run the edge aggregation
    # iters times
    hosts = (
        edges.select(F.col("src_host").alias("host"))
        .union(edges.select(F.col("dst_host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    w = F.col("n_links") if weighted and "n_links" in edges.columns else F.lit(1)
    out_w = edges.groupBy("src_host").agg(
        F.sum(w.cast("double")).alias("out_w")
    )
    norm_edges = (
        edges.select("src_host", "dst_host", w.cast("double").alias("w"))
        .join(out_w, "src_host")
        .select(
            "src_host", "dst_host", (F.col("w") / F.col("out_w")).alias("share")
        )
        .localCheckpoint(eager=True)
    )
    n = hosts.count()  # bounded: #hosts, needed for the teleport term
    if n == 0:
        # empty link graph (a crawl whose pages carry no
        # absolute/protocol-relative links — reachable via the CLI's
        # --min-host-rank): return an empty (host, rank) frame rather
        # than dividing by zero; downstream joins/filters compose as
        # no-ops exactly as an all-unknown-host corpus should
        return hosts.select(
            "host", F.lit(0.0).alias("rank")
        )
    ranks = hosts.select("host", F.lit(1.0 / n).alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    linkers = (
        norm_edges.select(F.col("src_host").alias("host"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        contrib = (
            norm_edges.join(
                ranks.withColumnRenamed("host", "src_host"), "src_host"
            )
            .groupBy(F.col("dst_host").alias("host"))
            .agg(F.sum(F.col("rank") * F.col("share")).alias("in_rank"))
        )
        # dangling hosts (no out-edges) spread their rank uniformly —
        # without this, total rank leaks and ranks stop summing to 1
        dangling = (
            ranks.join(linkers, "host", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            hosts.join(contrib, "host", "left")
            .select(
                "host",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("in_rank"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def attach_host_rank(
    docs: DataFrame,
    ranks: DataFrame,
    url_col: str = "url",
    out_col: str = "host_rank",
) -> DataFrame:
    """Join the host-rank signal onto a document frame as a quality
    prior column (0.0 for hosts absent from the graph). The rank frame
    is #hosts-sized — BROADCAST it so the corpus never shuffles."""
    r = F.broadcast(
        ranks.select(F.col("host"), F.col("rank").alias(out_col))
    )
    return (
        docs.withColumn("_hr_host", canonical_host(url_col))
        .join(r, F.col("_hr_host") == F.col("host"), "left")
        .drop("host", "_hr_host")
        .fillna({out_col: 0.0})
    )
