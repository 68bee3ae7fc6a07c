"""robots.txt awareness for crawl corpora (RFC 9309 shape): parse the
robots.txt responses a WARC crawl already contains into per-host
allow/disallow rules, and apply them to a document frame as a
SURFACED policy column — the compliance ring above the per-page
noindex flag (``operators.html.noindex_expr``).

Scale shape:

- **Parsing** (:func:`robots_rules`) explodes robots.txt bodies to
  lines and runs the group/agent selection with per-document windows —
  robots.txt files are KB-sized, so "one doc's lines on one task" is
  metadata work at any corpus scale, and there are only ~one per host.
- **Application** (:func:`apply_robots`) aggregates the rules to one
  array-of-structs row per host (rule table ~ #hosts, crawl-small) and
  BROADCAST-joins it to the corpus: the document side never shuffles,
  and the longest-match decision is a higher-order expression over the
  broadcast array. Wildcard rules are precompiled to regexes ONCE in
  the host-rule build, not per document.

Spec coverage (documented v1 simplifications):

- Group selection: case-insensitive EXACT product-token match for
  ``agent``, falling back to ``*`` groups only when the host has no
  exact group (RFC's longest-token-prefix agent matching is
  approximated by exact-match-or-star). Multiple matching groups on a
  host merge their rules (RFC 9309 §2.2.1 allows combining).
- Rule matching: ``*`` wildcards and the ``$`` end anchor are
  supported (compiled to regex); precedence is the RFC's
  most-specific rule = longest rule TEXT, with ties resolved to
  ``allow`` (Google's least-restrictive tie-break). No rule matching
  → allowed.
- Empty ``Disallow:`` / ``Allow:`` values are no-op rules (dropped).

Correctness anchors (tests/test_round10_ops.py): planted RFC/Google
documentation examples and a byte-identical differential against a
pure-Python reference parser over adversarial robots.txt fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cryo_spark.operators.web import canonical_host


def url_path_expr(col: str | Column) -> Column:
    """path-and-query of a URL (the byte string robots rules match
    against): everything after the authority, '/' when empty, fragment
    dropped."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    rest = F.regexp_replace(u, r"^[^/?]*", "")
    return F.when(rest == "", F.lit("/")).otherwise(rest)


def robots_rules(
    df: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Parse a frame of robots.txt documents (one row per fetched
    robots.txt: its ``url_col`` names the host, ``text_col`` is the
    body) into the rules applying to ``agent``.

    Returns (host, rule, prefix, pattern): rule in ('allow',
    'disallow'), prefix the raw rule text, pattern the precompiled
    match regex. Multiple fetches of one host merge (union of rules).

    Group semantics: a group is one-or-more consecutive User-agent
    lines followed by rules; a host's selected groups are those naming
    ``agent`` exactly (case-insensitive), else those naming ``*``."""
    # _doc is assigned BEFORE the explode (in the same projection it
    # would be evaluated per exploded LINE and every line would land in
    # its own group); it is a transient grouping key for this plan
    # only, never persisted — partition-layout dependence is fine here
    base = df.select(
        F.monotonically_increasing_id().alias("_doc"),
        canonical_host(url_col).alias("host"),
        F.col(text_col).alias("_body"),
    )
    d = base.select(
        "_doc", "host",
        F.posexplode(F.split(F.col("_body"), "\n")).alias("_pos", "_line"),
    )
    line = F.trim(F.regexp_replace(F.regexp_replace("_line", r"\r$", ""), r"#.*$", ""))
    parsed = d.select(
        "_doc", "host", "_pos",
        F.lower(F.regexp_extract(line, r"^([A-Za-z\-]+)[ \t]*:", 1)).alias("_field"),
        # [ \t]-trim inside the pattern: F.trim strips spaces only, so
        # a tab-separated 'User-agent:\tbot' would keep its tab and
        # fail the agent match
        F.regexp_extract(
            line, r"^[A-Za-z\-]+[ \t]*:[ \t]*(.*?)[ \t]*$", 1
        ).alias("_value"),
    ).filter(F.col("_field").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("_doc").orderBy("_pos")
    is_ua = F.col("_field") == "user-agent"
    grouped = parsed.withColumn(
        "_new_group",
        (is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))).cast("long"),
    ).withColumn(
        "_group",
        F.sum("_new_group").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    gw = Window.partitionBy("_doc", "_group")
    hw = Window.partitionBy("_doc")
    flagged = grouped.withColumn(
        "_g_agent",
        F.max(is_ua & (F.lower("_value") == agent.lower())).over(gw),
    ).withColumn(
        "_g_star", F.max(is_ua & (F.col("_value") == "*")).over(gw)
    ).withColumn("_h_agent", F.max(is_ua & (F.lower("_value") == agent.lower())).over(hw))
    rules = flagged.filter(
        ~is_ua
        & (F.col("_value") != "")
        & F.when(F.col("_h_agent"), F.col("_g_agent")).otherwise(F.col("_g_star"))
    ).select(
        "host",
        F.col("_field").alias("rule"),
        F.col("_value").alias("prefix"),
    ).distinct()
    esc = F.regexp_replace("prefix", r"([.^+?(){}\[\]\\|])", r"\\$1")
    core = F.when(
        F.col("_esc").endswith("$"),
        F.expr("substring(_esc, 1, length(_esc) - 1)"),
    ).otherwise(F.col("_esc"))
    # only a TRAILING '$' is an anchor (RFC 9309); a mid-rule '$' is a
    # literal octet and must be escaped, or the compiled pattern would
    # carry a mid-string end-anchor that can never match
    core = F.replace(core, F.lit("$"), F.lit(r"\$"))
    return rules.withColumn("_esc", esc).select(
        "host", "rule", "prefix",
        F.concat(
            F.lit("^"),
            F.replace(core, F.lit("*"), F.lit(".*")),
            F.when(F.col("_esc").endswith("$"), F.lit("$")).otherwise(F.lit("")),
        ).alias("pattern"),
    )


def robots_rules_from_warc(recs: DataFrame, agent: str = "*") -> DataFrame:
    """Convenience over a ``read_warc`` frame: selects the robots.txt
    responses and parses their HTTP bodies — the rules table a crawl
    corpus needs comes from the crawl itself, no second fetch."""
    from cryo_spark.operators import html as html_ops

    robots = recs.filter(
        (F.col("warc_type") == "response")
        & F.col("target_uri").rlike(r"(?i)^[a-z][a-z0-9+.\-]*://[^/?#]+/robots\.txt$")
    ).select(
        F.col("target_uri").alias("url"),
        html_ops.http_body_expr("payload").alias("text"),
    )
    return robots_rules(robots, agent=agent)


def apply_robots(
    docs: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    out_col: str = "robots_disallowed",
    drop: bool = False,
) -> DataFrame:
    """Evaluate the parsed rules against every document URL.

    Default SURFACES the verdict as boolean ``out_col`` (same policy
    stance as the noindex flag: filtering is the corpus owner's call);
    ``drop=True`` removes disallowed docs instead.

    Decision per doc: among the host's rules whose pattern matches the
    URL path, the longest rule text wins; an allow/disallow tie at the
    same length resolves to allow; no matching rule (or no robots.txt
    for the host) → allowed.

    Plan: rules collapse to one array row per host (#hosts rows) and
    BROADCAST-join to the corpus on host — the document side stays
    shuffle-free; the match itself is a higher-order filter over the
    broadcast array."""
    # rules-side host is renamed before the join: DataFrame.drop by
    # name removes EVERY column with that name, so a caller's own
    # 'host' column would be silently lost otherwise
    per_host = rules.groupBy("host").agg(
        F.collect_list(F.struct("rule", "prefix", "pattern")).alias("_rules")
    ).withColumnRenamed("host", "_rules_host")
    path = url_path_expr(url_col)
    joined = docs.withColumn("_host", canonical_host(url_col)).join(
        F.broadcast(per_host),
        F.col("_host") == F.col("_rules_host"),
        "left",
    ).drop("_rules_host")
    # a host without robots.txt leaves _rules NULL: every lambda below
    # propagates NULL and the final coalesce resolves it to allowed
    matching = F.filter(
        F.col("_rules"), lambda r: F.regexp_like(path, r["pattern"])
    )
    best = F.array_max(F.transform(matching, lambda r: F.length(r["prefix"])))
    disallowed = F.coalesce(
        F.exists(
            matching,
            lambda r: (r["rule"] == "disallow") & (F.length(r["prefix"]) == best),
        )
        & ~F.exists(
            matching,
            lambda r: (r["rule"] == "allow") & (F.length(r["prefix"]) == best),
        ),
        F.lit(False),
    )
    out = joined.withColumn(out_col, disallowed).drop("_host", "_rules")
    if drop:
        out = out.filter(~F.col(out_col)).drop(out_col)
    return out


def robots_sitemaps(
    df: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(host, sitemap_url) pairs from robots.txt documents — the
    standard crawl-frontier seed next to the allow/disallow rules
    (``Sitemap:`` lines are group-independent per the spec, so no
    agent selection applies). Distinct across repeated fetches."""
    d = df.select(
        canonical_host(url_col).alias("host"),
        F.explode(F.split(F.col(text_col), "\n")).alias("_line"),
    )
    line = F.trim(F.regexp_replace("_line", r"\r$", ""))
    return (
        d.select(
            "host",
            F.regexp_extract(
                line, r"(?i)^sitemap[ \t]*:[ \t]*(\S+)", 1
            ).alias("sitemap_url"),
        )
        .filter(F.col("sitemap_url") != "")
        .distinct()
    )
