"""WARC payload → clean text: the missing link between crawl
ingestion (`sources.documents.read_warc` lands raw HTTP-response
payloads) and the text/dedup operator layer (which consumes clean
documents).

Two stages, both NARROW column expressions (zero shuffles — at 100 TB
this is a map-only pass fused into the ingestion scan's projection):

1. HTTP split: a WARC ``response`` payload is status line + headers +
   blank line + body. :func:`http_body_expr` / :func:`http_headers_expr`
   split at the FIRST blank line (CRLF or LF — non-greedy
   ``.*?\\r?\\n\\r?\\n``), and :func:`http_content_type_expr` /
   :func:`http_charset_expr` parse the Content-Type header.
   (Byte-level charset decode already happened in
   ``sources.documents._decode_payload`` — by the time payloads are
   Spark strings they are Unicode; the header parse here is for
   filtering/metadata.)

2. HTML → text (:func:`html_to_text_expr`): drop script/style blocks
   and comments, map block-level tag boundaries to newlines (so line
   structure survives for line-level dedup), strip remaining tags,
   decode the common named entities, normalize whitespace. All JVM
   regex/replace — whole-stage codegen, no Python. Numeric character
   references (``&#8217;``) need computation regex cannot express;
   :func:`decode_entities` is the optional Arrow-batched
   full-fidelity pass (``html.unescape``) for corpora where they
   matter.

Every pattern is written to the RE2 ∩ Java-regex common subset (no
backreferences, no lookaround) so the DuckDB oracle
(:func:`html_to_text_sql`, :func:`http_body_sql`) runs the IDENTICAL
chain — the contract entry hash-proves both stages end to end.

Known (documented) limits of the regex extractor: attribute values
containing a literal ``>`` truncate that tag early; CDATA sections
are treated as text. Both are rare in real crawl HTML and acceptable
for a training-corpus cleaner (reference point: the same trade is
made by CCNet/RefinedWeb-style regex pre-cleaners before heavier
boilerplate removal).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# -- stage 1: HTTP response split -----------------------------------

#: first blank line (CRLF or LF), non-greedy: header block boundary
_HTTP_SPLIT = r"(?s)^HTTP/.*?\r?\n\r?\n"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def http_body_expr(col: str | Column) -> Column:
    """Body of an HTTP response payload (text after the first blank
    line); non-HTTP payloads pass through unchanged; a headers-only
    payload yields ''."""
    c = _c(col)
    return F.when(
        c.startswith("HTTP/"),
        F.regexp_extract(c, _HTTP_SPLIT + r"(.*)$", 1),
    ).otherwise(c)


def http_body_sql(expr: str) -> str:
    return (
        f"CASE WHEN starts_with({expr}, 'HTTP/') THEN "
        f"regexp_extract({expr}, '{_HTTP_SPLIT}(.*)$', 1) "
        f"ELSE {expr} END"
    )


#: header block capture — body excluded by construction, so the
#: Content-Type/charset parses below can never match body text
#: (quoted HTTP examples, mirrored responses, multipart parts)
_HDR_BLOCK = r"(?s)^(HTTP/.*?)\r?\n\r?\n"

#: Content-Type parses run on the HEADER BLOCK only. [ \t] instead of
#: \s: identical in Java regex and RE2 (\s differs on \x0B), and a
#: header value never legally wraps here anyway
_CT_RE = r"(?i)\ncontent-type[ \t]*:[ \t]*([^;\r\n]+)"
_CS_RE = r"(?i)\ncontent-type[^\r\n]*charset[ \t]*=[ \t]*\"?([A-Za-z0-9_\-]+)"


def http_headers_expr(col: str | Column) -> Column:
    """The status line + header block of an HTTP response payload
    ('' for non-HTTP payloads)."""
    return F.regexp_extract(_c(col), _HDR_BLOCK, 1)


def http_headers_sql(expr: str) -> str:
    return f"regexp_extract({expr}, '{_HDR_BLOCK}', 1)"


#: status code on the HTTP/1.x status line
_STATUS_RE = r"^HTTP/[0-9.]+[ \t]+([0-9]{3})"


def http_status_expr(col: str | Column) -> Column:
    """HTTP status code of a response payload as an int (NULL for
    non-HTTP payloads — they carry no status to judge)."""
    return F.regexp_extract(_c(col), _STATUS_RE, 1).try_cast("int")


def http_status_sql(expr: str) -> str:
    return f"try_cast(regexp_extract({expr}, '{_STATUS_RE}', 1) AS INTEGER)"


def http_content_type_expr(col: str | Column) -> Column:
    """Media type from the Content-Type header, lowercased, parameters
    stripped ('' when absent). Parsed from the extracted HEADER BLOCK,
    never the raw payload: a body containing a 'content-type:' line (a
    quoted HTTP example, a mirrored response) must not produce a
    spurious content_type, and a headers-only/non-HTTP payload must
    yield ''."""
    return F.lower(F.trim(F.regexp_extract(http_headers_expr(col), _CT_RE, 1)))


def http_content_type_sql(expr: str) -> str:
    return f"lower(trim(regexp_extract({http_headers_sql(expr)}, '{_CT_RE}', 1)))"


def http_charset_expr(col: str | Column) -> Column:
    """charset parameter of the Content-Type header, lowercased ('' when
    absent). Header-block-scoped like :func:`http_content_type_expr`."""
    return F.lower(F.regexp_extract(http_headers_expr(col), _CS_RE, 1))


def http_charset_sql(expr: str) -> str:
    return f"lower(regexp_extract({http_headers_sql(expr)}, '{_CS_RE}', 1))"


# -- stage 2: HTML -> clean text ------------------------------------

#: (pattern, replacement) chain. ORDER IS LOAD-BEARING:
#: script/style/comment bodies go first (their content must never
#: reach the tag-strip as text), block boundaries become newlines
#: BEFORE the generic strip erases the tags, entities decode AFTER
#: tag-strip (a decoded '&lt;script&gt;' is text, not a tag), '&amp;'
#: decodes LAST (double-escaped '&amp;lt;' must yield literal '&lt;'),
#: whitespace collapses after '&nbsp;' became a space.
_TAG_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b.*?</script\s*>", " "),
    (r"(?is)<style\b.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (
        r"(?i)<(?:br|p|/p|div|/div|/h[1-6]|li|/li|/tr|/table|/ul|/ol"
        r"|/blockquote|/pre|/section|/article|/header|/footer|/title)\b[^>]*/?>",
        "\n",
    ),
    (r"(?s)<[^>]*>", " "),
]

#: literal named-entity decodes (the high-frequency set; numeric refs
#: are the Arrow pass's job)
_ENTITY_STEPS: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST: double-escapes resolve one level
]

#: the trim steps, shared by the HTML chain and the text/plain branch
#: of extract_documents. Explicit class instead of \s: Java \s
#: includes \x0B (vertical tab), RE2's does not — a \s trim would make
#: the Spark chain and the DuckDB oracle diverge on crawl text with
#: leading/trailing \x0B. [ \t\r\f\n] means the same in both engines
#: (\x0B survives the trim in both — consistently).
_TRIM_STEPS: list[tuple[str, str]] = [
    (r"^[ \t\r\f\n]+", ""),
    (r"[ \t\r\f\n]+$", ""),
]

_WS_STEPS: list[tuple[str, str]] = [
    (r"[ \t\r\f]+", " "),  # horizontal whitespace runs -> one space
    (r"[ \n]*\n[ \n]*", "\n"),  # newline runs (w/ spaces) -> one \n
    # regex trim: Spark's trim() strips spaces only, so leading and
    # trailing newlines must go here, identically in both engines
    *_TRIM_STEPS,
]


def trim_text_expr(col: str | Column) -> Column:
    """Full whitespace trim (spaces, tabs, CR/LF, form feed) as the
    engine-parity regex chain — what ``F.trim`` (ASCII spaces only)
    cannot do."""
    c = _c(col)
    for pat, rep in _TRIM_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return c


def trim_text_sql(expr: str) -> str:
    c = expr
    for pat, rep in _TRIM_STEPS:
        c = f"regexp_replace({c}, '{pat}', '{rep}', 'g')"
    return c


def html_to_text_expr(col: str | Column) -> Column:
    """Clean visible text of an HTML document as one fused JVM
    expression chain — see module docstring for the stage order."""
    c = _c(col)
    for pat, rep in _TAG_STEPS:
        c = F.regexp_replace(c, pat, rep)
    for lit, rep in _ENTITY_STEPS:
        c = F.replace(c, F.lit(lit), F.lit(rep))
    for pat, rep in _WS_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return c


def html_to_text_sql(expr: str) -> str:
    """DuckDB expression computing the identical extraction (the
    oracle side of :func:`html_to_text_expr`): same pattern chain,
    RE2-compatible by construction, 'g' flag to match Spark's
    replace-all."""
    def lit(s: str) -> str:
        return "chr(10)" if s == "\n" else "'" + s.replace("'", "''") + "'"

    c = expr
    for pat, rep in _TAG_STEPS:
        c = f"regexp_replace({c}, {lit(pat)}, {lit(rep)}, 'g')"
    for l_, rep in _ENTITY_STEPS:
        c = f"replace({c}, {lit(l_)}, {lit(rep)})"
    for pat, rep in _WS_STEPS:
        c = f"regexp_replace({c}, {lit(pat)}, {lit(rep)}, 'g')"
    return c


# -- stage 2b: main-content (boilerplate) extraction ----------------

#: anchor-text markers (control chars that never appear in real crawl
#: text — and are SANITIZED from the input first so a hostile document
#: cannot inject fake anchor spans)
_M1, _M2 = "\x01", "\x02"
_MARKS = _M1 + _M2

#: anchor marking runs AFTER script/style/comment removal (their
#: bodies may contain anchors that must not count) and BEFORE the
#: block/tag strips (which would erase the <a> tags the link-density
#: feature needs). [ \t\r\n] instead of \s for the RE2 ∩ Java subset.
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a[ \t\r\n]*>"

#: short-line keeper: sentence-final punctuation (optionally closed by
#: a quote/bracket) marks a real short paragraph, not nav chrome
#: ("Home", "Read more", "© 2026 Example Corp" all fail this)
_SENTENCE_END = "[.!?][\"')\\]]?$"


def main_content_expr(
    col: str | Column,
    max_link_density: float = 0.4,
    min_line_chars: int = 30,
) -> Column:
    """Main-content text of an HTML document with boilerplate chrome
    (navigation, footers, link lists, cookie banners) removed — the
    trafilatura/jusText-shaped text-density + link-density heuristic,
    expressed as one fused JVM expression chain (zero shuffles, no
    Python):

    1. sanitize + strip script/style/comments, then wrap every
       anchor's text in control-char markers (``<a>Home</a>`` →
       ``\\x01Home\\x02``) so link text survives tag-stripping as a
       measurable span;
    2. run the same block-tags→newlines / tag-strip / entity /
       whitespace chain as :func:`html_to_text_expr` — markers ride
       through untouched (they are not whitespace, not tags);
    3. per LINE (= rendered block), compute text chars (marker-free
       length) and link chars (marker-span length) with a
       higher-order ``filter`` over the split lines, keeping a line
       iff it reads as content:

       - ``text_chars >= min_line_chars`` AND
         ``link_chars <= max_link_density * text_chars`` (the core
         rule: long, mostly-non-link blocks are prose; nav bars and
         link farms have high link density), OR
       - shorter than ``min_line_chars`` but with ZERO link chars and
         sentence-final punctuation (keeps short real paragraphs;
         drops "Home", "Read more", bare headings).

    Documented trade (v1): standalone headings and list-style prose
    without sentence punctuation are dropped with the chrome —
    acceptable for a pretraining cleaner (jusText's context smoothing
    would need neighbor-aware passes; the per-line rule keeps the
    whole extractor a narrow projection with an exact SQL twin,
    :func:`main_content_sql`). Anchors spanning a block boundary leave
    their text uncounted as link chars (markers split across lines) —
    rare, and it errs toward keeping text."""
    c = _c(col)
    c = F.regexp_replace(c, f"[{_MARKS}]", "")  # sanitize injected marks
    for pat, rep in _TAG_STEPS[:3]:  # script / style / comments
        c = F.regexp_replace(c, pat, rep)
    c = F.regexp_replace(c, _ANCHOR_RE, f"{_M1}$1{_M2}")
    for pat, rep in _TAG_STEPS[3:]:  # block tags -> \n, generic strip
        c = F.regexp_replace(c, pat, rep)
    for lit, rep in _ENTITY_STEPS:
        c = F.replace(c, F.lit(lit), F.lit(rep))
    for pat, rep in _WS_STEPS:
        c = F.regexp_replace(c, pat, rep)

    def _keep(ln: Column) -> Column:
        stripped = F.translate(ln, _MARKS, "")
        tc = F.length(stripped)
        # anchor-span chars = marker-free length minus marker-free
        # length with whole anchor spans removed
        no_anchor = F.regexp_replace(ln, f"{_M1}[^{_M2}]*{_M2}", "")
        lc = tc - F.length(F.translate(no_anchor, _MARKS, ""))
        core = (tc >= min_line_chars) & (
            lc.cast("double") <= F.lit(max_link_density) * tc
        )
        short_keep = (
            (tc > 0)
            & (tc < min_line_chars)
            & (lc == 0)
            & stripped.rlike(_SENTENCE_END)
        )
        return core | short_keep

    kept = F.filter(F.split(c, "\n"), _keep)
    c = F.array_join(F.transform(kept, lambda ln: F.translate(ln, _MARKS, "")), "\n")
    return trim_text_expr(c)


def main_content_sql(
    expr: str,
    max_link_density: float = 0.4,
    min_line_chars: int = 30,
) -> str:
    """DuckDB twin of :func:`main_content_expr` — identical chain,
    identical thresholds; only the engines' lambda / replacement
    syntaxes differ (``$1`` vs ``\\1``, ``filter(.., x -> ..)``)."""
    def lit(s: str) -> str:
        return "chr(10)" if s == "\n" else "'" + s.replace("'", "''") + "'"

    c = f"regexp_replace({expr}, '[{_MARKS}]', '', 'g')"
    for pat, rep in _TAG_STEPS[:3]:
        c = f"regexp_replace({c}, {lit(pat)}, {lit(rep)}, 'g')"
    c = f"regexp_replace({c}, {lit(_ANCHOR_RE)}, '{_M1}\\1{_M2}', 'g')"
    for pat, rep in _TAG_STEPS[3:]:
        c = f"regexp_replace({c}, {lit(pat)}, {lit(rep)}, 'g')"
    for l_, rep in _ENTITY_STEPS:
        c = f"replace({c}, {lit(l_)}, {lit(rep)})"
    for pat, rep in _WS_STEPS:
        c = f"regexp_replace({c}, {lit(pat)}, {lit(rep)}, 'g')"
    tc = f"length(translate(ln, '{_MARKS}', ''))"
    lc = (
        f"({tc} - length(translate("
        f"regexp_replace(ln, '{_M1}[^{_M2}]*{_M2}', '', 'g'), '{_MARKS}', '')))"
    )
    keep = (
        f"(({tc} >= {min_line_chars} AND {lc} <= {max_link_density} * {tc})"
        f" OR ({tc} > 0 AND {tc} < {min_line_chars} AND {lc} = 0"
        f" AND regexp_matches(translate(ln, '{_MARKS}', ''),"
        f" '{_SENTENCE_END.replace(chr(39), chr(39) * 2)}')))"
    )
    # coalesce: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — an all-boilerplate doc must be '' in both
    c = (
        f"coalesce(array_to_string(list_transform(list_filter("
        f"string_split({c}, chr(10)), ln -> {keep}),"
        f" ln -> translate(ln, '{_MARKS}', '')), chr(10)), '')"
    )
    return trim_text_sql(c)


def _line_features(ln: Column) -> tuple[Column, Column, Column]:
    """(marker-free line, text_chars, link_chars) — the shared feature
    triple of the per-line content rules."""
    stripped = F.translate(ln, _MARKS, "")
    tc = F.length(stripped)
    no_anchor = F.regexp_replace(ln, f"{_M1}[^{_M2}]*{_M2}", "")
    lc = tc - F.length(F.translate(no_anchor, _MARKS, ""))
    return stripped, tc, lc


def extract_main_content(
    df: DataFrame,
    html_col: str = "text",
    out_col: str | None = None,
    max_link_density: float = 0.4,
    min_line_chars: int = 30,
    smooth: bool = False,
) -> DataFrame:
    """DataFrame wrapper over :func:`main_content_expr` — one narrow
    projection, composes anywhere between HTML extraction and line
    dedup.

    ``smooth=True`` adds the jusText-shaped GOOD-NEIGHBOR pass the
    pure-expression form deliberately omits: a short, zero-link line
    (heading, caption, short lead-in) that sits DIRECTLY NEXT TO a
    core content line is kept even without sentence punctuation —
    rescuing "Introduction" above an article body while still dropping
    isolated chrome like "Home" in a nav run (its neighbors are other
    chrome, not core lines). Implemented as three chained projections
    (lines array → core-flag array → index-aware filter) so the
    regex chain and flags materialize ONCE per row instead of once per
    lambda reference; still zero shuffles. Smoothing is a
    PIPELINE-ONLY refinement: it has no SQL twin, and the contract
    entry hash-proves the base extractor."""
    out = out_col or html_col
    if not smooth:
        return df.withColumn(
            out,
            main_content_expr(html_col, max_link_density, min_line_chars),
        )

    c = _c(html_col)
    c = F.regexp_replace(c, f"[{_MARKS}]", "")
    for pat, rep in _TAG_STEPS[:3]:
        c = F.regexp_replace(c, pat, rep)
    c = F.regexp_replace(c, _ANCHOR_RE, f"{_M1}$1{_M2}")
    for pat, rep in _TAG_STEPS[3:]:
        c = F.regexp_replace(c, pat, rep)
    for lit, rep in _ENTITY_STEPS:
        c = F.replace(c, F.lit(lit), F.lit(rep))
    for pat, rep in _WS_STEPS:
        c = F.regexp_replace(c, pat, rep)

    def _core(ln: Column) -> Column:
        _, tc, lc = _line_features(ln)
        return (tc >= min_line_chars) & (
            lc.cast("double") <= F.lit(max_link_density) * tc
        )

    def _keep(ln: Column, i: Column) -> Column:
        stripped, tc, lc = _line_features(ln)
        core = _core(ln)
        short_sentence = (
            (tc > 0) & (tc < min_line_chars) & (lc == 0)
            & stripped.rlike(_SENTENCE_END)
        )
        # lambda index i is 0-based; element_at is 1-based AND throws
        # out-of-bounds under ANSI mode (Spark 4 default) — both
        # neighbor lookups go through try_element_at: the prev lookup
        # would hit index 0 on the first line, the next lookup runs
        # past the array on the LAST line (a short unpunctuated final
        # line — footer chrome — is common, and the boolean OR does
        # not short-circuit it away)
        # ... and try_element_at still rejects index 0 outright
        # (INVALID_INDEX_OF_ZERO is not an out-of-bounds it suppresses)
        # so the first line's prev lookup needs the i>0 gate on top
        prev_core = F.when(
            i > 0,
            F.coalesce(F.try_element_at(F.col("_mc_core"), i), F.lit(False)),
        ).otherwise(F.lit(False))
        next_core = F.coalesce(
            F.try_element_at(F.col("_mc_core"), i + 2), F.lit(False)
        )
        neighbor_core = prev_core | next_core
        short_neighbor = (
            (tc > 0) & (tc < min_line_chars) & (lc == 0) & neighbor_core
        )
        return core | short_sentence | short_neighbor

    lines = F.split(c, "\n")
    return (
        df.withColumn("_mc_lines", lines)
        .withColumn("_mc_core", F.transform(F.col("_mc_lines"), _core))
        .withColumn(
            out,
            trim_text_expr(
                F.array_join(
                    F.transform(
                        F.filter(F.col("_mc_lines"), _keep),
                        lambda ln: F.translate(ln, _MARKS, ""),
                    ),
                    "\n",
                )
            ),
        )
        .drop("_mc_lines", "_mc_core")
    )


# -- document metadata (title / declared language) -------------------

_TITLE_RE = r"(?is)<title\b[^>]*>(.*?)</title[ \t\r\n]*>"
#: primary language subtag of <html lang="..."> (BCP 47 head: 2-3
#: letters; region/script subtags are dropped — 'en-US' -> 'en').
#: Whitespace REQUIRED before the attribute name: \b alone would also
#: match data-lang= and xml:lang= ('-' and ':' are word boundaries)
_HTML_LANG_RE = (
    r"(?is)<html\b[^>]*[ \t\r\n]lang[ \t]*=[ \t]*[\"']?([A-Za-z]{2,3})"
)


def html_title_expr(col: str | Column) -> Column:
    """<title> text of an HTML document as one normalized line
    (entities decoded, whitespace collapsed, trimmed; '' when absent).
    Useful as a dedup/audit key next to canonical_url."""
    c = F.regexp_extract(_c(col), _TITLE_RE, 1)
    for lit, rep in _ENTITY_STEPS:
        c = F.replace(c, F.lit(lit), F.lit(rep))
    c = F.regexp_replace(c, r"[ \t\r\f\n]+", " ")
    return trim_text_expr(c)


def html_title_sql(expr: str) -> str:
    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    c = f"regexp_extract({expr}, '{_TITLE_RE}', 1)"
    for l_, rep in _ENTITY_STEPS:
        c = f"replace({c}, {lit(l_)}, {lit(rep)})"
    c = f"regexp_replace({c}, '[ \\t\\r\\f\\n]+', ' ', 'g')"
    return trim_text_sql(c)


def html_lang_expr(col: str | Column) -> Column:
    """Declared document language: the primary subtag of
    ``<html lang="...">``, lowercased ('' when undeclared). A DECLARED
    value — cross-check against the n-gram language id
    (``text.lang_id``) before trusting it; crawls are full of template
    defaults."""
    return F.lower(F.regexp_extract(_c(col), _HTML_LANG_RE, 1))


def html_lang_sql(expr: str) -> str:
    pat = _HTML_LANG_RE.replace("'", "''")
    return f"lower(regexp_extract({expr}, '{pat}', 1))"


#: opening-tag names in document order (the layout "skeleton")
_TAG_NAME_RE = r"<([A-Za-z][A-Za-z0-9]*)"


def html_skeleton_expr(col: str | Column) -> Column:
    """Template fingerprint of an HTML document: md5 of the lowercased
    opening-tag-name sequence (text content ignored). Pages generated
    from the SAME template share a skeleton even when their text is
    entirely different — grouping by (host, skeleton) finds template
    families (listing pages, tag archives, calendar spam) that
    text-level dedup misses because each instance's words differ.
    Script/style/comment bodies are stripped first so embedded markup
    examples cannot perturb the layout hash."""
    c = _c(col)
    for pat, rep in _TAG_STEPS[:3]:  # script / style / comments
        c = F.regexp_replace(c, pat, rep)
    return F.md5(
        F.lower(F.array_join(F.regexp_extract_all(c, F.lit(_TAG_NAME_RE), 1), ">"))
    )


def html_skeleton_sql(expr: str) -> str:
    def lit(s: str) -> str:
        return "chr(10)" if s == "\n" else "'" + s.replace("'", "''") + "'"

    c = expr
    for pat, rep in _TAG_STEPS[:3]:
        c = f"regexp_replace({c}, {lit(pat)}, {lit(rep)}, 'g')"
    return (
        f"md5(lower(array_to_string("
        f"regexp_extract_all({c}, '{_TAG_NAME_RE}', 1), '>')))"
    )


# -- robots / noindex awareness --------------------------------------

#: X-Robots-Tag response header carrying a noindex directive —
#: header-block-scoped like the Content-Type parses
_NOINDEX_HDR = r"(?i)\nx-robots-tag[ \t]*:[^\r\n]*noindex"

#: <meta name=robots content="...noindex..."> in either attribute
#: order; quotes optional. [^>]* keeps the match inside ONE tag;
#: attribute names require PRECEDING WHITESPACE (\b alone would also
#: match data-name=/data-content= — '-' is a word boundary).
_NOINDEX_META = (
    r"(?is)<meta\b(?:[^>]*[ \t\r\n]name[ \t]*=[ \t]*[\"']?robots\b[^>]*"
    r"[ \t\r\n]content[ \t]*=[ \t]*[\"']?[^>]*?noindex"
    r"|[^>]*[ \t\r\n]content[ \t]*=[ \t]*[\"']?[^>]*?noindex[^>]*"
    r"[ \t\r\n]name[ \t]*=[ \t]*[\"']?robots\b)"
)


def noindex_expr(col: str | Column) -> Column:
    """True when a WARC response payload asks not to be indexed:
    ``X-Robots-Tag: noindex`` in the HTTP header block, or a
    ``<meta name="robots" content="...noindex...">`` tag (either
    attribute order) in the body. SURFACED as a column, never silently
    dropped — indexing policy is the corpus owner's call
    (:func:`~cryo_spark.sources.documents.read_warc_documents`
    documents the default: keep and flag)."""
    c = _c(col)
    return F.regexp_like(http_headers_expr(c), F.lit(_NOINDEX_HDR)) | (
        F.regexp_like(http_body_expr(c), F.lit(_NOINDEX_META))
    )


def noindex_sql(expr: str) -> str:
    hdr = _NOINDEX_HDR.replace("'", "''")
    meta = _NOINDEX_META.replace("'", "''")
    return (
        f"(regexp_matches({http_headers_sql(expr)}, '{hdr}')"
        f" OR regexp_matches({http_body_sql(expr)}, '{meta}'))"
    )


def decode_entities(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Full-fidelity HTML entity decode (numeric refs, the long named
    table) via ``html.unescape`` — the Arrow-batched fallback for what
    regex cannot compute. Run AFTER :func:`html_to_text_expr` when the
    corpus needs it; the JVM chain already handled the high-frequency
    set, this pass only changes docs carrying the exotic ones."""
    import html as _html

    out = out_col or text_col

    @F.pandas_udf("string")
    def _unescape(s: pd.Series) -> pd.Series:
        return s.map(lambda t: _html.unescape(t) if t is not None else None)

    return df.withColumn(out, _unescape(F.col(text_col)))


def extract_documents(
    df: DataFrame,
    payload_col: str = "payload",
    text_col: str = "text",
    keep_content_types: tuple[str, ...] = ("text/html", "text/plain", ""),
    min_chars: int = 1,
    main_content: bool = False,
    smooth: bool = False,
    status_range: tuple[int, int] | None = (200, 299),
    max_replacement_ratio: float | None = 0.3,
) -> DataFrame:
    """WARC-record frame → canonical clean-text columns: keeps
    ``response`` records whose Content-Type is in
    ``keep_content_types`` ('' = no header, treated as HTML), whose
    HTTP status is inside ``status_range`` (default 2xx — 404/5xx
    ERROR-PAGE bodies are template chrome, not content; payloads with
    no status line pass, they are raw documents; ``None`` disables),
    splits the HTTP payload, extracts clean text, and drops documents
    that reduce to fewer than ``min_chars`` characters. One narrow
    projection + one filter — composes directly after ``read_warc``
    with no shuffle. ``main_content=True`` swaps the HTML branch's
    plain tag-strip for :func:`main_content_expr` (boilerplate/chrome
    removal, plus the good-neighbor ``smooth`` pass when requested);
    text/plain payloads are unaffected either way.

    ``max_replacement_ratio`` drops documents whose extracted text is
    mostly U+FFFD replacement chars: binary payloads that slipped the
    Content-Type filter (no header → treated as HTML, e.g. a PDF or
    image served without headers) decode to replacement-char mojibake,
    and so do wrong-charset pages — both are garbage for a training
    corpus. 0.3 is deliberately lenient (real mixed-encoding pages sit
    far below it); ``None`` disables."""
    ct = http_content_type_expr(payload_col)
    body = http_body_expr(payload_col)
    passthrough = [c for c in df.columns if c != payload_col]
    out = df.filter(F.col("warc_type") == "response")
    if status_range is not None:
        status = http_status_expr(payload_col)
        out = out.filter(
            status.isNull() | status.between(*status_range)
        )
    out = out.withColumn("content_type", ct).filter(
        F.col("content_type").isin(*keep_content_types)
    )
    if main_content and smooth:
        # the smooth pass needs df-level staging (line + flag arrays
        # materialized once per row) — stage the body, smooth it, then
        # pick the branch
        out = extract_main_content(
            out.withColumn("_mc_body", body), "_mc_body", "_mc_text",
            smooth=True,
        )
        html_branch = F.col("_mc_text")
        body = F.col("_mc_body")
    else:
        html_branch = (
            main_content_expr(body)
            if main_content
            else html_to_text_expr(body)
        )
    # text/plain trims with the SAME regex chain the HTML branch ends
    # with (F.trim strips ASCII spaces only — a plain-text doc would
    # keep leading/trailing \r\n/\t the HTML branch removes)
    text = F.when(
        F.col("content_type") == "text/plain", trim_text_expr(body)
    ).otherwise(html_branch)
    out = (
        out.select(*passthrough, "content_type", text.alias(text_col))
        .filter(F.length(text_col) >= min_chars)
    )
    if max_replacement_ratio is not None:
        t = F.col(text_col)
        n_bad = F.length(t) - F.length(
            F.replace(t, F.lit("�"), F.lit(""))
        )
        out = out.filter(
            n_bad.cast("double")
            <= F.lit(max_replacement_ratio) * F.length(t)
        )
    return out
