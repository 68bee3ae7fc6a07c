"""Image-text pair preparation (round 13): pair every ``<img>`` in
parsed HTML with its alt text, its ``<figcaption>`` (when the image
sits in a ``<figure>``), and the tag-stripped text surrounding the
tag — the (image_ref, caption, context) rows a multimodal training
pipeline ingests before fetching/decoding the referenced bytes.

Plan shape (the 100 TB story): ONE narrow projection over the HTML
column does everything — ``regexp_extract_all`` for the img tags and
figure blocks, ``split`` on the img pattern for the surrounding
segments — then a single ``posexplode``. No shuffle at all: the
operator is a flat-map in the ingestion scan's stage, exactly like
``linkgraph.html_links_expr``. Output composes directly with
``multimodal.image_dhash`` (dedup by image_ref's fetched payload) and
``web.url_dedup`` (canonicalize image_ref).

Engine discipline: every pattern is in the RE2 ∩ Java-regex subset
(no backreferences, no lookaround; inline ``(?is)`` flags only), the
same rule `html_to_text_expr` follows, so the DuckDB twin
(:func:`image_text_pairs_sql`) is the identical chain and the
differential test compares them row-for-row.

Documented trades (both engines, identically): only quoted
``src``/``alt`` values are recognized (unquoted attributes are rare
in modern HTML and ambiguous to close); figcaption association is by
SRC EQUALITY between the figure block's own <img> and the document's
— a figure whose caption refers to an image by other means does not
pair; context is bounded to ``context_chars`` on each side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: one <img ...> tag (RE2- and Java-safe; case-insensitive)
IMG_TAG_RE = r"(?i)<img\b[^>]*>"
#: quoted src attribute; group 1 = the reference
SRC_RE = r"""(?i)\bsrc\s*=\s*["']([^"']+)["']"""
#: quoted alt attribute; group 1 = the text (may be empty)
ALT_RE = r"""(?i)\balt\s*=\s*["']([^"']*)["']"""
#: a whole <figure>...</figure> block (dotall, non-greedy)
FIGURE_RE = r"(?is)<figure\b.*?</figure>"
#: figcaption body inside a figure block
FIGCAP_RE = r"(?is)<figcaption\b[^>]*>(.*?)</figcaption>"
#: any tag, dotall (for context stripping)
_TAG_RE = r"(?s)<[^>]*>"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _clean(col: Column) -> Column:
    """Tag-strip + whitespace-collapse + trim — the context/caption
    normalizer (a deliberately light version of html_to_text_expr:
    these are small inter-tag segments, not whole documents)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(col, _TAG_RE, " "), r"[ \t\n\x0b\f\r]+", " "
        )
    )


def _clean_sql(expr: str) -> str:
    tag = _TAG_RE.replace("'", "''")
    return (
        f"trim(regexp_replace(regexp_replace({expr}, '{tag}', ' ', 'g'),"
        f" '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))"
    )


def _right(col: Column, n: int) -> Column:
    """Last ``n`` chars — spelled as an explicit CASE so Spark and
    DuckDB agree on the short-string edge (negative-position
    substring semantics differ between engines)."""
    ln = F.length(col)
    return F.when(ln <= n, col).otherwise(F.substring(col, ln - n + 1, n))


def _right_sql(expr: str, n: int) -> str:
    return (
        f"CASE WHEN length({expr}) <= {n} THEN {expr} "
        f"ELSE substring({expr}, length({expr}) - {n} + 1, {n}) END"
    )


def image_text_pairs(
    df: DataFrame,
    html_col: str = "payload",
    id_col: str = "doc_id",
    context_chars: int = 160,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id_col, img_idx, image_ref, alt, caption, context,
    *carry_cols) — one row per ``<img>`` tag in document order.

    - ``image_ref``: the quoted src value, NULL when absent/empty.
    - ``alt``: the quoted alt value, NULL when absent/empty.
    - ``caption``: the tag-stripped figcaption of the FIRST
      ``<figure>`` block whose own <img> src equals this image_ref,
      NULL otherwise.
    - ``context``: tag-stripped text around the tag — the trailing
      ``context_chars`` of the preceding inter-img segment plus the
      leading ``context_chars`` of the following one, NULL when both
      are empty.

    ``carry_cols`` ride the projection (e.g. ``target_uri`` /
    ``capture_id`` from ``read_warc`` rows), so the output joins back
    to ingestion frames without re-scanning archives."""
    c = _c(html_col)
    base = df.select(
        F.col(id_col),
        *[F.col(x) for x in carry_cols],
        F.regexp_extract_all(c, F.lit(IMG_TAG_RE), 0).alias("_imgs"),
        F.split(c, IMG_TAG_RE).alias("_segs"),
        F.transform(
            F.regexp_extract_all(c, F.lit(FIGURE_RE), 0),
            lambda b: F.struct(
                F.regexp_extract(b, SRC_RE, 1).alias("src"),
                _clean(F.regexp_extract(b, FIGCAP_RE, 1)).alias("cap"),
            ),
        ).alias("_figs"),
    )
    ex = base.select(
        F.col(id_col),
        *[F.col(x) for x in carry_cols],
        "_segs",
        "_figs",
        F.posexplode("_imgs").alias("img_idx", "_tag"),
    )
    ref = F.regexp_extract(F.col("_tag"), SRC_RE, 1)
    alt = F.regexp_extract(F.col("_tag"), ALT_RE, 1)
    # F.get is 0-based and NULL out-of-bounds under ANSI mode (an
    # element_at miss would THROW with spark.sql.ansi.enabled=true)
    before = _right(_clean(F.get(F.col("_segs"), F.col("img_idx"))),
                    context_chars)
    after = F.substring(
        _clean(F.get(F.col("_segs"), F.col("img_idx") + 1)),
        1, context_chars,
    )
    ctx = F.trim(
        F.concat(
            F.coalesce(before, F.lit("")),
            F.lit(" "),
            F.coalesce(after, F.lit("")),
        )
    )
    cap = F.get(
        F.filter(
            F.col("_figs"),
            lambda p: (p["src"] != "") & (p["src"] == ref),
        ),
        0,
    )["cap"]
    null_if_empty = lambda col: F.when(col == "", None).otherwise(col)  # noqa: E731
    return ex.select(
        F.col(id_col),
        F.col("img_idx"),
        null_if_empty(ref).alias("image_ref"),
        null_if_empty(alt).alias("alt"),
        null_if_empty(cap).alias("caption"),
        null_if_empty(ctx).alias("context"),
        *[F.col(x) for x in carry_cols],
    )


def image_text_pairs_sql(
    table: str,
    html_col: str = "payload",
    id_col: str = "doc_id",
    context_chars: int = 160,
) -> str:
    """DuckDB twin of :func:`image_text_pairs` — the identical
    pattern chain (the constants above, escaped), the same segment
    arithmetic, the same NULL semantics; differential-tested
    row-for-row."""

    def lit(s: str) -> str:
        # single quotes only: DuckDB regular strings are backslash-
        # literal, so the Java pattern text passes through verbatim
        return s.replace("'", "''")

    img, src, alt = lit(IMG_TAG_RE), lit(SRC_RE), lit(ALT_RE)
    fig, figcap = lit(FIGURE_RE), lit(FIGCAP_RE)
    n = context_chars
    before = _right_sql("_before_clean", n)
    return f"""
WITH base AS (
  SELECT {id_col},
    regexp_extract_all({html_col}, '{img}', 0) AS imgs,
    regexp_split_to_array({html_col}, '{img}') AS segs,
    list_transform(regexp_extract_all({html_col}, '{fig}', 0),
      b -> struct_pack(
        src := regexp_extract(b, '{src}', 1),
        cap := {_clean_sql(f"regexp_extract(b, '{figcap}', 1)")}
      )) AS figs
  FROM {table}
),
rows AS (
  SELECT {id_col}, CAST(i - 1 AS INT) AS img_idx,
    regexp_extract(imgs[i], '{src}', 1) AS ref,
    regexp_extract(imgs[i], '{alt}', 1) AS alt_txt,
    {_clean_sql("segs[i]")} AS _before_clean,
    {_clean_sql("segs[i + 1]")} AS _after_clean,
    figs
  FROM base, LATERAL unnest(generate_series(1, len(imgs))) AS g(i)
)
SELECT {id_col}, img_idx,
  nullif(ref, '') AS image_ref,
  nullif(alt_txt, '') AS alt,
  nullif(list_filter(figs, p -> p.src <> '' AND p.src = ref)[1].cap, '')
    AS caption,
  nullif(trim(concat(coalesce({before}, ''), ' ',
    coalesce(substring(_after_clean, 1, {n}), ''))), '') AS context
FROM rows
"""
