"""Text analysis operators over a documents table
(doc_id, text, lang, source, n_chars).

All JVM-side column expressions — no Python in the hot path. Each
operator is a DataFrame → DataFrame function; equivalent DuckDB SQL
lives beside it for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cryo_spark.operators.util import bt, spread

# small public stopword sets for the n-gram language heuristic — the
# zero-dependency, hash-provable fallback. The PRODUCTION lang-ID for
# 20+ languages is the learned char-n-gram classifier in
# cryo_spark.operators.langid (round 16), which plugs into the
# pipeline via prepare_training_corpus(langid_model=) / CLI
# --langid-model and replaces this vote as the stage-1 verdict.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "von"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "pour", "une"],
    "es": ["el", "la", "los", "de", "que", "en", "es", "por", "con", "para"],
}


def token_count(text: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    c = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"[ \t\n\x0b\f\r]+"))
    ).cast("long")


def token_count_expr(col: str) -> str:
    """Spark-SQL text of :func:`token_count` over a named column —
    same CASE/trim/split tree, whitespace class characters embedded
    verbatim. Lets aggregate consumers (the funnel's per-boundary
    observe metrics) fold the whole metric into ONE parsed string."""
    return (
        f"CAST(CASE WHEN (trim({bt(col)}) = '') THEN 0 ELSE "
        f"size(split(trim({bt(col)}), '[ \t\n\x0b\f\r]+')) END AS BIGINT)"
    )


def token_count_sql(expr: str) -> str:
    return (
        f"CASE WHEN trim({expr}) = '' THEN 0 ELSE "
        f"len(regexp_split_to_array(trim({expr}), '[ \\t\\n\\x0b\\f\\r]+')) END::BIGINT"
    )


# --- Spark-SQL fragment builders (round 17) -------------------------
# The stopword/quality builders below used to assemble their
# expression trees one F.* call at a time: 10 stopword terms (x4
# languages in lang_best_expr) at ~6 py4j round trips per term put
# hundreds of driver round trips on EVERY construction of the
# text-profile/quality projections (optimization guide §1/§5 — pure
# driver latency). Each builder now emits ONE F.expr SQL string that
# parses to the IDENTICAL Catalyst tree: double literals carry the D
# suffix (a bare 0.4 parses as DECIMAL and would change arithmetic),
# whitespace regex classes embed the control characters verbatim in
# the literal, and term order/associativity matches the old
# left-to-right loop, so results are bit-identical and the physical
# plans unchanged (pinned in tests).

_WS = " \t\n\x0b\f\r"


def _spark_token_count_sql(c: str) -> str:
    """Spark-SQL spelling of :func:`token_count` (same tree)."""
    return (
        f"CAST(CASE WHEN trim({c}) = '' THEN 0 ELSE "
        f"size(split(trim({c}), '[{_WS}]+')) END AS BIGINT)"
    )


def _stop_hits_sql(c: str, words: list[str]) -> str:
    """Spark-SQL spelling of the per-language stopword hit sum."""
    return " + ".join(
        f"(size(split(concat(' ', lower({c}), ' '), ' {w} ')) - 1)"
        for w in words
    )


def word_stats_cols(text_col: str = "text") -> list:
    """The word_stats output columns (r18: exposed so the fused
    :func:`text_profile` can ride them in ONE projection — same
    expressions, single source of truth)."""
    c = bt(text_col)
    tc = _spark_token_count_sql(c)
    non_alnum = f"length(regexp_replace(lower({c}), '[a-z0-9{_WS}]', ''))"
    digits = f"length(regexp_replace({c}, '[^0-9]', ''))"
    uppers = f"length(regexp_replace({c}, '[^A-Z]', ''))"
    spaces = f"length(regexp_replace({c}, '[^{_WS}]', ''))"
    stop_hits = _stop_hits_sql(c, STOPWORDS["en"])
    return [
        F.expr(f"CAST(length({c}) AS BIGINT)").alias("n_chars"),
        F.expr(tc).alias("n_tokens"),
        F.expr(
            f"CASE WHEN {tc} > 0 THEN (length({c}) - {spaces}) / {tc} END"
        ).alias("mean_token_len"),
        F.expr(f"round({non_alnum} / greatest(length({c}), 1), 6)").alias(
            "punct_ratio"
        ),
        F.expr(f"round({digits} / greatest(length({c}), 1), 6)").alias(
            "digit_ratio"
        ),
        F.expr(f"round({uppers} / greatest(length({c}), 1), 6)").alias(
            "upper_ratio"
        ),
        F.expr(f"CAST({stop_hits} AS BIGINT)").alias("en_stopword_hits"),
    ]


def word_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality metrics: length, tokens, mean token
    length, punctuation / digit / uppercase / whitespace ratios,
    stopword hit count. Pure narrow projection — no shuffle."""
    df = spread(df)
    return df.select("doc_id", *word_stats_cols(text_col))


def word_stats_sql(table: str, text_col: str = "text") -> str:
    c = text_col
    n_tokens = token_count_sql(c)
    non_alnum = f"length(regexp_replace(lower({c}), '[a-z0-9 \\t\\n\\x0b\\f\\r]', '', 'g'))"
    digits = f"length(regexp_replace({c}, '[^0-9]', '', 'g'))"
    uppers = f"length(regexp_replace({c}, '[^A-Z]', '', 'g'))"
    spaces = f"length(regexp_replace({c}, '[^ \\t\\n\\x0b\\f\\r]', '', 'g'))"
    stop_hits = " + ".join(
        f"(len(string_split(concat(' ', lower({c}), ' '), ' {w} ')) - 1)"
        for w in STOPWORDS["en"]
    )
    return f"""
SELECT doc_id,
  length({c})::BIGINT AS n_chars,
  {n_tokens} AS n_tokens,
  CASE WHEN {n_tokens} > 0 THEN (length({c}) - {spaces}) / {n_tokens} END AS mean_token_len,
  round({non_alnum} / greatest(length({c}), 1), 6) AS punct_ratio,
  round({digits} / greatest(length({c}), 1), 6) AS digit_ratio,
  round({uppers} / greatest(length({c}), 1), 6) AS upper_ratio,
  ({stop_hits})::BIGINT AS en_stopword_hits
FROM {table}
"""


def lang_best_expr(text_col: str = "text") -> Column:
    """struct(score, lang) of the winning stopword-vote language —
    deterministic argmax: highest score, ties broken by lang desc
    (array_max on the struct ordering)."""
    c = bt(text_col)
    scores = ", ".join(
        f"named_struct('score', CAST({_stop_hits_sql(c, words)} AS BIGINT), "
        f"'lang', '{lang}')"
        for lang, words in STOPWORDS.items()
    )
    return F.expr(f"array_max(array({scores}))")


def lang_id_cols(text_col: str = "text") -> list:
    """lang_id's output columns (for the fused :func:`text_profile`)."""
    best = lang_best_expr(text_col)
    return [
        best["lang"].alias("lang_guess"),
        best["score"].alias("lang_score"),
    ]


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language guess (deterministic heuristic,
    SURVEY-extension operator). Returns doc_id, lang_guess, lang_score
    (hits of the winning language)."""
    df = spread(df)
    return df.select("doc_id", *lang_id_cols(text_col))


def lang_id_sql(table: str, text_col: str = "text") -> str:
    pieces = []
    for lang, words in STOPWORDS.items():
        hits = " + ".join(
            f"(len(string_split(concat(' ', lower({text_col}), ' '), ' {w} ')) - 1)"
            for w in words
        )
        pieces.append(f"SELECT doc_id, '{lang}' AS lang, ({hits})::BIGINT AS score FROM {table}")
    union = " UNION ALL ".join(pieces)
    # replicate Spark array_max on struct(score, lang): ties pick the
    # LARGEST lang string. DuckDB max_by lacks composite keys — encode
    # (score, lang) as a zero-padded sortable string.
    return f"""
SELECT doc_id,
  max_by(lang, lpad(score::VARCHAR, 12, '0') || lang) AS lang_guess,
  max(score)::BIGINT AS lang_score
FROM ({union}) GROUP BY doc_id
"""


# GPT-2-style pretokenizer shape (public BPE regex family), without
# lookaheads so Spark (java.util.regex) and DuckDB (RE2) agree:
# contractions | space?letters | space?digits | space?punct-run | spaces
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^ \t\n\x0b\f\rA-Za-z0-9]+|[ \t\n\x0b\f\r]+"


def bpe_pieces_expr(text_col: str = "text") -> Column:
    """array<string> of BPE pretokenizer pieces (JVM regex)."""
    return F.expr(f"regexp_extract_all({text_col}, \"{BPE_PATTERN}\", 0)")


def bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish token count: number of pretokenizer pieces (the
    dominant cost driver for LLM training budgets). JVM-side
    regexp_extract_all — no Python."""
    df = spread(df)
    return df.select("doc_id", *bpe_token_count_cols(text_col))


def bpe_token_count_cols(text_col: str = "text") -> list:
    """bpe_token_count's output columns (for the fused
    :func:`text_profile`)."""
    c = F.col(text_col)
    pieces = bpe_pieces_expr(text_col)
    return [
        F.size(pieces).cast("long").alias("n_bpe_tokens"),
        token_count(c).alias("n_ws_tokens"),
        F.length(c).cast("long").alias("n_chars"),
    ]


def bpe_token_count_sql(table: str, text_col: str = "text") -> str:
    pat = BPE_PATTERN.replace("'", "''")
    return f"""
SELECT doc_id,
  len(regexp_extract_all({text_col}, '{pat}'))::BIGINT AS n_bpe_tokens,
  {token_count_sql(text_col)} AS n_ws_tokens,
  length({text_col})::BIGINT AS n_chars
FROM {table}
"""


def quality_score_expr(text_col: str = "text") -> Column:
    """The composite quality score expression in [0,1]:
    0.4*length_ok + 0.3*stopword_ok + 0.3*(1 - punct_noise)."""
    c = bt(text_col)
    tc = _spark_token_count_sql(c)
    stop_hits = _stop_hits_sql(c, STOPWORDS["en"])
    non_alnum = f"length(regexp_replace(lower({c}), '[a-z0-9{_WS}]', ''))"
    length_ok = f"least(length({c}) / 500.0D, 1.0D)"
    stopword_ok = (
        f"least(({stop_hits}) / greatest(CAST({tc} AS DOUBLE) * 0.06D, 1.0D),"
        " 1.0D)"
    )
    punct_noise = (
        f"least({non_alnum} / greatest(CAST(length({c}) AS DOUBLE) * 0.25D,"
        " 1.0D), 1.0D)"
    )
    return F.expr(
        f"0.4D * {length_ok} + 0.3D * {stopword_ok} + 0.3D * (1 - {punct_noise})"
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite document-quality score in [0,1] from length,
    stopword density and symbol noise (the usual pretraining-filter
    heuristics: C4/Gopher-style rules, expressed as one projection).

    score = 0.4*length_ok + 0.3*stopword_ok + 0.3*(1 - punct_noise)
    """
    df = spread(df)
    score = quality_score_expr(text_col)
    return df.select(
        "doc_id",
        F.round(score, 6).alias("quality_score"),
        (score >= 0.5).alias("keep"),
    )


def quality_score_sql(table: str, text_col: str = "text") -> str:
    c = text_col
    n_tokens = token_count_sql(c)
    non_alnum = f"length(regexp_replace(lower({c}), '[a-z0-9 \\t\\n\\x0b\\f\\r]', '', 'g'))"
    stop_hits = " + ".join(
        f"(len(string_split(concat(' ', lower({c}), ' '), ' {w} ')) - 1)"
        for w in STOPWORDS["en"]
    )
    score = (
        f"0.4 * least(length({c}) / 500.0, 1.0) "
        f"+ 0.3 * least(({stop_hits}) / greatest({n_tokens} * 0.06, 1.0), 1.0) "
        f"+ 0.3 * (1 - least({non_alnum} / greatest(length({c}) * 0.25, 1.0), 1.0))"
    )
    return f"""
SELECT doc_id, round({score}, 6) AS quality_score, ({score}) >= 0.5 AS keep
FROM {table}
"""


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition metrics (public filter family: Rae et
    al. 2021 §A1.1 duplicate/top n-gram fractions), per document:

    - n_2grams: word-bigram occurrences
    - dup_2gram_frac: fraction of bigram occurrences that are repeats
      (1 - distinct/total)
    - top_2gram_frac: occurrences of the most frequent bigram / total

    Shuffle-free by construction: token explode + groupBy would
    shuffle |tokens| rows across the cluster; instead each doc's
    bigram array is sorted in place and ONE aggregate pass counts
    distinct values and the longest equal-run simultaneously —
    O(L log L) per row, whole-stage-codegen JVM expressions, so the
    operator composes into any scan without an exchange."""
    df = spread(df)
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"[ \t\n\x0b\f\r]+", " ")
    toks = df.select("doc_id", F.split(norm, " ").alias("t"))
    t = F.col("t")
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - 1, F.lit(1)))
    grams = F.when(F.size(t) >= 2, F.transform(
        idx, lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1))
    )).otherwise(F.array().cast("array<string>"))
    binds = toks.select("doc_id", F.array_sort(grams).alias("grams"))
    return binds.select("doc_id", *_rep_cols(F.col("grams")))


def _rep_cols(grams: Column) -> list[Column]:
    """The three repetition output columns from a SORTED gram array:
    one aggregate pass tracks previous element, current run, best run,
    and distinct count together."""
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("uniq"),
    )

    def _merge(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
            (acc["uniq"] + F.when(x == acc["prev"], 0).otherwise(1)).alias("uniq"),
        )

    stats = F.aggregate(grams, acc0, _merge)
    n = F.size(grams)
    return [
        n.cast("long").alias("n_2grams"),
        F.when(n > 0, F.round(1 - stats["uniq"] / n, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_2gram_frac"),
        F.when(n > 0, F.round(stats["best"] / n, 6))
        .otherwise(F.lit(0.0))
        .alias("top_2gram_frac"),
    ]


def quality_with_repetition(df: DataFrame, text_col: str = "text") -> DataFrame:
    """quality_score + repetition metrics in ONE narrow projection
    chain (bind the sorted-gram array beside the raw text, then
    compute every output) — no join, no shuffle: the shape a 100 TB
    quality-filter pass wants, all metrics from one scan."""
    df = spread(df)
    # bind the token array to a concrete column BEFORE the gram
    # lambda: expressions inside transform() re-inline per element
    # access, so an unbound split would re-run regexp+split for every
    # gram (the hazard documented in dedup.shingle_rows)
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"[ \t\n\x0b\f\r]+", " ")
    bound = df.select("doc_id", text_col, F.split(norm, " ").alias("t"))
    t = F.col("t")
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - 1, F.lit(1)))
    grams = F.when(F.size(t) >= 2, F.transform(
        idx, lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1))
    )).otherwise(F.array().cast("array<string>"))
    binds = bound.select("doc_id", text_col, F.array_sort(grams).alias("grams"))
    score = quality_score_expr(text_col)
    return binds.select(
        "doc_id",
        F.round(score, 6).alias("quality_score"),
        (score >= 0.5).alias("keep"),
        *_rep_cols(F.col("grams")),
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The fused six-part per-document profile (r18, guide §2.4 /
    §1.2 step 1): word_stats + lang_id + content fingerprint (md5
    column) + BPE token count + PII redaction + quality/repetition in
    ONE projection chain over ONE scan.

    The former spelling joined the six per-doc projections on doc_id
    — six scans of the text column plus five joins whose only job was
    to re-attach columns by the table's unique key. An inner join of
    row-wise projections of the SAME frame on a unique key is exactly
    a single projection (each part emits one row per input row), so
    this fusion is result-identical by construction — pinned
    old-vs-new in tests and by the unchanged DuckDB oracle. At scale
    it is the difference between reading the corpus once and six
    times. Column order matches the old join output.

    The gram array is bound through the same two-step select chain
    :func:`quality_with_repetition` uses (an unbound array would
    re-inline the split per element access)."""
    df = spread(df)
    norm = F.regexp_replace(
        F.trim(F.lower(F.col(text_col))), r"[ \t\n\x0b\f\r]+", " "
    )
    bound = df.select("doc_id", text_col, F.split(norm, " ").alias("t"))
    t = F.col("t")
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - 1, F.lit(1)))
    grams = F.when(F.size(t) >= 2, F.transform(
        idx, lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1))
    )).otherwise(F.array().cast("array<string>"))
    binds = bound.select(
        "doc_id", text_col, F.array_sort(grams).alias("grams")
    )
    score = quality_score_expr(text_col)
    fp = fingerprint_cols(text_col)
    bpe = bpe_token_count_cols(text_col)
    return binds.select(
        "doc_id",
        *word_stats_cols(text_col),
        *lang_id_cols(text_col),
        fp[1],           # content_md5 (the xxhash fingerprint column
                         # was dropped by the old join spelling too)
        bpe[0],          # n_bpe_tokens
        bpe[1],          # n_ws_tokens (n_chars deduped into word_stats')
        *redact_pii_cols(text_col),
        F.round(score, 6).alias("quality_score"),
        (score >= 0.5).alias("keep"),
        *_rep_cols(F.col("grams")),
    )


def quality_with_repetition_sql(table: str, text_col: str = "text") -> str:
    return f"""
SELECT q.doc_id, q.quality_score, q.keep,
  r.n_2grams, r.dup_2gram_frac, r.top_2gram_frac
FROM ({quality_score_sql(table, text_col)}) q
JOIN ({repetition_stats_sql(table, text_col)}) r ON r.doc_id = q.doc_id
"""


def repetition_stats_sql(table: str, text_col: str = "text") -> str:
    """DuckDB oracle: same metrics via unnest + group-by (the oracle
    need not be shuffle-free)."""
    norm = f"regexp_replace(trim(lower({text_col})), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')"
    return f"""
WITH toks AS (
  SELECT doc_id, string_split({norm}, ' ') AS t FROM {table}
), grams AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS gram
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS g(i)
  WHERE len(t) >= 2
), counts AS (
  SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram
), per_doc AS (
  SELECT doc_id, sum(c) AS total, count(*) AS uniq, max(c) AS top
  FROM counts GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(p.total, 0)::BIGINT AS n_2grams,
  coalesce(round(1 - p.uniq / p.total, 6), 0.0) AS dup_2gram_frac,
  coalesce(round(p.top / p.total, 6), 0.0) AS top_2gram_frac
FROM {table} d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
"""


def fingerprint_cols(text_col: str = "text") -> list:
    """fingerprint's output columns (for the fused
    :func:`text_profile`)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"[ \t\n\x0b\f\r]+", " ")
    return [
        F.xxhash64(norm).alias("fingerprint"),
        F.md5(norm).alias("content_md5"),
    ]


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: xxhash64 of the whitespace-normalized,
    lowercased text (rolling-hash analog, JVM-side)."""
    df = spread(df)
    return df.select("doc_id", *fingerprint_cols(text_col))


def fingerprint_sql(table: str, text_col: str = "text") -> str:
    # DuckDB has no xxhash64 — oracle covers the md5 fingerprint only
    norm = f"regexp_replace(trim(lower({text_col})), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')"
    return f"SELECT doc_id, md5({norm}) AS content_md5 FROM {table}"


# PII patterns chosen to parse identically under java.util.regex
# (Spark) and RE2 (DuckDB): no lookarounds, no backrefs. Public
# redaction-pass shapes (email / long digit runs / IPv4).
PII_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
    "ipv4": (
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
}


def redact_text_expr(text_col: str = "text") -> Column:
    """The bare redaction expression (fold of the PII regexes) — for
    callers that replace a text column IN PLACE inside an existing
    projection instead of joining :func:`redact_pii`'s frame back
    (one subtree evaluation instead of two)."""
    out = F.col(text_col)
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails / phone-shaped digit runs / IPv4s with typed
    placeholder tokens and count replacements per category. One
    narrow projection, JVM regex only — the redaction pass a corpus
    makes right before tokenization. Returns
    (doc_id, redacted_text, n_email, n_phone, n_ipv4)."""
    df = spread(df)
    return df.select("doc_id", *redact_pii_cols(text_col))


def redact_pii_cols(text_col: str = "text") -> list:
    """redact_pii's output columns (for the fused
    :func:`text_profile`)."""
    c = F.col(text_col)
    counts = {}
    out = c
    for name, (pat, token) in PII_PATTERNS.items():
        # count = length delta / match length is wrong for var-length
        # matches; count occurrences by splitting on the pattern
        counts[name] = F.size(F.split(out, pat, -1)) - 1
        out = F.regexp_replace(out, pat, token)
    return [
        out.alias("redacted_text"),
        *[counts[n].cast("long").alias(f"n_{n}") for n in PII_PATTERNS],
    ]


def redact_pii_sql(table: str, text_col: str = "text") -> str:
    # nested projections so each count/replace sees the previous
    # replacement output, mirroring the Spark fold order
    step = f"SELECT doc_id, {text_col} AS _t0 FROM {table}"
    for i, (name, (pat, token)) in enumerate(PII_PATTERNS.items()):
        p = pat.replace("'", "''")
        step = (
            f"SELECT *, "
            f"(len(regexp_split_to_array(_t{i}, '{p}')) - 1)::BIGINT AS n_{name}, "
            f"regexp_replace(_t{i}, '{p}', '{token}', 'g') AS _t{i + 1} "
            f"FROM ({step})"
        )
    last = f"_t{len(PII_PATTERNS)}"
    names = ", ".join(f"n_{n}" for n in PII_PATTERNS)
    return f"SELECT doc_id, {last} AS redacted_text, {names} FROM ({step})"


def top_ngrams(
    df: DataFrame, text_col: str = "text", n: int = 2, k: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide top-k most frequent word n-grams (occurrence
    counts, not document frequency) — the vocabulary/boilerplate
    inspection pass a pipeline runs before choosing dedup and filter
    thresholds. Deterministic total order: count desc, ngram asc.

    Scale shape: the n-gram explode is narrow (tokens bound once per
    document, same shape as the shingle stream); the count is a
    partial aggregate (hot n-grams combine map-side, one row per
    map task crosses the wire) and the top-k is TakeOrderedAndProject
    — per-task k-row heaps, driver merges k rows per task, the
    corpus-sized count table never fully sorts."""
    from cryo_spark.operators.dedup import shingle_rows

    return (
        shingle_rows(df, text_col, n, id_col)
        .groupBy(F.col("shingle").alias("ngram"))
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .orderBy(F.desc("occurrences"), "ngram")
        .limit(k)
    )


def top_ngrams_sql(
    table: str, text_col: str = "text", n: int = 2, k: int = 100
) -> str:
    """DuckDB equivalent of :func:`top_ngrams` (mirrors the
    shingle_rows gram grid: docs shorter than n words emit one
    whole-doc gram)."""
    norm = f"regexp_replace(trim(lower({text_col})), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')"
    return f"""
WITH toks AS (
  SELECT string_split({norm}, ' ') AS t FROM {table}
), grams AS (
  SELECT CASE WHEN len(t) >= {n}
       THEN array_to_string(t[g.i:g.i + {n - 1}], ' ')
       ELSE array_to_string(t, ' ') END AS ngram
  FROM toks,
    LATERAL unnest(generate_series(1, greatest(len(t) - {n - 1}, 1))) AS g(i)
)
SELECT ngram, count(*)::BIGINT AS occurrences
FROM grams GROUP BY ngram
ORDER BY occurrences DESC, ngram LIMIT {k}
"""


_KW_CACHE: list[DataFrame] = []


def release_keyword_cache(keep: int = 0) -> None:
    """Unpersist tf frames cached by :func:`keyword_extract` (same
    contract as ``dedup.release_verify_cache``: the PREVIOUS call's
    frame stays cached because its lazy result may not have executed
    yet; only older frames release)."""
    while len(_KW_CACHE) > keep:
        try:
            _KW_CACHE.pop(0).unpersist()
        except Exception:  # noqa: BLE001 - session already stopped
            pass


def keyword_extract(
    df: DataFrame, text_col: str = "text", k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf with LINEAR
    idf (score = tf * n_docs / doc_freq). Linear idf is chosen over
    ln(n_docs/doc_freq) deliberately: multiply and divide are
    IEEE-correctly-rounded, so the score — and therefore the ranking
    and the oracle hash — is bit-identical on any engine, while log
    implementations legally differ in the last ulp (Java Math.log
    guarantees 1 ulp, not correct rounding). The ranking differs from
    log-idf only where tf differences fight idf differences; for the
    "what is this document about" use both are heuristics.

    Returns (doc_id, rank, term, tfidf). Scale shape: tf is a partial
    count agg on (doc, term); doc_freq reuses tf's output (one count
    agg on term — partial, skew-immune for stopwords); n_docs is a
    1-row broadcast; the per-doc top-k window sorts only each doc's
    distinct terms."""
    from pyspark.sql import Window

    df = spread(df)
    terms = df.select(
        F.col(id_col),
        F.explode(
            F.split(
                F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"[ \t\n\x0b\f\r]+", " "),
                " ",
            )
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # r18 (guide §2.4): doc_freq is DERIVED from tf, but without a
    # materialization the optimizer prunes the count column out of the
    # df branch's copy of the subtree, the two exchanges stop being
    # canonically equal, and the scan+explode+partial-agg chain runs
    # TWICE per action (profiled: two map stages each reading the
    # full spread output). One persisted tf table (distinct
    # (doc, term) pairs — far smaller than the term stream) feeds
    # both consumers; same keep-latest-two release discipline as the
    # dedup verify cache.
    release_keyword_cache(keep=1)
    tf = tf.persist()
    _KW_CACHE.append(tf)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            ((F.col("tf") * F.col("n_docs")) / F.col("df_docs")).alias("_s"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_s"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.round("_s", 6).alias("tfidf"),
        )
    )


def keyword_extract_sql(
    table: str, text_col: str = "text", k: int = 5
) -> str:
    norm = f"regexp_replace(trim(lower({text_col})), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')"
    return f"""
WITH terms AS (
  SELECT doc_id, u.term
  FROM (SELECT doc_id, string_split({norm}, ' ') AS t FROM {table}),
    LATERAL unnest(t) AS u(term)
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS df_docs FROM tf GROUP BY term
), nd AS (
  SELECT count(*) AS n_docs FROM {table}
)
SELECT doc_id, rank, term, tfidf FROM (
  SELECT tf.doc_id, tf.term,
    row_number() OVER (
      PARTITION BY tf.doc_id
      ORDER BY (tf.tf * nd.n_docs) / dfreq.df_docs DESC, tf.term
    )::BIGINT AS rank,
    round((tf.tf * nd.n_docs) / dfreq.df_docs, 6) AS tfidf
  FROM tf JOIN dfreq USING (term), nd
) WHERE rank <= {k}
"""


def ngram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
) -> DataFrame:
    """Per-document bigram language-model score — the CCNet/Gopher
    perplexity-filter shape, self-trained: the corpus's own bigram
    statistics score each document, and documents whose word
    transitions are atypical for the corpus (garbage, wrong-language,
    shuffled text) score low. Returns (id, n_bigrams, avg_logp) where
    avg_logp = mean over the doc's bigrams of
    ln((count(w1,w2) + add_k) / (count(w1) + add_k * V)), V = corpus
    vocabulary size. Higher = more typical.

    No external model: train and score are the same two aggregations.
    Scale shape: unigram/bigram count tables are partial aggregates
    (stopword bigrams combine map-side); scoring joins the doc's
    exploded bigrams against the count tables on their own keys (two
    shuffles that each reuse the count exchange) and the per-doc mean
    is a final partial agg. ln() keeps this out of the exact-hash
    oracle contract (cross-engine last-ulp drift) — verified instead
    by a tolerance differential against a numpy reference and planted
    ordering tests."""
    from cryo_spark.operators.dedup import shingle_rows

    uni = shingle_rows(df, text_col, 1, id_col)
    bi = shingle_rows(df, text_col, 2, id_col)
    uni_counts = uni.groupBy(F.col("shingle").alias("w1")).agg(
        F.count(F.lit(1)).alias("c1")
    )
    vocab = uni_counts.agg(F.count(F.lit(1)).alias("v"))
    bi_counts = bi.groupBy(F.col("shingle").alias("bg")).agg(
        F.count(F.lit(1)).alias("c2")
    )
    doc_bi = bi.select(
        F.col(id_col),
        F.col("shingle").alias("bg"),
        F.split(F.col("shingle"), " ").getItem(0).alias("w1"),
    )
    scored = (
        doc_bi.join(bi_counts, "bg")
        .join(uni_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.log(
                (F.col("c2") + F.lit(add_k))
                / (F.col("c1") + F.lit(add_k) * F.col("v"))
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("_lp").alias("avg_logp"),
    )
