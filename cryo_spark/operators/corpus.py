"""End-to-end pretraining-corpus cleaning: the composed pipeline a
training-data job actually runs — quality filter → language filter →
exact dedup → token accounting — expressed as ONE Spark plan.

Plan shape (the scale property): every per-document feature (quality
score, language vote, BPE token count, content hash) is computed in a
single narrow projection over one scan — no self-joins of derived
frames. The only shuffle is the dedup window on the content hash.
At 100 TB that means: one pass over the text bytes, one exchange
keyed by a 128-bit hash (uniformly distributed — no skew), then a
stream-filtered output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cryo_spark.operators import dedup, text
from cryo_spark.operators.util import spread


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.5,
    lang: str = "en",
) -> DataFrame:
    """Kept documents with their features: quality >= ``min_quality``,
    winning language == ``lang``, first (min doc_id) copy of each
    exact-duplicate group. Returns (doc_id, quality_score, lang_score,
    n_bpe_tokens)."""
    best = text.lang_best_expr(text_col)
    feats = spread(df).select(
        "doc_id",
        F.round(text.quality_score_expr(text_col), 6).alias("quality_score"),
        best["lang"].alias("lang_guess"),
        best["score"].alias("lang_score"),
        F.size(text.bpe_pieces_expr(text_col)).cast("long").alias("n_bpe_tokens"),
        F.md5(dedup._norm_text(text_col)).alias("content_key"),
    )
    w = Window.partitionBy("content_key")
    return (
        feats.withColumn("keeper_id", F.min("doc_id").over(w))
        .filter(
            (F.col("doc_id") == F.col("keeper_id"))
            & (F.col("quality_score") >= min_quality)
            & (F.col("lang_guess") == lang)
        )
        .select("doc_id", "quality_score", "lang_score", "n_bpe_tokens")
    )


def clean_corpus_sql(
    table: str,
    text_col: str = "text",
    min_quality: float = 0.5,
    lang: str = "en",
) -> str:
    """DuckDB oracle: CTE-composition of the per-operator oracles
    (join-heavy is fine here — result equality is the contract)."""
    return f"""
WITH q AS ({text.quality_score_sql(table, text_col)}),
     l AS ({text.lang_id_sql(table, text_col)}),
     t AS ({text.bpe_token_count_sql(table, text_col)}),
     d AS ({dedup.exact_dedup_sql(table, text_col)})
SELECT q.doc_id, q.quality_score, l.lang_score, t.n_bpe_tokens
FROM q
JOIN l ON l.doc_id = q.doc_id
JOIN t ON t.doc_id = q.doc_id
JOIN d ON d.doc_id = q.doc_id
WHERE NOT d.is_duplicate
  AND q.quality_score >= {min_quality}
  AND l.lang_guess = '{lang}'
"""
