"""Benchmark decontamination: flag training documents that share
word n-grams with a held-out evaluation set.

The standard pretraining hygiene step (public method: GPT-3 appendix C
/ PaLM / Llama reports — n-gram overlap against benchmark text): a
training doc is contaminated when any length-n word shingle also
appears in the eval corpus.

Scale design (the 100 TB story): the eval side is benchmark-sized
(MBs — thousands of documents), the training side is the 100 TB
corpus. The eval shingle set is deduplicated and BROADCAST, so the
corpus-side plan is scan -> shingle explode -> broadcast hash join ->
partial count — no shuffle of corpus data at all; the only exchange is
the per-doc hit-count aggregation, which carries only matched rows
(benchmark-overlap-sized, tiny). The final left join back to the doc
list reuses the corpus scan and joins against an aggregate that is at
most |matched docs| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cryo_spark.operators.dedup import shingle_rows


def ngram_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """(id, n_contaminated_ngrams, contaminated) per training doc.

    ``n_contaminated_ngrams`` = number of DISTINCT word n-grams of the
    doc that appear anywhere in ``eval_docs``; ``contaminated`` when at
    least ``min_hits`` such shingles exist. Shingle semantics follow
    :func:`cryo_spark.operators.dedup.shingle_rows` (docs shorter than
    ``n`` tokens contribute their whole text as one shingle).
    """
    eval_grams = (
        shingle_rows(eval_docs, text_col, n, id_col).select("shingle").distinct()
    )
    doc_grams = shingle_rows(docs, text_col, n, id_col)
    hits = (
        doc_grams.join(F.broadcast(eval_grams), "shingle")
        .groupBy(id_col)
        .agg(F.countDistinct("shingle").alias("n_contaminated_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated_ngrams", F.lit(0))
            .cast("long")
            .alias("n_contaminated_ngrams"),
        )
        .withColumn("contaminated", F.col("n_contaminated_ngrams") >= min_hits)
    )


def ngram_decontaminate_sql(
    table: str,
    eval_pred: str,
    train_pred: str,
    n: int = 5,
    text_col: str = "text",
    min_hits: int = 1,
) -> str:
    """DuckDB equivalent: ``eval_pred`` / ``train_pred`` are WHERE
    predicates over ``table`` selecting the two corpora."""
    norm = f"regexp_replace(trim(lower({text_col})), '\\s+', ' ', 'g')"
    return f"""
WITH toks AS (
  SELECT doc_id, {eval_pred} AS is_eval, string_split({norm}, ' ') AS t
  FROM {table} WHERE ({eval_pred}) OR ({train_pred})
), sh AS (
  SELECT DISTINCT doc_id, is_eval,
    CASE WHEN len(t) >= {n}
         THEN array_to_string(t[i:i+{n - 1}], ' ')
         ELSE array_to_string(t, ' ') END AS shingle
  FROM toks, LATERAL unnest(generate_series(1, greatest(len(t) - {n - 1}, 1))) AS g(i)
), eval_sh AS (
  SELECT DISTINCT shingle FROM sh WHERE is_eval
), hits AS (
  SELECT s.doc_id, count(DISTINCT s.shingle) AS n_hit
  FROM sh s JOIN eval_sh e ON s.shingle = e.shingle
  WHERE NOT s.is_eval
  GROUP BY s.doc_id
)
SELECT d.doc_id,
  coalesce(h.n_hit, 0)::BIGINT AS n_contaminated_ngrams,
  coalesce(h.n_hit, 0) >= {min_hits} AS contaminated
FROM {table} d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE {train_pred.replace('doc_id', 'd.doc_id')}
"""
