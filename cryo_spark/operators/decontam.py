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

from pyspark.sql import DataFrame, Window
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
    norm = f"regexp_replace(trim(lower({text_col})), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')"
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


def fuzzy_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    min_est: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate decontamination: flag training docs whose
    MinHash signature collides with any eval doc in an LSH band and
    whose signature-estimated Jaccard clears ``min_est`` — catching
    paraphrased/reformatted benchmark leakage the exact n-gram
    overlap of :func:`ngram_decontaminate` misses (the fuzzy pass the
    Llama/GPT-4 reports describe alongside exact overlap).

    Built on `operators.incremental`: the eval set is indexed once
    (benchmark-sized — thousands of docs, k longs each) and the
    corpus side is a delta-vs-index band join, so corpus text is
    scanned once for signatures and never joined against eval text.
    Returns (id, max_est_jaccard, contaminated_by, contaminated) for
    every training doc, one row each. The two id spaces never mix
    (eval and corpus indexes stay separate frames on opposite join
    sides), so any id type works — including the signed xxhash64
    longs ``read_documents`` emits and string ids; a corpus doc
    matching an identical eval doc with the same id value is real
    contamination and is flagged, not suppressed.
    """
    from cryo_spark.operators.incremental import (
        _band_rows,
        est_jaccard,
        minhash_index,
    )

    eval_idx = minhash_index(
        eval_docs.select(id_col, text_col), text_col, k, n, id_col,
    )
    doc_idx = minhash_index(docs, text_col, k, n, id_col)
    eb = _band_rows(eval_idx, bands, id_col)
    db = _band_rows(doc_idx, bands, id_col)
    cand = (
        db.alias("d")
        .join(
            F.broadcast(eb.alias("e")),
            (F.col("d.band_id") == F.col("e.band_id"))
            & (F.col("d.band_hash") == F.col("e.band_hash")),
        )
        .select(
            F.col(f"d.{id_col}").alias("__did"),
            F.col(f"e.{id_col}").alias("__eid"),
        )
        .distinct()
    )
    scored = (
        cand.join(
            doc_idx.select(F.col(id_col).alias("__did"), F.col("sig").alias("sig_d")),
            "__did",
        )
        .join(
            F.broadcast(
                eval_idx.select(
                    F.col(id_col).alias("__eid"), F.col("sig").alias("sig_e")
                )
            ),
            "__eid",
        )
        .select(
            "__did",
            "__eid",
            est_jaccard(F.col("sig_d"), F.col("sig_e")).alias("est"),
        )
        .filter(F.col("est") >= min_est)
    )
    # the eval doc that PRODUCED the max estimate (not the max id
    # among all matches — those can be different documents); ties on
    # est break deterministically toward the smaller eval id. A
    # row_number window (not max_by over an id-negation struct) keeps
    # this correct for ANY id type — string ids and negative longs
    # included. The window input is the post-band candidate set,
    # benchmark-overlap-sized, not corpus-sized.
    best = (
        scored.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__did").orderBy(
                    F.desc("est"), F.asc("__eid")
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select(
            "__did",
            F.col("est").alias("max_est_jaccard"),
            F.col("__eid").alias("contaminated_by"),
        )
    )
    return (
        docs.select(id_col)
        .join(best.withColumnRenamed("__did", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("max_est_jaccard", F.lit(0.0)).alias("max_est_jaccard"),
            "contaminated_by",
            (F.col("max_est_jaccard").isNotNull()).alias("contaminated"),
        )
    )


def embedding_decontaminate(
    emb: DataFrame,
    eval_emb: DataFrame,
    min_cosine: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "fold",
    eval_cap: int = 200_000,
) -> DataFrame:
    """SEMANTIC decontamination (round 13, completing the family:
    exact n-gram -> fuzzy minhash -> embedding): flag corpus vectors
    whose cosine against ANY eval vector clears ``min_cosine`` —
    catching translated/heavily-paraphrased benchmark leakage both
    text passes miss. Returns one row per FLAGGED corpus vector:
    (id_col, eval_id, cosine) = its best-matching eval row
    (ties: max cosine first, then min eval id — a total order, so the
    row set is deterministic).

    Scale design: eval sets are benchmark-sized, the corpus is not —
    the eval side is BROADCAST and the corpus never shuffles
    (``method='fold'``: broadcast nested-loop join + the exact JVM
    zip_with cosine, the contract arithmetic the DuckDB twin
    :func:`embedding_decontaminate_sql` reproduces bit-for-bit;
    ``method='gemm'``: the eval matrix collects to the driver
    (bounded by ``eval_cap`` — it must fit every executor anyway)
    and ONE numpy GEMM per Arrow batch scores corpus rows against
    all of eval, the 10^4-eval x 10^10-corpus path). The per-doc max
    is a groupBy on the corpus id over MATCHED rows only
    (leakage-sized, tiny)."""
    import numpy as np
    import pandas as pd

    if method == "gemm":
        # output id types derive from the INPUT schemas (ADVICE r13:
        # the hardcoded 'long, long' crashed string-id frames the fold
        # path accepts — the same bug class _hard_negatives_gemm fixed)
        cid_t = emb.schema[id_col].dataType.simpleString()
        eid_t = eval_emb.schema[id_col].dataType.simpleString()
        out_schema = f"{id_col} {cid_t}, eval_id {eid_t}, cosine double"
        rows = eval_emb.select(id_col, vec_col).limit(eval_cap + 1).collect()
        if len(rows) > eval_cap:
            raise ValueError(
                f"eval side exceeds eval_cap={eval_cap} rows — an eval "
                "set this large should go through the near-dup index "
                "path, not a broadcast matrix"
            )
        if not rows:
            return emb.sparkSession.createDataFrame([], out_schema)
        # eval rows sorted ASCENDING by id so the per-row tie-break is
        # just argmax (first occurrence of the max cosine = min eval
        # id) — no lexsort per corpus row
        rows.sort(key=lambda r: r[0])
        eids = [r[0] for r in rows]
        mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])

        def to_matrix(pdf):
            return (
                pdf[id_col].tolist(),
                np.array(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                ),
            )

        score = _exact_gemm_score(
            mat, eids, float(min_cosine), id_col, to_matrix
        )
        return emb.select(id_col, vec_col).mapInPandas(score, out_schema)
    if method != "fold":
        raise ValueError(f"unknown method {method!r}: 'fold' or 'gemm'")
    def _norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda x: x.cast("double") * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    # norms computed ONCE per row on each side BEFORE the join — the
    # naive per-pair norm redoes the 64-element reduction |eval| times
    # per corpus row (bit-identical values either way: same ops, same
    # order, so the DuckDB twin's per-pair spelling still hash-matches;
    # the same device hard_negatives documents). Measured 3x on the
    # fold path at sf0.1.
    ev = F.broadcast(
        eval_emb.select(
            F.col(id_col).alias("eval_id"),
            F.col(vec_col).alias("_e_v"),
        ).withColumn("_e_n", _norm(F.col("_e_v")))
    )
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_col), F.col("_e_v"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = F.round(dot / (F.col("_t_n") * F.col("_e_n")), 8)
    hits = (
        emb.select(id_col, vec_col)
        .withColumn("_t_n", _norm(F.col(vec_col)))
        .crossJoin(ev)
        .select(F.col(id_col), F.col("eval_id"), cos.alias("cosine"))
        .filter(F.col("cosine") >= F.lit(float(min_cosine)))
    )
    # deterministic best match: max (cosine, -eval_id) struct —
    # identical lexicographic struct ordering in Spark and DuckDB.
    # Non-numeric eval ids can't be negated (round 14: the string-id
    # frame the gemm path now accepts would silently null the
    # tie-break here), so they take a row_number window over the
    # MATCHED rows instead — same (max cosine, min eval id) order,
    # leakage-sized input, one tiny extra exchange
    from pyspark.sql.types import NumericType

    if not isinstance(eval_emb.schema[id_col].dataType, NumericType):
        from pyspark.sql import Window

        w = Window.partitionBy(id_col).orderBy(
            F.col("cosine").desc(), F.col("eval_id")
        )
        return (
            hits.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(id_col, "eval_id", "cosine")
        )
    best = hits.groupBy(id_col).agg(
        F.max(
            F.struct(
                F.col("cosine"), (-F.col("eval_id")).alias("_nei")
            )
        ).alias("_b")
    )
    return best.select(
        F.col(id_col),
        (-F.col("_b._nei")).alias("eval_id"),
        F.col("_b.cosine").alias("cosine"),
    )


def _exact_gemm_score(mat, eids, thr: float, id_col: str, to_matrix):
    """mapInPandas scorer for the batched-GEMM decontam paths,
    BIT-IDENTICAL to the fold path (r17 optimization round — not just
    equal-in-practice, so the contract entries can use it). Three
    ingredients:

    (1) dots and norms accumulate DIMENSION-MAJOR — vectorized across
        pairs, sequential across dims — which is exactly the JVM
        fold's left-to-right ``acc + x_k*y_k`` order, so every
        unrounded double matches the zip_with/aggregate spelling bit
        for bit (a plain GEMM's pairwise/SIMD summation can differ by
        1 ULP);
    (2) per-pair cosine = dot / (t_n * e_n), the fold's exact
        operation order;
    (3) rounding reproduces Spark's round(d, 8) — BigDecimal on the
        shortest round-trip decimal, HALF_UP — via Python's decimal
        module on repr(d) (np.round's scaled-rint can disagree at
        representation-error tie crossings). Only the per-row max and
        its rounding-tie window pay the Decimal cost: rounding is
        monotone, so the row's best ROUNDED cosine is round8(max
        unrounded) and the eval tie-set (min eval id wins, ``eids``
        sorted ascending) lives within 2e-8 of the max.

    ``to_matrix(pdf) -> (ids, float64 matrix)`` adapts the Arrow batch
    — a column of vectors, or raw text featurized in-scorer."""
    import numpy as np
    import pandas as pd

    from decimal import ROUND_HALF_UP, Decimal

    q8 = Decimal("1e-8")

    def _round8(v: float) -> float:
        return float(
            Decimal(repr(float(v))).quantize(q8, rounding=ROUND_HALF_UP)
        )

    en = np.zeros(len(mat))
    for _k in range(mat.shape[1]):
        en = en + mat[:, _k] * mat[:, _k]
    en = np.sqrt(en)

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, A = to_matrix(pdf)
            an = np.zeros(len(A))
            for k in range(A.shape[1]):
                an = an + A[:, k] * A[:, k]
            an = np.sqrt(an)
            live = np.flatnonzero(an > 0)
            if live.size == 0:
                continue
            dots = np.zeros((live.size, len(mat)))
            Al = A[live]
            for k in range(A.shape[1]):
                dots = dots + np.outer(Al[:, k], mat[:, k])
            cos = dots / np.outer(an[live], en)
            out_i, out_e, out_c = [], [], []
            for i in range(live.size):
                row = cos[i]
                m = row.max()
                if np.isnan(m):
                    # zero-norm eval vector: Spark treats NaN as
                    # greater than every double (NaN >= thr is TRUE
                    # and NaN wins the max struct) — mirror it: best
                    # match = min eval id among NaNs
                    j = int(np.flatnonzero(np.isnan(row))[0])
                    out_i.append(ids[live[i]])
                    out_e.append(eids[j])
                    out_c.append(float("nan"))
                    continue
                r = _round8(m)
                if not r >= thr:
                    continue
                for j in np.flatnonzero(row >= m - 2e-8):
                    if _round8(row[j]) == r:
                        break
                out_i.append(ids[live[i]])
                out_e.append(eids[int(j)])
                out_c.append(r)
            yield pd.DataFrame(
                {id_col: out_i, "eval_id": out_e, "cosine": out_c}
            )

    return score


def text_embedding_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    min_cosine: float = 0.85,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    eval_cap: int = 200_000,
) -> DataFrame:
    """Fused text -> signed-hash embedding -> semantic decontam: the
    r17-optimized spelling of ``embedding_decontaminate(
    text_embeddings(docs), text_embeddings(eval_docs))`` for the
    self-contained tier. Row-for-row identical output (pinned by
    test + the driver hash), but the corpus side is ONE narrow Arrow
    pass — tokenize/md5/bucket-sum run vectorized in the scorer
    (`textembed.embed_texts`, a per-task token cache amortizes the
    md5s over the corpus's repeated vocabulary) instead of the JVM
    aggregate that rebuilt a dim-wide array per token (measured 2.6x
    on the tdc branch at sf0.1). The eval slice (benchmark-sized by
    construction) collects as (id, text) and featurizes driver-side
    with the same helper; embeddings are small exact integers, so
    every dot/norm is exact in float64 and the DuckDB twin
    (`embedding_decontaminate_sql` over `text_embeddings_sql`) is
    unchanged."""
    from cryo_spark.operators import textembed

    cid_t = docs.schema[id_col].dataType.simpleString()
    eid_t = eval_docs.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {cid_t}, eval_id {eid_t}, cosine double"
    rows = (
        eval_docs.select(id_col, text_col).limit(eval_cap + 1).collect()
    )
    if len(rows) > eval_cap:
        raise ValueError(
            f"eval side exceeds eval_cap={eval_cap} rows — an eval set "
            "this large should go through the near-dup index path, not "
            "a broadcast matrix"
        )
    if not rows:
        return docs.sparkSession.createDataFrame([], out_schema)
    rows.sort(key=lambda r: r[0])
    eids = [r[0] for r in rows]
    mat = textembed.embed_texts([r[1] for r in rows], dim=dim)

    def to_matrix(pdf):
        return (
            pdf[id_col].tolist(),
            textembed.embed_texts(pdf[text_col].tolist(), dim=dim),
        )

    score = _exact_gemm_score(
        mat, eids, float(min_cosine), id_col, to_matrix
    )
    return docs.select(id_col, text_col).mapInPandas(score, out_schema)


def embedding_decontaminate_sql(
    table: str,
    eval_pred: str,
    train_pred: str,
    min_cosine: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prelude: str = "",
) -> str:
    """DuckDB twin of :func:`embedding_decontaminate` (fold method)
    over one stored table split by predicates — same exact fold
    arithmetic, same round-8, same (cosine desc, eval_id asc) struct
    tie-break. ``prelude`` injects extra leading CTEs (ending in a
    comma) so ``table`` can itself be a derived frame — e.g. the
    ``textembed.text_embeddings_sql`` twin for the self-contained
    text->embedding->decontam chain (round 14)."""
    cos = (
        f"round(list_sum(list_transform(list_zip(t.{vec_col}, e.{vec_col}),"
        " x -> x[1]::DOUBLE * x[2]::DOUBLE))"
        f" / (sqrt(list_sum(list_transform(t.{vec_col}, x -> x::DOUBLE * x::DOUBLE)))"
        f" * sqrt(list_sum(list_transform(e.{vec_col}, x -> x::DOUBLE * x::DOUBLE)))), 8)"
    )
    return f"""
WITH {prelude}
hits AS (
  SELECT t.{id_col} AS {id_col}, e.{id_col} AS eval_id, {cos} AS cosine
  FROM (SELECT * FROM {table} WHERE {train_pred}) t,
       (SELECT * FROM {table} WHERE {eval_pred}) e
  WHERE {cos} >= {min_cosine}
),
best AS (
  SELECT {id_col},
         max(struct_pack(c := cosine, nei := -eval_id)) AS b
  FROM hits GROUP BY {id_col}
)
SELECT {id_col}, -b.nei AS eval_id, b.c AS cosine FROM best
"""
