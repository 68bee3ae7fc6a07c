"""DSIR-shaped data selection: hashed n-gram importance resampling.

Selects raw-corpus documents whose hashed n-gram distribution looks
like a (small) target corpus — the "make 100 TB of web text look like
Wikipedia" primitive (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling"). No trained model: both
distributions are bag-of-hashed-n-gram counts, and the per-document
importance weight is

    logw(d) = sum over d's grams g of
              [ ln(ct(b(g)) + 1) - ln(Tt + B) ]        # target logp
            - [ ln(cr(b(g)) + 1) - ln(Tr + B) ]        # raw logp

with ``b(g)`` a hash bucket in ``[0, B)``, ``ct``/``cr`` the bucket
counts over the target/raw corpora, ``Tt``/``Tr`` their gram totals
(add-one smoothing, so every ln argument is an exact integer both
engines share bit-for-bit).

Oracle strategy: the bucket hash is ``md5`` based (the same trick as
``sampling._bucket``) so DuckDB computes identical buckets; all ln
arguments are integers, leaving cross-engine drift only in the final
per-doc float sum — rounded to 6 decimals BEFORE ranking, so the
selection rank order is identical on both engines.

Scale shape (the 100 TB story):
- The gram stream is a narrow projection (one explode, no shuffle).
- Bucket-count tables are B-row partial aggregates (hot buckets
  combine map-side); B is a constant (default 4096), so the ratio
  table is broadcast — the corpus itself shuffles exactly once, on
  doc_id, to sum its gram weights.
- Selection is a rank over rounded weights: top-k uses
  TakeOrderedAndProject (per-task heaps) when k is small; the
  select-fraction variant thresholds on the weight (zero extra
  shuffle beyond the weight agg).
- Gumbel resampling (the actual DSIR sampler) derives its noise from
  ``md5(seed || id)`` — reproducible on any cluster, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cryo_spark.operators.dedup import shingle_rows
from cryo_spark.operators.util import local_rows

DEFAULT_BUCKETS = 4096


def _bucket_col(gram: Column, n_buckets: int) -> Column:
    """md5-derived hash bucket in [0, n_buckets) — identical in Spark
    and DuckDB (`conv` here, `CAST('0x..' AS BIGINT)` there)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def _bucket_sql(gram_expr: str, n_buckets: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5({gram_expr}), 1, 8)) AS BIGINT)"
        f" % {n_buckets}"
    )


def gram_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id, bucket) — one row per word n-gram occurrence. Narrow."""
    rows = shingle_rows(df, text_col, n, id_col)
    return rows.select(
        F.col(id_col), _bucket_col(F.col("shingle"), n_buckets).alias("bucket")
    )


def dsir_ratios(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = DEFAULT_BUCKETS,
    raw_grams: DataFrame | None = None,
) -> DataFrame:
    """The trained artifact of DSIR: a FULL B-row (bucket, log_ratio)
    table — add-one-smoothed ln p_target − ln p_raw per hash bucket.
    Persist it (B rows, KBs) and re-apply to any batch with
    :func:`dsir_apply` — the daily-loop shape: ratios train once
    against the reference corpus, each day's delta scores without
    re-reading either training distribution. Every bucket 0..B−1 is
    present (unseen buckets get the smoothed 1/(T+B) mass), so
    applying to a frame whose grams never appeared in ``raw`` is
    well-defined.

    The count tables are bounded at B rows (constant, default 4096)
    — both streams aggregate in ONE side-tagged job (one driver
    round-trip; the totals fall out of the same aggregation), and the
    table is built driver-side. math.log feeds on the same exact
    integers either engine's ln sees (last-ulp drift is absorbed by
    the round-to-6 guard applied at the weight stage)."""
    import math

    if raw_grams is None:
        raw_grams = gram_buckets(raw, text_col, id_col, n, n_buckets)
    tgt_grams = gram_buckets(target, text_col, id_col, n, n_buckets)
    both = tgt_grams.select(F.lit(0).alias("side"), "bucket").unionByName(
        raw_grams.select(F.lit(1).alias("side"), "bucket")
    )
    ct, cr = {}, {}
    for r in (
        both.groupBy("side", "bucket").agg(F.count(F.lit(1)).alias("c")).collect()
    ):
        (ct if r.side == 0 else cr)[r.bucket] = r.c
    tt, tr = sum(ct.values()), sum(cr.values())
    off = math.log(tr + n_buckets) - math.log(tt + n_buckets)
    # local_rows (r18): size-appropriate slicing — the stock
    # createDataFrame spread these B rows over defaultParallelism
    # slices, so the broadcast build downstream ran a full-width wave
    # of near-empty tasks (profiled: 4.9 s summed run / 0.13 s cpu)
    return local_rows(
        raw.sparkSession,
        [
            (b, math.log(ct.get(b, 0) + 1) - math.log(cr.get(b, 0) + 1) + off)
            for b in range(n_buckets)
        ],
        "bucket long, log_ratio double",
    )


def dsir_apply(
    df: DataFrame,
    ratios: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = DEFAULT_BUCKETS,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Score a batch against a (possibly persisted) ratio table:
    (id, n_grams, logw), logw rounded to 6 decimals (the cross-engine
    float-sum guard — see module doc). One corpus shuffle: the gram
    stream joins the broadcast B-row table map-side, then aggregates
    per doc (partial sums combine in the map task).

    The join is LEFT with ``coalesce(log_ratio, 0.0)``: a bucket
    absent from a partial (non-full-B) ratio table contributes 0
    weight but still counts toward ``n_grams`` — exactly what
    :func:`dsir_apply_rows`'s ``table.get(b, 0.0)`` does, so the two
    paths agree even when the full-B precondition of
    :func:`dsir_ratios` is violated (an inner join would silently
    DROP a doc whose buckets are all absent)."""
    # null-text docs shingle to a null bucket row; the old inner join
    # dropped them implicitly, the left join must not resurrect them
    if grams is None:
        grams = gram_buckets(df, text_col, id_col, n, n_buckets)
    grams = grams.filter(F.col("bucket").isNotNull())
    joined = grams.join(F.broadcast(ratios), "bucket", "left").select(
        id_col, F.coalesce("log_ratio", F.lit(0.0)).alias("lr")
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.round(F.sum("lr"), 6).alias("logw"),
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Train-and-apply in one call (ratios from ``df`` itself as the
    raw distribution): (id, n_grams, logw) for every raw doc.

    r18 (guide §2.4 — don't compute things twice): train-and-apply
    used to tokenize+bucket the raw corpus TWICE — once into the
    training counts, once into the scoring join. The gram stream is
    shared through a lazy localCheckpoint: the training collect (the
    first action) materializes the (id, bucket) blocks — 16 B/row,
    the narrowest possible form of the corpus — and the scoring pass
    reads them back instead of re-running the explode/md5 chain.
    Values unchanged (identical gram rows feed both consumers); the
    plan's scan+tokenize leaf becomes an RDD scan in the scoring
    plan. The checkpoint is free to create (narrow plan — no AQE
    shuffle stages execute at cut time)."""
    grams = gram_buckets(df, text_col, id_col, n, n_buckets).localCheckpoint(
        eager=False
    )
    ratios = dsir_ratios(
        df, target, text_col, id_col, n, n_buckets, raw_grams=grams
    )
    return dsir_apply(
        df, ratios, text_col, id_col, n, n_buckets, grams=grams
    )


def _gumbel(id_col: str, seed: str) -> Column:
    """Deterministic standard-Gumbel draw from md5(seed:id) — the
    DSIR resampler's noise, reproducible on any engine/cluster."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**8 + 2))
    return -F.log(-F.log(u))


def _gumbel_sql(id_expr: str, seed: str) -> str:
    u = (
        f"(CAST(concat('0x', substr(md5(concat('{seed}:', "
        f"CAST({id_expr} AS VARCHAR))), 1, 8)) AS BIGINT) + 1.0)"
        f" / {float(16 ** 8 + 2)!r}"
    )
    return f"-ln(-ln({u}))"


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = DEFAULT_BUCKETS,
    gumbel_seed: str | None = None,
) -> DataFrame:
    """Top-k raw docs by importance weight (plus Gumbel noise when
    ``gumbel_seed`` is given — Gumbel-top-k IS sampling-without-
    replacement proportional to the importance weights, the actual
    DSIR procedure; without it, deterministic hard top-k).

    Returns (id, n_grams, logw, rank). Ranking is over the ROUNDED
    weight with the id as tie-break, so the selected set is
    deterministic and engine-portable. Scale shape: the k survivors
    come from ``.orderBy(...).limit(k)`` — Spark plans
    TakeOrderedAndProject (per-task heaps over the |corpus|-row
    weights table, no global sort); the rank window then runs over k
    rows only, so its single partition is bounded by k, never by the
    corpus."""
    w = dsir_weights(df, target, text_col, id_col, n, n_buckets)
    key = F.col("logw")
    if gumbel_seed is not None:
        key = F.round(key + _gumbel(id_col, gumbel_seed), 6)
    top = (
        w.withColumn("sel_key", key)
        .orderBy(F.col("sel_key").desc(), F.col(id_col))
        .limit(k)
    )
    rank = F.row_number().over(
        Window.orderBy(F.col("sel_key").desc(), F.col(id_col))
    )
    return top.withColumn("rank", rank).select(
        id_col, "n_grams", "logw", "rank"
    )


def _grams_cte(table: str, text_col: str, n: int, n_buckets: int) -> str:
    """DuckDB CTE body producing (doc_id, bucket) gram rows,
    mirroring shingle_rows + _bucket_col semantics exactly."""
    norm = f"regexp_replace(trim(lower({text_col})), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')"
    gram = (
        f"CASE WHEN len(t) >= {n} THEN array_to_string(t[i:i+{n - 1}], ' ')"
        f" ELSE array_to_string(t, ' ') END"
    )
    return f"""
  SELECT doc_id, {_bucket_sql(gram, n_buckets)} AS bucket
  FROM (SELECT doc_id, string_split({norm}, ' ') AS t FROM {table}) __t,
  LATERAL unnest(generate_series(1, greatest(len(t) - {n - 1}, 1))) AS g(i)
"""


def dsir_select_sql(
    raw_table: str,
    target_table: str,
    k: int,
    text_col: str = "text",
    n: int = 2,
    n_buckets: int = DEFAULT_BUCKETS,
    gumbel_seed: str | None = None,
) -> str:
    """DuckDB equivalent of dsir_select (same rounding, same rank)."""
    sel = "round(w.logw, 6)"
    if gumbel_seed is not None:
        sel = f"round(round(w.logw, 6) + {_gumbel_sql('w.doc_id', gumbel_seed)}, 6)"
    return f"""
WITH raw_grams AS ({_grams_cte(raw_table, text_col, n, n_buckets)}),
tgt_grams AS ({_grams_cte(target_table, text_col, n, n_buckets)}),
tot AS (
  SELECT (SELECT count(*) FROM tgt_grams) AS tt,
         (SELECT count(*) FROM raw_grams) AS tr
), ratios AS (
  SELECT b.bucket,
    ln(coalesce(ct.c, 0) + 1) - ln(tot.tt + {n_buckets})
    - ln(coalesce(cr.c, 0) + 1) + ln(tot.tr + {n_buckets}) AS log_ratio
  FROM (SELECT DISTINCT bucket FROM raw_grams) b
  LEFT JOIN (SELECT bucket, count(*) c FROM tgt_grams GROUP BY 1) ct
    ON ct.bucket = b.bucket
  LEFT JOIN (SELECT bucket, count(*) c FROM raw_grams GROUP BY 1) cr
    ON cr.bucket = b.bucket
  CROSS JOIN tot
), weights AS (
  SELECT g.doc_id, count(*) AS n_grams,
         round(sum(r.log_ratio), 6) AS logw
  FROM raw_grams g JOIN ratios r ON r.bucket = g.bucket
  GROUP BY g.doc_id
)
SELECT doc_id, n_grams, logw, rank FROM (
  SELECT w.doc_id, w.n_grams, w.logw,
         row_number() OVER (ORDER BY {sel} DESC, w.doc_id) AS rank
  FROM weights w
) __r WHERE rank <= {k}
"""


def dsir_apply_rows(
    df: DataFrame,
    ratios: dict[int, float] | DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Row-wise twin of :func:`dsir_apply`: the whole weight computes
    inside ONE Arrow-batched pass (tokenize → hash → table lookup →
    sum per row), no explode, no aggregation — which makes it legal
    on a STREAMING DataFrame (a stateless projection needs no
    watermark) and keeps batch scoring shuffle-free. Accepts the
    ratio table as the (bucket, log_ratio) frame or a plain dict; the
    ~B-entry dict rides in the UDF closure like the classifier's
    coefficients. Same md5 bucketing and round-to-6 guard, so the
    weights match :func:`dsir_apply` exactly (pinned by test; the pin
    covers ASCII corpora — Python's and the JVM's lowercase can
    legally differ at exotic casefold edges like Turkish dotted I)."""
    import hashlib
    import re

    if not isinstance(ratios, dict):
        ratios = {r.bucket: r.log_ratio for r in ratios.collect()}
    table = dict(ratios)
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("n_grams", LongType()),
            StructField("logw", DoubleType()),
        ]
    )

    def run(it):
        for pdf in it:
            # null-text rows: the exploded path drops them (a null
            # gram stream aggregates to no row) — match exactly
            pdf = pdf[pdf[text_col].notna()]
            ngs, ws = [], []
            for t in pdf[text_col]:
                # replicate _norm_text precisely: lower, trim SPACES
                # only (Spark trim), then the JAVA \s class (ASCII
                # whitespace — Python \s would also eat unicode
                # spaces Spark keeps)
                toks = re.sub(
                    r"[ \t\n\x0b\f\r]+", " ", t.lower().strip(" ")
                ).split(" ")
                if len(toks) >= n:
                    grams = [
                        " ".join(toks[i : i + n])
                        for i in range(len(toks) - n + 1)
                    ]
                else:
                    grams = [" ".join(toks)]
                w = 0.0
                for g in grams:
                    b = (
                        int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
                        % n_buckets
                    )
                    w += table.get(b, 0.0)
                ngs.append(len(grams))
                ws.append(round(w, 6))
            pdf = pdf.assign(n_grams=ngs, logw=ws)
            yield pdf

    return df.mapInPandas(run, out_schema)
