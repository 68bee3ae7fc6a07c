"""Incremental near-duplicate detection against a persisted
MinHash-signature index — the index+delta shape.

A 100 TB corpus is not re-deduplicated from scratch when a day's
crawl lands. The corpus keeps a **signature index** — k longs per
document (`minhash_index`, ~128 bytes/doc at k=16: a 100 TB / ~100 B
doc corpus indexes into ~100 GB of parquet, 0.1% of the data) — and
each new batch is checked *against the index* without touching the
base corpus's text:

- ``minhash_index``       corpus -> (id, sig array<long>), persistable
- ``incremental_pairs``   new-index vs (base ∪ new) band join; the
                          base text is never read, never reshuffled
- ``signature_pairs``     the from-scratch counterpart on one index
                          (equivalence anchor for tests)
- ``est_jaccard``         signature-estimated Jaccard (component
                          agreement fraction) — verification when the
                          base text is gone; exact verify via
                          ``dedup.ngram_jaccard`` when it isn't

Correctness anchor: candidates(base) ∪ incremental-candidates(new)
== candidates(base ∪ new) *exactly* (same signatures, same band
hashes, the new-vs-union join covers precisely the pairs the batch
run adds), so the incremental path inherits the batch path's
oracle-proven recall (`__spark_entry__.q_minhash_near_dups`).

Scale shape: the band join shuffles band rows — ``bands`` longs per
doc — keyed (band_id, band_hash). The delta side is a day's batch;
the index side is corpus-sized but 100-bytes-per-doc narrow, and at
a fixed banding the index can be bucketed on band_hash at write time
so daily runs reuse the layout shuffle-free. No stage ever rereads
or reshuffles base text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cryo_spark.operators.dedup import minhash_signatures, shingle_rows


def minhash_index(
    df: DataFrame,
    text_col: str = "text",
    k: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, sig array<long>) — the persistable per-doc signature.

    Same hash family as `dedup.minhash_signatures` (shingle hashed
    once, k members derived), packed to one array column so the index
    schema is stable under k."""
    sigs = minhash_signatures(df, text_col, k, n, id_col, shingles=shingles)
    packed = ", ".join(f"mh{i}" for i in range(k))
    return sigs.select(id_col, F.expr(f"array({packed}) AS sig"))


def _band_rows(
    index: DataFrame,
    bands: int,
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *carry_cols, band_id, band_hash) derived from the sig
    array — a narrow projection, so the persisted index stays k longs
    per doc.

    ``bands`` must divide the signature length k: the per-row slice
    arithmetic would otherwise split bands inconsistently (the direct
    LSH path silently truncates to k//bands instead — neither
    behavior is what a caller wants, so this path raises; the guard
    rides inside the band_hash expression so column pruning cannot
    drop it)."""
    # the whole per-band struct array as ONE F.expr SQL string: the
    # F.* spelling paid ~20 py4j round trips per band on every
    # construction (r17 optimization round); same slice arithmetic,
    # same in-expression divisibility guard, identical Catalyst tree
    r = f"(size(sig) / {bands})"
    err = (
        f"CAST(raise_error('bands={bands} must divide the signature "
        "length') AS BIGINT)"
    )

    def _hash(b: int) -> str:
        h = (
            f"xxhash64(slice(sig, CAST({b} * {r} + 1 AS INT), "
            f"CAST({r} AS INT)), {b})"
        )
        return f"CASE WHEN size(sig) % {bands} = 0 THEN {h} ELSE {err} END"

    bandstructs = F.expr(
        "array("
        + ", ".join(
            f"named_struct('band_id', {b}, 'band_hash', {_hash(b)})"
            for b in range(bands)
        )
        + ")"
    )
    carry = [c for c in (carry_cols or ()) if c != id_col]
    return index.select(
        id_col, *carry, F.explode(bandstructs).alias("band")
    ).select(id_col, *carry, "band.band_id", "band.band_hash")


def est_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """Signature-estimated Jaccard: fraction of agreeing minhash
    components (unbiased estimator, variance 1/k)."""
    agree = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return agree / F.size(sig_a)


def signature_pairs(
    index: DataFrame,
    bands: int = 4,
    id_col: str = "doc_id",
    min_est: float = 0.0,
    with_est: bool = True,
) -> DataFrame:
    """All candidate pairs within one index (id_a < id_b) with their
    signature-estimated Jaccard — the from-scratch batch run.

    ``with_est=False`` returns the bare (id_a, id_b) candidate list
    and skips the two signature-attach joins — the shape callers want
    when a downstream exact verify supersedes the estimate (an inner
    join cannot be pruned by Catalyst, so opting out must be
    explicit)."""
    b = _band_rows(index, bands, id_col)
    # corpus-sized SELF-join — pin shuffle-hash for the same reason
    # the dedup.py band joins do (stats misestimates behind lineage
    # cuts must never broadcast a corpus side)
    b = b.hint("shuffle_hash")
    a, bb = b.alias("a"), b.alias("b")
    cand = (
        a.join(
            bb,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    if not with_est:
        return cand
    return _estimate(cand, index, id_col, min_est)


def incremental_pairs(
    base_index: DataFrame,
    new_index: DataFrame,
    bands: int = 4,
    id_col: str = "doc_id",
    min_est: float = 0.0,
    with_est: bool = True,
) -> DataFrame:
    """Candidate pairs ADDED by the new batch: new-vs-base plus
    new-vs-new (id_a < id_b throughout; base-vs-base pairs were
    emitted when the base was indexed). Union with the base run's
    pairs to equal `signature_pairs(base ∪ new)` exactly."""
    nb = _band_rows(new_index, bands, id_col)
    ub = _band_rows(base_index, bands, id_col).unionByName(nb)
    n, u = nb.alias("n"), ub.alias("u")
    cand = (
        n.join(
            u,
            (F.col("n.band_id") == F.col("u.band_id"))
            & (F.col("n.band_hash") == F.col("u.band_hash"))
            & (F.col(f"n.{id_col}") != F.col(f"u.{id_col}")),
        )
        .select(
            F.least(F.col(f"n.{id_col}"), F.col(f"u.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"n.{id_col}"), F.col(f"u.{id_col}")).alias("id_b"),
        )
        .distinct()
    )
    if not with_est:
        return cand
    index = base_index.unionByName(new_index)
    return _estimate(cand, index, id_col, min_est)


def _estimate(
    cand: DataFrame, index: DataFrame, id_col: str, min_est: float
) -> DataFrame:
    """Attach est_jaccard to (id_a, id_b) pairs from the index sigs.
    Both joins are candidate-bounded; AQE broadcasts small sides."""
    sa = index.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = index.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    out = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            est_jaccard(F.col("sig_a"), F.col("sig_b")).alias("est_jaccard"),
        )
    )
    if min_est > 0.0:
        out = out.filter(F.col("est_jaccard") >= min_est)
    return out


def delta_duplicates(
    pairs: DataFrame, new_index: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """One-column frame of NEW-batch ids to drop, from
    :func:`incremental_pairs` output — under ARRIVAL-priority keeper
    semantics: an indexed (already-shipped) doc always wins a cross
    pair even when its id is larger, because retroactively evicting
    shipped data is not an option; within the new batch the smaller
    id wins (the batch-window convention). Applying this rule to the
    incremental pair stream provably reproduces a from-scratch run
    under the same arrival ranking (pair sets are identical — pinned
    by the daily-ingest workflow test)."""
    nids = new_index.select(F.col(id_col).alias("__nid")).distinct()
    marked = (
        pairs.join(
            nids.withColumnRenamed("__nid", "id_a").withColumn(
                "__a_new", F.lit(True)
            ),
            "id_a",
            "left",
        )
        .join(
            nids.withColumnRenamed("__nid", "id_b").withColumn(
                "__b_new", F.lit(True)
            ),
            "id_b",
            "left",
        )
    )
    dup = (
        F.when(
            F.coalesce("__a_new", F.lit(False))
            & F.coalesce("__b_new", F.lit(False)),
            F.greatest("id_a", "id_b"),
        )
        .when(F.coalesce("__a_new", F.lit(False)), F.col("id_a"))
        .when(F.coalesce("__b_new", F.lit(False)), F.col("id_b"))
        # base-base pair: out of contract (this function consumes
        # incremental_pairs output, where one side is always new) —
        # e.g. a caller passed a full signature_pairs stream. A
        # silent .otherwise(id_b) here would pick an arbitrary
        # shipped doc to drop; fail loudly instead.
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "delta_duplicates: pair with no new-batch side "
                        "(base-base pair "
                    ),
                    F.col("id_a").cast("string"),
                    F.lit("/"),
                    F.col("id_b").cast("string"),
                    F.lit(
                        ") — pass incremental_pairs output, not "
                        "signature_pairs"
                    ),
                )
            ).cast(dict(pairs.dtypes).get("id_a", "long"))
        )
    )
    return marked.select(dup.alias(id_col)).distinct()


def save_banded_index(
    index: DataFrame,
    table: str,
    bands: int = 4,
    n_buckets: int = 32,
    id_col: str = "doc_id",
) -> None:
    """Persist the index as a BUCKETED band-row table — the layout
    that makes the daily delta join reuse-shuffle-free on the base
    side. Rows are (id, band_id, band_hash, sig), bucketed on
    (band_id, band_hash): `incremental_pairs_from_table` then reads
    each bucket co-located, so only the (day-sized) delta shuffles —
    the corpus-sized index never moves again. The sig column rides
    THROUGH the band explode (a join back onto the index to attach it
    would scan the corpus-sized index twice and shuffle both sides on
    the id); a constant ``bands`` column records the banding so a
    mismatched read fails fast instead of silently missing pairs."""
    from cryo_spark.operators import skew

    rows = _band_rows(index, bands, id_col, carry_cols=("sig",)).withColumn(
        "bands", F.lit(bands)
    )
    skew.write_bucketed(rows, table, ["band_id", "band_hash"], n_buckets)


def incremental_pairs_from_table(
    spark,
    table: str,
    new_index: DataFrame,
    bands: int = 4,
    id_col: str = "doc_id",
    min_est: float = 0.0,
    with_est: bool = True,
) -> DataFrame:
    """`incremental_pairs` against a `save_banded_index` table: the
    new-vs-base join consumes the base side straight from its buckets
    (no Exchange above the base scan — plan-pinned by test); Spark
    shuffles only the delta band rows into the bucket layout. Output
    contract identical to `incremental_pairs`. Raises up front if the
    table was saved with a different ``bands`` — a mismatched banding
    would silently match (near) nothing and lose recall, so the check
    cannot live inside the join (no matches = no rows to check); the
    probe is a LIMIT-1 read of the stored constant."""
    base_band = spark.table(table)
    stored = base_band.select("bands", F.size("sig").alias("k")).first()
    if stored is not None and stored.bands != bands:
        raise ValueError(
            f"banded index {table!r} was saved with bands={stored.bands}, "
            f"not {bands} — rebuild it or pass the saved value"
        )
    # k (signature length) mismatch is the same silent-zero-recall
    # failure the bands probe guards: band hashes of differently-sized
    # signature slices never collide, so the join would quietly find
    # (near) nothing. The probe is a LIMIT-1 look at each side — the
    # delta side runs one small partial job, bounded by a single
    # signature row.
    if stored is not None:
        new_k = new_index.select(F.size("sig").alias("k")).first()
        if new_k is not None and new_k.k != stored.k:
            raise ValueError(
                f"banded index {table!r} holds k={stored.k} signatures "
                f"but the new batch was indexed with k={new_k.k} — "
                "rebuild one side so the minhash families match"
            )
    nb = _band_rows(new_index, bands, id_col)
    n, u = nb.alias("n"), base_band.alias("u")
    cross = (
        n.join(
            u,
            (F.col("n.band_id") == F.col("u.band_id"))
            & (F.col("n.band_hash") == F.col("u.band_hash"))
            & (F.col(f"n.{id_col}") != F.col(f"u.{id_col}")),
        )
        .select(
            F.least(F.col(f"n.{id_col}"), F.col(f"u.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"n.{id_col}"), F.col(f"u.{id_col}")).alias("id_b"),
        )
    )
    within = signature_pairs(new_index, bands, id_col, with_est=False)
    cand = cross.unionByName(within).distinct()
    if not with_est:
        return cand
    base_sigs = base_band.select(id_col, "sig").dropDuplicates([id_col])
    index = base_sigs.unionByName(new_index.select(id_col, "sig"))
    return _estimate(cand, index, id_col, min_est)


# ------------------ embedding-side incremental index (round 13) ------
#
# The minhash index covers TEXT near-dups; embedding near-dups get the
# same index+delta shape: a persisted (bucket, id, embedding) table
# keyed by the engine-neutral integer-LSH signature
# (similarity.int_planes — exact BIGINT bucket math), bucketed on the
# signature so the corpus side never reshuffles. A day's batch is
# signed, shuffled into the bucket layout (day-sized), joined
# bucket-locally, and verified by EXACT round-8 cosine — the same
# arithmetic every embedding contract entry uses, so thresholded pair
# sets are deterministic, never estimate-fuzzy.


def embedding_index(
    emb: DataFrame,
    n_planes: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id, bucket, embedding): the persistable unit for incremental
    embedding dedup. ``n_planes=None`` auto-sizes from a corpus count
    (:func:`similarity.default_n_planes`); the chosen value is
    recorded by :func:`save_embedding_index` and mismatches fail fast
    on probe. The embedding rides along (index size = corpus vector
    bytes + one long/row): cosine verification needs the vectors, and
    a join back onto the corpus to fetch them would reshuffle both
    sides on the id — the same carry-through trade as the minhash
    index's ``sig`` column."""
    from cryo_spark.operators import similarity

    # ONE fused count+dim job (round 14; the separate .first() dim
    # probe was its own driver job whenever auto-planes already ran a
    # count — same fusion _emb_stats gave the similarity callers);
    # ZERO jobs when both n_planes and dim are pinned (the
    # embedding_index_for_table path pins them from the saved index)
    try:
        n, d = similarity._emb_stats(
            emb, vec_col, need_n=n_planes is None, need_dim=dim is None
        )
    except ValueError as exc:
        raise ValueError(
            "cannot index an empty/all-null embedding frame"
        ) from exc
    if dim is None:
        dim = int(d)
    if n_planes is None:
        n_planes = similarity.default_n_planes(n)
    planes = similarity.int_planes(n_planes, dim, seed)
    return emb.select(
        F.col(id_col),
        similarity._sig_col(vec_col, planes).alias("bucket"),
        F.col(vec_col).alias("embedding"),
    ).withColumn("n_planes", F.lit(n_planes)).withColumn(
        "seed", F.lit(seed)
    )


def save_embedding_index(
    index: DataFrame, table: str, n_buckets: int = 32
) -> None:
    """Persist an :func:`embedding_index` frame BUCKETED on the LSH
    bucket — the layout that keeps the corpus side of every future
    delta join in place (no Exchange above the base scan; only the
    day-sized delta shuffles into the bucket layout)."""
    from cryo_spark.operators import skew

    skew.write_bucketed(index, table, ["bucket"], n_buckets)


def incremental_embedding_pairs_from_table(
    spark,
    table: str,
    new_index: DataFrame,
    min_cosine: float = 0.9,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_a=new id, id_b=base id, cosine) — the new batch's
    near-duplicates AGAINST a :func:`save_embedding_index` table,
    plus new-within-new pairs (id_a < id_b), exactly the coverage the
    batch run over (base ∪ new) adds for the new rows. Candidates are
    bucket-equality local (never all-pairs); every candidate is
    verified by exact round-8 cosine >= ``min_cosine``. Fails fast on
    an (n_planes, seed) mismatch — differently-signed sides would
    silently match nothing, the same guard discipline as the minhash
    index's bands/k probes."""
    base = spark.table(table)
    stored = base.select("n_planes", "seed").first()
    if stored is not None:
        probe = new_index.select("n_planes", "seed").first()
        if probe is not None and (
            probe.n_planes != stored.n_planes or probe.seed != stored.seed
        ):
            raise ValueError(
                f"embedding index {table!r} was signed with "
                f"n_planes={stored.n_planes}, seed={stored.seed} — the new "
                f"batch used n_planes={probe.n_planes}, seed={probe.seed}; "
                "rebuild one side so the hyperplane families match"
            )
    cross = _embedding_bucket_pairs(
        new_index, base, False, min_cosine, id_col
    )
    within = _embedding_bucket_pairs(
        new_index, new_index, True, min_cosine, id_col
    )
    # the distinct IS load-bearing (r13 verdict finding #4 adjudicated
    # round 14): an id can legitimately appear on BOTH sides — a
    # re-ingested doc already in the index, and the batch-equivalence
    # law itself feeds the full (base ∪ new) index back through this
    # path — in which case the cross and within branches emit the SAME
    # (id_a, id_b, cosine) row. The dedup shuffle rides the PAIR
    # stream after the cosine filter (near-dup-sized, never
    # corpus-sized), so exactly-once rows cost one leakage-sized
    # exchange, not a corpus pass.
    return cross.unionByName(within).distinct()


def _embedding_bucket_pairs(
    a: DataFrame, b: DataFrame, same_side: bool,
    min_cosine: float, id_col: str,
) -> DataFrame:
    """Bucket-equality candidate pairs between two
    :func:`embedding_index` frames, verified by exact round-8 cosine.
    Norms are computed ONCE per row on each side BEFORE the join —
    the per-pair spelling would redo the reduction |bucket| times per
    row (bit-identical values: same ops, same order; the same hoist
    hard_negatives/embedding_decontaminate document)."""
    dot = F.aggregate(
        F.zip_with(
            F.col("_a_v"), F.col("_b_v"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def _norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda x: x.cast("double") * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    an = a.select(
        F.col(id_col).alias("_a_id"),
        F.col("bucket").alias("_a_bk"),
        F.col("embedding").alias("_a_v"),
    ).withColumn("_a_n", _norm(F.col("_a_v")))
    bn = b.select(
        F.col(id_col).alias("_b_id"),
        F.col("bucket").alias("_b_bk"),
        F.col("embedding").alias("_b_v"),
    ).withColumn("_b_n", _norm(F.col("_b_v")))
    cond = F.col("_a_bk") == F.col("_b_bk")
    if same_side:
        cond = cond & (F.col("_a_id") < F.col("_b_id"))
        # within-frame pairs = corpus-sized self-join: never
        # broadcast (see the dedup.py band-join note); the CROSS case
        # stays un-hinted — its base side carries real file stats and
        # broadcasting the day-sized new side is the desired plan
        an = an.hint("shuffle_hash")
    else:
        cond = cond & (F.col("_a_id") != F.col("_b_id"))
    cos = F.round(dot / (F.col("_a_n") * F.col("_b_n")), 8)
    return (
        an.join(bn, cond)
        .select(
            F.col("_a_id").alias("id_a"),
            F.col("_b_id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )


def embedding_signature_pairs(
    index: DataFrame,
    min_cosine: float = 0.9,
    id_col: str = "vec_id",
) -> DataFrame:
    """All within-frame bucket-local verified pairs (id_a < id_b) of
    one :func:`embedding_index` frame — the one-shot batch twin of
    :func:`incremental_embedding_pairs_from_table` (mirror of the
    minhash side's ``signature_pairs``), the reference side of the
    stream/batch equivalence law."""
    return _embedding_bucket_pairs(index, index, True, min_cosine, id_col)


def embedding_index_for_table(
    spark,
    table: str,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign a new batch with the SAVED index's (n_planes, seed) — the
    daily-delta ergonomic path. Auto-sizing the delta from its own
    (day-sized) count would usually pick fewer planes than the
    corpus-sized index and trip the mismatch guard by design; the
    index's stored constants are the source of truth. ONE metadata
    probe total (round 14): (n_planes, seed, dim) come from a single
    stored-row read — the dim pin ALSO makes the signing itself
    zero-job, and using the index's dim (not the delta's) is the
    correct family semantics: planes are built for the index width."""
    meta = spark.table(table).select(
        "n_planes", "seed", F.size("embedding").alias("_d")
    ).filter(F.col("_d").isNotNull()).first()
    if meta is None:
        raise ValueError(f"embedding index {table!r} is empty")
    return embedding_index(
        emb, n_planes=int(meta["n_planes"]), seed=int(meta["seed"]),
        id_col=id_col, vec_col=vec_col, dim=int(meta["_d"]),
    )
