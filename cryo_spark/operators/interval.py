"""Range (interval-containment) join: match each left row's point key
to every right interval containing it.

Spark has no native range join — the naive formulation
``l.join(r, (l.x >= r.s) & (l.x < r.e))`` is a broadcast-nested-loop
(or cartesian) plan that dies at scale. Like the as-of join
(/root/reference/crates/cli/src/parse/timestamps.rs:274-310 is the
reference's one appearance of time-bucketed matching), this
generalizes to a first-class operator a training-data pipeline needs
constantly: event -> session attribution, time-windowed feature
joins, IP-range / numeric-band lookups.

Scale shape: the key axis is cut into fixed-width buckets. Each left
row lands in exactly ONE bucket; each right interval replicates into
the ceil(len/width) buckets it overlaps. An equality shuffle join on
the bucket id co-locates every candidate pair, and the exact
containment predicate filters within buckets. Shuffle volume =
|L| + |R| x avg_span/width, join work is bucket-local — never |L|x|R|.
Pick ``bucket_width`` ~ the typical interval length: wider buckets
cut replication, narrower buckets cut per-bucket candidates. When
omitted it derives from the right side's median interval length
(one approxQuantile action at plan time, same pattern as
``asof_join``'s range bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BKT = "__iv_bucket__"


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    start: str = "start",
    end: str = "end",
    how: str = "inner",
    bucket_width: float | None = None,
    suffix: str = "_right",
    max_buckets_per_interval: int = 1_000_000,
) -> DataFrame:
    """Join ``left`` rows to every ``right`` interval with
    ``start <= left[on] < end`` (half-open, the standard window
    convention). ``how`` is ``inner`` or ``left`` (unmatched left
    rows keep null right columns). Right columns colliding with left
    names get ``suffix``. Intervals with ``end <= start`` match
    nothing (empty half-open range).

    Keys bucket through a double cast, so integer keys beyond 2^53
    may land one bucket off (the containment predicate itself always
    evaluates the ORIGINAL columns exactly); for such keys pass a
    ``bucket_width`` that divides the key range so boundaries stay
    representable — same caveat as ``asof_join``'s mixed-type
    fallback."""
    if how not in ("inner", "left"):
        raise ValueError("how must be inner|left")
    rename = {
        c: (c + suffix if c in left.columns else c)
        for c in right.columns
    }
    r = right.select(*[F.col(c).alias(n) for c, n in rename.items()])
    rs, re_ = rename[start], rename[end]
    if bucket_width is None:
        # median interval length — any positive width is CORRECT
        # (buckets only gate candidate generation); the median just
        # balances replication vs bucket size
        q = right.select(
            (F.col(end).cast("double") - F.col(start).cast("double")).alias("len")
        ).filter(F.col("len") > 0)
        med = q.approxQuantile("len", [0.5], 0.01)
        bucket_width = med[0] if med and med[0] > 0 else 1.0
    w = float(bucket_width)

    lb = left.withColumn(_BKT, F.floor(F.col(on).cast("double") / w))
    # a right interval covers buckets floor(s/w) .. floor(e/w). For an
    # end exactly on a bucket boundary the last bucket is one more
    # than the half-open range strictly needs — harmless (the exact
    # predicate filters it), and an epsilon-subtraction "fix" would
    # DROP true matches whenever the end sits within the epsilon
    # above a boundary, so buckets deliberately over-cover.
    lo = F.floor(F.col(rs).cast("double") / w)
    hi = F.floor(F.col(re_).cast("double") / w)
    # one outlier interval + a small width must fail loudly, not build
    # a billions-element sequence: F.sequence hard-caps near 2^31 and
    # executors OOM well before that
    hi = F.when(
        hi - lo > F.lit(int(max_buckets_per_interval)),
        F.raise_error(F.concat(
            F.lit(
                "interval spans more than "
                f"{max_buckets_per_interval} buckets — raise "
                "bucket_width (interval ["
            ),
            F.col(rs).cast("string"), F.lit(", "),
            F.col(re_).cast("string"), F.lit(") at width "),
            F.lit(str(w)), F.lit(")"),
        )),
    ).otherwise(hi)
    rb = (
        r.filter(F.col(re_) > F.col(rs))
        .withColumn(_BKT, F.explode(F.sequence(lo, F.greatest(hi, lo))))
    )
    matched = lb.join(
        rb,
        (lb[_BKT] == rb[_BKT])
        & (F.col(on) >= F.col(rs))
        & (F.col(on) < F.col(re_)),
        "inner",
    ).drop(_BKT)
    if how == "inner":
        return matched
    # left join: union unmatched left rows back with null right cols
    unmatched = lb.join(
        rb.select(_BKT, rs, re_),
        (lb[_BKT] == rb[_BKT])
        & (F.col(on) >= F.col(rs))
        & (F.col(on) < F.col(re_)),
        "left_anti",
    ).drop(_BKT)
    for c in r.columns:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(r.schema[c].dataType))
    return matched.unionByName(unmatched)


def interval_join_sql(
    left_table: str, right_table: str, on: str,
    start: str = "start", end: str = "end", how: str = "inner",
) -> str:
    """DuckDB-equivalent SQL (the engine's IEJoin handles the range
    predicate natively) — the oracle for equivalence tests."""
    join = "JOIN" if how == "inner" else "LEFT JOIN"
    return (
        f"SELECT * FROM {left_table} l {join} {right_table} r "
        f"ON l.{on} >= r.{start} AND l.{on} < r.{end}"
    )
