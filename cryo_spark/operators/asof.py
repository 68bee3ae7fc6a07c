"""As-of join: for each left row, the closest right row at-or-before
(or at-or-after) its key.

The reference needs this once — timestamp → block-number resolution
is a binary search against the live chain
(/root/reference/crates/cli/src/parse/timestamps.rs:274-310). Offline
and at scale it generalizes to a first-class operator (time-series
enrichment, slowly-changing dims), which Spark lacks natively.

Implementation is the union-window shape, not a range join:
tag both sides, union on the key, one shuffle-sort per partition key,
then `last(right_struct, ignorenulls)` over rows-unbounded-preceding.
Shuffle volume = |L| + |R| (a range join materializes every candidate
pair before picking one). Equal keys resolve right-before-left, so
"backward" is at-or-before.

Without ``by`` keys the window is global — one task sorts everything,
which is fine to ~10M rows and fatal at 100 TB. ``num_buckets``
activates the scale path: keys are range-bucketed on approximate left
quantiles, each bucket matches independently in parallel, and
cross-bucket matches are preserved by replicating each bucket's
best-so-far right row into every later bucket (B^2/2 tiny carry rows
for B buckets — the standard parallel prefix trick). Results are
identical to the global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side__"
_PAYLOAD = "__asof_right__"
_BKT = "__asof_bucket__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str | None = None,
    by: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_right",
    num_buckets: int | None = None,
    dedup_left: bool = False,
) -> DataFrame:
    """Left as-of join. ``by`` adds equality partition keys
    (shuffle/partitioning key; within each group the window sort does
    the matching). Right columns that collide with left names get
    ``suffix``. ``num_buckets`` (no ``by`` only) range-partitions the
    key space so no single task sorts the whole frame — same results,
    B-way parallel.

    ``dedup_left``: opt in when the left key is low-cardinality
    relative to the row count (day-granularity dates, bucketed
    epochs). The as-of match runs once per DISTINCT key and the
    result broadcast-joins back onto the left rows — the left frame
    itself never enters the union window and never shuffles. The
    caller asserts the distinct-key set fits a broadcast (thousands
    of dates from billions of rows — the common enrichment shape)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be backward|forward")
    right_on = right_on or left_on
    by = by or []
    if num_buckets and by:
        raise ValueError("num_buckets applies only without by keys")
    if dedup_left:
        # resolve right-column collisions against the FULL left frame
        # first (the recursion only sees the key columns), so suffix
        # behavior is identical to the direct path
        pre = {
            c: c + suffix
            for c in right.columns
            if c in left.columns and c not in by and c != right_on
        }
        r2 = right
        for c, n in pre.items():
            r2 = r2.withColumnRenamed(c, n)
        keys = left.select(*by, left_on).distinct()
        matched = asof_join(
            keys, r2, left_on, right_on, by=by, direction=direction,
            suffix=suffix, num_buckets=num_buckets,
        )
        # LEFT join: the matched frame covers every non-null distinct
        # key, so results equal the inner join there — but left rows
        # whose join key (or a `by` key) is NULL must survive with
        # null right columns, exactly as the direct path keeps them.
        return left.join(F.broadcast(matched), [*by, left_on], "left")

    # union key type: identical types stay native (no precision loss
    # for long keys > 2^53 — nanosecond epochs, u64 ids); mixed
    # integer widths widen to long; only genuinely mixed numeric
    # types fall back to double (documented lossy above 2^53)
    lt = left.schema[left_on].dataType
    rt = right.schema[right_on].dataType
    integral = ("byte", "short", "integer", "long")
    if lt == rt:
        key_type = None
    elif lt.typeName() in integral and rt.typeName() in integral:
        key_type = "long"
    else:
        key_type = "double"

    def _key(c):
        return c if key_type is None else c.cast(key_type)

    rename = {
        c: (c + suffix if c in left.columns else c)
        for c in right.columns
        if c not in by and c != right_on
    }
    rcols = [F.col(c).alias(n) for c, n in rename.items()]
    r = right.select(
        *by,
        _key(F.col(right_on)).alias("__asof_key__"),
        F.struct(*rcols).alias(_PAYLOAD),
        F.lit(0).alias(_SIDE),
    )
    l = left.select(
        "*",
        _key(F.col(left_on)).alias("__asof_key__"),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        F.lit(1).alias(_SIDE),
    )
    lcols = [c for c in left.columns]
    both = l.select(
        *lcols, "__asof_key__", _PAYLOAD, _SIDE
    ).unionByName(
        r.select(
            *[F.lit(None).cast(dict(zip(left.columns, [f.dataType for f in left.schema]))[c]).alias(c)
              if c not in by else F.col(c)
              for c in lcols],
            "__asof_key__", _PAYLOAD, _SIDE,
        )
    )
    part_keys = list(by)
    if num_buckets and num_buckets > 1:
        # range buckets on approximate left-key quantiles. Boundary
        # precision is irrelevant to correctness — any split works,
        # the carry rows below repair cross-bucket matches — so the
        # double cast inside approxQuantile never loses matches even
        # for long keys beyond 2^53. An empty/constant left side
        # yields no boundaries: fall back to the global window (also
        # the empty-frame guard — no separate take(1) probe job).
        probs = [i / num_buckets for i in range(1, num_buckets)]
        bnds = sorted(set(
            left.select(F.col(left_on).cast("double").alias("k"))
            .approxQuantile("k", probs, 0.001)
        ))
        if not bnds:
            num_buckets = None
    if num_buckets and num_buckets > 1:
        arr = F.array(*[F.lit(float(x)) for x in bnds])
        def _bucket(keycol):
            k = keycol.cast("double")
            return F.aggregate(
                arr, F.lit(0),
                lambda acc, b: acc + F.when(k >= b, 1).otherwise(0),
            )
        both = both.withColumn(_BKT, _bucket(F.col("__asof_key__")))
        # carry: each bucket's best-so-far right row, replicated into
        # every bucket it can still match (earlier buckets for
        # backward, later for forward). <= B^2/2 rows, B ~ hundreds.
        rb = both.filter(F.col(_SIDE) == 0)
        if direction == "backward":
            pick = Window.partitionBy(_BKT).orderBy(
                F.col("__asof_key__").desc(), F.col(_SIDE).asc()
            )
            cond = F.col("__carry_to__") > F.col(_BKT)
        else:
            pick = Window.partitionBy(_BKT).orderBy(
                F.col("__asof_key__").asc(), F.col(_SIDE).asc()
            )
            cond = F.col("__carry_to__") < F.col(_BKT)
        lasts = (
            rb.withColumn("__rn__", F.row_number().over(pick))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )
        targets = left.sparkSession.range(num_buckets).select(
            F.col("id").cast("int").alias("__carry_to__")
        )
        carry = (
            lasts.join(F.broadcast(targets), cond)
            .withColumn(_BKT, F.col("__carry_to__"))
            .drop("__carry_to__")
        )
        both = both.unionByName(carry)
        part_keys = [_BKT]
    if direction == "backward":
        w = Window.partitionBy(*part_keys).orderBy(F.col("__asof_key__").asc(), F.col(_SIDE).asc())
    else:
        w = Window.partitionBy(*part_keys).orderBy(F.col("__asof_key__").desc(), F.col(_SIDE).asc())
    w = w.rowsBetween(Window.unboundedPreceding, 0)
    matched = both.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    out = matched.filter(F.col(_SIDE) == 1).drop(_SIDE, "__asof_key__")
    if num_buckets and num_buckets > 1:
        out = out.drop(_BKT)
    for c, n in rename.items():
        out = out.withColumn(n, F.col(f"{_PAYLOAD}.{n}"))
    return out.drop(_PAYLOAD)
