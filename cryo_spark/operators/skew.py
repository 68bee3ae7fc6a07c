"""Skew-handling utilities.

AQE's skew-join splitting covers joins; these helpers cover the two
remaining hot-key shapes a chain/training-data workload hits:

- salted aggregation: a groupBy whose key distribution is power-law
  (one hot contract producing 30% of all logs) makes one reducer the
  straggler even with map-side combine when the aggregate state is
  large (collect_set/percentile). Two-phase salting bounds any
  reducer's share at 1/n_salts of the hot key.
- bucketed co-located writes: persist a table bucketed by its join
  key so repeated joins/aggregations on that key shuffle ZERO rows
  (SortMergeJoin without Exchange). The lakehouse analog of the
  reference's "same join keys in every table" design note
  (/root/reference/README.md:101).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) where fn is one
    of sum/count/min/max (the re-aggregatable algebra; avg = sum+count
    composed by the caller). Phase 1 aggregates on (keys + random
    salt) — hot keys split across ``n_salts`` reducers; phase 2
    combines the partials, whose cardinality is at most
    n_salts x distinct(keys).
    """
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for out, (col, fn) in aggs.items():
        if fn not in merge:
            raise ValueError(f"{fn} is not re-aggregatable; use sum/count/min/max")
    salted = df.withColumn(
        "__salt__", (F.rand(seed=42) * n_salts).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt__").agg(
        *[first[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[merge[fn](out).alias(out) for out, (col, fn) in aggs.items()]
    )


def table_bucket_spec(spark, table: str) -> tuple[int, list[str]] | None:
    """(num buckets, bucket columns) of an existing bucketed table, or
    None when the table doesn't exist / isn't bucketed — read from the
    catalog so appenders can adopt the layout the table was SAVED
    with instead of assuming a default."""
    if not spark.catalog.tableExists(table):
        return None
    info = {
        r.col_name: r.data_type
        for r in spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    }
    if "Num Buckets" not in info:
        return None
    cols = [
        c.strip().strip("`")
        for c in info.get("Bucket Columns", "").strip("[]").split(",")
        if c.strip()
    ]
    return int(info["Num Buckets"]), cols


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: Sequence[str],
    n_buckets: int = 32,
    sort_keys: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table:
    subsequent equi-joins/aggregations on the bucket keys read
    co-located data and skip the shuffle entirely.

    Overwrite is made idempotent against a stale warehouse: the table
    is dropped from the catalog AND any orphaned warehouse directory
    (left by a prior session whose metastore is gone) is removed, so
    ``LOCATION_ALREADY_EXISTS`` can never fire.

    Append ADOPTS the existing table's bucket COUNT (Spark refuses an
    append whose bucket spec differs, so a table saved with a
    non-default count would otherwise be un-appendable with the
    default ``n_buckets``) and fails fast with a clear error when the
    bucket KEYS differ — a key mismatch is a layout rebuild, not an
    append."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        _clean_orphan_location(spark, table)
    elif mode == "append":
        spec = table_bucket_spec(spark, table)
        if spec is not None:
            existing_n, existing_keys = spec
            if existing_keys and existing_keys != list(bucket_keys):
                raise ValueError(
                    f"table {table!r} is bucketed on {existing_keys}, "
                    f"not {list(bucket_keys)} — rebuild the table "
                    "instead of appending a different layout"
                )
            n_buckets = existing_n
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table)


def compact_bucketed_table(
    spark,
    table: str,
    tmp_suffix: str = "_compact_tmp",
    swap: bool = True,
) -> dict:
    """Rewrite a bucketed table that has accumulated append files
    (e.g. the daily-delta minhash index: every
    ``prepare_corpus_delta(update_index=True)`` day adds one file per
    bucket, so a year is ~365 files/bucket and every candidate join
    pays the opens). One pass through ``write_bucketed`` into a tmp
    table with the SAME saved bucket spec — the layout, and therefore
    every bucketed-read plan, is unchanged — then, after a row-count
    equality gate, the tmp is swapped in (drop + rename; metadata-only,
    a brief read gap but never data loss since the tmp is verified
    first). ``swap=False`` leaves the verified tmp for the caller to
    repoint manually. Returns {"files_in", "files_out", "rows"}."""
    spec = table_bucket_spec(spark, table)
    if spec is None:
        raise ValueError(
            f"{table!r} does not exist or is not bucketed — "
            "compact_parquet handles plain datasets"
        )
    n_buckets, keys = spec
    src = spark.table(table)
    files_in = len(src.inputFiles())
    rows_in = src.count()
    tmp = table + tmp_suffix
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    _clean_orphan_location(spark, tmp)
    # one file per bucket: group rows by the WRITER's bucket function
    # (pmod(murmur3, n) — what bucketBy assigns) via an explicit
    # column. Repartitioning on the raw keys does NOT work here: the
    # bucketed scan already satisfies that partitioning, Catalyst
    # elides/mangles the exchange, and the write emits one file per
    # (input file x bucket) — measured 98 files where 4 were expected.
    grouped = (
        src.withColumn("_cb", F.pmod(F.hash(*keys), F.lit(n_buckets)))
        .repartition(n_buckets, "_cb")
        .drop("_cb")
    )
    write_bucketed(grouped, tmp, keys, n_buckets=n_buckets)
    rows_out = spark.table(tmp).count()
    if rows_out != rows_in:
        raise RuntimeError(
            f"compaction row mismatch on {table!r}: {rows_in} in, "
            f"{rows_out} out — tmp table {tmp!r} kept for inspection"
        )
    files_out = len(spark.table(tmp).inputFiles())
    if swap:
        spark.sql(f"DROP TABLE {table}")
        _clean_orphan_location(spark, table)
        # rename moves the data directory under the warehouse too
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
    return {"files_in": files_in, "files_out": files_out, "rows": rows_in}


def compact_index_if_needed(
    spark, table: str, max_files_per_bucket: int
) -> dict | None:
    """Compact a bucketed index table when its file count crosses
    ``max_files_per_bucket`` files per bucket — the daily-delta
    maintenance hook (CLI ``--compact-every N``): every
    ``prepare_corpus_delta(update_index=True)`` day appends one file
    per bucket, so unmaintained indexes pay one file-open per day per
    bucket on every candidate join. Returns the
    :func:`compact_bucketed_table` report when compaction ran, None
    when the table is under threshold (a metadata-only check: one
    catalog lookup + one file listing, no data pass)."""
    if max_files_per_bucket < 1:
        raise ValueError(
            f"max_files_per_bucket must be >= 1, got {max_files_per_bucket}"
        )
    spec = table_bucket_spec(spark, table)
    if spec is None:
        raise ValueError(
            f"{table!r} does not exist or is not bucketed"
        )
    n_buckets, _ = spec
    files = len(spark.table(table).inputFiles())
    if files <= max_files_per_bucket * n_buckets:
        return None
    return compact_bucketed_table(spark, table)


def _clean_orphan_location(spark, table: str) -> None:
    """Remove a leftover warehouse directory for ``table`` that no
    catalog entry points at (stale ./spark-warehouse from a previous
    JVM). Only the default-database layout is handled — qualified
    names resolve to <warehouse>/<db>.db/<name>."""
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    if wh.scheme not in ("", "file"):
        return  # object-store warehouse: nothing local to clean
    parts = table.lower().split(".")
    sub = parts[-1] if len(parts) == 1 else f"{parts[-2]}.db/{parts[-1]}"
    shutil.rmtree(f"{wh.path or wh.netloc}/{sub}", ignore_errors=True)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True when the executed plan moves no rows between executors for
    the join: no ShuffleExchange (a BroadcastExchange ships only the
    small build side and is not a shuffle of the fact table)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan


def _zorder_numeric(df: DataFrame, c: str) -> Column:
    """Numeric view of a clustering column: timestamps/dates map to
    epoch micros/days (TIMESTAMP_NTZ cannot cast to double directly);
    string/binary map to their leading 8 bytes read as a big-endian
    unsigned integer — that view is monotone in lexicographic order,
    so clustering on it keeps each output file's RAW-column min/max
    range tight and parquet stats can prune point/range probes on the
    original string (a hash view would co-locate equal values but
    scatter the raw-column stats); numeric types cast to double.
    Unsupported types (array/map/struct) raise rather than silently
    producing a constant z-value."""
    from pyspark.sql import types as T

    dt = df.schema[c].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(F.col(c).cast("timestamp")).cast("double")
    if isinstance(dt, T.DateType):
        return F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
    if isinstance(dt, T.StringType):
        lead = F.substring(F.encode(F.col(c), "UTF-8"), 1, 8)
        return F.conv(F.hex(lead), 16, 10).cast("double")
    if isinstance(dt, T.BinaryType):
        return F.conv(F.hex(F.substring(F.col(c), 1, 8)), 16, 10).cast(
            "double"
        )
    if not isinstance(dt, (T.NumericType, T.BooleanType)):
        raise ValueError(
            f"z-order column {c!r} has unsupported type {dt.simpleString()}"
            " — only numeric/string/binary/timestamp/date columns cluster"
        )
    return F.col(c).cast("double")


def zorder_value(
    cols: Sequence[str],
    ranges: dict[str, tuple[float, float]],
    bits: int = 12,
    numeric: dict[str, Column] | None = None,
) -> Column:
    """Z-order (Morton) curve value over ``cols`` — each column is
    linearly scaled into ``bits``-wide integers using the supplied
    (min, max) ``ranges`` and the bit planes are interleaved, so rows
    close on the curve are close on EVERY participating column. NULLs
    scale to 0 (the curve's origin). ``numeric`` optionally overrides
    a column's numeric view (:func:`zorder_write` passes epoch-micro
    views for timestamp columns). Pure JVM expression: bits x
    len(cols) shift/or terms inside whole-stage codegen."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_value needs at least one column")
    if bits * n > 63:
        raise ValueError(
            f"bits*len(cols) = {bits * n} exceeds the 63-bit z-value "
            "budget — lower bits or cluster on fewer columns"
        )
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = ranges[c]
        span = (hi - lo) or 1.0
        base = (numeric or {}).get(c, F.col(c).cast("double"))
        v = (
            (F.coalesce(base, F.lit(float(lo))) - F.lit(float(lo)))
            / F.lit(float(span)) * F.lit(float(top))
        ).cast("long")
        scaled.append(F.greatest(F.lit(0), F.least(F.lit(top), v)))
    z: Column | None = None
    for b in range(bits):
        for i, v in enumerate(scaled):
            term = F.shiftleft(
                F.shiftright(v, b).bitwiseAND(F.lit(1)), b * n + i
            )
            z = term if z is None else z.bitwiseOR(term)
    return z


def zorder_cluster(
    df: DataFrame,
    cols: Sequence[str],
    bits: int,
    leading: Sequence[str],
) -> tuple[DataFrame, DataFrame]:
    """Shared z-order clustering step for the partitioned writers
    (:func:`cryo_spark.io.write_lake`,
    :func:`cryo_spark.operators.shards.write_training_shards`):
    persist ``df`` (MEMORY_AND_DISK), run the one min/max range probe
    over ``cols`` against the cache, and return ``(clustered,
    cached)`` where ``clustered`` is range-partitioned + sorted on
    ``(*leading, z)`` and ``cached`` is the persisted frame the
    caller must ``unpersist()`` after the write. The persist is what
    keeps this at ONE pass over the upstream lineage — without it the
    range probe executes the full plan once and the write executes it
    again, a real second scan for a 100 TB lake write with an
    expensive upstream."""
    from pyspark.storagelevel import StorageLevel

    numeric = {c: _zorder_numeric(df, c) for c in cols}
    cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    aggs = []
    for c in cols:
        aggs += [
            F.min(numeric[c]).alias(f"__lo_{c}"),
            F.max(numeric[c]).alias(f"__hi_{c}"),
        ]
    row = cached.agg(*aggs).first()
    ranges = {
        c: (
            float(row[f"__lo_{c}"]) if row[f"__lo_{c}"] is not None else 0.0,
            float(row[f"__hi_{c}"]) if row[f"__hi_{c}"] is not None else 0.0,
        )
        for c in cols
    }
    clustered = (
        cached.withColumn(
            "__z", zorder_value(cols, ranges, bits, numeric=numeric)
        )
        # range-partition and sort WITH the directory keys leading so
        # each task (and therefore each output file) covers one
        # partition dir x one contiguous z range
        .repartitionByRange(*leading, "__z")
        .sortWithinPartitions(*leading, "__z")
        .drop("__z")
    )
    return clustered, cached


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 12,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> dict[str, tuple[float, float]]:
    """Write ``df`` as parquet CLUSTERED along the z-order curve of
    ``cols`` — the multi-column data-skipping layout: after
    range-partitioning + sorting by the interleaved value, every
    output file covers a small hyper-rectangle of the key space, so
    parquet min/max stats prune point/range scans on ANY of the
    participating columns (a plain sort only skips on its leading
    column). The lakehouse OPTIMIZE ZORDER analog, composed from
    public Spark primitives: one min/max aggregate over ``cols``
    (returned, so incremental writers can reuse it), one range
    exchange on the z-value, a within-partition sort, and the write —
    no extra pass over the data.

    At 100 TB this is the layout knob for the second-and-later query
    columns: bucketing co-locates the JOIN key; z-order localizes the
    FILTER columns. Locality is asserted quantitatively in tests
    (per-file min/max spans shrink vs an unclustered write)."""
    numeric = {c: _zorder_numeric(df, c) for c in cols}
    aggs = []
    for c in cols:
        aggs += [
            F.min(numeric[c]).alias(f"__lo_{c}"),
            F.max(numeric[c]).alias(f"__hi_{c}"),
        ]
    row = df.agg(*aggs).first()
    ranges = {
        c: (
            float(row[f"__lo_{c}"] if row[f"__lo_{c}"] is not None else 0.0),
            float(row[f"__hi_{c}"] if row[f"__hi_{c}"] is not None else 0.0),
        )
        for c in cols
    }
    z = zorder_value(cols, ranges, bits, numeric=numeric).alias("__z")
    clustered = df.withColumn("__z", z)
    if n_files:
        clustered = clustered.repartitionByRange(n_files, "__z")
    else:
        clustered = clustered.repartitionByRange("__z")
    (
        clustered.sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
    return ranges
