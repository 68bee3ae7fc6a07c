"""Sequence preparation: token windowing and bin packing.

The last mile of a pretraining pipeline: cut documents into
fixed-size token windows (with overlap for context continuity), then
pack variable-length pieces into fixed-budget training sequences.

Scale design (the 100 TB story):
- ``token_windows`` is scan -> explode: the window index array is
  built per row from JVM expressions and exploded; output size is
  input size x (1/stride overlap factor), no shuffle, no Python.
  Exactly oracle-checkable (Spark ``sequence`` and DuckDB
  ``generate_series`` share inclusive-aligned step semantics).
- ``pack_sequences`` is greedy first-fit-decreasing per PARTITION
  (Arrow mapInPandas, partition id from TaskContext): packing is
  embarrassingly parallel when each task packs its own slice — a
  global optimal packing would serialize the world for a ~1%
  fill-factor gain. Bin ids are made globally unique by offsetting
  with the partition id. EXACTLY one shuffle (the repartition that
  balances docs across packers doubles as the packing boundary — a
  groupBy formulation would re-exchange the same rows); fill quality
  is asserted by tests, not assumed.
- ``pack_bins`` materializes the packed sequences themselves —
  per-bin concatenated token (and loss-mask) arrays in deterministic
  doc_id order — with one bin_id shuffle and a budget-bounded
  collect_list per group; the concatenation is built-in
  flatten/transform, no Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cryo_spark.operators.util import spread


def token_windows(
    df: DataFrame,
    window: int = 128,
    stride: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into whitespace-token windows of
    ``window`` tokens every ``stride`` tokens, plus a final tail
    window ending at the last token (so every token is covered).
    Output: (id, start_tok, n_win_tokens, window_text)."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    df = spread(df)
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"[ \t\n\x0b\f\r]+", " ")
    toks = df.select(F.col(id_col), F.split(norm, " ").alias("t"))
    t = F.col("t")
    last = F.greatest(F.size(t) - window, F.lit(0))
    starts = F.array_distinct(
        F.concat(F.sequence(F.lit(0), last, F.lit(stride)), F.array(last))
    )
    exploded = toks.select(F.col(id_col), t, F.explode(starts).alias("start_tok"))
    piece = F.slice(t, F.col("start_tok") + 1, window)
    return exploded.select(
        F.col(id_col),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(piece).cast("long").alias("n_win_tokens"),
        F.array_join(piece, " ").alias("window_text"),
    )


def token_windows_sql(
    table: str,
    window: int = 128,
    stride: int = 64,
    text_col: str = "text",
    id_expr: str = "doc_id",
) -> str:
    norm = f"regexp_replace(trim(lower({text_col})), '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')"
    return f"""
WITH toks AS (
  SELECT {id_expr} AS doc_id, string_split({norm}, ' ') AS t FROM {table}
), starts AS (
  SELECT doc_id, t,
    unnest(list_distinct(list_append(
      generate_series(0, greatest(len(t) - {window}, 0), {stride}),
      greatest(len(t) - {window}, 0)))) AS start_tok
  FROM toks
)
SELECT doc_id,
  start_tok::BIGINT AS start_tok,
  len(t[start_tok + 1 : start_tok + {window}])::BIGINT AS n_win_tokens,
  array_to_string(t[start_tok + 1 : start_tok + {window}], ' ') AS window_text
FROM starts
"""


def _id_list(id_col) -> list[str]:
    return [id_col] if isinstance(id_col, str) else list(id_col)


def _ffd_assign(counts, budget: int) -> list[int]:
    """First-fit-decreasing core over an ALREADY-SORTED (descending)
    token-count sequence: returns the 0-based bin index per item.
    Pure function so its invariants (every item placed, bin sums <=
    budget except singletons, dense bin ids) are property-tested
    without a Spark session."""
    bins: list[int] = []  # remaining capacity per bin
    assign: list[int] = []
    for n in counts:
        placed = None
        for i, cap in enumerate(bins):
            if cap >= n:
                placed = i
                bins[i] = cap - n
                break
        if placed is None:
            # an oversize item's bin is CLOSED (capacity -1, not 0):
            # with 0 a zero-count item would first-fit into it and
            # break the oversize-bins-are-singletons contract
            # (property-test-found edge)
            bins.append(budget - n if n <= budget else -1)
            placed = len(bins) - 1
        assign.append(placed)
    return assign


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    id_col: str | list[str] = "doc_id",
    count_col: str = "n_tokens",
    partitions: int | None = None,
    group_cols: list[str] | None = None,
    _bin_stride: int = 10_000_000,
) -> DataFrame:
    """Greedy first-fit-decreasing bin packing of documents into
    training sequences of at most ``budget`` tokens. Returns
    (*id cols, n_tokens, bin_id, bin_fill) — bin_fill is the packed
    token total of the doc's bin. Docs longer than the budget get a
    singleton bin (truncation is the caller's policy). Packing runs
    independently per partition; bin ids are globally unique via a
    partition-id offset of ``_bin_stride`` local bins.

    Scale note (collision-impossible by construction): a packer task
    whose local bin count reaches the stride would silently bleed
    into the next partition's id range, merging unrelated bins in
    :func:`pack_bins` — so the task RAISES at the stride boundary
    with the fix (more ``partitions``) in the message instead. At the
    default stride that is >10M bins in one task — ≥10M docs landing
    on a single packer partition, far past the point the repartition
    below should have spread them — so a production run never hits
    it; ``_bin_stride`` exists to force the edge in tests.

    ``id_col`` may be a LIST of columns when one column is not a key
    — e.g. an epoch-upsampled corpus where identity is (doc_id,
    epoch); rows must be unique under the id tuple or the downstream
    join in :func:`pack_bins` cross-multiplies copies. Id columns
    keep their own names AND types (string urls, int32 ids, ...).

    ``group_cols`` (e.g. ``["split"]``) makes packing group-local: a
    bin never mixes docs from different groups (a train bin must not
    swallow validation docs). Group columns pass through the output,
    and bin ids are then unique per (group values) — key bins by the
    group columns PLUS bin_id, since two groups landing in the same
    packer partition reuse the same offset range."""
    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    groups = list(group_cols or [])
    ids = _id_list(id_col)
    out_cols = groups + ids + ["n_tokens", "bin_id", "bin_fill"]

    # ONE shuffle: the repartition below both balances docs across
    # packers and IS the packing boundary — each task packs its own
    # partition via mapInPandas (partition id from TaskContext), so
    # no second groupBy exchange re-moves the (doc_id, n_tokens)
    # rows. FFD needs the whole slice at once; the concat holds the
    # same rows applyInPandas would have materialized per group.
    def pack_part(it):
        from pyspark import TaskContext

        pdfs = list(it)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        part = TaskContext.get().partitionId()

        def ffd(sub: pd.DataFrame) -> pd.DataFrame:
            sub = sub.sort_values(
                ["n_tokens"] + ids, ascending=[False] + [True] * len(ids)
            )
            assign = _ffd_assign(sub["n_tokens"].to_numpy(), budget)
            if assign and max(assign) >= _bin_stride:
                raise ValueError(
                    f"packer partition {part} produced {max(assign) + 1} "
                    f"local bins, at the id stride {_bin_stride} — bin "
                    "ids would collide with the next partition's range; "
                    "raise pack_sequences(partitions=...) to spread "
                    "docs across more packer tasks"
                )
            sub = sub.assign(bin_id=[part * _bin_stride + a for a in assign])
            fills = sub.groupby("bin_id")["n_tokens"].transform("sum")
            return sub.assign(bin_fill=fills)

        if groups:
            res = pd.concat(
                [
                    ffd(g)
                    for _, g in pdf.groupby(groups, sort=False, dropna=False)
                ],
                ignore_index=True,
            )
        else:
            res = ffd(pdf)
        yield res[out_cols]

    typed = [
        f"`{c}` {df.schema[c].dataType.simpleString()}"
        for c in groups + ids
    ]
    schema = ", ".join(typed + ["n_tokens long, bin_id long, bin_fill long"])
    prepped = df.select(
        *groups,
        *ids,
        F.col(count_col).cast("long").alias("n_tokens"),
    ).repartition(n_parts, *(groups + ids))
    return prepped.mapInPandas(pack_part, schema)


def pack_bins(
    df: DataFrame,
    budget: int = 2048,
    id_col: str | list[str] = "doc_id",
    tokens_col: str = "tokens",
    mask_col: str | None = None,
    assignment: DataFrame | None = None,
    partitions: int | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Materialize packed TRAINING SEQUENCES from per-doc token (and
    optional loss-mask) arrays: what a trainer actually loads, not
    just the :func:`pack_sequences` assignment. Returns one row per
    bin — (bin_id, n_docs, n_tokens, doc_ids, tokens[, loss_mask]) —
    where ``tokens`` is the concatenation of member docs' arrays in
    ascending doc_id order (deterministic, and documented as the
    in-bin order contract) and ``loss_mask`` is concatenated the same
    way so index-for-index alignment with ``tokens`` survives packing
    (the chat loss-mask contract).

    Pass ``assignment`` to reuse an existing pack_sequences output
    (e.g. when the caller also writes the assignment table);
    otherwise one is computed here from ``size(tokens_col)``.
    ``group_cols`` (e.g. ``["split"]``) keeps bins group-local (see
    :func:`pack_sequences`) and rides the group columns through to
    the bin rows — the bin key is then (group values, bin_id).

    Scale shape: the token arrays move once into the bin aggregation
    (each group budget-bounded — singleton oversize docs aside — so
    collect_list per bin is O(budget), never a skew risk) plus the
    assignment join, whose strategy is deliberately left to AQE: the
    assignment is broadcast when small and co-partitioned on doc_id
    when corpus-sized (it is one row per doc — force-broadcasting it
    would be wrong at scale). Tokens are NOT routed through the
    packer itself: the packer's pandas pass materializes its whole
    partition, which is fine for (doc_id, n_tokens) rows and an OOM
    for token arrays. The flatten/sort/transform chain is all
    built-in JVM functions: no Python in the concatenation."""
    groups = list(group_cols or [])
    ids = _id_list(id_col)
    if assignment is None:
        assignment = pack_sequences(
            df.select(
                *groups,
                *ids,
                F.size(tokens_col).cast("long").alias("n_tokens"),
            ),
            budget=budget,
            id_col=ids,
            partitions=partitions,
            group_cols=groups or None,
        )
    # id columns keep their NATIVE types — a long cast here would turn
    # string ids into NULL join keys and silently drop every row
    fields = [
        *[F.col(i) for i in ids],
        F.col(tokens_col).alias("_toks"),
    ]
    if mask_col is not None:
        fields.append(F.col(mask_col).alias("_mask"))
    joined = df.select(*fields).join(
        assignment.select(*groups, *ids, "bin_id"), ids
    )
    # struct sorts field-by-field → ascending id tuple defines in-bin
    # order; flatten(transform(...)) concatenates JVM-side
    members = F.array_sort(
        F.collect_list(
            F.struct(
                *[F.col(i) for i in ids],
                F.col("_toks"),
                *([F.col("_mask")] if mask_col is not None else []),
            )
        )
    )
    # single id → plain array of ids; composite id → array<struct>
    doc_ids = (
        F.transform("_m", lambda m: m[ids[0]])
        if len(ids) == 1
        else F.transform(
            "_m", lambda m: F.struct(*[m[i].alias(i) for i in ids])
        )
    )
    out = joined.groupBy(*groups, "bin_id").agg(members.alias("_m")).select(
        *groups,
        "bin_id",
        F.size("_m").alias("n_docs"),
        doc_ids.alias("doc_ids"),
        F.flatten(F.transform("_m", lambda m: m["_toks"])).alias(
            tokens_col
        ),
        *(
            [
                F.flatten(F.transform("_m", lambda m: m["_mask"])).alias(
                    mask_col
                )
            ]
            if mask_col is not None
            else []
        ),
    )
    return out.select(
        *groups,
        "bin_id",
        "n_docs",
        F.size(tokens_col).cast("long").alias("n_tokens"),
        "doc_ids",
        tokens_col,
        *([mask_col] if mask_col is not None else []),
    )
