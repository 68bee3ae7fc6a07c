"""Property-based tests (hypothesis) for planner arithmetic and
binary decode — invariants that unit examples can miss."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cryo_spark import plan


@given(
    start=st.integers(0, 10**7),
    size=st.integers(1, 10**5),
    chunk=st.integers(1, 10**4),
)
@settings(max_examples=200, deadline=None)
def test_subchunks_partition_the_range_exactly(start, size, chunk):
    end = start + size - 1
    chunks = plan.subchunk_by_size([plan.BlockChunk(start=start, end=end)], chunk)
    # contiguous, disjoint, ordered, covering
    assert chunks[0].start == start and chunks[-1].end == end
    for a, b in zip(chunks, chunks[1:]):
        assert b.start == a.end + 1
    assert all(c.size() <= chunk for c in chunks)
    assert sum(c.size() for c in chunks) == size


@given(
    start=st.integers(0, 10**7),
    size=st.integers(1, 10**5),
    chunk=st.integers(1, 10**4),
)
@settings(max_examples=200, deadline=None)
def test_align_yields_multiples_inside_range(start, size, chunk):
    end = start + size - 1
    a = plan.align_chunk(plan.BlockChunk(start=start, end=end), chunk)
    if a is not None:
        assert a.start % chunk == 0 and a.end % chunk == 0
        assert start <= a.start <= a.end <= end
    else:
        # no aligned sub-range exists
        assert (end // chunk) * chunk <= -(-start // chunk) * chunk


@given(items=st.lists(st.integers(), min_size=0, max_size=500), n=st.integers(0, 600))
@settings(max_examples=200, deadline=None)
def test_evenly_spaced_subset_invariants(items, n):
    out = plan.evenly_spaced_subset(items, n)
    assert len(out) == (0 if n == 0 or not items else min(n, len(items)))
    assert all(x in items for x in out)
    if items and 2 <= n:
        assert out[0] == items[0]
        if n >= len(items):
            assert out == items


@given(n=st.integers(0, 10**9), unit=st.sampled_from(["", "K", "M", "k", "m"]))
@settings(max_examples=100, deadline=None)
def test_block_number_suffix_scaling(n, unit):
    scale = {"": 1, "K": 10**3, "k": 10**3, "M": 10**6, "m": 10**6}[unit]
    if n * scale > 10**15:
        return
    assert plan.parse_block_number(f"{n}{unit}", "none") == n * scale


@given(
    lo=st.integers(0, 10**6),
    size=st.integers(1, 10**6),
    latest=st.integers(0, 2 * 10**6),
    buffer=st.integers(0, 10**6),
)
@settings(max_examples=200, deadline=None)
def test_reorg_buffer_never_keeps_recent_blocks(lo, size, latest, buffer):
    out = plan.apply_reorg_buffer(
        [plan.BlockChunk(start=lo, end=lo + size - 1)], latest, buffer
    )
    for c in out:
        assert c.max_value() <= latest - buffer or buffer == 0
        assert c.min_value() >= lo and c.max_value() <= lo + size - 1


def test_be_uint_matches_python_bigint(spark):
    """JVM limb decode == int.from_bytes over random widths 0..16."""
    from cryo_spark.functions import be_uint

    rng = np.random.default_rng(123)
    rows = []
    for i in range(300):
        width = int(rng.integers(0, 17))
        rows.append((i, rng.integers(0, 256, width, dtype=np.uint8).tobytes()))
    df = spark.createDataFrame(rows, "i long, b binary")
    got = {
        r.i: None if r.v is None else int(r.v)
        for r in df.select("i", be_uint("b").alias("v")).collect()
    }
    for i, b in rows:
        expect = int.from_bytes(b, "big")
        if expect < 10**38:
            assert got[i] == expect, (i, b.hex())
        else:
            # beyond the decimal(38,0) carrier: degrades to NULL
            # rather than failing the job (SCALE.md known limits)
            assert got[i] is None, (i, b.hex())


def test_u256_views_consistent_for_random_values(spark):
    from decimal import Decimal

    from cryo_spark.schema_select import u256_view_cols

    rng = np.random.default_rng(7)
    # full 256-bit domain: random 62-bit mantissas shifted anywhere in
    # the word, including values far beyond 2^128
    vals = [int(rng.integers(0, 1 << 62)) << int(rng.integers(0, 194)) for _ in range(100)]
    vals = [v % (1 << 256) for v in vals]
    df = spark.createDataFrame([(i, v.to_bytes(32, "big")) for i, v in enumerate(vals)],
                               "i long, value binary")
    out = df.select(
        "i", *u256_view_cols("value", ["_binary", "_string", "_u64", "_u32"])
    ).collect()
    for r in out:
        v = vals[r.i]
        assert r.value_binary == v.to_bytes(32, "big")
        assert int(r.value_string) == v
        lo64 = v % (1 << 64)
        assert r.value_u64 == lo64 - (1 << 64) * (lo64 >= (1 << 63))
        lo32 = v % (1 << 32)
        assert r.value_u32 == lo32 - (1 << 32) * (lo32 >= (1 << 31))


@settings(max_examples=12, deadline=None)
@given(
    lkeys=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=0, max_size=40),
    rkeys=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=0, max_size=40),
    direction=st.sampled_from(["backward", "forward"]),
    num_buckets=st.sampled_from([None, 4]),
    dedup_left=st.booleans(),
)
def test_asof_join_matches_pandas_merge_asof(
    spark, lkeys, rkeys, direction, num_buckets, dedup_left
):
    """Differential oracle: every asof_join configuration must agree
    with pandas.merge_asof (an independent implementation) on random
    key sets — including duplicate keys, empty sides, and equal-key
    ties (at-or-before/at-or-after semantics both engines share)."""
    import pandas as pd

    from cryo_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(k, i) for i, k in enumerate(lkeys)] or [(None, None)],
        "k long, lid long",
    ).filter(F.col("k").isNotNull())
    right_rows = sorted({k for k in rkeys})
    right = spark.createDataFrame(
        [(k, k * 7) for k in right_rows] or [(None, None)],
        "rk long, payload long",
    ).filter(F.col("rk").isNotNull())

    got = {
        (r.lid): (r.k, r.payload)
        for r in asof_join(
            left, right, "k", "rk", direction=direction,
            num_buckets=num_buckets, dedup_left=dedup_left,
        ).collect()
    }

    lp = pd.DataFrame({"k": lkeys, "lid": range(len(lkeys))}).sort_values("k")
    rp = pd.DataFrame({"rk": right_rows, "payload": [k * 7 for k in right_rows]})
    if len(lp) and len(rp):
        m = pd.merge_asof(
            lp.astype({"k": "int64"}), rp.astype({"rk": "int64"}),
            left_on="k", right_on="rk", direction=direction,
        )
        want = {
            int(r.lid): (int(r.k), None if pd.isna(r.payload) else int(r.payload))
            for r in m.itertuples()
        }
    else:
        want = {int(i): (int(k), None) for i, k in enumerate(lkeys)}
    assert got == want


@given(
    counts=st.lists(st.integers(0, 5000), min_size=0, max_size=300),
    budget=st.integers(1, 2048),
)
@settings(max_examples=200, deadline=None)
def test_ffd_assign_invariants(counts, budget):
    """First-fit-decreasing packer core: every item placed exactly
    once, bin ids dense from 0, per-bin totals within budget unless a
    single oversize item, and no two bins are BOTH under half budget
    (else the later one would have first-fit into the earlier)."""
    from cryo_spark.operators.seqprep import _ffd_assign

    ordered = sorted(counts, reverse=True)
    assign = _ffd_assign(ordered, budget)
    assert len(assign) == len(ordered)
    if not ordered:
        return
    n_bins = max(assign) + 1
    assert sorted(set(assign)) == list(range(n_bins))  # dense ids
    sums = [0] * n_bins
    members = [0] * n_bins
    for a, n in zip(assign, ordered):
        sums[a] += n
        members[a] += 1
    for s_, m in zip(sums, members):
        assert s_ <= budget or m == 1  # oversize = singleton
    under_half = [s_ for s_ in sums if s_ * 2 < budget]
    # classical FFD property: at most one bin less than half full
    assert len(under_half) <= 1
