"""The driver fixture has shipped ``events.ts`` under two physical
parquet encodings across rounds:

- timestamp[ns] (Spark's vector reader rejects it; readable as int64
  nanos via ``spark.sql.legacy.parquet.nanosAsLong``), and
- timestamp[us] (reads as TIMESTAMP_NTZ).

Round 3 died because the contract assumed the first. These tests pin
the contract entries to produce IDENTICAL results under both
encodings, so the next driver-side regeneration cannot regress the
suite again."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    """Two copies of the sf0.001 testdata differing only in the
    physical type of events.ts (ns vs us)."""
    tbl = pq.read_table(f"{SF}/events.parquet")
    i = tbl.schema.get_field_index("ts")
    out = {}
    for unit in ("ns", "us"):
        d = tmp_path_factory.mktemp(f"enc_{unit}")
        cast = tbl.set_column(
            i, "ts", tbl.column("ts").cast(pa.timestamp(unit))
        )
        pq.write_table(cast, d / "events.parquet")
        shutil.copy(f"{SF}/orders.parquet", d / "orders.parquet")
        out[unit] = str(d)
    return out


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("query", ["events_hourly", "orders_asof_events",
                                   "salted_event_totals"])
def test_entries_identical_under_both_ts_encodings(spark, encoded_dirs, query):
    fn = entrymod.GENERIC[query][0]
    got = {u: _rows(fn(spark, d)) for u, d in encoded_dirs.items()}
    assert got["ns"], "query returned no rows — vacuous check"
    assert got["ns"] == got["us"]


def test_epoch_seconds_floor_semantics(spark, encoded_dirs):
    """Floor (not round) to the second under both encodings — DuckDB's
    ``epoch(ts)::BIGINT`` rounds, which is why the oracles truncate
    first; the Spark side must floor identically."""
    from pyspark.sql import functions as F

    for unit, d in encoded_dirs.items():
        ev = entrymod._read_events(spark, d)
        row = (
            ev.select(
                entrymod._epoch_seconds(ev).alias("e"),
                F.col("ts").cast("string").alias("s"),
            )
            .orderBy("e")
            .first()
        )
        # fixture min ts is 2024-01-01 00:09:58.778549 UTC -> floor
        assert row["e"] == 1704067798, (unit, row)


@pytest.fixture(scope="module")
def date_encoded_dirs(tmp_path_factory):
    """Two copies of sf0.001 differing in o_orderdate's physical type
    (timestamp[us] vs date32) — the other dtype drift a driver-side
    testdata regeneration could introduce."""
    tbl = pq.read_table(f"{SF}/orders.parquet")
    i = tbl.schema.get_field_index("o_orderdate")
    out = {}
    for unit, typ in (("us", pa.timestamp("us")), ("date", pa.date32())):
        d = tmp_path_factory.mktemp(f"orders_{unit}")
        cast = tbl.set_column(
            i, "o_orderdate", tbl.column("o_orderdate").cast(typ)
        )
        pq.write_table(cast, d / "orders.parquet")
        shutil.copy(f"{SF}/customer.parquet", d / "customer.parquet")
        shutil.copy(f"{SF}/events.parquet", d / "events.parquet")
        out[unit] = str(d)
    return out


@pytest.mark.parametrize("query", ["first_order_per_customer",
                                   "customers_without_orders",
                                   "orders_asof_events"])
def test_entries_identical_under_both_date_encodings(spark, date_encoded_dirs, query):
    fn = entrymod.GENERIC[query][0]
    got = {u: _rows(fn(spark, d)) for u, d in date_encoded_dirs.items()}
    if query != "customers_without_orders":  # legitimately empty at sf0.001
        assert got["us"], "query returned no rows — vacuous check"
    assert got["us"] == got["date"]
