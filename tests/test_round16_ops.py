"""Round-16 operator tests: z-order string/binary clustering (the r15
ADVICE medium — string columns cast to double produced NULL, so the
z-value was constant and clustering silently no-op'd), the persisted
range probe, synonym-SQL quote escaping, and driver-side decoder
resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------ z-order: string/binary numeric views


def test_zorder_numeric_string_is_lexicographic_and_nonconstant(spark):
    """Strings map to their leading-8-byte big-endian integer view —
    monotone in lexicographic order and NON-constant for hex-hash
    columns (the silent no-op the r15 advisor flagged: cast-to-double
    on '0x89ab...' was NULL for every row)."""
    from cryo_spark.operators import skew

    df = spark.createDataFrame(
        [("0x00ab",), ("0x89cd",), ("0xff01",), (None,)], ["h"]
    )
    vals = [
        r.v
        for r in df.select(skew._zorder_numeric(df, "h").alias("v"))
        .collect()
    ]
    assert vals[3] is None  # NULL stays NULL (zorder_value maps it to lo)
    nn = vals[:3]
    assert len(set(nn)) == 3, "hex strings must get DISTINCT numeric views"
    # lexicographic order preserved: '0x00ab' < '0x89cd' < '0xff01'
    assert nn[0] < nn[1] < nn[2]


def test_zorder_numeric_binary_and_unsupported(spark):
    from cryo_spark.operators import skew

    df = spark.createDataFrame(
        [(bytearray(b"\x00\x01"),), (bytearray(b"\xff\xee"),)], ["b"]
    )
    vals = [
        r.v
        for r in df.select(skew._zorder_numeric(df, "b").alias("v"))
        .collect()
    ]
    assert vals[0] < vals[1]

    arr = spark.createDataFrame([([1, 2],)], ["a"])
    with pytest.raises(ValueError, match="unsupported type"):
        skew._zorder_numeric(arr, "a")


def test_write_lake_zorder_string_column_clusters(spark, tmp_path):
    """END-TO-END proof the advisor's no-op is fixed: write_lake with
    zorder on a hex-string address column must co-locate equal
    addresses so a point probe reads a strict subset of files (with
    the constant-z bug every file covered every address)."""
    import random

    from cryo_spark import io as cio

    rng = random.Random(16)
    addrs = ["0x%040x" % rng.getrandbits(160) for _ in range(40)]
    rows = [
        (1, rng.randrange(0, 2_000_000), rng.choice(addrs))
        for _ in range(4000)
    ]
    df = spark.createDataFrame(rows, ["chain_id", "block_number", "address"])
    root = str(tmp_path / "lake")
    cio.write_lake(
        df.repartition(8),
        root,
        "tx",
        bucket_size=1_000_000,
        max_records_per_file=300,
        mode="overwrite",
        zorder=["address"],
    )
    back = spark.read.parquet(root + "/tx")
    assert back.count() == 4000
    # file-stat pruning: per-file address min/max ranges must not all
    # span the whole space — count files whose [min,max] covers a probe
    import pyarrow.parquet as pq
    import glob

    files = glob.glob(root + "/tx/**/*.parquet", recursive=True)
    assert len(files) > 1
    probe = addrs[0]
    covering = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "address"
            )
            st = col.statistics
            lo = st.min if st is not None else None
            hi = st.max if st is not None else None
            if isinstance(lo, bytes):
                lo, hi = lo.decode(), hi.decode()
            if st is None or lo <= probe <= hi:
                covering += 1
                break
    assert covering < len(files), (
        "z-order on a string column must prune SOME files for a point "
        f"probe (covering {covering}/{len(files)})"
    )


# ------------------ synonym SQL twin: quote escaping


def test_stub_synonym_encoder_sql_escapes_quotes(spark):
    """Apostrophe-bearing synonyms ("don't" -> "do not") must build a
    valid, non-injectable DuckDB CASE arm and still match the Spark
    adapter bit-for-bit."""
    import duckdb

    from cryo_spark.operators import encode

    docs = spark.createDataFrame(
        [("d1", "don't stop"), ("d2", "do_not stop"), ("d3", "it's fine")],
        ["doc_id", "text"],
    )
    syn = {"don't": "do_not", "it's": "it_is"}
    enc = encode.stub_synonym_encoder(dim=8, synonyms=syn)
    got = {
        r.doc_id: tuple(r.embedding)
        for r in encode.encode_documents(docs, enc, dim=8).collect()
    }
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    sql = encode.stub_synonym_encoder_sql("docs", dim=8, synonyms=syn)
    want = {
        row[0]: tuple(row[1])
        for row in con.execute(sql).fetchall()
    }
    assert got == want
    # the synonym actually applied: d1 ("don't") == d2 ("do_not")
    assert got["d1"] == got["d2"]


# ------------------ decoder knob: driver-side resolution


def test_resolve_decoder_driver_side():
    from cryo_spark.operators import multimodal as mm

    d = mm.resolve_decoder("auto")
    assert d in ("vendored", "pil")
    assert mm.resolve_decoder("vendored") == "vendored"
    with pytest.raises(ValueError):
        mm.resolve_decoder("nope")
