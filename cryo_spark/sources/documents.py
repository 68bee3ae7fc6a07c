"""Document-corpus ingestion: land raw text data as the canonical
``documents`` shape (doc_id, text, ...) the operator layer consumes.

The chain side of this engine reads landed parquet raw tables (or the
live RPC source); the training-data side ingests whatever the crawl
produced — parquet, JSONL dumps, or plain text files. All three land
through Spark's native readers (distributed, splittable except
whole-file text), with one normalization applied here: a DETERMINISTIC
``doc_id`` for inputs that lack one, derived from content + origin
(`xxhash64(input_file_name, text)`), so re-ingesting the same files on
any cluster layout yields the same ids — the property every
downstream hash-keyed operator (splits, sampling, dedup keepers)
depends on. monotonically_increasing_id is deliberately NOT used: its
values depend on partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    text_col: str = "text",
    id_col: str = "doc_id",
    whole_files: bool = False,
) -> DataFrame:
    """Load a document corpus:

    - ``fmt='parquet'`` / ``'jsonl'``: columnar / line-delimited JSON;
      rows lacking ``id_col`` get the deterministic content hash id.
    - ``fmt='text'``: one doc per LINE (default — splittable, scales
      to any file size) or per FILE with ``whole_files=True`` (the
      one-doc-one-file layout; non-splittable, so a huge single file
      becomes one task — prefer line or jsonl layouts at scale).

    Identical (file, text) pairs collapse to one id by construction —
    acceptable (and usually desirable) for a dedup-oriented pipeline;
    supply your own ``id_col`` when exact multiplicity matters.
    """
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "jsonl":
        df = spark.read.json(path)
    elif fmt == "text":
        df = (
            spark.read.text(path, wholetext=whole_files)
            .withColumnRenamed("value", text_col)
        )
    else:
        raise ValueError(f"unsupported corpus format: {fmt!r}")
    if text_col not in df.columns:
        raise ValueError(
            f"no {text_col!r} column in {path} (columns: {df.columns})"
        )
    if id_col not in df.columns:
        df = df.withColumn(
            id_col, F.xxhash64(F.input_file_name(), F.col(text_col))
        )
    return df
