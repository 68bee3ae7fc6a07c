"""Skew utilities: salted aggregation equivalence + bucketed
co-located joins (shuffle-free plan check)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cryo_spark.operators import skew
from cryo_spark.sources import raw


def test_salted_agg_equals_plain_groupby(spark):
    """Hot-key distribution: one address owns most rows; the salted
    two-phase result must equal the plain aggregation exactly."""
    logs = raw(spark, "logs").select("address", "block_number", "log_index")
    plain = {
        r.address: (r.n, r.mx)
        for r in logs.groupBy("address")
        .agg(F.count("block_number").alias("n"), F.max("block_number").alias("mx"))
        .collect()
    }
    salted = {
        r.address: (r.n, r.mx)
        for r in skew.salted_agg(
            logs, ["address"],
            {"n": ("block_number", "count"), "mx": ("block_number", "max")},
        ).collect()
    }
    assert salted == plain


def test_salted_agg_rejects_non_reaggregatable(spark):
    df = raw(spark, "logs")
    with pytest.raises(ValueError, match="re-aggregatable"):
        skew.salted_agg(df, ["address"], {"d": ("block_number", "avg")})


def test_bucketed_join_is_shuffle_free(spark):
    # warehouse.dir is a static conf — tables land in the session
    # default warehouse and are dropped in the finally block
    txs = raw(spark, "transactions").select(
        "block_number", "transaction_hash", "gas_used"
    )
    logs = raw(spark, "logs").select("transaction_hash", "log_index")
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        skew.write_bucketed(txs, "b_txs", ["transaction_hash"], n_buckets=8)
        skew.write_bucketed(logs, "b_logs", ["transaction_hash"], n_buckets=8)
        # disable broadcast so the planner must choose SMJ — the shape
        # big-big joins take at scale, where bucketing saves the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_txs").join(spark.table("b_logs"), "transaction_hash")
        assert joined.count() > 0
        assert skew.join_is_shuffle_free(joined), (
            "bucketed equi-join should not shuffle"
        )
        # contrast: the same join on the raw (unbucketed) tables shuffles
        plain = txs.join(logs, "transaction_hash")
        plain.count()
        assert not skew.join_is_shuffle_free(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS b_txs")
        spark.sql("DROP TABLE IF EXISTS b_logs")
