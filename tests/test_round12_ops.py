"""Round-12 hardening: the video/audio pair-join broadcast fix (no
forced corpus-cardinality build side), ADVICE regressions (cdx
size-guard visibility, delta-index bucket spec + retry idempotency,
hex chunk-size validation), and the round's new surfaces as they land.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ----------------- video/audio pair join: no corpus-sized broadcast


def _analyzed_plan(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_video_near_dups_no_forced_counts_broadcast(spark):
    """The per-item frame-count frame is corpus-cardinality (one row
    per media item): a forced broadcast of it OOMs at 10^8+ items.
    The pair join must carry NO broadcast hint anywhere — strategy is
    left to AQE, which sees runtime sizes."""
    from cryo_spark.operators import multimodal as mm

    vids = [
        (1, "video", b"shared video content", "video/mp4", None, None, 8000),
        (2, "video", b"shared video content", "video/mp4", None, None, 8000),
        (3, "video", b"unrelated clip data!", "video/mp4", None, None, 8000),
    ]
    media = spark.createDataFrame(vids, mm.MEDIA_SCHEMA)
    pairs = mm.video_near_dups(media, min_overlap=0.9)
    plan = _analyzed_plan(pairs)
    assert "ResolvedHint" not in plan, (
        "video_near_dups must not force a join build side; found a "
        "hint in the analyzed plan"
    )
    # and the results are unchanged by the strategy being AQE's pick
    got = {(r.id_a, r.id_b, r.overlap) for r in pairs.collect()}
    assert got == {(1, 2, 1.0)}


def test_audio_near_dups_no_forced_counts_broadcast(spark):
    from cryo_spark.operators import multimodal as mm

    rows = [
        (1, "audio", b"same song bytes", "audio/wav", None, None, 5000),
        (2, "audio", b"same song bytes", "audio/wav", None, None, 5000),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    pairs = mm.audio_near_dups(media, min_overlap=0.9)
    assert "ResolvedHint" not in _analyzed_plan(pairs)
    assert {(r.id_a, r.id_b) for r in pairs.collect()} == {(1, 2)}
