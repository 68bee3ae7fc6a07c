"""Streaming WARC ingestion throughput stress.

Measures the landing-zone drain (`streaming.stream_warc_documents` →
parquet sink, availableNow) at WARC-member volume: members are the
task unit (gzip framing is non-splittable), so this is the
docs/second the continuous-crawl path sustains per local[32] worker
set — and a second drain over an unchanged directory must be a fast
no-op (checkpointed source state, nothing reprocessed).

Usage: python tools/stress_stream.py [members] [records_per_member]
Numbers are recorded in SCALE.md (round-12 measured findings).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cryo_spark import get_spark


def main() -> int:
    members = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    records = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark(app_name="stress_stream")
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    root = tempfile.mkdtemp(prefix="stress_stream_")
    try:
        crawl = os.path.join(root, "crawl")
        os.makedirs(crawl)
        bench.make_warc_fixture(crawl, members=members, records=records)
        n_docs = members * records

        from cryo_spark.streaming import stream_warc_documents

        def drain() -> float:
            t0 = time.time()
            q = (
                stream_warc_documents(spark, crawl, main_content=True)
                .writeStream.format("parquet")
                .option("path", os.path.join(root, "landing"))
                .option(
                    "checkpointLocation", os.path.join(root, "ckpt")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return time.time() - t0

        dt = drain()
        got = spark.read.parquet(os.path.join(root, "landing")).count()
        assert got == n_docs, (got, n_docs)
        print(
            f"stream_drain: {dt:.2f}s for {members} members x {records} "
            f"records = {n_docs} docs ({n_docs / dt:,.0f} docs/s, "
            "main-content extraction on)"
        )
        dt2 = drain()
        got2 = spark.read.parquet(os.path.join(root, "landing")).count()
        assert got2 == n_docs, (got2, n_docs)
        print(
            f"noop_redrain: {dt2:.2f}s over the unchanged directory "
            "(checkpointed source: nothing reprocessed)"
        )
        assert dt2 < dt / 2, (dt2, dt)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
