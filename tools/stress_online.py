"""Scale-stress the online fetch layer against a contended fake node.

Applies the clone-corpus stress methodology (SCALE.md) to the fetch
stages: a 100k-block work-list against a transport with injected
per-POST latency and periodic 429s, measuring end-to-end blocks/s,
dispatch counts, and retry behavior for:

1. per-block header fetch with JSON-RPC batching (the round-trip-
   bound regime),
2. ranged eth_getLogs with inner-request re-splitting (the range-
   bound regime),
3. the same under failure injection (retry/backoff correctness at
   volume — every 10th POST per task 429s, work must still complete
   exactly).

Usage: python tools/stress_online.py [n_blocks] [latency_ms]
Results are recorded in SCALE.md (online-layer stress section).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cryo_spark import get_spark, plan
from cryo_spark.sources import rpc, rpc_families as fam


def run_case(spark, label, n_blocks, factory, config, fetch):
    wl = rpc.work_list_df(
        spark, [plan.BlockChunk(start=0, end=n_blocks - 1)], n_partitions=32
    )
    t0 = time.monotonic()
    n_rows = fetch(spark, wl, config=config, transport_factory=factory).count()
    dt = time.monotonic() - t0
    stats = factory.stats()
    print(
        f"{label:38s} {dt:7.2f}s  {n_blocks / dt:9.0f} blocks/s  "
        f"rows={n_rows}  posts={stats.get('post', 0)}  "
        f"inner={stats.get('inner', 0)}  429s={stats.get('429', 0)}"
    )
    return stats


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    latency_s = (float(sys.argv[2]) if len(sys.argv) > 2 else 1.0) / 1000.0
    spark = get_spark(app_name="stress_online")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp()

    # 1. header fetch, batched 100/POST
    s = run_case(
        spark, f"blocks batched (batch=100, {latency_s*1000:.0f}ms/POST)",
        n_blocks, fam.StressFakeFactory(f"{tmp}/a", latency_s=latency_s),
        rpc.RpcConfig(batch_size=100), rpc.fetch_blocks,
    )
    # 32 tasks batch independently: ceil(per_task/100) POSTs each
    assert s["inner"] == n_blocks
    assert n_blocks // 100 <= s["post"] <= n_blocks // 100 + 32

    # 2. ranged logs, inner_request_size=100 (1 POST per 100 blocks)
    s = run_case(
        spark, "logs ranged (inner_request_size=100)",
        n_blocks, fam.StressFakeFactory(f"{tmp}/b", latency_s=latency_s),
        rpc.RpcConfig(inner_request_size=100), rpc.fetch_logs,
    )
    assert n_blocks // 100 <= s["post"] <= n_blocks // 100 + 32

    # 3. failure injection: every 10th POST per task 429s; totals must
    #    still land exactly (batches retry whole)
    s = run_case(
        spark, "blocks batched + 429 every 10 POSTs/task",
        n_blocks,
        fam.StressFakeFactory(f"{tmp}/c", latency_s=latency_s, fail_every=10),
        rpc.RpcConfig(batch_size=100, initial_backoff_s=0.002),
        rpc.fetch_blocks,
    )
    assert s["inner"] >= n_blocks  # retried batches re-dispatch whole
    assert s["429"] > 0

    # 4. paced: requests_per_second=2000 per task, inner-weighted
    s = run_case(
        spark, "blocks batched + rps=2000 (CU-weighted)",
        n_blocks,
        fam.StressFakeFactory(f"{tmp}/d", latency_s=0.0),
        rpc.RpcConfig(batch_size=100, requests_per_second=2000),
        rpc.fetch_blocks,
    )
    # 32 tasks x 2000 rps floor => >= n_blocks / (2000*32) wall seconds
    assert s["inner"] == n_blocks


if __name__ == "__main__":
    main()
