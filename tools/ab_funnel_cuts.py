"""A/B the corpus_funnel lineage-cut set (round 15, verdict task 3).

The funnel's bench line is construction-dominated: the three lazy
localCheckpoint cuts execute their pipeline segments at PLAN time (the
.rdd materialization under AQE), which is by design — the cut buys
O(stages) driver planning. The round-14 verdict asked for a per-point
A/B against the persist-only spelling (boundary persisted + observed,
NO lineage cut at that point): this tool prices every subset of the
three cut points with the CONTRACT entry itself (construction +
collect, min-of-N in a warm session, caches cleared between runs) and
verifies the funnel rows are IDENTICAL across spellings.

Usage: python tools/ab_funnel_cuts.py [sf_dir] [reps]
"""

from __future__ import annotations

import itertools
import sys
import time

sys.path.insert(0, "/root/repo")

from cryo_spark import get_spark  # noqa: E402
from cryo_spark.operators import corpus  # noqa: E402

POINTS = ["quality_lang_exact", "line_dedup", "span_dedup"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import __spark_entry__ as entry

    spark = get_spark()
    q = entry.queries()["corpus_funnel"]

    def run_once():
        corpus.release_stage_storage(spark)
        t0 = time.time()
        rows = q(spark, sf_dir).collect()
        return time.time() - t0, tuple(
            (r.stage, r.docs_in, r.docs_out, r.tokens_out) for r in rows
        )

    # warm the session (JIT, file listing) outside timings
    run_once()

    results = []
    baseline_rows = None
    # CUT_OVERRIDE is a process-global knob on cryo_spark.corpus —
    # restore it even when a rep raises or the rows-diverged assert
    # fires, so nothing else in the session runs under a stale cut set
    try:
        for r in range(len(POINTS) + 1):
            for cut in itertools.combinations(POINTS, r):
                corpus.CUT_OVERRIDE = set(cut)
                best, rows = None, None
                for _ in range(reps):
                    dt, got = run_once()
                    best = dt if best is None else min(best, dt)
                    rows = got
                label = "+".join(c.split("_")[0] for c in cut) or "none"
                results.append((label, round(best, 2), len(cut)))
                if baseline_rows is None:
                    baseline_rows = rows
                assert rows == baseline_rows, (
                    f"funnel rows diverged under cut set {cut}"
                )
                print(f"cuts={label:<25} best_of_{reps}={best:.2f}s")
    finally:
        corpus.CUT_OVERRIDE = None
    print("\nall cut subsets produce IDENTICAL funnel rows")
    results.sort(key=lambda x: x[1])
    print("fastest:", results[0], " slowest:", results[-1])


if __name__ == "__main__":
    main()
