"""Per-query empirical profiler (optimization guide §1): for each
named bench query, time plan CONSTRUCTION (driver-side jobs: eager
first()/collect()/train steps) separately from EXECUTION (noop sink),
then attribute execution to stages via the Spark UI REST API —
per-stage executor run time, shuffle read/write bytes, input bytes,
task count — so optimization targets the measured bottleneck, not a
guess.

Usage:
  python tools/profile_query.py [--sf DIR] [name ...]

With no names, profiles the full HEADLINE list. Prints a compact
per-query report and writes JSON to /tmp/profile_<name>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402
from cryo_spark import get_spark  # noqa: E402


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def stages_between(base: str, t0_ms: float, t1_ms: float) -> list[dict]:
    out = []
    for st in _api(base, "/stages?status=complete"):
        sub = st.get("firstTaskLaunchedTime") or st.get("submissionTime")
        if not sub:
            continue
        # ISO8601 'GMT' suffix form
        import datetime as dt

        ts = dt.datetime.strptime(
            sub.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
        ).timestamp() * 1000
        if t0_ms <= ts <= t1_ms:
            out.append(st)
    return out


def profile(spark, name: str, fn, sf_dir: str, base: str, reps: int = 3):
    # warm codegen paths at tiny scale
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        try:
            fn(spark, warm).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        spark.catalog.clearCache()
    best_c = best_e = None
    for _ in range(reps):
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        spark.sparkContext.setJobDescription(None)
        c, e = t1 - t0, t2 - t1
        if best_e is None or c + e < best_c + best_e:
            best_c, best_e, win = c, e, (t0 * 1000, t2 * 1000)
        spark.catalog.clearCache()
    stages = stages_between(base, win[0] - 50, win[1] + 50)
    rows = []
    for st in sorted(stages, key=lambda s: -s.get("executorRunTime", 0)):
        rows.append(
            dict(
                stage=st["stageId"],
                name=st.get("name", "")[:80],
                run_ms=st.get("executorRunTime", 0),
                cpu_ms=round(st.get("executorCpuTime", 0) / 1e6, 1),
                tasks=st.get("numCompleteTasks", st.get("numTasks")),
                input_mb=round(st.get("inputBytes", 0) / 2**20, 2),
                sh_r_mb=round(st.get("shuffleReadBytes", 0) / 2**20, 2),
                sh_w_mb=round(st.get("shuffleWriteBytes", 0) / 2**20, 2),
                desc=(st.get("description") or "")[:40],
            )
        )
    rec = dict(
        name=name,
        construct_s=round(best_c, 3),
        execute_s=round(best_e, 3),
        total_s=round(best_c + best_e, 3),
        n_stages=len(stages),
        stages=rows,
    )
    with open(f"/tmp/profile_{name}.json", "w") as f:
        json.dump(rec, f, indent=1)
    return rec


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    spark = get_spark(
        app_name="cryo_spark_profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            # keep every stage of a long profiling session visible
            "spark.ui.retainedStages": "5000",
            "spark.ui.retainedJobs": "5000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = (
        "http://localhost:"
        + spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1]
        + "/api/v1/applications/"
        + spark.sparkContext.applicationId
    )
    queries = entrymod.queries()
    names = args or bench.HEADLINE
    spark.range(1000).selectExpr("sum(id)").collect()
    for name in names:
        fn = queries[name]
        rec = profile(spark, name, fn, sf_dir, base)
        print(
            f"\n=== {name}: total {rec['total_s']}s "
            f"(construct {rec['construct_s']}s + execute {rec['execute_s']}s, "
            f"{rec['n_stages']} stages)"
        )
        for r in rec["stages"][:12]:
            print(
                f"  stage {r['stage']:>4} run {r['run_ms']:>7}ms cpu {r['cpu_ms']:>9}ms "
                f"tasks {r['tasks']:>3} in {r['input_mb']:>7}MB "
                f"shR {r['sh_r_mb']:>6}MB shW {r['sh_w_mb']:>6}MB  {r['name']}"
            )


if __name__ == "__main__":
    main()
