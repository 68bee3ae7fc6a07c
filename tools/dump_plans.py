"""Dump ``.explain("formatted")`` for every bench HEADLINE query.

Usage:
  python tools/dump_plans.py OUTDIR SUFFIX [--sf DIR] [name ...]

Writes ``OUTDIR/<name>_<SUFFIX>.txt`` (e.g. ``plans/r17/llm_ann_topk_before.txt``)
for each named query (default: the full HEADLINE list plus the three
bench-local frames warc_ingest / cdx_reextract / llm_pack;
``freeze_3_datasets`` is a write path with no single frame — skipped).

The formatted physical plan is the round-17 optimization evidence
format: Exchange count, join strategy, PushedFilters/ReadSchema and
Python-eval nodes are all visible (optimization guide §7.2).
"""

from __future__ import annotations

import os
import sys
import tempfile
import shutil

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402
from cryo_spark import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    outdir, suffix = args[0], args[1]
    args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="cryo_spark_dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    names = args or [n for n in bench.HEADLINE] + [
        "warc_ingest", "cdx_reextract", "llm_pack",
    ]
    tmp = tempfile.mkdtemp(prefix="cryo_spark_plans_")
    try:
        for name in names:
            try:
                if name == "warc_ingest":
                    d = os.path.join(tmp, "warc")
                    os.makedirs(d, exist_ok=True)
                    bench.make_warc_fixture(d)
                    df = bench.warc_ingest_frame(spark, d)
                elif name == "cdx_reextract":
                    d = os.path.join(tmp, "cdx")
                    os.makedirs(d, exist_ok=True)
                    idx = bench.make_cdx_fixture(d)
                    df = bench.cdx_reextract_frame(spark, d, idx)
                elif name == "llm_pack":
                    df = bench.llm_pack_frame(spark, sf_dir)
                elif name == "freeze_3_datasets":
                    continue
                else:
                    df = queries[name](spark, sf_dir)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception as exc:  # noqa: BLE001
                txt = f"ERROR building {name}: {type(exc).__name__}: {exc}\n"
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
            print(name, "->", f"{name}_{suffix}.txt")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
