"""Scoring-throughput receipt for the learned lang-ID
(operators/langid.py): train the 28-language fixture model once, then
score 200k synthetic multilingual docs and report docs/s — the
corpus-sized pass whose narrow no-Exchange shape the unit tests pin.

Usage: python tools/stress_langid.py [n_docs] (default 200_000)
Numbers go to SCALE.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cryo_spark import get_spark  # noqa: E402
from cryo_spark.operators import langid  # noqa: E402


def synth_multilingual(spark, n: int):
    """n docs cycling through the 28 languages, words picked by
    integer arithmetic JVM-side (no driver loop)."""
    from pyspark.sql import functions as F

    langs = sorted(langid.LANG_SAMPLES)
    vocabs = [langid.LANG_SAMPLES[l] for l in langs]
    lang_arr = F.array(*[F.lit(l) for l in langs])
    vocab_arr = F.array(*[
        F.array(*[F.lit(w) for w in v]) for v in vocabs
    ])
    li = F.pmod("id", F.lit(len(langs))).cast("int")
    words = F.element_at(vocab_arr, li + 1)
    nw = F.size(words)
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.element_at(lang_arr, li + 1).alias("lang"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), (F.lit(8) + F.pmod("id", F.lit(24))).cast("int")),
                    lambda j: F.element_at(
                        words,
                        (F.pmod(F.col("id") * 2654435761 + j.cast("long") * 40503,
                                nw.cast("long")) + 1).cast("int"),
                    ),
                ),
            ).alias("text"),
        )
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="stress_langid")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    lm = langid.train_langid(langid.multilingual_fixture(spark))
    print(f"train (28 langs, 2240 docs): {time.time() - t0:.1f}s")

    # ---- REAL-TEXT receipt (round 17): the production-default model
    # (real train sentences + fixture augmentation) evaluated on real
    # held-out sentences the training never saw — per-language
    # accuracy + every confusion pair, for SCALE.md
    t0 = time.time()
    rt_train = langid.real_text_corpus(spark, "train").select(
        "text", "lang"
    ).unionByName(
        langid.multilingual_fixture(spark).select("text", "lang")
    )
    lm_rt = langid.train_langid(rt_train)
    held = langid.real_text_corpus(spark, "heldout")
    pred = langid.with_language(held, lm_rt)
    rt_acc = langid.accuracy(pred)
    print(
        f"REAL-TEXT heldout (28 langs x 8 sentences, incl. UDHR "
        f"anchor): accuracy {rt_acc:.4f}  "
        f"(train+eval {time.time() - t0:.1f}s)"
    )
    per = langid.per_language_accuracy(pred).collect()
    low = [(r.lang, round(r.accuracy, 3)) for r in per if r.accuracy < 1.0]
    print(f"  languages below 1.00: {low or 'none'}")
    conf = langid.confusion_matrix(pred).filter(
        "lang != lang_pred"
    ).collect()
    print(
        "  confusions:",
        [(r.lang, r.lang_pred, r.n) for r in conf] or "none",
    )
    # real-only (no augmentation) — the harder receipt
    lm_ro = langid.train_langid(langid.real_text_corpus(spark, "train"))
    ro_acc = langid.accuracy(langid.with_language(held, lm_ro))
    print(f"  real-only training (16 sentences/lang): accuracy {ro_acc:.4f}")

    docs = synth_multilingual(spark, n).repartition(32).persist()
    docs.count()
    t0 = time.time()
    pred = langid.with_language(docs, lm)
    acc = langid.accuracy(pred)  # one pass: score + compare
    dt = time.time() - t0
    print(
        f"score {n:,} docs: {dt:.1f}s  {n / dt:,.0f} docs/s  "
        f"accuracy vs planted labels {acc:.4f}"
    )
    # ---- max_chars receipt (round 17): long-doc outliers pay the
    # full gram fan-out without the cap (linear after the bound-array
    # spelling — the substr spelling was QUADRATIC and measured 224 s
    # for ONE 33 KB doc). Repeat each doc's text 40x (~8-15 KB) and
    # score capped vs uncapped.
    from pyspark.sql import functions as F

    n_long = max(n // 20, 1000)
    long_docs = (
        synth_multilingual(spark, n_long)
        .withColumn(
            "text",
            F.concat_ws(" ", F.array_repeat(F.col("text"), 40)),
        )
        .repartition(32)
        .persist()
    )
    long_docs.count()
    for cap in (None, 1000):
        t0 = time.time()
        acc_l = langid.accuracy(
            langid.with_language(long_docs, lm, max_chars=cap)
        )
        dt = time.time() - t0
        print(
            f"score {n_long:,} LONG docs (~10KB) max_chars={cap}: "
            f"{dt:.1f}s  {n_long / dt:,.0f} docs/s  accuracy {acc_l:.4f}"
        )
    long_docs.unpersist()

    # plan check on a frame WITHOUT this tool's own repartition —
    # the scorer itself must add no Exchange (unit-test pin mirrored)
    plain = synth_multilingual(spark, 1000)
    plan = (
        langid.with_language(plain, lm)
        ._jdf.queryExecution().executedPlan().toString()
    )
    print("Exchange added by scorer:", "Exchange" in plan)
    docs.unpersist()


if __name__ == "__main__":
    main()
