"""At-volume receipt for the learned-encoder adapter (r15 verdict
"What's missing" #3): run encode_documents with a NONTRIVIAL
broadcast-weights numpy MLP (256 hashed features -> 256 hidden -> 256
dim, ~260k f32 parameters) at 200k docs, sweep batch_size, and compare
against the same encoder run single-core on a sample — substantiating
the "throughput is model-bound, not Spark-bound" sizing rule in
encode.py/SCALE.md with numbers.

Usage: python tools/stress_encode.py [n_docs] (default 200_000)
Prints one result block; numbers go to SCALE.md.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cryo_spark import get_spark  # noqa: E402
from cryo_spark.operators import encode  # noqa: E402


WORDS = [
    f"w{i:03d}" for i in range(160)
] + ["the", "and", "data", "model", "spark", "corpus", "token", "batch",
     "layer", "vector", "train", "scale", "shard", "index", "query",
     "range"]


def synth_docs(spark, n: int):
    """Deterministic synthetic docs, generated JVM-side (no driver
    loop): doc i = 20+i%30 words picked by integer arithmetic."""
    from pyspark.sql import functions as F

    words = F.array(*[F.lit(w) for w in WORDS])
    nw = len(WORDS)
    return (
        spark.range(n)
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), (F.lit(20) + F.pmod("id", F.lit(30))).cast("int")),
                    lambda j: F.element_at(
                        words,
                        (F.pmod(F.col("id") * 2654435761 + j.cast("long") * 40503,
                                F.lit(nw)) + 1).cast("int"),
                    ),
                ),
            ),
        )
        .select(F.col("id").alias("doc_id"), "text")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="stress_encode")
    spark.sparkContext.setLogLevel("ERROR")

    weights = encode.make_mlp_weights()
    w_bytes = sum(v.nbytes for v in weights.values())
    print(f"model: hashed-TF 256 -> tanh 256 -> 256, {w_bytes/1e6:.2f} MB f32")

    docs = synth_docs(spark, n).repartition(32).persist()
    docs.count()  # materialize inputs outside the timings

    # single-core reference: the same encoder_fn on a driver sample —
    # the "model-bound" comparator (ideal cluster rate = this x cores)
    sample = [r.text for r in docs.limit(5000).collect()]
    enc_local = encode.hashed_mlp_encoder(weights)
    t0 = time.time()
    for lo in range(0, len(sample), 256):
        enc_local(sample[lo:lo + 256])
    local_rate = len(sample) / (time.time() - t0)
    print(f"single-core encoder rate: {local_rate:,.0f} docs/s "
          f"(ideal 32-core = {32 * local_rate:,.0f})")

    bweights = {k: spark.sparkContext.broadcast(v) for k, v in weights.items()}

    def run(wts, batch_size: int, label: str) -> float:
        enc = encode.hashed_mlp_encoder(wts)
        t0 = time.time()
        out = encode.encode_documents(docs, enc, batch_size=batch_size, dim=256)
        cnt = out.count()
        dt = time.time() - t0
        assert cnt == n
        rate = n / dt
        print(f"{label:>28}: {dt:6.1f}s  {rate:>10,.0f} docs/s "
              f"({rate / (32 * local_rate):.2f}x of ideal-32-core)")
        return rate

    for bs in (64, 256, 1024):
        run(bweights, bs, f"broadcast weights, bs={bs}")
    run(weights, 256, "closure weights, bs=256")

    # equality: broadcast vs closure weights, bit-identical outputs
    a = encode.encode_documents(
        docs.limit(2000), encode.hashed_mlp_encoder(weights), dim=256
    ).collect()
    b = encode.encode_documents(
        docs.limit(2000), encode.hashed_mlp_encoder(bweights), dim=256
    ).collect()
    av = {r.doc_id: tuple(r.embedding) for r in a}
    bv = {r.doc_id: tuple(r.embedding) for r in b}
    assert av == bv, "broadcast vs closure weights must be bit-identical"
    print("broadcast == closure outputs: bit-identical on 2000 docs")

    docs.unpersist()


if __name__ == "__main__":
    main()
