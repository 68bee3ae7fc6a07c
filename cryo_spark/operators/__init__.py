"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (BASELINE.json north star): dedup,
similarity search, text analysis, multimodal plumbing — all designed
for the 100 TB case: broadcast-free shuffles on bounded keys,
map-side combine aggregations, LSH banding instead of all-pairs
joins.
"""

from cryo_spark.operators import (  # noqa: F401
    classifier,
    corpus,
    decontam,
    dedup,
    dsir,
    incremental,
    interval,
    multimodal,
    sampling,
    semdedup,
    seqprep,
    sessions,
    shards,
    similarity,
    skew,
    spans,
    text,
    tokenizer,
)
