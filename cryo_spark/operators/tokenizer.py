"""Corpus-trained BPE tokenizer: train merges on a bounded sample,
apply them distributed — the way production pipelines actually train
tokenizers (the trainer sees a few hundred MB sample; the full 100 TB
corpus only ever runs the APPLY pass).

Scale shape: training is driver-side over the same deterministic
TakeOrdered hash-sample idiom as the ANN trainers (bounded rows,
O(vocab) python work); the merge table broadcasts inside an
Arrow-batched pandas UDF closure and the apply pass is narrow — no
shuffle anywhere. Word-level pre-tokenization (whitespace split +
lowercase, matching the repo's other text operators) keeps the merge
algorithm per-word, so apply cost is O(tokens x merges-per-word).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cryo_spark.operators.util import spread as _spread

_END = "</w>"


def _word_counts(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        c.update(t.strip().lower().split())
    return c


def train_bpe(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample: int = 4096,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges (classic Sennrich et al. 2016
    algorithm) from a deterministic ``sample``-document hash-sample.
    Returns the ordered merge list — the tokenizer artifact. Ties on
    pair frequency break lexicographically, so training is
    reproducible on any cluster."""
    texts = [
        r[0]
        for r in df.select(text_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(sample)
        .collect()
    ]
    words = {
        tuple(w) + (_END,): n for w, n in _word_counts(texts).items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, n in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = {}
        a, b = best
        ab = a + b
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + n
        words = merged
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [_END]
    while len(sym) > 1:
        cand = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(sym, sym[1:]))
            if (a, b) in ranks
        ]
        if not cand:
            break
        _, i = min(cand)
        sym[i: i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens, n_tokens): tokenize with a trained merge list —
    one narrow Arrow-batched pass, merge ranks closure-broadcast.
    Per-batch word memoization keeps the apply cost proportional to
    DISTINCT words, not tokens (Zipf does the rest)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def run(it):
        for pdf in it:
            cache: dict[str, list[str]] = {}
            toks_col, n_col = [], []
            for t in pdf[text_col].astype(str):
                toks: list[str] = []
                for w in t.strip().lower().split():
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    toks.extend(got)
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks_col,
                    "n_tokens": n_col,
                }
            )

    # the id field keeps ITS OWN type (string urls, int32 ids, ...)
    # — hardcoding long would break any non-bigint id at the Arrow
    # boundary
    id_type = df.schema[id_col].dataType.simpleString()
    return _spread(df.select(id_col, text_col)).mapInPandas(
        run, f"{id_col} {id_type}, tokens array<string>, n_tokens long"
    )


def build_vocab(
    df: DataFrame, tokens_col: str = "tokens", max_size: int | None = None
) -> dict[str, int]:
    """Deterministic token→id vocabulary from a tokenized corpus:
    ids are dense ranks ordered by (count desc, token asc), so the
    same corpus yields the same table on any cluster and frequent
    tokens get small ids (the convention trainers and embedding
    tables expect).

    The aggregation is distributed (explode → partial-agg count).
    The driver footprint is the vocabulary: inherently bounded for
    BPE tokens (alphabet + merges), but UNBOUNDED for raw
    regex/whitespace pretokens on a web corpus — set ``max_size`` in
    that case to keep the top-``max_size`` tokens (a distributed
    TakeOrdered, never a full sort) and let the tail fall to the
    encoder's unk id."""
    counts = (
        df.select(F.explode(tokens_col).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if max_size is not None:
        rows = counts.orderBy(F.desc("n"), "t").limit(max_size).collect()
    else:
        rows = counts.collect()
    ranked = sorted(((r["t"], r["n"]) for r in rows), key=lambda kv: (-kv[1], kv[0]))
    return {t: i for i, (t, _) in enumerate(ranked)}


def encode_ids(
    df: DataFrame,
    vocab: dict[str, int],
    tokens_col: str = "tokens",
    ids_col: str = "token_ids",
    unk_id: int | None = None,
) -> DataFrame:
    """token strings → integer ids under ``vocab``; unknown tokens
    (a vocab trained on another corpus slice) map to ``unk_id``
    (default: len(vocab), one past the table — never silently
    dropped, never aliased onto a real token). One narrow Arrow pass
    with the vocab dict closure-broadcast, aligned index-for-index
    with ``tokens_col`` so loss masks keep applying unchanged."""
    unk = len(vocab) if unk_id is None else unk_id

    @F.pandas_udf("array<int>")
    def _ids(tokens: pd.Series) -> pd.Series:
        return tokens.map(
            lambda ts: None
            if ts is None
            else [vocab.get(t, unk) for t in ts]
        )

    return df.withColumn(ids_col, _ids(F.col(tokens_col)))
