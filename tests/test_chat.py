"""Chat/instruction-tuning prep: template rendering with assistant
span tracking (JVM aggregate) pinned against the pure-Python
reference, and char-span → token-level loss masks.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from cryo_spark.operators.chat import (
    DEFAULT_TEMPLATE,
    TOKEN_RE,
    reference_render,
    render_chat,
    token_loss_mask,
)

MSG_SCHEMA = (
    "conv_id long, messages array<struct<role string, content string>>"
)


def _conv(*turns):
    return [{"role": r, "content": c} for r, c in turns]


CONVS = [
    (1, _conv(("system", "You are helpful."),
              ("user", "What is 2+2?"),
              ("assistant", "2+2 = 4."))),
    (2, _conv(("user", "Hi"),
              ("assistant", "Hello!"),
              ("user", "Name a prime."),
              ("assistant", "7 is prime."))),
    (3, _conv(("user", "No reply yet"),)),
    (4, _conv(("assistant", ""),
              ("user", "empty assistant above"))),
]


def test_render_matches_reference(spark):
    df = spark.createDataFrame(CONVS, MSG_SCHEMA)
    rows = {r.conv_id: r for r in render_chat(df).collect()}
    for cid, msgs in CONVS:
        want_text, want_spans = reference_render(msgs)
        got = rows[cid]
        assert got.text == want_text, cid
        assert [(s.start, s.end) for s in got.assistant_spans] == want_spans
    # spans really cover the assistant CONTENT, not scaffolding
    r1 = rows[1]
    s = r1.assistant_spans[0]
    assert r1.text[s.start:s.end] == "2+2 = 4."
    # multi-turn: two spans, in order
    r2 = rows[2]
    assert [r2.text[s.start:s.end] for s in r2.assistant_spans] == [
        "Hello!", "7 is prime."
    ]
    # no assistant turn -> empty spans, not NULL
    assert list(rows[3].assistant_spans) == []
    # empty assistant content -> zero-length span at the right offset
    s4 = rows[4].assistant_spans[0]
    assert s4.start == s4.end


def test_render_custom_template_and_role(spark):
    tpl = {"prefix": "### {role}:\n", "suffix": "\n\n"}
    df = spark.createDataFrame(CONVS[:1], MSG_SCHEMA)
    r = render_chat(df, template=tpl).first()
    want_text, want_spans = reference_render(CONVS[0][1], template=tpl)
    assert r.text == want_text
    assert [(s.start, s.end) for s in r.assistant_spans] == want_spans
    # masking a different role
    r_user = render_chat(df, template=tpl, mask_role="user").first()
    _, user_spans = reference_render(
        CONVS[0][1], template=tpl, mask_role="user"
    )
    assert [(s.start, s.end) for s in r_user.assistant_spans] == user_spans


def test_render_is_narrow_projection(spark):
    """The whole render is a scan-side projection: no shuffle, no
    Python stage in the plan."""
    df = spark.createDataFrame(CONVS, MSG_SCHEMA)
    plan = render_chat(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_token_loss_mask(spark):
    df = render_chat(spark.createDataFrame(CONVS[:2], MSG_SCHEMA))
    rows = {r.conv_id: r for r in token_loss_mask(df).collect()}
    for cid in (1, 2):
        r = rows[cid]
        assert len(r.tokens) == len(r.loss_mask)
        # independently recompute: a token is masked-in iff inside a span
        ivs = [(s.start, s.end) for s in r.assistant_spans]
        want = []
        for m in re.finditer(TOKEN_RE, r.text):
            a, b = m.span()
            want.append(1 if any(s <= a and b <= e for s, e in ivs) else 0)
        assert list(r.loss_mask) == want
    # conv 1: exactly the tokens of '2+2 = 4.' carry loss
    r1 = rows[1]
    lossy = [t for t, m in zip(r1.tokens, r1.loss_mask) if m]
    assert lossy == ["2", "+", "2", "=", "4", "."]
    # scaffolding tokens (role names, im_start) never carry loss
    for t, m in zip(r1.tokens, r1.loss_mask):
        if t in ("im_start", "im_end", "system", "user", "assistant"):
            assert m == 0


def test_render_property_random_conversations(spark):
    """Property: for randomized conversations (roles, unicode content,
    empty turns), the JVM render equals the pure-Python reference and
    every span slices exactly its message's content."""
    from hypothesis import given, settings, strategies as st

    content = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),  # no lone surrogates
        ),
        max_size=40,
    )
    msg = st.fixed_dictionaries(
        {"role": st.sampled_from(["system", "user", "assistant", "tool"]),
         "content": content}
    )
    convs = st.lists(st.lists(msg, max_size=6), min_size=1, max_size=5)

    @settings(max_examples=15, deadline=None)
    @given(convs=convs)
    def check(convs):
        df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(convs)], MSG_SCHEMA
        )
        rows = {r.conv_id: r for r in render_chat(df).collect()}
        for i, msgs in enumerate(convs):
            want_text, want_spans = reference_render(msgs)
            got = rows[i]
            assert got.text == want_text
            got_spans = [(s.start, s.end) for s in got.assistant_spans]
            assert got_spans == want_spans
            contents = [m["content"] for m in msgs
                        if m["role"] == "assistant"]
            assert [got.text[a:b] for a, b in got_spans] == contents

    check()


def test_mask_feeds_packing(spark):
    """Rendered rows are documents: token windows/packing consume the
    text; the mask arrays ride along index-aligned."""
    from cryo_spark.operators.seqprep import pack_sequences

    df = token_loss_mask(
        render_chat(spark.createDataFrame(CONVS[:2], MSG_SCHEMA))
    ).select(
        F.col("conv_id").alias("doc_id"),
        "text",
        F.size("tokens").alias("n_tokens"),
        "loss_mask",
    )
    packed = pack_sequences(df, budget=64)  # (doc_id, ..., bin_id)
    joined = packed.join(df.select("doc_id", "loss_mask"), "doc_id")
    rows = joined.collect()
    # every doc landed in some bin and its mask joins back on doc_id
    assert {r.doc_id for r in rows} == {1, 2}
    assert all(r.loss_mask is not None for r in rows)
    assert all(r.bin_fill <= 64 for r in rows)


# ------------------------------------------ DPO preference-pair prep

PAIR_SCHEMA = (
    "pair_id long, prompt array<struct<role string, content string>>, "
    "chosen string, rejected string"
)

PAIRS = [
    (1, _conv(("system", "Be terse."), ("user", "2+2?")), "4.", "five"),
    (2, _conv(("user", "Hi"), ("assistant", "Hello!"), ("user", "Bye?")),
     "Goodbye.", "Hi again!"),
    (3, _conv(("user", "tie"),), "same", "same"),
    (4, _conv(("user", "null side"),), "ok", None),
]


def _pair_reference(msgs, response, template=None, role="assistant"):
    """Independent derivation: render the prompt with the reference,
    append the response as one role turn with plain string ops."""
    tpl = template or DEFAULT_TEMPLATE
    ptext, _ = reference_render(msgs, template=template)
    pre = tpl["prefix"].replace("{role}", role)
    suf = tpl["suffix"].replace("{role}", role)
    start = len(ptext) + len(pre)
    return ptext, ptext + pre + response + suf, (start, start + len(response))


def test_preference_pairs_match_reference(spark):
    from cryo_spark.operators.chat import render_preference_pairs

    df = spark.createDataFrame(PAIRS, PAIR_SCHEMA)
    rows = {r.pair_id: r for r in render_preference_pairs(df).collect()}
    # ties and NULL sides are dropped by default
    assert set(rows) == {1, 2}
    for pid, msgs, ch, rj in PAIRS[:2]:
        got = rows[pid]
        ptext, ctext, cspan = _pair_reference(msgs, ch)
        _, rtext, rspan = _pair_reference(msgs, rj)
        assert got.prompt_text == ptext
        assert got.chosen_text == ctext
        assert got.rejected_text == rtext
        assert [(s.start, s.end) for s in got.chosen_spans] == [cspan]
        assert [(s.start, s.end) for s in got.rejected_spans] == [rspan]
        # the spans slice out exactly the response content
        assert got.chosen_text[cspan[0]:cspan[1]] == ch
        assert got.rejected_text[rspan[0]:rspan[1]] == rj


def test_preference_pairs_prompt_assistant_turns_unmasked(spark):
    """Multi-turn prompt with an in-prompt assistant turn: the span
    must cover ONLY the candidate response, never 'Hello!'."""
    from cryo_spark.operators.chat import render_preference_pairs

    df = spark.createDataFrame(PAIRS[1:2], PAIR_SCHEMA)
    r = render_preference_pairs(df).first()
    assert len(r.chosen_spans) == 1
    s = r.chosen_spans[0]
    assert r.chosen_text[s.start:s.end] == "Goodbye."
    assert "Hello!" in r.prompt_text  # in the text, outside the span
    assert s.start >= len(r.prompt_text)


def test_preference_pairs_keep_ties_and_custom_template(spark):
    from cryo_spark.operators.chat import render_preference_pairs

    tpl = {"prefix": "[{role}] ", "suffix": "\n"}
    df = spark.createDataFrame(PAIRS, PAIR_SCHEMA)
    rows = {
        r.pair_id: r
        for r in render_preference_pairs(
            df, template=tpl, drop_ties=False
        ).collect()
    }
    assert set(rows) == {1, 2, 3, 4}
    ptext, ctext, cspan = _pair_reference(
        PAIRS[0][1], PAIRS[0][2], template=tpl
    )
    assert rows[1].prompt_text == ptext
    assert rows[1].chosen_text == ctext
    assert [(s.start, s.end) for s in rows[1].chosen_spans] == [cspan]
    # the tie row renders both sides identically rather than vanishing
    assert rows[3].chosen_text == rows[3].rejected_text


def test_preference_pairs_compose_with_loss_mask(spark):
    """token_loss_mask applies to either side unchanged: weight-1
    tokens reconstruct exactly the chosen response's tokens."""
    from cryo_spark.operators.chat import render_preference_pairs

    df = spark.createDataFrame(PAIRS[:2], PAIR_SCHEMA)
    out = token_loss_mask(
        render_preference_pairs(df),
        text_col="chosen_text",
        spans_col="chosen_spans",
    )
    for r in out.collect():
        want = re.findall(TOKEN_RE, dict((p[0], p[2]) for p in PAIRS)[r.pair_id])
        got = [t for t, m in zip(r.tokens, r.loss_mask) if m == 1]
        assert got == want


# ------------------------------------- packed-sequence materialization


def test_pack_bins_materializes_aligned_sequences(spark):
    """chat render → loss mask → pack_bins: per-bin token and mask
    arrays are the doc_id-ordered concatenation of the members',
    index-aligned, with every doc in exactly one bin."""
    from cryo_spark.operators.seqprep import pack_bins

    docs = token_loss_mask(
        render_chat(spark.createDataFrame(CONVS[:2], MSG_SCHEMA))
    ).select(F.col("conv_id").alias("doc_id"), "tokens", "loss_mask")
    per_doc = {
        r.doc_id: (list(r.tokens), list(r.loss_mask))
        for r in docs.collect()
    }

    bins = pack_bins(docs, budget=64, mask_col="loss_mask").collect()
    seen = [d for b in bins for d in b.doc_ids]
    assert sorted(seen) == sorted(per_doc)  # partition, no dup, no loss
    for b in bins:
        want_toks = [t for d in sorted(b.doc_ids) for t in per_doc[d][0]]
        want_mask = [m for d in sorted(b.doc_ids) for m in per_doc[d][1]]
        assert list(b.doc_ids) == sorted(b.doc_ids)  # in-bin order law
        assert list(b.tokens) == want_toks
        assert list(b.loss_mask) == want_mask
        assert b.n_tokens == len(want_toks) and b.n_docs == len(b.doc_ids)
        assert b.n_tokens <= 64 or b.n_docs == 1  # oversize = singleton
        # the mask still selects exactly the assistant tokens
        masked = [t for t, m in zip(b.tokens, b.loss_mask) if m == 1]
        want_masked = [
            t
            for d in sorted(b.doc_ids)
            for t, m in zip(*per_doc[d])
            if m == 1
        ]
        assert masked == want_masked


def test_pack_bins_reuses_external_assignment(spark):
    """assignment= short-circuits the internal pack: bins follow the
    caller's table exactly (here: a deliberately non-FFD assignment)."""
    from cryo_spark.operators.seqprep import pack_bins

    docs = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["c"]), (3, ["d", "e", "f"])],
        "doc_id long, tokens array<string>",
    )
    assign = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 9)], "doc_id long, bin_id long"
    )
    got = {
        r.bin_id: (list(r.doc_ids), list(r.tokens))
        for r in pack_bins(docs, assignment=assign).collect()
    }
    assert got == {
        7: ([1, 2], ["a", "b", "c"]),
        9: ([3], ["d", "e", "f"]),
    }


def test_pack_bins_group_local_never_mixes_groups(spark):
    """group_cols packing: a bin never mixes splits, group columns
    ride through, and the bin key is (group, bin_id) — two groups in
    the same packer partition may reuse offsets."""
    from cryo_spark.operators.seqprep import pack_bins

    docs = spark.createDataFrame(
        [(i, ["t"] * (1 + i % 3), "train" if i % 2 else "val")
         for i in range(40)],
        "doc_id long, tokens array<string>, split string",
    )
    per_doc = {r.doc_id: r.split for r in docs.collect()}
    bins = pack_bins(docs, budget=5, group_cols=["split"]).collect()
    seen = []
    for b in bins:
        assert {per_doc[d] for d in b.doc_ids} == {b.split}  # group-pure
        assert b.n_tokens <= 5
        seen.extend(b.doc_ids)
    assert sorted(seen) == sorted(per_doc)  # partition of the corpus
    keys = [(b.split, b.bin_id) for b in bins]
    assert len(keys) == len(set(keys))  # (group, bin_id) is the key


def test_pack_bins_plan_shape(spark):
    """Packer plan pin on the scale-invariant structure: exactly ONE
    explicit repartition (the packing boundary — a groupBy
    formulation would add a second exchange over the same rows),
    exactly one bin aggregation exchange, and a mapInPandas packer.
    The assignment→tokens join strategy is deliberately NOT pinned:
    AQE broadcasts the assignment when it is small and co-partitions
    on doc_id when it is corpus-sized — both are the right call at
    their scale."""
    from cryo_spark.operators.seqprep import pack_bins

    docs = spark.createDataFrame(
        [(i, ["t"] * (1 + i % 5), "train") for i in range(50)],
        "doc_id long, tokens array<string>, split string",
    )
    plan = (
        pack_bins(docs, budget=8, group_cols=["split"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert plan.count("REPARTITION_BY_NUM") == 1  # the packer boundary
    agg_exchanges = re.findall(
        r"Exchange hashpartitioning\(split#\d+, bin_id#\d+L", plan
    )
    assert len(agg_exchanges) == 1  # exactly one bin aggregation
    assert "FlatMapGroupsInPandas" not in plan  # mapInPandas packer
    assert "MapInPandas" in plan
