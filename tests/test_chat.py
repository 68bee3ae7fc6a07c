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
