"""Chat / instruction-tuning data preparation: render conversation
transcripts into training text while tracking WHERE the assistant
spans land, so the loss mask that supervised finetuning needs is
computed here — in the engine, exactly once — instead of re-derived
by every trainer.

A conversations frame holds ``array<struct<role string, content
string>>`` per row. Three operators:

- :func:`render_chat` — template render (configurable per-role
  prefix/suffix, ChatML-shaped by default) producing the training
  ``text`` AND ``assistant_spans``: the [start, end) character
  intervals of assistant CONTENT (not the role scaffolding — the
  model should learn to produce content, not to echo its own
  prompt tokens). One JVM ``aggregate`` over the messages array
  threads a running character offset, so the whole render is a
  narrow projection: zero shuffles, zero Python, scales as a scan.

- :func:`token_loss_mask` — char spans → per-token 0/1 loss weights
  under a regex tokenization. Token OFFSETS are not recoverable from
  JVM ``split`` (separator widths are lost), so this is the
  documented Arrow path: a pandas UDF running ``re.finditer`` per
  batch — the same tokenization regex the token-count operators use,
  applied with positions.

- :func:`render_preference_pairs` — DPO/RLHF preference-pair prep:
  a prompt conversation plus two candidate responses render to
  (prompt_text, chosen_text, rejected_text) with the RESPONSE span on
  each side, so a preference trainer can slice response logprobs
  without re-tokenizing. Pure narrow projection on top of
  :func:`render_chat`'s machinery.

- :func:`reference_render` — pure-Python reference implementation
  (independent string-ops derivation) the differential tests pin the
  JVM accumulator against.

Composition: rendered rows are documents — dedup/decontam/quality
operate on ``text`` unchanged, and ``seqprep.pack_sequences`` packs
them; masks ride along as columns.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ChatML-shaped default template. Prefix/suffix per role; the
#: assistant span covers content only (between its prefix and suffix).
DEFAULT_TEMPLATE = {
    "prefix": "<|im_start|>{role}\n",
    "suffix": "<|im_end|>\n",
}

#: the token pattern shared with the text suite's token counting —
#: words / numbers / single non-space symbols (BPE-ish pretokenizer)
TOKEN_RE = r"\w+|[^\w \t\n\x0b\f\r]"


def _rendered_parts(role: Column, content: Column, template: dict):
    """(prefix, content, suffix) string columns for one message under
    the template; '{role}' in prefix/suffix substitutes the role."""
    def fill(pat: str) -> Column:
        pieces = pat.split("{role}")
        if len(pieces) == 1:
            return F.lit(pat)
        out = F.lit(pieces[0])
        for p in pieces[1:]:
            out = F.concat(out, role, F.lit(p))
        return out

    return fill(template["prefix"]), content, fill(template["suffix"])


def render_chat(
    df: DataFrame,
    messages_col: str = "messages",
    text_col: str = "text",
    spans_col: str = "assistant_spans",
    template: dict | None = None,
    mask_role: str = "assistant",
) -> DataFrame:
    """Render conversations to training text + assistant content
    spans.

    Adds ``text_col`` (the full rendered transcript) and ``spans_col``
    (``array<struct<start long, end long>>``, [start, end) character
    intervals of every ``mask_role`` message's CONTENT). Rendering and
    span tracking happen in ONE JVM ``aggregate`` pass threading
    (rendered-so-far, offset, spans) through the messages array —
    a narrow projection with no Python and no shuffle."""
    template = template or DEFAULT_TEMPLATE
    msgs = F.col(messages_col)

    acc_schema = (
        "struct(cast('' as string) as txt, "
        "cast(array() as array<struct<start:bigint,`end`:bigint>>) as spans)"
    )

    def step(acc: Column, m: Column) -> Column:
        pre, content, suf = _rendered_parts(
            m["role"], m["content"], template
        )
        start = F.length(acc["txt"]) + F.length(pre)
        end = start + F.length(content)
        new_txt = F.concat(acc["txt"], pre, content, suf)
        new_spans = F.when(
            m["role"] == mask_role,
            F.concat(
                acc["spans"],
                F.array(F.struct(start.alias("start"), end.alias("end"))),
            ),
        ).otherwise(acc["spans"])
        return F.struct(new_txt.alias("txt"), new_spans.alias("spans"))

    acc = F.aggregate(msgs, F.expr(acc_schema), step)
    return df.withColumn("_rc", acc).select(
        "*",
        F.col("_rc.txt").alias(text_col),
        F.col("_rc.spans").alias(spans_col),
    ).drop("_rc")


def render_preference_pairs(
    df: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    template: dict | None = None,
    response_role: str = "assistant",
    drop_ties: bool = True,
) -> DataFrame:
    """DPO/RLHF preference-pair rendering: ``prompt_col`` holds the
    conversation so far (``array<struct<role,content>>``, normally
    ending on a user turn), ``chosen_col``/``rejected_col`` the two
    candidate response STRINGS. Adds:

    - ``prompt_text`` — the rendered prompt transcript;
    - ``chosen_text`` / ``rejected_text`` — prompt + the response
      rendered as a ``response_role`` turn;
    - ``chosen_spans`` / ``rejected_spans`` — single-element span
      arrays covering the response CONTENT in the corresponding text
      (render_chat's span shape, so :func:`token_loss_mask` applies
      to either side unchanged).

    The span is computed directly from the prompt length (prompt +
    role prefix), NOT by re-running the full-transcript span
    accumulator — DPO scores the candidate response only, so
    assistant turns INSIDE a multi-turn prompt must stay unmasked,
    which reusing :func:`render_chat` span tracking on the
    concatenated messages would get wrong.

    ``drop_ties=True`` removes rows where chosen == rejected (or
    either side is NULL): a tie carries zero preference signal and a
    NULL side is an unusable pair — both poison a DPO loss silently.
    Everything here is one narrow projection: zero shuffles, zero
    Python; dedup/decontam compose upstream on the raw columns."""
    template = template or DEFAULT_TEMPLATE
    rendered = render_chat(
        df,
        messages_col=prompt_col,
        text_col="prompt_text",
        spans_col="_prompt_spans",
        template=template,
        mask_role=response_role,
    ).drop("_prompt_spans")

    role = F.lit(response_role)

    def side(resp_col: str, text_name: str, spans_name: str):
        pre, content, suf = _rendered_parts(role, F.col(resp_col), template)
        start = F.length("prompt_text") + F.length(pre)
        end = start + F.length(content)
        return (
            F.concat(F.col("prompt_text"), pre, content, suf).alias(
                text_name
            ),
            F.array(
                F.struct(
                    start.cast("long").alias("start"),
                    end.cast("long").alias("end"),
                )
            ).alias(spans_name),
        )

    out = rendered.select(
        "*",
        *side(chosen_col, "chosen_text", "chosen_spans"),
        *side(rejected_col, "rejected_text", "rejected_spans"),
    )
    if drop_ties:
        out = out.filter(
            F.col(chosen_col).isNotNull()
            & F.col(rejected_col).isNotNull()
            & (F.col(chosen_col) != F.col(rejected_col))
        )
    return out


def reference_render(
    messages: list[dict],
    template: dict | None = None,
    mask_role: str = "assistant",
) -> tuple[str, list[tuple[int, int]]]:
    """Pure-Python reference of :func:`render_chat` (text, spans) for
    differential tests — independent derivation: renders message by
    message with ordinary string ops instead of the JVM accumulator."""
    template = template or DEFAULT_TEMPLATE
    text, spans = "", []
    for m in messages:
        pre = template["prefix"].replace("{role}", m["role"])
        suf = template["suffix"].replace("{role}", m["role"])
        start = len(text) + len(pre)
        if m["role"] == mask_role:
            spans.append((start, start + len(m["content"])))
        text += pre + m["content"] + suf
    return text, spans


def token_loss_mask(
    df: DataFrame,
    text_col: str = "text",
    spans_col: str = "assistant_spans",
    tokens_col: str = "tokens",
    mask_col: str = "loss_mask",
    token_re: str = TOKEN_RE,
) -> DataFrame:
    """Char spans → token-level loss mask: adds ``tokens_col``
    (``array<string>``) and ``mask_col`` (``array<int>`` of 0/1, same
    length) where a token's weight is 1 iff its character interval
    lies INSIDE one of the spans (strict containment: a token
    straddling a span boundary is scaffolding-contaminated and gets
    0 — the conservative choice for a loss mask).

    Token offsets need ``re.finditer`` positions, which JVM ``split``
    discards — the one Arrow (pandas UDF) stage in the chat path,
    documented as such. Output arrays align index-for-index; the
    packing stage can concatenate both."""
    import re as _re

    pat = _re.compile(token_re)

    @F.pandas_udf(
        "struct<tokens: array<string>, mask: array<int>>"
    )
    def _mask(text: pd.Series, spans: pd.Series) -> pd.DataFrame:
        toks_out, mask_out = [], []
        for t, sp in zip(text, spans):
            if t is None:
                toks_out.append(None)
                mask_out.append(None)
                continue
            # sp arrives as a numpy array of dicts under Arrow — no
            # truthiness; test None explicitly
            ivs = [
                (s["start"], s["end"])
                for s in (sp if sp is not None else [])
            ]
            toks, mask = [], []
            for mt in pat.finditer(t):
                toks.append(mt.group(0))
                a, b = mt.span()
                mask.append(
                    1 if any(s <= a and b <= e for s, e in ivs) else 0
                )
            toks_out.append(toks)
            mask_out.append(mask)
        return pd.DataFrame({"tokens": toks_out, "mask": mask_out})

    out = df.withColumn("_tm", _mask(F.col(text_col), F.col(spans_col)))
    return out.select(
        "*",
        F.col("_tm.tokens").alias(tokens_col),
        F.col("_tm.mask").alias(mask_col),
    ).drop("_tm")
