"""Document-corpus ingestion: land raw text data as the canonical
``documents`` shape (doc_id, text, ...) the operator layer consumes.

The chain side of this engine reads landed parquet raw tables (or the
live RPC source); the training-data side ingests whatever the crawl
produced — parquet, JSONL dumps, or plain text files. All three land
through Spark's native readers (distributed, splittable except
whole-file text), with one normalization applied here: a DETERMINISTIC
``doc_id`` for inputs that lack one, derived from content + origin
(`xxhash64(input_file_name, text)`), so re-ingesting the same files on
any cluster layout yields the same ids — the property every
downstream hash-keyed operator (splits, sampling, dedup keepers)
depends on. monotonically_increasing_id is deliberately NOT used: its
values depend on partition layout.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from itertools import chain as _chain

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cryo_spark.fsutil import resolve_fs


class MemberTooLargeError(ValueError):
    """A WARC member or record exceeds the configured size cap
    (``max_member_bytes`` / ``max_record_bytes``). Distinct from
    framing/decompress corruption so callers with a drop-bad-records
    policy (``fetch_cdx_records``) can still FAIL LOUDLY on the
    deliberate size guard instead of silently dropping an oversized
    but valid record."""


def read_documents(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    text_col: str = "text",
    id_col: str = "doc_id",
    whole_files: bool = False,
) -> DataFrame:
    """Load a document corpus:

    - ``fmt='parquet'`` / ``'jsonl'``: columnar / line-delimited JSON;
      rows lacking ``id_col`` get the deterministic content hash id.
    - ``fmt='text'``: one doc per LINE (default — splittable, scales
      to any file size) or per FILE with ``whole_files=True`` (the
      one-doc-one-file layout; non-splittable, so a huge single file
      becomes one task — prefer line or jsonl layouts at scale).

    Compressed inputs (``.jsonl.gz`` / ``.txt.gz`` — the shape real
    crawl dumps arrive in) work through every branch unchanged:
    Spark's text/JSON readers infer the codec from the extension and
    decompress in the scan. CAVEAT (SCALE.md): gzip is a
    NON-SPLITTABLE codec — each ``.gz`` file is one task regardless of
    size, so a crawl shipped as one 500 GB gzip member serializes its
    scan. Ship many ~100 MB-1 GB members (the CommonCrawl layout) and
    parallelism comes from file count; or re-land as zstd/parquet
    after first read.

    Identical (file, text) pairs collapse to one id by construction —
    acceptable (and usually desirable) for a dedup-oriented pipeline;
    supply your own ``id_col`` when exact multiplicity matters.
    """
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "jsonl":
        df = spark.read.json(path)
    elif fmt == "text":
        df = (
            spark.read.text(path, wholetext=whole_files)
            .withColumnRenamed("value", text_col)
        )
    else:
        raise ValueError(f"unsupported corpus format: {fmt!r}")
    if text_col not in df.columns:
        raise ValueError(
            f"no {text_col!r} column in {path} (columns: {df.columns})"
        )
    if id_col not in df.columns:
        df = df.withColumn(
            id_col, F.xxhash64(F.input_file_name(), F.col(text_col))
        )
    return df


def read_records(
    spark: SparkSession,
    path: str,
    record_sep: str = "\n\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Record-delimited corpus ingestion: one doc per SEPARATOR-bounded
    multi-line record (the blank-line-delimited dump shape) via the
    text reader's ``lineSep`` option — still a distributed scan, and
    still SPLITTABLE for uncompressed input (the reader resyncs on the
    custom delimiter exactly as it does on newlines). Gzip members
    remain one task each (codec, not delimiter — see read_documents).

    Empty records (separator runs) are dropped; ids are the same
    deterministic (file, text) hash as read_documents."""
    df = (
        spark.read.option("lineSep", record_sep)
        .text(path)
        .withColumnRenamed("value", text_col)
        .filter(F.trim(F.col(text_col)) != "")
    )
    return df.withColumn(
        id_col, F.xxhash64(F.input_file_name(), F.col(text_col))
    )


#: Arrow batch schema for read_warc
_WARC_SCHEMA = (
    "path string, record_idx long, warc_type string, target_uri string, "
    "warc_date string, content_length long, payload string, "
    "payload_digest string, identified_lang string"
)


#: whole-file ingestion guard: a member past this lands on ONE task
#: (binaryFile/gzip are non-splittable) — fail fast with the SCALE.md
#: mitigation instead of letting the executor OOM mid-task
DEFAULT_MAX_MEMBER_BYTES = 1 << 30

#: charset token in an HTTP Content-Type header (response payloads)
_CHARSET_RE = re.compile(rb"charset\s*=\s*\"?([A-Za-z0-9_\-]+)", re.I)

#: wire-format body transforms (raw crawls store the WIRE bytes; the
#: CommonCrawl corpus stores decoded payloads — both must land clean)
#: \r? before $: header lines are CRLF-terminated and multiline $
#: matches before the \n only, leaving the \r in the way
_CONTENT_ENC_RE = re.compile(
    rb"^content-encoding[ \t]*:[ \t]*(?:x-)?(gzip|deflate)[ \t]*\r?$",
    re.I | re.M,
)
_CHUNKED_RE = re.compile(
    rb"^transfer-encoding[ \t]*:.*\bchunked\b[ \t]*\r?$", re.I | re.M
)


#: genuine HTTP chunk-size token: unsigned hex digits, nothing else
_HEX_TOKEN_RE = re.compile(rb"[0-9a-fA-F]+")


def _parse_size_line(body: bytes, pos: int):
    """Parse one chunk-size line at ``pos``. Returns
    (size, byte-after-line) or None when the line is not hex-framed
    (no line ending found, or the token before any ';ext' is not a
    hex integer)."""
    eol = body.find(b"\r\n", pos)
    if eol == -1:
        eol = body.find(b"\n", pos)
        if eol == -1:
            return None
        next_pos = eol + 1
    else:
        next_pos = eol + 2
    size_tok = body[pos:eol].split(b";", 1)[0].strip()
    # strict hex only: int(x, 16) also accepts signed/underscored
    # forms ('-5', '+5', '1_0') that are not valid HTTP chunk sizes —
    # a negative size would flow into the dechunk slicing as a
    # negative offset
    if not _HEX_TOKEN_RE.fullmatch(size_tok):
        return None
    return int(size_tok, 16), next_pos


def _chunk_framing_confirmed(body: bytes) -> bool:
    """True when the body is confirmed chunk-framed one step PAST the
    first declared chunk. A stored-decoded body (Transfer-Encoding
    header preserved, framing already stripped — the CommonCrawl
    storage shape) whose first line happens to parse as hex (a page
    starting '2026', minified '0\\n…') would otherwise be silently
    reframed and truncated/garbled. Confirmation rules:

    - first line isn't a hex size → not framed (caller keeps raw);
    - first size == 0 (terminator as the very first chunk): framed
      only if the remainder is empty or pure trailer lines
      ('name: value' each) followed by at most one blank line — a
      decoded document that merely STARTS with '0' fails this;
    - first chunk complete: the byte run after it must be CRLF/LF
      followed by ANOTHER hex size line, or nothing at all
      (capture truncated exactly at the boundary);
    - first chunk truncated mid-payload: ambiguous by construction —
      trust the Transfer-Encoding header (genuinely truncated chunked
      captures are common; a decoded page whose first token declares
      more bytes than the page holds is the rarer shape)."""
    parsed = _parse_size_line(body, 0)
    if parsed is None:
        return False
    size, pos = parsed
    if size == 0:
        rest = body[pos:]
        # trailers: header-shaped lines then a blank line, nothing else
        while rest:
            line, _, rest = rest.partition(b"\n")
            line = line.rstrip(b"\r")
            if line == b"":
                return rest == b""
            if b":" not in line:
                return False
        return True
    if pos + size >= len(body):
        return True  # truncated mid-first-chunk: header wins
    after = pos + size
    if body[after : after + 2] == b"\r\n":
        after += 2
    elif body[after : after + 1] == b"\n":
        after += 1
    else:
        return False  # no chunk-terminating CRLF where framing demands one
    if after == len(body):
        return True  # truncated exactly at the chunk boundary
    return _parse_size_line(body, after) is not None


def _dechunk(body: bytes) -> bytes:
    """Decode Transfer-Encoding: chunked framing (hex-size line, CRLF,
    chunk bytes, CRLF, ... , 0-size terminator). A body whose FIRST
    line does not parse as a chunk size — or whose framing fails the
    one-step-further confirmation in :func:`_chunk_framing_confirmed`
    (the byte run after the first declared chunk must be CRLF plus
    another hex size, or the 0 terminator must be followed only by
    trailers) — is returned UNCHANGED: a stored-decoded corpus that
    preserved the original headers, a mislabeling server, or a capture
    truncated before the first chunk would otherwise lose or garble
    the whole document. Past a confirmed first chunk, malformed
    framing returns the bytes decoded so far — never raises (crawl
    payloads are frequently truncated mid-chunk)."""
    if not _chunk_framing_confirmed(body):
        return body
    first_size_valid = False
    out, pos, n = [], 0, len(body)
    while pos < n:
        eol = body.find(b"\r\n", pos)
        if eol == -1:
            eol = body.find(b"\n", pos)
            if eol == -1:
                if not first_size_valid:
                    return body  # no line structure: not chunk-framed
                break
            next_pos = eol + 1
        else:
            next_pos = eol + 2
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            if not first_size_valid:
                return body  # not chunk-framed at all: keep as captured
            break
        first_size_valid = True
        if size == 0:
            break
        chunk = body[next_pos : next_pos + size]
        out.append(chunk)
        if len(chunk) < size:
            break  # truncated capture
        pos = next_pos + size
        # skip the CRLF (or LF) after the chunk
        if body[pos : pos + 2] == b"\r\n":
            pos += 2
        elif body[pos : pos + 1] == b"\n":
            pos += 1
    return b"".join(out)


def _decode_body_transforms(
    head: bytes, payload: bytes, max_bytes: int
) -> bytes:
    """Undo wire-format transforms on an HTTP body, outermost first:
    chunked framing, then Content-Encoding gzip/deflate. Failures
    (corrupt stream, unknown form) fall back to the bytes as captured
    — ingestion must never throw on one bad page. Decompressed size is
    capped at ``max_bytes`` (a body bomb inside one record must not
    OOM the task — same stance as the member guard, but per-record
    fallback instead of fail-fast)."""
    import zlib

    if _CHUNKED_RE.search(head):
        payload = _dechunk(payload)
    m = _CONTENT_ENC_RE.search(head)
    if m:
        form = m.group(1).lower()
        # gzip wrapper (16+15), raw deflate (-15), and the in-the-wild
        # "deflate means zlib" variant (15) — first form that decodes
        # cleanly within the cap wins
        wbits_order = [16 + 15] if form == b"gzip" else [-15, 15]
        for wbits in wbits_order:
            try:
                d = zlib.decompressobj(wbits)
                out = d.decompress(payload, max_bytes)
                if d.unconsumed_tail:
                    break  # bomb past the cap: keep the raw bytes
                payload = out
                break
            except zlib.error:
                continue  # corrupt/partial or wrong wrapper
    return payload


def _find_blank_line(raw: bytes, pos: int) -> tuple[int, int]:
    """(offset, separator_len) of the FIRST blank line at/after ``pos``,
    regardless of line-ending style. Both CRLFCRLF and LFLF are
    searched and the EARLIEST non-negative match wins: an LF-framed
    record whose payload contains a CRLF blank line (any HTTP response
    body) must end its header at the LF blank line, not jump into the
    payload. (-1, 0) when no blank line remains."""
    cr = raw.find(b"\r\n\r\n", pos)
    lf = raw.find(b"\n\n", pos)
    if cr != -1 and (lf == -1 or cr < lf):
        return cr, 4
    if lf != -1:
        return lf, 2
    return -1, 0


def _decode_payload(
    body: bytes,
    warc_type: str | None,
    max_bytes: int = DEFAULT_MAX_MEMBER_BYTES,
) -> str:
    """Charset-aware payload decode: an HTTP response payload declares
    its BODY's encoding in its own Content-Type header — honor it (the
    CommonCrawl corpus is full of latin-1/windows-1252 pages), falling
    back to UTF-8 with replacement for everything else.

    The header block and the body are decoded SEPARATELY: the declared
    charset governs only the body bytes. Decoding the whole payload
    with a non-ASCII-compatible charset (charset=utf-16 pages exist in
    real crawls) would garble the status line, so downstream
    ``startswith('HTTP/')`` checks would fail and the mangled full
    payload would flow through as document text. Headers are
    ASCII-by-spec, so the UTF-8-with-replacement header decode is
    lossless for them; the charset is searched in the header block
    ONLY (never body text that happens to contain 'charset=')."""
    if warc_type == "response" and body[:5] == b"HTTP/":
        head_end, sep_len = _find_blank_line(body, 0)
        if head_end != -1:
            body_start = head_end + sep_len
            head = body[:body_start].decode("utf-8", errors="replace")
            # wire transforms (chunked framing, gzip/deflate bodies)
            # undo BEFORE any charset decode — raw crawls store wire
            # bytes; stored-decoded corpora (CommonCrawl) are no-ops
            payload = _decode_body_transforms(
                body[:head_end], body[body_start:], max_bytes
            )
            m = _CHARSET_RE.search(body[:head_end])
            if m:
                try:
                    return head + payload.decode(
                        m.group(1).decode("ascii"), errors="replace"
                    )
                except LookupError:
                    pass  # unknown charset label -> UTF-8 fallback
            return head + payload.decode("utf-8", errors="replace")
    return body.decode("utf-8", errors="replace")


#: largest tolerated WARC header block — past this the stream is
#: treated as garbage (real header blocks are < 1 KB)
_MAX_HEADER_BLOCK = 1 << 20


def _gunzip_chunks(chunks: Iterator[bytes]) -> Iterator[bytes]:
    """Streaming gzip decode over a byte-chunk iterator, MULTI-MEMBER
    aware: real ``.warc.gz`` files (the CommonCrawl layout) are one
    gzip member PER RECORD, concatenated — a plain decompressobj stops
    at the first member boundary, so on eof the decoder restarts on
    the unused tail. Memory stays O(chunk)."""
    import zlib

    d = zlib.decompressobj(16 + 15)
    for c in chunks:
        data = c
        while data:
            out = d.decompress(data)
            if out:
                yield out
            if d.eof:
                data = d.unused_data
                d = zlib.decompressobj(16 + 15)
            else:
                data = b""
    out = d.flush()
    if out:
        yield out


def _iter_warc_stream(
    chunks: Iterator[bytes],
    path: str,
    max_record_bytes: int = DEFAULT_MAX_MEMBER_BYTES,
) -> Iterator[tuple]:
    """Incremental Content-Length-driven WARC parser over a byte-chunk
    iterator: the spec's framing (payloads may legally contain blank
    lines and even 'WARC/1.0' text, so a regex/split reader is wrong)
    — read the header block, take exactly Content-Length payload
    bytes, skip the record boundary, repeat. STREAMING: peak memory is
    O(largest record + one chunk), never the member size — a 5 GB
    decompressed CommonCrawl member parses in constant memory."""
    buf = bytearray()
    it = iter(chunks)
    done = False
    idx = 0

    def fill(need: int) -> bool:
        nonlocal done
        while len(buf) < need and not done:
            try:
                buf.extend(next(it))
            except StopIteration:
                done = True
        return len(buf) >= need

    while True:
        # skip inter-record CRLF/LF runs
        while fill(1) and buf[0:1] in (b"\r", b"\n"):
            del buf[0]
        if not buf:
            return
        # accumulate until the header block's blank line is in buffer
        # (bytearray.find underneath — no copy)
        while True:
            head_end, sep_len = _find_blank_line(buf, 0)
            if head_end != -1:
                break
            if done or len(buf) > _MAX_HEADER_BLOCK:
                return  # trailing garbage / no complete header block
            fill(len(buf) + (64 << 10))
        header = bytes(buf[:head_end]).decode("utf-8", errors="replace")
        fields: dict[str, str] = {}
        for line in header.splitlines()[1:]:  # line 0 = 'WARC/1.0'
            if ":" in line:
                k, _, v = line.partition(":")
                fields[k.strip().lower()] = v.strip()
        clen = int(fields.get("content-length", "0") or "0")
        if clen > max_record_bytes:
            raise MemberTooLargeError(
                f"WARC record {idx} in {path} declares Content-Length "
                f"{clen} (max_record_bytes={max_record_bytes}) — one "
                "record must fit in a task; raise max_record_bytes or "
                "repair the member (SCALE.md: whole-file ingestion)"
            )
        body_start = head_end + sep_len
        fill(body_start + clen)  # truncated capture: take what exists
        body = bytes(buf[body_start : body_start + clen])
        warc_type = fields.get("warc-type")
        yield (
            path,
            idx,
            warc_type,
            fields.get("warc-target-uri"),
            fields.get("warc-date"),
            clen,
            _decode_payload(body, warc_type, max_record_bytes),
            # the crawler's own content digest (e.g. 'sha1:...') —
            # exact crawl-level dedup can key on it without re-hashing
            # payload text, and 'revisit' records carry the digest of
            # the page they duplicate
            fields.get("warc-payload-digest"),
            # WET conversion records carry the crawler's CLD2 verdict
            # ('eng,rus' ISO 639-3 list) — language stratification can
            # key on it without recomputing lang-id over 100 TB; absent
            # on classic response records
            fields.get("warc-identified-content-language"),
        )
        idx += 1
        del buf[: body_start + clen]


def _parse_warc_bytes(
    raw: bytes,
    path: str,
    max_member_bytes: int = DEFAULT_MAX_MEMBER_BYTES,
) -> list[tuple]:
    """In-memory convenience over :func:`_iter_warc_stream` (tests,
    small members): the raw-size guard rejects oversized members up
    front, and ``max_member_bytes`` doubles as the per-record cap —
    a gzip bomb whose single record decompresses past the cap fails
    fast instead of ballooning."""
    if len(raw) > max_member_bytes:
        raise MemberTooLargeError(
            f"WARC member {path} is {len(raw)} bytes "
            f"(max_member_bytes={max_member_bytes}): whole-file members "
            "are non-splittable, so this would serialize onto one task "
            "and risk an executor OOM — ship smaller members or raise "
            "max_member_bytes (SCALE.md: whole-file ingestion)"
        )
    chunks: Iterator[bytes] = iter([bytes(raw)])
    if path.endswith(".gz") or raw[:2] == b"\x1f\x8b":
        chunks = _gunzip_chunks(chunks)
    return list(_iter_warc_stream(chunks, path, max_member_bytes))


def capture_id_expr(
    uri_col: str = "target_uri", date_col: str = "warc_date"
) -> "F.Column":
    """Deterministic CROSS-PATH capture identity: md5 over
    (WARC-Target-URI, WARC-Date), the two headers every WARC record
    carries in its OWN framing — so whole-member ingestion
    (:func:`read_warc`) and the CDX-index ranged fetch
    (``cdx.fetch_cdx_records``) derive the SAME key for the same
    capture even though their ``doc_id``s hash different coordinates
    ((listing path, record_idx) vs (filename, byte offset)). Join the
    two ingestion paths on ``capture_id`` — "did last month's
    whole-member ingest already cover this selectively re-extracted
    doc?" is an inner join. Nulls coalesce to '' around a \\x1f
    separator, so a missing header cannot alias a real value."""
    return F.md5(
        F.concat(
            F.coalesce(F.col(uri_col), F.lit("")),
            F.lit("\x1f"),
            F.coalesce(F.col(date_col), F.lit("")),
        )
    )


def read_warc(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    max_member_bytes: int = DEFAULT_MAX_MEMBER_BYTES,
) -> DataFrame:
    """WARC-shaped crawl ingestion: one row per WARC record with the
    framing headers parsed out (warc_type, target_uri, warc_date,
    content_length) and the payload decoded as text.

    Plumbing: ``binaryFile`` LISTING (path + length only — column
    pruning keeps the file CONTENT out of the scan) → ``mapInPandas``
    tasks that stream each member through pyarrow's filesystem layer
    in 4 MB chunks: multi-member gzip decode, then the incremental
    Content-Length splitter, emitting output batches capped at 2048
    records AND 64 MB of decoded text. Peak task memory is O(batch
    cap + largest record), NOT the member size — a ~1 GB CommonCrawl
    member (4-5 GB decompressed) parses in bounded memory instead of
    materializing. Each member is still ONE
    task (gzip + Content-Length framing cannot resync mid-stream) —
    file-count parallelism, same caveat as gzip JSONL (SCALE.md).
    ``max_member_bytes`` guards the RAW member size (fail fast on
    pathological single members that would serialize one task for
    hours); the per-record cap reuses the same limit. Ids are the
    deterministic (path, record_idx) hash, so re-ingestion on any
    cluster layout yields identical ids; ``capture_id``
    (:func:`capture_id_expr`) is the cross-path identity shared with
    the CDX ranged-fetch path."""
    files = spark.read.format("binaryFile").load(path).select(
        "path", "length"
    )
    return warc_records_from_listing(files, id_col, max_member_bytes)


def warc_records_from_listing(
    files: DataFrame,
    id_col: str = "doc_id",
    max_member_bytes: int = DEFAULT_MAX_MEMBER_BYTES,
) -> DataFrame:
    """The member-parse half of :func:`read_warc` over ANY (path,
    length) listing frame — batch (``spark.read.format('binaryFile')``)
    or STREAMING (``spark.readStream.format('binaryFile')``): the
    parse is a stateless mapInPandas, so the same code serves both
    execution modes (see ``streaming.stream_warc_documents``)."""

    def open_chunks(p: str, chunk: int = 4 << 20) -> Iterator[bytes]:
        # one shared resolution policy (file: normalization, s3a/s3n
        # mapping, remote failures PROPAGATE) — cryo_spark.fsutil
        fs, p = resolve_fs(p)
        # compression=None: pyarrow's default 'detect' would silently
        # gunzip .gz paths itself — the multi-member decode (and the
        # raw-bytes magic sniff) must see the WIRE bytes
        with fs.open_input_stream(p, compression=None) as f:
            while True:
                b = f.read(chunk)
                if not b:
                    return
                yield bytes(b)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "path", "record_idx", "warc_type", "target_uri",
            "warc_date", "content_length", "payload", "payload_digest",
            "identified_lang",
        ]
        # flush on ROWS OR BYTES: a count-only threshold would buffer
        # 2048 fully decoded multi-MB records (gzip/chunked bodies
        # expanded by _decode_body_transforms) before the first yield —
        # the byte bound keeps peak task memory at O(batch cap +
        # largest record), which is the streaming guarantee
        max_batch_bytes = 64 << 20
        rows: list[tuple] = []
        batch_bytes = 0
        for pdf in batches:
            for _, r in pdf.iterrows():
                p, length = r["path"], int(r["length"])
                if length > max_member_bytes:
                    raise MemberTooLargeError(
                        f"WARC member {p} is {length} bytes "
                        f"(max_member_bytes={max_member_bytes}): "
                        "whole-file members are non-splittable, so this "
                        "would serialize onto one task — ship smaller "
                        "members or raise max_member_bytes (SCALE.md: "
                        "whole-file ingestion)"
                    )
                chunks = open_chunks(p)
                first = next(chunks, b"")
                if not first:
                    continue
                chained = _chain([first], chunks)
                if p.endswith(".gz") or first[:2] == b"\x1f\x8b":
                    chained = _gunzip_chunks(chained)
                for rec in _iter_warc_stream(chained, p, max_member_bytes):
                    rows.append(rec)
                    batch_bytes += len(rec[6])  # decoded payload text
                    if len(rows) >= 2048 or batch_bytes >= max_batch_bytes:
                        yield pd.DataFrame(rows, columns=cols)
                        rows, batch_bytes = [], 0
        yield pd.DataFrame(rows, columns=cols)

    return (
        files.mapInPandas(parse, schema=_WARC_SCHEMA)
        .withColumn(id_col, F.xxhash64(F.col("path"), F.col("record_idx")))
        .withColumn("capture_id", capture_id_expr())
    )


def read_warc_documents(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_member_bytes: int = DEFAULT_MAX_MEMBER_BYTES,
    full_entities: bool = False,
    min_chars: int = 1,
    main_content: bool = False,
    smooth: bool = False,
) -> DataFrame:
    """WARC crawl → canonical clean-text documents, end to end:
    :func:`read_warc` (Content-Length framing, charset-aware decode)
    → ``operators.html.extract_documents`` (HTTP header split +
    HTML→text, one narrow JVM projection) → optional boilerplate
    removal (``main_content=True`` swaps the tag-strip extraction for
    ``operators.html.main_content_expr``'s link-density line filter on
    HTML payloads) → optional full-fidelity entity decode
    (``full_entities=True``, the Arrow pass for numeric character
    references).

    Lands (doc_id, url, warc_date, content_type, status, noindex,
    title, html_lang, text) — the shape every downstream operator (text
    suite, dedup family, ``prepare_training_corpus`` with
    ``url_col='url'``) consumes directly. ``noindex`` is True when the
    response carried an ``X-Robots-Tag: noindex`` header or a
    robots-noindex meta tag — SURFACED, never silently dropped:
    indexing policy is the corpus owner's call (filter on the column
    when the policy says so). ``title``/``html_lang`` are the
    normalized <title> line and the declared <html lang> primary
    subtag ('' when absent). The whole chain is the ingestion scan
    plus narrow projections: no shuffle until the first dedup stage
    the caller adds."""
    recs = read_warc(
        spark, path, id_col=id_col, max_member_bytes=max_member_bytes
    )
    return documents_from_records(
        recs,
        id_col=id_col,
        text_col=text_col,
        full_entities=full_entities,
        min_chars=min_chars,
        main_content=main_content,
        smooth=smooth,
    )


def documents_from_records(
    recs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    full_entities: bool = False,
    min_chars: int = 1,
    main_content: bool = False,
    smooth: bool = False,
) -> DataFrame:
    """The record→document projection chain shared by whole-member
    ingestion (:func:`read_warc_documents`) and the index-driven
    selective path (``cryo_spark.sources.cdx.reextract_documents``):
    any ``_WARC_SCHEMA``-shaped record frame (plus ``id_col``) in,
    the canonical (doc_id, url, warc_date, content_type, status,
    noindex, title, html_lang, text) document frame out — all narrow
    JVM projections, no shuffle. A ``capture_id`` column (both
    ingestion paths attach one) rides through, keeping the
    cross-path join key on the DOCUMENT frame too."""
    from cryo_spark.operators import html as html_ops

    body = html_ops.http_body_expr("payload")
    recs = (
        recs.withColumn("noindex", html_ops.noindex_expr("payload"))
        .withColumn("status", html_ops.http_status_expr("payload"))
        # document metadata: normalized <title> line and the DECLARED
        # <html lang> primary subtag (audit/dedup keys — cross-check
        # the latter against text.lang_id before trusting it)
        .withColumn("title", html_ops.html_title_expr(body))
        .withColumn("html_lang", html_ops.html_lang_expr(body))
    )
    docs = html_ops.extract_documents(
        recs, payload_col="payload", text_col=text_col, min_chars=min_chars,
        main_content=main_content, smooth=smooth,
    ).select(
        id_col,
        F.col("target_uri").alias("url"),
        "warc_date",
        *(["capture_id"] if "capture_id" in recs.columns else []),
        "content_type",
        "status",
        "noindex",
        "title",
        "html_lang",
        text_col,
    )
    if full_entities:
        docs = html_ops.decode_entities(docs, text_col)
    return docs


#: WAT JSON envelope: the subtree the link-graph consumer needs.
#: Field names carry '-'; backticks keep the DDL parser happy.
_WAT_SCHEMA = (
    "struct<`Envelope`: struct<"
    "`WARC-Header-Metadata`: struct<`WARC-Target-URI`: string>, "
    "`Payload-Metadata`: struct<`HTTP-Response-Metadata`: struct<"
    "`HTML-Metadata`: struct<"
    "`Links`: array<struct<`path`: string, `url`: string, "
    "`text`: string, `title`: string>>, "
    "`Head`: struct<`Title`: string>>>>>>"
)


def read_wat_links(
    spark: SparkSession,
    path: str,
    max_member_bytes: int = DEFAULT_MAX_MEMBER_BYTES,
) -> DataFrame:
    """WAT crawl metadata → per-page outlinks: one row per crawled
    page with (url, title, links array<struct<path, url, text,
    title>>). A ``.warc.wat.gz`` file (the CommonCrawl *metadata*
    companion) is WARC framing around ``metadata`` records whose
    payload is a JSON envelope; the link list lives at
    ``Envelope.Payload-Metadata.HTTP-Response-Metadata
    .HTML-Metadata.Links``.

    Ingestion is :func:`read_warc` (same streaming parser/guards) +
    one JVM ``from_json`` with a PRUNED schema — only the envelope
    subtree the link graph needs is parsed; the rest of the (large)
    JSON is skipped by the Jackson parser. Malformed payloads land
    NULL links, never fail the scan.

    This is the link-graph source for recipes that never touch raw
    WARC: ``operators.linkgraph.host_link_graph(read_wat_links(...),
    html_col=None, links_col='links')`` builds the same host edges
    from the pre-extracted link lists (absolute/protocol-relative
    targets only, exactly as the raw-HTML extractor)."""
    recs = read_warc(
        spark, path, max_member_bytes=max_member_bytes
    ).filter(F.col("warc_type") == "metadata")
    j = F.from_json(F.col("payload"), _WAT_SCHEMA)
    meta = j["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"][
        "HTML-Metadata"
    ]
    return recs.select(
        F.coalesce(
            j["Envelope"]["WARC-Header-Metadata"]["WARC-Target-URI"],
            F.col("target_uri"),
        ).alias("url"),
        meta["Head"]["Title"].alias("title"),
        F.coalesce(
            meta["Links"],
            F.expr(
                "cast(array() as array<struct<"
                "path:string,url:string,text:string,title:string>>)"
            ),
        ).alias("links"),
    )


def read_wet_documents(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_member_bytes: int = DEFAULT_MAX_MEMBER_BYTES,
    min_chars: int = 1,
) -> DataFrame:
    """WET crawl extracts → canonical documents. A ``.warc.wet.gz``
    file (the CommonCrawl *extracted-text* companion to the raw WARC)
    is WARC framing around ``conversion`` records whose payload is the
    already-extracted plain text of one page — no HTTP envelope, no
    HTML. Ingestion is therefore :func:`read_warc` (same streaming
    member parser, same guards) + a ``conversion`` filter + the
    engine-parity whitespace trim — one narrow projection, zero
    Python beyond the shared parser.

    Lands (doc_id, url, warc_date, identified_lang, text):
    ``identified_lang`` is the crawler's own language verdict
    (``WARC-Identified-Content-Language``, an ISO 639-3 list like
    ``'eng,rus'``; '' pre-2018 crawls) — language stratification can
    key on it without recomputing ``text.lang_id`` over the corpus,
    and cross-checking the two columns flags mislabeled pages.

    Use this when the corpus recipe trusts CommonCrawl's extraction;
    use :func:`read_warc_documents` (raw WARC + ``main_content=True``)
    when it needs its own boilerplate policy — the output shape is
    identical either way, so pipelines swap sources freely."""
    from cryo_spark.operators.html import trim_text_expr

    recs = read_warc(
        spark, path, id_col=id_col, max_member_bytes=max_member_bytes
    )
    return (
        recs.filter(F.col("warc_type") == "conversion")
        .select(
            id_col,
            F.col("target_uri").alias("url"),
            "warc_date",
            F.coalesce(F.col("identified_lang"), F.lit("")).alias(
                "identified_lang"
            ),
            trim_text_expr("payload").alias(text_col),
        )
        .filter(F.length(text_col) >= min_chars)
    )
