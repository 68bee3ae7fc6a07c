"""Work-list planning: block syntax, chunking, query validation.

Mirrors the reference's partition planner:
- block syntax parsing — /root/reference/crates/cli/src/parse/
  blocks.rs:149-358 (`12M:13M`, `:1000`, `500:`, `-100:latest`,
  `18M:+50`, `a:b/n` evenly-spaced subset, `a:b:skip`, K/M/B
  suffixes, `_` separators, space-separated multi-token),
- subchunking — crates/freeze/src/types/chunks/subchunks.rs:12-43,
  range_to_chunks number_chunk.rs:94-106,
- boundary alignment — number_chunk.rs:77-91,
- reorg buffer — cli/parse/blocks.rs:360-384,
- validation of required dims — types/queries.rs:46-70,
- arg aliasing — cli/parse/query.rs:31-108.

Chunks are plain python values (the work-list is tiny — thousands of
entries for a full chain); the *data* they describe lives in Spark.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from cryo_spark.schemas import get_spec

DEFAULT_CHUNK_SIZE = 1000


@dataclass(frozen=True)
class BlockChunk:
    """Range(start, end) inclusive, or explicit Numbers list."""

    start: int | None = None
    end: int | None = None
    numbers: tuple[int, ...] | None = None

    @property
    def is_range(self) -> bool:
        return self.numbers is None

    def values(self) -> list[int]:
        if self.numbers is not None:
            return list(self.numbers)
        return list(range(self.start, self.end + 1))

    def min_value(self) -> int:
        return self.start if self.numbers is None else min(self.numbers)

    def max_value(self) -> int:
        return self.end if self.numbers is None else max(self.numbers)

    def size(self) -> int:
        if self.numbers is not None:
            return len(self.numbers)
        return self.end - self.start + 1

    def stub(self) -> str:
        """`00016000000_to_00016999999` (chunk_ops.rs:25-32,
        format_item number_chunk.rs:18-20: zero-pad to >=8)."""
        return f"{self.min_value():0>8}_to_{self.max_value():0>8}"


@dataclass(frozen=True)
class TxChunk:
    """Transaction-hash chunk — the reference's transactions time
    dimension (types/queries.rs:75-80 TimeDimension::Transactions,
    TransactionChunk = BinaryChunk::Values, chunks/chunk.rs:7-22)."""

    hashes: tuple[bytes, ...]

    def values(self) -> list[bytes]:
        return list(self.hashes)

    def min_value(self) -> bytes:
        return min(self.hashes)

    def max_value(self) -> bytes:
        return max(self.hashes)

    def size(self) -> int:
        return len(self.hashes)

    def stub(self) -> str:
        """`0x123456_to_0xabcdef` — format_item binary_chunk.rs:16-24
        keeps the first 8 chars of the 0x-hex string (0x + 6 nibbles),
        stub chunk_ops.rs:25-32 joins byte-order min and max."""

        def fmt(h: bytes) -> str:
            return ("0x" + h.hex())[:8]

        return f"{fmt(self.min_value())}_to_{fmt(self.max_value())}"


def _tx_bytes(v) -> bytes:
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    s = str(v)
    return bytes.fromhex(s[2:] if s.startswith("0x") else s)


def parse_tx_inputs(txs) -> TxChunk:
    """`--txs` values -> one TransactionChunk (cli/parse/
    partitions.rs:176-187: CLI-passed hashes form a single
    Values chunk). Accepts 0x-hex strings, bytes, or a parquet path
    (optionally `path:column`, default column transaction_hash)
    whose distinct values are the hash list."""
    if isinstance(txs, (str, bytes)):
        txs = [txs]
    hashes: list[bytes] = []
    for t in txs:
        if isinstance(t, str) and ".parquet" in t:
            import pyarrow.parquet as pq

            path, col = t, "transaction_hash"
            if ":" in t and not t.endswith(".parquet"):
                path, col = t.rsplit(":", 1)
            vals = pq.read_table(path, columns=[col]).column(col).to_pylist()
            hashes.extend(sorted({_tx_bytes(v) for v in vals if v is not None}))
        else:
            hashes.append(_tx_bytes(t))
    if not hashes:
        raise ValueError("txs requires at least one transaction hash")
    return TxChunk(hashes=tuple(hashes))


def parse_call_datas(
    call_data: list[str] | None,
    function: list[str] | None,
    inputs: list[str] | None,
) -> list[bytes] | None:
    """`--call-data` / `--function` / `--inputs` -> call-data values
    (cli/parse/partitions.rs:136-174): call_data literal, or function
    selector alone, or the function x inputs cross product; mixing
    call_data with function/inputs is an error, as is inputs alone."""
    def _hx(s: str) -> bytes:
        return bytes.fromhex(s[2:] if s.startswith("0x") else s)

    if call_data is None and function is None and inputs is None:
        return None
    if call_data is not None and function is not None:
        raise ValueError("cannot specify both call_data and function")
    if call_data is not None and inputs is not None:
        raise ValueError("cannot specify both call_data and inputs")
    if call_data is not None:
        return [_hx(c) for c in call_data]
    if function is None:
        raise ValueError("must specify function if specifying inputs")
    if inputs is None:
        return [_hx(f) for f in function]
    return [_hx(f) + _hx(i) for f in function for i in inputs]


class MissingChainTip(ValueError):
    """A `latest` block reference needs a chain tip that was not
    supplied — the typed signal api's online resolution retries on
    (never retry arbitrary parse errors)."""


def parse_block_number(ref: str, position: str, latest: int | None = None) -> int:
    """One block reference: int/float, K/M/B suffix, `latest`, empty
    (0 at range start, latest at range end) — blocks.rs:320-358."""
    if ref == "latest" or (ref == "" and position == "last"):
        if latest is None:
            raise MissingChainTip("`latest` requires a known chain tip")
        return latest
    if ref == "":
        if position == "first":
            return 0
        raise ValueError("empty block reference")
    mult = 1
    if ref[-1] in "bB":
        mult = 1_000_000_000
    elif ref[-1] in "mM":
        mult = 1_000_000
    elif ref[-1] in "kK":
        mult = 1_000
    if mult > 1:
        return round(float(ref[:-1]) * mult)
    return int(float(ref))


def _parse_block_range(first: str, second: str, latest: int | None) -> tuple[int, int]:
    """blocks.rs:275-317: `a:b` is end-exclusive unless b is `latest`
    or empty; `-n:b` means the n blocks ending at b; `a:+n` means the
    n blocks starting at a (the end-exclusive adjustment applies to
    the `+` branch too — blocks.rs:308-312, test `10:+100` ->
    Range(10, 109))."""
    if first.startswith("-"):
        end = parse_block_number(second, "last", latest)
        start = end - int(first[1:])
        return start + 1, end
    if second.startswith("+"):
        start = parse_block_number(first, "first", latest)
        return start, start + int(second[1:]) - 1
    start = parse_block_number(first, "first", latest)
    end = parse_block_number(second, "last", latest)
    if second != "latest" and second != "":
        end -= 1
    return start, end


def evenly_spaced_subset(items: list, n: int) -> list:
    """blocks.rs:250-272."""
    if n == 0 or not items:
        return []
    if n >= len(items):
        return list(items)
    if n == 1:
        # the reference's f64 math gives interval=inf here and keeps
        # only items[0] (blocks.rs:261-271)
        return [items[0]]
    interval = (len(items) - 1) / (n - 1)
    acc = 0.0
    out = []
    for _ in range(n):
        out.append(items[int(acc)])
        acc += interval
    return out


def parse_block_token(s: str, as_range: bool, latest: int | None = None) -> BlockChunk:
    """blocks.rs:178-216."""
    s = s.replace("_", "")
    parts = s.split(":")
    if len(parts) == 1:
        return BlockChunk(numbers=(parse_block_number(parts[0], "none", latest),))
    if len(parts) == 2:
        first, second = parts
        n_keep = None
        if "/" in second:
            second, n_str = second.split("/", 1)
            n_keep = int(n_str)
        start, end = _parse_block_range(first, second, latest)
        if end < start:
            raise ValueError("end_block should not be less than start_block")
        if n_keep is not None:
            return BlockChunk(
                numbers=tuple(evenly_spaced_subset(list(range(start, end + 1)), n_keep))
            )
        if as_range:
            return BlockChunk(start=start, end=end)
        return BlockChunk(numbers=tuple(range(start, end + 1)))
    if len(parts) == 3:
        start, end = _parse_block_range(parts[0], parts[1], latest)
        skip = int(parts[2])
        return BlockChunk(numbers=tuple(range(start, end + 1, skip)))
    raise ValueError("blocks must be block_number or start:end[/n|:skip]")


def _file_token_chunk(token: str) -> BlockChunk | None:
    """`path.parquet[:column]` token → distinct block numbers from the
    file (S4 — cli/parse/blocks.rs:70-105, read.rs:5-31). Column
    defaults to block_number."""
    import os

    path, col = token, "block_number"
    if ":" in token:
        maybe_path, maybe_col = token.rsplit(":", 1)
        if os.path.exists(maybe_path):
            path, col = maybe_path, maybe_col
    if not os.path.exists(path):
        return None
    import pyarrow.parquet as pq

    values = pq.read_table(path, columns=[col])[col].to_pylist()
    return BlockChunk(numbers=tuple(sorted({int(v) for v in values})))


def parse_block_inputs(inputs: str | int | list, latest: int | None = None) -> list[BlockChunk]:
    """Space-separated tokens; a single token parses as a Range
    (one chunk), multiple as Numbers (blocks.rs:149-169). A token
    that is a parquet path reads its (distinct, sorted) block_number
    column — `path[:column]` overrides the column."""
    if isinstance(inputs, int):
        inputs = str(inputs)
    if isinstance(inputs, (list, tuple)):
        tokens: list[str] = []
        for x in inputs:
            tokens.extend(str(x).split(" "))
    else:
        tokens = str(inputs).split(" ")
    chunks: list[BlockChunk] = []
    for t in tokens:
        from_file = _file_token_chunk(t)
        if from_file is not None:
            chunks.append(from_file)
        else:
            chunks.append(parse_block_token(t, len(tokens) == 1, latest))
    return chunks


# --------------------------------------------------------------------------
# subchunking (subchunks.rs:12-43)
# --------------------------------------------------------------------------

def range_to_chunks(start: int, end: int, chunk_size: int) -> list[tuple[int, int]]:
    out = []
    cs = start
    while True:
        ce = min(cs + chunk_size - 1, end)
        out.append((cs, ce))
        if ce == end:
            return out
        cs += chunk_size


def subchunk_by_size(chunks: list[BlockChunk], chunk_size: int) -> list[BlockChunk]:
    out: list[BlockChunk] = []
    for c in chunks:
        if c.numbers is not None:
            out.extend(
                BlockChunk(numbers=tuple(c.numbers[i : i + chunk_size]))
                for i in range(0, len(c.numbers), chunk_size)
            )
        else:
            out.extend(
                BlockChunk(start=s, end=e)
                for s, e in range_to_chunks(c.start, c.end, chunk_size)
            )
    return out


def subchunk_by_count(chunks: list[BlockChunk], n_chunks: int) -> list[BlockChunk]:
    total = sum(c.size() for c in chunks)
    return subchunk_by_size(chunks, -(-total // n_chunks))


def align_chunk(c: BlockChunk, chunk_size: int) -> BlockChunk | None:
    """Snap range boundaries to chunk_size multiples
    (number_chunk.rs:77-91); Numbers chunks pass through."""
    if c.numbers is not None:
        return c
    start = -(-c.start // chunk_size) * chunk_size
    end = (c.end // chunk_size) * chunk_size
    if end > start:
        return BlockChunk(start=start, end=end)
    return None


def order_chunks(
    chunks: list[BlockChunk], order: str = "normal", seed: int = 42
) -> list[BlockChunk]:
    """Chunk processing order: normal/reverse/random
    (cli/parse/partitions.rs:110-123). Random is seeded —
    deterministic across runs."""
    if order == "normal":
        return list(chunks)
    if order == "reverse":
        return list(reversed(chunks))
    if order == "random":
        import random

        out = list(chunks)
        random.Random(seed).shuffle(out)
        return out
    raise ValueError("chunk order must be normal|reverse|random")


def apply_reorg_buffer(
    chunks: list[BlockChunk], latest: int, reorg_buffer: int
) -> list[BlockChunk]:
    """Drop every chunk whose max block is within `reorg_buffer` of
    the tip (cli/parse/blocks.rs:360-384). Whole-chunk semantics, not
    truncation: a chunk straddling the cutoff is dropped entirely, so
    file boundaries/stubs near the tip stay identical to the
    reference's and skip-existing re-runs are idempotent."""
    if reorg_buffer == 0:
        return chunks
    cutoff = latest - reorg_buffer
    return [c for c in chunks if c.max_value() <= cutoff]


# --------------------------------------------------------------------------
# query spec + validation
# --------------------------------------------------------------------------

@dataclass
class Query:
    datatypes: list[str]
    chunks: list[BlockChunk] = field(default_factory=list)
    columns: list[str] | None = None
    include_columns: list[str] | None = None
    exclude_columns: list[str] | None = None
    hex: bool = False
    u256_types: list[str] | None = None
    exclude_failed: bool = False
    # partition dims beyond blocks (address/contract/slot/topic/calldata)
    dims: dict[str, list] = field(default_factory=dict)

    def validate(self) -> None:
        """Required-dim validation (queries.rs:46-70) after arg
        aliasing (cli/parse/query.rs:31-108)."""
        for name in self.datatypes:
            spec = get_spec(name)
            dims = dict(self.dims)
            for alias, target in spec.arg_aliases.items():
                if alias in dims and target not in dims:
                    dims[target] = dims.pop(alias)
            missing = [d for d in spec.required_dims if d not in dims]
            if missing:
                raise ValueError(
                    f"dataset {spec.name} requires parameters {missing} "
                    f"(have: {sorted(dims)})"
                )
