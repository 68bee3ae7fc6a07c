"""Engine scalar-function library (Spark side).

JVM-side column expressions wherever possible (SURVEY §2.8): binary
slicing, big-endian integer decode, zero-byte stats, trace-address
ordering. Python appears only where Spark genuinely lacks the
primitive (keccak256 — reference F1, datasets/eth_calls.rs:79-81),
and then as an Arrow-batched pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

TWO_64 = 18446744073709551616  # 2**64


def be_uint(col: Column | str, max_bytes: int = 16) -> Column:
    """Big-endian unsigned integer value of a binary column as
    decimal(38,0).

    Reads the last ``max_bytes`` bytes (values above 2**128-ish are out
    of scope for the decimal carrier; full 32-byte values keep their
    canonical binary column — SURVEY §1.3 U256 mapping). JVM-side only:
    per-8-byte limbs via conv(hex, 16, 10).
    """
    c = F.col(col) if isinstance(col, str) else col
    # exactly max_bytes bytes of hex: pad left, then keep the RIGHTMOST
    # 2*max_bytes chars (lpad alone would truncate longer inputs to the
    # high-order half)
    h = F.right(
        F.concat(F.lit("0" * (2 * max_bytes)), F.hex(c)), F.lit(2 * max_bytes)
    )
    n_limbs = (max_bytes + 7) // 8
    total: Column | None = None
    for limb in range(n_limbs):
        start = 1 + limb * 16
        width = 2 * max_bytes - limb * 16 if limb == n_limbs - 1 else 16
        width = min(16, width)
        limb_hex = F.substring(h, start, 16)
        limb_val = F.conv(limb_hex, 16, 10).cast(T.DecimalType(38, 0))
        shift = n_limbs - 1 - limb
        # try_* arithmetic: values beyond decimal(38,0) (> ~1e38, i.e.
        # 16-byte inputs above 10^38-1) become NULL instead of failing
        # the whole job under ANSI mode
        term = (
            F.try_multiply(
                limb_val, F.lit(str(TWO_64**shift)).cast(T.DecimalType(38, 0))
            )
            if shift
            else limb_val
        )
        total = term if total is None else F.try_add(total, term)
    return total.cast(T.DecimalType(38, 0))


def be_uint_expr(expr: str, max_bytes: int = 16) -> str:
    """Spark-SQL text of :func:`be_uint` over column/expression text
    ``expr`` — the same limb tree (right-padded hex, per-8-byte
    conv limbs, try_* decimal arithmetic), emitted as ONE string so
    hot dataset projections (state/geth diff transforms build it 4x
    per 8-part merged entry) parse it in a single py4j round trip
    instead of ~18 Column calls. Semantically identical to the Column
    spelling (the rendered plan text can differ in literal escaping);
    value equality pinned in tests/test_r17_optim.py."""
    h = f"right(concat('{'0' * (2 * max_bytes)}', hex({expr})), {2 * max_bytes})"
    n_limbs = (max_bytes + 7) // 8
    total: str | None = None
    for limb in range(n_limbs):
        start = 1 + limb * 16
        limb_val = (
            f"CAST(conv(substring({h}, {start}, 16), 16, 10) "
            "AS DECIMAL(38,0))"
        )
        shift = n_limbs - 1 - limb
        term = (
            f"try_multiply({limb_val}, "
            f"CAST('{TWO_64 ** shift}' AS DECIMAL(38,0)))"
            if shift
            else limb_val
        )
        total = term if total is None else f"try_add({total}, {term})"
    return f"CAST({total} AS DECIMAL(38,0))"


@F.pandas_udf(T.StringType())
def u256_string_udf(s):  # type: ignore[no-untyped-def]
    """Exact decimal string of a big-endian binary word of any width
    (reference U256 string representation, u256s.rs to_string). The
    one place 256-bit exactness genuinely exceeds JVM arithmetic:
    Arrow-batched, applied only when the _string/_f64 representation
    is requested. Values >= 2^128 stay exact here (be_uint's
    decimal(38,0) carrier cannot hold them)."""
    import pandas as pd

    return pd.Series(
        [None if b is None else str(int.from_bytes(bytes(b), "big")) for b in s]
    )


def wrap_u64(col: Column | str) -> Column:
    """Low 8 bytes of a binary word as Spark's signed long — the
    two's-complement reinterpretation of the reference's
    wrapping_to::<u64> (u256s.rs:52-54). Pure JVM: conv() of the last
    16 hex chars, wrapped via decimal(20,0) so values >= 2^63 don't
    overflow the ANSI long cast."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.right(F.concat(F.lit("0" * 16), F.hex(c)), F.lit(16))
    w = F.conv(h, 16, 10).cast(T.DecimalType(20, 0))
    signed = F.when(
        w >= F.lit(str(1 << 63)).cast(T.DecimalType(20, 0)),
        w - F.lit(str(1 << 64)).cast(T.DecimalType(21, 0)),
    ).otherwise(w)
    return signed.cast("long")


def wrap_u32(col: Column | str) -> Column:
    """Low 4 bytes of a binary word as Spark's signed int
    (wrapping_to::<u32>, u256s.rs:49-51)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.right(F.concat(F.lit("0" * 8), F.hex(c)), F.lit(8))
    w = F.conv(h, 16, 10).cast("long")
    signed = F.when(
        w >= F.lit(1 << 31), w - F.lit(1 << 32)
    ).otherwise(w)
    return signed.cast("int")


def count_zero_bytes(col: Column | str) -> Column:
    """Number of 0x00 bytes in a binary column (reference A6,
    datasets/transactions.rs:246-255). Stays JVM-side: aggregate over
    the hex string two chars at a time."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.hex(c)
    return F.size(
        F.filter(F.regexp_extract_all(h, F.lit(".."), 0), lambda x: x == "00")
    ).cast("int")


def trace_sort_key(col: Column | str = "trace_address") -> Column:
    """Deterministic depth-first ordering key for parity trace paths
    ('' root, '0', '0_1', ...). Zero-pads each path component so string
    order == numeric path order; root stays '' (sorts first)."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.array_join(
        F.transform(F.split(c, "_"), lambda x: F.lpad(x, 3, "0")), "_"
    )
    return F.when(c == "", F.lit("")).otherwise(padded)


def topic_to_address(col: Column | str) -> Column:
    """Bytes 12..32 of a 32-byte topic → 20-byte address (reference F4,
    datasets/erc20_transfers.rs:120-121)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 13, 20)


def hex_encode(col: Column | str) -> Column:
    """Binary → 0x-prefixed lowercase hex string (reference Hex type)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit("0x"), F.lower(F.hex(c)))


# ----------------------------- keccak256 ---------------------------------

_KECCAK_ROT = [
    [0, 36, 3, 41, 18], [1, 44, 10, 45, 2], [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56], [27, 20, 39, 8, 14],
]
_KECCAK_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_MASK = (1 << 64) - 1


def _keccak_f(state: list[int]) -> None:
    for rc in _KECCAK_RC:
        # theta
        c = [state[x] ^ state[x + 5] ^ state[x + 10] ^ state[x + 15] ^ state[x + 20]
             for x in range(5)]
        d = [c[(x - 1) % 5] ^ (((c[(x + 1) % 5]) << 1 | (c[(x + 1) % 5]) >> 63) & _MASK)
             for x in range(5)]
        for x in range(5):
            for y in range(5):
                state[x + 5 * y] ^= d[x]
        # rho + pi
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                r = _KECCAK_ROT[x][y]
                v = state[x + 5 * y]
                b[y + 5 * ((2 * x + 3 * y) % 5)] = ((v << r) | (v >> (64 - r))) & _MASK
        # chi
        for x in range(5):
            for y in range(5):
                state[x + 5 * y] = b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y])
        # iota
        state[0] ^= rc


def keccak256_py(data: bytes) -> bytes:
    """Pure-Python keccak256 (the pre-NIST padding variant Ethereum
    uses; hashlib.sha3_256 is NOT compatible). Public algorithm
    (FIPS-202 permutation with 0x01 domain padding). Used only when no
    native keccak library is importable."""
    rate = 136  # 1088-bit rate for 256-bit output
    state = [0] * 25
    padded = data + b"\x01" + b"\x00" * (rate - (len(data) % rate) - 1)
    padded = padded[:-1] + bytes([padded[-1] | 0x80])
    for block_start in range(0, len(padded), rate):
        block = padded[block_start : block_start + rate]
        for i in range(rate // 8):
            state[i] ^= int.from_bytes(block[i * 8 : (i + 1) * 8], "little")
        _keccak_f(state)
    out = b"".join(state[i].to_bytes(8, "little") for i in range(4))
    return out


try:  # optional fast path if a keccak library exists in the image
    from Crypto.Hash import keccak as _pycrypto_keccak  # type: ignore

    def keccak256(data: bytes) -> bytes:
        return _pycrypto_keccak.new(digest_bits=256, data=data).digest()

except ImportError:  # pragma: no cover - depends on environment
    keccak256 = keccak256_py


@F.pandas_udf(T.BinaryType())
def keccak256_udf(s):  # type: ignore[no-untyped-def]
    """Arrow-batched keccak256 over a binary column (reference F1)."""
    return s.map(lambda b: None if b is None else keccak256(bytes(b)))
