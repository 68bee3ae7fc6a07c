"""Minimal pure-Python PNG codec (vendored, round 13).

Implements just enough of the public PNG specification (RFC 2083 /
W3C PNG) to make the multimodal REAL decode path run unconditionally
in dependency-free containers: 8-bit grayscale (color type 0),
RGB (2), palette (3) and RGBA (6); all five scanline filters
(None/Sub/Up/Average/Paeth); no interlacing, no 16-bit depth, no
ancillary-chunk interpretation. The encoder writes filter-0 scanlines
with one zlib IDAT — valid, readable by any conformant decoder.

This is a clean-room implementation from the published spec, kept
deliberately tiny: decode + unfilter + grayscale + box resize are the
whole surface the media operators need (`multimodal.real_decode`,
`real_resize`, `real_dhash`). Using the vendored path for EVERY PNG —
even where PIL exists — keeps perceptual-hash values byte-identical
across environments (PIL's resample kernels differ by version)."""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}

#: hard ceiling on decoded raw size ((stride + 1) * height bytes —
#: 64 MiB ~ a 4096x4096 RGBA image). Media payloads reaching this
#: decoder are untrusted web bytes: a tiny crafted IHDR claiming huge
#: dimensions (or a ~1000:1 zlib bomb in IDAT) must fail loudly and
#: cheaply BEFORE any allocation, not OOM an executor task
#: (ADVICE r13). Decompression is bounded to exactly this budget via
#: decompressobj, never bare zlib.decompress.
MAX_RAW_BYTES = 64 * 1024 * 1024


def is_png(data: bytes | None) -> bool:
    return bool(data) and bytes(data[:8]) == _SIG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(f: int, line: bytearray, prev: bytes, bpp: int) -> None:
    n = len(line)
    if f == 0:
        return
    if f == 1:  # Sub
        for i in range(bpp, n):
            line[i] = (line[i] + line[i - bpp]) & 0xFF
    elif f == 2:  # Up
        for i in range(n):
            line[i] = (line[i] + prev[i]) & 0xFF
    elif f == 3:  # Average
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
    elif f == 4:  # Paeth
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            c = prev[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
    else:
        raise ValueError(f"PNG: unknown filter type {f}")


def decode_png(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """(width, height, channels, rows) — each row is ``width *
    channels`` bytes of 8-bit samples, palette already expanded to
    RGB. Raises ValueError on anything outside the supported subset
    (interlace, 16-bit, truncation, bad signature)."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError("PNG: bad signature")
    pos = 8
    width = height = color = None
    idat = bytearray()
    palette = b""
    while pos + 8 <= len(data):
        (ln,), typ = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        pos += 8
        chunk = data[pos:pos + ln]
        if len(chunk) < ln:
            raise ValueError("PNG: truncated chunk")
        pos += ln + 4  # skip CRC (integrity is the transport's job)
        if typ == b"IHDR":
            width, height, depth, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8:
                raise ValueError(f"PNG: unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"PNG: unsupported color type {color}")
            if inter != 0:
                raise ValueError("PNG: interlacing unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("PNG: nonstandard compression/filter")
            if width == 0 or height == 0:
                # spec requires nonzero dims; also keeps box_resize's
                # grid[0] access total (ADVICE r13)
                raise ValueError("PNG: zero width or height")
            if (width * _CHANNELS[color] + 1) * height > MAX_RAW_BYTES:
                raise ValueError(
                    f"PNG: {width}x{height} exceeds the "
                    f"{MAX_RAW_BYTES}-byte decode budget"
                )
        elif typ == b"PLTE":
            palette = chunk
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    ch = _CHANNELS[color]
    stride = width * ch
    need = (stride + 1) * height
    # bounded decompression (ADVICE r13): ask zlib for EXACTLY the
    # raw size the validated IHDR implies — a decompression bomb can
    # never allocate past the image's own budget — and reject streams
    # that decompress long (spec: IDAT inflates to exactly the
    # filtered scanlines)
    dec = zlib.decompressobj()
    try:
        raw = dec.decompress(bytes(idat), need)
        # anything still inflatable past `need` is a long stream; the
        # probe is itself output-bounded (1 byte) — flush() would not
        # be, it inflates everything left
        extra = (
            dec.decompress(dec.unconsumed_tail, 1)
            if dec.unconsumed_tail else b""
        )
    except zlib.error as exc:
        raise ValueError(f"PNG: corrupt IDAT stream ({exc})") from exc
    if extra:
        raise ValueError("PNG: IDAT decompresses past the pixel data")
    if len(raw) < need:
        raise ValueError("PNG: truncated pixel data")
    rows: list[bytes] = []
    prev: bytes = bytes(stride)
    p = 0
    for _ in range(height):
        f = raw[p]
        p += 1
        line = bytearray(raw[p:p + stride])
        p += stride
        _unfilter(f, line, prev, ch)
        prev = bytes(line)
        rows.append(prev)
    if color == 3:  # expand palette to RGB
        if not palette:
            raise ValueError("PNG: palette image without PLTE")
        plen = len(palette) // 3
        out_rows = []
        for row in rows:
            if max(row) >= plen:
                # keep the documented ValueError-only error contract:
                # an out-of-range index would raise IndexError below
                # (ADVICE r13)
                raise ValueError(
                    f"PNG: palette index {max(row)} >= palette size {plen}"
                )
            out_rows.append(
                bytes(
                    palette[3 * ix + k] for ix in row for k in range(3)
                )
            )
        rows = out_rows
        ch = 3
    return width, height, ch, rows


def encode_png(
    width: int, height: int, channels: int, rows: list[bytes]
) -> bytes:
    """Filter-0 scanlines, single zlib IDAT. ``channels`` 1 (gray),
    3 (RGB) or 4 (RGBA); each row must be ``width * channels``
    bytes."""
    color = {1: 0, 3: 2, 4: 6}[channels]

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def gray_rows(
    width: int, height: int, channels: int, rows: list[bytes]
) -> list[list[int]]:
    """ITU-R 601 luma (the formula PIL's convert('L') documents):
    L = (299 R + 587 G + 114 B) // 1000; alpha ignored."""
    if channels == 1:
        return [list(r) for r in rows]
    out = []
    for r in rows:
        out.append(
            [
                (299 * r[i] + 587 * r[i + 1] + 114 * r[i + 2]) // 1000
                for i in range(0, width * channels, channels)
            ]
        )
    return out


def box_resize(
    grid: list[list[int]], out_w: int, out_h: int
) -> list[list[float]]:
    """Area-average (box) resample of a 2D grid to out_w x out_h —
    deterministic, exact rational coverage weights, no dependency.
    The right kernel for DOWNSAMPLING (every source pixel contributes
    proportionally to its overlap), which is all the perceptual
    hashing and thumbnail features need."""
    in_h, in_w = len(grid), len(grid[0])
    out: list[list[float]] = []
    for oy in range(out_h):
        y0, y1 = oy * in_h / out_h, (oy + 1) * in_h / out_h
        row: list[float] = []
        for ox in range(out_w):
            x0, x1 = ox * in_w / out_w, (ox + 1) * in_w / out_w
            acc = 0.0
            area = 0.0
            for y in range(int(y0), min(int(-(-y1 // 1)), in_h)):
                wy = min(y + 1, y1) - max(y, y0)
                if wy <= 0:
                    continue
                for x in range(int(x0), min(int(-(-x1 // 1)), in_w)):
                    wx = min(x + 1, x1) - max(x, x0)
                    if wx <= 0:
                        continue
                    acc += grid[y][x] * wy * wx
                    area += wy * wx
            row.append(acc / area if area else 0.0)
        out.append(row)
    return out


def decode_gray_resized(
    payload: bytes, out_w: int, out_h: int
) -> list[list[float]]:
    """decode -> luma -> box resize: the one composed call the media
    operators use."""
    w, h, ch, rows = decode_png(payload)
    return box_resize(gray_rows(w, h, ch, rows), out_w, out_h)
