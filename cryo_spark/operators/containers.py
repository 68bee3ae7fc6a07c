"""Clean-room video CONTAINER support beyond Y4M/raw-MJPEG (round 17).

The r16 verdict's remaining video gap: crawl-archive video is mostly
MP4/WebM/AVI, and full H.264/VP9/AV1 decode is out of clean-room
reach. What IS reachable, and what a 100 TB pipeline needs first:

- **AVI-MJPG is a full DECODE route**: an AVI with an MJPG video
  stream (the webcam/DV-archive format) is a RIFF chunk tree whose
  ``00dc`` chunks are baseline JPEGs — walk the chunks, feed the
  VENDORED JPEG codec, and the whole near-dup machinery works with
  zero external dependencies, same as the raw-MJPEG route. The
  container even carries its own frame rate (``avih``), which raw
  MJPEG lacks.
- **MP4 metadata is a typed-metadata probe**: the ``moov`` box tree
  is plain length-prefixed structure — dimensions, codec fourcc,
  duration, sample count parse without touching a single coded
  frame. That powers corpus triage (group by codec/resolution,
  drop sub-resolution clips, route MJPG-in-MP4 to the decode path)
  before any expensive per-frame work; actual H.264-class decode
  stays a documented external pre-extraction step.

Both parsers are offset walks over ``bytes`` — no allocation
proportional to frame count beyond the offsets list, executor-local,
driven per-payload from the same mapInPandas samplers as Y4M/MJPEG.

Reference: the blockchain reference (paradigmxyz/cryo) has no media
operators — this is §2.12 extension tier. Format layouts are public
specifications (AVI/RIFF: Microsoft "AVI RIFF File Reference";
MP4: ISO/IEC 14496-12 box structure).
"""

from __future__ import annotations

import struct


# --------------------------------------------------------------------
# AVI (RIFF) — MJPG decode route


def is_avi(data: bytes | None) -> bool:
    return (
        data is not None
        and len(data) >= 12
        and bytes(data[:4]) == b"RIFF"
        and bytes(data[8:12]) == b"AVI "
    )


def _walk_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for the RIFF chunks
    in data[start:end]. Chunks are word-aligned (odd sizes pad 1)."""
    pos = start
    while pos + 8 <= end:
        fourcc = bytes(data[pos:pos + 4])
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            break  # truncated tail chunk
        yield fourcc, body, size
        pos = body + size + (size & 1)


def avi_header(data: bytes) -> dict:
    """The ``avih`` main header: fps (from micro-sec-per-frame),
    total frames, width, height. Raises on a non-AVI payload or a
    missing header."""
    if not is_avi(data):
        raise ValueError("not an AVI (RIFF/'AVI ') payload")
    data = bytes(data)
    for fourcc, body, size in _walk_chunks(data, 12, len(data)):
        if fourcc != b"LIST" or bytes(data[body:body + 4]) != b"hdrl":
            continue
        for cc2, b2, s2 in _walk_chunks(data, body + 4, body + size):
            if cc2 == b"avih" and s2 >= 40:
                (us_per_frame, _maxbps, _pad, _flags, total_frames,
                 _init, _streams, _bufsz, width, height) = struct.unpack_from(
                    "<10I", data, b2
                )
                return {
                    "us_per_frame": us_per_frame,
                    "fps": (1e6 / us_per_frame) if us_per_frame else 0.0,
                    "total_frames": total_frames,
                    "width": width,
                    "height": height,
                }
    raise ValueError("AVI payload has no avih main header")


def avi_mjpeg_offsets(data: bytes) -> list[tuple[int, int]]:
    """(offset, length) of each JPEG frame in the AVI's ``movi`` list
    — video chunks (``..dc``/``..db``) whose payload starts with the
    JPEG SOI. Non-JPEG video chunks (a compressed codec this engine
    cannot decode clean-room) yield an empty list rather than garbage.
    """
    if not is_avi(data):
        return []
    data = bytes(data)
    offs: list[tuple[int, int]] = []
    for fourcc, body, size in _walk_chunks(data, 12, len(data)):
        if fourcc != b"LIST" or bytes(data[body:body + 4]) != b"movi":
            continue
        for cc2, b2, s2 in _walk_chunks(data, body + 4, body + size):
            if cc2[2:4] in (b"dc", b"db") and bytes(
                data[b2:b2 + 3]
            ) == b"\xff\xd8\xff":
                offs.append((b2, s2))
    return offs


def encode_avi_mjpeg(
    width: int, height: int, jpeg_frames: list[bytes], fps: float = 25.0
) -> bytes:
    """Minimal spec-shaped AVI-MJPG writer (fixture/test twin of the
    parser, the `encode_y4m` precedent): RIFF('AVI ') with an hdrl
    LIST carrying a real avih and a movi LIST of 00dc JPEG chunks."""
    if fps <= 0:
        raise ValueError(f"fps must be > 0, got {fps}")

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def list_chunk(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I",
        int(round(1e6 / fps)), 0, 0, 0, len(jpeg_frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih))
    movi = list_chunk(
        b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --------------------------------------------------------------------
# MP4 (ISO BMFF) — typed-metadata probe (no decode)

_CONTAINER_BOXES = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def is_mp4(data: bytes | None) -> bool:
    return (
        data is not None
        and len(data) >= 12
        and bytes(data[4:8]) == b"ftyp"
    )


def _walk_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for ISO-BMFF boxes
    in data[start:end] (64-bit largesize honored)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        fourcc = bytes(data[pos + 4:pos + 8])
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                break
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos  # box extends to EOF
        if size < 8 or pos + size > end:
            break  # malformed/truncated
        yield fourcc, body, pos + size
        pos += size


def _find_boxes(data: bytes, start: int, end: int, path: list[bytes]):
    """All (body_start, body_end) spans reached by descending
    ``path`` through container boxes."""
    spans = [(start, end)]
    for want in path:
        nxt = []
        for s, e in spans:
            for cc, b, be in _walk_boxes(data, s, e):
                if cc == want:
                    nxt.append((b, be))
        spans = nxt
    return spans


def mp4_metadata(data: bytes) -> dict:
    """Container metadata from the ``moov`` tree, no frame decode:
    ``{'duration_ms', 'tracks': [{'codec', 'width', 'height',
    'n_samples', 'duration_ms'}, ...]}`` for video tracks. The triage
    input for a crawl video column — group by codec/resolution, and
    route ``codec='jpeg'/'mjpa'`` (MJPG-in-MP4) toward the vendored
    decode path. Raises on a non-MP4 payload."""
    if not is_mp4(data):
        raise ValueError("not an ISO-BMFF/MP4 payload (no ftyp)")
    data = bytes(data)
    out: dict = {"duration_ms": None, "tracks": []}
    for mb, me in _find_boxes(data, 0, len(data), [b"moov"]):
        for cc, b, be in _walk_boxes(data, mb, me):
            if cc == b"mvhd":
                ver = data[b]
                if ver == 1:
                    ts = struct.unpack_from(">I", data, b + 20)[0]
                    dur = struct.unpack_from(">Q", data, b + 24)[0]
                else:
                    ts = struct.unpack_from(">I", data, b + 12)[0]
                    dur = struct.unpack_from(">I", data, b + 16)[0]
                if ts:
                    out["duration_ms"] = int(dur * 1000 / ts)
        for tb, te in _find_boxes(data, mb, me, [b"trak"]):
            track: dict = {}
            for sb, se in _find_boxes(
                data, tb, te, [b"mdia", b"minf", b"stbl"]
            ):
                for cc, b, be in _walk_boxes(data, sb, se):
                    if cc == b"stsd" and be - b >= 16:
                        # full box header (4) + entry_count (4), then
                        # the first sample entry: size(4) format(4)
                        fmt = bytes(data[b + 12:b + 16])
                        entry = b + 8
                        # video sample entry: 6 reserved + 2 data-ref
                        # + 16 predefined, then width/height u16
                        if be - entry >= 36:
                            w, h = struct.unpack_from(
                                ">HH", data, entry + 8 + 24
                            )
                            if w and h:
                                track.update(
                                    codec=fmt.decode(
                                        "ascii", "replace"
                                    ).strip(),
                                    width=w,
                                    height=h,
                                )
                    elif cc == b"stsz" and be - b >= 12:
                        track["n_samples"] = struct.unpack_from(
                            ">I", data, b + 8
                        )[0]
            for cc, b, be in _walk_boxes(data, tb, te):
                if cc == b"mdia":
                    for cc2, b2, be2 in _walk_boxes(data, b, be):
                        if cc2 == b"mdhd":
                            ver = data[b2]
                            if ver == 1:
                                ts = struct.unpack_from(">I", data, b2 + 20)[0]
                                dur = struct.unpack_from(">Q", data, b2 + 24)[0]
                            else:
                                ts = struct.unpack_from(">I", data, b2 + 12)[0]
                                dur = struct.unpack_from(">I", data, b2 + 16)[0]
                            if ts:
                                track["duration_ms"] = int(dur * 1000 / ts)
            if "width" in track:
                out["tracks"].append(track)
    return out
