"""Clean-room media CONTAINER support (round 17).

The r16 verdict's remaining media gap: crawl-archive video is mostly
MP4/WebM/AVI (and audio FLAC/MP3/OGG), while full H.264/VP9/AV1/
lossy-audio decode is out of clean-room reach. The 100 TB pattern
this module implements is **triage before decode**: every container's
STRUCTURE parses from headers/tables alone, so a corpus groups by
codec/resolution/rate and routes each payload to the cheapest
sufficient path — vendored decode where one exists, external
pre-extraction otherwise — before any per-frame/per-sample work.

Decode routes (feed the vendored codecs, zero external deps):
- **AVI-MJPG**: a RIFF chunk tree whose ``00dc`` chunks are baseline
  JPEGs, WITH the container's own frame rate (``avih``) — the
  timing raw MJPEG lacks.
- **photo-JPEG MP4** (``jpeg``/``mjpa`` sample entries): samples
  resolve through the REAL addressing tables (stsz x stsc x
  stco/co64), each a standalone JPEG.

Metadata probes (typed triage, no decode):
- **MP4** ``moov`` box walk: codec fourcc, dimensions, duration,
  sample count. **WebM/Matroska** EBML walk: codec id, dimensions,
  duration. **WAV/FLAC/MP3/OGG** audio headers: codec, rate,
  channels, bits, duration. **PNG/JPEG/GIF/BMP/WebP** image headers:
  format + dimensions.

All parsers are offset walks over ``bytes`` — nothing proportional
to media size is materialized beyond offset lists — executor-local,
driven per-payload from the same mapInPandas samplers/probes as
Y4M/MJPEG (`multimodal.video_metadata` / `audio_metadata` /
`image_metadata` are the distributed entry points).

Reference: the blockchain reference (paradigmxyz/cryo) has no media
operators — this is §2.12 extension tier. Format layouts are public
specifications (AVI/RIFF: Microsoft "AVI RIFF File Reference"; MP4:
ISO/IEC 14496-12; Matroska/EBML, FLAC, MP3 frame headers, OGG/Vorbis
/Opus id headers, PNG/GIF/BMP/WebP: their published format docs).
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


# --------------------------------------------------------------------
# WebM / Matroska (EBML) — typed-metadata probe (no decode)

_EBML_MAGIC = b"\x1a\x45\xdf\xa3"


def is_webm(data: bytes | None) -> bool:
    return data is not None and bytes(data[:4]) == _EBML_MAGIC


def _read_vint(data: bytes, pos: int, keep_marker: bool):
    """(value, next_pos) for an EBML variable-length integer; element
    IDs keep the length-marker bit (that's how IDs are quoted in the
    spec), sizes strip it. Returns (None, pos) on truncation."""
    if pos >= len(data):
        return None, pos
    first = data[pos]
    if first == 0:
        return None, pos
    length = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        length += 1
    if pos + length > len(data):
        return None, pos
    if keep_marker:
        value = 0
        for i in range(length):
            value = (value << 8) | data[pos + i]
    else:
        value = first & (mask - 1)
        for i in range(1, length):
            value = (value << 8) | data[pos + i]
        if value == (1 << (7 * length)) - 1:
            value = -1  # "unknown size" (streamed segments)
    return value, pos + length


def _walk_ebml(data: bytes, start: int, end: int):
    """Yield (element_id, payload_start, payload_end). Unknown-size
    elements (live-streamed Segment) extend to the parent's end."""
    pos = start
    while pos < end:
        eid, p = _read_vint(data, pos, keep_marker=True)
        if eid is None:
            break
        size, p = _read_vint(data, p, keep_marker=False)
        if size is None:
            break
        pe = end if size == -1 else p + size
        if pe > end:
            break
        yield eid, p, pe
        pos = pe


_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMECODE_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA


def webm_metadata(data: bytes) -> dict:
    """Container metadata from the Matroska/WebM EBML tree, no frame
    decode: ``{'duration_ms', 'tracks': [{'codec', 'width',
    'height'}, ...]}`` for video tracks (codec like ``V_VP9`` /
    ``V_AV1``). Raises on a non-EBML payload."""
    if not is_webm(data):
        raise ValueError("not an EBML/Matroska payload")
    data = bytes(data)
    out: dict = {"duration_ms": None, "tracks": []}
    for eid, b, e in _walk_ebml(data, 0, len(data)):
        if eid != _SEGMENT:
            continue
        for eid2, b2, e2 in _walk_ebml(data, b, e):
            if eid2 == _INFO:
                scale = 1_000_000  # spec default: ns per timecode unit
                duration = None
                for eid3, b3, e3 in _walk_ebml(data, b2, e2):
                    if eid3 == _TIMECODE_SCALE:
                        scale = int.from_bytes(data[b3:e3], "big")
                    elif eid3 == _DURATION:
                        raw = data[b3:e3]
                        duration = struct.unpack(
                            ">f" if len(raw) == 4 else ">d", raw
                        )[0]
                if duration is not None and scale:
                    out["duration_ms"] = int(duration * scale / 1e6)
            elif eid2 == _TRACKS:
                for eid3, b3, e3 in _walk_ebml(data, b2, e2):
                    if eid3 != _TRACK_ENTRY:
                        continue
                    track: dict = {}
                    ttype = None
                    for eid4, b4, e4 in _walk_ebml(data, b3, e3):
                        if eid4 == _TRACK_TYPE:
                            ttype = int.from_bytes(data[b4:e4], "big")
                        elif eid4 == _CODEC_ID:
                            track["codec"] = (
                                data[b4:e4].decode("ascii", "replace")
                            )
                        elif eid4 == _VIDEO:
                            for eid5, b5, e5 in _walk_ebml(data, b4, e4):
                                if eid5 == _PIXEL_W:
                                    track["width"] = int.from_bytes(
                                        data[b5:e5], "big"
                                    )
                                elif eid5 == _PIXEL_H:
                                    track["height"] = int.from_bytes(
                                        data[b5:e5], "big"
                                    )
                    if ttype == 1 and "width" in track:  # 1 = video
                        out["tracks"].append(track)
    return out


# --------------------------------------------------------------------
# MJPG-in-MP4 — the DECODABLE MP4 subset (photo-JPEG tracks)

#: sample-entry fourccs whose samples are standalone JPEG images
_JPEG_SAMPLE_FORMATS = {b"jpeg", b"mjpa", b"mjpb", b"JPEG"}


def _stbl_spans(data: bytes):
    """(stbl_start, stbl_end) spans of every track, in file order."""
    spans = []
    for mb, me in _find_boxes(data, 0, len(data), [b"moov"]):
        for tb, te in _find_boxes(data, mb, me, [b"trak"]):
            for sb, se in _find_boxes(
                data, tb, te, [b"mdia", b"minf", b"stbl"]
            ):
                spans.append((sb, se))
    return spans


def mp4_sample_offsets(data: bytes, jpeg_only: bool = True) -> list[tuple[int, int]]:
    """(absolute_offset, length) of every sample of the FIRST track
    whose sample format is a JPEG family (``jpeg``/``mjpa``; the
    photo-JPEG MP4/MOV shape), resolved through the real sample
    tables: stsz sizes x stsc sample-to-chunk runs x stco/co64 chunk
    offsets. Empty when no such track exists (an H.264-class MP4 —
    structurally identifiable, not clean-room decodable).

    The walk is O(samples) ints; nothing proportional to media bytes
    is materialized."""
    if not is_mp4(data):
        return []
    data = bytes(data)
    for sb, se in _stbl_spans(data):
        fmt = None
        sizes: list[int] = []
        stsc: list[tuple[int, int]] = []
        chunk_offs: list[int] = []
        for cc, b, be in _walk_boxes(data, sb, se):
            if cc == b"stsd" and be - b >= 16:
                fmt = bytes(data[b + 12:b + 16])
            elif cc == b"stsz" and be - b >= 12:
                # every table read is bounds-guarded: a truncated or
                # lying count (malformed crawl files) yields "no
                # table" rather than a struct error
                fixed = struct.unpack_from(">I", data, b + 4)[0]
                count = struct.unpack_from(">I", data, b + 8)[0]
                if fixed:
                    sizes = [fixed] * count
                elif b + 12 + 4 * count <= be:
                    sizes = list(
                        struct.unpack_from(f">{count}I", data, b + 12)
                    )
            elif cc == b"stsc" and be - b >= 8:
                n = struct.unpack_from(">I", data, b + 4)[0]
                if b + 8 + 12 * n <= be:
                    for i in range(n):
                        first, per, _desc = struct.unpack_from(
                            ">III", data, b + 8 + 12 * i
                        )
                        stsc.append((first, per))
            elif cc == b"stco" and be - b >= 8:
                n = struct.unpack_from(">I", data, b + 4)[0]
                if b + 8 + 4 * n <= be:
                    chunk_offs = list(
                        struct.unpack_from(f">{n}I", data, b + 8)
                    )
            elif cc == b"co64" and be - b >= 8:
                n = struct.unpack_from(">I", data, b + 4)[0]
                if b + 8 + 8 * n <= be:
                    chunk_offs = list(
                        struct.unpack_from(f">{n}Q", data, b + 8)
                    )
        if jpeg_only and fmt not in _JPEG_SAMPLE_FORMATS:
            continue
        if not (sizes and stsc and chunk_offs):
            continue
        # expand stsc runs: entry i applies to chunks
        # [first_i, first_{i+1}) — the spec's run-length encoding
        out: list[tuple[int, int]] = []
        si = 0
        for i, (first, per) in enumerate(stsc):
            last = (
                stsc[i + 1][0] - 1 if i + 1 < len(stsc)
                else len(chunk_offs)
            )
            for chunk in range(first, last + 1):
                if chunk - 1 >= len(chunk_offs) or si >= len(sizes):
                    break
                pos = chunk_offs[chunk - 1]
                for _ in range(per):
                    if si >= len(sizes):
                        break
                    out.append((pos, sizes[si]))
                    pos += sizes[si]
                    si += 1
        return out
    return []


def encode_mp4_mjpeg(
    width: int, height: int, jpeg_frames: list[bytes], fps: float = 25.0
) -> bytes:
    """Minimal spec-shaped photo-JPEG MP4 writer (test/fixture twin of
    the sample-table walk): ftyp + mdat(samples) + moov(mvhd,
    trak(mdia(mdhd, minf(stbl(stsd 'jpeg', stts, stsc, stsz,
    stco))))). Two chunks when >=2 frames, so stsc/stco see a real
    multi-chunk layout."""
    if fps <= 0:
        raise ValueError(f"fps must be > 0, got {fps}")

    def box(fourcc: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + fourcc + payload

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    n = len(jpeg_frames)
    split = max(1, n - n // 2)  # chunk 1 gets ceil(n/2) samples
    c1, c2 = jpeg_frames[:split], jpeg_frames[split:]
    mdat_payload = b"".join(jpeg_frames)
    # absolute chunk offsets: mdat payload starts after ftyp + header
    base = len(ftyp) + 8
    offs = [base] + ([base + sum(len(f) for f in c1)] if c2 else [])

    timescale = 1000
    dur = int(n * timescale / fps)
    mvhd = box(b"mvhd", b"\x00" * 12 + struct.pack(">II", timescale, dur)
               + b"\x00" * 80)
    mdhd = box(b"mdhd", b"\x00" * 12 + struct.pack(">II", timescale, dur)
               + b"\x00" * 4)
    entry = (
        struct.pack(">I", 8 + 8 + 24 + 50) + b"jpeg"
        + b"\x00" * 24 + struct.pack(">HH", width, height) + b"\x00" * 46
    )
    stsd = box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)
    stts = box(b"stts", b"\x00" * 4 + struct.pack(
        ">III", 1, n, int(timescale / fps)
    ))
    stsc_entries = [(1, len(c1))] + ([(2, len(c2))] if c2 else [])
    stsc = box(b"stsc", b"\x00" * 4 + struct.pack(">I", len(stsc_entries))
               + b"".join(struct.pack(">III", f, p, 1)
                          for f, p in stsc_entries))
    stsz = box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, n)
               + b"".join(struct.pack(">I", len(f)) for f in jpeg_frames))
    stco = box(b"stco", b"\x00" * 4 + struct.pack(">I", len(offs))
               + b"".join(struct.pack(">I", o) for o in offs))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", mdhd + minf)
    trak = box(b"trak", mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + box(b"mdat", mdat_payload) + moov


# --------------------------------------------------------------------
# Audio containers — typed-metadata probes (WAV already DECODES via
# the stdlib parse in multimodal._decode_wav; these cover the rest of
# a crawl's audio column for triage)


def is_flac(data: bytes | None) -> bool:
    return data is not None and bytes(data[:4]) == b"fLaC"


def flac_streaminfo(data: bytes) -> dict:
    """STREAMINFO (mandatory first metadata block): sample rate,
    channels, bits per sample, total samples, duration. Raises on a
    non-FLAC payload or a missing/short STREAMINFO."""
    if not is_flac(data):
        raise ValueError("not a FLAC payload")
    data = bytes(data)
    pos = 4
    while pos + 4 <= len(data):
        hdr = data[pos]
        btype = hdr & 0x7F
        size = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = pos + 4
        if btype == 0:  # STREAMINFO
            if size < 34 or body + 34 > len(data):
                break
            packed = int.from_bytes(data[body + 10:body + 18], "big")
            sample_rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bits = ((packed >> 36) & 0x1F) + 1
            n_samples = packed & ((1 << 36) - 1)
            return {
                "sample_rate": sample_rate,
                "channels": channels,
                "bits_per_sample": bits,
                "n_samples": n_samples,
                "duration_ms": (
                    int(n_samples * 1000 / sample_rate)
                    if sample_rate else None
                ),
            }
        if hdr & 0x80:  # last-block flag and it wasn't STREAMINFO
            break
        pos = body + size
    raise ValueError("FLAC payload has no readable STREAMINFO")


_MP3_BITRATES_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
                      192, 224, 256, 320, 0)
_MP3_BITRATES_V2L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
                      128, 144, 160, 0)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}


def is_mp3(data: bytes | None) -> bool:
    if data is None or len(data) < 4:
        return False
    data = bytes(data)
    if data[:3] == b"ID3":
        return True
    return data[0] == 0xFF and (data[1] & 0xE0) == 0xE0


def mp3_info(data: bytes) -> dict:
    """First valid Layer-III frame header (after an optional ID3v2
    tag): sample rate, channels, bitrate, and a CBR duration estimate
    from the payload size — the triage numbers; VBR files carry an
    estimate, not ground truth (documented field). Raises when no
    frame header parses."""
    if data is None:
        raise ValueError("not an MP3 payload")
    data = bytes(data)
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        # synchsafe 28-bit size after the 10-byte tag header
        size = 0
        for b in data[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    end = min(len(data) - 4, pos + 64 * 1024)
    while pos <= end:
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            version = (data[pos + 1] >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=2.5
            layer = (data[pos + 1] >> 1) & 0x3    # 1 = Layer III
            br_i = (data[pos + 2] >> 4) & 0xF
            sr_i = (data[pos + 2] >> 2) & 0x3
            mode = (data[pos + 3] >> 6) & 0x3
            if layer == 1 and version in _MP3_RATES and sr_i < 3:
                table = (_MP3_BITRATES_V1L3 if version == 3
                         else _MP3_BITRATES_V2L3)
                kbps = table[br_i]
                rate = _MP3_RATES[version][sr_i]
                if kbps:
                    return {
                        "sample_rate": rate,
                        "channels": 1 if mode == 3 else 2,
                        "bitrate_kbps": kbps,
                        "duration_ms_est": int(
                            (len(data) - pos) * 8 / kbps
                        ),
                    }
        pos += 1
    raise ValueError("no MP3 Layer-III frame header found")


def is_ogg(data: bytes | None) -> bool:
    return data is not None and bytes(data[:4]) == b"OggS"


def ogg_info(data: bytes) -> dict:
    """Codec + sample rate from the first OGG page's identification
    header (Vorbis or Opus — the two crawl-relevant codecs). Raises
    on a non-OGG payload; unknown codecs report codec=None."""
    if not is_ogg(data):
        raise ValueError("not an OGG payload")
    data = bytes(data)
    if len(data) < 28:
        raise ValueError("OGG payload shorter than a page header")
    n_segs = data[26]
    body = 27 + n_segs
    page = data[body:body + 64]
    if page[:7] == b"\x01vorbis" and len(page) >= 16:
        return {
            "codec": "vorbis",
            "channels": page[11],
            "sample_rate": int.from_bytes(page[12:16], "little"),
        }
    if page[:8] == b"OpusHead" and len(page) >= 16:
        return {
            "codec": "opus",
            "channels": page[9],
            # OpusHead carries the ORIGINAL input rate; Opus itself
            # decodes at 48 kHz
            "sample_rate": int.from_bytes(page[12:16], "little"),
        }
    return {"codec": None, "channels": None, "sample_rate": None}


def is_wav(data: bytes | None) -> bool:
    return (
        data is not None
        and len(data) >= 12
        and bytes(data[:4]) == b"RIFF"
        and bytes(data[8:12]) == b"WAVE"
    )


def wav_info(data: bytes) -> dict:
    """Header-only WAV probe (fmt + data chunk sizes — no sample
    decode; the stdlib path in multimodal._decode_wav does the actual
    decoding): sample rate, channels, bits, duration. Raises on a
    non-WAV payload or a missing fmt chunk."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE payload")
    data = bytes(data)
    fmt = None
    data_size = None
    for fourcc, body, size in _walk_chunks(data, 12, len(data)):
        if fourcc == b"fmt " and size >= 16:
            _tag, channels, rate = struct.unpack_from("<HHI", data, body)
            bits = struct.unpack_from("<H", data, body + 14)[0]
            fmt = (channels, rate, bits)
        elif fourcc == b"data":
            data_size = size
    if fmt is None:
        raise ValueError("WAV payload has no fmt chunk")
    channels, rate, bits = fmt
    dur = None
    if data_size is not None and rate and channels and bits:
        dur = int(data_size * 1000 / (rate * channels * (bits // 8 or 1)))
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits_per_sample": bits,
        "duration_ms": dur,
    }


# --------------------------------------------------------------------
# Image formats — header-only dimension probes (PNG/JPEG additionally
# DECODE through the vendored codecs; GIF/BMP/WebP are triage-only)


def image_probe(data: bytes | None) -> dict | None:
    """{'format', 'width', 'height', 'decodable'} from the image
    header alone, or None for unrecognized bytes. ``decodable`` marks
    the vendored full-decode routes (PNG, baseline JPEG); GIF/BMP/
    WebP report dimensions for triage only. Never raises — malformed
    headers of a recognized magic return the format with None dims
    (crawl bytes lie)."""
    if data is None or len(data) < 10:
        return None
    data = bytes(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        out = {"format": "png", "width": None, "height": None,
               "decodable": True}
        if len(data) >= 24 and data[12:16] == b"IHDR":
            out["width"], out["height"] = struct.unpack_from(
                ">II", data, 16
            )
        return out
    if data[:3] == b"\xff\xd8\xff":
        out = {"format": "jpeg", "width": None, "height": None,
               "decodable": True}
        # walk segments to the first SOFn (the same marker discipline
        # as the MJPEG scanner: skip length-delimited segments whole)
        p = 2
        n = len(data)
        while p + 3 < n:
            if data[p] != 0xFF:
                break
            m = data[p + 1]
            if m == 0xFF:
                p += 1
                continue
            if m in (0xD8, 0xD9, 0x01) or 0xD0 <= m <= 0xD7:
                p += 2
                continue
            seglen = (data[p + 2] << 8) | data[p + 3]
            if seglen < 2:
                break
            if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
                if p + 9 < n:
                    out["height"], out["width"] = struct.unpack_from(
                        ">HH", data, p + 5
                    )
                    # only baseline/extended-sequential decode through
                    # the vendored codec; progressive etc. are
                    # dimension-probe only
                    out["decodable"] = m in (0xC0, 0xC1)
                break
            p += 2 + seglen
        return out
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", data, 6)
        return {"format": "gif", "width": w, "height": h,
                "decodable": False}
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = struct.unpack_from("<ii", data, 18)
        return {"format": "bmp", "width": abs(w), "height": abs(h),
                "decodable": False}
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        out = {"format": "webp", "width": None, "height": None,
               "decodable": False}
        kind = data[12:16]
        if kind == b"VP8X" and len(data) >= 30:
            out["width"] = 1 + int.from_bytes(data[24:27], "little")
            out["height"] = 1 + int.from_bytes(data[27:30], "little")
        elif kind == b"VP8 " and len(data) >= 30:
            out["width"] = (
                int.from_bytes(data[26:28], "little") & 0x3FFF
            )
            out["height"] = (
                int.from_bytes(data[28:30], "little") & 0x3FFF
            )
        elif kind == b"VP8L" and len(data) >= 25:
            bits = int.from_bytes(data[21:25], "little")
            out["width"] = (bits & 0x3FFF) + 1
            out["height"] = ((bits >> 14) & 0x3FFF) + 1
        return out
    return None
