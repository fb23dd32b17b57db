"""Real video containers, dependency-free: AVI (RIFF) and MP4 (ISO
base media / ISO 14496-12) parsing, MJPEG frame extraction, and the
matching fixture encoders.

Web/training corpora store video as compressed frames inside a
container; the container walk — not the codec — is what a 100 TB
metadata scan or frame-sampling pass spends its time navigating.  These
parsers implement the two dominant container layouts from their public
specs (the MSDN AVI RIFF layout; the ISO BMFF box grammar) and decode
Motion-JPEG frame payloads with the in-repo baseline JPEG decoder, so
frame sampling over MJPEG corpora runs for real in this container.
Compressed inter-frame codecs (H.264/VP9/AV1) still gate on PyAV — an
honest ``NotImplementedError``, not a fake.

Scale shape: every function here is a per-blob pure function driven
from Arrow-batched ``mapInPandas`` (see
:func:`padawan_spark.functions.multimodal.sample_video_frames` /
:func:`scan_video_containers`); embarrassingly parallel, zero shuffle.
Metadata scans touch only the header boxes (AVI ``hdrl`` / MP4
``moov``), never the sample payloads.

Reference parity: the reference engine has no media surface at all
(SURVEY.md §2 — its ``map`` operator is where users hang custom
decode); this module is part of the beyond-reference training-pipeline
surface the build plan calls for.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# AVI (RIFF) — layout per the public MSDN "AVI RIFF File Reference"
# ---------------------------------------------------------------------------


def encode_avi_mjpeg_py(width: int, height: int, jpeg_frames,
                        fps: int = 25) -> bytes:
    """Build a minimal standards-layout AVI wrapping Motion-JPEG
    frames: ``hdrl`` (avih + one ``vids``/``MJPG`` strl), ``movi`` with
    ``00dc`` chunks, and an ``idx1`` index.  Fixture/round-trip twin of
    :func:`decode_avi_py`."""
    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    n = len(jpeg_frames)
    max_sz = max((len(f) for f in jpeg_frames), default=0)
    avih = struct.pack("<14I", 1_000_000 // fps, max_sz * fps, 0,
                       0x10,            # AVIF_HASINDEX
                       n, 0, 1, max_sz, width, height, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIiI4H", b"vids", b"MJPG", 0, 0, 0,
                       0, 1, fps, 0, n, max_sz, -1, 0,
                       0, 0, width, height)
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    movi = lst(b"movi", movi_body)
    # idx1 offsets are relative to the 'movi' fourcc position (the
    # widely-implemented convention); first chunk header sits 4 bytes in
    idx, off = bytearray(), 4
    for f in jpeg_frames:
        idx += struct.pack("<4sIII", b"00dc", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    riff_body = (b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx)))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_py(b: bytes):
    """Parse an AVI: returns ``(width, height, fps_num, fps_den, codec,
    frames)`` where ``frames`` is the list of raw video chunk payloads
    for the first ``vids`` stream (JPEG bitstreams when codec is
    ``MJPG``).  Chunk-walks ``hdrl``/``movi``; ``idx1`` is not required
    (streaming-written files may omit it)."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise NotImplementedError("not a RIFF/AVI payload")
    width = height = None
    rate, scale, codec = None, None, ""
    vid_stream = None
    stream_no = [0]          # strh order across ALL strl lists
    cur_type = [None]        # fccType of the most recent strh
    frames = []

    def walk(pos, end):
        nonlocal width, height, rate, scale, codec, vid_stream
        while pos + 8 <= end:
            cid = b[pos:pos + 4]
            sz = struct.unpack_from("<I", b, pos + 4)[0]
            body_at = pos + 8
            if cid == b"LIST":
                walk(body_at + 4, body_at + sz)
            elif cid == b"strh":
                fcc_type, handler = struct.unpack_from("<4s4s", b, body_at)
                cur_type[0] = fcc_type
                if fcc_type == b"vids" and vid_stream is None:
                    vid_stream = stream_no[0]
                    scale, rate = struct.unpack_from("<II", b, body_at + 20)
                    codec = handler.strip(b"\x00 ").decode(
                        "ascii", "replace")
                stream_no[0] += 1
            elif cid == b"strf" and cur_type[0] == b"vids" \
                    and width is None:
                _sz, bw, bh = struct.unpack_from("<Iii", b, body_at)
                width, height = bw, abs(bh)
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db") \
                    and cid[:2].isdigit():
                if vid_stream is not None \
                        and int(cid[:2]) == vid_stream:
                    frames.append(b[body_at:body_at + sz])
            pos = body_at + sz + (sz & 1)

    walk(12, 8 + struct.unpack_from("<I", b, 4)[0])
    if width is None or vid_stream is None:
        raise NotImplementedError("AVI has no video (vids) stream")
    return width, height, rate or 25, scale or 1, codec, frames


def parse_avi_meta_py(b: bytes):
    """Header-only AVI metadata (reads ``hdrl``, never ``movi``):
    returns ``(width, height, fps_num, fps_den, codec, n_frames,
    duration_ms)``.  The scan cost is O(header) at any payload size —
    the shape a 100 TB container-metadata sweep needs."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise NotImplementedError("not a RIFF/AVI payload")
    total = [None]
    got = {}

    def walk_all(pos, end):
        while pos + 8 <= end:
            cid = b[pos:pos + 4]
            sz = struct.unpack_from("<I", b, pos + 4)[0]
            body_at = pos + 8
            if cid == b"LIST" and b[body_at:body_at + 4] == b"hdrl":
                walk_hdrl(body_at + 4, body_at + sz)
                return
            pos = body_at + sz + (sz & 1)

    def walk_hdrl(pos, end):
        while pos + 8 <= end:
            cid = b[pos:pos + 4]
            sz = struct.unpack_from("<I", b, pos + 4)[0]
            body_at = pos + 8
            if cid == b"LIST":
                walk_hdrl(body_at + 4, body_at + sz)
            elif cid == b"avih":
                total[0] = struct.unpack_from("<I", b, body_at + 16)[0]
            elif cid == b"strh":
                fcc_type, handler = struct.unpack_from("<4s4s", b, body_at)
                if fcc_type == b"vids" and "rate" not in got:
                    scale, rate = struct.unpack_from(
                        "<II", b, body_at + 20)
                    got["rate"], got["scale"] = rate, scale
                    got["codec"] = handler.strip(b"\x00 ").decode(
                        "ascii", "replace")
                    got["length"] = struct.unpack_from(
                        "<I", b, body_at + 32)[0]
                    got["await_strf"] = True
            elif cid == b"strf" and got.pop("await_strf", False):
                _sz, bw, bh = struct.unpack_from("<Iii", b, body_at)
                got["w"], got["h"] = bw, abs(bh)
            pos = body_at + sz + (sz & 1)

    walk_all(12, 8 + struct.unpack_from("<I", b, 4)[0])
    if "rate" not in got or "w" not in got:
        raise NotImplementedError("AVI hdrl has no video (vids) stream")
    n = total[0] if total[0] is not None else got["length"]
    dur_ms = (n * got["scale"] * 1000) // max(got["rate"], 1)
    return (got["w"], got["h"], got["rate"], got["scale"], got["codec"],
            n, dur_ms)


# ---------------------------------------------------------------------------
# MP4 / ISO base media file format (ISO/IEC 14496-12 box grammar)
# ---------------------------------------------------------------------------


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + body)


def encode_mp4_mjpeg_py(width: int, height: int, jpeg_frames,
                        fps: int = 25) -> bytes:
    """Build a minimal ISO-BMFF MP4 wrapping Motion-JPEG samples: one
    ``vide`` track with a ``jpeg`` sample entry, all samples in a
    single chunk (``stsc`` 1→n), explicit ``stsz`` sizes, and an
    ``stco`` offset pointing into ``mdat``.  Fixture/round-trip twin of
    :func:`parse_mp4_py` / :func:`extract_mp4_frames_py`."""
    timescale = fps * 100
    delta = 100
    n = len(jpeg_frames)
    dur = n * delta
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isom" + b"iso2")
    mdat_payload = b"".join(jpeg_frames)
    # mdat follows ftyp directly; stco needs the absolute payload offset
    mdat_off = len(ftyp) + 8
    mdat = _box(b"mdat", mdat_payload)

    matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                         0x40000000)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIIIiHHII", 0, 0, timescale, dur, 0x10000, 0x0100, 0, 0, 0)
        + matrix + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, dur) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0) + matrix
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, timescale, dur, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I4s", 0, b"vide")
                 + b"\x00" * 12 + b"VideoHandler\x00")
    entry = _box(b"jpeg", struct.pack(">6xH", 1) + b"\x00" * 16
                 + struct.pack(">HHIIIH", width, height, 0x480000,
                               0x480000, 0, 1)
                 + b"\x00" * 32 + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(f))
                            for f in jpeg_frames))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, mdat_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                 + _full(b"url ", 0, 1, b""))
    minf = _box(b"minf", _full(b"vmhd", 0, 1, struct.pack(">HHHH",
                                                          0, 0, 0, 0))
                + _box(b"dinf", dref) + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk_boxes(b: bytes, pos: int, end: int):
    """Yield ``(type, body_start, body_end)`` for each box in range."""
    while pos + 8 <= end:
        sz = struct.unpack_from(">I", b, pos)[0]
        btype = b[pos + 4:pos + 8]
        body = pos + 8
        if sz == 1:                       # 64-bit largesize
            sz = struct.unpack_from(">Q", b, pos + 8)[0]
            body = pos + 16
        elif sz == 0:                     # box extends to EOF
            sz = end - pos
        if sz < 8 or pos + sz > end:
            raise NotImplementedError("malformed MP4 box size")
        yield btype, body, pos + sz
        pos += sz


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf",
               b"edts", b"udta"}


def parse_mp4_py(b: bytes):
    """Header-only MP4 metadata: returns a dict with movie ``timescale``,
    ``duration`` (movie units), and per-track entries ``(handler, codec,
    width, height, n_samples, timescale, duration)``.  Touches only the
    ``moov`` tree — O(header) regardless of ``mdat`` size."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise NotImplementedError("not an ISO-BMFF (ftyp) payload")
    meta = {"timescale": None, "duration": None, "tracks": []}

    def walk(pos, end, track):
        for btype, body, bend in _walk_boxes(b, pos, end):
            if btype == b"moov":
                walk(body, bend, None)
            elif btype == b"trak":
                t = {"handler": None, "codec": None, "width": None,
                     "height": None, "n_samples": None,
                     "timescale": None, "duration": None}
                meta["tracks"].append(t)
                walk(body, bend, t)
            elif btype in _CONTAINERS:
                walk(body, bend, track)
            elif btype == b"mvhd":
                v = b[body]
                if v == 1:
                    ts, dur = struct.unpack_from(">IQ", b, body + 4 + 16)
                else:
                    ts, dur = struct.unpack_from(">II", b, body + 4 + 8)
                meta["timescale"], meta["duration"] = ts, dur
            elif btype == b"mdhd" and track is not None:
                v = b[body]
                if v == 1:
                    ts, dur = struct.unpack_from(">IQ", b, body + 4 + 16)
                else:
                    ts, dur = struct.unpack_from(">II", b, body + 4 + 8)
                track["timescale"], track["duration"] = ts, dur
            elif btype == b"hdlr" and track is not None:
                track["handler"] = b[body + 8:body + 12].decode(
                    "ascii", "replace")
            elif btype == b"stsd" and track is not None:
                entry_type = b[body + 12:body + 16]
                track["codec"] = entry_type.decode("ascii", "replace")
                if track.get("handler") in (None, "vide"):
                    w, h = struct.unpack_from(">HH", b, body + 40)
                    if w and h:
                        track["width"], track["height"] = w, h
            elif btype == b"stsz" and track is not None:
                track["n_samples"] = struct.unpack_from(
                    ">I", b, body + 8)[0]

    walk(0, len(b), None)
    if meta["timescale"] is None:
        raise NotImplementedError("MP4 missing moov/mvhd")
    return meta


def extract_mp4_frames_py(b: bytes):
    """Resolve the first video track's sample table (stsz sizes, stsc
    chunk map, stco offsets) to raw sample payloads.  Returns
    ``(width, height, codec, frames)``."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise NotImplementedError("not an ISO-BMFF (ftyp) payload")
    state = {}

    def walk(pos, end, in_video_trak):
        for btype, body, bend in _walk_boxes(b, pos, end):
            if btype == b"trak":
                t = {}
                walk(body, bend, t)
                if t.get("handler") == b"vide" and "sizes" not in state:
                    state.update(t)
            elif btype in _CONTAINERS or btype == b"moov":
                walk(body, bend, in_video_trak)
            elif in_video_trak is None:
                continue
            elif btype == b"hdlr":
                in_video_trak["handler"] = b[body + 8:body + 12]
            elif btype == b"stsd":
                in_video_trak["codec"] = b[body + 12:body + 16].decode(
                    "ascii", "replace")
                in_video_trak["width"], in_video_trak["height"] = \
                    struct.unpack_from(">HH", b, body + 40)
            elif btype == b"stsz":
                fixed, n = struct.unpack_from(">II", b, body + 4)
                if fixed:
                    in_video_trak["sizes"] = [fixed] * n
                else:
                    in_video_trak["sizes"] = list(struct.unpack_from(
                        f">{n}I", b, body + 12))
            elif btype == b"stsc":
                n = struct.unpack_from(">I", b, body + 4)[0]
                in_video_trak["stsc"] = [struct.unpack_from(
                    ">III", b, body + 8 + 12 * i) for i in range(n)]
            elif btype == b"stco":
                n = struct.unpack_from(">I", b, body + 4)[0]
                in_video_trak["stco"] = list(struct.unpack_from(
                    f">{n}I", b, body + 8))
            elif btype == b"co64":
                n = struct.unpack_from(">I", b, body + 4)[0]
                in_video_trak["stco"] = list(struct.unpack_from(
                    f">{n}Q", b, body + 8))

    walk(0, len(b), None)
    if "sizes" not in state or "stco" not in state:
        raise NotImplementedError("MP4 missing video sample tables")
    sizes, stco = state["sizes"], state["stco"]
    stsc = state.get("stsc") or [(1, len(sizes), 1)]
    # expand stsc runs into a per-chunk sample count
    per_chunk = []
    for i, (first, spc, _sdi) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(stco)
        per_chunk += [spc] * (last - first + 1)
    frames, si = [], 0
    for ci, coff in enumerate(stco):
        off = coff
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(sizes):
                break
            frames.append(b[off:off + sizes[si]])
            off += sizes[si]
            si += 1
    return state.get("width"), state.get("height"), \
        state.get("codec", ""), frames


# ---------------------------------------------------------------------------
# Subtitle / caption formats: SRT and WebVTT cue parsing.  Captions are
# the aligned-text channel of a video corpus — the part a multimodal
# training pipeline actually trains on — and both formats are plain
# text with a fully-specified cue grammar.
# ---------------------------------------------------------------------------


def _ts_ms(ts: str) -> int:
    """``HH:MM:SS,mmm`` (SRT) or ``[HH:]MM:SS.mmm`` (WebVTT) -> ms."""
    ts = ts.strip().replace(",", ".")
    parts = ts.split(":")
    if len(parts) == 2:
        parts = ["0"] + parts
    h, m = int(parts[0]), int(parts[1])
    sec, _, frac = parts[2].partition(".")
    ms = int((frac + "000")[:3]) if frac else 0
    return ((h * 60 + m) * 60 + int(sec)) * 1000 + ms


def parse_subtitles_py(b: bytes):
    """Parse SRT or WebVTT caption payloads into cue tuples
    ``(cue_idx, start_ms, end_ms, text)`` (0-based cue order; text
    lines joined with ``\\n``).  WebVTT ``NOTE``/``STYLE`` blocks and
    cue-settings after the timing line are skipped per spec; SRT
    numeric counters are validated as present but the emitted index is
    positional.  O(bytes) per blob."""
    text = b.decode("utf-8-sig", "replace")
    lines = text.splitlines()
    is_vtt = bool(lines) and lines[0].strip().startswith("WEBVTT")
    if not is_vtt and "-->" not in text:
        raise NotImplementedError("neither WebVTT header nor SRT cues")
    cues = []
    i = 1 if is_vtt else 0
    while i < len(lines):
        line = lines[i].strip()
        if not line:
            i += 1
            continue
        if is_vtt and (line.startswith("NOTE")
                       or line.startswith("STYLE")
                       or line.startswith("REGION")):
            i += 1
            while i < len(lines) and lines[i].strip():
                i += 1
            continue
        # optional SRT counter / VTT cue id on the line before timing
        if "-->" not in line:
            i += 1
            if i >= len(lines) or "-->" not in lines[i]:
                raise NotImplementedError(
                    f"cue header without a timing line: {line!r}")
            line = lines[i].strip()
        start_s, _, rest = line.partition("-->")
        end_s = rest.strip().split(None, 1)[0]      # drop cue settings
        i += 1
        body = []
        while i < len(lines) and lines[i].strip():
            body.append(lines[i].rstrip())
            i += 1
        cues.append((len(cues), _ts_ms(start_s), _ts_ms(end_s),
                     "\n".join(body)))
    return cues


def encode_srt_py(cues) -> bytes:
    """Render ``(start_ms, end_ms, text)`` cues as SRT (fixture twin
    of :func:`parse_subtitles_py`)."""
    def ts(ms):
        h, rem = divmod(ms, 3600000)
        m, rem = divmod(rem, 60000)
        s, ms = divmod(rem, 1000)
        return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"
    out = []
    for k, (a, z, txt) in enumerate(cues):
        out.append(f"{k + 1}\n{ts(a)} --> {ts(z)}\n{txt}\n")
    return "\n".join(out).encode("utf-8")


def encode_vtt_py(cues) -> bytes:
    """Render cues as WebVTT, with a NOTE block and per-cue settings
    so the parser's skip paths are exercised."""
    def ts(ms):
        h, rem = divmod(ms, 3600000)
        m, rem = divmod(rem, 60000)
        s, ms = divmod(rem, 1000)
        return f"{h:02d}:{m:02d}:{s:02d}.{ms:03d}"
    out = ["WEBVTT", "", "NOTE", "generated fixture", ""]
    for k, (a, z, txt) in enumerate(cues):
        out.append(f"cue-{k}")
        out.append(f"{ts(a)} --> {ts(z)} align:start line:0")
        out.append(txt)
        out.append("")
    return "\n".join(out).encode("utf-8")
