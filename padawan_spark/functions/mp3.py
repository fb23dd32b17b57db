"""MPEG audio (MP3) frame-level parsing, dependency-free.

Real audio corpora are dominated by MPEG-1/2 Layer III streams.  Full
PCM synthesis needs the ISO 11172-3 polyphase window tables — numeric
constants with no closed form, so a from-scratch implementation could
not be honestly verified in this container (no reference decoder
installed); synthesis therefore stays gated behind soundfile/ffmpeg
with an explicit ``NotImplementedError``.  What a 100 TB training
pipeline needs FIRST, however, is the frame walk: duration, bitrate
mode, sample rate, and channel layout for billions of blobs — all
spec-exact from the 4-byte frame headers alone, implemented here from
the public ISO 11172-3 / 13818-3 header tables.

``scan_mp3_py`` walks every frame header (skipping ID3v2/ID3v1 tags and
the Xing/Info VBR tag frame), deriving CBR/VBR, average bitrate, and
sample-accurate duration.  Cost is O(n_frames) header taps per blob —
no entropy data is read — and the driving ``mapInPandas`` pass is
embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

import struct

# bitrate tables in kbit/s, index 1..14 (0 = free format, 15 = invalid)
_BITRATES = {
    # (mpeg1?, layer): row
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
             384, 416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320),
    (0, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256),
    (0, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
    (0, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160),
}
_RATES = {3: (44100, 48000, 32000),       # MPEG-1
          2: (22050, 24000, 16000),       # MPEG-2
          0: (11025, 12000, 8000)}        # MPEG-2.5


def _parse_header(h: int):
    """Decode a 32-bit frame header; returns ``(version_bits, layer,
    bitrate_kbps, sample_rate, padding, channels, samples, frame_len)``
    or None if not a valid header."""
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver = (h >> 19) & 3                   # 0=2.5, 1=reserved, 2=v2, 3=v1
    layer_bits = (h >> 17) & 3            # 1=III, 2=II, 3=I
    if ver == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits                # 1, 2, 3
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None                       # free-format unsupported
    mpeg1 = 1 if ver == 3 else 0
    bitrate = _BITRATES[(mpeg1, layer)][br_idx]
    rate = _RATES[ver][sr_idx]
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    channels = 1 if mode == 3 else 2
    if layer == 1:
        samples = 384
        flen = (12 * bitrate * 1000 // rate + padding) * 4
    elif layer == 2:
        samples = 1152
        flen = 144 * bitrate * 1000 // rate + padding
    else:
        samples = 1152 if mpeg1 else 576
        flen = (samples // 8) * bitrate * 1000 // rate + padding
    return ver, layer, bitrate, rate, padding, channels, samples, flen


def _side_info_len(ver: int, channels: int) -> int:
    if ver == 3:                          # MPEG-1
        return 17 if channels == 1 else 32
    return 9 if channels == 1 else 17     # MPEG-2 / 2.5


def scan_mp3_py(b: bytes):
    """Frame-walk an MPEG audio stream.  Returns ``(version, layer,
    sample_rate, channels, n_frames, duration_ms, bitrate_kbps, vbr,
    id3v2)`` where ``n_frames``/``duration_ms`` exclude the Xing/Info
    tag frame and ``bitrate_kbps`` is the audio-frame average
    (CBR → the nominal rate; ``vbr`` is True when frame headers carry
    more than one bitrate OR an explicit Xing tag is present)."""
    pos, end = 0, len(b)
    id3v2 = False
    if b[:3] == b"ID3" and end >= 10:
        sz = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        pos = 10 + sz + (10 if b[5] & 0x10 else 0)   # footer flag
        id3v2 = True
    if end >= 128 and b[end - 128:end - 125] == b"TAG":
        end -= 128                                   # ID3v1 trailer
    first = None
    n_frames = 0
    samples_total = 0
    bitrates = set()
    bitrate_sum = 0
    xing = False
    xing_frames = None
    while pos + 4 <= end:
        h = struct.unpack_from(">I", b, pos)[0]
        parsed = _parse_header(h)
        if parsed is None:
            if first is None:
                pos += 1                  # resync before the first frame
                continue
            break                         # trailing garbage: stop
        ver, layer, bitrate, rate, _pad, channels, samples, flen = parsed
        if first is None:
            first = (ver, layer, rate, channels)
        elif (ver, layer, rate, channels) != first:
            break                         # stream parameter change: stop
        # Xing/Info tag lives in the first frame after the side info
        if n_frames == 0 and not xing:
            off = pos + 4 + _side_info_len(ver, channels)
            tag = b[off:off + 4]
            if tag in (b"Xing", b"Info"):
                flags = struct.unpack_from(">I", b, off + 4)[0]
                if tag == b"Xing":
                    xing = True
                if flags & 1:
                    xing_frames = struct.unpack_from(">I", b, off + 8)[0]
                pos += flen               # tag frame carries no audio
                continue
        n_frames += 1
        samples_total += samples
        bitrates.add(bitrate)
        bitrate_sum += bitrate
        pos += flen
    if first is None:
        raise NotImplementedError("no MPEG audio frame sync found")
    ver, layer, rate, channels = first
    version = {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}[ver]
    if xing_frames is not None and n_frames == 0:
        # header-only scan of a truncated stream: trust the tag
        n_frames = xing_frames
        samples_total = n_frames * (1152 if ver == 3 else 576)
    duration_ms = samples_total * 1000 // rate
    avg = bitrate_sum // max(n_frames, 1)
    return (version, layer, rate, channels, n_frames, duration_ms,
            avg, xing or len(bitrates) > 1, id3v2)


def encode_mp3_frames_py(n_frames: int, bitrate: int = 128,
                         sample_rate: int = 44100, channels: int = 2,
                         layer: int = 3, id3v2_bytes: int = 0,
                         xing: bool = False,
                         bitrate_seq=None) -> bytes:
    """Build a syntactically valid MPEG frame sequence for parser
    fixtures: correct headers with deterministic (non-audio) payload
    bytes.  ``bitrate_seq`` overrides per-frame bitrates (VBR fixture);
    ``xing`` prepends a Xing tag frame carrying the frame count.
    Fixture twin of :func:`scan_mp3_py` — NOT a psychoacoustic encoder
    (payloads are filler; only the frame walk is exercised)."""
    _SR_IDX = {44100: 0, 48000: 1, 32000: 2, 22050: 0, 24000: 1,
               16000: 2}
    mpeg1 = sample_rate in (44100, 48000, 32000)
    ver_bits = 3 if mpeg1 else 2
    layer_bits = 4 - layer
    row = _BITRATES[(1 if mpeg1 else 0, layer)]

    def frame(kbps: int, fill: int) -> bytes:
        br_idx = row.index(kbps)
        h = (0x7FF << 21) | (ver_bits << 19) | (layer_bits << 17) \
            | (1 << 16) | (br_idx << 12) | (_SR_IDX[sample_rate] << 10) \
            | ((3 if channels == 1 else 0) << 6)
        if layer == 1:
            flen = (12 * kbps * 1000 // sample_rate) * 4
        elif layer == 2:
            flen = 144 * kbps * 1000 // sample_rate
        else:
            spf = 1152 if mpeg1 else 576
            flen = (spf // 8) * kbps * 1000 // sample_rate
        body = bytes((fill + i * 7) % 256 for i in range(flen - 4))
        return struct.pack(">I", h) + body

    out = bytearray()
    if id3v2_bytes:
        sz = id3v2_bytes
        out += b"ID3\x04\x00\x00" + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F,
             sz & 0x7F]) + bytes(sz)
    if xing:
        f = bytearray(frame(bitrate, 0))
        off = 4 + _side_info_len(ver_bits, channels)
        f[off:off + 4] = b"Xing"
        f[off + 4:off + 8] = struct.pack(">I", 1)      # FRAMES flag
        f[off + 8:off + 12] = struct.pack(">I", n_frames)
        out += f
    seq = bitrate_seq if bitrate_seq is not None \
        else [bitrate] * n_frames
    for k, kbps in enumerate(seq):
        out += frame(kbps, k + 1)
    return bytes(out)


# ---------------------------------------------------------------------------
# Ogg container (RFC 3533) page walk: Vorbis/Opus corpus triage.
# Full Vorbis/Opus PCM synthesis stays env-gated (codebook decode needs
# a reference decoder to validate against), but duration/codec/channel
# metadata is spec-exact from the page structure + identification
# headers alone — the audio twin of the MP4 moov walk.
# ---------------------------------------------------------------------------

_OGG_CRC_TABLE = None


def _ogg_crc(data: bytes) -> int:
    """Ogg page CRC: CRC-32 poly 0x04C11DB7, non-reflected, init 0,
    xorout 0 (RFC 3533 appendix)."""
    global _OGG_CRC_TABLE
    if _OGG_CRC_TABLE is None:
        tbl = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 \
                    else (r << 1)
            tbl.append(r & 0xFFFFFFFF)
        _OGG_CRC_TABLE = tbl
    crc = 0
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[
            ((crc >> 24) & 0xFF) ^ byte]
    return crc


def _ogg_page(serial: int, seq: int, granule: int, body: bytes,
              header_type: int = 0) -> bytes:
    segs = []
    n = len(body)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)                        # final short (possibly 0) seg
    hdr = (b"OggS\x00" + bytes([header_type])
           + struct.pack("<q", granule) + struct.pack("<II", serial, seq)
           + b"\x00\x00\x00\x00" + bytes([len(segs)]) + bytes(segs))
    crc = _ogg_crc(hdr + body)
    hdr = hdr[:22] + struct.pack("<I", crc) + hdr[26:]
    return hdr + body


def encode_ogg_py(codec: str, sample_rate: int, channels: int,
                  n_samples: int, n_data_pages: int = 3,
                  serial: int = 0x1234) -> bytes:
    """Build a minimal spec-layout Ogg stream for parser fixtures: a
    BOS page carrying the codec identification header (Vorbis or
    Opus), dummy data pages with monotone granule positions, and an
    EOS page whose granule encodes the total duration.  Fixture twin
    of :func:`scan_ogg_py`; payload packets are filler — only the
    container walk is exercised."""
    if codec == "vorbis":
        ident = (b"\x01vorbis" + struct.pack("<I", 0)
                 + bytes([channels]) + struct.pack("<I", sample_rate)
                 + struct.pack("<iii", -1, 128000, -1) + b"\xb8\x01")
        final_granule = n_samples
    elif codec == "opus":
        pre_skip = 312
        ident = (b"OpusHead\x01" + bytes([channels])
                 + struct.pack("<H", pre_skip)
                 + struct.pack("<I", sample_rate)
                 + struct.pack("<h", 0) + b"\x00")
        final_granule = n_samples + pre_skip    # granule is 48 kHz + skip
    else:
        raise ValueError(f"unknown codec {codec!r}")
    out = bytearray(_ogg_page(serial, 0, 0, ident, header_type=2))
    for k in range(1, n_data_pages):
        g = final_granule * k // n_data_pages
        out += _ogg_page(serial, k, g,
                         bytes((serial + k + i) % 256
                               for i in range(40 + 7 * k)))
    out += _ogg_page(serial, n_data_pages, final_granule,
                     bytes(8), header_type=4)
    return bytes(out)


def scan_ogg_py(b: bytes):
    """Page-walk an Ogg stream (RFC 3533): CRC-verify every page,
    identify the codec from the BOS packet ("\\x01vorbis" /
    "OpusHead"), and derive duration from the final granule position
    (Vorbis: PCM samples at the id-header rate; Opus: 48 kHz samples
    minus pre-skip).  Returns ``(codec, sample_rate, channels,
    n_pages, duration_ms)``.  Cost is O(pages) header taps."""
    if b[:4] != b"OggS":
        raise NotImplementedError("no OggS capture pattern")
    pos = 0
    codec = None
    rate = channels = None
    pre_skip = 0
    last_granule = 0
    n_pages = 0
    while pos + 27 <= len(b):
        if b[pos:pos + 4] != b"OggS":
            raise NotImplementedError("Ogg page sync lost")
        nsegs = b[pos + 26]
        seg_table = b[pos + 27:pos + 27 + nsegs]
        body_len = sum(seg_table)
        page_end = pos + 27 + nsegs + body_len
        if page_end > len(b):
            raise NotImplementedError("truncated Ogg page")
        page = bytearray(b[pos:page_end])
        stored = struct.unpack_from("<I", page, 22)[0]
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != stored:
            raise NotImplementedError("Ogg page CRC mismatch")
        header_type = b[pos + 5]
        granule = struct.unpack_from("<q", b, pos + 6)[0]
        body = b[pos + 27 + nsegs:page_end]
        if header_type & 0x02:            # BOS: identification header
            if body[:7] == b"\x01vorbis":
                codec = "vorbis"
                channels = body[11]
                rate = struct.unpack_from("<I", body, 12)[0]
            elif body[:8] == b"OpusHead":
                codec = "opus"
                channels = body[9]
                pre_skip = struct.unpack_from("<H", body, 10)[0]
                rate = struct.unpack_from("<I", body, 12)[0]
            else:
                raise NotImplementedError(
                    "unrecognized Ogg codec (vorbis/opus only)")
        if granule >= 0:
            last_granule = max(last_granule, granule)
        n_pages += 1
        pos = page_end
    if codec is None:
        raise NotImplementedError("Ogg stream has no BOS page")
    if codec == "opus":
        # granules are 48 kHz regardless of the input rate
        duration_ms = max(last_granule - pre_skip, 0) * 1000 // 48000
    else:
        duration_ms = last_granule * 1000 // rate
    return codec, rate, channels, n_pages, duration_ms


# ---------------------------------------------------------------------------
# ID3v2 tag frames (informal standard id3.org, v2.3/v2.4): the audio
# twin of the EXIF walk — title/artist/album/year attribution metadata
# that a training pipeline carries alongside the payload.
# ---------------------------------------------------------------------------


def _id3_text(body: bytes) -> str:
    """Decode an ID3v2 text-information frame body: leading encoding
    byte (0 latin-1, 1 UTF-16 w/BOM, 2 UTF-16BE, 3 UTF-8), NUL-
    terminated."""
    if not body:
        return ""
    enc, data = body[0], body[1:]
    if enc == 0:
        s = data.decode("latin-1", "replace")
    elif enc == 1:
        s = data.decode("utf-16", "replace")
    elif enc == 2:
        s = data.decode("utf-16-be", "replace")
    elif enc == 3:
        s = data.decode("utf-8", "replace")
    else:
        raise NotImplementedError(f"ID3v2 text encoding {enc}")
    return s.split("\x00", 1)[0]


def parse_id3v2_py(b: bytes):
    """Walk the ID3v2.3/2.4 frame list at the head of an MPEG stream.
    Returns a dict of the common text frames (``title`` TIT2,
    ``artist`` TPE1, ``album`` TALB, ``year`` TYER/TDRC, ``track``
    TRCK, ``genre`` TCON) — missing frames absent.  O(tag) cost; the
    audio frames are never touched."""
    if b[:3] != b"ID3" or len(b) < 10:
        return {}
    ver = b[3]
    size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) \
        | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
    end = min(10 + size, len(b))
    pos = 10
    if b[5] & 0x40:                       # extended header present
        if ver >= 4:
            ext = ((b[pos] & 0x7F) << 21) | ((b[pos + 1] & 0x7F) << 14) \
                | ((b[pos + 2] & 0x7F) << 7) | (b[pos + 3] & 0x7F)
        else:
            ext = struct.unpack_from(">I", b, pos)[0] + 4
        pos += ext
    _MAP = {b"TIT2": "title", b"TPE1": "artist", b"TALB": "album",
            b"TYER": "year", b"TDRC": "year", b"TRCK": "track",
            b"TCON": "genre"}
    out: dict = {}
    while pos + 10 <= end:
        fid = b[pos:pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break                         # padding reached
        if ver >= 4:                      # v2.4: syncsafe frame sizes
            fsz = ((b[pos + 4] & 0x7F) << 21) \
                | ((b[pos + 5] & 0x7F) << 14) \
                | ((b[pos + 6] & 0x7F) << 7) | (b[pos + 7] & 0x7F)
        else:
            fsz = struct.unpack_from(">I", b, pos + 4)[0]
        body = b[pos + 10:pos + 10 + fsz]
        key = _MAP.get(fid)
        if key is not None and key not in out:
            out[key] = _id3_text(body)
        pos += 10 + fsz
    return out


def encode_id3v2_py(frames: dict, version: int = 3,
                    padding: int = 32) -> bytes:
    """Build an ID3v2.3/2.4 tag for fixtures (inverse of
    :func:`parse_id3v2_py`): text frames UTF-16 for v2.3 BOM coverage,
    UTF-8 for v2.4."""
    _MAP = {"title": b"TIT2", "artist": b"TPE1", "album": b"TALB",
            "track": b"TRCK", "genre": b"TCON",
            "year": b"TDRC" if version >= 4 else b"TYER"}
    body = bytearray()
    for key, val in frames.items():
        if version >= 4:
            payload = b"\x03" + val.encode("utf-8") + b"\x00"
        else:
            payload = b"\x01" + val.encode("utf-16") + b"\x00\x00"
        fid = _MAP[key]
        if version >= 4:
            sz = len(payload)
            szb = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                         (sz >> 7) & 0x7F, sz & 0x7F])
        else:
            szb = struct.pack(">I", len(payload))
        body += fid + szb + b"\x00\x00" + payload
    body += bytes(padding)
    sz = len(body)
    return (b"ID3" + bytes([version, 0, 0])
            + bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                     (sz >> 7) & 0x7F, sz & 0x7F]) + bytes(body))
