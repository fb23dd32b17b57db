"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

Convention (what a 100 TB multimodal corpus table looks like here):

    doc_id bigint, payload binary, media_type string,
    meta struct<width:int, height:int, channels:int, duration_ms:bigint>

The Spark-side plumbing — schemas, batch iteration, partition-parallel
UDF signatures — is real and tested.  All three modalities DECODE FOR
REAL in every environment via dependency-free ``struct``-unpack codecs
for the standard uncompressed containers, each oracle-checked
end-to-end by a position-weighted checksum the oracle recomputes from
the pixel/sample formula:

- image: 24bpp BMP (:func:`decode_bmp_py`, query ``mm_real_decode``);
  PIL takes priority when installed (any format);
- audio: PCM WAV (:func:`decode_wav_py`, ``mm_real_audio_decode``);
  soundfile takes priority when installed;
- video: YUV4MPEG2 frame sampling (:func:`decode_y4m_py`,
  ``mm_real_video_frames``); PyAV takes priority when installed.

COMPRESSED images also decode for real, dependency-free: PNG
(:func:`decode_png_py` — stdlib-zlib inflate, all five scanline
filters, every color type incl. palette, 8/16-bit, Adam7) and GIF
(:func:`decode_gif_py` — variable-code-size LZW, color tables, row
interlace), both exercised by ``mm_real_png_decode`` /
``mm_real_gif_decode``.  Other compressed formats (jpeg/mp3/h264/...)
still require the real library and raise ``NotImplementedError``
without it; the deterministic ``fake_decode_image`` additionally
stands in where format-agnostic plumbing tests need it.

Scale notes: decode/resize/feature-extract are embarrassingly parallel
per row; ``mapInPandas`` keeps them JVM→Arrow→pandas batched (no
per-row Python overhead), and binary payloads never shuffle unless the
caller repartitions.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODED_SCHEMA = ("doc_id bigint, width int, height int, channels int, "
                  "n_bytes bigint")
FEATURE_SCHEMA = "doc_id bigint, features array<double>"


def _require_lib(name: str):
    try:
        return __import__(name)
    except ImportError as e:
        raise NotImplementedError(
            f"{name} is not available in this environment; real decode is "
            f"stubbed (plumbing is tested via fake_decode_image)") from e


# ---------------------------------------------------------------------------
# pure-Python uncompressed-BMP codec: a REAL decode path that needs no
# media library, so the image pipeline is executable (and oracle-
# checkable) in environments without PIL.  Handles the standard 24bpp
# uncompressed BITMAPINFOHEADER form, both bottom-up (positive height)
# and top-down (negative height) row orders, including 4-byte row
# padding.  PIL, when present, takes priority for every other format.
# ---------------------------------------------------------------------------


def decode_bmp_py(b: bytes):
    """Decode an uncompressed 24bpp BMP with plain ``struct`` unpacking.

    Returns ``(width, height, channels, pixels)`` where ``pixels`` is
    row-major TOP-DOWN BGR bytes (padding stripped, bottom-up storage
    re-ordered) — the canonical layout downstream checksums/features
    consume."""
    import struct
    if b[:2] != b"BM":
        raise NotImplementedError(
            "not a BMP payload and PIL is unavailable; only uncompressed "
            "24bpp BMP decodes without a media library")
    data_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"pure-Python BMP decode supports uncompressed 24bpp only "
            f"(got bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3          # rows pad to 4-byte boundaries
    rows = []
    for y in range(h):
        src_y = y if top_down else h - 1 - y
        off = data_off + src_y * stride
        rows.append(b[off:off + w * 3])
    return w, h, 3, b"".join(rows)


def encode_bmp_py(width: int, height: int, pixels: bytes,
                  top_down: bool = False) -> bytes:
    """Encode row-major top-down BGR bytes as an uncompressed 24bpp BMP
    (the inverse of :func:`decode_bmp_py`; used to synthesize fixture
    payloads and round-trip-test the decoder)."""
    import struct
    stride = (width * 3 + 3) & ~3
    body = bytearray()
    order = range(height) if top_down else range(height - 1, -1, -1)
    for y in order:
        row = pixels[y * width * 3:(y + 1) * width * 3]
        body += row + b"\x00" * (stride - len(row))
    data_off = 14 + 40
    size = data_off + len(body)
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, width,
                       -height if top_down else height,
                       1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + info + bytes(body)


# ---------------------------------------------------------------------------
# pure-Python PNG codec: the first COMPRESSED format that decodes for
# real without a media library — stdlib ``zlib`` inflates the IDAT
# stream and the per-row scanline filters (None/Sub/Up/Average/Paeth)
# are undone byte-wise per the PNG spec.  8-bit greyscale / RGB / RGBA
# plus palette (color type 3) at 1/2/4/8-bit depth with PLTE lookup,
# non-interlaced.  PIL, when present, takes priority for every other
# form (16-bit, interlaced).
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# Adam7 interlace passes: (x_start, y_start, x_step, y_step), in the
# order their sub-images appear in the IDAT stream
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]

#        color type -> bit depths the pure decoder handles
_PNG_DEPTHS = {0: (8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16),
               6: (8, 16)}


def decode_png_py(b: bytes):
    """Decode a PNG: grey / RGB / grey+alpha / RGBA at 8 or 16 bit,
    palette (color type 3) at 1/2/4/8 bit, sequential or Adam7
    interlaced.

    Returns ``(width, height, channels, pixels)`` with ``pixels`` as
    row-major top-down 8-bit bytes in the source channel order (16-bit
    samples are reduced to their most-significant byte, PIL-style).
    Palette images come back already looked up through PLTE as
    ``channels=3`` RGB — the palette is a color encoding, not a
    channel layout, so the caller always sees real colors."""
    import struct
    import zlib
    if b[:8] != _PNG_MAGIC:
        raise NotImplementedError(
            "not a PNG payload and PIL is unavailable")
    pos, w, h, ch, idat = 8, None, None, None, bytearray()
    depth, color, ilace, plte = 8, None, 0, None
    while pos + 8 <= len(b):
        ln, typ = struct.unpack_from(">I4s", b, pos)
        data = b[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", data)
            if (ilace not in (0, 1) or color not in _PNG_DEPTHS
                    or depth not in _PNG_DEPTHS[color]):
                raise NotImplementedError(
                    f"pure-Python PNG decode supports 8/16-bit "
                    f"grey/RGB/grey+alpha/RGBA and 1/2/4/8-bit palette, "
                    f"sequential or Adam7 (depth={depth}, color={color}, "
                    f"interlace={ilace})")
            ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    # the filter "left" offset is a whole pixel rounded up to one byte
    # (bpp); sub-byte palette rows pack several pixels per byte
    bpp = max(1, (ch * depth + 7) // 8)
    per, mask = (8 // depth if depth < 8 else 1), (1 << depth) - 1

    def read_subimage(pw, ph, p):
        """Unfilter a ``pw`` x ``ph`` sub-image starting at ``raw[p]``;
        returns (rows of 8-bit channel samples, new offset).  Empty
        passes contribute no bytes (Adam7 rule)."""
        if pw == 0 or ph == 0:
            return [], p
        stride = (pw * ch * depth + 7) // 8
        rows, prev = [], bytearray(stride)
        for _y in range(ph):
            f = raw[p]
            row = bytearray(raw[p + 1:p + 1 + stride])
            p += 1 + stride
            if f == 1:                                   # Sub
                for i in range(bpp, stride):
                    row[i] = (row[i] + row[i - bpp]) & 0xFF
            elif f == 2:                                 # Up
                for i in range(stride):
                    row[i] = (row[i] + prev[i]) & 0xFF
            elif f == 3:                                 # Average
                for i in range(stride):
                    a = row[i - bpp] if i >= bpp else 0
                    row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif f == 4:                                 # Paeth
                for i in range(stride):
                    a = row[i - bpp] if i >= bpp else 0
                    up = prev[i]
                    c = prev[i - bpp] if i >= bpp else 0
                    pa, pb = abs(up - c), abs(a - c)
                    pc = abs(a + up - 2 * c)
                    row[i] = (row[i] + (a if pa <= pb and pa <= pc
                                        else up if pb <= pc else c)) & 0xFF
            elif f != 0:
                raise NotImplementedError(f"PNG scanline filter {f}")
            prev = row
            # normalize the unfiltered row to pw*ch 8-bit samples
            if depth == 8:
                rows.append(bytes(row[:pw * ch]))
            elif depth == 16:                   # keep the high byte
                rows.append(bytes(row[0:2 * pw * ch:2]))
            else:                               # sub-byte palette indices
                rows.append(bytes(
                    (row[x // per] >> (8 - depth * (x % per + 1))) & mask
                    for x in range(pw)))
        return rows, p

    if ilace == 0:
        rows, _p = read_subimage(w, h, 0)
        flat = b"".join(rows)
    else:
        out = bytearray(w * h * ch)
        p = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = max(0, (w - x0 + dx - 1) // dx)
            ph = max(0, (h - y0 + dy - 1) // dy)
            rows, p = read_subimage(pw, ph, p)
            for ry, srow in enumerate(rows):
                y = y0 + ry * dy
                for rx in range(pw):
                    o = (y * w + (x0 + rx * dx)) * ch
                    out[o:o + ch] = srow[rx * ch:(rx + 1) * ch]
        flat = bytes(out)
    if color == 3:
        if plte is None or len(plte) % 3:
            raise NotImplementedError("palette PNG missing a valid PLTE")
        rgb = bytearray(w * h * 3)
        for i, idx in enumerate(flat):
            j = 3 * idx
            if j + 3 > len(plte):
                raise NotImplementedError(
                    f"palette index {idx} outside PLTE")
            rgb[3 * i:3 * i + 3] = plte[j:j + 3]
        return w, h, 3, bytes(rgb)
    return w, h, ch, flat


def encode_png_py(width: int, height: int, pixels: bytes,
                  channels: int = 3,
                  row_filters: tuple[int, ...] = (0,),
                  palette: bytes | None = None,
                  depth: int = 8,
                  interlace: bool = False) -> bytes:
    """Encode row-major top-down bytes as a PNG, cycling
    ``row_filters`` across scanlines (the inverse of
    :func:`decode_png_py`; passing all five filter types makes a
    fixture that exercises every unfilter path).

    With ``palette`` (flat RGB triples), ``pixels`` are palette
    INDICES — one per pixel — written as color type 3 at ``depth``
    bits (1/2/4/8, MSB-first packing).  Otherwise grey / grey+alpha /
    RGB / RGBA per ``channels`` at ``depth`` 8 or 16 (16-bit samples
    are big-endian pairs in ``pixels``).  ``interlace=True`` writes the
    seven Adam7 passes; ``row_filters`` then cycles across the pass
    rows in stream order."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    if palette is not None:
        color, ch = 3, 1
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"palette depth must be 1/2/4/8, got {depth}")
    else:
        color, ch = {1: 0, 2: 4, 3: 2, 4: 6}[channels], channels
        if depth not in (8, 16):
            raise ValueError(f"non-palette depth must be 8/16, got {depth}")
    bpp = max(1, (ch * depth + 7) // 8)
    unit = ch * (2 if depth == 16 else 1)   # source bytes per pixel

    def pack_row(xs, y):
        """Pixels at (x in xs, y) packed to wire format at ``depth``."""
        if palette is not None:
            vals = [pixels[y * width + x] & ((1 << depth) - 1) for x in xs]
            if depth == 8:
                return bytes(vals)
            rb = bytearray((len(xs) * depth + 7) // 8)
            for i, v in enumerate(vals):
                bit = i * depth
                rb[bit // 8] |= v << (8 - depth - bit % 8)
            return bytes(rb)
        return b"".join(pixels[(y * width + x) * unit:
                               (y * width + x) * unit + unit] for x in xs)

    if interlace:
        passes = [(list(range(x0, width, dx)), list(range(y0, height, dy)))
                  for x0, y0, dx, dy in _ADAM7]
        passes = [(xs, ys) for xs, ys in passes if xs and ys]
    else:
        passes = [(list(range(width)), list(range(height)))]

    raw, fi = bytearray(), 0
    for xs, ys in passes:
        stride = (len(xs) * ch * depth + 7) // 8
        prev = bytes(stride)
        for y in ys:
            row = pack_row(xs, y)
            f = row_filters[fi % len(row_filters)]
            fi += 1
            enc = bytearray(stride)
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                up = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = up
                elif f == 3:
                    pred = (a + up) >> 1
                else:
                    pa, pb = abs(up - c), abs(a - c)
                    pc = abs(a + up - 2 * c)
                    pred = (a if pa <= pb and pa <= pc
                            else up if pb <= pc else c)
                enc[i] = (row[i] - pred) & 0xFF
            raw.append(f)
            raw += enc
            prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0,
                       1 if interlace else 0)
    out = _PNG_MAGIC + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette))
    return (out + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# pure-Python GIF codec: the second COMPRESSED format that decodes for
# real without a media library — variable-code-size LZW (clear/EOI
# codes, KwKwK case, 12-bit dictionary cap with mid-stream resets),
# global/local color tables, and the 4-pass GIF row interlace.  The
# first frame decodes to RGB; GIF is lossless, so fixtures round-trip
# exactly and the DuckDB oracle recomputes checksums from the palette +
# index formulas alone.
# ---------------------------------------------------------------------------

_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))   # (first row, step)


def _lzw_decode_gif(mcs: int, data: bytes, expected: int) -> bytes:
    """GIF-flavor LZW: codes are read LSB-first at a variable width that
    grows when the next-to-assign index reaches the width's capacity
    (and caps at 12 bits until a clear code resets the dictionary)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1

    def fresh():
        return ([bytes([i]) for i in range(1 << mcs)] + [b"", b""],
                mcs + 1)

    table, csize = fresh()
    out, prev, bitpos, nbits = bytearray(), None, 0, len(data) * 8
    while bitpos + csize <= nbits and len(out) < expected:
        i = bitpos >> 3
        code = ((int.from_bytes(data[i:i + 3], "little")
                 >> (bitpos & 7)) & ((1 << csize) - 1))
        bitpos += csize
        if code == clear:
            table, csize = fresh()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:                       # first code after clear
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]            # the KwKwK case
            table.append(entry)
        else:
            raise NotImplementedError(
                f"corrupt GIF LZW stream: code {code} beyond dictionary")
        out += entry
        prev = entry
        if len(table) >= (1 << csize) and csize < 12:
            csize += 1
    return bytes(out[:expected])


def _lzw_encode_gif(mcs: int, data: bytes) -> bytes:
    """Inverse of :func:`_lzw_decode_gif` (emit before add, grow after
    add, clear + reset when the dictionary hits 4096)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    res, acc, accbits = bytearray(), 0, 0

    def emit(code, width):
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            res.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(1 << mcs)}, eoi + 1, mcs + 1

    table, nxt, csize = fresh()
    emit(clear, csize)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w], csize)
        if nxt == 4096:
            emit(clear, csize)
            table, nxt, csize = fresh()
        else:
            table[wc] = nxt
            nxt += 1
            # the decoder's table lags one entry behind (it appends on
            # the NEXT code), so its width check `len >= 1<<csize` after
            # code t equals this `nxt > 1<<csize` after code t — strict
            # inequality keeps the two streams bit-aligned
            if nxt > (1 << csize) and csize < 12:
                csize += 1
        w = wc[-1:]
    if w:
        emit(table[w], csize)
    emit(eoi, csize)
    if accbits:
        res.append(acc & 0xFF)
    return bytes(res)


def decode_gif_py(b: bytes):
    """Decode the FIRST frame of a GIF87a/GIF89a.

    Returns ``(width, height, 3, rgb)`` for the first image descriptor
    — LZW-decompressed, de-interlaced when the frame is interlaced, and
    looked up through its (local-over-global) color table.  Extensions
    (GCE/comment/application) are skipped; animation beyond frame one
    is out of scope for corpus feature extraction."""
    import struct
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError(
            "not a GIF payload and PIL is unavailable")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = b[pos:pos + 3 * n]
        pos += 3 * n
    while pos < len(b):
        blk = b[pos]
        pos += 1
        if blk == 0x3B:                        # trailer
            break
        if blk == 0x21:                        # extension: skip sub-blocks
            pos += 1                           # label
            while b[pos]:
                pos += 1 + b[pos]
            pos += 1
            continue
        if blk != 0x2C:
            raise NotImplementedError(f"unknown GIF block 0x{blk:02x}")
        _lx, _ty, fw, fh, fp = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        ct = gct
        if fp & 0x80:                          # local color table wins
            n = 2 << (fp & 7)
            ct = b[pos:pos + 3 * n]
            pos += 3 * n
        if ct is None:
            raise NotImplementedError("GIF frame has no color table")
        mcs = b[pos]
        pos += 1
        lzw = bytearray()
        while b[pos]:
            ln = b[pos]
            lzw += b[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode_gif(mcs, bytes(lzw), fw * fh)
        if len(idx) < fw * fh:
            raise NotImplementedError(
                f"GIF LZW stream ended early ({len(idx)}/{fw * fh} px)")
        if fp & 0x40:                          # 4-pass row interlace
            rows = [None] * fh
            src = 0
            for first, step in _GIF_PASSES:
                for y in range(first, fh, step):
                    rows[y] = idx[src * fw:(src + 1) * fw]
                    src += 1
            idx = b"".join(rows)
        rgb = bytearray(fw * fh * 3)
        for i, k in enumerate(idx):
            j = 3 * k
            if j + 3 > len(ct):
                raise NotImplementedError(
                    f"GIF color index {k} outside color table")
            rgb[3 * i:3 * i + 3] = ct[j:j + 3]
        return fw, fh, 3, bytes(rgb)
    raise NotImplementedError("GIF contains no image descriptor")


def encode_gif_py(width: int, height: int, indices: bytes,
                  palette: bytes, interlace: bool = False) -> bytes:
    """Encode palette indices as a single-frame GIF89a (the inverse of
    :func:`decode_gif_py`): global color table (power-of-two entries),
    real variable-code-size LZW, optional 4-pass interlace."""
    import struct
    ncol = len(palette) // 3
    bits = max(1, (ncol - 1).bit_length())
    if ncol != (1 << bits) or not (2 <= ncol <= 256):
        raise ValueError(
            f"GIF palette must have a power-of-two entry count in "
            f"[2, 256], got {ncol}")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height,
                       0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += palette
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height,
                       0x40 if interlace else 0)
    if interlace:
        rows = []
        for first, step in _GIF_PASSES:
            for y in range(first, height, step):
                rows.append(indices[y * width:(y + 1) * width])
        indices = b"".join(rows)
    mcs = max(2, bits)
    out.append(mcs)
    lzw = _lzw_encode_gif(mcs, indices)
    for i in range(0, len(lzw), 255):
        part = lzw[i:i + 255]
        out.append(len(part))
        out += part
    out += b"\x00\x3B"
    return bytes(out)


def _decode_pixels_py(b: bytes):
    """Dependency-free decode dispatch -> ``(w, h, rgb_bytes)`` in
    row-major top-down RGB (grey replicated, alpha dropped — matching
    PIL's ``convert(\"RGB\")``)."""
    if b[:8] == _PNG_MAGIC:
        w, h, ch, px = decode_png_py(b)
        if ch == 1:
            px = bytes(v for v in px for _ in range(3))
        elif ch == 2:   # grey+alpha: replicate grey, drop alpha
            px = bytes(v for i in range(0, len(px), 2)
                       for v in (px[i], px[i], px[i]))
        elif ch == 4:
            px = b"".join(px[i:i + 3] for i in range(0, len(px), 4))
        return w, h, px
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w, h, _c, px = decode_gif_py(b)   # already RGB via color table
        return w, h, px
    w, h, _c, bgr = decode_bmp_py(b)
    rgb = bytearray(len(bgr))
    rgb[0::3], rgb[1::3], rgb[2::3] = bgr[2::3], bgr[1::3], bgr[0::3]
    return w, h, bytes(rgb)


def decode_image(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """Real image decode: PIL when present (any format), else the
    pure-Python BMP parser — so a real decode runs in every
    environment.  Plumbing identical to fake_decode_image."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image as _Image
        except ImportError:
            _Image = None
        import io
        for pdf in it:
            out = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                if _Image is not None:
                    img = _Image.open(io.BytesIO(b))
                    out.append((i, img.width, img.height,
                                len(img.getbands()), len(b)))
                elif b[:8] == _PNG_MAGIC:
                    w, h, c, _px = decode_png_py(b)
                    out.append((i, w, h, c, len(b)))
                elif b[:6] in (b"GIF87a", b"GIF89a"):
                    w, h, c, _px = decode_gif_py(b)
                    out.append((i, w, h, c, len(b)))
                else:
                    w, h, c, _px = decode_bmp_py(b)
                    out.append((i, w, h, c, len(b)))
            yield pd.DataFrame(out, columns=["doc_id", "width", "height",
                                             "channels", "n_bytes"])

    return df.mapInPandas(batches, DECODED_SCHEMA)


DECODE_STATS_SCHEMA = ("doc_id bigint, width int, height int, channels int, "
                       "pix_checksum bigint")


def decode_image_pixels(df: DataFrame, payload_col: str = "payload",
                        id_col: str = "doc_id") -> DataFrame:
    """Decode images DOWN TO PIXELS and emit a position-weighted
    checksum: ``sum((idx + 1) * (r + 2g + 3b))`` over row-major
    top-down pixels.  The weight makes the checksum sensitive to pixel
    ORDER, so a decoder that mishandles BMP bottom-up storage or row
    padding produces a different value — this is the oracle-checkable
    proof that real decoding ran correctly.  PIL path and the
    pure-Python BMP path produce identical values by construction
    (both normalize to top-down RGB)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        try:
            from PIL import Image as _Image
        except ImportError:
            _Image = None
        import io
        for pdf in it:
            out = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                if _Image is not None:
                    img = _Image.open(io.BytesIO(b)).convert("RGB")
                    w, h = img.width, img.height
                    rgb = np.frombuffer(img.tobytes(), dtype=np.uint8)
                    rgb = rgb.reshape(-1, 3).astype(np.int64)
                else:
                    w, h, px = _decode_pixels_py(b)
                    rgb = (np.frombuffer(px, dtype=np.uint8)
                           .reshape(-1, 3).astype(np.int64))
                weights = np.arange(1, w * h + 1, dtype=np.int64)
                chk = int((weights * (rgb[:, 0] + 2 * rgb[:, 1]
                                      + 3 * rgb[:, 2])).sum())
                out.append((i, w, h, 3, chk))
            yield pd.DataFrame(out, columns=["doc_id", "width", "height",
                                             "channels", "pix_checksum"])

    return df.mapInPandas(batches, DECODE_STATS_SCHEMA)


def fake_decode_image(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in decoder: dimensions are pure arithmetic on
    the payload byte length, so results are oracle-checkable while the
    batch shapes / schema / partitioning match the real decoder."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf[payload_col].map(len)
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": (64 + n % 191).astype("int32"),
                "height": (64 + (n * 31) % 191).astype("int32"),
                "channels": pd.Series([3] * len(pdf)).astype("int32"),
                "n_bytes": n.astype("int64"),
            })

    return df.mapInPandas(batches, DECODED_SCHEMA)


def resize_image_py(b: bytes, width: int, height: int) -> bytes:
    """Dependency-free resize: decode (PNG/BMP via the pure-Python
    codecs), nearest-neighbor resample with numpy index arithmetic,
    re-encode as PNG.  PIL's default resampling is bicubic, so pixel
    VALUES differ between the two paths — dimensions and validity are
    the portable contract."""
    import numpy as np
    w, h, px = _decode_pixels_py(b)
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    out = arr[ys][:, xs]
    return encode_png_py(width, height, out.tobytes(), channels=3)


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload") -> DataFrame:
    """Resize every payload to ``width``x``height``, re-encoded as PNG;
    schema preserved.  PIL when installed (any format, bicubic), else
    the pure-Python nearest-neighbor path over the in-container codecs
    (PNG/BMP)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image as _Image
        except ImportError:
            _Image = None
        import io
        for pdf in it:
            def rz(b):
                b = bytes(b)
                if _Image is None:
                    return resize_image_py(b, width, height)
                img = _Image.open(io.BytesIO(b)).resize((width, height))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                return buf.getvalue()
            pdf = pdf.copy()
            pdf[payload_col] = pdf[payload_col].map(rz)
            yield pdf

    return df.mapInPandas(batches, df.schema)


def extract_image_features(df: DataFrame, payload_col: str = "payload",
                           id_col: str = "doc_id") -> DataFrame:
    """Deterministic byte-histogram features (16 buckets, L1-normalized):
    a real, library-free feature extractor shaped like an embedding UDF."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in it:
            feats = []
            for b in pdf[payload_col]:
                # vectorized: view bytes as uint8, bucket by high nibble
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16).astype("float64")
                feats.append(hist / max(1, arr.size))
            yield pd.DataFrame({"doc_id": pdf[id_col], "features": feats})

    return df.mapInPandas(batches, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# pure-Python WAV (RIFF/PCM) codec: same policy as BMP — the standard
# uncompressed container decodes with plain struct unpacking, so the
# audio pipeline executes (and is oracle-checkable) without soundfile/
# librosa.  Compressed formats still require the real library.
# ---------------------------------------------------------------------------


def decode_wav_py(b: bytes):
    """Decode an uncompressed PCM WAV (RIFF chunk walk; 16-bit LE).

    Returns ``(sample_rate, channels, bits, frames)`` where ``frames``
    is the interleaved int16 sample sequence as a list."""
    import struct
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError(
            "not a RIFF/WAVE payload and soundfile is unavailable; only "
            "uncompressed PCM WAV decodes without a media library")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        sz = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)          # chunks pad to even offsets
    if fmt is None or data is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"pure-Python WAV decode supports 16-bit PCM only "
            f"(got format={audio_format}, bits={bits})")
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[:2 * n]))
    return rate, channels, bits, samples


def encode_wav_py(samples, sample_rate: int, channels: int = 1) -> bytes:
    """Encode int16 samples as an uncompressed PCM WAV (inverse of
    :func:`decode_wav_py`; synthesizes fixtures and round-trip tests)."""
    import struct
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    out = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
           + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", len(data)) + data)
    return out


AUDIO_STATS_SCHEMA = ("doc_id bigint, sample_rate int, channels int, "
                      "bit_depth int, n_samples bigint, "
                      "sample_checksum bigint")


def decode_audio(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """Real audio decode: soundfile when present (any format), else the
    pure-Python PCM-WAV parser — emits header facts plus a
    position-weighted sample checksum ``sum((i + 1) * s_i)`` so a
    decoder that drops, reorders, or sign-flips samples is caught by
    the oracle.

    ``bit_depth`` reports the SOURCE encoding (the WAV fmt chunk /
    soundfile subtype), not the decoded representation; the checksum is
    over the decoded samples (int16 on the soundfile path, so a 24-bit
    source yields bit_depth=24 with an int16-converted checksum)."""

    _SF_BITS = {"PCM_S8": 8, "PCM_U8": 8, "PCM_16": 16, "PCM_24": 24,
                "PCM_32": 32, "FLOAT": 32, "DOUBLE": 64, "ALAW": 8,
                "ULAW": 8}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        try:
            import soundfile as _sf
        except ImportError:
            _sf = None
        import io
        for pdf in it:
            out = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                if _sf is not None:
                    info = _sf.info(io.BytesIO(b))
                    bits = _SF_BITS.get(info.subtype, 16)
                    data, rate = _sf.read(io.BytesIO(b), dtype="int16",
                                          always_2d=True)
                    ch = data.shape[1]
                    flat = data.reshape(-1).astype(np.int64)
                else:
                    rate, ch, bits, samples = decode_wav_py(b)
                    flat = np.asarray(samples, dtype=np.int64)
                wts = np.arange(1, flat.size + 1, dtype=np.int64)
                out.append((i, rate, ch, bits, flat.size // max(ch, 1),
                            int((wts * flat).sum())))
            yield pd.DataFrame(out, columns=[
                "doc_id", "sample_rate", "channels", "bit_depth",
                "n_samples", "sample_checksum"])

    return df.mapInPandas(batches, AUDIO_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# pure-Python Y4M (YUV4MPEG2) frame sampler: the uncompressed video
# container is a text header plus fixed-size raw frames, so frame
# sampling — the training-pipeline primitive — runs for real without
# ffmpeg.  Compressed codecs (h264/vp9) still require PyAV.
# ---------------------------------------------------------------------------


def decode_y4m_py(b: bytes):
    """Parse an uncompressed YUV4MPEG2 stream (C420, 8-bit).

    Returns ``(width, height, frames)`` where ``frames`` is a list of
    raw per-frame YUV bytes (Y plane w*h, then U and V at w/2*h/2)."""
    if b[:9] != b"YUV4MPEG2":
        raise NotImplementedError(
            "not a YUV4MPEG2 payload and PyAV is unavailable; only "
            "uncompressed Y4M decodes without a media library")
    nl = b.index(b"\n")
    w = h = None
    for tok in b[9:nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C" and not tok[1:].startswith(b"420"):
            raise NotImplementedError(f"Y4M chroma {tok!r}: C420 only")
    if not w or not h:
        raise NotImplementedError("Y4M header missing W/H")
    fsize = w * h + 2 * ((w // 2) * (h // 2))
    frames, pos = [], nl + 1
    while pos < len(b):
        fnl = b.index(b"\n", pos)
        if b[pos:pos + 5] != b"FRAME":
            raise NotImplementedError("bad Y4M FRAME marker")
        frames.append(b[fnl + 1:fnl + 1 + fsize])
        pos = fnl + 1 + fsize
    return w, h, frames


def encode_y4m_py(width: int, height: int, frames) -> bytes:
    """Encode raw YUV C420 frames as YUV4MPEG2 (inverse of
    :func:`decode_y4m_py`)."""
    out = bytearray(f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 "
                    f"C420jpeg\n".encode())
    for f in frames:
        out += b"FRAME\n" + f
    return bytes(out)


VIDEO_FRAMES_SCHEMA = ("doc_id bigint, frame_idx int, width int, "
                       "height int, y_checksum bigint")


def sample_video_frames(df: DataFrame, every_n: int = 30,
                        payload_col: str = "payload",
                        id_col: str = "doc_id") -> DataFrame:
    """Real frame sampling: PyAV when present (any codec), else the
    pure-Python Y4M parser.  Emits every ``every_n``-th frame's
    dimensions plus a position-weighted luma checksum
    ``sum((i + 1) * Y_i)`` — order-sensitive, so plane-size or
    frame-boundary mistakes are caught by the oracle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        try:
            import av as _av
        except ImportError:
            _av = None
        import io
        for pdf in it:
            out = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                if _av is not None:  # pragma: no cover (no PyAV here)
                    with _av.open(io.BytesIO(b)) as c:
                        for k, fr in enumerate(c.decode(video=0)):
                            if k % every_n:
                                continue
                            y = fr.reformat(format="yuv420p") \
                                .to_ndarray()[:fr.height, :].reshape(-1)
                            wts = np.arange(1, y.size + 1, dtype=np.int64)
                            out.append((i, k, fr.width, fr.height,
                                        int((wts * y.astype(np.int64)).sum())))
                else:
                    w, h, frames = decode_y4m_py(b)
                    for k in range(0, len(frames), every_n):
                        y = np.frombuffer(frames[k][:w * h], dtype=np.uint8)
                        wts = np.arange(1, y.size + 1, dtype=np.int64)
                        out.append((i, k, w, h,
                                    int((wts * y.astype(np.int64)).sum())))
            yield pd.DataFrame(out, columns=[
                "doc_id", "frame_idx", "width", "height", "y_checksum"])

    return df.mapInPandas(batches, VIDEO_FRAMES_SCHEMA)
