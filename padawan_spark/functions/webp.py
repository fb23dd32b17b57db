"""Pure-Python WebP-lossless (VP8L) codec subset.

Decodes the web's fourth major image format without libwebp: the
RIFF/VP8L container, canonical prefix codes (simple and
code-length-coded with 16/17/18 repeats), the color cache, LZ77
backward references with the 120-entry 2D distance mapping, and ALL
FOUR transforms — subtract-green, the tile-based predictor (14
modes), the cross-channel color transform, and color indexing with
sub-byte pixel packing — plus meta-prefix images (a sub-resolution
image selecting one of several Huffman code groups per tile),
including color-indexing STACKED with the other transforms (later
transforms operate on the packed, width-reduced image per the spec).

The fixture encoders write real frequency-built canonical Huffman
codes, optional LZ77 run/vertical matches, an optional color cache,
and any combination of the transforms — so every decode path above is
exercised by exact (lossless) round trips.

Format facts follow the public WebP Lossless Bitstream Specification
(RFC 9649) and the libwebp reference behavior it documents.
"""

from __future__ import annotations

ARGB_BLACK = 0xFF000000

# kCodeLengthCodeOrder (RFC 9649 §5.2.2)
_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
             13, 14, 15]

# 120-entry 2D distance map (RFC 9649 §4.2.2): (dx, dy) pairs
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


class _Vp8lBitReader:
    """LSB-first bit reader (VP8L convention)."""

    def __init__(self, d: bytes, pos: int = 0):
        self.d, self.pos, self.acc, self.nbits = d, pos, 0, 0

    def bits(self, n: int) -> int:
        while self.nbits < n:
            # zero-pad past the end: every decode loop is bounded by
            # pixel/alphabet counts, so padding cannot run away, and
            # prefix-code reads error out after 16 unmatched bits
            byte = self.d[self.pos] if self.pos < len(self.d) else 0
            self.acc |= byte << self.nbits
            self.nbits += 8
            self.pos += 1
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v

    def read_code(self, tree) -> int:
        """Canonical prefix codes are emitted MSB-of-code first into
        the LSB-first stream (the DEFLATE convention)."""
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.bits(1)
            ln += 1
            sym = tree.get((ln, code))
            if sym is not None:
                return sym
        raise NotImplementedError("corrupt VP8L prefix code")


class _Vp8lBitWriter:
    def __init__(self):
        self.out, self.acc, self.nbits = bytearray(), 0, 0

    def put(self, v: int, n: int):
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def put_code(self, code: int, ln: int):
        for i in range(ln - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self.out)
        if self.nbits:
            out.append(self.acc & 0xFF)
        return bytes(out)


def _canonical(lengths):
    """(length, code) -> symbol decode map and symbol -> (code, length)
    encode map from a code-length array (canonical assignment by
    (length, symbol) order)."""
    order = sorted((ln, s) for s, ln in enumerate(lengths) if ln > 0)
    dec, enc, code, prev_len = {}, {}, 0, 0
    for ln, s in order:
        code <<= (ln - prev_len)
        prev_len = ln
        dec[(ln, code)] = s
        enc[s] = (code, ln)
        code += 1
    return dec, enc


class _SingleSymbolTree(dict):
    """A one-symbol prefix code consumes ZERO bits at decode time."""

    def __init__(self, symbol: int):
        super().__init__()
        self.symbol = symbol


def _read_prefix_code(rd, alphabet_size: int):
    """Read one prefix code (RFC 9649 §5.2.2): simple (1-2 symbols)
    or code-length-coded with 16/17/18 repeats."""
    if rd.bits(1):                               # simple code
        num_symbols = rd.bits(1) + 1
        first_8bit = rd.bits(1)
        s0 = rd.bits(8) if first_8bit else rd.bits(1)
        if num_symbols == 1:
            return _SingleSymbolTree(s0)
        s1 = rd.bits(8)
        lengths = [0] * alphabet_size
        lengths[s0] = lengths[s1] = 1
        dec, _enc = _canonical(lengths)
        return dec
    num_codes = rd.bits(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = rd.bits(3)
    cl_dec, _ = _canonical(cl_lengths)
    if rd.bits(1):                               # explicit max_symbol
        length_nbits = 2 + 2 * rd.bits(3)
        max_symbol = 2 + rd.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol, prev = 0, 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = rd.read_code(cl_dec)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + rd.bits(2), prev
            elif code_len == 17:
                repeat, fill = 3 + rd.bits(3), 0
            else:
                repeat, fill = 11 + rd.bits(7), 0
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    break
                lengths[symbol] = fill
                symbol += 1
    nz = [s for s, ln in enumerate(lengths) if ln]
    if len(nz) == 1:
        return _SingleSymbolTree(nz[0])
    dec, _ = _canonical(lengths)
    return dec


def _read_sym(rd, tree) -> int:
    if isinstance(tree, _SingleSymbolTree):
        return tree.symbol
    return rd.read_code(tree)


def _prefix_value(rd, code: int) -> int:
    """LZ77 length/distance prefix decoding (RFC 9649 §4.2.1.1)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + rd.bits(extra) + 1


def _cache_hash(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _read_entropy_image(rd, w: int, h: int, allow_cache: bool = True,
                        allow_meta: bool = False):
    """Decode one spatially-coded (entropy) image of w*h ARGB pixels —
    the core shared by the main image and every transform sub-image.
    Handles meta-prefix images: a recursively-decoded sub-resolution
    image assigns one of several Huffman code groups to each tile."""
    cache_bits = 0
    if allow_cache and rd.bits(1):
        cache_bits = rd.bits(4)
        if not (1 <= cache_bits <= 11):
            raise NotImplementedError(
                f"invalid VP8L color-cache bits {cache_bits}")
    meta = None
    # the meta-prefix bit exists ONLY in the top-level image (libwebp
    # reads it only when is_level0); sub-images (palette rows, transform
    # tile images, the meta image itself) go straight to the code groups
    if allow_meta and rd.bits(1):                # meta-prefix image
        hb = rd.bits(3) + 2
        hw = (w + (1 << hb) - 1) >> hb
        hh = (h + (1 << hb) - 1) >> hb
        himg = _read_entropy_image(rd, hw, hh)
        gidx = [((((v >> 16) & 0xFF) << 8) | ((v >> 8) & 0xFF))
                for v in himg]
        meta = (hb, hw, gidx)
    cache_size = (1 << cache_bits) if cache_bits else 0
    n_groups = (max(meta[2]) + 1) if meta else 1
    groups = []
    for _g in range(n_groups):
        groups.append((
            _read_prefix_code(rd, 256 + 24 + cache_size),
            _read_prefix_code(rd, 256),
            _read_prefix_code(rd, 256),
            _read_prefix_code(rd, 256),
            _read_prefix_code(rd, 40)))
    green, red, blue, alpha, dist = groups[0]
    cache = [0] * cache_size
    px = [0] * (w * h)
    i = 0
    n = w * h
    while i < n:
        if meta:
            hb, hw, gidx = meta
            g_i = gidx[((i // w) >> hb) * hw + ((i % w) >> hb)]
            green, red, blue, alpha, dist = groups[g_i]
        s = _read_sym(rd, green)
        if s < 256:                              # literal
            r = _read_sym(rd, red)
            b = _read_sym(rd, blue)
            a = _read_sym(rd, alpha)
            v = (a << 24) | (r << 16) | (s << 8) | b
            px[i] = v
            if cache_bits:
                cache[_cache_hash(v, cache_bits)] = v
            i += 1
        elif s < 280:                            # LZ77 backref
            length = _prefix_value(rd, s - 256)
            dcode = _prefix_value(rd, _read_sym(rd, dist))
            if dcode <= 120:
                dx, dy = _DIST_MAP[dcode - 1]
                d = dy * w + dx
                if d < 1:
                    d = 1
            else:
                d = dcode - 120
            if d > i or i + length > n:
                raise NotImplementedError("VP8L backref out of range")
            for _ in range(length):
                v = px[i - d]
                px[i] = v
                if cache_bits:
                    cache[_cache_hash(v, cache_bits)] = v
                i += 1
        else:                                    # color-cache hit
            if not cache_bits:
                raise NotImplementedError(
                    "VP8L cache symbol without a color cache")
            v = cache[s - 280]
            px[i] = v
            if cache_bits:
                cache[_cache_hash(v, cache_bits)] = v
            i += 1
    return px


def _int8(v: int) -> int:
    return v - 256 if v > 127 else v


def _avg2(a: int, b: int) -> int:
    return ((((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)) & 0xFFFFFFFF


def _add_px(a: int, b: int) -> int:
    """Per-channel modulo-256 addition of two ARGB words."""
    out = 0
    for sh in (0, 8, 16, 24):
        out |= (((a >> sh) + (b >> sh)) & 0xFF) << sh
    return out


def _sub_px(a: int, b: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        out |= (((a >> sh) - (b >> sh)) & 0xFF) << sh
    return out


def _select(t: int, l_: int, tl: int) -> int:
    pa = pb = 0
    for sh in (0, 8, 16, 24):
        tc, lc, tlc = (t >> sh) & 0xFF, (l_ >> sh) & 0xFF, (tl >> sh) & 0xFF
        p = tc + lc - tlc
        pa += abs(p - tc)
        pb += abs(p - lc)
    return t if pa <= pb else l_


def _clip255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _clamp_add_sub_full(l_: int, t: int, tl: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        v = _clip255(((l_ >> sh) & 0xFF) + ((t >> sh) & 0xFF)
                     - ((tl >> sh) & 0xFF))
        out |= v << sh
    return out


def _clamp_add_sub_half(l_: int, t: int, tl: int) -> int:
    ave = _avg2(l_, t)
    out = 0
    for sh in (0, 8, 16, 24):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        q = a - b
        q = q // 2 if q >= 0 else -((-q) // 2)   # C truncation
        out |= _clip255(a + q) << sh
    return out


def _predict(mode: int, px, i: int, x: int, y: int, w: int) -> int:
    if y == 0:
        return px[i - 1] if x > 0 else ARGB_BLACK
    if x == 0:
        return px[i - w]
    l_, t, tl = px[i - 1], px[i - w], px[i - w - 1]
    tr = px[i - w + 1]        # flat-buffer neighbor (wraps at x=w-1,
    #                           matching libwebp's row layout)
    if mode == 0:
        return ARGB_BLACK
    if mode == 1:
        return l_
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l_, tr), t)
    if mode == 6:
        return _avg2(l_, tl)
    if mode == 7:
        return _avg2(l_, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l_, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l_, tl)
    if mode == 12:
        return _clamp_add_sub_full(l_, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l_, t, tl)
    raise NotImplementedError(f"VP8L predictor mode {mode}")


def decode_webp_py(b: bytes):
    """Decode a WebP payload: lossless (VP8L) via this module's parser,
    lossy (VP8 key frame) via :mod:`padawan_spark.functions.vp8` — both
    dependency-free and byte-identical to libwebp (cross-validated in
    tests).  VP8X-wrapped stills (alpha/animation feature container)
    fall back to the system libwebp when installed.

    Returns ``(width, height, 4, rgba_bytes)`` row-major top-down."""
    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise NotImplementedError(
            "not a WebP payload and PIL is unavailable")
    if b[12:16] == b"VP8 ":
        import struct as _struct

        from .vp8 import decode_vp8_rgba
        sz = _struct.unpack("<I", b[16:20])[0]
        w, h, rgba = decode_vp8_rgba(b[20:20 + sz])
        return w, h, 4, rgba
    if b[12:16] == b"VP8X":
        return _decode_vp8x(b)
    if b[12:16] != b"VP8L":
        raise NotImplementedError(
            f"unknown WebP chunk {b[12:16]!r}")
    data = b[20:]
    if not data or data[0] != 0x2F:
        raise NotImplementedError("bad VP8L signature byte")
    rd = _Vp8lBitReader(data, 1)
    w = rd.bits(14) + 1
    h = rd.bits(14) + 1
    rd.bits(1)                                   # alpha hint
    if rd.bits(3) != 0:
        raise NotImplementedError("unknown VP8L version")
    px = _decode_vp8l_pixels(rd, w, h)
    out = bytearray(w * h * 4)
    for i, v in enumerate(px):
        out[4 * i] = (v >> 16) & 0xFF            # R
        out[4 * i + 1] = (v >> 8) & 0xFF         # G
        out[4 * i + 2] = v & 0xFF                # B
        out[4 * i + 3] = (v >> 24) & 0xFF        # A
    return w, h, 4, bytes(out)


def _decode_alpha(payload: bytes, w: int, h: int) -> bytearray:
    """ALPH chunk (WebP container spec): 1 header byte — compression
    method (0 raw / 1 headerless-VP8L with alpha in green), row filter
    (none/horizontal/vertical/gradient, libwebp filters.c semantics),
    pre-processing — then the alpha plane."""
    hdr = payload[0]
    method = hdr & 3
    filt = (hdr >> 2) & 3
    prep = (hdr >> 4) & 3
    if method > 1:
        raise NotImplementedError(f"ALPH compression method {method}")
    if prep == 1:
        raise NotImplementedError(
            "ALPH level-reduction pre-processing (lossy alpha) needs "
            "libwebp")
    if method == 0:
        plane = bytearray(payload[1:1 + w * h])
        if len(plane) != w * h:
            raise NotImplementedError("truncated raw ALPH plane")
    else:
        px = _decode_vp8l_pixels(_Vp8lBitReader(payload, 1), w, h)
        plane = bytearray(((v >> 8) & 0xFF) for v in px)
    if filt:
        for y in range(h):
            row = y * w
            prev = row - w
            if filt == 1 or y == 0:          # horizontal (and the first
                pred = plane[prev] if y else 0   # row of vertical/gradient
                for x in range(w):
                    pred = plane[row + x] = (pred + plane[row + x]) & 0xFF
            elif filt == 2:                  # vertical
                for x in range(w):
                    plane[row + x] = (plane[prev + x]
                                      + plane[row + x]) & 0xFF
            else:                            # gradient
                top_left = left = plane[prev]
                for x in range(w):
                    top = plane[prev + x]
                    g = left + top - top_left
                    g = 0 if g < 0 else 255 if g > 255 else g
                    left = plane[row + x] = (plane[row + x] + g) & 0xFF
                    top_left = top
    return plane


def _decode_vp8x(b: bytes):
    """VP8X extended-format STILL image: walk the chunk list, decode
    the VP8/VP8L image chunk, apply the ALPH alpha plane if present.
    Animations (ANIM/ANMF) and lossy-alpha pre-processing defer to the
    system libwebp when installed."""
    import struct

    chunks = {}
    pos = 12
    while pos + 8 <= len(b):
        four = b[pos:pos + 4]
        sz = struct.unpack("<I", b[pos + 4:pos + 8])[0]
        chunks.setdefault(four, b[pos + 8:pos + 8 + sz])
        pos += 8 + sz + (sz & 1)
    try:
        if b"ANIM" in chunks or b"ANMF" in chunks:
            # single-image view of an animation: the first presented
            # canvas (PIL's behavior); frame-accurate access goes
            # through decode_webp_frames_py
            w, h, frames = decode_webp_frames_py(b)
            if not frames:
                raise NotImplementedError("animated WebP without frames")
            return w, h, 4, frames[0]
        if b"VP8L" in chunks:
            data = chunks[b"VP8L"]
            if not data or data[0] != 0x2F:
                raise NotImplementedError("bad VP8L signature byte")
            rd = _Vp8lBitReader(data, 1)
            w = rd.bits(14) + 1
            h = rd.bits(14) + 1
            rd.bits(1)
            if rd.bits(3) != 0:
                raise NotImplementedError("unknown VP8L version")
            px = _decode_vp8l_pixels(rd, w, h)
            out = bytearray(w * h * 4)
            for i, v in enumerate(px):
                out[4 * i] = (v >> 16) & 0xFF
                out[4 * i + 1] = (v >> 8) & 0xFF
                out[4 * i + 2] = v & 0xFF
                out[4 * i + 3] = (v >> 24) & 0xFF
            return w, h, 4, bytes(out)
        if b"VP8 " not in chunks:
            raise NotImplementedError("VP8X without an image chunk")
        from .vp8 import decode_vp8_rgba
        w, h, rgba = decode_vp8_rgba(chunks[b"VP8 "])
        if b"ALPH" in chunks:
            out = bytearray(rgba)
            out[3::4] = _decode_alpha(chunks[b"ALPH"], w, h)
            rgba = bytes(out)
        return w, h, 4, rgba
    except NotImplementedError:
        from . import webplib
        if webplib.available():
            w, h, rgba = webplib.decode_rgba(b)
            return w, h, 4, rgba
        raise


def _decode_vp8l_pixels(rd, w: int, h: int):
    """Transforms + spatially-coded image of a VP8L stream (everything
    after the 5-byte header) -> ARGB pixel list.  Shared by the main
    VP8L path and ALPH chunks (whose lossless alpha stream is exactly
    this, headerless, with alpha in the green channel)."""
    transforms = []
    w_cur = w            # color-indexing bundling reduces the width used
    while rd.bits(1):    # by EVERYTHING read after it (spec: transforms
        ttype = rd.bits(2)  # following it apply to the packed image)
        if ttype == 2:                           # subtract green
            transforms.append(("subtract_green",))
        elif ttype == 0:                         # predictor
            size_bits = rd.bits(3) + 2
            tw = (w_cur + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            tiles = _read_entropy_image(rd, tw, th)
            transforms.append(("predictor", size_bits, tw, tiles, w_cur))
        elif ttype == 1:                         # color transform
            size_bits = rd.bits(3) + 2
            tw = (w_cur + (1 << size_bits) - 1) >> size_bits
            th = (h + (1 << size_bits) - 1) >> size_bits
            tiles = _read_entropy_image(rd, tw, th)
            transforms.append(("color", size_bits, tw, tiles, w_cur))
        else:                                    # ttype == 3: indexing
            npal = rd.bits(8) + 1
            stored = _read_entropy_image(rd, npal, 1)
            pal, prev = [], 0                    # delta-coded entries
            for v in stored:
                prev = _add_px(prev, v)
                pal.append(prev)
            wb = (3 if npal <= 2 else 2 if npal <= 4
                  else 1 if npal <= 16 else 0)
            transforms.append(("color_index", npal, wb, pal, w_cur))
            if wb:
                w_cur = (w_cur + (1 << wb) - 1) >> wb
    px = _read_entropy_image(rd, w_cur, h, allow_meta=True)
    # inverse transforms, in reverse order of appearance; each runs at
    # the width that was current when its forward was READ, so inverses
    # of transforms read after the indexing transform operate on the
    # packed image, and un-indexing then restores the full width for
    # the transforms read before it
    for tr in reversed(transforms):
        if tr[0] == "color_index":
            _tag, npal, wb, pal, src_w = tr
            if wb:
                bpp = 8 >> wb
                mask = (1 << bpp) - 1
                pw = (src_w + (1 << wb) - 1) >> wb
                out2 = [0] * (src_w * h)
                for y in range(h):
                    for x in range(src_w):
                        packed = (px[y * pw + (x >> wb)] >> 8) & 0xFF
                        idx = ((packed >> ((x & ((1 << wb) - 1)) * bpp))
                               & mask)
                        out2[y * src_w + x] = pal[idx] if idx < npal else 0
                px = out2
            else:
                px = [pal[(v >> 8) & 0xFF]
                      if ((v >> 8) & 0xFF) < npal else 0 for v in px]
        elif tr[0] == "color":
            _tag, size_bits, tw, tiles, cw = tr
            for i in range(cw * h):
                x, y = i % cw, i // cw
                cte = tiles[(y >> size_bits) * tw + (x >> size_bits)]
                g2r = _int8(cte & 0xFF)
                g2b = _int8((cte >> 8) & 0xFF)
                r2b = _int8((cte >> 16) & 0xFF)
                v = px[i]
                g = _int8((v >> 8) & 0xFF)
                r = ((v >> 16) + ((g2r * g) >> 5)) & 0xFF
                bl = (v + ((g2b * g) >> 5)) & 0xFF
                bl = (bl + ((r2b * _int8(r)) >> 5)) & 0xFF
                px[i] = (v & 0xFF00FF00) | (r << 16) | bl
        elif tr[0] == "subtract_green":
            for i, v in enumerate(px):
                g = (v >> 8) & 0xFF
                r = ((v >> 16) + g) & 0xFF
                bl = (v + g) & 0xFF
                px[i] = (v & 0xFF00FF00) | (r << 16) | bl
        else:
            _tag, size_bits, tw, tiles, cw = tr
            for i in range(cw * h):
                x, y = i % cw, i // cw
                mode = (tiles[(y >> size_bits) * tw + (x >> size_bits)]
                        >> 8) & 0xFF
                px[i] = _add_px(px[i], _predict(mode, px, i, x, y, cw))
    return px


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def _complete_near_flat(freqs: dict) -> dict:
    """COMPLETE canonical lengths (Kraft sum exactly 1) of near-uniform
    depth: with k = ceil(log2 n), the 2^k - n most frequent symbols get
    length k-1 and the rest k.  Strict decoders (libwebp) reject
    under-subscribed codes, so every fallback must stay complete."""
    import math
    syms = sorted(freqs, key=lambda s: (-freqs[s], s))
    n = len(syms)
    if n == 1:
        return {syms[0]: 1}
    k = max(1, math.ceil(math.log2(n)))
    short = (1 << k) - n
    return {s: (k - 1 if i < short else k) for i, s in enumerate(syms)}


def _huffman_lengths(freqs: dict) -> dict:
    """Code lengths from symbol frequencies (heapq Huffman); falls back
    to complete near-flat lengths if depth would exceed 15."""
    import heapq
    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    i = len(heap)
    while len(heap) > 1:
        f1, _x, g1 = heapq.heappop(heap)
        f2, _y, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, i, g1 + g2))
        i += 1
    if max(depth.values()) > 15:
        return _complete_near_flat(freqs)
    return depth


def _write_prefix_code(wtr, lengths_by_symbol: dict, alphabet_size: int):
    """Emit one prefix code; returns the symbol -> (code, len) map."""
    syms = sorted(lengths_by_symbol)
    if len(syms) <= 2 and all(s <= 255 for s in syms):
        wtr.put(1, 1)                            # simple code
        wtr.put(len(syms) - 1, 1)
        s0 = syms[0]
        if s0 <= 1 and len(syms) == 2 or (len(syms) == 1 and s0 <= 1):
            wtr.put(0, 1)                        # 1-bit first symbol
            wtr.put(s0, 1)
        else:
            wtr.put(1, 1)
            wtr.put(s0, 8)
        if len(syms) == 1:
            return {s0: (0, 0)}                  # zero bits per symbol
        wtr.put(syms[1], 8)
        full = [0] * alphabet_size
        full[syms[0]] = full[syms[1]] = 1
        _dec, enc = _canonical(full)
        return enc
    full = [0] * alphabet_size
    for s, ln in lengths_by_symbol.items():
        full[s] = ln
    # CL token stream (value, extra_bits, extra_value)
    stream = []
    i, n = 0, alphabet_size
    while i < n:
        v = full[i]
        run = 1
        while i + run < n and full[i + run] == v:
            run += 1
        if v == 0:
            r = run
            while r >= 3:
                take = min(r, 138)
                if take >= 11:
                    stream.append((18, 7, take - 11))
                else:
                    stream.append((17, 3, take - 3))
                r -= take
            stream.extend([(0, 0, 0)] * r)
        else:
            stream.append((v, 0, 0))
            r = run - 1
            while r >= 3:
                take = min(r, 6)
                stream.append((16, 2, take - 3))
                r -= take
            stream.extend([(v, 0, 0)] * r)
        i += run
    used_cl = sorted({t[0] for t in stream})
    cl_lengths = [0] * 19
    if len(used_cl) == 1:
        # a 1-symbol CL code would be under-subscribed; pad with a dummy
        # second symbol to a complete 1-bit code (never emitted)
        dummy = 0 if used_cl[0] != 0 else 1
        cl_lengths[used_cl[0]] = cl_lengths[dummy] = 1
        used_cl = sorted(used_cl + [dummy])
    else:
        cl_freq: dict = {}
        for t in stream:
            cl_freq[t[0]] = cl_freq.get(t[0], 0) + 1
        ls = _huffman_lengths(cl_freq)
        if max(ls.values()) > 7:                 # CL lengths are 3-bit
            ls = _complete_near_flat(cl_freq)
        for s, ln in ls.items():
            cl_lengths[s] = ln
    _dec, cl_enc = _canonical(cl_lengths)
    num_codes = max((_CL_ORDER.index(s) for s in used_cl), default=0) + 1
    num_codes = max(num_codes, 4)
    wtr.put(0, 1)                                # not simple
    wtr.put(num_codes - 4, 4)
    for k in range(num_codes):
        wtr.put(cl_lengths[_CL_ORDER[k]], 3)
    wtr.put(0, 1)                                # no max_symbol header
    for v, eb, ev in stream:
        code, ln = cl_enc[v]
        wtr.put_code(code, ln)
        if eb:
            wtr.put(ev, eb)
    _dec2, enc = _canonical(full)
    return enc


def _prefix_encode(val: int):
    """Inverse of :func:`_prefix_value`: (code, extra_bits, extra)."""
    if val <= 4:
        return val - 1, 0, 0
    x = val - 1
    nb = x.bit_length() - 1
    second = (x >> (nb - 1)) & 1
    return 2 * nb + second, nb - 1, x & ((1 << (nb - 1)) - 1)


def _write_entropy_image(wtr, px, w, h, cache_bits=0, use_lz77=False,
                         top_level=False):
    n = len(px)
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size
    tokens = []
    i = 0
    while i < n:
        best = None
        if use_lz77 and i > 0:
            for d in (1, w):
                if 1 <= d <= i and px[i - d] == px[i]:
                    ln = 0
                    while (i + ln < n and ln < 4000
                           and px[i + ln - d] == px[i + ln]):
                        ln += 1
                    if ln >= 3 and (best is None or ln > best[0]):
                        best = (ln, d)
        if best:
            ln, d = best
            for k in range(ln):
                if cache_size:
                    v = px[i + k]
                    cache[_cache_hash(v, cache_bits)] = v
            tokens.append(("copy", ln, d))
            i += ln
            continue
        v = px[i]
        hsh = _cache_hash(v, cache_bits) if cache_size else 0
        if cache_size and cache[hsh] == v:
            tokens.append(("cache", hsh))
        else:
            tokens.append(("lit", v))
        if cache_size:
            cache[hsh] = v
        i += 1

    def dist_code(d):
        if d == 1:
            return _DIST_MAP.index((1, 0)) + 1
        if d == w and (0, 1) in _DIST_MAP:
            return _DIST_MAP.index((0, 1)) + 1
        return d + 120

    gf, rf, bf, af, df = {}, {}, {}, {}, {}
    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            gf[(v >> 8) & 0xFF] = gf.get((v >> 8) & 0xFF, 0) + 1
            rf[(v >> 16) & 0xFF] = rf.get((v >> 16) & 0xFF, 0) + 1
            bf[v & 0xFF] = bf.get(v & 0xFF, 0) + 1
            af[(v >> 24) & 0xFF] = af.get((v >> 24) & 0xFF, 0) + 1
        elif t[0] == "copy":
            lc, _eb, _ev = _prefix_encode(t[1])
            gf[256 + lc] = gf.get(256 + lc, 0) + 1
            dc, _e2, _v2 = _prefix_encode(dist_code(t[2]))
            df[dc] = df.get(dc, 0) + 1
        else:
            gf[280 + t[1]] = gf.get(280 + t[1], 0) + 1
    for f in (gf, rf, bf, af, df):
        if not f:
            f[0] = 1                             # decoder always reads it

    if cache_bits:
        wtr.put(1, 1)
        wtr.put(cache_bits, 4)
    else:
        wtr.put(0, 1)
    if top_level:
        wtr.put(0, 1)                            # no meta-prefix image
    g_enc = _write_prefix_code(wtr, _huffman_lengths(gf),
                               256 + 24 + cache_size)
    r_enc = _write_prefix_code(wtr, _huffman_lengths(rf), 256)
    b_enc = _write_prefix_code(wtr, _huffman_lengths(bf), 256)
    a_enc = _write_prefix_code(wtr, _huffman_lengths(af), 256)
    d_enc = _write_prefix_code(wtr, _huffman_lengths(df), 40)

    def put_sym(enc, s):
        code, ln = enc[s]
        if ln:
            wtr.put_code(code, ln)

    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            put_sym(g_enc, (v >> 8) & 0xFF)
            put_sym(r_enc, (v >> 16) & 0xFF)
            put_sym(b_enc, v & 0xFF)
            put_sym(a_enc, (v >> 24) & 0xFF)
        elif t[0] == "copy":
            lc, eb, ev = _prefix_encode(t[1])
            put_sym(g_enc, 256 + lc)
            if eb:
                wtr.put(ev, eb)
            dc, eb2, ev2 = _prefix_encode(dist_code(t[2]))
            put_sym(d_enc, dc)
            if eb2:
                wtr.put(ev2, eb2)
        else:
            put_sym(g_enc, 280 + t[1])


def _write_meta_entropy_image(wtr, px, w, h, hb):
    """Emit a meta-prefix main image: tiles in the left half of the
    tile grid use Huffman group 0, the right half group 1 — two
    independently-built code sets selected per pixel position
    (literals only; the group split is what's under test)."""
    hw = (w + (1 << hb) - 1) >> hb
    hh = (h + (1 << hb) - 1) >> hb
    gidx = [0 if tx < max(1, (hw + 1) // 2) else 1
            for _ty in range(hh) for tx in range(hw)]
    ngroups = max(gidx) + 1
    wtr.put(0, 1)                                # no color cache
    wtr.put(1, 1)                                # meta-prefix present
    wtr.put(hb - 2, 3)
    tiles = [ARGB_BLACK | ((g & 0xFF) << 8) | (((g >> 8) & 0xFF) << 16)
             for g in gidx]
    _write_entropy_image(wtr, tiles, hw, hh)

    def group_of(i):
        return gidx[((i // w) >> hb) * hw + ((i % w) >> hb)]

    freqs = [[{}, {}, {}, {}] for _ in range(ngroups)]
    for i, v in enumerate(px):
        fs = freqs[group_of(i)]
        for f, val in ((fs[0], (v >> 8) & 0xFF), (fs[1], (v >> 16) & 0xFF),
                       (fs[2], v & 0xFF), (fs[3], (v >> 24) & 0xFF)):
            f[val] = f.get(val, 0) + 1
    encs = []
    for fs in freqs:
        for f in fs:
            if not f:
                f[0] = 1
        encs.append((
            _write_prefix_code(wtr, _huffman_lengths(fs[0]), 256 + 24),
            _write_prefix_code(wtr, _huffman_lengths(fs[1]), 256),
            _write_prefix_code(wtr, _huffman_lengths(fs[2]), 256),
            _write_prefix_code(wtr, _huffman_lengths(fs[3]), 256),
            _write_prefix_code(wtr, _huffman_lengths({0: 1}), 40)))
    for i, v in enumerate(px):
        g_enc, r_enc, b_enc, a_enc, _d = encs[group_of(i)]
        for enc, val in ((g_enc, (v >> 8) & 0xFF),
                         (r_enc, (v >> 16) & 0xFF),
                         (b_enc, v & 0xFF), (a_enc, (v >> 24) & 0xFF)):
            code, ln = enc[val]
            if ln:
                wtr.put_code(code, ln)


def encode_webp_py(width: int, height: int, rgba: bytes,
                   cache_bits: int = 0, use_lz77: bool = False,
                   subtract_green: bool = False,
                   color_transform: tuple | None = None,
                   predictor_mode: int | None = None,
                   predictor_size_bits: int = 4,
                   meta_groups_bits: int | None = None) -> bytes:
    """Encode row-major RGBA bytes as a lossless WebP (VP8L) — the
    fixture inverse of :func:`decode_webp_py`.  Optional features map
    one-to-one onto decoder paths: a color cache of ``cache_bits``,
    LZ77 run/vertical matches, the subtract-green transform, and a
    uniform-mode predictor transform (any of the 14 modes)."""
    import struct
    px = [((rgba[4 * i + 3] << 24) | (rgba[4 * i] << 16)
           | (rgba[4 * i + 1] << 8) | rgba[4 * i + 2])
          for i in range(width * height)]
    wtr = _Vp8lBitWriter()
    wtr.put(width - 1, 14)
    wtr.put(height - 1, 14)
    wtr.put(1, 1)                                # alpha hint
    wtr.put(0, 3)                                # version
    if subtract_green:
        wtr.put(1, 1)
        wtr.put(2, 2)
        for i, v in enumerate(px):
            g = (v >> 8) & 0xFF
            r = ((v >> 16) - g) & 0xFF
            b = (v - g) & 0xFF
            px[i] = (v & 0xFF00FF00) | (r << 16) | b
    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        sb = predictor_size_bits
        wtr.put(1, 1)
        wtr.put(1, 2)
        wtr.put(sb - 2, 3)
        tw = (width + (1 << sb) - 1) >> sb
        th = (height + (1 << sb) - 1) >> sb
        cte = (ARGB_BLACK | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8)
               | (g2r & 0xFF))
        _write_entropy_image(wtr, [cte] * (tw * th), tw, th)
        for i, v in enumerate(px):
            g = _int8((v >> 8) & 0xFF)
            r0 = (v >> 16) & 0xFF
            bl = v & 0xFF
            # forward: subtract the deltas the decoder will add back,
            # with blue's red term taken from the ORIGINAL red (the
            # decoder restores red first, then uses it for blue)
            r = (r0 - ((_int8(g2r & 0xFF) * g) >> 5)) & 0xFF
            bl = (bl - ((_int8(g2b & 0xFF) * g) >> 5)) & 0xFF
            bl = (bl - ((_int8(r2b & 0xFF) * _int8(r0)) >> 5)) & 0xFF
            px[i] = (v & 0xFF00FF00) | (r << 16) | bl
    if predictor_mode is not None:
        sb = predictor_size_bits
        wtr.put(1, 1)
        wtr.put(0, 2)
        wtr.put(sb - 2, 3)
        tw = (width + (1 << sb) - 1) >> sb
        th = (height + (1 << sb) - 1) >> sb
        tiles = [ARGB_BLACK | (predictor_mode << 8)] * (tw * th)
        _write_entropy_image(wtr, tiles, tw, th)
        res = [0] * len(px)
        for i, v in enumerate(px):
            pred = _predict(predictor_mode, px, i, i % width,
                            i // width, width)
            res[i] = _sub_px(v, pred)
        px = res
    wtr.put(0, 1)                                # end of transforms
    if meta_groups_bits is not None:
        if use_lz77 or cache_bits:
            raise ValueError(
                "meta_groups_bits composes with transforms but not "
                "with LZ77/cache in this fixture encoder")
        _write_meta_entropy_image(wtr, px, width, height,
                                  meta_groups_bits)
    else:
        _write_entropy_image(wtr, px, width, height, cache_bits,
                             use_lz77, top_level=True)
    body = b"\x2F" + wtr.bytes()
    if len(body) % 2:
        body += b"\x00"                          # RIFF even padding
    out = (b"RIFF" + struct.pack("<I", 12 + len(body))
           + b"WEBPVP8L" + struct.pack("<I", len(body)) + body)
    return out


def encode_webp_palette_py(width: int, height: int, rgba: bytes,
                           cache_bits: int = 0,
                           subtract_green: bool = False,
                           predictor_mode: int | None = None,
                           predictor_size_bits: int = 4) -> bytes:
    """Encode RGBA through the VP8L COLOR-INDEXING transform: build the
    palette from the distinct pixels (<= 256 required), delta-code it
    into the transform's sub-image, pack indices into the green
    channel at 8/4/2/1 bits per pixel depending on palette size, and
    entropy-code the width-reduced image.

    ``subtract_green`` stacks the subtract-green transform UNDER the
    palette (applied to the pixels before palettization; written first
    so the decoder un-indexes before un-subtracting).
    ``predictor_mode`` stacks a uniform predictor transform ON TOP of
    the packed index image (written after the indexing transform, so
    its tile grid spans the packed width per the spec)."""
    import struct
    px = [((rgba[4 * i + 3] << 24) | (rgba[4 * i] << 16)
           | (rgba[4 * i + 1] << 8) | rgba[4 * i + 2])
          for i in range(width * height)]
    wtr = _Vp8lBitWriter()
    wtr.put(width - 1, 14)
    wtr.put(height - 1, 14)
    wtr.put(1, 1)
    wtr.put(0, 3)
    if subtract_green:
        wtr.put(1, 1)
        wtr.put(2, 2)
        for i, v in enumerate(px):
            g = (v >> 8) & 0xFF
            r = ((v >> 16) - g) & 0xFF
            b = (v - g) & 0xFF
            px[i] = (v & 0xFF00FF00) | (r << 16) | b
    pal = sorted(set(px))
    if len(pal) > 256:
        raise ValueError(f"palette too large: {len(pal)} colors")
    npal = len(pal)
    index = {v: i for i, v in enumerate(pal)}
    wb = 3 if npal <= 2 else 2 if npal <= 4 else 1 if npal <= 16 else 0
    wtr.put(1, 1)                                # a transform follows
    wtr.put(3, 2)                                # color indexing
    wtr.put(npal - 1, 8)
    deltas, prev = [], 0
    for v in pal:
        deltas.append(_sub_px(v, prev))
        prev = v
    _write_entropy_image(wtr, deltas, npal, 1)
    if wb:
        bpp = 8 >> wb
        pw = (width + (1 << wb) - 1) >> wb
        packed = [0] * (pw * height)
        for y in range(height):
            for x in range(width):
                k = index[px[y * width + x]]
                packed[y * pw + (x >> wb)] |= \
                    k << ((x & ((1 << wb) - 1)) * bpp)
        body_px = [ARGB_BLACK | (v << 8) for v in packed]
        bw = pw
    else:
        body_px = [ARGB_BLACK | (index[v] << 8) for v in px]
        bw = width
    if predictor_mode is not None:
        sb = predictor_size_bits
        wtr.put(1, 1)
        wtr.put(0, 2)                            # predictor transform
        wtr.put(sb - 2, 3)
        tw = (bw + (1 << sb) - 1) >> sb
        th = (height + (1 << sb) - 1) >> sb
        tiles = [ARGB_BLACK | (predictor_mode << 8)] * (tw * th)
        _write_entropy_image(wtr, tiles, tw, th)
        res = [0] * len(body_px)
        for i, v in enumerate(body_px):
            pred = _predict(predictor_mode, body_px, i, i % bw,
                            i // bw, bw)
            res[i] = _sub_px(v, pred)
        body_px = res
    wtr.put(0, 1)                                # end of transforms
    _write_entropy_image(wtr, body_px, bw, height, cache_bits,
                         top_level=True)
    body = b"\x2F" + wtr.bytes()
    if len(body) % 2:
        body += b"\x00"
    return (b"RIFF" + struct.pack("<I", 12 + len(body))
            + b"WEBPVP8L" + struct.pack("<I", len(body)) + body)


# ---------------------------------------------------------------------------
# Animated WebP (VP8X + ANIM/ANMF): frame-accurate decode with the
# container spec's compositing — frames render at their (even-valued)
# offsets onto the persistent canvas, the blend bit selects alpha
# blending vs overwrite, and disposal 1 restores the frame rectangle to
# the ANIM background color after presentation.  The web-corpus analog
# of decode_gif_frames_py; sub-frames may be VP8L or lossy VP8, with an
# optional ALPH plane.
# ---------------------------------------------------------------------------


def _decode_subframe(chunks: list):
    """(ALPH?, VP8|VP8L) chunk list inside one ANMF -> (w, h, rgba)."""
    alph = None
    for four, payload in chunks:
        if four == b"ALPH":
            alph = payload
        elif four == b"VP8L":
            if not payload or payload[0] != 0x2F:
                raise NotImplementedError("bad VP8L signature byte")
            rd = _Vp8lBitReader(payload, 1)
            w = rd.bits(14) + 1
            h = rd.bits(14) + 1
            rd.bits(1)
            if rd.bits(3) != 0:
                raise NotImplementedError("unknown VP8L version")
            px = _decode_vp8l_pixels(rd, w, h)
            out = bytearray(w * h * 4)
            for i, v in enumerate(px):
                out[4 * i] = (v >> 16) & 0xFF
                out[4 * i + 1] = (v >> 8) & 0xFF
                out[4 * i + 2] = v & 0xFF
                out[4 * i + 3] = (v >> 24) & 0xFF
            return w, h, bytes(out)
        elif four == b"VP8 ":
            from .vp8 import decode_vp8_rgba
            w, h, rgba = decode_vp8_rgba(payload)
            if alph is not None:
                out = bytearray(rgba)
                out[3::4] = _decode_alpha(alph, w, h)
                rgba = bytes(out)
            return w, h, rgba
    raise NotImplementedError("ANMF frame without an image chunk")


def _walk_chunks(b: bytes, pos: int, end: int) -> list:
    import struct
    out = []
    while pos + 8 <= end:
        four = b[pos:pos + 4]
        sz = struct.unpack("<I", b[pos + 4:pos + 8])[0]
        out.append((four, b[pos + 8:pos + 8 + sz]))
        pos += 8 + sz + (sz & 1)
    return out


def decode_webp_frames_py(b: bytes):
    """Decode EVERY frame of an animated WebP; returns ``(canvas_w,
    canvas_h, [rgba_canvas, ...])`` — each element the full canvas AS
    PRESENTED for that frame.  The canvas starts as the ANIM background
    color; blend=0 alpha-blends the sub-frame over the canvas (exact
    container-spec arithmetic), blend=1 overwrites; disposal=1 fills
    the frame rectangle back with the background color after
    presentation.  A non-animated payload decodes as one frame."""
    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise NotImplementedError("not a WebP payload")
    chunks = _walk_chunks(b, 12, len(b))
    kinds = [c[0] for c in chunks]
    if b"ANMF" not in kinds:
        w, h, _c, rgba = decode_webp_py(b)
        return w, h, [rgba]
    vp8x = dict(chunks).get(b"VP8X")
    if vp8x is None:
        raise NotImplementedError("ANMF frames without a VP8X header")
    cw = int.from_bytes(vp8x[4:7], "little") + 1
    ch = int.from_bytes(vp8x[7:10], "little") + 1
    bg = (0, 0, 0, 0)
    for four, payload in chunks:
        if four == b"ANIM":                      # BGRA byte order
            bg = (payload[2], payload[1], payload[0], payload[3])
    canvas = bytearray(bytes(bg) * (cw * ch))
    frames = []
    for four, payload in chunks:
        if four != b"ANMF":
            continue
        fx = int.from_bytes(payload[0:3], "little") * 2
        fy = int.from_bytes(payload[3:6], "little") * 2
        fw = int.from_bytes(payload[6:9], "little") + 1
        fh = int.from_bytes(payload[9:12], "little") + 1
        flags = payload[15]
        no_blend = (flags >> 1) & 1
        dispose = flags & 1
        sw, sh, srgba = _decode_subframe(_walk_chunks(
            payload, 16, len(payload)))
        if (sw, sh) != (fw, fh):
            raise NotImplementedError(
                f"ANMF header {fw}x{fh} != sub-frame {sw}x{sh}")
        for y in range(fh):
            co = ((fy + y) * cw + fx) * 4
            so = y * fw * 4
            if no_blend:
                canvas[co:co + fw * 4] = srgba[so:so + fw * 4]
            else:
                for x in range(fw):
                    sa = srgba[so + 4 * x + 3]
                    if sa == 255:
                        canvas[co + 4 * x:co + 4 * x + 4] = \
                            srgba[so + 4 * x:so + 4 * x + 4]
                    elif sa == 0:
                        pass
                    else:                        # container-spec blend
                        da = canvas[co + 4 * x + 3]
                        ab = sa + da * (255 - sa) // 255
                        for c in range(3):
                            s = srgba[so + 4 * x + c]
                            d = canvas[co + 4 * x + c]
                            canvas[co + 4 * x + c] = 0 if ab == 0 else (
                                (s * sa + d * da * (255 - sa) // 255)
                                // ab)
                        canvas[co + 4 * x + 3] = ab
        frames.append(bytes(canvas))
        if dispose:
            for y in range(fh):
                co = ((fy + y) * cw + fx) * 4
                canvas[co:co + fw * 4] = bytes(bg) * fw
    return cw, ch, frames


def encode_webp_anim_py(width: int, height: int, frames,
                        bg=(0, 0, 0, 255), loop: int = 0) -> bytes:
    """Fixture encoder for animated WebP: ``frames`` is a list of
    ``(fx, fy, fw, fh, rgba, no_blend, dispose, duration_ms)`` with
    even fx/fy; each sub-frame is embedded as a lossless VP8L chunk so
    decode is exact.  ``bg`` is (r, g, b, a)."""
    import struct

    def chunk(four, payload):
        c = four + len(payload).to_bytes(4, "little") + payload
        return c + (b"\x00" if len(payload) & 1 else b"")

    body = b"WEBP"
    body += chunk(b"VP8X", bytes([0x12, 0, 0, 0])
                  + (width - 1).to_bytes(3, "little")
                  + (height - 1).to_bytes(3, "little"))
    body += chunk(b"ANIM", bytes((bg[2], bg[1], bg[0], bg[3]))
                  + struct.pack("<H", loop))
    for fx, fy, fw, fh, rgba, no_blend, dispose, dur in frames:
        if fx % 2 or fy % 2:
            raise ValueError("ANMF offsets must be even")
        sub = encode_webp_py(fw, fh, rgba)      # full RIFF; take VP8L chunk
        vp8l = _walk_chunks(sub, 12, len(sub))[0][1]
        payload = ((fx // 2).to_bytes(3, "little")
                   + (fy // 2).to_bytes(3, "little")
                   + (fw - 1).to_bytes(3, "little")
                   + (fh - 1).to_bytes(3, "little")
                   + int(dur).to_bytes(3, "little")
                   + bytes([(int(no_blend) << 1) | int(dispose)]))
        payload += chunk(b"VP8L", vp8l)
        body += chunk(b"ANMF", payload)
    return b"RIFF" + len(body).to_bytes(4, "little") + body
