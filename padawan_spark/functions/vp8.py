"""Pure-Python VP8 (lossy WebP) KEY-FRAME decoder.

Implements the intra-only decode path of RFC 6386 (the VP8 Data Format
and Decoding Guide): the boolean arithmetic decoder (§7), frame +
compressed headers with segmentation and loop-filter parameters (§9),
key-frame intra mode records (§11), DCT/WHT token decoding with the
default and per-frame-updated probability tables (§13), dequantization
(§14.1), the exact fixed-point inverse DCT/WHT (§14.3-14.5), all
intra predictors (§12), and the normal + simple in-loop deblocking
filters (§15).  Inter frames are out of scope (a WebP still image is
always a single key frame).

Numeric fidelity: every step follows the integer-exact reference
behavior, so output is required to be BYTE-IDENTICAL to libwebp; the
test suite cross-validates by decoding libwebp-encoded fixtures and
comparing Y/U/V planes (``WebPDecodeYUV``) and RGBA (``WebPDecodeRGBA``)
exactly.  Mode/probability enums follow the tree-leaf order used by the
tables in :mod:`padawan_spark.functions.vp8_tables` (a pure relabeling
of RFC 6386's enum; the trees and probabilities are identical).

Reference parity: the reference repo has no media codecs at all — this
module (like the VP8L/JPEG/PNG/... decoders) extends the engine for
multimodal training-data pipelines where image bytes live in parquet
binary columns (SURVEY.md §2, "multimodal" rows).
"""

from __future__ import annotations

from . import vp8_tables as T

# 16x16 / chroma prediction modes (tree-leaf order, = libwebp's enum)
DC_PRED, TM_PRED, V_PRED, H_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 sub-modes (tree-leaf order)
(B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU) = range(10)


class _BoolDecoder:
    """RFC 6386 §7 boolean arithmetic decoder (reference-exact)."""

    __slots__ = ("buf", "pos", "value", "range", "bit_count")

    def __init__(self, buf: bytes):
        self.buf = buf
        b0 = buf[0] if len(buf) > 0 else 0
        b1 = buf[1] if len(buf) > 1 else 0
        self.value = (b0 << 8) | b1
        self.pos = 2
        self.range = 255
        self.bit_count = 0

    def bit(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.buf):
                    self.value |= self.buf[self.pos]
                self.pos += 1
        return ret

    def flag(self) -> int:
        return self.bit(128)

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit(128)
        return v

    def signed(self, n: int) -> int:
        """L(n) magnitude followed by a sign bit."""
        v = self.literal(n)
        return -v if self.bit(128) else v

    def maybe_signed(self, n: int) -> int:
        """flag ? signed L(n) : 0 — the header delta idiom."""
        return self.signed(n) if self.bit(128) else 0


def _clip_q(v: int, hi: int = 127) -> int:
    return 0 if v < 0 else hi if v > hi else v


class _Header:
    pass


def _parse_headers(data: bytes):
    """Uncompressed frame tag + the compressed key-frame header."""
    if len(data) < 10:
        raise NotImplementedError("truncated VP8 payload")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise NotImplementedError("VP8 inter frame (still WebP is always "
                                  "a key frame)")
    part1_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise NotImplementedError("bad VP8 key-frame start code")
    w_code = data[6] | (data[7] << 8)
    h_code = data[8] | (data[9] << 8)
    h = _Header()
    h.width = w_code & 0x3FFF
    h.height = h_code & 0x3FFF
    if h.width == 0 or h.height == 0:
        raise NotImplementedError("zero VP8 frame dimension")
    first = data[10:10 + part1_size]
    if len(first) < part1_size:
        raise NotImplementedError("truncated VP8 first partition")
    bd = _BoolDecoder(first)
    bd.bit(128)                   # color space (0 for the defined profile)
    bd.bit(128)                   # clamping type (decode path is identical)

    # --- segmentation (§9.3)
    h.segmentation = bd.flag()
    h.update_map = 0
    h.seg_abs = 0
    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_tree_probs = [255, 255, 255]
    if h.segmentation:
        h.update_map = bd.flag()
        update_data = bd.flag()
        if update_data:
            h.seg_abs = bd.flag()
            for s in range(4):
                h.seg_quant[s] = bd.maybe_signed(7)
            for s in range(4):
                h.seg_lf[s] = bd.maybe_signed(6)
        if h.update_map:
            for i in range(3):
                h.seg_tree_probs[i] = bd.literal(8) if bd.flag() else 255

    # --- loop filter (§9.4)
    h.filter_simple = bd.flag()
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta = bd.flag()
    h.ref_lf_delta = [0, 0, 0, 0]
    h.mode_lf_delta = [0, 0, 0, 0]
    if h.lf_delta and bd.flag():
        for i in range(4):
            if bd.flag():
                h.ref_lf_delta[i] = bd.signed(6)
        for i in range(4):
            if bd.flag():
                h.mode_lf_delta[i] = bd.signed(6)

    # --- token partitions (§9.5)
    h.n_parts = 1 << bd.literal(2)

    # --- quantizers (§9.6)
    h.y_ac_qi = bd.literal(7)
    h.y_dc_delta = bd.maybe_signed(4)
    h.y2_dc_delta = bd.maybe_signed(4)
    h.y2_ac_delta = bd.maybe_signed(4)
    h.uv_dc_delta = bd.maybe_signed(4)
    h.uv_ac_delta = bd.maybe_signed(4)

    bd.flag()                     # refresh_entropy_probs (state-free here)

    # --- token probability updates (§13.4)
    probs = [[[list(T.DEFAULT_COEF_PROBS[i][j][k]) for k in range(3)]
              for j in range(8)] for i in range(4)]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l_ in range(11):
                    if bd.bit(T.COEF_UPDATE_PROBS[i][j][k][l_]):
                        probs[i][j][k][l_] = bd.literal(8)
    h.coef_probs = probs

    # --- per-MB skip flag (§9.11)
    h.use_skip = bd.flag()
    h.skip_prob = bd.literal(8) if h.use_skip else 0

    h.bd = bd                     # continues with the per-MB mode records
    h.part1_end = 10 + part1_size
    return h


def _dequant_factors(h):
    """Per-segment (y1_dc, y1_ac, y2_dc, y2_ac, uv_dc, uv_ac) (§14.1)."""
    out = []
    for s in range(4):
        if h.segmentation:
            q = h.seg_quant[s] if h.seg_abs else h.y_ac_qi + h.seg_quant[s]
        else:
            q = h.y_ac_qi
        q = _clip_q(q)
        y1dc = T.DC_QLOOKUP[_clip_q(q + h.y_dc_delta)]
        y1ac = T.AC_QLOOKUP[q]
        y2dc = T.DC_QLOOKUP[_clip_q(q + h.y2_dc_delta)] * 2
        y2ac = (T.AC_QLOOKUP[_clip_q(q + h.y2_ac_delta)] * 101581) >> 16
        if y2ac < 8:
            y2ac = 8
        uvdc = T.DC_QLOOKUP[_clip_q(q + h.uv_dc_delta, 117)]
        uvac = T.AC_QLOOKUP[_clip_q(q + h.uv_ac_delta)]
        out.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))
    return out


def _parse_intra_modes(h, mbw: int, mbh: int):
    """Key-frame mode records for every MB (§11), in raster order."""
    bd = h.bd
    kf_y = T.KF_YMODE_PROB
    kf_uv = T.KF_UV_MODE_PROB
    bprob = T.KF_BMODE_PROB
    top_b = [[B_DC] * 4 for _ in range(mbw)]    # above 4x4 mode context
    mbs = []
    for _y in range(mbh):
        left_b = [B_DC] * 4
        for _x in range(mbw):
            seg = 0
            if h.segmentation and h.update_map:
                p = h.seg_tree_probs
                seg = ((2 + bd.bit(p[2])) if bd.bit(p[0])
                       else bd.bit(p[1]))
            skip = bd.bit(h.skip_prob) if h.use_skip else 0
            bmodes = [0] * 16
            if not bd.bit(kf_y[0]):
                ymode = B_PRED
                tb = top_b[_x]
                for by in range(4):
                    left = left_b[by]
                    for bx in range(4):
                        p = bprob[tb[bx]][left]
                        if not bd.bit(p[0]):
                            m = B_DC
                        elif not bd.bit(p[1]):
                            m = B_TM
                        elif not bd.bit(p[2]):
                            m = B_VE
                        elif not bd.bit(p[3]):
                            m = B_HE if not bd.bit(p[4]) else (
                                B_RD if not bd.bit(p[5]) else B_VR)
                        else:
                            m = B_LD if not bd.bit(p[6]) else (
                                B_VL if not bd.bit(p[7]) else (
                                    B_HD if not bd.bit(p[8]) else B_HU))
                        bmodes[by * 4 + bx] = m
                        left = m
                        tb[bx] = m
                    left_b[by] = left
            else:
                if not bd.bit(kf_y[1]):
                    ymode = DC_PRED if not bd.bit(kf_y[2]) else V_PRED
                else:
                    ymode = H_PRED if not bd.bit(kf_y[3]) else TM_PRED
                # implied 4x4 context: DC->B_DC, V->B_VE, H->B_HE, TM->B_TM
                ctx = (B_DC, B_TM, B_VE, B_HE)[ymode]
                top_b[_x] = [ctx] * 4
                left_b = [ctx] * 4
            if not bd.bit(kf_uv[0]):
                uvmode = DC_PRED
            elif not bd.bit(kf_uv[1]):
                uvmode = V_PRED
            else:
                uvmode = H_PRED if not bd.bit(kf_uv[2]) else TM_PRED
            mbs.append((seg, skip, ymode, bmodes, uvmode))
    return mbs


def _get_coeffs(bd, plane_probs, ctx: int, first: int, dcq: int, acq: int):
    """Decode one 4x4 block's tokens (§13.2-13.3); returns (coeffs[16]
    in raster order after zigzag+dequant, nonzero_flag)."""
    out = [0] * 16
    nz = 0
    n = first
    p = plane_probs[T.COEF_BANDS[n]][ctx]
    while n < 16:
        if not bd.bit(p[0]):                      # EOB
            break
        while True:                               # zero run
            if bd.bit(p[1]):
                break
            n += 1
            if n >= 16:
                return out, nz
            # after a zero, EOB is not permitted: re-enter below EOB node
            p = plane_probs[T.COEF_BANDS[n]][0]
        # nonzero value
        if not bd.bit(p[2]):
            v = 1
            nxt = 1
        else:
            nxt = 2
            if not bd.bit(p[3]):
                v = 2 if not bd.bit(p[4]) else (3 if not bd.bit(p[5]) else 4)
            else:
                if not bd.bit(p[6]):
                    if not bd.bit(p[7]):          # cat1: 5-6
                        base, cat = 5, 0
                    else:                         # cat2: 7-10
                        base, cat = 7, 1
                else:
                    if not bd.bit(p[8]):
                        if not bd.bit(p[9]):      # cat3
                            base, cat = 11, 2
                        else:                     # cat4
                            base, cat = 19, 3
                    else:
                        if not bd.bit(p[10]):     # cat5
                            base, cat = 35, 4
                        else:                     # cat6
                            base, cat = 67, 5
                v = 0
                for prob in T.PCAT[cat]:
                    v = (v << 1) | bd.bit(prob)
                v += base
        if bd.bit(128):
            v = -v
        out[T.ZIGZAG[n]] = v * (dcq if n == 0 else acq)
        nz = 1
        n += 1
        if n >= 16:
            break
        p = plane_probs[T.COEF_BANDS[n]][nxt]
    return out, nz


# --- inverse transforms (§14.3-14.5; integer-exact) ------------------------

def _mul1(a: int) -> int:
    return a + ((a * 20091) >> 16)


def _mul2(a: int) -> int:
    return (a * 35468) >> 16


def _idct_add(dst, off: int, stride: int, cf) -> None:
    """4x4 inverse DCT added into the plane with clipping (§14.4)."""
    tmp = [0] * 16
    for i in range(4):
        a = cf[i] + cf[8 + i]
        b = cf[i] - cf[8 + i]
        c = _mul2(cf[4 + i]) - _mul1(cf[12 + i])
        d = _mul1(cf[4 + i]) + _mul2(cf[12 + i])
        t = 4 * i
        tmp[t] = a + d
        tmp[t + 1] = b + c
        tmp[t + 2] = b - c
        tmp[t + 3] = a - d
    for i in range(4):
        dc = tmp[i] + 4
        a = dc + tmp[8 + i]
        b = dc - tmp[8 + i]
        c = _mul2(tmp[4 + i]) - _mul1(tmp[12 + i])
        d = _mul1(tmp[4 + i]) + _mul2(tmp[12 + i])
        base = off + i * stride
        for x, v in ((0, a + d), (1, b + c), (2, b - c), (3, a - d)):
            q = dst[base + x] + (v >> 3)
            dst[base + x] = 0 if q < 0 else 255 if q > 255 else q


def _iwht(cf):
    """Inverse Walsh-Hadamard for the Y2 block (§14.3): returns the 16
    luma-block DC values in raster order."""
    tmp = [0] * 16
    out = [0] * 16
    for i in range(4):
        a0 = cf[i] + cf[12 + i]
        a1 = cf[4 + i] + cf[8 + i]
        a2 = cf[4 + i] - cf[8 + i]
        a3 = cf[i] - cf[12 + i]
        tmp[i] = a0 + a1
        tmp[8 + i] = a0 - a1
        tmp[4 + i] = a3 + a2
        tmp[12 + i] = a3 - a2
    for i in range(4):
        t = 4 * i
        dc = tmp[t] + 3
        a0 = dc + tmp[t + 3]
        a1 = tmp[t + 1] + tmp[t + 2]
        a2 = tmp[t + 1] - tmp[t + 2]
        a3 = dc - tmp[t + 3]
        out[t] = (a0 + a1) >> 3
        out[t + 1] = (a3 + a2) >> 3
        out[t + 2] = (a0 - a1) >> 3
        out[t + 3] = (a3 - a2) >> 3
    return out


# --- intra prediction (§12; exact reference formulas) -----------------------

def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _clip255(v):
    return 0 if v < 0 else 255 if v > 255 else v


def _pred_block(dst, off, stride, size, mode, top, left, tl,
                has_top, has_left):
    """Whole-block predictor (16x16 luma / 8x8 chroma): DC/V/H/TM.
    Only DC has edge-availability variants (§12.2); V/H/TM at frame
    edges use the 127 (above) / 129 (left) border fills passed in."""
    if mode == DC_PRED:
        if has_top and has_left:
            dc = (sum(top) + sum(left) + size) >> \
                (5 if size == 16 else 4)
        elif has_top:
            dc = (sum(top) + (size >> 1)) >> (4 if size == 16 else 3)
        elif has_left:
            dc = (sum(left) + (size >> 1)) >> (4 if size == 16 else 3)
        else:
            dc = 128
        row = [dc] * size
        for j in range(size):
            dst[off + j * stride: off + j * stride + size] = row
    elif mode == V_PRED:
        row = list(top)
        for j in range(size):
            dst[off + j * stride: off + j * stride + size] = row
    elif mode == H_PRED:
        for j in range(size):
            dst[off + j * stride: off + j * stride + size] = [left[j]] * size
    else:                                        # TM_PRED
        for j in range(size):
            b = off + j * stride
            lj = left[j] - tl
            for i in range(size):
                dst[b + i] = _clip255(lj + top[i])


def _pred4(dst, off, stride, mode, a, l_, tl):
    """4x4 sub-block predictor; ``a`` holds above[0:4]+above-right[4:8]."""
    if mode == B_DC:
        dc = (a[0] + a[1] + a[2] + a[3] + l_[0] + l_[1] + l_[2] + l_[3]
              + 4) >> 3
        for j in range(4):
            dst[off + j * stride: off + j * stride + 4] = [dc] * 4
    elif mode == B_TM:
        for j in range(4):
            b = off + j * stride
            d = l_[j] - tl
            for i in range(4):
                dst[b + i] = _clip255(d + a[i])
    elif mode == B_VE:
        row = [_avg3(tl, a[0], a[1]), _avg3(a[0], a[1], a[2]),
               _avg3(a[1], a[2], a[3]), _avg3(a[2], a[3], a[4])]
        for j in range(4):
            dst[off + j * stride: off + j * stride + 4] = row
    elif mode == B_HE:
        vals = [_avg3(tl, l_[0], l_[1]), _avg3(l_[0], l_[1], l_[2]),
                _avg3(l_[1], l_[2], l_[3]), _avg3(l_[2], l_[3], l_[3])]
        for j in range(4):
            dst[off + j * stride: off + j * stride + 4] = [vals[j]] * 4
    else:
        # scatter-form modes: write via (x, y) cells
        def put(x, y, v):
            dst[off + y * stride + x] = v
        i_, j_, k_, m_ = l_[0], l_[1], l_[2], l_[3]
        x_ = tl
        if mode == B_RD:
            put(0, 3, _avg3(j_, k_, m_))
            v = _avg3(i_, j_, k_)
            put(0, 2, v); put(1, 3, v)
            v = _avg3(x_, i_, j_)
            put(0, 1, v); put(1, 2, v); put(2, 3, v)
            v = _avg3(a[0], x_, i_)
            put(0, 0, v); put(1, 1, v); put(2, 2, v); put(3, 3, v)
            v = _avg3(a[1], a[0], x_)
            put(1, 0, v); put(2, 1, v); put(3, 2, v)
            v = _avg3(a[2], a[1], a[0])
            put(2, 0, v); put(3, 1, v)
            put(3, 0, _avg3(a[3], a[2], a[1]))
        elif mode == B_VR:
            v = _avg2(x_, a[0]); put(0, 0, v); put(1, 2, v)
            v = _avg2(a[0], a[1]); put(1, 0, v); put(2, 2, v)
            v = _avg2(a[1], a[2]); put(2, 0, v); put(3, 2, v)
            put(3, 0, _avg2(a[2], a[3]))
            put(0, 3, _avg3(k_, j_, i_))
            put(0, 2, _avg3(j_, i_, x_))
            v = _avg3(i_, x_, a[0]); put(0, 1, v); put(1, 3, v)
            v = _avg3(x_, a[0], a[1]); put(1, 1, v); put(2, 3, v)
            v = _avg3(a[0], a[1], a[2]); put(2, 1, v); put(3, 3, v)
            put(3, 1, _avg3(a[1], a[2], a[3]))
        elif mode == B_LD:
            put(0, 0, _avg3(a[0], a[1], a[2]))
            v = _avg3(a[1], a[2], a[3]); put(1, 0, v); put(0, 1, v)
            v = _avg3(a[2], a[3], a[4]); put(2, 0, v); put(1, 1, v)
            put(0, 2, v)
            v = _avg3(a[3], a[4], a[5])
            put(3, 0, v); put(2, 1, v); put(1, 2, v); put(0, 3, v)
            v = _avg3(a[4], a[5], a[6]); put(3, 1, v); put(2, 2, v)
            put(1, 3, v)
            v = _avg3(a[5], a[6], a[7]); put(3, 2, v); put(2, 3, v)
            put(3, 3, _avg3(a[6], a[7], a[7]))
        elif mode == B_VL:
            put(0, 0, _avg2(a[0], a[1]))
            v = _avg2(a[1], a[2]); put(1, 0, v); put(0, 2, v)
            v = _avg2(a[2], a[3]); put(2, 0, v); put(1, 2, v)
            v = _avg2(a[3], a[4]); put(3, 0, v); put(2, 2, v)
            put(0, 1, _avg3(a[0], a[1], a[2]))
            v = _avg3(a[1], a[2], a[3]); put(1, 1, v); put(0, 3, v)
            v = _avg3(a[2], a[3], a[4]); put(2, 1, v); put(1, 3, v)
            v = _avg3(a[3], a[4], a[5]); put(3, 1, v); put(2, 3, v)
            put(3, 2, _avg3(a[4], a[5], a[6]))
            put(3, 3, _avg3(a[5], a[6], a[7]))
        elif mode == B_HD:
            v = _avg2(i_, x_); put(0, 0, v); put(2, 1, v)
            v = _avg2(j_, i_); put(0, 1, v); put(2, 2, v)
            v = _avg2(k_, j_); put(0, 2, v); put(2, 3, v)
            put(0, 3, _avg2(m_, k_))
            put(3, 0, _avg3(a[2], a[1], a[0]))
            put(2, 0, _avg3(a[1], a[0], x_))
            v = _avg3(a[0], x_, i_); put(1, 0, v); put(3, 1, v)
            v = _avg3(x_, i_, j_); put(1, 1, v); put(3, 2, v)
            v = _avg3(i_, j_, k_); put(1, 2, v); put(3, 3, v)
            put(1, 3, _avg3(j_, k_, m_))
        else:                                    # B_HU
            put(0, 0, _avg2(i_, j_))
            v = _avg2(j_, k_); put(2, 0, v); put(0, 1, v)
            v = _avg2(k_, m_); put(2, 1, v); put(0, 2, v)
            put(1, 0, _avg3(i_, j_, k_))
            v = _avg3(j_, k_, m_); put(3, 0, v); put(1, 1, v)
            v = _avg3(k_, m_, m_); put(3, 1, v); put(1, 2, v)
            for x, y in ((3, 2), (2, 2), (0, 3), (1, 3), (2, 3), (3, 3)):
                put(x, y, m_)


# --- in-loop deblocking filter (§15; exact reference arithmetic) ------------

def _sc1(v):
    return -128 if v < -128 else 127 if v > 127 else v


def _sc2(v):
    return -16 if v < -16 else 15 if v > 15 else v


def _do_filter2(p, off, step):
    p1, p0, q0, q1 = p[off - 2 * step], p[off - step], p[off], p[off + step]
    a = 3 * (q0 - p0) + _sc1(p1 - q1)
    a1 = _sc2((a + 4) >> 3)
    a2 = _sc2((a + 3) >> 3)
    p[off - step] = _clip255(p0 + a2)
    p[off] = _clip255(q0 - a1)


def _do_filter4(p, off, step):
    p1, p0, q0, q1 = p[off - 2 * step], p[off - step], p[off], p[off + step]
    a = 3 * (q0 - p0)
    a1 = _sc2((a + 4) >> 3)
    a2 = _sc2((a + 3) >> 3)
    a3 = (a1 + 1) >> 1
    p[off - 2 * step] = _clip255(p1 + a3)
    p[off - step] = _clip255(p0 + a2)
    p[off] = _clip255(q0 - a1)
    p[off + step] = _clip255(q1 - a3)


def _do_filter6(p, off, step):
    p2, p1, p0 = p[off - 3 * step], p[off - 2 * step], p[off - step]
    q0, q1, q2 = p[off], p[off + step], p[off + 2 * step]
    a = _sc1(3 * (q0 - p0) + _sc1(p1 - q1))
    a1 = (27 * a + 63) >> 7
    a2 = (18 * a + 63) >> 7
    a3 = (9 * a + 63) >> 7
    p[off - 3 * step] = _clip255(p2 + a3)
    p[off - 2 * step] = _clip255(p1 + a2)
    p[off - step] = _clip255(p0 + a1)
    p[off] = _clip255(q0 - a1)
    p[off + step] = _clip255(q1 - a2)
    p[off + 2 * step] = _clip255(q2 - a3)


def _hev(p, off, step, t):
    p1, p0, q0, q1 = p[off - 2 * step], p[off - step], p[off], p[off + step]
    return abs(p1 - p0) > t or abs(q1 - q0) > t


def _needs_filter(p, off, step, t):
    p1, p0, q0, q1 = p[off - 2 * step], p[off - step], p[off], p[off + step]
    return 4 * abs(p0 - q0) + abs(p1 - q1) <= t


def _needs_filter2(p, off, step, t, it):
    p3, p2, p1 = p[off - 4 * step], p[off - 3 * step], p[off - 2 * step]
    p0, q0 = p[off - step], p[off]
    q1, q2, q3 = p[off + step], p[off + 2 * step], p[off + 3 * step]
    if 4 * abs(p0 - q0) + abs(p1 - q1) > t:
        return False
    return (abs(p3 - p2) <= it and abs(p2 - p1) <= it
            and abs(p1 - p0) <= it and abs(q3 - q2) <= it
            and abs(q2 - q1) <= it and abs(q1 - q0) <= it)


def _filter_loop(p, off, hstride, vstride, size, thresh, ithresh, hev_t,
                 edge: bool):
    thresh2 = 2 * thresh + 1
    for _ in range(size):
        if _needs_filter2(p, off, hstride, thresh2, ithresh):
            if _hev(p, off, hstride, hev_t):
                _do_filter2(p, off, hstride)
            else:
                (_do_filter6 if edge else _do_filter4)(p, off, hstride)
        off += vstride


def _simple_filter16(p, off, stride, thresh, horizontal: bool):
    thresh2 = 2 * thresh + 1
    if horizontal:                # vertical edge, filter across columns
        for i in range(16):
            if _needs_filter(p, off + i * stride, 1, thresh2):
                _do_filter2(p, off + i * stride, 1)
    else:                         # horizontal edge
        for i in range(16):
            if _needs_filter(p, off + i, stride, thresh2):
                _do_filter2(p, off + i, stride)


def _loop_filter(h, Y, U, V, S, S2, mbw, mbh, finfo):
    """Raster-order per-MB deblocking (§15.2-15.3); finfo[i] =
    (limit, ilevel, hev_thresh, inner)."""
    for mby in range(mbh):
        for mbx in range(mbw):
            limit, il, hev_t, inner = finfo[mby * mbw + mbx]
            if limit == 0:
                continue
            yo = mby * 16 * S + mbx * 16
            if h.filter_simple:
                if mbx > 0:
                    _simple_filter16(Y, yo, S, limit + 4, True)
                if inner:
                    for k in (4, 8, 12):
                        _simple_filter16(Y, yo + k, S, limit, True)
                if mby > 0:
                    _simple_filter16(Y, yo, S, limit + 4, False)
                if inner:
                    for k in (4, 8, 12):
                        _simple_filter16(Y, yo + k * S, S, limit, False)
            else:
                uo = mby * 8 * S2 + mbx * 8
                if mbx > 0:
                    _filter_loop(Y, yo, 1, S, 16, limit + 4, il, hev_t, True)
                    _filter_loop(U, uo, 1, S2, 8, limit + 4, il, hev_t, True)
                    _filter_loop(V, uo, 1, S2, 8, limit + 4, il, hev_t, True)
                if inner:
                    for k in (4, 8, 12):
                        _filter_loop(Y, yo + k, 1, S, 16, limit, il, hev_t,
                                     False)
                    _filter_loop(U, uo + 4, 1, S2, 8, limit, il, hev_t, False)
                    _filter_loop(V, uo + 4, 1, S2, 8, limit, il, hev_t, False)
                if mby > 0:
                    _filter_loop(Y, yo, S, 1, 16, limit + 4, il, hev_t, True)
                    _filter_loop(U, uo, S2, 1, 8, limit + 4, il, hev_t, True)
                    _filter_loop(V, uo, S2, 1, 8, limit + 4, il, hev_t, True)
                if inner:
                    for k in (4, 8, 12):
                        _filter_loop(Y, yo + k * S, S, 1, 16, limit, il,
                                     hev_t, False)
                    _filter_loop(U, uo + 4 * S2, S2, 1, 8, limit, il, hev_t,
                                 False)
                    _filter_loop(V, uo + 4 * S2, S2, 1, 8, limit, il, hev_t,
                                 False)


def _filter_strength(h, seg, i4x4):
    """(limit, ilevel, hev_thresh) per segment+mode (§15.1-15.2)."""
    if h.segmentation:
        level = h.seg_lf[seg] if h.seg_abs else h.filter_level + h.seg_lf[seg]
    else:
        level = h.filter_level
    if h.lf_delta:
        level += h.ref_lf_delta[0]
        if i4x4:
            level += h.mode_lf_delta[0]
    level = 0 if level < 0 else 63 if level > 63 else level
    if level == 0:
        return (0, 0, 0)
    ilevel = level
    if h.sharpness > 0:
        ilevel >>= 2 if h.sharpness > 4 else 1
        if ilevel > 9 - h.sharpness:
            ilevel = 9 - h.sharpness
    if ilevel < 1:
        ilevel = 1
    hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
    return (2 * level + ilevel, ilevel, hev_t)


# --- frame decode ------------------------------------------------------------

def decode_vp8_frame(data: bytes):
    """Decode a VP8 key frame to raw planes: ``(width, height, y, u, v)``
    with y row-major WxH and u/v ceil(W/2) x ceil(H/2) (4:2:0) — the
    representation ``WebPDecodeYUV`` emits, used for byte-exact
    cross-validation."""
    h = _parse_headers(data)
    mbw = (h.width + 15) >> 4
    mbh = (h.height + 15) >> 4
    rest = data[h.part1_end:]
    np_ = h.n_parts
    pos = 3 * (np_ - 1)
    parts = []
    for i in range(np_ - 1):
        sz = rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
        parts.append(_BoolDecoder(rest[pos:pos + sz]))
        pos += sz
    parts.append(_BoolDecoder(rest[pos:]))
    mbs = _parse_intra_modes(h, mbw, mbh)
    dq = _dequant_factors(h)
    probs = h.coef_probs
    S, S2 = mbw * 16, mbw * 8
    Y = [0] * (S * mbh * 16)
    U = [0] * (S2 * mbh * 8)
    V = [0] * (S2 * mbh * 8)
    above_nz = [[0] * 9 for _ in range(mbw)]     # 4 luma, 2 U, 2 V, 1 Y2
    finfo = []

    for mby in range(mbh):
        left_nz = [0] * 9
        bd = parts[mby & (np_ - 1)]
        for mbx in range(mbw):
            seg, skip, ymode, bmodes, uvmode = mbs[mby * mbw + mbx]
            an, ln = above_nz[mbx], left_nz
            has_y2 = ymode != B_PRED
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dq[seg]
            lc = [[0] * 16 for _ in range(16)]   # luma coeffs
            cc = [[0] * 16 for _ in range(8)]    # chroma coeffs (4 U + 4 V)
            any_nz = 0
            if not skip:
                if has_y2:
                    c2, nz2 = _get_coeffs(bd, probs[1], an[8] + ln[8], 0,
                                          y2dc, y2ac)
                    an[8] = ln[8] = nz2
                    any_nz |= nz2
                    dcs = _iwht(c2)
                    plane, first = 0, 1
                else:
                    plane, first = 3, 0
                bnz = [[0] * 4 for _ in range(4)]
                for by in range(4):
                    for bx in range(4):
                        ctx = ((an[bx] if by == 0 else bnz[by - 1][bx])
                               + (ln[by] if bx == 0 else bnz[by][bx - 1]))
                        cf, nzb = _get_coeffs(bd, probs[plane], ctx, first,
                                              y1dc, y1ac)
                        if has_y2:
                            cf[0] = dcs[by * 4 + bx]
                        lc[by * 4 + bx] = cf
                        bnz[by][bx] = nzb
                        any_nz |= nzb or (cf[0] != 0)
                for i in range(4):
                    an[i] = bnz[3][i]
                    ln[i] = bnz[i][3]
                for p_i, base in ((0, 4), (1, 6)):       # U then V
                    cnz = [[0] * 2 for _ in range(2)]
                    for by in range(2):
                        for bx in range(2):
                            ctx = ((an[base + bx] if by == 0
                                    else cnz[by - 1][bx])
                                   + (ln[base + by] if bx == 0
                                      else cnz[by][bx - 1]))
                            cf, nzb = _get_coeffs(bd, probs[2], ctx, 0,
                                                  uvdc, uvac)
                            cc[p_i * 4 + by * 2 + bx] = cf
                            cnz[by][bx] = nzb
                            any_nz |= nzb
                    for i in range(2):
                        an[base + i] = cnz[1][i]
                        ln[base + i] = cnz[i][1]
            else:
                for i in range(8):
                    an[i] = ln[i] = 0
                if has_y2:
                    an[8] = ln[8] = 0
                if has_y2:
                    dcs = [0] * 16
            skip_final = 1 if (skip or not any_nz) else 0
            inner = (ymode == B_PRED) or not skip_final
            lim, il, hv = _filter_strength(h, seg, ymode == B_PRED)
            finfo.append((lim if h.filter_level > 0 else 0, il, hv, inner))

            # ---- reconstruction
            x0, y0 = mbx * 16, mby * 16
            if mby > 0:
                topx = Y[(y0 - 1) * S + x0:(y0 - 1) * S + x0 + 16]
                if mbx == mbw - 1:
                    tr = [Y[(y0 - 1) * S + x0 + 15]] * 4
                else:
                    tr = Y[(y0 - 1) * S + x0 + 16:(y0 - 1) * S + x0 + 20]
                tl = Y[(y0 - 1) * S + x0 - 1] if mbx > 0 else 129
            else:
                topx, tr, tl = [127] * 16, [127] * 4, 127
            leftx = ([Y[(y0 + j) * S + x0 - 1] for j in range(16)]
                     if mbx > 0 else [129] * 16)
            if ymode != B_PRED:
                _pred_block(Y, y0 * S + x0, S, 16, ymode, topx, leftx, tl,
                            mby > 0, mbx > 0)
                for by in range(4):
                    for bx in range(4):
                        cf = lc[by * 4 + bx]
                        if any(cf):
                            _idct_add(Y, (y0 + 4 * by) * S + x0 + 4 * bx,
                                      S, cf)
            else:
                for by in range(4):
                    for bx in range(4):
                        gx, gy = x0 + 4 * bx, y0 + 4 * by
                        if by == 0:
                            a4 = topx[4 * bx:4 * bx + 4]
                            t4 = tl if bx == 0 else topx[4 * bx - 1]
                        else:
                            a4 = Y[(gy - 1) * S + gx:(gy - 1) * S + gx + 4]
                            t4 = (leftx[4 * by - 1] if bx == 0
                                  else Y[(gy - 1) * S + gx - 1])
                        if bx == 3:
                            ar = tr
                        elif by == 0:
                            ar = topx[4 * bx + 4:4 * bx + 8]
                        else:
                            ar = Y[(gy - 1) * S + gx + 4:
                                   (gy - 1) * S + gx + 8]
                        l4 = (leftx[4 * by:4 * by + 4] if bx == 0 else
                              [Y[(gy + j) * S + gx - 1] for j in range(4)])
                        _pred4(Y, gy * S + gx, S, bmodes[by * 4 + bx],
                               a4 + ar, l4, t4)
                        cf = lc[by * 4 + bx]
                        if any(cf):
                            _idct_add(Y, gy * S + gx, S, cf)
            # chroma
            cx0, cy0 = mbx * 8, mby * 8
            for plane_arr, coff in ((U, 0), (V, 4)):
                if mby > 0:
                    ctop = plane_arr[(cy0 - 1) * S2 + cx0:
                                     (cy0 - 1) * S2 + cx0 + 8]
                    ctl = (plane_arr[(cy0 - 1) * S2 + cx0 - 1]
                           if mbx > 0 else 129)
                else:
                    ctop, ctl = [127] * 8, 127
                cleft = ([plane_arr[(cy0 + j) * S2 + cx0 - 1]
                          for j in range(8)] if mbx > 0 else [129] * 8)
                _pred_block(plane_arr, cy0 * S2 + cx0, S2, 8, uvmode,
                            ctop, cleft, ctl, mby > 0, mbx > 0)
                for by in range(2):
                    for bx in range(2):
                        cf = cc[coff + by * 2 + bx]
                        if any(cf):
                            _idct_add(plane_arr,
                                      (cy0 + 4 * by) * S2 + cx0 + 4 * bx,
                                      S2, cf)

    if h.filter_level > 0:
        _loop_filter(h, Y, U, V, S, S2, mbw, mbh, finfo)

    W, H = h.width, h.height
    cw, ch_ = (W + 1) >> 1, (H + 1) >> 1
    yb = b"".join(bytes(Y[r * S:r * S + W]) for r in range(H))
    ub = b"".join(bytes(U[r * S2:r * S2 + cw]) for r in range(ch_))
    vb = b"".join(bytes(V[r * S2:r * S2 + cw]) for r in range(ch_))
    return W, H, yb, ub, vb


# --- YUV 4:2:0 -> RGBA (libwebp-exact fancy upsampling + fixed point) --------

def _yuv2rgba(y, u, v, out, off):
    """libwebp yuv.h fixed-point conversion (16.16 coefficients,
    6-bit final shift) — bit-exact with ``WebPDecodeRGBA``."""
    yg = (y * 19077) >> 8
    r = yg + ((v * 26149) >> 8) - 14234
    g = yg - ((u * 6419) >> 8) - ((v * 13320) >> 8) + 8708
    b = yg + ((u * 33050) >> 8) - 17685
    out[off] = (r >> 6) if 0 <= r < 16384 else (0 if r < 0 else 255)
    out[off + 1] = (g >> 6) if 0 <= g < 16384 else (0 if g < 0 else 255)
    out[off + 2] = (b >> 6) if 0 <= b < 16384 else (0 if b < 0 else 255)
    out[off + 3] = 255


def _upsample_rows(ty, by_, tu, tv, cu, cv, W, out, row_t, row_b):
    """One fancy-upsampler call (libwebp upsampling.c): emits luma row
    ``row_t`` (and ``row_b`` when ``by_`` is not None) mixing the two
    chroma rows 3:1, with the exact double-rounded diagonal kernel."""
    last_pair = (W - 1) >> 1
    tl_u, tl_v = tu[0], tv[0]
    l_u, l_v = cu[0], cv[0]
    _yuv2rgba(ty[0], (3 * tl_u + l_u + 2) >> 2, (3 * tl_v + l_v + 2) >> 2,
              out, row_t * W * 4)
    if by_ is not None:
        _yuv2rgba(by_[0], (3 * l_u + tl_u + 2) >> 2,
                  (3 * l_v + tl_v + 2) >> 2, out, row_b * W * 4)
    for x in range(1, last_pair + 1):
        t_u, t_v = tu[x], tv[x]
        u_, v_ = cu[x], cv[x]
        avg_u = tl_u + t_u + l_u + u_ + 8
        avg_v = tl_v + t_v + l_v + v_ + 8
        d12_u = (avg_u + 2 * (t_u + l_u)) >> 3
        d12_v = (avg_v + 2 * (t_v + l_v)) >> 3
        d03_u = (avg_u + 2 * (tl_u + u_)) >> 3
        d03_v = (avg_v + 2 * (tl_v + v_)) >> 3
        o = (row_t * W + 2 * x - 1) * 4
        _yuv2rgba(ty[2 * x - 1], (d12_u + tl_u) >> 1, (d12_v + tl_v) >> 1,
                  out, o)
        if 2 * x < W:
            _yuv2rgba(ty[2 * x], (d03_u + t_u) >> 1, (d03_v + t_v) >> 1,
                      out, o + 4)
        if by_ is not None:
            o = (row_b * W + 2 * x - 1) * 4
            _yuv2rgba(by_[2 * x - 1], (d03_u + l_u) >> 1,
                      (d03_v + l_v) >> 1, out, o)
            if 2 * x < W:
                _yuv2rgba(by_[2 * x], (d12_u + u_) >> 1, (d12_v + v_) >> 1,
                          out, o + 4)
        tl_u, l_u = t_u, u_
        tl_v, l_v = t_v, v_
    if not (W & 1) and W > 1:
        _yuv2rgba(ty[W - 1], (3 * tl_u + l_u + 2) >> 2,
                  (3 * tl_v + l_v + 2) >> 2, out, (row_t * W + W - 1) * 4)
        if by_ is not None:
            _yuv2rgba(by_[W - 1], (3 * l_u + tl_u + 2) >> 2,
                      (3 * l_v + tl_v + 2) >> 2, out,
                      (row_b * W + W - 1) * 4)


def yuv420_to_rgba(W, H, yb, ub, vb) -> bytes:
    """Full-frame fancy upsampling, row mapping per libwebp io_dec.c:
    row 0 and (for even H) the last row mirror the chroma boundary;
    interior rows pair (2k+1, 2k+2) against chroma rows (k, k+1)."""
    cw = (W + 1) >> 1
    yr = [yb[r * W:(r + 1) * W] for r in range(H)]
    ur = [ub[r * cw:(r + 1) * cw] for r in range((H + 1) >> 1)]
    vr = [vb[r * cw:(r + 1) * cw] for r in range((H + 1) >> 1)]
    out = bytearray(W * H * 4)
    _upsample_rows(yr[0], None, ur[0], vr[0], ur[0], vr[0], W, out, 0, None)
    y = 1
    k = 0
    while y + 1 < H:
        _upsample_rows(yr[y], yr[y + 1], ur[k], vr[k], ur[k + 1], vr[k + 1],
                       W, out, y, y + 1)
        y += 2
        k += 1
    if y < H:
        _upsample_rows(yr[y], None, ur[k], vr[k], ur[k], vr[k], W, out,
                       y, None)
    return bytes(out)


def decode_vp8_rgba(data: bytes):
    """Decode a VP8 key-frame payload to ``(width, height, rgba)`` —
    byte-exact with ``WebPDecodeRGBA`` (cross-validated in tests)."""
    W, H, yb, ub, vb = decode_vp8_frame(data)
    return W, H, yuv420_to_rgba(W, H, yb, ub, vb)


# --- minimal fixture encoder -------------------------------------------------
#
# Writes a real, spec-conformant VP8 key frame for MB-ALIGNED FLAT TILES
# (every 16x16 macroblock one constant YUV), at quantizer index 0 with
# the loop filter off.  Under those choices every decode step is exact
# integer math with zero quantization error, so the decoded planes equal
# the targets BY CONSTRUCTION — the same flat-quant oracle trick the
# lossy-JPEG fixtures use — giving the driver queries an analytically
# checkable REAL lossy payload without any encoder/decoder circularity.

class _BoolEncoder:
    """RFC 6386 §8 boolean encoder (arbitrary-precision carry handling;
    round-trips against :class:`_BoolDecoder`, property-tested)."""

    def __init__(self):
        self.low = 0
        self.rng = 255
        self.shifts = 0

    def bit(self, prob: int, b: int) -> None:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        if b:
            self.low += split
            self.rng -= split
        else:
            self.rng = split
        while self.rng < 128:
            self.low <<= 1
            self.rng <<= 1
            self.shifts += 1

    def literal(self, n: int, v: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bit(128, (v >> i) & 1)

    def finish(self) -> bytes:
        total = self.shifts + 16          # 16-bit preload + 1 bit/shift
        v = self.low << 8                 # interval base at codeword scale
        nbytes = (total + 7) // 8
        v <<= nbytes * 8 - total
        return v.to_bytes(nbytes, "big")


def _enc_dc_token(be, plane_probs, ctx: int, t: int) -> None:
    """Encode one block whose only coefficient is DC value ``t`` (then
    EOB), or an immediate EOB when t == 0."""
    p = plane_probs[T.COEF_BANDS[0]][ctx]
    if t == 0:
        be.bit(p[0], 0)
        return
    be.bit(p[0], 1)
    be.bit(p[1], 1)
    v = abs(t)
    if v == 1:
        be.bit(p[2], 0)
    else:
        be.bit(p[2], 1)
        if v <= 4:
            be.bit(p[3], 0)
            be.bit(p[4], 0 if v == 2 else 1)
            if v > 2:
                be.bit(p[5], v - 3)
        else:
            be.bit(p[3], 1)
            if v <= 6:
                be.bit(p[6], 0); be.bit(p[7], 0); base, cat = 5, 0
            elif v <= 10:
                be.bit(p[6], 0); be.bit(p[7], 1); base, cat = 7, 1
            elif v <= 18:
                be.bit(p[6], 1); be.bit(p[8], 0); be.bit(p[9], 0)
                base, cat = 11, 2
            elif v <= 34:
                be.bit(p[6], 1); be.bit(p[8], 0); be.bit(p[9], 1)
                base, cat = 19, 3
            elif v <= 66:
                be.bit(p[6], 1); be.bit(p[8], 1); be.bit(p[10], 0)
                base, cat = 35, 4
            else:
                be.bit(p[6], 1); be.bit(p[8], 1); be.bit(p[10], 1)
                base, cat = 67, 5
            extra = v - base
            probs = T.PCAT[cat]
            for i, pr in enumerate(probs):
                be.bit(pr, (extra >> (len(probs) - 1 - i)) & 1)
    be.bit(128, 1 if t < 0 else 0)
    # EOB at position 1 with the value-dependent context
    nxt = 1 if v == 1 else 2
    be.bit(plane_probs[T.COEF_BANDS[1]][nxt][0], 0)


def encode_vp8_tiles_py(width: int, height: int, tile_yuv) -> bytes:
    """Encode a key frame where macroblock (mx, my) is the constant
    ``tile_yuv(mx, my) -> (y, u, v)``; returns the VP8 payload (no RIFF
    wrapper).  qi=0, filter off: decode is exact by construction."""
    mbw = (width + 15) >> 4
    mbh = (height + 15) >> 4
    probs = T.DEFAULT_COEF_PROBS

    # plan per-MB deltas by simulating DC_PRED over the tile grid
    recon = {}
    plan = []                        # (skip, t_y2, t_u, t_v)
    for my in range(mbh):
        for mx in range(mbw):
            ty, tu, tv = tile_yuv(mx, my)
            preds = []
            for comp in range(3):
                up = recon.get((mx, my - 1))
                lf = recon.get((mx - 1, my))
                if up is not None and lf is not None:
                    pred = (up[comp] + lf[comp] + 1) >> 1
                elif up is not None:
                    pred = up[comp]
                elif lf is not None:
                    pred = lf[comp]
                else:
                    pred = 128
                preds.append(pred)
            dy, du, dv = ty - preds[0], tu - preds[1], tv - preds[2]
            t_y2 = 8 * dy - 4 if dy else 0       # (t+4)>>3 == dy
            t_u = 2 * du - 1 if du else 0        # (t+1)>>1 == du
            t_v = 2 * dv - 1 if dv else 0
            plan.append((1 if not (dy or du or dv) else 0, t_y2, t_u, t_v))
            recon[(mx, my)] = (ty, tu, tv)

    # first partition: header + mode records
    be = _BoolEncoder()
    be.bit(128, 0)                   # color space
    be.bit(128, 0)                   # clamping
    be.bit(128, 0)                   # segmentation off
    be.bit(128, 0)                   # filter type (irrelevant at level 0)
    be.literal(6, 0)                 # filter level 0
    be.literal(3, 0)                 # sharpness
    be.bit(128, 0)                   # lf deltas off
    be.literal(2, 0)                 # one token partition
    be.literal(7, 0)                 # y_ac_qi = 0
    for _ in range(5):               # all quantizer deltas absent
        be.bit(128, 0)
    be.bit(128, 1)                   # refresh entropy probs
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l_ in range(11):
                    be.bit(T.COEF_UPDATE_PROBS[i][j][k][l_], 0)
    be.bit(128, 1)                   # mb_no_coeff_skip
    be.literal(8, 128)               # prob_skip_false
    for skip, _t, _u, _v in plan:
        be.bit(128, skip)            # skip flag (prob 128)
        be.bit(T.KF_YMODE_PROB[0], 1)    # not B_PRED
        be.bit(T.KF_YMODE_PROB[1], 0)
        be.bit(T.KF_YMODE_PROB[2], 0)    # -> DC_PRED
        be.bit(T.KF_UV_MODE_PROB[0], 0)  # chroma DC_PRED
    part1 = be.finish()

    # token partition (decoder-identical context bookkeeping)
    te = _BoolEncoder()
    above = [[0] * 9 for _ in range(mbw)]
    for my in range(mbh):
        left = [0] * 9
        for mx in range(mbw):
            skip, t_y2, t_u, t_v = plan[my * mbw + mx]
            an, ln = above[mx], left
            if skip:
                for i in range(9):
                    an[i] = ln[i] = 0
                continue
            _enc_dc_token(te, probs[1], an[8] + ln[8], t_y2)
            an[8] = ln[8] = 1 if t_y2 else 0
            for _blk in range(16):           # luma: EOB-only, ctx 0
                te.bit(probs[0][T.COEF_BANDS[1]][0][0], 0)
            for i in range(4):
                an[i] = ln[i] = 0
            for base, t_c in ((4, t_u), (6, t_v)):
                cnz = [[0] * 2 for _ in range(2)]
                for by in range(2):
                    for bx in range(2):
                        ctx = ((an[base + bx] if by == 0
                                else cnz[by - 1][bx])
                               + (ln[base + by] if bx == 0
                                  else cnz[by][bx - 1]))
                        _enc_dc_token(te, probs[2], ctx, t_c)
                        cnz[by][bx] = 1 if t_c else 0
                for i in range(2):
                    an[base + i] = cnz[1][i]
                    ln[base + i] = cnz[i][1]
    tokens = te.finish()

    tag = (len(part1) << 5) | (0 << 4) | (0 << 1) | 0
    tag |= 1 << 4                    # show_frame
    head = bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    head += b"\x9d\x01\x2a"
    head += bytes((width & 0xFF, (width >> 8) & 0x3F,
                   height & 0xFF, (height >> 8) & 0x3F))
    return head + part1 + tokens


def wrap_webp_vp8(payload: bytes) -> bytes:
    """RIFF/WEBP container around a raw VP8 frame."""
    chunk = b"VP8 " + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def vp8_flat_rgb(y: int, u: int, v: int):
    """Closed-form (r, g, b) for a uniformly-(y,u,v) region after 4:2:0
    upsampling (uniform chroma is a fixed point of the fancy kernel) and
    the libwebp fixed-point YUV->RGB conversion — used to build
    decoder-independent oracles for the tile fixtures."""
    yg = (y * 19077) >> 8
    r = yg + ((v * 26149) >> 8) - 14234
    g = yg - ((u * 6419) >> 8) - ((v * 13320) >> 8) + 8708
    b = yg + ((u * 33050) >> 8) - 17685

    def c6(x):
        return (x >> 6) if 0 <= x < 16384 else (0 if x < 0 else 255)
    return c6(r), c6(g), c6(b)
