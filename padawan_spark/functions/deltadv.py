"""Delta Lake deletion-vector codec, dependency-free (the PUBLIC Delta
protocol's "Deletion Vectors" feature, default-on in modern writers):
a DV marks rows of a parquet data file as deleted BY POSITION without
rewriting the file, stored as a serialized ``RoaringBitmapArray``
either inline in the add action (Z85 text) or in a sidecar ``.bin``
file.

This module decodes (and, for fixtures, encodes) the full public
format stack:

- Z85 text codec (ZeroMQ base85 alphabet; Delta pads input to a
  4-byte multiple and truncates on decode via the descriptor's
  ``sizeInBytes``);
- the 64-bit ``RoaringBitmapArray`` "portable" serialization
  (8-byte LE bitmap count, then per bitmap a 4-byte LE high key +
  a standard 32-bit RoaringBitmap);
- the standard 32-bit RoaringBitmap portable format (cookies 12346/
  12347, array / bitmap / run containers);
- the DV file layout (version byte, per-DV ``[4-byte BE size][data]
  [4-byte BE CRC32]`` records, 4-byte LE magic ``1681511377`` heading
  the data).

Scale shape: a DV is O(deleted rows) compressed — decoding happens
once, driver-side, per add-action that carries one (the same work any
Delta reader does); the resulting positions feed a broadcast anti-join
against ``_metadata.row_index``, so the data files themselves are
still one distributed parquet scan with no rewrite.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

_Z85 = ("0123456789abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_INV = {c: i for i, c in enumerate(_Z85)}

DV_MAGIC = 1681511377
_COOKIE_RUN = 12346
_COOKIE_NO_RUN = 12347


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85 (Delta's Base85Codec pads to a 4-byte multiple with
    zero bytes; pass the unpadded data here, decode truncates back)."""
    if len(data) % 4:
        data = data + b"\x00" * (4 - len(data) % 4)
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str, out_len: int | None = None) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 text length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i:i + 5]:
            v = v * 85 + _Z85_INV[c]
        out += v.to_bytes(4, "big")
    return bytes(out[:out_len]) if out_len is not None else bytes(out)


# ---------------------------------------------------------------------------
# 32-bit RoaringBitmap, standard portable format
# ---------------------------------------------------------------------------


def _rb32_decode(b: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one 32-bit RoaringBitmap at ``pos``; returns (sorted
    values, next position)."""
    cookie = struct.unpack_from("<I", b, pos)[0]
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        size = (cookie >> 16) + 1
        pos += 4
        nbytes = (size + 7) // 8
        run_flags = b[pos:pos + nbytes]
        pos += nbytes
        has_run = True
    elif cookie == _COOKIE_NO_RUN:
        size = struct.unpack_from("<I", b, pos + 4)[0]
        pos += 8
        run_flags = b""
        has_run = False
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys, cards = [], []
    for i in range(size):
        k, cm1 = struct.unpack_from("<HH", b, pos)
        pos += 4
        keys.append(k)
        cards.append(cm1 + 1)
    if not has_run or size >= 4:
        pos += 4 * size                       # offset header, recomputable
    vals: list[int] = []
    for i in range(size):
        base = keys[i] << 16
        is_run = has_run and bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            n_runs = struct.unpack_from("<H", b, pos)[0]
            pos += 2
            for _ in range(n_runs):
                start, lm1 = struct.unpack_from("<HH", b, pos)
                pos += 4
                vals.extend(base + v for v in range(start, start + lm1 + 1))
        elif cards[i] <= 4096:
            arr = struct.unpack_from(f"<{cards[i]}H", b, pos)
            pos += 2 * cards[i]
            vals.extend(base + v for v in arr)
        else:
            words = struct.unpack_from("<1024Q", b, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    vals.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
    return vals, pos


def _rb32_encode(values: list[int]) -> bytes:
    """Encode sorted 16.16-split values as a no-run-container portable
    bitmap (array containers <=4096 cardinality, bitmap containers
    above — the exact shapes real writers emit for non-run data)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray(struct.pack("<II", _COOKIE_NO_RUN, len(keys)))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header: starts after cookie+size (8) + headers (4/ctr) +
    # offsets (4/ctr)
    at = 8 + 8 * len(keys)
    payloads = []
    for k in keys:
        vals = sorted(containers[k])
        if len(vals) <= 4096:
            payload = struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            payload = struct.pack("<1024Q", *words)
        payloads.append(payload)
        out += struct.pack("<I", at)
        at += len(payload)
    for p in payloads:
        out += p
    return bytes(out)


# ---------------------------------------------------------------------------
# 64-bit RoaringBitmapArray (Delta's "portable" flavour)
# ---------------------------------------------------------------------------


def bitmap_array_decode(b: bytes) -> list[int]:
    """Serialized RoaringBitmapArray -> sorted 64-bit positions."""
    n = struct.unpack_from("<q", b, 0)[0]
    pos, vals = 8, []
    for _ in range(n):
        high = struct.unpack_from("<I", b, pos)[0]
        pos += 4
        lows, pos = _rb32_decode(b, pos)
        vals.extend((high << 32) | v for v in lows)
    return vals


def bitmap_array_encode(positions: list[int]) -> bytes:
    groups: dict[int, list[int]] = {}
    for p in sorted(positions):
        groups.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<q", len(groups)))
    for high in sorted(groups):
        out += struct.pack("<I", high)
        out += _rb32_encode(groups[high])
    return bytes(out)


# ---------------------------------------------------------------------------
# DV data blob / file / descriptor
# ---------------------------------------------------------------------------


def dv_blob_encode(positions: list[int]) -> bytes:
    """``magic + RoaringBitmapArray`` — the unit that is z85-inlined or
    framed into a ``.bin`` file."""
    return struct.pack("<I", DV_MAGIC) + bitmap_array_encode(positions)


def dv_blob_decode(data: bytes) -> list[int]:
    magic = struct.unpack_from("<I", data, 0)[0]
    if magic != DV_MAGIC:
        raise ValueError(f"bad DV magic {magic} (want {DV_MAGIC})")
    return bitmap_array_decode(data[4:])


def dv_absolute_path(table_path: str, descriptor: dict) -> str:
    """The on-disk sidecar path a storageType ``u`` descriptor
    addresses (z85 uid suffix + optional directory prefix)."""
    enc = descriptor["pathOrInlineDv"]
    prefix, uid20 = enc[:-20], enc[-20:]
    uid = _uuid.UUID(bytes=z85_decode(uid20, out_len=16))
    fname = f"deletion_vector_{uid}.bin"
    return os.path.join(table_path, prefix, fname) if prefix \
        else os.path.join(table_path, fname)


def read_dv_positions(table_path: str, descriptor: dict) -> list[int]:
    """Deletion-vector descriptor (the add action's ``deletionVector``
    struct) -> sorted deleted row positions."""
    st = descriptor["storageType"]
    size = int(descriptor["sizeInBytes"])
    if st == "i":
        data = z85_decode(descriptor["pathOrInlineDv"], out_len=size)
        return dv_blob_decode(data)
    if st == "u":
        fpath = dv_absolute_path(table_path, descriptor)
    elif st == "p":
        fpath = descriptor["pathOrInlineDv"]
    else:
        raise NotImplementedError(f"DV storageType {st!r}")
    with open(fpath, "rb") as fh:
        raw = fh.read()
    if raw[0] != 1:
        raise NotImplementedError(f"DV file format version {raw[0]}")
    off = int(descriptor["offset"])
    dsz = struct.unpack_from(">i", raw, off)[0]
    if dsz != size:
        raise ValueError(f"DV size mismatch: frame {dsz} vs "
                         f"descriptor {size}")
    data = raw[off + 4:off + 4 + dsz]
    crc = struct.unpack_from(">I", raw, off + 4 + dsz)[0]
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("DV checksum mismatch")
    return dv_blob_decode(data)


def write_dv_file_fixture(table_path: str,
                          dv_positions: list[list[int]]) -> list[dict]:
    """FIXTURE: write one DV ``.bin`` file holding a vector per entry
    of ``dv_positions``; returns the matching descriptors (storageType
    ``u``).  Spec-layout output for the READER to be verified
    against."""
    uid = _uuid.uuid4()
    raw = bytearray(b"\x01")
    descs = []
    for positions in dv_positions:
        data = dv_blob_encode(positions)
        off = len(raw)
        raw += struct.pack(">i", len(data)) + data
        raw += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        descs.append({"storageType": "u",
                      "pathOrInlineDv": z85_encode(uid.bytes),
                      "offset": off, "sizeInBytes": len(data),
                      "cardinality": len(positions)})
    with open(os.path.join(table_path, f"deletion_vector_{uid}.bin"),
              "wb") as fh:
        fh.write(bytes(raw))
    return descs


def inline_dv_fixture(positions: list[int]) -> dict:
    """FIXTURE: inline (storageType ``i``) descriptor."""
    data = dv_blob_encode(positions)
    return {"storageType": "i", "pathOrInlineDv": z85_encode(data),
            "offset": None, "sizeInBytes": len(data),
            "cardinality": len(positions)}
