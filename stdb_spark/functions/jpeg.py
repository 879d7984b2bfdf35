"""Baseline JPEG codec in pure stdlib (struct) + numpy.

Implemented from the public specs — ITU-T T.81 (ISO/IEC 10918-1)
baseline sequential DCT, JFIF color conventions — with no codec
libraries:

- decoder: SOI/APPn/DQT/SOF0/DHT/DRI/SOS marker walk, canonical
  Huffman tables, byte-stuffed entropy stream with restart markers,
  per-MCU block decode (DC prediction + AC run-length + zigzag),
  dequantization, exact separable 2-D IDCT (orthonormal DCT-III via a
  cached basis matrix), nearest-neighbor chroma upsampling, JFIF
  YCbCr -> RGB.
- encoder (test/fixture support): 4:4:4 (or grayscale) baseline with
  the T.81 Annex K example quantization + Huffman tables, scaled by a
  libjpeg-style quality factor.

Progressive (SOF2), arithmetic coding, 12-bit precision and
hierarchical modes raise ``DecodeUnavailable`` — the same declared
boundary the other multimodal codecs use.  The point is capability,
not speed: decode cost is ~ms per small image inside the Arrow-batched
feature extractors; a real deployment swaps in Pillow/turbojpeg
without touching any plan.
"""

from __future__ import annotations

import struct

import numpy as np

#: zigzag order: index = zigzag position, value = row-major position
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# T.81 Annex K.1 example quantization tables (the de-facto standard)
QTBL_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QTBL_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# T.81 Annex K.3 example Huffman tables: (bits per length 1..16, values)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _decode_unavailable(msg: str):
    # local import avoids a module cycle (multimodal imports this file)
    from stdb_spark.functions.multimodal import DecodeUnavailable

    return DecodeUnavailable(msg)


# ------------------------------------------------------------------ DCT
def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis C with C[k, n] = a(k) cos((2n+1)kπ/16);
    block_dct = C @ block @ C.T, block = C.T @ coeffs @ C."""
    n = np.arange(8)
    k = n[:, None]
    c = np.cos((2 * n[None, :] + 1) * k * np.pi / 16)
    c[0, :] *= 1 / np.sqrt(2)
    return c * 0.5


_C = _dct_basis()


def _idct2(coeffs: np.ndarray) -> np.ndarray:
    return _C.T @ coeffs @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# ------------------------------------------------------- Huffman tables
class _HuffTable:
    """Canonical JPEG Huffman table: (length, code) -> symbol."""

    def __init__(self, bits: list[int], values: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        idx = 0
        self.maxlen = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[idx]
                idx += 1
                code += 1
                self.maxlen = length
            code <<= 1
        # encoder direction
        self.codes: dict[int, tuple[int, int]] = {}
        code = 0
        idx = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.codes[values[idx]] = (length, code)
                idx += 1
                code += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-stuffing removal; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resyncs via align_restart
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    # EOI or other marker: pad with zeros
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8
        # Drop already-consumed high bits: without this mask the Python
        # int grows 8 bits per byte scanned and entropy decode turns
        # O(n^2) in scan size on large images.
        self.bitbuf &= (1 << self.nbits) - 1

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise _decode_unavailable("corrupt JPEG: no Huffman code matched")

    def align_restart(self) -> None:
        """Drop partial bits and skip the RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ----------------------------------------------------------- decoder
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> uint8 array (h, w) grayscale or
    (h, w, 3) RGB.  Non-baseline modes raise DecodeUnavailable, and so
    do truncated/corrupt payloads — raw parse errors must not escape
    into the Spark extractors, whose fallback catches exactly
    DecodeUnavailable."""
    try:
        return _decode_jpeg_impl(payload)
    except NotImplementedError:
        raise  # DecodeUnavailable passes through unchanged
    except (struct.error, IndexError, ValueError, KeyError, TypeError) as exc:
        raise _decode_unavailable(f"corrupt JPEG payload: {exc}") from exc


def _decode_jpeg_impl(payload: bytes) -> np.ndarray:
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise _decode_unavailable("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise _decode_unavailable("corrupt JPEG: expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(body[p : p + 64], dtype=np.uint8).astype(
                        np.int64
                    )
                    p += 64
                else:
                    tbl = np.frombuffer(
                        body[p : p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = tbl
                qtables[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                values = list(body[p + 17 : p + 17 + nv])
                htables[(tc, th)] = _HuffTable(bits, values)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise _decode_unavailable(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise _decode_unavailable(
                f"unsupported JPEG mode (SOF{marker - 0xC0}); baseline only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                scan.append({"cs": cs, "td": tables >> 4, "ta": tables & 0xF})
            return _decode_scan(
                payload, pos + seglen, frame, scan, qtables, htables,
                restart_interval,
            )
        pos += seglen
    raise _decode_unavailable("malformed JPEG: no SOS marker")


def _decode_scan(
    data, pos, frame, scan, qtables, htables, restart_interval
) -> np.ndarray:
    if frame is None:
        raise _decode_unavailable("malformed JPEG: SOS before SOF")
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c["cs"]: c for c in scan}
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
    reader = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_restart()
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                sc = by_id[c["id"]]
                dc_tbl = htables.get((0, sc["td"]))
                ac_tbl = htables.get((1, sc["ta"]))
                q = qtables.get(c["tq"])
                if dc_tbl is None or ac_tbl is None or q is None:
                    raise _decode_unavailable("malformed JPEG: missing table")
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(dc_tbl)
                        diff = _extend(reader.read_bits(t), t)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tbl)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise _decode_unavailable(
                                    "corrupt JPEG: AC index overflow"
                                )
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.int64)
                        blk[ZIGZAG] = zz
                        coeffs = blk.reshape(8, 8) * q
                        pix = _idct2(coeffs.astype(np.float64)) + 128.0
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    # upsample to full resolution and crop
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
    if len(out_planes) != 3:
        raise _decode_unavailable(
            f"unsupported JPEG component count {len(out_planes)}"
        )
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ----------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, length: int, code: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a quant table."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (tbl * s + 50) // 100
    return np.clip(q, 1, 255)


def _encode_block(bw, block, q, dc_tbl, ac_tbl, pred):
    coeffs = _fdct2(block.astype(np.float64) - 128.0)
    quant = np.rint(coeffs / q).astype(np.int64)
    zz = quant.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    mag = abs(diff)
    t = int(mag).bit_length()
    length, code = dc_tbl.codes[t]
    bw.write(length, code)
    if t:
        bw.write(t, diff if diff >= 0 else diff + (1 << t) - 1)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_tbl.codes[0xF0]
            bw.write(length, code)
            run -= 16
        s = abs(v).bit_length()
        length, code = ac_tbl.codes[(run << 4) | s]
        bw.write(length, code)
        bw.write(s, v if v >= 0 else v + (1 << s) - 1)
        run = 0
    if run:
        length, code = ac_tbl.codes[0x00]
        bw.write(length, code)
    return int(zz[0])


def _pad_replicate(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    pp = np.empty((ph, pw), dtype=np.float64)
    pp[:h, :w] = p
    pp[h:, :w] = p[h - 1 : h, :]
    pp[:, w:] = pp[:, w - 1 : w]
    return pp


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG encoder (grayscale, or RGB at 4:4:4 / 4:2:0 box-
    averaged chroma) with the T.81 Annex K example tables scaled by a
    libjpeg-style ``quality`` factor.  ``restart_interval`` > 0 emits a
    DRI segment and RSTn markers every N MCUs.  Fixture support for the
    decoder and a real (lossy) codec in its own right."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    qy = _quality_scale(QTBL_LUMA.reshape(8, 8), quality)
    qc = _quality_scale(QTBL_CHROMA.reshape(8, 8), quality)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
        samp = (
            [(1, 1)] * 3 if subsampling == "444" else [(2, 2), (1, 1), (1, 1)]
        )
    nc = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    if subsampling == "420" and not gray:
        # box-average chroma down by the sampling ratio
        for i in (1, 2):
            p = _pad_replicate(planes[i], -(-h // 2) * 2, -(-w // 2) * 2)
            planes[i] = 0.25 * (
                p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]
            )

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )

    def _dqt(tid, q):
        zz = q.reshape(64)[ZIGZAG].astype(np.uint8)
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz.tobytes()

    out += _dqt(0, qy)
    if not gray:
        out += _dqt(1, qc)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        hv = (samp[i][0] << 4) | samp[i][1]
        sof += struct.pack(">BBB", i + 1, hv, 0 if i == 0 else 1)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def _dht(tc, th, spec):
        bits, values = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += _dht(0, 0, HUFF_DC_LUMA) + _dht(1, 0, HUFF_AC_LUMA)
    if not gray:
        out += _dht(0, 1, HUFF_DC_CHROMA) + _dht(1, 1, HUFF_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_y = _HuffTable(*HUFF_DC_LUMA)
    ac_y = _HuffTable(*HUFF_AC_LUMA)
    dc_c = _HuffTable(*HUFF_DC_CHROMA)
    ac_c = _HuffTable(*HUFF_AC_CHROMA)
    bw = _BitWriter()
    pred = [0] * nc
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        _pad_replicate(planes[ci], mcuy * samp[ci][1] * 8, mcux * samp[ci][0] * 8)
        for ci in range(nc)
    ]
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * nc
            for ci in range(nc):
                q = qy if ci == 0 else qc
                dt = dc_y if ci == 0 else dc_c
                at = ac_y if ci == 0 else ac_c
                ch, cv = samp[ci]
                for v in range(cv):
                    for hh in range(ch):
                        y0 = (my * cv + v) * 8
                        x0 = (mx * ch + hh) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(bw, blk, q, dt, at, pred[ci])
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
