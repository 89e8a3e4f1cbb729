"""Pure-Python/numpy baseline JPEG codec — no codec library.

Decoder: baseline sequential DCT JFIF (SOF0) — marker walk, DQT/DHT/SOS
parsing, canonical Huffman entropy decode (DC diff coding, AC run-length
with ZRL/EOB), dequantize, inverse zigzag, orthonormal 8×8 IDCT as one
batched einsum over all blocks, nearest-neighbor chroma upsampling for
any (h,v) sampling factors, BT.601/JFIF YCbCr→RGB with half-up rounding.
Restart markers (DRI/RSTn) supported. Progressive (SOF2), 12-bit, and
arithmetic-coded streams are NOT handled natively — callers route those
to the pluggable decoder registry (Pillow on a real cluster).

Encoder: baseline 4:4:4 (or grayscale) with caller-supplied or flat
quantization tables and the Annex-K standard Huffman tables. With flat
(all-ones) tables a solid-color image round-trips EXACTLY (only DC
coefficients survive, quantization is lossless), which is what makes the
dp85 arithmetic oracle possible: the decoded RGB is the closed-form
YCbCr half-up round-trip of the input color.

Everything bit-level runs in plain Python (entropy coding is inherently
serial); all the heavy math (IDCT/DCT, color transforms, upsampling) is
vectorized numpy over all blocks at once. Throughput is fixture-grade,
not libjpeg-grade — the point is REAL end-to-end decode correctness in a
container with no image libraries.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8x8 DCT-II basis: A @ x @ A.T is the 2-D forward transform
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _A[_k, _n] = np.sqrt((1 if _k == 0 else 2) / 8.0) * np.cos(
            np.pi * (2 * _n + 1) * _k / 16.0
        )

# Annex K standard Huffman tables: (bits[1..16], values)
_STD_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_STD_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5): the codec's single rounding convention, replayable
    verbatim in any SQL engine (numpy.round would be half-to-even)."""
    return np.floor(x + 0.5)


def _build_canonical(bits: List[int], values: List[int]):
    """Canonical Huffman: returns {(length, code): value}."""
    table: Dict[Tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 byte
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
                else:  # real marker: pad with zeros, caller will stop
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self):
        """Byte-align and skip an RSTn marker."""
        self.bitbuf, self.nbits = 0, 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _huff_decode(reader: _BitReader, table: Dict[Tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG magnitude decoding (F.2.2.1 EXTEND)."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """Decode baseline JFIF bytes to (H, W, 3) uint8 RGB (grayscale is
    stacked). Raises ValueError for non-baseline streams (progressive /
    12-bit / arithmetic) — callers fall back to the decoder registry."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: Dict[int, np.ndarray] = {}
    htables: Dict[Tuple[int, int], Dict] = {}
    frame = None  # (h, w, comps) comps: list of (cid, hs, vs, tq)
    restart_interval = 0
    scan = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", b, pos + 2)[0]
        seg = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                qtables[tq] = tbl
        elif marker == 0xC0:  # SOF0 baseline
            depth, h, w, nc = seg[0], struct.unpack_from(">H", seg, 1)[0], struct.unpack_from(">H", seg, 3)[0], seg[5]
            if depth != 8:
                raise ValueError(f"JPEG: {depth}-bit not baseline")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci], seg[7 + 3 * ci], seg[8 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"JPEG: SOF{marker - 0xC0} not baseline sequential")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = [0] + list(seg[i + 1 : i + 17])
                nvals = sum(bits)
                values = list(seg[i + 17 : i + 17 + nvals])
                htables[(tc, th)] = _build_canonical(bits, values)
                i += 17 + nvals
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si], seg[2 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0x0F))
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("JPEG: missing SOF0/SOS")

    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component block grids
    planes_blocks = {}
    for cid, hs, vs, tq in comps:
        planes_blocks[cid] = np.zeros(
            (mcus_y * vs, mcus_x * hs, 64), dtype=np.float64
        )

    reader = _BitReader(b, pos)
    pred = {cid: 0 for cid, _, _, _ in comps}
    scan_by_cid = {cs: (td, ta) for cs, td, ta in scan}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = {cid: 0 for cid, _, _, _ in comps}
            for cid, hs, vs, tq in comps:
                td, ta = scan_by_cid[cid]
                dc_tab, ac_tab = htables[(0, td)], htables[(1, ta)]
                q = qtables[tq]
                for by in range(vs):
                    for bx in range(hs):
                        coef = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(reader, dc_tab)
                        diff = _extend(reader.receive(t), t) if t else 0
                        pred[cid] += diff
                        coef[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            coef[k] = _extend(reader.receive(s), s)
                            k += 1
                        planes_blocks[cid][my * vs + by, mx * hs + bx] = coef * q
            mcu_count += 1

    # batched inverse zigzag + IDCT per component, then upsample
    out_planes = {}
    for cid, hs, vs, tq in comps:
        blocks = planes_blocks[cid]
        by, bx = blocks.shape[:2]
        mat = np.zeros((by, bx, 64))
        mat[:, :, _ZIGZAG] = blocks
        mat = mat.reshape(by, bx, 8, 8)
        spatial = np.einsum("ij,yxjk,kl->yxil", _A.T, mat, _A, optimize=True)
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        # upsample to full resolution (nearest), crop to (h, w)
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        y = np.clip(_half_up(out_planes[comps[0][0]]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    cy, ccb, ccr = (out_planes[c[0]] for c in comps[:3])
    r = cy + 1.402 * (ccr - 128.0)
    g = cy - 0.344136 * (ccb - 128.0) - 0.714136 * (ccr - 128.0)
    bb = cy + 1.772 * (ccb - 128.0)
    rgb = np.stack([r, g, bb], axis=2)
    return np.clip(_half_up(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ encode

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _encode_table(bits: List[int], values: List[int]):
    """value -> (code, length) for canonical Huffman."""
    enc: Dict[int, Tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            enc[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


def _magnitude(v: int) -> Tuple[int, int]:
    """(category, raw bits) for a coefficient value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    raw = v if v > 0 else v + (1 << t) - 1
    return t, raw


def encode_jpeg(arr: np.ndarray, quant: Optional[np.ndarray] = None) -> bytes:
    """Encode (H, W, 3) uint8 RGB as baseline 4:4:4 JFIF with standard
    Huffman tables. ``quant`` is a 64-long quantization table applied to
    all components in zigzag order (default all-ones = numerically
    lossless for DC-only content, the dp85 oracle's lever)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    q = np.ones(64, dtype=np.int32) if quant is None else np.asarray(quant, dtype=np.int32)

    rf = arr[:, :, 0].astype(np.float64)
    gf = arr[:, :, 1].astype(np.float64)
    bf = arr[:, :, 2].astype(np.float64)
    y = np.clip(_half_up(0.299 * rf + 0.587 * gf + 0.114 * bf), 0, 255)
    cb = np.clip(_half_up(-0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0), 0, 255)
    cr = np.clip(_half_up(0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0), 0, 255)

    bh, bw = -(-h // 8) * 8, -(-w // 8) * 8

    def to_blocks(plane: np.ndarray) -> np.ndarray:
        padded = np.empty((bh, bw))
        padded[:h, :w] = plane
        padded[h:, :w] = plane[-1:, :]          # edge-replicate padding
        padded[:, w:] = padded[:, w - 1 : w]
        blk = padded.reshape(bh // 8, 8, bw // 8, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ij,yxjk,kl->yxil", _A, blk - 128.0, _A.T, optimize=True)
        zz = coef.reshape(bh // 8, bw // 8, 64)[:, :, :]  # row-major 64
        zz = zz.reshape(bh // 8, bw // 8, 8, 8).reshape(bh // 8, bw // 8, 64)
        out = zz[:, :, _ZIGZAG]
        return np.rint(out / q).astype(np.int64)  # half-to-even fine: /1 exact for flat

    planes = [to_blocks(p) for p in (y, cb, cr)]

    dc_l = _encode_table(*_STD_DC_LUMA)
    ac_l = _encode_table(*_STD_AC_LUMA)
    dc_c = _encode_table(*_STD_DC_CHROMA)
    ac_c = _encode_table(*_STD_AC_CHROMA)
    writer = _BitWriter()
    pred = [0, 0, 0]
    for by in range(bh // 8):
        for bx in range(bw // 8):
            for ci in range(3):
                coef = planes[ci][by, bx]
                dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                diff = int(coef[0]) - pred[ci]
                pred[ci] = int(coef[0])
                t, raw = _magnitude(diff)
                code, length = dct[t]
                writer.write(code, length)
                if t:
                    writer.write(raw, t)
                run = 0
                last_nz = 0
                nz = np.nonzero(coef[1:])[0]
                last_nz = (nz[-1] + 1) if len(nz) else 0
                k = 1
                while k <= last_nz:
                    v = int(coef[k])
                    if v == 0:
                        run += 1
                        k += 1
                        continue
                    while run >= 16:
                        code, length = act[0xF0]  # ZRL
                        writer.write(code, length)
                        run -= 16
                    s, raw = _magnitude(v)
                    code, length = act[(run << 4) | s]
                    writer.write(code, length)
                    writer.write(raw, s)
                    run = 0
                    k += 1
                if last_nz < 63:
                    code, length = act[0x00]  # EOB
                    writer.write(code, length)
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) & 0xFF for x in q))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])  # 4:4:4, all use qtable 0
    out += seg(0xC0, sof)
    for tc_th, (bits, values) in (
        ((0x00,), _STD_DC_LUMA), ((0x10,), _STD_AC_LUMA),
        ((0x01,), _STD_DC_CHROMA), ((0x11,), _STD_AC_CHROMA),
    ):
        out += seg(0xC4, bytes(tc_th) + bytes(bits[1:]) + bytes(values))
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
