"""From-scratch baseline JPEG codec (SOF0, 4:4:4, numpy only).

Round-4 upgrade of the last declared image stub: baseline sequential
JPEG encodes and decodes for REAL — DCT-II via an orthonormal 8x8
basis matmul (vectorized over all blocks), Annex-K default
quantization/Huffman tables scaled by the libjpeg quality formula,
canonical Huffman entropy coding with byte stuffing.  The decoder
builds its tables from the file's own DQT/DHT segments, so any
conforming baseline 4:4:4 JPEG decodes, not just this encoder's
output.  Out-of-profile inputs (progressive SOF2, subsampled chroma,
restart intervals, 12-bit precision, arithmetic coding) raise
``ValueError`` and route to the callers' error handling, like the
PNG/TIFF profile limits.

JPEG is lossy: the per-row invariant for this path is PSNR, not byte
equality (input contract: PSNR >= 40 dB for lossy formats) —
``tests/test_codecs.py`` asserts it on structured images at the
default quality.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants: zigzag order, Annex-K default tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_Q_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex-K Huffman specs: (BITS[1..16], HUFFVAL).  The decoder never
# relies on these — it reads DHT from the stream — so they only shape
# this encoder's output.
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_DCT = None  # orthonormal 8x8 DCT basis, built lazily


def _dct_matrix() -> np.ndarray:
    global _DCT
    if _DCT is None:
        u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        m = np.sqrt(2.0 / 8.0) * np.cos((2 * x + 1) * u * np.pi / 16.0)
        m[0] = np.sqrt(1.0 / 8.0)
        _DCT = m
    return _DCT


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(100, max(1, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    def scale(base):
        return np.clip((base * s + 50) // 100, 1, 255)
    return scale(_Q_LUM), scale(_Q_CHROM)


def _rgb_to_ycbcr(pix: np.ndarray) -> np.ndarray:
    p = pix.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _blockify(chan: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(h, w) -> (nby*nbx, 8, 8) with edge replication padding."""
    h, w = chan.shape
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    pad = np.pad(chan, ((0, nby * 8 - h), (0, nbx * 8 - w)), mode="edge")
    blocks = pad.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, nby, nbx


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_jpeg(pix: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline 4:4:4 JFIF bytes."""
    if pix.ndim != 3 or pix.shape[2] != 3 or pix.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8")
    h, w = pix.shape[:2]
    qlum, qchrom = _quality_tables(quality)
    m = _dct_matrix()
    ycc = _rgb_to_ycbcr(pix)

    comp_blocks = []
    for ci in range(3):
        blocks, _, _ = _blockify(ycc[..., ci])
        coef = np.einsum("ux,nxy,vy->nuv", m, blocks - 128.0, m)
        q = (qlum if ci == 0 else qchrom).reshape(8, 8)
        quant = np.round(coef / q).astype(np.int64)
        comp_blocks.append(quant.reshape(-1, 64)[:, ZIGZAG])

    dc_l = _build_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    dc_c = _build_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)
    ac_l = _build_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    ac_c = _build_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    n_blocks = comp_blocks[0].shape[0]
    for bi in range(n_blocks):
        for ci in range(3):
            zz = comp_blocks[ci][bi]
            dct_codes, act_codes = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            size = _category(diff)
            code, length = dct_codes[size]
            bw.write(code, length)
            if size:
                bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = act_codes[0xF0]  # ZRL
                    bw.write(c, ln)
                    run -= 16
                size = _category(v)
                c, ln = act_codes[(run << 4) | size]
                bw.write(c, ln)
                bw.write(v if v > 0 else v + (1 << size) - 1, size)
                run = 0
            if last < 63:
                c, ln = act_codes[0x00]  # EOB
                bw.write(c, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qlum[ZIGZAG].tolist()))
    out += seg(0xFFDB, b"\x01" + bytes(qchrom[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)  # 1x1 sampling (4:4:4)
    out += seg(0xFFC0, sof)
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUM_BITS, _DC_LUM_VALS),
        (0, 1, _DC_CHROM_BITS, _DC_CHROM_VALS),
        (1, 0, _AC_LUM_BITS, _AC_LUM_VALS),
        (1, 1, _AC_CHROM_BITS, _AC_CHROM_VALS),
    ):
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; stops filling at a marker, raises ValueError when a
    read overruns the entropy data."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _try_fill(self) -> bool:
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 < len(self.data) and self.data[self.pos + 1] == 0x00:
                self.pos += 2
            else:
                return False  # marker: entropy data ends here
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def peek16(self) -> int:
        """Next 16 bits MSB-first, zero-padded past the end of the
        entropy data.  Padding is safe for LUT decode: the real code is
        a PREFIX of the peeked bits and the LUT covers every suffix."""
        while self.nbits < 16 and self._try_fill():
            pass
        if self.nbits >= 16:
            return (self.acc >> (self.nbits - 16)) & 0xFFFF
        return (self.acc << (16 - self.nbits)) & 0xFFFF

    def consume(self, n: int) -> None:
        if n > self.nbits:
            raise ValueError("truncated entropy data")
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._try_fill():
                raise ValueError("truncated entropy data")
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v


def _build_decode_maps(bits: list[int], vals: list[int]):
    """Canonical Huffman -> 16-bit peek LUT: ``lut_len[p] == 0`` marks
    an invalid prefix, else the symbol is ``lut_val[p]`` and the code
    consumes ``lut_len[p]`` bits.  One table lookup per symbol instead
    of up to 16 single-bit reads (JPEG codes never exceed 16 bits)."""
    lut_val = np.zeros(1 << 16, dtype=np.uint8)
    lut_len = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            lut_val[lo:hi] = vals[k]
            lut_len[lo:hi] = length
            code += 1
            k += 1
        code <<= 1
    return lut_val, lut_len


def _huff_decode(br: _BitReader, table) -> int:
    lut_val, lut_len = table
    p = br.peek16()
    length = int(lut_len[p])
    if length == 0:
        raise ValueError("invalid huffman code")
    br.consume(length)
    return int(lut_val[p])


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline 4:4:4 JPEG bytes -> (h, w, 3) uint8 RGB.

    Raises ``ValueError`` outside the supported profile."""
    if len(buf) < 4 or buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple] = {}
    h = w = -1
    comp_q: list[int] = []
    scan_tables: list[tuple[int, int]] = []
    sos_pos = -1
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes (round-4 review — without the skip a conforming
        # padded stream parsed a garbage segment length)
        while pos + 1 < len(buf) and buf[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(buf):
            raise ValueError("truncated stream")
        marker = struct.unpack_from(">H", buf, pos)[0]
        if marker == 0xFFD9:
            break
        if pos + 4 > len(buf):
            raise ValueError("truncated segment")
        (length,) = struct.unpack_from(">H", buf, pos + 2)
        payload = buf[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8).astype(np.int64)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zz
                qtables[tq] = tbl
                p += 65
        elif marker == 0xFFC4:
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                htables[(cls, tid)] = _build_decode_maps(bits, vals)
                p += 17 + nv
        elif marker == 0xFFC0 or marker == 0xFFC1:
            prec, h, w, nc = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8 or nc != 3:
                raise ValueError("only 8-bit 3-component baseline supported")
            for c in range(nc):
                _cid, samp, tq = payload[6 + c * 3 : 9 + c * 3]
                if samp != 0x11:
                    raise ValueError("subsampled chroma unsupported (4:4:4 only)")
                comp_q.append(tq)
        elif marker in (0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7, 0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xFFDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xFFDA:
            ns = payload[0]
            if ns != 3:
                raise ValueError("expected 3-component scan")
            for c in range(ns):
                _cid, tt = payload[1 + c * 2 : 3 + c * 2]
                scan_tables.append((tt >> 4, tt & 0xF))
            sos_pos = pos + 2 + length
            break
        pos += 2 + length
    if h <= 0 or sos_pos < 0 or len(comp_q) != 3:
        raise ValueError("missing SOF/SOS")

    nby, nbx = (h + 7) // 8, (w + 7) // 8
    n_blocks = nby * nbx
    coefs = [np.zeros((n_blocks, 64), dtype=np.int64) for _ in range(3)]
    br = _BitReader(buf, sos_pos)
    prev_dc = [0, 0, 0]
    try:
        _decode_scan(br, n_blocks, coefs, htables, scan_tables, prev_dc)
    except IndexError:
        raise ValueError("truncated entropy data") from None

    m = _dct_matrix()
    chans = []
    for ci in range(3):
        q = qtables.get(comp_q[ci])
        if q is None:
            raise ValueError("missing quant table")
        deq = np.zeros((n_blocks, 64), dtype=np.float64)
        deq[:, ZIGZAG] = coefs[ci] * q[ZIGZAG]
        blocks = np.einsum("xu,nuv,yv->nxy", m.T, deq.reshape(-1, 8, 8), m.T) + 128.0
        full = blocks.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        chans.append(full[:h, :w])
    return _ycbcr_to_rgb(np.stack(chans, axis=-1))


def _decode_scan(br, n_blocks, coefs, htables, scan_tables, prev_dc) -> None:
    for bi in range(n_blocks):
        for ci in range(3):
            dc_t = htables.get((0, scan_tables[ci][0]))
            ac_t = htables.get((1, scan_tables[ci][1]))
            if dc_t is None or ac_t is None:
                raise ValueError("missing huffman table")
            size = _huff_decode(br, dc_t)
            diff = _extend(br.read(size), size) if size else 0
            prev_dc[ci] += diff
            zz = coefs[ci][bi]
            zz[0] = prev_dc[ci]
            k = 1
            while k < 64:
                sym = _huff_decode(br, ac_t)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0xF
                if size == 0:
                    if run != 15:
                        raise ValueError("bad AC symbol")
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    raise ValueError("AC index overflow")
                zz[k] = _extend(br.read(size), size)
                k += 1
