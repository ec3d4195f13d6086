"""Minimal from-scratch TIFF writer + parser with an EXIF GPS IFD.

The input table per BASELINE.json input_hint carries images as opaque
``bytes``; EXIF-derived lat/lon lives *inside* the payload and is parsed
by the extract stage (SURVEY.md §3.1).  No PIL in the sandbox, so this
implements just enough of TIFF 6.0 + EXIF GPS:

* little-endian header ``II*\\0``
* one IFD: width/length/bits/compression(none)/photometric(RGB)/
  strip offset+bytecount/samples-per-pixel/rows-per-strip + GPSInfo
  pointer (tag 34853)
* GPS IFD: GPSLatitudeRef/GPSLatitude/GPSLongitudeRef/GPSLongitude as
  ASCII + RATIONAL[3] (deg, min, sec)

Coordinates are stored **exactly** as (e7_value, 10^7) in the degrees
rational with zero minutes/seconds, so decode returns bit-identical
float64 when the source lat/lon is an integer multiple of 1e-7 — this
gives the per-row invariant (input_hint) an exact oracle.

Pixels: one uncompressed RGB strip, row-major h×w×3 — PSNR vs the
generator is trivially infinite (lossless).
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTES = 279
_TAG_GPS_IFD = 34853

_GPS_LAT_REF = 1
_GPS_LAT = 2
_GPS_LON_REF = 3
_GPS_LON = 4

_TYPE_ASCII = 2
_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_RATIONAL = 5

E7 = 10_000_000


def _entry(tag: int, typ: int, count: int, value_or_offset: int) -> bytes:
    return struct.pack("<HHII", tag, typ, count, value_or_offset)


def _entry_shorts(tag: int, values: list[int]) -> bytes:
    if len(values) == 1:
        return struct.pack("<HHIHH", tag, _TYPE_SHORT, 1, values[0], 0)
    raise ValueError("inline shorts only")


def encode_tiff(pixels: np.ndarray, lat_e7: int, lon_e7: int) -> bytes:
    """Encode an RGB image (uint8 [h, w, 3]) with GPS lat/lon given as
    integer 1e-7 degrees (exact)."""
    h, w = pixels.shape[0], pixels.shape[1]
    strip = pixels.astype(np.uint8).tobytes()

    # Layout: header(8) | IFD0 | bits_extra(6) | GPS IFD | rationals | strip
    n0 = 10  # entries in IFD0
    ifd0_off = 8
    ifd0_size = 2 + n0 * 12 + 4
    bits_off = ifd0_off + ifd0_size
    gps_off = bits_off + 6
    n_gps = 4
    gps_size = 2 + n_gps * 12 + 4
    lat_ref = b"N\x00" if lat_e7 >= 0 else b"S\x00"
    lon_ref = b"E\x00" if lon_e7 >= 0 else b"W\x00"
    rat_off = gps_off + gps_size
    # two RATIONAL[3] blobs, 24 bytes each
    lat_rat_off = rat_off
    lon_rat_off = rat_off + 24
    strip_off = lon_rat_off + 24

    def rational3(e7: int) -> bytes:
        return struct.pack("<IIIIII", abs(e7), E7, 0, 1, 0, 1)

    ifd0 = struct.pack("<H", n0)
    ifd0 += _entry(_TAG_WIDTH, _TYPE_LONG, 1, w)
    ifd0 += _entry(_TAG_LENGTH, _TYPE_LONG, 1, h)
    ifd0 += _entry(_TAG_BITS, _TYPE_SHORT, 3, bits_off)
    ifd0 += _entry_shorts(_TAG_COMPRESSION, [1])
    ifd0 += _entry_shorts(_TAG_PHOTOMETRIC, [2])
    ifd0 += _entry(_TAG_STRIP_OFFSETS, _TYPE_LONG, 1, strip_off)
    ifd0 += _entry_shorts(_TAG_SAMPLES, [3])
    ifd0 += _entry(_TAG_ROWS_PER_STRIP, _TYPE_LONG, 1, h)
    ifd0 += _entry(_TAG_STRIP_BYTES, _TYPE_LONG, 1, len(strip))
    ifd0 += _entry(_TAG_GPS_IFD, _TYPE_LONG, 1, gps_off)
    ifd0 += struct.pack("<I", 0)  # next IFD

    gps = struct.pack("<H", n_gps)
    gps += struct.pack("<HHI2sxx", _GPS_LAT_REF, _TYPE_ASCII, 2, lat_ref)
    gps += _entry(_GPS_LAT, _TYPE_RATIONAL, 3, lat_rat_off)
    gps += struct.pack("<HHI2sxx", _GPS_LON_REF, _TYPE_ASCII, 2, lon_ref)
    gps += _entry(_GPS_LON, _TYPE_RATIONAL, 3, lon_rat_off)
    gps += struct.pack("<I", 0)

    return b"".join(
        [
            b"II*\x00",
            struct.pack("<I", ifd0_off),
            ifd0,
            struct.pack("<HHH", 8, 8, 8),
            gps,
            rational3(lat_e7),
            rational3(lon_e7),
            strip,
        ]
    )


def _read_ifd(buf: bytes, off: int) -> dict[int, tuple[int, int, int]]:
    """tag -> (type, count, value_or_offset)."""
    (n,) = struct.unpack_from("<H", buf, off)
    out = {}
    p = off + 2
    for _ in range(n):
        tag, typ, count, vo = struct.unpack_from("<HHII", buf, p)
        out[tag] = (typ, count, vo)
        p += 12
    return out


def _read_rational3_degrees(buf: bytes, off: int) -> float:
    d_n, d_d, m_n, m_d, s_n, s_d = struct.unpack_from("<IIIIII", buf, off)
    deg = d_n / d_d if d_d else 0.0
    mins = m_n / m_d if m_d else 0.0
    secs = s_n / s_d if s_d else 0.0
    return deg + mins / 60.0 + secs / 3600.0


def parse_gps(buf: bytes) -> tuple[float, float] | None:
    """Parse (lon, lat) from the GPS IFD; None when absent.

    Output is lon-lat order per the reference's API boundary invariant
    (lib.rs:13-16)."""
    if buf[:4] != b"II*\x00":
        return None
    (ifd0_off,) = struct.unpack_from("<I", buf, 4)
    ifd0 = _read_ifd(buf, ifd0_off)
    if _TAG_GPS_IFD not in ifd0:
        return None
    gps = _read_ifd(buf, ifd0[_TAG_GPS_IFD][2])
    if _GPS_LAT not in gps or _GPS_LON not in gps:
        return None
    lat = _read_rational3_degrees(buf, gps[_GPS_LAT][2])
    lon = _read_rational3_degrees(buf, gps[_GPS_LON][2])
    # refs are inline ASCII (count 2 fits the 4 value bytes): the low byte
    # of the little-endian value word is the ref character.
    lat_sign = -1.0 if (gps[_GPS_LAT_REF][2] & 0xFF) == ord("S") else 1.0
    lon_sign = -1.0 if (gps[_GPS_LON_REF][2] & 0xFF) == ord("W") else 1.0
    return lon * lon_sign, lat * lat_sign


def parse_pixels(buf: bytes) -> np.ndarray:
    """Decode the RGB strip back to uint8 [h, w, 3]."""
    (ifd0_off,) = struct.unpack_from("<I", buf, 4)
    ifd0 = _read_ifd(buf, ifd0_off)
    w = ifd0[_TAG_WIDTH][2]
    h = ifd0[_TAG_LENGTH][2]
    off = ifd0[_TAG_STRIP_OFFSETS][2]
    nbytes = ifd0[_TAG_STRIP_BYTES][2]
    arr = np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=off)
    return arr.reshape(h, w, 3).copy()


def parse_gps_batch(bufs) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vector wrapper: list/array of bytes -> (lon, lat, ok) float64/bool.

    Per-image parse touches only the IFD headers (never pixels), so the
    hot reverse pipeline does not decode imagery.  Prefer
    :func:`parse_gps_arrow` in batch stages — it takes the Arrow binary
    column directly and decodes the canonical encoder layout fully
    vectorized.
    """
    n = len(bufs)
    lon = np.full(n, np.nan)
    lat = np.full(n, np.nan)
    ok = np.zeros(n, dtype=bool)
    for i, b in enumerate(bufs):
        try:
            r = parse_gps(b)
        except (struct.error, IndexError, KeyError):
            r = None
        if r is not None:
            lon[i], lat[i] = r
            ok[i] = True
    return lon, lat, ok


# Fixed offsets of the canonical encode_tiff layout (see encode_tiff):
# header 8 | IFD0 (10 entries) 8..134 | bits 134..140 | GPS IFD 140..194 |
# lat RATIONAL[3] 194..218 | lon RATIONAL[3] 218..242 | strip.
_FAST_GPS_PTR_ENTRY = 118  # 10 + 9*12: tag of the GPSInfo entry
_FAST_GPS_OFF = 140
_FAST_LAT_REF = 150
_FAST_LON_REF = 174
_FAST_LAT_RAT = 194
_FAST_LON_RAT = 218
_FAST_MIN_LEN = 242


def _u16(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    return data[pos].astype(np.uint32) | (data[pos + 1].astype(np.uint32) << 8)


def _u32(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    return (
        data[pos].astype(np.uint64)
        | (data[pos + 1].astype(np.uint64) << 8)
        | (data[pos + 2].astype(np.uint64) << 16)
        | (data[pos + 3].astype(np.uint64) << 24)
    )


def _rat3_deg(data: np.ndarray, pos: np.ndarray) -> np.ndarray:
    out = np.zeros(len(pos), dtype=np.float64)
    for field_off, scale in ((0, 1.0), (8, 60.0), (16, 3600.0)):
        num = _u32(data, pos + field_off).astype(np.float64)
        den = _u32(data, pos + field_off + 4).astype(np.float64)
        nz = den != 0
        out[nz] += num[nz] / den[nz] / scale
    return out


def _binary_col_view(binary_col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Zero-copy (data, start, length) view of an Arrow (large_)binary
    column — the shared front half of the vectorized payload readers."""
    import pyarrow as pa

    if isinstance(binary_col, pa.ChunkedArray):
        binary_col = binary_col.combine_chunks()
    arrow_off = binary_col.offset
    if pa.types.is_large_binary(binary_col.type):
        off_dtype = np.int64
    elif pa.types.is_binary(binary_col.type):
        off_dtype = np.int32
    else:
        raise TypeError(f"expected a (large_)binary column, got {binary_col.type}")
    offsets = np.frombuffer(
        binary_col.buffers()[1], dtype=off_dtype, count=arrow_off + len(binary_col) + 1
    ).astype(np.int64)
    if arrow_off:
        offsets = offsets[arrow_off : arrow_off + len(binary_col) + 1]
    data = (
        np.frombuffer(binary_col.buffers()[2], dtype=np.uint8)
        if binary_col.buffers()[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    return data, offsets[:-1], offsets[1:] - offsets[:-1]


# IFD0 fixed entry offsets of the canonical layout (entries start at 10,
# 12 bytes each; value word at entry+8)
_FAST_STRIP_OFF_ENTRY = 10 + 5 * 12  # entry 5: StripOffsets
_FAST_STRIP_BYTES_ENTRY = 10 + 8 * 12  # entry 8: StripByteCounts


def fast_layout_arrow(binary_col):
    """Vectorized canonical-layout probe over a TIFF payload column.

    Returns ``(data, start, length, ok, w, h, strip_off, strip_len)`` —
    zero-copy buffer views plus per-row geometry for rows matching the
    canonical :func:`encode_tiff` layout (``ok`` False rows need the
    generic parser; degenerate zero-area images are excluded so every
    consumer hits the generic path's error handling for them).  Shared
    by :func:`payload_hash_arrow` and the image-op stages so none of
    them walk IFDs per row.
    """
    data, start, length = _binary_col_view(binary_col)
    n = len(start)
    ok = np.zeros(n, dtype=bool)
    w = np.zeros(n, dtype=np.int64)
    h = np.zeros(n, dtype=np.int64)
    strip_off = np.zeros(n, dtype=np.int64)
    strip_len = np.zeros(n, dtype=np.int64)
    fast = length >= _FAST_MIN_LEN
    if fast.any():
        s = start[fast]
        sig = (
            (data[s] == ord("I"))
            & (data[s + 1] == ord("I"))
            & (data[s + 2] == 42)
            & (data[s + 3] == 0)
            & (_u32(data, s + 4) == 8)
            & (_u16(data, s + 8) == 10)
            # entries 0/1 must really be LONG ImageWidth/ImageLength —
            # without the tag+type check a malformed 10-entry TIFF whose
            # entry-0/1 value words happened to satisfy sl == w*h*3
            # would be hashed/resized with wrong geometry instead of
            # reaching the generic parser's error handling (round-3
            # advice)
            & (_u16(data, s + 10) == _TAG_WIDTH)
            & (_u16(data, s + 10 + 2) == _TYPE_LONG)
            & (_u16(data, s + 10 + 12) == _TAG_LENGTH)
            & (_u16(data, s + 10 + 12 + 2) == _TYPE_LONG)
            & (_u16(data, s + _FAST_STRIP_OFF_ENTRY) == _TAG_STRIP_OFFSETS)
            & (_u16(data, s + _FAST_STRIP_BYTES_ENTRY) == _TAG_STRIP_BYTES)
        )
        fi = np.nonzero(fast)[0][sig]
        if len(fi):
            so = _u32(data, start[fi] + _FAST_STRIP_OFF_ENTRY + 8).astype(np.int64)
            sl = _u32(data, start[fi] + _FAST_STRIP_BYTES_ENTRY + 8).astype(np.int64)
            wv = _u32(data, start[fi] + 10 + 8).astype(np.int64)  # entry 0: width
            hv = _u32(data, start[fi] + 10 + 12 + 8).astype(np.int64)  # entry 1: length
            good = (so + sl <= length[fi]) & (sl == wv * hv * 3) & (wv > 0) & (hv > 0)
            fi = fi[good]
            w[fi] = wv[good]
            h[fi] = hv[good]
            strip_off[fi] = so[good]
            strip_len[fi] = sl[good]
            ok[fi] = True
    return data, start, length, ok, w, h, strip_off, strip_len


def payload_hash_arrow(binary_col) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (content_hash, decode_ok) over a TIFF payload column.

    The content hash is blake2b-8 of the decoded pixel bytes — for the
    engine's lossless single-strip codec those ARE the strip bytes, so
    rows matching the canonical :func:`encode_tiff` layout hash the
    strip directly as a zero-copy numpy slice: no per-row IFD walk, no
    ``to_pylist`` copy, no ``reshape(...).copy()``.  Non-canonical TIFFs
    fall back to :func:`parse_pixels`.  blake2b per row is the only
    per-row remainder (C-backed, over views).
    """
    data, start, length, ok, _w, _h, strip_off, strip_len = fast_layout_arrow(binary_col)
    n = len(start)
    hashes = np.zeros(n, dtype=np.int64)
    if n == 0:
        return hashes, ok
    import hashlib

    for i in np.nonzero(ok)[0]:
        s0 = start[i] + strip_off[i]
        hashes[i] = np.int64(
            np.uint64(
                int.from_bytes(
                    hashlib.blake2b(data[s0 : s0 + strip_len[i]], digest_size=8).digest(), "little"
                )
            )
        )
    for i in np.nonzero(~ok)[0]:
        buf = data[start[i] : start[i] + length[i]].tobytes()
        try:
            pix = parse_pixels(buf)
        except Exception:
            continue
        hashes[i] = np.int64(
            np.uint64(int.from_bytes(hashlib.blake2b(pix.tobytes(), digest_size=8).digest(), "little"))
        )
        ok[i] = True
    return hashes, ok


def parse_gps_arrow(binary_col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized (lon, lat, ok) from an Arrow binary column.

    Rows matching the canonical encoder layout decode via fancy-indexed
    reads on the flat value buffer (no per-row Python); any other TIFF
    falls back to the generic IFD walker.
    """
    import pyarrow as pa

    if isinstance(binary_col, pa.ChunkedArray):
        binary_col = binary_col.combine_chunks()
    if len(binary_col) == 0:
        z = np.zeros(0)
        return z, z.copy(), np.zeros(0, dtype=bool)
    arrow_off = binary_col.offset
    if pa.types.is_large_binary(binary_col.type):
        off_dtype = np.int64  # large_binary carries int64 offsets
    elif pa.types.is_binary(binary_col.type):
        off_dtype = np.int32
    else:
        raise TypeError(f"parse_gps_arrow expects a (large_)binary column, got {binary_col.type}")
    offsets = np.frombuffer(
        binary_col.buffers()[1], dtype=off_dtype, count=arrow_off + len(binary_col) + 1
    ).astype(np.int64)
    if arrow_off:
        offsets = offsets[arrow_off : arrow_off + len(binary_col) + 1]
    data = np.frombuffer(binary_col.buffers()[2], dtype=np.uint8)
    start = offsets[:-1]
    length = offsets[1:] - start

    n = len(start)
    lon = np.full(n, np.nan)
    lat = np.full(n, np.nan)
    ok = np.zeros(n, dtype=bool)

    fast = length >= _FAST_MIN_LEN
    if fast.any():
        s = start[fast]
        sig = (
            (data[s] == ord("I"))
            & (data[s + 1] == ord("I"))
            & (data[s + 2] == 42)
            & (data[s + 3] == 0)
            & (_u32(data, s + 4) == 8)
            & (_u16(data, s + 8) == 10)
            & (_u16(data, s + _FAST_GPS_PTR_ENTRY) == _TAG_GPS_IFD)
            & (_u32(data, s + _FAST_GPS_PTR_ENTRY + 8) == _FAST_GPS_OFF)
        )
        fi = np.nonzero(fast)[0][sig]
        if len(fi):
            s = start[fi]
            la = _rat3_deg(data, s + _FAST_LAT_RAT)
            lo = _rat3_deg(data, s + _FAST_LON_RAT)
            la = np.where(data[s + _FAST_LAT_REF] == ord("S"), -la, la)
            lo = np.where(data[s + _FAST_LON_REF] == ord("W"), -lo, lo)
            lat[fi] = la
            lon[fi] = lo
            ok[fi] = True
        fast_done = np.zeros(n, dtype=bool)
        fast_done[np.nonzero(fast)[0][sig]] = True
    else:
        fast_done = np.zeros(n, dtype=bool)

    slow = np.nonzero(~fast_done)[0]
    for i in slow:
        b = data[start[i] : start[i] + length[i]].tobytes()
        try:
            r = parse_gps(b)
        except (struct.error, IndexError, KeyError):
            r = None
        if r is not None:
            lon[i], lat[i] = r
            ok[i] = True
    return lon, lat, ok
