"""Pure-math geodesy kernels for the OpenCage annotations fringe
(/root/reference/src/opencage.rs:581-599): MGRS, Maidenhead, qibla
bearing, and sunrise/sunset — everything from the reference's
``Annotations`` document that is computable offline with no external
tables.  (callingcode / currency / timezone / what3words need licensed
or external datasets and stay out of scope; the flag emoji is derived
from a country code when one is present.)

All kernels are vectorized numpy over lon/lat arrays, deterministic and
locale-free (SURVEY.md §7 hard part 2).
"""

from __future__ import annotations

import numpy as np

# --- WGS84 / transverse-Mercator (Krüger series) constants ---
_A = 6378137.0
_F = 1.0 / 298.257223563
_N = _F / (2.0 - _F)
_K0 = 0.9996
_AA = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0)
_ALPHA = (
    _N / 2.0 - 2.0 * _N**2 / 3.0 + 5.0 * _N**3 / 16.0,
    13.0 * _N**2 / 48.0 - 3.0 * _N**3 / 5.0,
    61.0 * _N**3 / 240.0,
)

_BAND_LETTERS = "CDEFGHJKLMNPQRSTUVWX"  # 8° bands from -80, I/O omitted
_COL_LETTERS = "ABCDEFGHJKLMNPQRSTUVWXYZ"  # I/O omitted
_ROW_LETTERS = "ABCDEFGHJKLMNPQRSTUV"  # 20-letter northing cycle


def utm_zone(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """UTM zone number with the standard Norway/Svalbard exceptions."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    zone = (np.floor((lon + 180.0) / 6.0).astype(np.int64) % 60) + 1
    # Norway: 31V east of 3E becomes 32V
    zone = np.where((lat >= 56.0) & (lat < 64.0) & (lon >= 3.0) & (lon < 12.0), 32, zone)
    # Svalbard bands X: 31X/33X/35X/37X widened
    in_x = (lat >= 72.0) & (lat < 84.0)
    zone = np.where(in_x & (lon >= 0.0) & (lon < 9.0), 31, zone)
    zone = np.where(in_x & (lon >= 9.0) & (lon < 21.0), 33, zone)
    zone = np.where(in_x & (lon >= 21.0) & (lon < 33.0), 35, zone)
    zone = np.where(in_x & (lon >= 33.0) & (lon < 42.0), 37, zone)
    return zone


def utm_forward(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """WGS84 lon/lat -> (zone, easting, northing), vectorized Krüger
    series (sub-mm series truncation error inside the zones)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    zone = utm_zone(lon, lat)
    lon0 = (zone.astype(np.float64) - 1.0) * 6.0 - 180.0 + 3.0
    phi = np.radians(lat)
    lam = np.radians(lon - lon0)
    sqn = 2.0 * np.sqrt(_N) / (1.0 + _N)
    sphi = np.sin(phi)
    t = np.sinh(np.arctanh(sphi) - sqn * np.arctanh(sqn * sphi))
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    xi_s, eta_s = xi.copy(), eta.copy()
    for j, a_j in enumerate(_ALPHA, start=1):
        xi_s = xi_s + a_j * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        eta_s = eta_s + a_j * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
    easting = 500000.0 + _K0 * _AA * eta_s
    northing = _K0 * _AA * xi_s
    northing = np.where(northing < 0.0, northing + 10000000.0, northing)
    return zone, easting, northing


def mgrs(lon: np.ndarray, lat: np.ndarray) -> list:
    """1-metre MGRS strings (``18SUJ2348606479`` style); None outside
    the UTM latitude range [-80, 84] (the UPS polar grids are out of
    scope)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    zone, e, n = utm_forward(lon, lat)
    band_idx = np.clip(np.floor((lat + 80.0) / 8.0).astype(np.int64), 0, 19)
    band_idx = np.where(lat >= 72.0, 19, band_idx)  # X extends to 84
    e100k = np.floor(e / 100000.0).astype(np.int64)
    n100k = np.floor(n / 100000.0).astype(np.int64)
    # column letter sets cycle per zone: 1->A-H, 2->J-R, 0->S-Z
    col_start = ((zone - 1) % 3) * 8
    col_idx = col_start + (e100k - 1)
    # row letters: 20-cycle, even zones offset by 5 ('F')
    row_idx = (n100k + np.where(zone % 2 == 0, 5, 0)) % 20
    edig = np.floor(e).astype(np.int64) % 100000
    ndig = np.floor(n).astype(np.int64) % 100000
    ok = (lat >= -80.0) & (lat <= 84.0)
    out = []
    for i in range(len(lon)):
        if not ok[i]:
            out.append(None)
            continue
        out.append(
            f"{int(zone[i])}{_BAND_LETTERS[int(band_idx[i])]}"
            f"{_COL_LETTERS[int(col_idx[i]) % 24]}{_ROW_LETTERS[int(row_idx[i])]}"
            f"{int(edig[i]):05d}{int(ndig[i]):05d}"
        )
    return out


def maidenhead(lon: np.ndarray, lat: np.ndarray, precision: int = 3) -> list:
    """Maidenhead locator (precision 3 -> 6 chars, e.g. ``FN31pr``)."""
    lon = np.asarray(lon, dtype=np.float64) + 180.0
    lat = np.asarray(lat, dtype=np.float64) + 90.0
    # guard the north/east edge so indexes stay in range
    lon = np.clip(lon, 0.0, 360.0 - 1e-9)
    lat = np.clip(lat, 0.0, 180.0 - 1e-9)
    f_lon = np.floor(lon / 20.0).astype(np.int64)
    f_lat = np.floor(lat / 10.0).astype(np.int64)
    s_lon = np.floor((lon % 20.0) / 2.0).astype(np.int64)
    s_lat = np.floor(lat % 10.0).astype(np.int64)
    sub_lon = np.floor((lon % 2.0) * 12.0).astype(np.int64)
    sub_lat = np.floor((lat % 1.0) * 24.0).astype(np.int64)
    out = []
    for i in range(len(lon)):
        s = f"{chr(65 + f_lon[i])}{chr(65 + f_lat[i])}{s_lon[i]}{s_lat[i]}"
        if precision >= 3:
            s += f"{chr(97 + sub_lon[i])}{chr(97 + sub_lat[i])}"
        out.append(s)
    return out


_KAABA_LAT = np.radians(21.4224779)
_KAABA_LON = np.radians(39.8251832)


def qibla(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Initial great-circle bearing to the Kaaba, degrees in [0, 360)."""
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    dlam = _KAABA_LON - lam
    y = np.sin(dlam) * np.cos(_KAABA_LAT)
    x = np.cos(phi) * np.sin(_KAABA_LAT) - np.sin(phi) * np.cos(_KAABA_LAT) * np.cos(dlam)
    return (np.degrees(np.arctan2(y, x)) + 360.0) % 360.0


def sun_rise_set(lon: np.ndarray, lat: np.ndarray, ts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Apparent sunrise/sunset unix seconds (int64) for the UTC day
    containing ``ts`` — the standard sunrise equation (NOAA-style, solar
    disc at -0.833°).  Polar day/night rows return -1 for both.
    Accuracy is a couple of minutes, matching the role of the
    reference's ``sun.rise/set`` unix maps (opencage.rs:620-624)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ts = np.asarray(ts, dtype=np.float64)
    jd = ts / 86400.0 + 2440587.5
    n = np.floor(jd - 2451545.0 + 0.0008 - (-lon) / 360.0 + 0.5)
    jstar = n + (-lon) / 360.0  # mean solar noon (days since J2000)
    m = np.radians((357.5291 + 0.98560028 * jstar) % 360.0)
    c = 1.9148 * np.sin(m) + 0.02 * np.sin(2.0 * m) + 0.0003 * np.sin(3.0 * m)
    lam_sun = np.radians((np.degrees(m) + c + 180.0 + 102.9372) % 360.0)
    jtransit = 2451545.0 + jstar + 0.0053 * np.sin(m) - 0.0069 * np.sin(2.0 * lam_sun)
    sin_dec = np.sin(lam_sun) * np.sin(np.radians(23.4397))
    cos_dec = np.cos(np.arcsin(sin_dec))
    cos_h = (np.sin(np.radians(-0.833)) - np.sin(np.radians(lat)) * sin_dec) / (
        np.cos(np.radians(lat)) * cos_dec
    )
    polar = (cos_h < -1.0) | (cos_h > 1.0)
    h = np.degrees(np.arccos(np.clip(cos_h, -1.0, 1.0)))
    jrise = jtransit - h / 360.0
    jset = jtransit + h / 360.0
    rise = ((jrise - 2440587.5) * 86400.0).astype(np.int64)
    sset = ((jset - 2440587.5) * 86400.0).astype(np.int64)
    rise = np.where(polar, np.int64(-1), rise)
    sset = np.where(polar, np.int64(-1), sset)
    return rise, sset


# --- three-word cell code (the what3words ROLE: a human-readable,
# reversible encoding of a ~level-13 grid cell; the real w3w wordlist
# and assignment are proprietary, so this is an engine-defined family
# over a deterministic syllabic wordlist — opencage.rs:597) ---

_CONS = "bdfgklmnprstvz"
_VOWELS = "aeiou"
_WORDS = [c1 + v1 + c2 + v2 for c1 in _CONS for v1 in _VOWELS for c2 in _CONS for v2 in _VOWELS][:1024]
_W = np.uint64(1024)
_TW_LEVEL = 13  # 2*13=26 bits of cell < 30 bits of 3x1024 words


def threeword(lon: np.ndarray, lat: np.ndarray) -> list:
    """``word.word.word`` code of the level-13 quadkey cell (~1 km)."""
    from . import cells

    c = cells.encode(np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64), _TW_LEVEL)
    payload = c & np.uint64((1 << (2 * _TW_LEVEL)) - 1)  # the Morton path (low bits)
    w0 = payload % _W
    w1 = (payload // _W) % _W
    w2 = (payload // (_W * _W)) % _W
    return [f"{_WORDS[int(a)]}.{_WORDS[int(b)]}.{_WORDS[int(cc)]}" for a, b, cc in zip(w0, w1, w2)]


def threeword_decode(code: str) -> int:
    """Inverse of :func:`threeword` -> the level-13 cell id payload."""
    a, b, c = (np.uint64(_WORDS.index(w)) for w in code.split("."))
    return int(a + b * _W + c * _W * _W)


def solar_timezone(lon: np.ndarray) -> tuple[np.ndarray, list, list]:
    """SOLAR-approximation timezone (offset = round(lon / 15) hours).

    The reference's ``timezone`` annotation (opencage.rs:627-636) needs
    the IANA boundary dataset, which is unavailable offline; the solar
    offset is the documented pure-math stand-in.  Returns
    ``(offset_sec, offset_string, name)``.
    """
    lon = np.asarray(lon, dtype=np.float64)
    hours = np.clip(np.round(lon / 15.0), -12, 14).astype(np.int64)
    offset_sec = hours * 3600
    offset_string = [f"{'+' if h >= 0 else '-'}{abs(int(h)):02d}:00" for h in hours]
    name = [f"UTC{s}" for s in offset_string]
    return offset_sec, offset_string, name


def flag_emoji(country_codes) -> list:
    """ISO alpha-2 country code -> regional-indicator flag emoji
    (opencage.rs:592 ``flag``); None for missing/invalid codes."""
    out = []
    for cc in country_codes:
        if cc and isinstance(cc, str) and len(cc) == 2 and cc.isalpha():
            c = cc.lower()
            out.append(chr(0x1F1E6 + ord(c[0]) - 97) + chr(0x1F1E6 + ord(c[1]) - 97))
        else:
            out.append(None)
    return out
