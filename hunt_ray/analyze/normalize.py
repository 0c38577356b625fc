"""Token normalizers and validators, mirroring Hunt's schema machinery.

Reference:
- LowerCase/UpperCase: ``hunt-searchengine/src/Hunt/Index/Schema.hs:259-269``
- ZeroFill int:        ``Hunt/Index/Schema/Normalize/Int.hs:54-70``
- Date normalize:      ``Hunt/Index/Schema/Normalize/Date.hs:54-66`` —
  any accepted ISO-8601 shape → UTC → digit string "YYYYMMDDHHMMSS"
- Validators:          non-empty for text (Schema.hs:223-231), isInt
  (Int.hs:34-44), isAnyDate (Date.hs:77-79)

All normalizers/validators are **vectorized over Arrow string arrays**
(pyarrow.compute / polars kernels — the analyzer is the build's hot stage);
scalar helpers for the query-key path wrap the same kernels.
"""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

INT64_MIN = -(2**63)
INT64_MAX = 2**63 - 1


def _as_arrow(tokens) -> pa.Array:
    if isinstance(tokens, pa.ChunkedArray):
        return tokens.combine_chunks()
    if isinstance(tokens, pa.Array):
        return tokens
    return pa.array(list(tokens), type=pa.large_string())


# ---------------------------------------------------------------- text

def norm_lowercase(tokens) -> pa.Array:
    """cnLowerCase (Schema.hs:265-266)."""
    return pc.utf8_lower(_as_arrow(tokens))


def norm_uppercase(tokens) -> pa.Array:
    """cnUpperCase (Schema.hs:259-261)."""
    return pc.utf8_upper(_as_arrow(tokens))


def validate_non_empty(tokens) -> np.ndarray:
    arr = _as_arrow(tokens)
    return pc.greater(pc.utf8_length(arr), 0).to_numpy(zero_copy_only=False).astype(bool)


# ---------------------------------------------------------------- int

def validate_int(tokens) -> np.ndarray:
    """isInt (Int.hs:34-44): signed decimal within int64 bounds.

    Vectorized: regex shape check + strict-cast bounds check via polars
    (cast overflow → null)."""
    arr = _as_arrow(tokens)
    shaped = pc.match_substring_regex(arr, r"^[-+]?[0-9]+$")
    s = pl.from_arrow(arr)
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    in_bounds = s.cast(pl.Int64, strict=False).is_not_null()
    return (shaped.to_numpy(zero_copy_only=False).astype(bool)
            & in_bounds.to_numpy().astype(bool))


def is_int(token: str) -> bool:
    return bool(validate_int(pa.array([token], pa.large_string()))[0])


def zerofill_int(token: str) -> str:
    """normalizeToText' (Int.hs:55-63): sign prefix '0'/'1' + zero-pad to 20.

    "1" → "100000000000000000001"; "-1" → "000000000000000000001".
    (The reference keeps the digits of negatives un-complemented; we
    replicate that behavior exactly, quirks included.)
    """
    if token.startswith("-"):
        pfx, nr = "0", token[1:]
    else:
        pfx, nr = "1", token
    return pfx + "0" * (20 - len(nr)) + nr


def unzerofill_int(key: str) -> str:
    """denormalizeFromText (Int.hs:73-79)."""
    raw = key[1:].lstrip("0")
    if raw == "":
        raw = "0"
    return raw if key[0] == "1" else "-" + raw


def norm_zerofill(tokens) -> pa.Array:
    """Vectorized zerofill: strip sign, zfill(20), prepend '0'/'1'."""
    s = pl.from_arrow(_as_arrow(tokens))
    if isinstance(s, pl.DataFrame):
        s = s.to_series()
    s = s.alias("t")
    df = pl.DataFrame({"t": s})
    neg = pl.col("t").str.starts_with("-")
    digits = pl.when(neg).then(pl.col("t").str.slice(1)).otherwise(
        pl.col("t").str.strip_prefix("+"))
    out = (pl.when(neg).then(pl.lit("0")).otherwise(pl.lit("1"))
           + digits.str.zfill(20))
    return df.select(out.alias("t"))["t"].to_arrow()


# ---------------------------------------------------------------- date

_DAYS_IN_MONTH = np.array([0, 31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])


def validate_date(tokens) -> np.ndarray:
    """isAnyDate (Date.hs:77-79): vectorized month/day range check incl.
    leap years for the dominant YYYY-MM-DD token shape; the remaining xsd
    shapes (dateTime, gYearMonth, gYear, gMonthDay, gMonth, gDay, optional
    timezone) fall back to the scalar reader set."""
    arr = _as_arrow(tokens)
    shaped = pc.match_substring_regex(
        arr, r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$").to_numpy(zero_copy_only=False).astype(bool)
    n = len(arr)
    ok = np.zeros(n, dtype=bool)
    if not shaped.all():
        toks = arr.to_pylist()
        for i in np.flatnonzero(~shaped):
            ok[i] = parse_any_date(toks[i]) is not None
    if shaped.any():
        yy = pc.utf8_slice_codeunits(arr, 0, 4).cast(pa.string())
        mm = pc.utf8_slice_codeunits(arr, 5, 7)
        dd = pc.utf8_slice_codeunits(arr, 8, 10)
        # cast only the shaped ones (others may contain non-digits)
        idx = np.flatnonzero(shaped)
        y = np.asarray(pc.cast(yy.take(pa.array(idx)), pa.int32()))
        m = np.asarray(pc.cast(mm.take(pa.array(idx)), pa.int32()))
        d = np.asarray(pc.cast(dd.take(pa.array(idx)), pa.int32()))
        leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
        m_ok = (m >= 1) & (m <= 12)
        max_d = np.where(m_ok, _DAYS_IN_MONTH[np.clip(m, 0, 12)], 0)
        feb = m == 2
        max_d = np.where(feb & ~leap, 28, max_d)
        ok[idx] = m_ok & (d >= 1) & (d <= max_d)
    return ok


def is_any_date(token: str) -> bool:
    if len(token) == 10:
        return bool(validate_date(pa.array([token], pa.large_string()))[0])
    return parse_any_date(token) is not None


_DATE_FORMATS = (
    ("%Y-%m-%dT%H:%M:%S", 19),   # xsd:dateTime
    ("%Y-%m-%dT%H:%M", 16),
    ("%Y-%m-%d", 10),            # xsd:date
    ("%Y-%m", 7),                # xsd:gYearMonth
    ("%Y", 4),                   # xsd:gYear
    ("--%m-%d", 7),              # xsd:gMonthDay → year 1 (Date.hs:281-287)
    ("--%m", 4),                 # xsd:gMonth    → (1, m, 1) (Date.hs:289-293)
    ("---%d", 5),                # xsd:gDay      → (1, 1, d) (Date.hs:295-299)
)

import re as _re

_TZ_RE = _re.compile(r"(Z|[+-]\d{2}:\d{2})$")


def parse_any_date(token: str) -> datetime | None:
    """readAnyDateM equivalent: the xsd dateTime/date/gYearMonth/gYear/
    gMonthDay/gMonth/gDay shapes with optional Z / ±HH:MM timezone
    (Date.hs:162-327) — scalar, shared by query keys and the tokenizer
    fallback path.

    Timezone quirk kept for parity: the reference's ``toUTCTime`` ADDS the
    offset to the wall time (``addUTCTime tz d``, Date.hs:150-156) rather
    than subtracting it, so "+02:00" moves the normalized time forward.
    """
    from datetime import timedelta

    t = token
    offset = None
    m = _TZ_RE.search(t)
    if m:
        z = m.group(1)
        t = t[: m.start()]
        if z == "Z":
            offset = timedelta(0)
        else:
            sign = 1 if z[0] == "+" else -1
            offset = sign * timedelta(hours=int(z[1:3]), minutes=int(z[4:6]))
    for fmt, ln in _DATE_FORMATS:
        if len(t) == ln:
            try:
                d = datetime.strptime(t, fmt)
                if fmt.startswith("-"):  # gMonthDay/gMonth/gDay: year 1
                    d = d.replace(year=1)
            except ValueError:
                continue
            if offset is not None:
                d = d + offset  # toUTC adds the offset (reference quirk)
            return d
    return None


def normalize_date(token: str) -> str:
    """Date.normalize (Date.hs:54-66): "2013-01-01" → "20130101000000"."""
    if len(token) == 10 and token[4] == "-" and token[7] == "-":
        return token.replace("-", "") + "000000"
    d = parse_any_date(token)
    if d is None:
        return token
    # f-string formatting: strftime %Y does not zero-pad year 1 everywhere
    return (f"{d.year:04d}{d.month:02d}{d.day:02d}"
            f"{d.hour:02d}{d.minute:02d}{d.second:02d}")


def denormalize_date(key: str) -> str:
    """Date.denormalize (Date.hs:69-74)."""
    return f"{key[0:4]}-{key[4:6]}-{key[6:8]} {key[8:10]}:{key[10:12]}:{key[12:14]}"


def norm_date(tokens) -> pa.Array:
    """Vectorized for the tokenizer's YYYY-MM-DD shape; falls back to the
    scalar parser for other ISO shapes (query keys)."""
    arr = _as_arrow(tokens)
    shaped = pc.match_substring_regex(arr, r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$")
    if bool(pc.all(shaped).as_py()) if len(arr) else True:
        stripped = pc.replace_substring(arr, pattern="-", replacement="")
        pad = pa.array(["000000"] * len(arr), type=pa.string())
        return pc.binary_join_element_wise(stripped.cast(pa.string()), pad, "")
    return pa.array([normalize_date(t) for t in arr.to_pylist()], pa.large_string())


# ---------------------------------------------------------------- position

# Parsec's `position` parser (Normalize/Position.hs:33-52): a signed decimal
# latitude, a literal '-', a signed decimal longitude — prefix match
# (the reference parses without eof, accepting trailing characters).
_POS_RE = _re.compile(r"([+-]?[0-9]+(?:\.[0-9]+)?)-([+-]?[0-9]+(?:\.[0-9]+)?)")


def parse_position(token: str) -> tuple[float, float] | None:
    """(lat, lon) for a "lat-lon" token, None if invalid — bounds exclusive
    (Position.hs:40-52: lat ∈ (-90, 90), lon ∈ (-180, 180))."""
    m = _POS_RE.match(token)
    if not m:
        return None
    lat, lon = float(m.group(1)), float(m.group(2))
    if not (-90.0 < lat < 90.0 and -180.0 < lon < 180.0):
        return None
    return lat, lon


def is_position(token: str) -> bool:
    """isPosition (Position.hs:28-29)."""
    return parse_position(token) is not None


def _position_fields(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized parse of "lat-lon" tokens: (ok mask, lat, lon fixed-point
    int32 values; 0 where invalid). ``^``-anchored extract_regex mirrors
    ``_POS_RE.match``'s prefix semantics; bounds exclusive like
    :func:`parse_position`."""
    ext = pc.extract_regex(
        pc.cast(arr, pa.large_string()),
        r"^(?P<la>[+-]?[0-9]+(?:\.[0-9]+)?)-(?P<lo>[+-]?[0-9]+(?:\.[0-9]+)?)")
    lat = pc.cast(pc.struct_field(ext, "la"), pa.float64()).to_numpy(
        zero_copy_only=False)
    lon = pc.cast(pc.struct_field(ext, "lo"), pa.float64()).to_numpy(
        zero_copy_only=False)
    with np.errstate(invalid="ignore"):
        ok = ((lat > -90.0) & (lat < 90.0)
              & (lon > -180.0) & (lon < 180.0))  # NaN (no match) → False
    # same double product + half-even rounding as round(f * 10000000)
    ila = np.rint(np.where(ok, lat, 0.0) * 1e7).astype(np.int64)
    ilo = np.rint(np.where(ok, lon, 0.0) * 1e7).astype(np.int64)
    return ok, ila, ilo


def validate_position(tokens) -> np.ndarray:
    return _position_fields(_as_arrow(tokens))[0]


def _dec2bin(i: int) -> str:
    """dec2bin (Position.hs:107-116): sign char ('0' = NEGATIVE, '1' =
    non-negative — the reference's convention) + 31-bit zero-padded binary
    magnitude."""
    sign = "0" if i < 0 else "1"
    return sign + format(abs(i), "b").zfill(31)


def _bin2dec(s: str) -> int:
    """bin2dec (Position.hs:97-104)."""
    mag = int(s[1:], 2)
    return -mag if s[0] == "0" else mag


def normalize_position(token: str) -> str:
    """Position.normalize (Position.hs:61-68): lat/lon → 1e-7 fixed point →
    32-char sign+binary each → bit-interleaved (lat first) 64-char string.
    Golden: normalize("1-1") ==
    "1100000000000000110000111100000011000011001111001100000000000000"
    (AnalyzerTests.hs:155-156)."""
    p = parse_position(token)
    if p is None:
        return token
    la = _dec2bin(round(p[0] * 10000000))
    lo = _dec2bin(round(p[1] * 10000000))
    return "".join(a + b for a, b in zip(la, lo))


def denormalize_position(key: str) -> str:
    """Position.denormalize (Position.hs:74-95): de-interleave, decode each
    dimension, format with 7 decimals (showFFloat (Just 7))."""
    la = _bin2dec(key[0::2]) / 10000000.0
    lo = _bin2dec(key[1::2]) / 10000000.0
    return f"{la:.7f}-{lo:.7f}"


def position_in_range(key: str, lb: str, ub: str) -> bool:
    """2-dim containment over interleaved keys — the observable semantics
    of ``Data.StringMap.Dim2Search.lookupRange`` (PrefixTreeIndex2Dim.hs:
    96-97): each dimension's 32-char sign+binary string must lie within the
    corresponding bound strings lexicographically. (Sign-magnitude encoding
    means negative coordinates order inverted — a reference quirk we keep;
    its own property test only exercises non-negative coordinates,
    InterpreterTests.hs:543-560.)"""
    return (lb[0::2] <= key[0::2] <= ub[0::2]
            and lb[1::2] <= key[1::2] <= ub[1::2])


def norm_position(tokens) -> pa.Array:
    """Vectorized Position.normalize: fixed-point sign-magnitude uint32 per
    dimension, bit-interleaved via one unpackbits round trip (the exact
    inverse of ``index.rtree.decode_dims``); invalid tokens pass through."""
    arr = _as_arrow(tokens)
    n = len(arr)
    if n == 0:
        return pa.array([], pa.large_string())
    ok, ila, ilo = _position_fields(arr)
    # dec2bin's 32-char string read as binary == (sign<<31) | magnitude,
    # sign bit 1 for non-negative (Position.hs:107-116)
    la32 = np.where(ila >= 0, ila + 2**31, -ila).astype(np.uint32)
    lo32 = np.where(ilo >= 0, ilo + 2**31, -ilo).astype(np.uint32)
    la_bits = np.unpackbits(la32[:, None].astype(">u4").view(np.uint8), axis=1)
    lo_bits = np.unpackbits(lo32[:, None].astype(">u4").view(np.uint8), axis=1)
    chars = np.empty((n, 64), np.uint8)
    chars[:, 0::2] = la_bits + ord("0")
    chars[:, 1::2] = lo_bits + ord("0")
    offsets = np.arange(0, (n + 1) * 64, 64, dtype=np.int64)
    normed = pa.Array.from_buffers(
        pa.large_string(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(chars.tobytes())])
    return pc.if_else(pa.array(ok), normed, pc.cast(arr, pa.large_string()))


# ---------------------------------------------------------------- registry

NORMALIZERS = {
    "LowerCase": norm_lowercase,
    "UpperCase": norm_uppercase,
    "ZeroFill": norm_zerofill,
    "Date": norm_date,
    "Position": norm_position,
}

VALIDATORS = {
    "text": validate_non_empty,
    "text-small": validate_non_empty,
    "int": validate_int,
    "date": validate_date,
    "position": validate_position,
}


def apply_normalizer_chain(names: list[str], tokens) -> pa.Array:
    """normalize' — left-to-right function composition (Schema.hs:248-249)."""
    tokens = _as_arrow(tokens)
    for name in names:
        tokens = NORMALIZERS[name](tokens)
    return tokens
