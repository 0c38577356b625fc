"""Token normalizers and validators, mirroring Hunt's schema machinery.

Reference:
- LowerCase/UpperCase: ``hunt-searchengine/src/Hunt/Index/Schema.hs:259-269``
- ZeroFill int:        ``Hunt/Index/Schema/Normalize/Int.hs:54-70``
- Date normalize:      ``Hunt/Index/Schema/Normalize/Date.hs:54-66`` —
  any accepted ISO-8601 shape → UTC → digit string "YYYYMMDDHHMMSS"
- Validators:          non-empty for text (Schema.hs:223-231), isInt
  (Int.hs:34-44), isAnyDate (Date.hs:77-79)

Normalizers operate on numpy object arrays of token strings (vectorized
where the kernel allows), because they run inside the tokenizer's Arrow
batch path.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

import numpy as np
import pyarrow.compute as pc

INT64_MIN = -(2**63)
INT64_MAX = 2**63 - 1

# ---------------------------------------------------------------- text

def norm_lowercase(tokens: np.ndarray) -> np.ndarray:
    """cnLowerCase (Schema.hs:265-266)."""
    import pyarrow as pa

    arr = pa.array(tokens, type=pa.string())
    return np.asarray(pc.utf8_lower(arr), dtype=object)


def norm_uppercase(tokens: np.ndarray) -> np.ndarray:
    """cnUpperCase (Schema.hs:259-261)."""
    import pyarrow as pa

    arr = pa.array(tokens, type=pa.string())
    return np.asarray(pc.utf8_upper(arr), dtype=object)


def validate_non_empty(tokens: np.ndarray) -> np.ndarray:
    """cvNotEmpty mask."""
    return np.fromiter((len(t) > 0 for t in tokens), dtype=bool, count=len(tokens))


# ---------------------------------------------------------------- int

_INT_RE = re.compile(r"[-+]?[0-9]+\Z")


def is_int(token: str) -> bool:
    """Bounds-checked signed decimal (Int.hs:34-44)."""
    if not _INT_RE.match(token):
        return False
    try:
        v = int(token)
    except ValueError:
        return False
    return INT64_MIN <= v <= INT64_MAX


def validate_int(tokens: np.ndarray) -> np.ndarray:
    return np.fromiter((is_int(t) for t in tokens), dtype=bool, count=len(tokens))


def zerofill_int(token: str) -> str:
    """normalizeToText' (Int.hs:55-63): sign prefix '0'/'1' + zero-pad to 20.

    "1" → "100000000000000000001"; "-1" → "000000000000000000001".
    (The reference keeps the digits of negatives un-complemented; we replicate
    that behavior exactly, quirks included.)
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


def norm_zerofill(tokens: np.ndarray) -> np.ndarray:
    return np.fromiter((zerofill_int(t) for t in tokens), dtype=object, count=len(tokens))


# ---------------------------------------------------------------- date

# The subset of Hunt's 7 ISO-8601 readers our corpus/query set exercises:
# date, date+time, with optional seconds / timezone Z.
_DATE_FORMATS = (
    ("%Y-%m-%dT%H:%M:%S", 19),
    ("%Y-%m-%dT%H:%M", 16),
    ("%Y-%m-%d", 10),
)


def parse_any_date(token: str) -> datetime | None:
    """readAnyDateM equivalent for the shapes in our query set (Date.hs:162-327)."""
    t = token
    tz = None
    if t.endswith("Z"):
        t = t[:-1]
        tz = timezone.utc
    for fmt, ln in _DATE_FORMATS:
        if len(t) == ln:
            try:
                d = datetime.strptime(t, fmt)
            except ValueError:
                continue
            if tz is not None:
                d = d.replace(tzinfo=tz).astimezone(timezone.utc).replace(tzinfo=None)
            return d
    return None


def is_any_date(token: str) -> bool:
    return parse_any_date(token) is not None


def validate_date(tokens: np.ndarray) -> np.ndarray:
    return np.fromiter((is_any_date(t) for t in tokens), dtype=bool, count=len(tokens))


def normalize_date(token: str) -> str:
    """Date.normalize (Date.hs:54-66): UTC then strip '-', 'T', ':'.

    "2013-01-01" → "20130101000000".
    """
    d = parse_any_date(token)
    if d is None:
        return token
    return d.strftime("%Y%m%d%H%M%S")


def denormalize_date(key: str) -> str:
    """Date.denormalize (Date.hs:69-74): "YYYYMMDDHHMMSS" → "YYYY-MM-DD HH:MM:SS"."""
    return f"{key[0:4]}-{key[4:6]}-{key[6:8]} {key[8:10]}:{key[10:12]}:{key[12:14]}"


def norm_date(tokens: np.ndarray) -> np.ndarray:
    return np.fromiter((normalize_date(t) for t in tokens), dtype=object, count=len(tokens))


# ---------------------------------------------------------------- registry

NORMALIZERS = {
    "LowerCase": norm_lowercase,
    "UpperCase": norm_uppercase,
    "ZeroFill": norm_zerofill,
    "Date": norm_date,
}

VALIDATORS = {
    "text": validate_non_empty,
    "text-small": validate_non_empty,
    "int": validate_int,
    "date": validate_date,
}


def apply_normalizer_chain(names: list[str], tokens: np.ndarray) -> np.ndarray:
    """normalize' — left-to-right function composition (Schema.hs:248-249)."""
    for name in names:
        tokens = NORMALIZERS[name](tokens)
    return tokens
