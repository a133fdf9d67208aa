"""EDTF (Extended Date/Time Format) → Solr DateRange kernel.

A from-scratch, stdlib-only implementation of the reference's dates
indexer semantics (src/solrizer/indexers/dates.py:46-172, which wraps
the python-edtf package), covering the documented conversion corpus
(docs/EDTFtoDateRange.md:18-211 — the reference's unit tests are
table-driven from that file, tests/indexers/test_dates.py:35-74, and
ours are too).

Supported: plain dates (YYYY[-MM[-DD]], negative years), date+time
(→ UTC Z), intervals incl. open ends (``..`` → ``*``), seasons and
other year subdivisions (codes 21-41), unspecified digits (X),
exponential years (|year| ≤ 9999), qualified dates/intervals
(``?`` uncertain, ``~`` approximate, ``%`` both; trailing or
component-attached), and ``[..X]`` / ``[X..]`` single-member sets
(precision only). Unsupported values raise
:class:`UnsupportedEDTF`; unparseable raise :class:`EDTFParseError`
— the Spark stage converts both into null fields + a metrics counter
(reference behavior: warn and skip, dates.py:76-79).
"""

from __future__ import annotations

import calendar
import re
from dataclasses import dataclass
from datetime import datetime, timezone

__all__ = [
    "EDTFParseError",
    "UnsupportedEDTF",
    "edtf_fields",
    "edtf_precision",
    "solr_date_range",
]


class EDTFParseError(ValueError):
    pass


class UnsupportedEDTF(ValueError):
    pass


#: precision-level values (dates.py:33-43)
PRECISION = {"day": 6, "month": 5, "year": 4, "decade": 3, "century": 2, "millennium": 1}

#: season / sub-year grouping codes → (start_month, end_month)
#: (docs/EDTFtoDateRange.md:46-118; winter pinned to year end per
#: edtf.appsettings's simplification)
SEASON_MONTHS: dict[int, tuple[int, int]] = {
    21: (3, 5), 22: (6, 8), 23: (9, 11), 24: (12, 12),
    25: (3, 5), 26: (6, 8), 27: (9, 11), 28: (12, 12),
    29: (9, 11), 30: (12, 12), 31: (3, 5), 32: (6, 8),
    33: (1, 3), 34: (4, 6), 35: (7, 9), 36: (10, 12),
    37: (1, 4), 38: (5, 8), 39: (9, 12),
    40: (1, 6), 41: (7, 12),
}

_DATE_RE = re.compile(
    # the year is always exactly 4 characters (EDTF level 0/1): a
    # looser pattern would accept '1X' or '123XXX' and emit
    # out-of-range Solr years instead of a parse error
    r"^(?P<y>-?(?:\d{4}|\d{3}X|\d{2}X{2}|\d{1}X{3}|X{4}))"
    r"(?:-(?P<m>\d{2}|XX)(?:-(?P<d>\d{2}|XX))?)?$"
)
_EXP_RE = re.compile(r"^Y(?P<mant>-?\d+)E(?P<exp>\d+)$")
_LONGYEAR_RE = re.compile(r"^Y-?\d{5,}$")
_QUAL_CHARS = "?~%"


@dataclass
class _Side:
    """One parsed (non-interval) EDTF value."""

    kind: str  # date | datetime | season | unspecified | exponential | open
    y: int | None = None
    m: int | None = None
    d: int | None = None
    year_x: int = 0  # count of trailing X digits in the year
    season: int | None = None
    dt_utc: str | None = None  # rendered datetime (UTC Z)
    text: str = ""  # cleaned text (qualifiers stripped)
    uncertain: bool = False
    approximate: bool = False
    both: bool = False
    trailing_qualifier: bool = False  # qualifier on the whole value
    component_qualifier: bool = False  # qualifier inside the value


def _ymd(y: int, m: int, d: int) -> str:
    # '{:04d}' keeps the reference's negative-year widths
    # (dates.py:30-31: -500 → '-500', -60 → '-060')
    return f"{y:04d}-{m:02d}-{d:02d}"


def _parse_side(raw: str) -> _Side:
    s = raw.strip()
    if s in ("", ".."):
        return _Side(kind="open")
    uncertain = "?" in s
    approximate = "~" in s
    both = "%" in s
    trailing = bool(s) and s[-1] in _QUAL_CHARS
    cleaned = "".join(c for c in s if c not in _QUAL_CHARS)
    component = (uncertain or approximate or both) and not (
        trailing and sum(c in _QUAL_CHARS for c in s) == 1
    )
    side = _Side(
        kind="date", text=cleaned, uncertain=uncertain, approximate=approximate,
        both=both, trailing_qualifier=trailing and not component,
        component_qualifier=component,
    )
    if _LONGYEAR_RE.match(cleaned):
        raise UnsupportedEDTF("Solr does not support years outside -9999..9999")
    m_exp = _EXP_RE.match(cleaned)
    if m_exp:
        if int(m_exp.group("exp")) > 3:
            raise UnsupportedEDTF("Solr does not support years outside -9999..9999")
        side.kind = "exponential"
        side.y = int(m_exp.group("mant")) * 10 ** int(m_exp.group("exp"))
        if abs(side.y) > 9999:
            raise UnsupportedEDTF("Solr does not support years outside -9999..9999")
        return side
    if "T" in cleaned:
        try:
            dt = datetime.fromisoformat(cleaned)
        except ValueError as e:
            raise EDTFParseError(str(e)) from e
        dt = dt.replace(tzinfo=timezone.utc) if dt.tzinfo is None else dt.astimezone(timezone.utc)
        side.kind = "datetime"
        side.dt_utc = dt.isoformat(sep="T").replace("+00:00", "Z")
        return side
    m_date = _DATE_RE.match(cleaned)
    if not m_date:
        raise EDTFParseError(f"cannot parse {raw!r} as EDTF")
    y, mo, dd = m_date.group("y"), m_date.group("m"), m_date.group("d")
    if "X" in y:
        side.kind = "unspecified"
        side.year_x = len(y) - len(y.rstrip("X"))
        side.y = int(y.rstrip("X") or "0") * 10 ** side.year_x
        return side
    side.y = int(y)
    if mo is not None:
        if mo == "XX":
            side.kind = "unspecified"
        else:
            side.m = int(mo)
            if not 1 <= side.m <= 41:
                raise EDTFParseError(f"invalid month {mo}")
            if side.m > 12:
                if side.m not in SEASON_MONTHS:
                    raise EDTFParseError(f"invalid sub-year code {mo}")
                side.kind = "season"
                side.season = side.m
                side.m = None
                return side
    if dd is not None:
        if dd == "XX":
            side.kind = "unspecified"
        else:
            side.d = int(dd)
            if not 1 <= side.d <= 31:
                raise EDTFParseError(f"invalid day {dd}")
    return side


def _strict_bounds(side: _Side) -> tuple[str, str]:
    """(lower_strict, upper_strict) as YYYY-MM-DD strings."""
    if side.kind == "open":
        raise UnsupportedEDTF("open section has no strict bounds")
    if side.kind == "datetime":
        day = side.dt_utc.split("T")[0]
        return day, day
    if side.kind == "exponential":
        return _ymd(side.y, 1, 1), _ymd(side.y, 12, 31)
    if side.kind == "season":
        lo_m, hi_m = SEASON_MONTHS[side.season]
        return _ymd(side.y, lo_m, 1), _ymd(side.y, hi_m, calendar.monthrange(side.y if side.y > 0 else 2001, hi_m)[1])
    if side.kind == "unspecified":
        if side.year_x:
            span = 10 ** side.year_x - 1
            if side.y < 0:
                # '-19XX' denotes the years -1999..-1900: the span
                # extends AWAY from zero for negative years
                lo_y, hi_y = side.y - span, side.y
            else:
                lo_y, hi_y = side.y, side.y + span
            return _ymd(lo_y, 1, 1), _ymd(hi_y, 12, 31)
        if side.m is None:  # month unspecified
            return _ymd(side.y, 1, 1), _ymd(side.y, 12, 31)
        last = calendar.monthrange(side.y if side.y > 0 else 2001, side.m)[1]
        return _ymd(side.y, side.m, 1), _ymd(side.y, side.m, last)
    # plain date
    if side.m is None:
        return _ymd(side.y, 1, 1), _ymd(side.y, 12, 31)
    if side.d is None:
        last = calendar.monthrange(side.y if side.y > 0 else 2001, side.m)[1]
        return _ymd(side.y, side.m, 1), _ymd(side.y, side.m, last)
    return _ymd(side.y, side.m, side.d), _ymd(side.y, side.m, side.d)


def _render_single(side: _Side) -> str:
    """Render a non-interval EDTF value (solr_date single-value cases,
    dates.py:105-141)."""
    if side.kind == "open":
        raise UnsupportedEDTF("a bare open section is not a date")
    if side.kind == "datetime":
        return side.dt_utc
    if side.kind in ("season", "unspecified", "exponential"):
        lo, hi = _strict_bounds(side)
        return f"[{lo} TO {hi}]"
    if side.component_qualifier:
        # PartialUncertainOrApproximate → padded lower-strict date
        return _strict_bounds(side)[0]
    return side.text  # reduced-precision form kept verbatim


def _render_interval_side(side: _Side, which: str) -> str:
    if side.kind == "open":
        return "*"
    if side.kind == "datetime":
        return side.dt_utc
    if side.component_qualifier or side.kind in ("season", "unspecified", "exponential"):
        lo, hi = _strict_bounds(side)
        return lo if which == "lower" else hi
    return side.text


def _split_interval(s: str) -> tuple[str, str] | None:
    if s.startswith("[") and s.endswith("]"):
        inner = s[1:-1]
        if inner.startswith(".."):
            return "..", inner[2:]
        if inner.endswith(".."):
            return inner[:-2], ".."
        return None
    if "/" in s:
        a, b = s.split("/", 1)
        return a, b
    return None


def _parse(edtf_string: str) -> list[_Side]:
    """Parse to one side (single value) or two sides (interval)."""
    s = str(edtf_string).strip()
    if not s:
        raise EDTFParseError("empty EDTF string")
    parts = _split_interval(s)
    if parts is None:
        return [_parse_side(s)]
    lower, upper = _parse_side(parts[0]), _parse_side(parts[1])
    if lower.kind == "open" and upper.kind == "open":
        raise UnsupportedEDTF("fully open interval")
    return [lower, upper]


def _render(sides: list[_Side]) -> str:
    if len(sides) == 1:
        return _render_single(sides[0])
    return (
        f"[{_render_interval_side(sides[0], 'lower')}"
        f" TO {_render_interval_side(sides[1], 'upper')}]"
    )


def solr_date_range(edtf_string: str) -> str:
    """EDTF string → Solr DateRange string (solr_date, dates.py:93-141)."""
    return _render(_parse(edtf_string))


def _side_precision(side: _Side) -> int | None:
    if side.kind == "open":
        return None
    if side.kind in ("season", "datetime"):
        return None  # dates.py:158-160 (Season → None); DateAndTime → fallthrough None
    if side.kind == "exponential":
        return PRECISION["year"]
    if side.kind == "unspecified":
        if side.year_x:
            return {1: 3, 2: 2, 3: 1}.get(side.year_x, 0) or None
        if side.m is None:
            return PRECISION["year"]
        return PRECISION["month"]
    if side.d is not None:
        return PRECISION["day"]
    if side.m is not None:
        return PRECISION["month"]
    return PRECISION["year"]


def _precision(sides: list[_Side]) -> int | None:
    precisions = [p for p in (_side_precision(x) for x in sides) if p is not None]
    return min(precisions) if precisions else None


def edtf_precision(edtf_string: str) -> int | None:
    """EDTF string → precision int 1–6 (get_precision, dates.py:144-172)."""
    return _precision(_parse(edtf_string))


def edtf_fields(edtf_string: str) -> dict:
    """The 5-field bundle the dates indexer emits per ``*__edtf`` field
    (date_fields, dates.py:46-81). Raises on unsupported/unparseable.
    Parses once; render and precision share the parsed sides (this is
    the vectorized UDF's per-row hot path)."""
    sides = _parse(edtf_string)
    return {
        "dt": _render(sides),
        "is_uncertain": any(x.uncertain for x in sides),
        "is_approximate": any(x.approximate for x in sides),
        "is_uncertain_and_approximate": any(x.both for x in sides),
        "precision": _precision(sides),
    }
