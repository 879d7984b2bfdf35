"""Timestamps and durations.

The engine's canonical time unit is **int64 nanoseconds since the Unix
epoch** (reference: stdb/common/basic.h:30-31, u64 ns).  Query strings
accept ISO 8601 *basic* format (``20060102T150405.999999999``) or a raw
integer timestamp, plus duration literals ``N[n|us|ms|s|m|min|h|d]``
(reference semantics: stdb/common/datetime.cc:60-229).
"""

from __future__ import annotations

import datetime as _dt
import re

NS_PER_US = 1_000
NS_PER_MS = 1_000_000
NS_PER_SEC = 1_000_000_000
NS_PER_MIN = 60 * NS_PER_SEC
NS_PER_HOUR = 60 * NS_PER_MIN
NS_PER_DAY = 24 * NS_PER_HOUR

_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


class BadDateTimeFormat(ValueError):
    """Unparseable timestamp or duration literal."""


_DURATION_RE = re.compile(r"^(\d+)(n|us|s|min|ms|m|h|d)?$")

_DURATION_UNIT_NS = {
    None: 1,
    "n": 1,
    "us": NS_PER_US,
    "ms": NS_PER_MS,
    "s": NS_PER_SEC,
    "m": NS_PER_MIN,
    "min": NS_PER_MIN,
    "h": NS_PER_HOUR,
    "d": NS_PER_DAY,
}


def parse_duration_ns(text: str) -> int:
    """``"30s" -> 30_000_000_000``; bare integers are nanoseconds.

    Mirrors DateTimeUtil::parse_duration (stdb/common/datetime.cc:185-229).
    """
    m = _DURATION_RE.match(text.strip())
    if not m:
        raise BadDateTimeFormat(f"bad duration: {text!r}")
    return int(m.group(1)) * _DURATION_UNIT_NS[m.group(2)]


def parse_timestamp_ns(value) -> int:
    """Accept int ns, ISO-8601-basic string, or decimal-integer string.

    Mirrors DateTimeUtil::from_iso_string (stdb/common/datetime.cc:60-150):
    strings shorter than 15 chars or without 'T' at index 8 are raw
    integer nanosecond timestamps; otherwise YYYYMMDDTHHMMSS[.fffffffff]
    interpreted as UTC.
    """
    if isinstance(value, (int, float)):
        return int(value)
    text = str(value).strip()
    if not text:
        raise BadDateTimeFormat("empty timestamp value")
    # trim leading non-digits (the reference trims left until a digit)
    i = 0
    while i < len(text) and not text[i].isdigit():
        i += 1
    text = text[i:]
    if len(text) < 15 or (len(text) > 8 and text[8] != "T"):
        if not re.fullmatch(r"\d+", text):
            raise BadDateTimeFormat(f"unknown timestamp format: {value!r}")
        return int(text)
    m = re.fullmatch(
        r"(\d{4})(\d{2})(\d{2})T(\d{2})(\d{2})(\d{2})(?:[.,](\d{1,9}))?", text
    )
    if not m:
        raise BadDateTimeFormat(f"unknown timestamp format: {value!r}")
    year, month, day, hour, minute, second = (int(m.group(k)) for k in range(1, 7))
    frac = m.group(7)
    nanos = int(frac.ljust(9, "0")) if frac else 0
    dt = _dt.datetime(year, month, day, hour, minute, second, tzinfo=_dt.timezone.utc)
    return int((dt - _EPOCH).total_seconds()) * NS_PER_SEC + nanos


def format_iso8601_ns(ts_ns: int) -> str:
    """``to_iso_string`` parity: YYYYMMDDTHHMMSS.fffffffff (always 9 frac digits)."""
    secs, nanos = divmod(int(ts_ns), NS_PER_SEC)
    dt = _EPOCH + _dt.timedelta(seconds=secs)
    return f"{dt.year:04d}{dt.month:02d}{dt.day:02d}T{dt.hour:02d}{dt.minute:02d}{dt.second:02d}.{nanos:09d}"
