"""Series-name grammar: ``metric tag1=v1 tag2=v2 ...``.

Canonical form = metric, then tags sorted alphabetically by key, joined
by single spaces (reference: SeriesParser::to_canonical_form,
stdb/index/seriesparser.h:39-53 / seriesparser.cc).  Events are series
whose metric starts with ``!`` (stdb/query/queryparser.cc:317-329).

Bounds from the reference (stdb/common/basic.h:24-25,32):
    STDB_LIMITS_MAX_SNAME = 4096, STDB_LIMITS_MAX_TAGS = 32,
    max event body = 4096 bytes.
"""

from __future__ import annotations

MAX_SERIES_NAME = 4096
MAX_TAGS = 32
MAX_EVENT_BODY = 4096


class SeriesError(ValueError):
    """Malformed series name."""


def parse_series_name(name: str) -> tuple[str, dict[str, str]]:
    """Split ``metric tag=value ...`` into (metric, tags)."""
    if len(name) > MAX_SERIES_NAME:
        raise SeriesError("series name too long")
    parts = name.split()
    if not parts:
        raise SeriesError("empty series name")
    metric = parts[0]
    if "=" in metric:
        raise SeriesError(f"missing metric name in {name!r}")
    tags: dict[str, str] = {}
    for item in parts[1:]:
        key, sep, value = item.partition("=")
        if not sep or not key or not value:
            raise SeriesError(f"bad tag {item!r} in {name!r}")
        tags[key] = value  # last occurrence wins, like the reference's map
    if len(tags) > MAX_TAGS:
        raise SeriesError("too many tags")
    return metric, tags


def to_canonical_form(name: str) -> str:
    """Normalize whitespace, sort tags by key, dedup keys."""
    metric, tags = parse_series_name(name)
    return make_canonical(metric, tags)


def make_canonical(metric: str, tags: dict[str, str]) -> str:
    if not tags:
        return metric
    body = " ".join(f"{k}={tags[k]}" for k in sorted(tags))
    return f"{metric} {body}"


def is_event_metric(metric: str) -> bool:
    return metric.startswith("!")
