import pytest

from stdb_spark.common.timeutil import (
    BadDateTimeFormat,
    NS_PER_SEC,
    format_iso8601_ns,
    parse_duration_ns,
    parse_timestamp_ns,
)


def test_duration_units():
    assert parse_duration_ns("10") == 10
    assert parse_duration_ns("10n") == 10
    assert parse_duration_ns("7us") == 7_000
    assert parse_duration_ns("5ms") == 5_000_000
    assert parse_duration_ns("30s") == 30 * NS_PER_SEC
    assert parse_duration_ns("2m") == 120 * NS_PER_SEC
    assert parse_duration_ns("2min") == 120 * NS_PER_SEC
    assert parse_duration_ns("3h") == 3 * 3600 * NS_PER_SEC
    assert parse_duration_ns("1d") == 86400 * NS_PER_SEC


def test_duration_bad():
    for bad in ("", "x", "10q", "-5s", "1.5s"):
        with pytest.raises(BadDateTimeFormat):
            parse_duration_ns(bad)


def test_iso8601_roundtrip():
    ns = parse_timestamp_ns("20060102T150405.999999999")
    assert format_iso8601_ns(ns) == "20060102T150405.999999999"
    assert parse_timestamp_ns("19700101T000000") == 0
    assert parse_timestamp_ns("19700101T000001") == NS_PER_SEC
    # fractional digits are left-aligned nanoseconds
    assert parse_timestamp_ns("19700101T000000.5") == 500_000_000


def test_raw_and_int_timestamps():
    assert parse_timestamp_ns(12345) == 12345
    assert parse_timestamp_ns("12345") == 12345
    with pytest.raises(BadDateTimeFormat):
        parse_timestamp_ns("12345xyz")
    with pytest.raises(BadDateTimeFormat):
        parse_timestamp_ns("")
