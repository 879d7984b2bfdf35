import pytest

from stdb_spark.common.seriesparser import (
    SeriesError,
    is_event_metric,
    parse_series_name,
    to_canonical_form,
)


def test_canonical_sorts_tags():
    assert to_canonical_form("cpu  b=2  a=1") == "cpu a=1 b=2"
    assert to_canonical_form("cpu") == "cpu"
    assert to_canonical_form("cpu a=1") == "cpu a=1"


def test_duplicate_tag_last_wins():
    assert to_canonical_form("cpu a=1 a=2") == "cpu a=2"


def test_parse_errors():
    with pytest.raises(SeriesError):
        parse_series_name("")
    with pytest.raises(SeriesError):
        parse_series_name("a=1 b=2")  # missing metric
    with pytest.raises(SeriesError):
        parse_series_name("cpu a=")


def test_event_metric():
    assert is_event_metric("!app.log")
    assert not is_event_metric("app.log")
