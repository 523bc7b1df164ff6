from datetime import datetime, timezone

import pytest

from aresdb_spark.aql import timeutil as T

NOW = datetime(2024, 5, 15, 13, 47, 23, tzinfo=timezone.utc)  # a Wednesday


def test_now_and_epoch():
    assert T.parse_time_point("now", NOW) == NOW
    assert T.parse_time_point("1715780843", NOW) == datetime.fromtimestamp(1715780843, tz=timezone.utc)


def test_relative_short():
    assert T.parse_time_point("-1d", NOW) == NOW.replace(day=14)
    assert T.parse_time_point("-2h", NOW) == NOW.replace(hour=11)
    assert T.parse_time_point("+1w", NOW) == NOW.replace(day=22)
    assert T.parse_time_point("-1M", NOW) == NOW.replace(month=4)
    assert T.parse_time_point("-1y", NOW) == NOW.replace(year=2023)


def test_ago():
    assert T.parse_time_point("24 hours ago", NOW) == NOW.replace(day=14)
    assert T.parse_time_point("1 day ago", NOW) == NOW.replace(day=14)
    assert T.parse_time_point("2 weeks ago", NOW) == NOW.replace(day=1)


def test_this_unit():
    assert T.parse_time_point("this hour", NOW) == NOW.replace(minute=0, second=0)
    assert T.parse_time_point("this day", NOW) == NOW.replace(hour=0, minute=0, second=0)
    # Monday of this week (2024-05-13)
    assert T.parse_time_point("this week", NOW) == datetime(2024, 5, 13, tzinfo=timezone.utc)
    assert T.parse_time_point("this quarter-hour", NOW) == NOW.replace(minute=45, second=0)
    assert T.parse_time_point("this quarter", NOW) == datetime(2024, 4, 1, tzinfo=timezone.utc)
    assert T.parse_time_point("this year", NOW) == datetime(2024, 1, 1, tzinfo=timezone.utc)


def test_last_unit():
    assert T.parse_time_point("last day", NOW) == datetime(2024, 5, 14, tzinfo=timezone.utc)
    assert T.parse_time_point("last week", NOW) == datetime(2024, 5, 6, tzinfo=timezone.utc)
    assert T.parse_time_point("last month", NOW) == datetime(2024, 4, 1, tzinfo=timezone.utc)


def test_absolute():
    assert T.parse_time_point("2024-01-02", NOW) == datetime(2024, 1, 2, tzinfo=timezone.utc)
    assert T.parse_time_point("2024-01-02 03:04:05", NOW) == datetime(2024, 1, 2, 3, 4, 5, tzinfo=timezone.utc)


def test_bounds():
    lo, hi = T.time_filter_bounds("-1d", "now", NOW)
    assert lo == NOW.replace(day=14) and hi == NOW
    lo, hi = T.time_filter_bounds(None, "now", NOW)
    assert lo is None


def test_bad_input():
    with pytest.raises(ValueError):
        T.parse_time_point("whenever", NOW)
