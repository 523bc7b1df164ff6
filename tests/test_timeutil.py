from datetime import datetime, timezone

import pytest

from aresdb_spark.aql import timeutil as T

NOW = datetime(2024, 5, 15, 13, 47, 23, tzinfo=timezone.utc)  # a Wednesday


def dt(*a):
    return datetime(*a, tzinfo=timezone.utc)


def test_now_and_epoch():
    assert T.parse_time_window("now", NOW) == (NOW, NOW)
    e = datetime.fromtimestamp(1715780843, tz=timezone.utc)
    assert T.parse_time_window("1715780843", NOW) == (e, e)


def test_relative_short_is_calendar_aligned():
    # reference applyTimeOffset: "-1d" = yesterday's calendar day window
    assert T.parse_time_window("-1d", NOW) == (dt(2024, 5, 14), dt(2024, 5, 15))
    assert T.parse_time_window("-2h", NOW) == (dt(2024, 5, 15, 11), dt(2024, 5, 15, 12))
    # weeks align to Monday (this week's Monday is 5-13)
    assert T.parse_time_window("+1w", NOW) == (dt(2024, 5, 20), dt(2024, 5, 27))
    assert T.parse_time_window("-1M", NOW) == (dt(2024, 4, 1), dt(2024, 5, 1))
    assert T.parse_time_window("-1y", NOW) == (dt(2023, 1, 1), dt(2024, 1, 1))


def test_ago_is_unit_aligned():
    assert T.parse_time_point("24 hours ago", NOW) == dt(2024, 5, 14, 13)
    assert T.parse_time_point("1 day ago", NOW) == dt(2024, 5, 14)
    assert T.parse_time_point("2 weeks ago", NOW) == dt(2024, 4, 29)


def test_this_unit():
    assert T.parse_time_window("this hour", NOW) == (dt(2024, 5, 15, 13), dt(2024, 5, 15, 14))
    assert T.parse_time_window("this day", NOW) == (dt(2024, 5, 15), dt(2024, 5, 16))
    assert T.parse_time_window("this week", NOW) == (dt(2024, 5, 13), dt(2024, 5, 20))
    assert T.parse_time_window("this quarter-hour", NOW) == \
        (dt(2024, 5, 15, 13, 45), dt(2024, 5, 15, 14, 0))
    assert T.parse_time_window("this quarter", NOW) == (dt(2024, 4, 1), dt(2024, 7, 1))
    assert T.parse_time_window("this year", NOW) == (dt(2024, 1, 1), dt(2025, 1, 1))
    assert T.parse_time_window("today", NOW) == (dt(2024, 5, 15), dt(2024, 5, 16))


def test_last_unit():
    assert T.parse_time_window("last day", NOW) == (dt(2024, 5, 14), dt(2024, 5, 15))
    assert T.parse_time_window("yesterday", NOW) == (dt(2024, 5, 14), dt(2024, 5, 15))
    assert T.parse_time_window("last week", NOW) == (dt(2024, 5, 6), dt(2024, 5, 13))
    assert T.parse_time_window("last month", NOW) == (dt(2024, 4, 1), dt(2024, 5, 1))
    # ADVICE fix: "last quarter-hour" is 15 minutes, not a day
    assert T.parse_time_window("last quarter-hour", NOW) == \
        (dt(2024, 5, 15, 13, 30), dt(2024, 5, 15, 13, 45))


def test_absolute_units():
    assert T.parse_time_window("2024-01-02", NOW) == (dt(2024, 1, 2), dt(2024, 1, 3))
    assert T.parse_time_window("2024-02", NOW) == (dt(2024, 2, 1), dt(2024, 3, 1))
    assert T.parse_time_window("2024-Q2", NOW) == (dt(2024, 4, 1), dt(2024, 7, 1))
    s = dt(2024, 1, 2, 3, 4, 5)
    assert T.parse_time_window("2024-01-02 03:04:05", NOW) == \
        (s, s.replace(second=6))
    # minute%15==0 → quarter-hour unit (reference parseAbsoluteTime hack)
    assert T.parse_time_window("2024-01-02 03:45", NOW) == \
        (dt(2024, 1, 2, 3, 45), dt(2024, 1, 2, 4, 0))


def test_bounds_from_start_to_end():
    # from → window start, to → window end: from/to = "last day" covers
    # the whole of yesterday (the ADVICE example)
    lo, hi = T.time_filter_bounds("last day", "last day", NOW)
    assert (lo, hi) == (dt(2024, 5, 14), dt(2024, 5, 15))
    lo, hi = T.time_filter_bounds("this day", "this day", NOW)
    assert (lo, hi) == (dt(2024, 5, 15), dt(2024, 5, 16))
    # missing `to` with present `from` → now
    lo, hi = T.time_filter_bounds("-1d", None, NOW)
    assert (lo, hi) == (dt(2024, 5, 14), NOW)
    lo, hi = T.time_filter_bounds(None, "now", NOW)
    assert lo is None and hi == NOW


def test_timezone_alignment():
    from zoneinfo import ZoneInfo

    ny = ZoneInfo("America/New_York")
    lo, hi = T.time_filter_bounds("this day", "this day", NOW, tz=ny)
    # NY midnight = 04:00 UTC (EDT)
    assert lo.astimezone(timezone.utc) == dt(2024, 5, 15, 4)
    assert hi.astimezone(timezone.utc) == dt(2024, 5, 16, 4)


def test_bad_input():
    with pytest.raises(ValueError):
        T.parse_time_point("whenever", NOW)
    with pytest.raises(ValueError):
        T.parse_time_window("last fortnight", NOW)
