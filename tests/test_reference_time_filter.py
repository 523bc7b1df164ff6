"""Golden: the reference's own time-filter grammar table through
time_filter_bounds.

query/common/time_filter_test.go pins ~60 (expression → [from, to))
cases under America/New_York with now = 2016-03-15 21:24:26
America/Los_Angeles — including every DST trap: spring-forward-crossing
"70 hours ago" (sub-day units are ABSOLUTE instant arithmetic),
the nonexistent "2016-03-13 02" wall hour (Go's time.Date resolves gap
times with the post-transition offset — Python fold=1), the ambiguous
"2015-11-01 01" (first occurrence), and the Sao Paulo midnight-gap
adjustMidnight correction. Expected values are the reference's own
RFC3339 strings; comparison is on epoch seconds, which is exactly what
the compiled predicate uses (ts >= from AND ts < to).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from zoneinfo import ZoneInfo

import pytest

from aresdb_spark.aql.timeutil import parse_time_window, time_filter_bounds

LA = ZoneInfo("America/Los_Angeles")
NY = ZoneInfo("America/New_York")
NOW = datetime(2016, 3, 15, 21, 24, 26, tzinfo=LA)

# (expression, expectedFrom, expectedTo) — time_filter_test.go:43-105
CASES = [
    ("now", "2016-03-16T00:24:26-04:00", "2016-03-16T00:24:26-04:00"),
    ("this year", "2016-01-01T00:00:00-05:00", "2017-01-01T00:00:00-05:00"),
    ("0y", "2016-01-01T00:00:00-05:00", "2017-01-01T00:00:00-05:00"),
    ("this quarter", "2016-01-01T00:00:00-05:00", "2016-04-01T00:00:00-04:00"),
    ("0q", "2016-01-01T00:00:00-05:00", "2016-04-01T00:00:00-04:00"),
    ("this month", "2016-03-01T00:00:00-05:00", "2016-04-01T00:00:00-04:00"),
    ("0M", "2016-03-01T00:00:00-05:00", "2016-04-01T00:00:00-04:00"),
    ("this week", "2016-03-14T00:00:00-04:00", "2016-03-21T00:00:00-04:00"),
    ("0w", "2016-03-14T00:00:00-04:00", "2016-03-21T00:00:00-04:00"),
    ("this day", "2016-03-16T00:00:00-04:00", "2016-03-17T00:00:00-04:00"),
    ("0d", "2016-03-16T00:00:00-04:00", "2016-03-17T00:00:00-04:00"),
    ("today", "2016-03-16T00:00:00-04:00", "2016-03-17T00:00:00-04:00"),
    ("this hour", "2016-03-16T00:00:00-04:00", "2016-03-16T01:00:00-04:00"),
    ("0h", "2016-03-16T00:00:00-04:00", "2016-03-16T01:00:00-04:00"),
    ("this quarter-hour",
     "2016-03-16T00:15:00-04:00", "2016-03-16T00:30:00-04:00"),
    ("this minute", "2016-03-16T00:24:00-04:00", "2016-03-16T00:25:00-04:00"),
    ("0m", "2016-03-16T00:24:00-04:00", "2016-03-16T00:25:00-04:00"),
    ("last year", "2015-01-01T00:00:00-05:00", "2016-01-01T00:00:00-05:00"),
    ("-1y", "2015-01-01T00:00:00-05:00", "2016-01-01T00:00:00-05:00"),
    ("last quarter", "2015-10-01T00:00:00-04:00", "2016-01-01T00:00:00-05:00"),
    ("-1q", "2015-10-01T00:00:00-04:00", "2016-01-01T00:00:00-05:00"),
    ("last month", "2016-02-01T00:00:00-05:00", "2016-03-01T00:00:00-05:00"),
    ("-1M", "2016-02-01T00:00:00-05:00", "2016-03-01T00:00:00-05:00"),
    ("last week", "2016-03-07T00:00:00-05:00", "2016-03-14T00:00:00-04:00"),
    ("-1w", "2016-03-07T00:00:00-05:00", "2016-03-14T00:00:00-04:00"),
    ("last day", "2016-03-15T00:00:00-04:00", "2016-03-16T00:00:00-04:00"),
    ("-1d", "2016-03-15T00:00:00-04:00", "2016-03-16T00:00:00-04:00"),
    ("yesterday", "2016-03-15T00:00:00-04:00", "2016-03-16T00:00:00-04:00"),
    ("last hour", "2016-03-15T23:00:00-04:00", "2016-03-16T00:00:00-04:00"),
    ("-1h", "2016-03-15T23:00:00-04:00", "2016-03-16T00:00:00-04:00"),
    ("last quarter-hour",
     "2016-03-16T00:00:00-04:00", "2016-03-16T00:15:00-04:00"),
    ("last minute", "2016-03-16T00:23:00-04:00", "2016-03-16T00:24:00-04:00"),
    ("-1m", "2016-03-16T00:23:00-04:00", "2016-03-16T00:24:00-04:00"),
    ("2 years ago", "2014-01-01T00:00:00-05:00", "2015-01-01T00:00:00-05:00"),
    ("-2y", "2014-01-01T00:00:00-05:00", "2015-01-01T00:00:00-05:00"),
    ("3 quarters ago",
     "2015-04-01T00:00:00-04:00", "2015-07-01T00:00:00-04:00"),
    ("-3q", "2015-04-01T00:00:00-04:00", "2015-07-01T00:00:00-04:00"),
    ("4 months ago", "2015-11-01T00:00:00-04:00", "2015-12-01T00:00:00-05:00"),
    ("-4M", "2015-11-01T00:00:00-04:00", "2015-12-01T00:00:00-05:00"),
    ("5 weeks ago", "2016-02-08T00:00:00-05:00", "2016-02-15T00:00:00-05:00"),
    ("-5w", "2016-02-08T00:00:00-05:00", "2016-02-15T00:00:00-05:00"),
    ("6 days ago", "2016-03-10T00:00:00-05:00", "2016-03-11T00:00:00-05:00"),
    ("-6d", "2016-03-10T00:00:00-05:00", "2016-03-11T00:00:00-05:00"),
    ("70 hours ago", "2016-03-13T01:00:00-05:00", "2016-03-13T03:00:00-04:00"),
    ("-70h", "2016-03-13T01:00:00-05:00", "2016-03-13T03:00:00-04:00"),
    ("5 quarter-hours ago",
     "2016-03-15T23:00:00-04:00", "2016-03-15T23:15:00-04:00"),
    ("60 minutes ago",
     "2016-03-15T23:24:00-04:00", "2016-03-15T23:25:00-04:00"),
    ("-60m", "2016-03-15T23:24:00-04:00", "2016-03-15T23:25:00-04:00"),
    ("2014", "2014-01-01T00:00:00-05:00", "2015-01-01T00:00:00-05:00"),
    ("2014-Q2", "2014-04-01T00:00:00-04:00", "2014-07-01T00:00:00-04:00"),
    ("2014-03", "2014-03-01T00:00:00-05:00", "2014-04-01T00:00:00-04:00"),
    ("2016-03-13", "2016-03-13T00:00:00-05:00", "2016-03-14T00:00:00-04:00"),
    ("2016-03-13 01", "2016-03-13T01:00:00-05:00", "2016-03-13T03:00:00-04:00"),
    ("2016-03-13 02", "2016-03-13T02:00:00-04:00", "2016-03-13T03:00:00-04:00"),
    ("2016-03-13 01:31",
     "2016-03-13T01:31:00-05:00", "2016-03-13T01:32:00-05:00"),
    ("2015-11-01 01", "2015-11-01T01:00:00-04:00", "2015-11-01T02:00:00-04:00"),
    ("2015-11-01 02", "2015-11-01T02:00:00-05:00", "2015-11-01T03:00:00-05:00"),
    ("2015-11-01 01:31",
     "2015-11-01T01:31:00-04:00", "2015-11-01T01:32:00-04:00"),
    ("1464832800", "2016-06-01T22:00:00-04:00", "2016-06-01T22:00:00-04:00"),
    ("1464832801", "2016-06-01T22:00:01-04:00", "2016-06-01T22:00:01-04:00"),
]


@pytest.mark.parametrize("expr,exp_from,exp_to",
                         CASES, ids=[c[0] for c in CASES])
def test_reference_table(expr, exp_from, exp_to):
    lo, hi = time_filter_bounds(expr, expr, now=NOW, tz=NY)
    assert lo.timestamp() == datetime.fromisoformat(exp_from).timestamp(), \
        f"from: got {lo}"
    assert hi.timestamp() == datetime.fromisoformat(exp_to).timestamp(), \
        f"to: got {hi}"


def test_fixed_timezone_and_default_to_now():
    """time_filter_test.go:134-154 — fixed -07:30 zone; a missing `to`
    with a present `from` defaults to now."""
    fixed = timezone(timedelta(hours=-7, minutes=-30))
    lo, hi = time_filter_bounds("this year", None, now=NOW, tz=fixed)
    assert int(lo.timestamp()) == 1451633400
    assert int(hi.timestamp()) == 1458102266  # now itself
    lo, hi = time_filter_bounds(None, "last year", now=NOW, tz=fixed)
    assert lo is None and int(hi.timestamp()) == 1451633400


def test_sao_paulo_midnight_gap():
    """time_filter_test.go:155-164 — DST starts AT midnight: the day
    window on the transition day begins at the 01:00 the clock actually
    showed, and ends at the next real midnight."""
    sp = ZoneInfo("America/Sao_Paulo")
    base = datetime(2016, 10, 16, 13, 23, tzinfo=sp)
    lo, hi = parse_time_window("this day", now=base, tz=sp)
    assert (lo.day, lo.hour) == (16, 1)
    assert (hi.day, hi.hour) == (17, 0)


@pytest.mark.parametrize("bad", [
    "future", "this", "last friday night", "years ago", "N years ago",
    "-Xd", "2014-01-01 00:00 GMT", "2014-01-01-Haha",
])
def test_errors(bad):
    """time_filter_test.go:165+ — malformed expressions error."""
    with pytest.raises(ValueError):
        parse_time_window(bad, now=NOW, tz=NY)
