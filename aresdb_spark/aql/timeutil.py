"""Relative time-filter grammar + time bucketizers.

Reference:
  - relative time grammar: query/common/time_filter.go:241-341
    ("now", "-7d", "24 hours ago", "this quarter-hour", "last week", ...)
  - regular bucketizers:   query/time_bucketizer.go:72-174
    (minute(s)/hour(s)/day/week/month/quarter/year — week starts Monday,
    aligned via the -4d epoch shift; Spark's date_trunc('week') matches)
  - recurring bucketizers: query/time_bucketizer.go:44-65, 176-230
    (time of day, hour of day, hour of week, day of week/month/year,
    month/quarter of year)

All bucketizers emit JVM-side Column expressions (no UDFs) so Catalyst can
constant-fold and push work into whole-stage codegen.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Relative time grammar → datetime
# ---------------------------------------------------------------------------

_UNIT_SECONDS = {
    "s": 1, "second": 1, "seconds": 1,
    "m": 60, "minute": 60, "minutes": 60,
    "h": 3600, "hour": 3600, "hours": 3600,
    "d": 86400, "day": 86400, "days": 86400,
    "w": 604800, "week": 604800, "weeks": 604800,
}

_CAL_UNITS = {"month", "months", "quarter", "quarters", "year", "years", "M", "y"}


def _truncate(dt: datetime, unit: str) -> datetime:
    """Truncate dt to the start of `unit` (reference: alignment rules in
    time_filter.go — week starts Monday)."""
    if unit in ("second",):
        return dt.replace(microsecond=0)
    if unit in ("minute",):
        return dt.replace(second=0, microsecond=0)
    if unit in ("quarter-hour",):
        return dt.replace(minute=dt.minute - dt.minute % 15, second=0, microsecond=0)
    if unit in ("hour",):
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit in ("day",):
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit in ("week",):
        d = dt.replace(hour=0, minute=0, second=0, microsecond=0)
        return d - timedelta(days=d.weekday())  # Monday
    if unit in ("month",):
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit in ("quarter",):
        q_month = dt.month - (dt.month - 1) % 3
        return dt.replace(month=q_month, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit in ("year",):
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    raise ValueError(f"unknown truncation unit {unit!r}")


def _shift_calendar(dt: datetime, n: int, unit: str) -> datetime:
    """Shift by n calendar months/quarters/years (sign carried by n)."""
    months = {"month": 1, "months": 1, "M": 1,
              "quarter": 3, "quarters": 3,
              "year": 12, "years": 12, "y": 12}[unit] * n
    total = dt.year * 12 + (dt.month - 1) + months
    year, month = divmod(total, 12)
    import calendar
    day = min(dt.day, calendar.monthrange(year, month + 1)[1])
    return dt.replace(year=year, month=month + 1, day=day)


_REL_SHORT = re.compile(r"^([+-]?\d+)([smhdwMy])$")          # -7d, +3h, 2w
_AGO = re.compile(r"^(\d+)\s+([a-zA-Z-]+?)s?\s+ago$")        # 24 hours ago
_THIS = re.compile(r"^this\s+([a-zA-Z-]+)$")                 # this quarter-hour
_LAST = re.compile(r"^last\s+([a-zA-Z-]+)$")                 # last day


def parse_time_point(text: str, now: datetime | None = None) -> datetime:
    """Parse one endpoint of a time filter (reference grammar,
    time_filter.go:241-341). Returns a timezone-aware UTC datetime."""
    now = (now or datetime.now(timezone.utc)).astimezone(timezone.utc)
    t = text.strip()
    low = t.lower()

    if low == "now":
        return now.replace(microsecond=0)
    if re.fullmatch(r"\d{9,}", t):  # epoch seconds
        return datetime.fromtimestamp(int(t), tz=timezone.utc)

    m = _REL_SHORT.match(t)
    if m:
        n, unit = int(m.group(1)), m.group(2)
        if unit in ("M", "y"):
            return _shift_calendar(now, n, unit).replace(microsecond=0)
        return (now + timedelta(seconds=n * _UNIT_SECONDS[unit])).replace(microsecond=0)

    m = _AGO.match(low)
    if m:
        n, unit = int(m.group(1)), m.group(2)
        if unit in _CAL_UNITS or unit in ("month", "quarter", "year"):
            return _shift_calendar(now, -n, unit).replace(microsecond=0)
        return (now - timedelta(seconds=n * _UNIT_SECONDS[unit])).replace(microsecond=0)

    m = _THIS.match(low)
    if m:
        return _truncate(now, m.group(1))

    m = _LAST.match(low)
    if m:
        unit = m.group(1)
        this_start = _truncate(now, unit)
        if unit in ("month", "quarter", "year"):
            step = {"month": 1, "quarter": 3, "year": 12}[unit]
            return _shift_calendar(this_start, -1, {"month": "month", "quarter": "quarter", "year": "year"}[unit]) \
                if unit != "quarter" else _shift_calendar(this_start, -1, "quarter")
        return this_start - timedelta(seconds=_UNIT_SECONDS.get(unit, 86400))

    # absolute: ISO date or datetime
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M", "%Y-%m-%d"):
        try:
            return datetime.strptime(t, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
    raise ValueError(f"cannot parse time point {text!r}")


def time_filter_bounds(
    from_: str | None, to: str | None, now: datetime | None = None
) -> tuple[datetime | None, datetime | None]:
    """Resolve a TimeFilter's endpoints. `from` inclusive, `to` exclusive
    (reference: query/aql_compiler.go:987-1065 builds ts >= from AND ts < to)."""
    lo = parse_time_point(from_, now) if from_ else None
    hi = parse_time_point(to, now) if to else None
    return lo, hi


# ---------------------------------------------------------------------------
# Time bucketizers → Column
# ---------------------------------------------------------------------------

_N_UNIT = re.compile(r"^(\d+)\s+(minutes?|hours?)$")
_TRUNC_UNITS = {
    "second": "second", "minute": "minute", "hour": "hour", "day": "day",
    "week": "week", "month": "month", "quarter": "quarter", "year": "year",
}


def time_bucket(ts: Column, bucketizer: str) -> Column:
    """Regular + recurring time bucketizers (SURVEY §2.5).

    Regular buckets return truncated TIMESTAMP columns; recurring buckets
    return INT columns (e.g. hour-of-day 0-23, day-of-week 1-7 Sunday=1 to
    match the reference's MySQL-compatible dayofweek).
    """
    b = bucketizer.strip().lower()

    # regular: plain unit
    if b in _TRUNC_UNITS:
        return F.date_trunc(_TRUNC_UNITS[b], ts)
    if b == "quarter-hour":
        return _floor_seconds(ts, 900)
    if b == "half-hour":
        return _floor_seconds(ts, 1800)

    # regular: "N minutes" / "N hours"
    m = _N_UNIT.match(b)
    if m:
        n, unit = int(m.group(1)), m.group(2)
        secs = n * (60 if unit.startswith("minute") else 3600)
        return _floor_seconds(ts, secs)

    # recurring (reference: time_bucketizer.go:44-65)
    if b == "time of day":
        return F.hour(ts) * 3600 + F.minute(ts) * 60 + F.second(ts)
    m = re.match(r"^(\d+)\s+minutes of day$", b)
    if m:
        n = int(m.group(1))
        mins = F.hour(ts) * 60 + F.minute(ts)
        return (mins - mins % n)
    if b == "hour of day":
        return F.hour(ts)
    if b == "hour of week":
        # week starts Monday (reference -4d epoch shift); Monday 00:00 = 0
        dow_mon0 = (F.dayofweek(ts) + 5) % 7  # Sunday=1 → Monday=0
        return dow_mon0 * 24 + F.hour(ts)
    if b == "day of week":
        return F.dayofweek(ts)  # Sunday=1, MySQL-compatible like the reference
    if b == "day of month":
        return F.dayofmonth(ts)
    if b == "day of year":
        return F.dayofyear(ts)
    if b == "month of year":
        return F.month(ts)
    if b == "quarter of year":
        return F.quarter(ts)
    raise ValueError(f"unknown time bucketizer {bucketizer!r}")


def _floor_seconds(ts: Column, secs: int) -> Column:
    epoch = F.unix_timestamp(ts)
    return F.timestamp_seconds((epoch - epoch % secs))


def time_bucket_oracle_sql(col: str, bucketizer: str) -> str:
    """DuckDB-SQL rendering of the same bucketizer, for oracle tests."""
    b = bucketizer.strip().lower()
    if b in _TRUNC_UNITS:
        return f"date_trunc('{_TRUNC_UNITS[b]}', {col})"
    if b == "quarter-hour":
        return f"to_timestamp((epoch({col})::BIGINT // 900) * 900)"
    if b == "half-hour":
        return f"to_timestamp((epoch({col})::BIGINT // 1800) * 1800)"
    m = _N_UNIT.match(b)
    if m:
        n, unit = int(m.group(1)), m.group(2)
        secs = n * (60 if unit.startswith("minute") else 3600)
        return f"to_timestamp((epoch({col})::BIGINT // {secs}) * {secs})"
    if b == "time of day":
        return f"(hour({col}) * 3600 + minute({col}) * 60 + second({col}))::INT"
    if b == "hour of day":
        return f"hour({col})::INT"
    if b == "hour of week":
        return f"(((dayofweek({col}) + 6) % 7) * 24 + hour({col}))::INT"
    if b == "day of week":
        return f"(dayofweek({col}) + 1)::INT"  # duckdb dayofweek: Sunday=0
    if b == "day of month":
        return f"dayofmonth({col})::INT"
    if b == "day of year":
        return f"dayofyear({col})::INT"
    if b == "month of year":
        return f"month({col})::INT"
    if b == "quarter of year":
        return f"quarter({col})::INT"
    raise ValueError(f"unknown time bucketizer {bucketizer!r}")


# ---------------------------------------------------------------------------
# Numeric bucketizer (reference: query/common/aql.go:26-45)
# ---------------------------------------------------------------------------


def numeric_bucket(col: Column, *, bucket_width: float | None = None,
                   log_base: float | None = None,
                   manual_partitions: list[float] | None = None) -> Column:
    """Equal-width / log-width / manual-partition bucketing of a numeric
    dimension; returns the bucket's lower bound (reference semantics)."""
    if bucket_width is not None:
        w = F.lit(float(bucket_width))
        return F.floor(col / w) * w
    if log_base is not None:
        import math
        lb = math.log(float(log_base))
        log_idx = F.floor(F.log(col.cast("double")) / F.lit(lb))
        return F.pow(F.lit(float(log_base)), log_idx)
    if manual_partitions:
        # bucket = greatest partition boundary <= value; below first → null
        c: Column = F.lit(None).cast("double")
        for b in sorted(manual_partitions):
            c = F.when(col >= F.lit(float(b)), F.lit(float(b))).otherwise(c)
        return c
    raise ValueError("numeric bucketizer requires bucket_width, log_base, or manual_partitions")
