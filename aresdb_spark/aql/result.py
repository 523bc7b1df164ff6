"""Result shaping — the reference's nested time-series JSON format.

Reference: query/common/aql_query_result.go:22-40 — an aggregate result is
a nested map keyed by dimension values (outermost = first dimension), leaf
= the measure value; NULL dimension values render as the string "NULL"
(query/aql_postprocessor.go:130-135). Non-aggregate results are
{"headers": [...], "matrixData": [[...], ...]}
(query/common/aql_query_result.go:35-40).
"""

from __future__ import annotations

import math
import re
from datetime import date, datetime, timezone
from typing import Any

from pyspark.sql import DataFrame

NULL_STRING = "NULL"  # queryCom.NULLString

# collect() guard: an agg result bigger than this indicates a runaway
# group-by cardinality — at 100 TB an unbounded driver collect is an OOM.
MAX_RESULT_ROWS = 1_000_000


def _key(v: Any, float32: bool = False) -> str:
    if v is None:
        return NULL_STRING
    if isinstance(v, datetime):
        # Spark returns session-tz-naive datetimes (session tz pinned UTC);
        # epoch must be computed in UTC regardless of the driver host tz
        return str(int(v.replace(tzinfo=timezone.utc).timestamp()))
    if isinstance(v, date):
        return str(int(datetime(v.year, v.month, v.day, tzinfo=timezone.utc).timestamp()))
    if isinstance(v, bool):
        # the reference renders booleans through FormatInt
        # (dimval.go:61-72): true = "1", false = "0"
        return "1" if v else "0"
    if isinstance(v, float):
        if v.is_integer() and not math.isinf(v):
            return str(int(v))
        if float32:
            # float columns carry float32 values widened to double on
            # collect; the reference formats them shortest-round-trip at
            # 32 bits (strconv.FormatFloat 'g' -1 32, dimval.go:57) —
            # "1.2", not the double expansion "1.2000000476837158"
            from aresdb_spark.functions.hll_wire import _format_float32_g
            return _format_float32_g(v)
        return str(v)
    return str(v)


_WEEKDAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
             "Saturday", "Sunday"]  # Monday=0, matching the -4d epoch shift


def time_dim_formatter(bucketizer: str | None,
                       time_unit: str | None):
    """Key formatter for one time dimension — the reference's
    formatTimeDimension (query/common/dimval.go:146-210).

    With ``timeUnit`` set, keys are numeric: the epoch value divided to
    the unit ("day"/"hour"/"minute", "millisecond" multiplies; anything
    else — incl. "second" — passes through). Without it, keys are
    human-formatted per bucketizer: minute-grain regular buckets →
    "2006-01-02 15:04", hour → "2006-01-02 15:00", day → "2006-01-02",
    "time of day"/"hour of day" → "15:04", "hour of week" →
    "Monday 15:04", "day of week" → "Monday"; every other bucketizer
    (week/month/quarter/year, day-of-month/-year, month/quarter-of-year,
    N-minutes-of-day) falls through ParseRegularTimeBucketizer and
    renders the raw value numerically.

    Input values are this engine's bucket outputs (truncated naive
    datetimes for regular buckets; ints for recurring), converted to the
    reference's numeric val where the two representations differ."""
    if bucketizer is None:
        return None
    b = bucketizer.strip().lower()

    def epoch(v) -> int:
        if isinstance(v, datetime):
            return int(v.replace(tzinfo=timezone.utc).timestamp())
        if isinstance(v, date):
            return int(datetime(v.year, v.month, v.day,
                                tzinfo=timezone.utc).timestamp())
        return int(v)

    # our recurring ints → the reference's seconds-based val (its
    # recurring buckets are floor(ts % bucketSize, baseUnit) SECONDS,
    # time_bucketizer.go:52-57,176-194; irregular recurring functors
    # like day-of-month emit plain numbers — scale 1)
    ref_scale = {"hour of day": 3600, "hour of week": 3600,
                 "day of week": 86400}.get(b, 1)
    if re.match(r"^\d+\s+minutes of day$", b):
        ref_scale = 60

    if time_unit:
        div = {"day": 86400, "hour": 3600, "minute": 60}.get(time_unit)

        def fmt_unit(v):
            val = epoch(v) * ref_scale
            if div:
                return str(val // div)
            if time_unit == "millisecond":
                return str(val * 1000)
            return str(val)
        return fmt_unit

    if b == "time of day":
        return lambda v: f"{int(v) // 3600:02d}:{int(v) % 3600 // 60:02d}"
    if b == "hour of day":
        return lambda v: f"{int(v):02d}:00"
    if b == "hour of week":
        return lambda v: f"{_WEEKDAYS[int(v) // 24]} {int(v) % 24:02d}:00"
    if b == "day of week":
        return lambda v: _WEEKDAYS[int(v)]
    if b in ("minute", "quarter-hour", "half-hour") \
            or re.fullmatch(r"\d+\s+minutes|\d*m", b):
        return lambda v: v.strftime("%Y-%m-%d %H:%M")
    if b == "hour" or re.fullmatch(r"\d+\s+hours|\d*h", b):
        return lambda v: v.strftime("%Y-%m-%d %H:00")
    if b == "day" or b == "d" or re.fullmatch(r"\d+d", b):
        return lambda v: v.strftime("%Y-%m-%d")
    # week/month/quarter/year + remaining recurring buckets: the
    # reference's ParseRegularTimeBucketizer fallback — numeric, in the
    # reference's val convention (seconds-based for N-minutes-of-day,
    # epoch for coarse regular buckets, plain numbers for irregular)
    return lambda v: str(epoch(v) * ref_scale)


def dim_key_formatters(query) -> list:
    """One formatter (or None) per dimension of an AQL Query. A wildcard
    dimension expands to a variable number of output columns in the
    planner, breaking positional alignment — such queries (which cannot
    carry bucketizers on the wildcard anyway) get no formatters."""
    if any(d.expr == "*" for d in query.dimensions):
        return []
    return [time_dim_formatter(d.time_bucketizer, d.time_unit)
            for d in query.dimensions]


def to_aggregate_result(df: DataFrame, n_dims: int,
                        max_rows: int = MAX_RESULT_ROWS,
                        dim_formatters: "list | None" = None) -> dict:
    """Collect an aggregate query result into the nested map format.

    The driver/caller supplies n_dims = number of leading dimension
    columns; remaining columns are measures (one → scalar leaf, several →
    list leaf, generalizing the reference's single-measure rule).
    ``dim_formatters`` (from dim_key_formatters) renders time-dimension
    keys the way the reference's postprocessor does; without one a value
    falls back to _key (epoch seconds for datetimes).

    Bounded: collects at most max_rows + 1 rows and errors past the cap
    rather than OOMing the driver on a runaway group-by cardinality.
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"aggregate result exceeds {max_rows} rows; add a LIMIT or "
            "reduce group-by cardinality (driver-collect guard)")
    fmts = dim_formatters or [None] * n_dims
    f32 = [t == "float" for _n, t in df.dtypes]

    def key(i, v):
        if v is None or fmts[i] is None:
            return _key(v, float32=f32[i])
        return fmts[i](v)

    result: dict = {}
    for row in rows:
        vals = list(row)
        dims, measures = vals[:n_dims], vals[n_dims:]
        if n_dims == 0:
            return {"value": measures[0] if len(measures) == 1 else measures}
        node = result
        for i, d in enumerate(dims[:-1]):
            node = node.setdefault(key(i, d), {})
        node[key(n_dims - 1, dims[-1])] = \
            measures[0] if len(measures) == 1 else measures
    return result


def to_matrix_result(df: DataFrame, max_rows: int = MAX_RESULT_ROWS,
                     dim_formatters: "list | None" = None) -> dict:
    """Non-aggregate result: headers + matrixData
    (reference: query/common/aql_query_result.go:35-40). Every cell is a
    STRING — the reference marshals ``[]*string`` rows read through
    ReadDimension (aql_postprocessor.go:129-143), NULLs as "NULL" and
    time dimensions formatted per their bucketizer. Non-agg queries
    always carry a LIMIT (default 1000) but the cap guards direct calls.

    ``dim_formatters`` aligns with the leading output columns (a
    wildcard projection expands past the declared dimensions — those
    extra columns take the default rendering)."""
    rows = df.limit(max_rows).collect()
    fmts = dim_formatters or []
    f32 = [t == "float" for _n, t in df.dtypes]

    def cell(i, v):
        if v is not None and i < len(fmts) and fmts[i] is not None:
            return fmts[i](v)
        return _key(v, float32=f32[i])

    return {
        "headers": list(df.columns),
        "matrixData": [[cell(i, v) for i, v in enumerate(row)]
                       for row in rows],
    }
