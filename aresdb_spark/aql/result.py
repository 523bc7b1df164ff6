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
from datetime import date, datetime, timezone
from typing import Any

from pyspark.sql import DataFrame

NULL_STRING = "NULL"  # queryCom.NULLString

# collect() guard: an agg result bigger than this indicates a runaway
# group-by cardinality — at 100 TB an unbounded driver collect is an OOM.
MAX_RESULT_ROWS = 1_000_000


def _key(v: Any) -> str:
    if v is None:
        return NULL_STRING
    if isinstance(v, datetime):
        # Spark returns session-tz-naive datetimes (session tz pinned UTC);
        # epoch must be computed in UTC regardless of the driver host tz
        return str(int(v.replace(tzinfo=timezone.utc).timestamp()))
    if isinstance(v, date):
        return str(int(datetime(v.year, v.month, v.day, tzinfo=timezone.utc).timestamp()))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer() and not math.isinf(v):
        return str(int(v))
    return str(v)


def to_aggregate_result(df: DataFrame, n_dims: int,
                        max_rows: int = MAX_RESULT_ROWS) -> dict:
    """Collect an aggregate query result into the nested map format.

    The driver/caller supplies n_dims = number of leading dimension
    columns; remaining columns are measures (one → scalar leaf, several →
    list leaf, generalizing the reference's single-measure rule).

    Bounded: collects at most max_rows + 1 rows and errors past the cap
    rather than OOMing the driver on a runaway group-by cardinality.
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"aggregate result exceeds {max_rows} rows; add a LIMIT or "
            "reduce group-by cardinality (driver-collect guard)")
    result: dict = {}
    for row in rows:
        vals = list(row)
        dims, measures = vals[:n_dims], vals[n_dims:]
        if n_dims == 0:
            return {"value": measures[0] if len(measures) == 1 else measures}
        node = result
        for d in dims[:-1]:
            node = node.setdefault(_key(d), {})
        node[_key(dims[-1])] = measures[0] if len(measures) == 1 else measures
    return result


def to_matrix_result(df: DataFrame, max_rows: int = MAX_RESULT_ROWS) -> dict:
    """Non-aggregate result: headers + matrixData
    (reference: query/common/aql_query_result.go:35-40). Non-agg queries
    always carry a LIMIT (default 1000) but the cap guards direct calls."""
    rows = df.limit(max_rows).collect()
    return {
        "headers": list(df.columns),
        "matrixData": [[_key(v) if v is None else v for v in row] for row in rows],
    }
