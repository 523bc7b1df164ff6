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
from datetime import date, datetime
from typing import Any

from pyspark.sql import DataFrame

NULL_STRING = "NULL"  # queryCom.NULLString


def _key(v: Any) -> str:
    if v is None:
        return NULL_STRING
    if isinstance(v, datetime):
        return str(int(v.replace(tzinfo=None).timestamp()))  # epoch seconds, ref-style
    if isinstance(v, date):
        return str(int(datetime(v.year, v.month, v.day).timestamp()))
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer() and not math.isinf(v):
        return str(int(v))
    return str(v)


def to_aggregate_result(df: DataFrame, n_dims: int) -> dict:
    """Collect an aggregate query result into the nested map format.

    The driver/caller supplies n_dims = number of leading dimension
    columns; remaining columns are measures (one → scalar leaf, several →
    list leaf, generalizing the reference's single-measure rule).
    """
    rows = df.collect()
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


def to_matrix_result(df: DataFrame) -> dict:
    """Non-aggregate result: headers + matrixData
    (reference: query/common/aql_query_result.go:35-40)."""
    rows = df.collect()
    return {
        "headers": list(df.columns),
        "matrixData": [[_key(v) if v is None else v for v in row] for row in rows],
    }
