"""Range (interval-containment) join — bucket-expanded to an equi-join.

The reference has no range join (SURVEY §2.3: equi-join only); Spark plans
a bare ``l.x BETWEEN r.lo AND r.hi`` join as BroadcastNestedLoopJoin —
O(n·m) work that only survives when one side broadcasts. The scalable
pattern is bucket expansion:

  1. Pick a bucket width ``w``. Each right interval ``[lo, hi]`` explodes
     to the buckets it overlaps (``floor(lo/w) … floor(hi/w)``) — cheap
     when intervals are short relative to ``w``.
  2. Each left point maps to its single bucket ``floor(x/w)``.
  3. Equi-join on ``(bucket, *by)`` — a hash shuffle both sides — then
     re-check the exact containment predicate.

Work is O(n + m·k + candidates) where k = avg buckets per interval;
choose ``w`` near the typical interval length so k ≈ 2. Skewed buckets
fall under AQE's skew-join splitting like any other equi-join. The DuckDB
oracle is the plain inequality join (exact semantics, any plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _num(col: str, types: dict) -> "F.Column":
    """Numeric view of a column: timestamps via epoch seconds."""
    c = F.col(col)
    if str(types.get(col, "")).startswith("timestamp"):
        return F.unix_timestamp(c)
    return c


def derive_bucket_width(right: DataFrame, lower: str, upper: str) -> float:
    """Median interval length of the right side — the width that keeps the
    expansion factor k = avg buckets per interval ≈ 2. One bounded
    aggregate job (percentile_approx: a fixed-size sketch per partition,
    merged on the driver — no sort, no collect of rows). Zero/degenerate
    medians fall back to 1.0 so point intervals still bucket."""
    r_types = dict(right.dtypes)
    p50 = right.select(F.percentile_approx(
        _num(upper, r_types) - _num(lower, r_types), 0.5).alias("w")
    ).first()["w"]
    w = float(p50 or 0.0)
    return w if w > 0 else 1.0


def range_join(left: DataFrame, right: DataFrame, point: str,
               lower: str, upper: str, bucket_width: "float | None" = None,
               by: list[str] | None = None,
               how: str = "inner") -> DataFrame:
    """Join each left row to every right interval containing it:
    ``left.point BETWEEN right.lower AND right.upper`` (inclusive both
    ends), optionally also matching on ``by`` key columns. ``how`` may be
    ``inner`` or ``left`` (unmatched left rows keep NULL right columns).
    Numeric or timestamp columns both work; ``bucket_width`` is in the
    column's native unit (seconds for timestamps). When omitted, the
    width is derived from the data (median interval length, one extra
    bounded job — see derive_bucket_width); pass it explicitly to skip
    that job or to tune k for skewed interval-length distributions.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how!r}")
    by = list(by or [])
    if bucket_width is None:
        bucket_width = derive_bucket_width(right, lower, upper)
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    # resolve each column's type against ITS OWN side — a same-named column
    # on the other side with a different type must not shadow it
    l_types, r_types = dict(left.dtypes), dict(right.dtypes)

    def b(col, types):  # bucket index; timestamps via epoch seconds
        return F.floor(_num(col, types) / w).cast("long")

    r_exp = right.withColumn(
        "__bucket",
        F.explode(F.sequence(b(lower, r_types), b(upper, r_types))))
    l_keyed = left.withColumn("__bucket", b(point, l_types))

    cond = [l_keyed["__bucket"] == r_exp["__bucket"]]
    cond += [l_keyed[k] == r_exp[k] for k in by]
    cond.append(l_keyed[point] >= r_exp[lower])
    cond.append(l_keyed[point] <= r_exp[upper])
    joined = l_keyed.join(r_exp, cond, how)

    keep_r = [c for c in right.columns if c not in by]
    out = joined.select(
        *[l_keyed[c] for c in left.columns],
        *[r_exp[c] for c in keep_r])
    return out


def range_join_oracle_sql(left_sql: str, right_sql: str, point: str,
                          lower: str, upper: str,
                          by: list[str] | None = None,
                          select: str = "*", how: str = "inner") -> str:
    """Plain inequality-join DuckDB rendering (exact oracle)."""
    keys = " AND ".join([f"l.{k} = r.{k}" for k in (by or [])])
    cond = (keys + " AND " if keys else "") + \
        f"l.{point} >= r.{lower} AND l.{point} <= r.{upper}"
    j = "JOIN" if how == "inner" else "LEFT JOIN"
    return (f"SELECT {select} FROM ({left_sql}) l {j} ({right_sql}) r "
            f"ON {cond}")
