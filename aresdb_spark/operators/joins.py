"""As-of (nearest-timestamp) join — a custom operator Spark lacks.

The reference engine has only dimension equi-joins (SURVEY §2.3;
query/aql_compiler.go:268-343), but a time-series engine's users routinely
need "attach the latest right-side record at or before each left event"
(price-as-of-trade, last-config-as-of-request). DuckDB exposes this as
``ASOF JOIN``, which doubles as our correctness oracle.

Spark-first design — one shuffle, no O(n·m) range join:

  1. UNION the two sides into one DataFrame, tagged ``__side`` (0 = right,
     1 = left). Left-only columns are NULL on right rows and vice versa.
  2. One window partitioned by the ``by`` keys, ordered by
     ``(on, __side)``: ``last(value, ignorenulls=True)`` carries the most
     recent right-side values forward onto each left row.
  3. Keep the left rows.

The only shuffle is the window's hash partition on ``by`` — identical to
what any join on ``by`` would pay, and AQE handles skewed keys. Sorting is
per-key-partition, never global. With ``by=None`` the window is a single
partition (documented; only for small inputs — a global as-of needs a
range partitioner with boundary replication, which no caller here needs).

Tie semantics match DuckDB: ``strict=False`` (default) matches right rows
at exactly ``left.on`` (DuckDB ``l.t >= r.t``); ``strict=True`` excludes
them (``l.t > r.t``). Ordering ``__side`` ascending puts equal-timestamp
right rows before the left row (visible to ``last``); descending hides
them — no extra filtering pass either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: list[str] | None = None,
              value_cols: list[str] | None = None,
              direction: str = "backward", strict: bool = False,
              suffix: str = "_r") -> DataFrame:
    """LEFT as-of join: for each left row, attach ``value_cols`` from the
    right row with the greatest ``on`` ≤ left's (``backward``) or the
    least ``on`` ≥ left's (``forward``), per ``by`` group. Unmatched left
    rows keep NULLs. Right value columns colliding with left names get
    ``suffix``. Right rows with NULL ``on`` never match.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    by = list(by or [])
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != on]
    out_names = {v: v + suffix if v in left.columns else v for v in value_cols}
    right_types = dict(right.dtypes)

    l_tagged = left.select(
        *left.columns, F.lit(1).alias("__side"),
        *[F.lit(None).cast(right_types[v]).alias(out_names[v])
          for v in value_cols])
    left_types = dict(left.dtypes)
    left_only = [c for c in left.columns if c not in by and c != on]
    r_tagged = right.filter(F.col(on).isNotNull()).select(
        *[F.lit(None).cast(left_types[c]).alias(c) for c in left_only],
        *by, on, F.lit(0).alias("__side"),
        *[F.col(v).alias(out_names[v]) for v in value_cols],
    ).select(l_tagged.columns)  # align column order for union

    asc = direction == "backward"
    on_key = F.col(on).asc() if asc else F.col(on).desc()
    # inclusive: right rows at equal `on` sort before the left row (visible
    # to last()); strict: after it (hidden). Same rule in both directions.
    side_key = F.col("__side").desc() if strict else F.col("__side").asc()
    w = (Window.partitionBy(*by).orderBy(on_key, side_key)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    filled = l_tagged.unionByName(r_tagged).select(
        *[c for c in left.columns],
        F.col("__side"),
        *[F.last(out_names[v], ignorenulls=True).over(w).alias(out_names[v])
          for v in value_cols])
    return filled.filter(F.col("__side") == 1).drop("__side")


def asof_join_oracle_sql(left_sql: str, right_sql: str, on: str = "ts",
                         by: list[str] | None = None,
                         select: str = "*", strict: bool = False) -> str:
    """DuckDB ``ASOF LEFT JOIN`` rendering of the backward as-of join.
    ``left_sql``/``right_sql`` are subqueries; ``select`` projects from
    aliases ``l`` and ``r``."""
    op = ">" if strict else ">="
    keys = " AND ".join([f"l.{k} = r.{k}" for k in (by or [])])
    cond = (keys + " AND " if keys else "") + f"l.{on} {op} r.{on}"
    return (f"SELECT {select} FROM ({left_sql}) l "
            f"ASOF LEFT JOIN ({right_sql}) r ON {cond}")
