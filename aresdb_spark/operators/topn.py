"""Top-N per group — the grouped counterpart of the global Top-K.

The reference's only ordering machinery is the (SQL-parsed, never
executed) ORDER BY plus the non-agg LIMIT (SURVEY §2.7); grouped top-N
doesn't exist there but every leaderboard-style workload needs it.

Spark shape: row_number over a per-group window, filter ≤ n. One hash
shuffle on the group keys; each group sorts independently (never a global
sort), and Spark's WindowGroupLimit pushes the limit into the sort so
partitions keep only n rows per group before ranking at scale. Callers
must pass a total order (include a tiebreaker) for deterministic output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topn_per_group(df: DataFrame, group_cols: list[str],
                   order_by: list[Column], n: int,
                   rank_col: str = "rn") -> DataFrame:
    """Keep the first ``n`` rows of each group under ``order_by`` (pass
    ``F.desc(...)``/``F.asc(...)`` columns; include a unique tiebreaker
    for determinism). Adds ``rank_col`` (1-based row_number)."""
    if n <= 0:
        raise ValueError("n must be positive")
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= n))


def topn_per_group_oracle_sql(source_sql: str, group_cols: list[str],
                              order_by_sql: str, n: int,
                              rank_col: str = "rn",
                              select: str = "*") -> str:
    """DuckDB rendering via QUALIFY over the same window."""
    part = ", ".join(group_cols)
    return (f"SELECT {select}, row_number() OVER "
            f"(PARTITION BY {part} ORDER BY {order_by_sql}) AS {rank_col} "
            f"FROM ({source_sql}) "
            f"QUALIFY {rank_col} <= {n}")
