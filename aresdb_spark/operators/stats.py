"""Histogram-sketch statistics: single-pass approximate quantiles.

The engine's exact ``median``/``percentile`` measures (planner whitelist)
sort-shuffle the full column — fine at dimension-bounded cardinalities,
wrong tool for a raw 100 TB column. The scalable shape is a fixed-width
histogram: one scan + a shuffle of ``n_bins`` rows, then quantiles read
off the cumulative counts. Error is bounded by the bin width; the
computation is fully deterministic (no sampling), so the DuckDB oracle
reproduces it bit-for-bit — unlike t-digest/KLL sketches whose merge
order is nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bin(col: str, lo: float, width: float, n_bins: int):
    raw = F.floor((F.col(col) - lo) / width)
    return F.least(F.lit(n_bins - 1),
                   F.greatest(F.lit(0), raw)).cast("int")


def histogram(df: DataFrame, col: str, lo: float, hi: float,
              n_bins: int = 64) -> DataFrame:
    """Equal-width histogram of ``col`` over [lo, hi]; out-of-range values
    clamp into the edge bins. Returns (bin, cnt)."""
    if not hi > lo:
        raise ValueError("need hi > lo")
    width = (hi - lo) / n_bins
    return (df.filter(F.col(col).isNotNull())
            .groupBy(_bin(col, lo, width, n_bins).alias("bin"))
            .agg(F.count("*").alias("cnt")))


def histogram_oracle_sql(source_sql: str, col: str, lo: float, hi: float,
                         n_bins: int = 64) -> str:
    width = (hi - lo) / n_bins
    b = (f"least({n_bins - 1}, greatest(0, "
         f"floor(({col} - {lo}) / {width})))::INT")
    return (f"SELECT {b} AS bin, count(*) AS cnt FROM ({source_sql}) "
            f"WHERE {col} IS NOT NULL GROUP BY 1")


def hist_quantiles(df: DataFrame, col: str, lo: float, hi: float,
                   qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                   n_bins: int = 64) -> DataFrame:
    """Approximate quantiles from the histogram: one row with column
    ``q<pct>`` per requested quantile, each the UPPER EDGE of the first
    bin whose cumulative count reaches ceil(q·total). Error ≤ one bin
    width. The cumulative window runs over n_bins rows — negligible."""
    width = (hi - lo) / n_bins
    h = histogram(df, col, lo, hi, n_bins)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    c = h.select("bin", F.sum("cnt").over(w).alias("cum"),
                 F.sum("cnt").over(Window.partitionBy()).alias("total"))
    aggs = []
    for q in qs:
        first_bin = F.min(F.when(
            F.col("cum") >= F.ceil(F.lit(q) * F.col("total")), F.col("bin")))
        est = F.round(F.lit(lo) + (first_bin + 1) * width, 6)
        aggs.append(est.alias(f"q{int(q * 100)}"))
    return c.agg(*aggs)


def hist_quantiles_oracle_sql(source_sql: str, col: str, lo: float,
                              hi: float,
                              qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                              n_bins: int = 64) -> str:
    width = (hi - lo) / n_bins
    hist = histogram_oracle_sql(source_sql, col, lo, hi, n_bins)
    sels = []
    for q in qs:
        # ::DOUBLE — DuckDB's round() yields DECIMAL here, which the
        # driver's value compare treats as a distinct type from Spark's
        # double.
        sels.append(
            f"round({lo} + (min(CASE WHEN cum >= ceil({q} * total) "
            f"THEN bin END) + 1) * {width}, 6)::DOUBLE AS q{int(q * 100)}")
    return (f"SELECT {', '.join(sels)} FROM ("
            f"SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum, "
            f"sum(cnt) OVER () AS total FROM ({hist}) h)")
