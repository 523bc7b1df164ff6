import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ARESDB_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from aresdb_spark.session import get_spark

    s = get_spark(app_name="aresdb-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"),
                  shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def load_events(spark, sf_dir=SF_DIR):
    """events with a proper timestamp ``ts``, across Spark versions.

    The testdata writes events.ts as INT64 TIMESTAMP(NANOS). Spark 3 reads it
    as bigint (via spark.sql.legacy.parquet.nanosAsLong) and needs a
    truncating nanos->micros cast; Spark 4 reads it natively as timestamp_ntz
    and ignores the legacy flag, so the cast must be skipped.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def assert_df_matches_duck(df, duck, sql, sort_by=None, approx=False, tol=1e-9):
    """Compare a Spark DataFrame against a DuckDB oracle query."""
    import math

    spark_rows = [tuple(r) for r in df.collect()]
    duck_rows = [tuple(r) for r in duck.execute(sql).fetchall()]

    def norm(rows):
        def nv(v):
            from datetime import datetime
            from decimal import Decimal
            if isinstance(v, Decimal):
                return float(v)
            if isinstance(v, datetime):
                return v.replace(tzinfo=None)
            return v
        return sorted([tuple(nv(v) for v in r) for r in rows], key=lambda r: tuple(str(x) for x in r))

    a, b = norm(spark_rows), norm(duck_rows)
    assert len(a) == len(b), f"row count {len(a)} != {len(b)}\nspark={a[:5]}\nduck={b[:5]}"
    for ra, rb in zip(a, b):
        assert len(ra) == len(rb), f"width mismatch {ra} vs {rb}"
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                assert va == pytest.approx(vb, rel=tol, abs=tol), f"{ra} vs {rb}"
            else:
                assert va == vb, f"{ra} vs {rb}"
