"""Table lifecycle walkthrough: operate a fact table for a week under
the scheduler — the reference's day-2 operations story (memstore
scheduler loop driving the archiving / backfill / purge job managers,
memstore/scheduler.go + job_manager.go).

Each simulated day:
  1. a fresh batch of trips arrives (hot ingest), including a few
     LATE rows that take the deferred-backfill queue instead of
     rewriting the immutable cold store;
  2. one scheduler tick runs whatever qualifies — archiving advances
     the cutoff once enough time passed, the backfill job folds the
     queue into cold when the size threshold trips, and the daily
     purge drops whole day-partitions older than the retention window.

At the end, one AQL query over the hot/cold union view answers "trips
and fares per day" — late rows included, expired days gone.

Everything is driven by a deterministic clock (the scheduler takes
`now` as an argument, like the reference's utils.Now injection), so
this script prints the same output every run and is pinned by
tests/test_examples_golden.py::test_lifecycle_walkthrough_golden.

Usage: python examples/run_table_lifecycle.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DAY0 = datetime(2024, 1, 10)
N_DAYS = 7
RETENTION_DAYS = 4


def run(spark, root: str) -> dict:
    from pyspark.sql import Row

    from aresdb_spark.aql import Dimension, Measure, Query
    from aresdb_spark.aql.planner import Planner
    from aresdb_spark.catalog import Catalog, TableDef
    from aresdb_spark.metastore import DEFAULT_TABLE_CONFIG
    from aresdb_spark.sources.hotcold import HotColdStore
    from aresdb_spark.sources.lifecycle import Scheduler, TableLifecycle

    store = HotColdStore(path=os.path.join(root, "trips"),
                         time_column="ts", primary_key=("trip_id",),
                         sort_columns=("ts", "city_id"))
    store.init_from(
        spark.createDataFrame([], "trip_id bigint, ts timestamp, "
                              "city_id bigint, fare double"),
        cutoff=DAY0)

    # table config: archive once 6h of delay accrues, flush backfill at
    # 1 KiB queued, keep RETENTION_DAYS days of archive batches, purge
    # eligible once per day (the reference's purgeInterval)
    cfg = {**DEFAULT_TABLE_CONFIG,
           "archivingDelayMinutes": 6 * 60,
           "archivingIntervalMinutes": 60,
           "backfillThresholdInBytes": 1024,
           "recordRetentionInDays": RETENTION_DAYS}
    sched = Scheduler([TableLifecycle(name="trips", store=store,
                                      config=cfg)])

    def day_batch(day: int):
        """10 on-time trips for `day` + 2 LATE corrections for day-1."""
        base = DAY0 + timedelta(days=day)
        rows = [Row(trip_id=day * 100 + i, ts=base + timedelta(hours=i),
                    city_id=i % 3, fare=10.0 + day + i)
                for i in range(10)]
        late = [Row(trip_id=(day - 1) * 100 + 90 + i,
                    ts=base - timedelta(hours=2 + i),
                    city_id=i % 3, fare=99.0 + i)
                for i in range(2)] if day > 0 else []
        return rows, late

    job_log: list[str] = []
    for day in range(N_DAYS):
        now = DAY0 + timedelta(days=day, hours=23)
        cutoff = store.saved_cutoff()
        rows, late = day_batch(day)
        store.ingest(spark, spark.createDataFrame(rows), cutoff)
        if late:
            store.ingest(spark, spark.createDataFrame(late), cutoff,
                         defer_backfill=True)
        ran = sched.run_once(spark, now)
        for ident in sorted(ran):
            job_log.append(f"day{day}: {ident}")

    catalog = Catalog(root, tables={
        "trips": TableDef("trips", is_fact=True, time_column="ts",
                          primary_key=("trip_id",), hotcold=True)})
    df = Planner(spark, catalog).plan(Query(
        table="trips",
        dimensions=[Dimension(expr="ts", time_bucketizer="day", alias="d")],
        measures=[Measure(expr="count(*)", alias="trips"),
                  Measure(expr="sum(fare)", alias="fares")]))
    daily = {str(r.d.date()): [r.trips, round(r.fares, 2)]
             for r in df.collect()}
    cold_days = store.cold_day_keys()   # committed day keys (pointer)
    return {"jobs": job_log, "daily": daily, "cold_days": cold_days,
            "queued_backfill": len(store.queued_backfill_batches())}


def main():
    from aresdb_spark.session import get_spark

    spark = get_spark(app_name="lifecycle-example", cpus=8,
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = run(spark, tempfile.mkdtemp(prefix="lifecycle_"))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
