"""Data-handler front door: wire bytes → metastore schema → enum
translation → HotColdStore ingest, plus redo-log replay recovery."""

from datetime import datetime

import pytest

from aresdb_spark.metastore import SchemaStore
from aresdb_spark.sources.hotcold import HotColdStore
from aresdb_spark.streaming.data_handler import (DataHandler,
                                                 recover_from_redo_log)
from aresdb_spark.streaming.upsert_wire import (UpsertBatchBuilder,
                                                write_redo_log)

SCHEMA = {
    "name": "trips",
    "columns": [{"name": "request_at", "type": "Uint32"},
                {"name": "trip_id", "type": "Int64"},
                {"name": "status", "type": "SmallEnum"},
                {"name": "fare", "type": "Float32"}],
    "primaryKeyColumns": [1],
    "isFactTable": True,
    "archivingSortColumns": [0],
}

CUTOFF = datetime(2024, 1, 1)
T0 = int(datetime(2024, 1, 5).timestamp())  # after cutoff → hot store


def make_handler(spark, tmp_path):
    ss = SchemaStore()
    ss.create_table(SCHEMA)
    ss.extend_enum_dict("trips", "status", ["completed", "cancelled"])
    store = HotColdStore(path=str(tmp_path / "trips"),
                         time_column="request_at",
                         primary_key=("trip_id",))
    empty = spark.createDataFrame(
        [], "request_at timestamp, trip_id bigint, status string, fare float")
    store.init_from(empty, cutoff=CUTOFF)
    return DataHandler(spark, ss, {"trips": store})


def batch(rows, arrival=10, fare_mode=0):
    b = UpsertBatchBuilder(arrival_time=arrival)
    b.add_column(0, "Uint32")
    b.add_column(1, "Int64")
    b.add_column(2, "SmallEnum")
    b.add_column(3, "Float32", update_mode=fare_mode)
    for r, (ts, tid, status, fare) in enumerate(rows):
        b.add_row()
        b.set_value(r, 0, ts)
        b.set_value(r, 1, tid)
        if status is not None:
            b.set_value(r, 2, status)
        if fare is not None:
            b.set_value(r, 3, fare)
    return b.to_byte_array()


def test_post_data_ingests_and_translates_enums(spark, tmp_path):
    h = make_handler(spark, tmp_path)
    status, body = h.post_data(
        "trips", 0, batch([(T0, 1, 0, 2.5), (T0 + 60, 2, 1, 4.0),
                           (T0 + 120, 3, 99, None)]))  # 99: unknown enum id
    assert status == 200 and body["rows"] == 3
    rows = {r["trip_id"]: r
            for r in h.stores["trips"].read_hot(spark).collect()}
    assert rows[1]["status"] == "completed"
    assert rows[2]["status"] == "cancelled"
    assert rows[3]["status"] is None          # out-of-dictionary id → NULL
    assert rows[1]["request_at"] == datetime.fromtimestamp(T0)
    # second batch upserts by PK with the wire's own update mode (add)
    status, _ = h.post_data("trips", 0,
                            batch([(T0, 1, None, 1.5)], fare_mode=2))
    assert status == 200
    rows = {r["trip_id"]: r
            for r in h.stores["trips"].read_hot(spark).collect()}
    assert rows[1]["fare"] == pytest.approx(4.0)   # 2.5 + 1.5
    assert rows[1]["status"] == "completed"        # overwrite-not-null kept


def test_post_data_error_codes(spark, tmp_path):
    h = make_handler(spark, tmp_path)
    assert h.post_data("nope", 0, b"whatever")[0] == 404
    assert h.post_data("trips", 0, b"\x00bad")[0] == 400


def test_recover_from_redo_log(spark, tmp_path):
    h = make_handler(spark, tmp_path)
    log = write_redo_log([
        batch([(T0, 1, 0, 2.0)]),
        batch([(T0 + 60, 2, 1, 3.0)], arrival=11),
    ])
    assert recover_from_redo_log(h, "trips", log) == 2
    got = sorted(r["trip_id"]
                 for r in h.stores["trips"].read_hot(spark).collect())
    assert got == [1, 2]
