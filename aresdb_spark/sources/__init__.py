"""Sources: the hot/cold (live/archive) table abstraction.

Reference read path: live-store batches + archive-store daily batches with
an exactly-once cutoff between them (memstore/live_store.go:70-78,
query/aql_processor.go:543-570).
"""

from aresdb_spark.sources.hotcold import (  # noqa: F401
    DimensionStore, HotColdStore)
