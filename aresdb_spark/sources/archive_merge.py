"""Archiving merge — the reference's sorted base+patch batch merge as a
single declarative DataFrame operation.

Reference: the archiving job merges a sorted archive batch with a sorted
patch of newly-archived (or backfilled) records into a new immutable
batch (memstore/merge.go:333-361 ``mergeContext.merge``; iterators
:173-331). The reference's merge is a two-pointer walk over run-length
encoded sort columns with these observable row-level semantics, all
pinned by its own fixtures (memstore/merge_test.go:374-416 and the
``testing/data/batches/merge*`` golden files):

- output rows are ordered by the table's sort columns, ascending with
  NULLS FIRST (``DataValue.Compare`` ranks invalid below valid,
  memstore/common/data_value.go);
- the merge is stable: on a full sort-key tie, base rows precede patch
  rows, and rows from the same side keep their input order;
- with no sort columns the "merge" is a plain append — base rows then
  patch rows (merge_test.go:724-741);
- base rows tombstoned by backfill are skipped (``rowsDeleted``,
  merge.go:204-208);
- deleted NON-sort columns are short-circuited to all-default (NULL)
  vectors, while deleted SORT columns are still written — their data
  must survive for the ordering to stay meaningful
  (merge_test.go:743-760, "We still write to deleted sort column but
  skip deleted no sort column").

Spark shape: the merge IS a sort. Union the two sides with a side tag
and order by (sort columns NULLS FIRST, side, per-side position) — a
single global sort expresses the entire two-pointer walk, and at scale
it is one range-partitioned shuffle per rewritten batch, the same cost
profile as the reference's per-batch merge job. The archive writer
(sources/writer.py write_archive) then lays the result out
day-partitioned and sorted within files, which restores the row-group
pruning the reference gets from its RLE'd sort columns. RLE compression
of the sorted runs is parquet's job, not ours (SURVEY §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SIDE = "__merge_side"


def merge_archive_batch(base: DataFrame | None, patch: DataFrame,
                        sort_columns: tuple[str, ...] = (),
                        *, pos_col: str | None = None,
                        deleted_columns: tuple[str, ...] = ()) -> DataFrame:
    """Merge a sorted archive ``base`` with an archiving ``patch``.

    Returns the merged rows in the reference's exact output order: sort
    columns ascending NULLS FIRST, base before patch on ties, input
    order within each side. Order ties within a side are broken by
    ``pos_col`` (the batch-local row position) when the caller supplies
    one; without it the merge is still key-correct but tie order among
    identical full keys is unspecified — harmless for query semantics,
    needed only for byte-level batch parity.

    ``base=None`` mirrors the reference's nil-base merge (a brand-new
    batch: merged = sorted patch, merge_test.go:693-722).
    ``deleted_columns`` follows merge.go's short-circuit: non-sort
    deleted columns come back all-NULL; deleted sort columns keep their
    data.
    """
    if base is None:
        base = patch.limit(0)
    tagged = base.withColumn(_SIDE, F.lit(0)).unionByName(
        patch.withColumn(_SIDE, F.lit(1)))
    dtypes = dict(tagged.dtypes)
    for col in deleted_columns:
        if col not in sort_columns:
            tagged = tagged.withColumn(
                col, F.lit(None).cast(dtypes[col]))
    order = [F.col(c).asc_nulls_first() for c in sort_columns]
    order.append(F.col(_SIDE).asc())
    if pos_col is not None:
        order.append(F.col(pos_col).asc())
    return tagged.orderBy(*order).drop(_SIDE)
