"""AQL query model — dataclasses mirroring the reference's JSON query shape.

Reference: query/common/aql.go:95-151 (AQLQuery/Join/Dimension/Measure/
TimeFilter/SortField), numeric bucketizer at query/common/aql.go:26-45.

These are deliberately *declarative*: the planner turns them into a
DataFrame pipeline and Catalyst does the physical planning. Constraints the
reference enforces for GPU reasons (≤8 dims, one measure, ≤7 foreign tables
— query/time_series_aggregate.h:33-47) are validated only when
``strict=True``; the Spark engine itself generalizes past them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class TimeFilter:
    """Reference: query/common/aql.go TimeFilter; grammar in time_filter.go.

    ``column`` empty → the fact table's designated time column
    (query/aql_compiler.go:1013-1017).
    """

    from_: str | None = None
    to: str | None = None
    column: str = ""


@dataclass
class NumericBucketizer:
    """Equal-width / log-width / manual-partition numeric bucketizer.

    Reference: query/common/aql.go:26-45.
    """

    bucket_width: float | None = None
    log_base: float | None = None
    manual_partitions: list[float] | None = None


@dataclass
class Dimension:
    """Group-by dimension, optionally time- or numeric-bucketized.

    Reference: query/common/aql.go Dimension (sqlExpression + timeBucketizer
    + timeUnit + numericBucketizer).
    """

    expr: str
    time_bucketizer: str | None = None  # e.g. "hour", "day", "3 minutes", "day of week"
    time_unit: str | None = None        # output format unit (epoch seconds default)
    numeric_bucketizer: NumericBucketizer | None = None
    alias: str | None = None

    def output_name(self, i: int) -> str:
        return self.alias or f"d{i}"


@dataclass
class Measure:
    """Aggregate measure with optional per-measure row filters.

    Reference: query/common/aql.go:56-59 (Measure.Filters ANDed in,
    query/aql_compiler.go:807-818). The reference allows exactly one
    measure (query/aql_compiler.go:1139-1145); we keep that check behind
    ``Query.strict`` and otherwise allow many (Spark agg generalizes).
    """

    expr: str
    filters: list[str] = field(default_factory=list)
    alias: str | None = None

    def output_name(self, i: int) -> str:
        return self.alias or f"m{i}"


@dataclass
class Join:
    """Dimension-table equi join. Reference: query/common/aql.go Join;
    compile at query/aql_compiler.go:268-343 (matchEqualJoin) — LEFT join
    semantics, many-to-one, broadcastable dimension side."""

    table: str
    alias: str = ""
    conditions: list[str] = field(default_factory=list)  # e.g. "c.id = fact.city_id"
    how: str = "left"  # extension: "left" (reference parity) | "inner" |
                       # "left_semi" | "left_anti" (semi/anti expose no
                       # dim columns)

    @property
    def name(self) -> str:
        return self.alias or self.table


@dataclass
class SortField:
    """Reference parses sorts (query/common/aql.go:145) but never executes
    them; we implement them for real (SURVEY §2.7)."""

    expr: str
    order: str = "asc"  # asc | desc


@dataclass
class Query:
    """The AQL query. Reference: query/common/aql.go:95-151."""

    table: str
    joins: list[Join] = field(default_factory=list)
    dimensions: list[Dimension] = field(default_factory=list)
    measures: list[Measure] = field(default_factory=list)
    filters: list[str] = field(default_factory=list)  # rowFilters
    time_filter: TimeFilter | None = None
    timezone: str = "UTC"
    limit: int | None = None   # non-agg default 1000 (query/aql_compiler.go:38)
    distinct: bool = False     # reference parses DISTINCT but never executes
                               # it (expr/parser.go:436); we implement it
    sorts: list[SortField] = field(default_factory=list)
    now: int | None = None     # pin "now" for deterministic relative time filters
    strict: bool = False       # enforce the reference's GPU-era constraints
    group_type: str = "groupby"  # extension: "groupby" | "rollup" | "cube"
                                 # (reference has no grouping sets; Spark
                                 # and ANSI SQL give them for free)
    having: list[str] = field(default_factory=list)
                                 # extension: post-aggregation filters over
                                 # OUTPUT column names (dims + measure
                                 # aliases); reference has no HAVING
    supporting_measures: list[Measure] = field(default_factory=list)
                                 # computed during aggregation so derived
                                 # measures can reference them by alias,
                                 # but NOT emitted (reference
                                 # SupportingMeasures,
                                 # query/common/aql.go:148-151; filled by
                                 # the SQL composite-measure translation,
                                 # sql_parser.go SQL2AqlContext)

    def validate_strict(self) -> None:
        """Reference constraint checks (errors, mirroring compile errors)."""
        if not self.strict:
            return
        if len(self.measures) != 1:
            raise ValueError("exactly one measure required (query/aql_compiler.go:1139-1145)")
        if len(self.dimensions) > 8:
            raise ValueError("too many dimensions, max 8 (query/time_series_aggregate.h:36)")
        if len(self.joins) > 7:
            raise ValueError("too many foreign tables, max 7 (query/time_series_aggregate.h:34)")


def query_from_json(obj: dict[str, Any]) -> Query:
    """Parse the reference's AQL JSON shape (camelCase keys) into a Query.

    Accepts the field names used by examples/1k_trips/queries/*.aql.
    """
    def _dim(d: dict[str, Any]) -> Dimension:
        nb = d.get("numericBucketizer")
        return Dimension(
            expr=d["sqlExpression"],
            time_bucketizer=d.get("timeBucketizer"),
            time_unit=d.get("timeUnit"),
            numeric_bucketizer=NumericBucketizer(
                bucket_width=nb.get("bucketWidth"),
                log_base=nb.get("logBase"),
                manual_partitions=nb.get("manualPartitions"),
            ) if nb else None,
            alias=d.get("alias"),
        )

    def _measure(m: dict[str, Any]) -> Measure:
        return Measure(expr=m["sqlExpression"], filters=m.get("rowFilters", []),
                       alias=m.get("alias"))

    tf = obj.get("timeFilter")
    return Query(
        table=obj["table"],
        joins=[Join(j["table"], j.get("alias", ""), j.get("conditions", []),
                    how=j.get("how", "left"))
               for j in obj.get("joins", [])],
        dimensions=[_dim(d) for d in obj.get("dimensions", [])],
        measures=[_measure(m) for m in obj.get("measures", [])],
        filters=obj.get("rowFilters", []),
        time_filter=TimeFilter(tf.get("from"), tf.get("to"), tf.get("column", "")) if tf else None,
        timezone=obj.get("timezone", "UTC"),
        limit=obj.get("limit"),
        distinct=bool(obj.get("distinct", False)),
        sorts=[SortField(s["sqlExpression"], s.get("order", "asc"))
               for s in obj.get("sorts", [])],
        now=obj.get("now"),  # extension: pin "now" for deterministic replay
        group_type=obj.get("groupType", "groupby"),
        having=obj.get("having", []),
        supporting_measures=[_measure(m)
                             for m in obj.get("supportingMeasures", [])],
    )
