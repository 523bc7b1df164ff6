"""SQL dialect front end → AQL Query.

Reference: query/sql/sql_parser.go (ANTLR grammar + ASTBuilder visitor
translating SQL to an AQLQuery) with the fixed `aql_*` macro functions
(query/sql/util/udfRegister.go:52-97):

  aql_time_filter(col, "from", "to", timezone)   → Query.time_filter (+tz)
  aql_now(col, epoch)                            → Query.now
  aql_time_bucket_<unit>(col, timeunit, tz)      → time-bucketized dim
  aql_numeric_bucket_bucket_width(col, w)        → numeric bucketizer
  aql_numeric_bucket_logbase(col, b)             → numeric bucketizer

Dialect rules kept from the reference (sql_parser.go:2015-2037):
  - aggregates without GROUP BY → error
  - SELECT without GROUP BY → non-aggregate projection (measure literal 1)
  - subqueries unsupported

This is a recursive-scan translator over the reference's restricted
dialect (single fact table, LEFT JOINs, flat WHERE conjunction) — the
expression *contents* reuse the AQL expression parser, so the scalar
whitelist and type rules are identical to the JSON path. For SQL outside
the dialect, users go through spark.sql directly (full Spark SQL) — this
front end exists for request-level compatibility with reference clients.
"""

from __future__ import annotations

import re

from aresdb_spark.aql import expr as E
from aresdb_spark.aql.model import (Dimension, Join, Measure,
                                    NumericBucketizer, Query, SortField)

_AGG_FUNCS = {"count", "sum", "avg", "min", "max", "hll", "countdistincthll",
              "count_distinct", "stddev", "median", "percentile"}

_KEYWORDS = ["select", "from", "join", "where", "group by", "having",
             "order by", "limit"]


class SQLSyntaxError(ValueError):
    pass


def _scan_top_level(sql: str):
    """Yield (pos, char) for characters at paren depth 0 outside quotes."""
    depth = 0
    quote = None
    for i, ch in enumerate(sql):
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            yield i, ch


def _find_clauses(sql: str) -> dict[str, str]:
    low = sql.lower()
    top = {i for i, _ in _scan_top_level(sql)}
    marks: list[tuple[int, int, str]] = []
    for kw in _KEYWORDS:
        # Multi-word keywords ("group by") match across any whitespace,
        # including newlines and runs of spaces.
        pat = r"\s+".join(re.escape(p) for p in kw.split())
        # word boundaries include digits: a column `limit2` must not match
        # the LIMIT keyword
        for m in re.finditer(rf"(?<![a-z0-9_]){pat}(?![a-z0-9_])", low):
            if m.start() in top:
                marks.append((m.start(), m.end(), kw))
    marks.sort()
    out: dict[str, str] = {}
    for n, (pos, kw_end, kw) in enumerate(marks):
        end = marks[n + 1][0] if n + 1 < len(marks) else len(sql)
        body = sql[kw_end:end].strip()
        if kw == "join":
            out.setdefault("joins", []).append(body)  # type: ignore[union-attr]
        else:
            out[kw] = body
    return out


def _split_top(s: str, sep: str) -> list[str]:
    """Split on a separator (',' or the keyword 'and') at top level."""
    top = {i for i, _ in _scan_top_level(s)}
    parts, start = [], 0
    if sep == ",":
        for i, ch in enumerate(s):
            if ch == "," and i in top:
                parts.append(s[start:i])
                start = i + 1
    else:
        # an AND that pairs with a preceding BETWEEN is part of that
        # predicate, not a conjunction boundary (x BETWEEN a AND b)
        pending_between = 0
        for m in re.finditer(r"(?<![a-z0-9_])(and|between)(?![a-z0-9_])",
                             s.lower()):
            if m.start() not in top:
                continue
            if m.group(1) == "between":
                pending_between += 1
            elif pending_between:
                pending_between -= 1
            else:
                parts.append(s[start:m.start()])
                start = m.end()
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _strip_quotes(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in ("'", '"'):
        return s[1:-1]
    return s


def _call_args(body: str) -> list[str]:
    return [a.strip() for a in _split_top(body, ",")]


_AQL_CALL = re.compile(r"^(aql_[a-z_]+)\s*\((.*)\)\s*$", re.IGNORECASE | re.DOTALL)

_BUCKET_NAME = {
    # aql_time_bucket_<suffix> → bucketizer string (udfRegister.go:62-79)
    "minute": "minute", "minutes": "minutes", "hour": "hour", "hours": "hours",
    "day": "day", "week": "week", "month": "month", "quarter": "quarter",
    "year": "year", "time_of_day": "time of day",
    "minutes_of_day": "minutes of day", "hour_of_day": "hour of day",
    "hour_of_week": "hour of week", "day_of_week": "day of week",
    "day_of_month": "day of month", "day_of_year": "day of year",
    "month_of_year": "month of year", "quarter_of_year": "quarter of year",
}


def _is_aggregate_expr(text: str) -> bool:
    try:
        ast = E.parse(text)
    except Exception as e:
        raise SQLSyntaxError(f"cannot parse expression {text!r}: {e}") from e

    def walk(n) -> bool:
        if isinstance(n, E.Call):
            if n.func in _AGG_FUNCS:
                return True
            return any(walk(a) for a in n.args)
        for attr in ("operand", "left", "right", "else_", "low", "high"):
            c = getattr(n, attr, None)
            if c is not None and walk(c):
                return True
        for attr in ("items", "args"):
            for c in getattr(n, attr, []) or []:
                if walk(c):
                    return True
        for cond, v in getattr(n, "whens", []) or []:
            if walk(cond) or walk(v):
                return True
        return False

    return walk(ast)


def _parse_select_item(item: str) -> tuple[str, str | None]:
    m = re.search(r"\s+as\s+([A-Za-z_][A-Za-z0-9_]*)\s*$", item, re.IGNORECASE)
    if m:
        return item[:m.start()].strip(), m.group(1)
    return item.strip(), None


def _parse_group_item(item: str) -> tuple[Dimension, str | None]:
    """Returns (dimension, timezone-or-None)."""
    m = _AQL_CALL.match(item)
    if not m:
        return Dimension(expr=item), None
    name, args = m.group(1).lower(), _call_args(m.group(2))
    if name.startswith("aql_time_bucket_"):
        suffix = name[len("aql_time_bucket_"):]
        bucket = _BUCKET_NAME.get(suffix)
        if bucket is None:
            raise SQLSyntaxError(f"unknown time bucket macro {name!r}")
        col = args[0]
        unit = _strip_quotes(args[1]) if len(args) > 1 else None
        tz = _strip_quotes(args[2]) if len(args) > 2 else None
        return Dimension(expr=col, time_bucketizer=bucket,
                         time_unit=unit or None), tz
    if name == "aql_numeric_bucket_bucket_width":
        return Dimension(expr=args[0],
                         numeric_bucketizer=NumericBucketizer(
                             bucket_width=float(_strip_quotes(args[1])))), None
    if name == "aql_numeric_bucket_logbase":
        return Dimension(expr=args[0],
                         numeric_bucketizer=NumericBucketizer(
                             log_base=float(_strip_quotes(args[1])))), None
    raise SQLSyntaxError(f"unknown aql_ macro {name!r} in GROUP BY")


def sql_to_query(sql: str) -> Query:
    """Translate one dialect-SQL string into an AQL Query."""
    sql = sql.strip().rstrip(";")
    clauses = _find_clauses(sql)
    if "select" not in clauses or "from" not in clauses:
        raise SQLSyntaxError("expected SELECT ... FROM ...")
    if re.search(r"\(\s*select(?![a-z_])", sql, re.IGNORECASE):
        raise SQLSyntaxError("sub query not supported yet")  # sql_parser.go:2018

    # FROM table [alias]
    from_parts = clauses["from"].split()
    table = from_parts[0]

    q = Query(table=table)

    # JOINs: bodies split at each top-level JOIN keyword, so a join's type
    # tokens ("LEFT" / "LEFT SEMI" / "LEFT ANTI" / "INNER") dangle at the
    # END of the preceding segment (the FROM body for the first join, the
    # previous join's condition otherwise). Pop them off to get `how`.
    _TYPE_TAIL = re.compile(
        r"\s+(?:(left)(?:\s+(semi|anti))?|(inner))\s*$", re.IGNORECASE)

    def _pop_join_type(text: str) -> tuple[str, str]:
        m = _TYPE_TAIL.search(text)
        if not m:
            return text, "left"  # bare JOIN keeps reference LEFT semantics
        if m.group(3):
            how = "inner"
        else:
            how = {"semi": "left_semi", "anti": "left_anti",
                   None: "left"}[m.group(2).lower() if m.group(2) else None]
        return text[:m.start()], how

    join_bodies = list(clauses.get("joins", []))  # type: ignore[arg-type]
    clauses["from"], next_how = _pop_join_type(clauses["from"])
    for n, jbody in enumerate(join_bodies):
        m = re.match(r"^(\S+)(?:\s+(?:as\s+)?([A-Za-z_][A-Za-z0-9_]*))?\s+on\s+(.*)$",
                     jbody.strip(), re.IGNORECASE | re.DOTALL)
        if not m:
            raise SQLSyntaxError(f"cannot parse join {jbody!r}")
        jt, jalias, jcond = m.group(1), m.group(2) or "", m.group(3)
        how = next_how
        if n + 1 < len(join_bodies):
            jcond, next_how = _pop_join_type(jcond)
        q.joins.append(Join(table=jt, alias=jalias,
                            conditions=_split_top(jcond, "and"), how=how))
    # defensive: a dangling LEFT in later clause bodies
    if "where" in clauses:
        clauses["where"] = re.sub(r"\s+left\s*$", "", clauses["where"],
                                  flags=re.IGNORECASE)

    # WHERE: aql_time_filter / aql_now macros + plain row filters
    for term in _split_top(clauses.get("where", ""), "and") if clauses.get("where") else []:
        m = _AQL_CALL.match(term)
        if m and m.group(1).lower() == "aql_time_filter":
            args = _call_args(m.group(2))
            if len(args) not in (3, 4):
                raise SQLSyntaxError("aql_time_filter(column, from, to[, timezone])")
            from aresdb_spark.aql.model import TimeFilter
            q.time_filter = TimeFilter(from_=_strip_quotes(args[1]),
                                       to=_strip_quotes(args[2]),
                                       column=args[0])
            if len(args) == 4:
                q.timezone = _strip_quotes(args[3])
        elif m and m.group(1).lower() == "aql_now":
            args = _call_args(m.group(2))
            q.now = int(_strip_quotes(args[-1]))
        elif m and m.group(1).lower().startswith("aql_"):
            raise SQLSyntaxError(f"unknown aql_ macro in WHERE: {m.group(1)}")
        else:
            q.filters.append(term)

    # GROUP BY → dimensions (a bucketizer's timezone arg promotes to the
    # query timezone, matching the reference's per-dim tz = query tz)
    gb = clauses.get("group by")
    if gb:
        # GROUP BY ROLLUP (a, b) / CUBE (a, b) → Query.group_type
        m = re.match(r"^(rollup|cube)\s*\((.*)\)\s*$", gb.strip(),
                     re.IGNORECASE | re.DOTALL)
        if m:
            q.group_type = m.group(1).lower()
            gb = m.group(2)
    group_items = _split_top(gb, ",") if gb else []
    # GROUP BY ordinals (Presto-style, as in the reference's grammar):
    # resolve N to the N-th SELECT item's expression
    if group_items:
        sel_items = _split_top(
            re.sub(r"^\s*distinct(?![a-z_])", "", clauses["select"],
                   flags=re.IGNORECASE), ",")
        resolved = []
        for g in group_items:
            if re.fullmatch(r"[0-9]+", g.strip()):
                idx = int(g.strip())
                if not 1 <= idx <= len(sel_items):
                    raise SQLSyntaxError(
                        f"GROUP BY ordinal {idx} out of range")
                expr_text, _ = _parse_select_item(sel_items[idx - 1])
                resolved.append(expr_text)
            else:
                resolved.append(g)
        group_items = resolved
    dims = []
    dim_raw: list[str] = []  # original GROUP BY text, for SELECT matching
    for g in group_items:
        d, tz = _parse_group_item(g)
        dims.append(d)
        dim_raw.append(g)
        if tz and q.timezone.upper() == "UTC":
            q.timezone = tz

    # SELECT [DISTINCT] list → measures (aggregates) + dim aliases
    select_body = clauses["select"]
    m = re.match(r"^\s*distinct(?![a-z_])", select_body, re.IGNORECASE)
    if m:
        q.distinct = True
        select_body = select_body[m.end():]
    measures: list[Measure] = []
    plain_selects: list[tuple[str, str | None]] = []
    for item in _split_top(select_body, ","):
        expr_text, alias = _parse_select_item(item)
        if _is_aggregate_expr(expr_text):
            measures.append(Measure(expr=expr_text, alias=alias))
        else:
            plain_selects.append((expr_text, alias))

    if not group_items:
        if measures:
            # reference rule (sql_parser.go:2024-2027)
            raise SQLSyntaxError(
                "no aggregate functions allowed when no group by specified")
        q.dimensions = [Dimension(expr=e, alias=a or e) for e, a in plain_selects]
        q.measures = [Measure(expr="1")]
    else:
        # attach aliases: match plain SELECT items to group-by dimensions
        # textually (normalized, including bucketizer-macro calls repeated
        # verbatim in SELECT); unmatched select items become extra dims
        def norm(s: str) -> str:
            return re.sub(r"\s+", "", s.lower())

        for e, a in plain_selects:
            ne = norm(e)
            for d, raw in zip(dims, dim_raw):
                if (norm(raw) == ne or norm(d.expr) == ne) and d.alias is None:
                    d.alias = a or (e if not _AQL_CALL.match(e) else None)
                    break
            else:
                extra, tz = _parse_group_item(e)
                extra.alias = a
                dims.append(extra)
                dim_raw.append(e)
        q.dimensions = dims
        if not measures:
            raise SQLSyntaxError("GROUP BY query requires an aggregate in SELECT")
        q.measures = measures

    # HAVING → post-aggregation filters over output names
    if clauses.get("having"):
        if not group_items:
            raise SQLSyntaxError("HAVING requires GROUP BY")
        q.having = _split_top(clauses["having"], "and")

    # ORDER BY / LIMIT
    if clauses.get("order by"):
        for item in _split_top(clauses["order by"], ","):
            m = re.match(r"^(.*?)(?:\s+(asc|desc))?$", item.strip(),
                         re.IGNORECASE | re.DOTALL)
            q.sorts.append(SortField(m.group(1).strip(),
                                     (m.group(2) or "asc").lower()))
    if clauses.get("limit"):
        q.limit = int(clauses["limit"].strip())
    return q


def execute_sql(spark, catalog, sql: str):
    """The `POST /query/sql` analog: translate + run through the AQL
    planner (api/sql_query_handler.go:25)."""
    from aresdb_spark.aql.api import execute_query

    return execute_query(spark, catalog, sql_to_query(sql))
