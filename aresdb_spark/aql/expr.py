"""AQL expression dialect: parser + Spark Column compiler.

Reference surface:
  - tokens/operators: query/expr/token.go:177-227 (= != <> < <= > >=,
    AND OR NOT, IN/NOT IN, IS NULL/IS NOT NULL/IS TRUE/IS FALSE,
    bitwise & | ^ ~ << >>, arithmetic + - * / %, unary - !)
  - parser: query/expr/parser.go (InfluxQL-derived recursive descent)
  - type rules & rewrites: query/context/query_context_helper.go
      * '/' is always float division (:241-267)
      * CASE WHEN type-unified conditional (:726-741)
      * closed function whitelist — unknown function errors (:723-725)
  - function registry: SURVEY §2.6 (convert_tz, dayofweek, hour,
    from_unixtime, hex, length, contains, element_at,
    geography_intersects, floor(x, N))

The compiler emits pyspark ``Column`` expressions only — everything stays
JVM-side in Catalyst codegen; no Python UDF appears in this module (the geo
predicate is provided by aresdb_spark.functions.geo and injected via the
function registry).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<float>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<int>0[xX][0-9a-fA-F]+|\d+)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
  | (?P<op><<|>>|<=|>=|!=|<>|=|<|>|\+|-|\*|/|%|&|\||\^|~|!|\(|\)|,)
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "and", "or", "not", "in", "is", "null", "true", "false",
    "case", "when", "then", "else", "end", "between", "like", "distinct",
}


@dataclass
class Token:
    kind: str  # 'int' | 'float' | 'str' | 'ident' | 'op' | 'kw' | 'eof'
    value: str
    pos: int


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise AQLSyntaxError(f"unexpected character {text[pos]!r} at {pos} in {text!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        value = m.group()
        if kind == "ident" and value.lower() in _KEYWORDS:
            tokens.append(Token("kw", value.lower(), m.start()))
        else:
            tokens.append(Token(kind, value, m.start()))
    tokens.append(Token("eof", "", len(text)))
    return tokens


class AQLSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Lit:
    value: Any  # int | float | str | bool | None


@dataclass
class Col:
    name: str  # possibly dotted: "c.city_name"


@dataclass
class Unary:
    op: str  # '-' '!' 'not' '~'
    operand: Any


@dataclass
class Binary:
    op: str
    left: Any
    right: Any


@dataclass
class InList:
    operand: Any
    items: list[Any]
    negated: bool = False


@dataclass
class IsNull:
    operand: Any
    negated: bool = False


@dataclass
class IsBool:
    operand: Any
    value: bool
    negated: bool = False


@dataclass
class Between:
    operand: Any
    low: Any
    high: Any
    negated: bool = False


@dataclass
class Call:
    func: str
    args: list[Any]


@dataclass
class Case:
    whens: list[tuple[Any, Any]]
    else_: Any | None


@dataclass
class Wrapped:
    """A pre-compiled Column embedded in an AST (planner internal)."""

    col: Any


# ---------------------------------------------------------------------------
# Parser (precedence climbing; reference parser is InfluxQL-derived)
# ---------------------------------------------------------------------------

# low → high binding power
_PRECEDENCE = [
    {"or"},
    {"and"},
    {"=", "!=", "<>", "<", "<=", ">", ">=", "like"},
    {"|"},
    {"^"},
    {"&"},
    {"<<", ">>"},
    {"+", "-"},
    {"*", "/", "%"},
]


class _Parser:
    def __init__(self, tokens: list[Token]):
        self.tokens = tokens
        self.i = 0

    def peek(self) -> Token:
        return self.tokens[self.i]

    def next(self) -> Token:
        t = self.tokens[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, value: str | None = None) -> Token:
        t = self.next()
        if t.kind != kind or (value is not None and t.value != value):
            raise AQLSyntaxError(f"expected {value or kind}, got {t.value!r} at {t.pos}")
        return t

    def parse(self) -> Any:
        node = self.parse_expr(0)
        if self.peek().kind != "eof":
            t = self.peek()
            raise AQLSyntaxError(f"trailing input {t.value!r} at {t.pos}")
        return node

    def parse_expr(self, level: int) -> Any:
        if level >= len(_PRECEDENCE):
            return self.parse_unary()
        left = self.parse_expr(level + 1)
        while True:
            t = self.peek()
            op = t.value if t.kind in ("op", "kw") else None
            # postfix-ish constructs bind at comparison level
            if level == 2 and t.kind == "kw" and t.value in ("in", "is", "not", "between"):
                left = self.parse_postfix_predicate(left)
                continue
            if op in _PRECEDENCE[level]:
                self.next()
                right = self.parse_expr(level + 1)
                left = Binary("!=" if op == "<>" else op, left, right)
                continue
            return left

    def parse_postfix_predicate(self, operand: Any) -> Any:
        t = self.next()
        negated = False
        if t.value == "not":
            negated = True
            t = self.next()
            if t.value not in ("in", "between", "like"):
                raise AQLSyntaxError(f"expected IN/BETWEEN/LIKE after NOT at {t.pos}")
        if t.value == "in":
            self.expect("op", "(")
            items = [self.parse_expr(0)]
            while self.peek().value == ",":
                self.next()
                items.append(self.parse_expr(0))
            self.expect("op", ")")
            return InList(operand, items, negated)
        if t.value == "between":
            low = self.parse_expr(3)
            self.expect("kw", "and")
            high = self.parse_expr(3)
            return Between(operand, low, high, negated)
        if t.value == "like":
            right = self.parse_expr(3)
            node = Binary("like", operand, right)
            return Unary("not", node) if negated else node
        if t.value == "is":
            neg = False
            if self.peek().kind == "kw" and self.peek().value == "not":
                self.next()
                neg = True
            t2 = self.next()
            if t2.value == "null":
                return IsNull(operand, neg)
            if t2.value in ("true", "false"):
                return IsBool(operand, t2.value == "true", neg)
            raise AQLSyntaxError(f"expected NULL/TRUE/FALSE after IS at {t2.pos}")
        raise AQLSyntaxError(f"unexpected {t.value!r} at {t.pos}")

    def parse_unary(self) -> Any:
        t = self.peek()
        if t.kind == "op" and t.value in ("-", "~", "!"):
            self.next()
            return Unary(t.value, self.parse_unary())
        if t.kind == "kw" and t.value == "not":
            self.next()
            return Unary("not", self.parse_unary())
        return self.parse_primary()

    def parse_primary(self) -> Any:
        t = self.next()
        if t.kind == "int":
            return Lit(int(t.value, 16) if t.value.lower().startswith("0x") else int(t.value))
        if t.kind == "float":
            return Lit(float(t.value))
        if t.kind == "str":
            raw = t.value[1:-1]
            return Lit(re.sub(r"\\(.)", r"\1", raw))
        if t.kind == "kw":
            if t.value == "null":
                return Lit(None)
            if t.value in ("true", "false"):
                return Lit(t.value == "true")
            if t.value == "case":
                return self.parse_case()
            raise AQLSyntaxError(f"unexpected keyword {t.value!r} at {t.pos}")
        if t.kind == "ident":
            if self.peek().value == "(":
                self.next()
                args: list[Any] = []
                if self.peek().value != ")":
                    args.append(self.parse_expr(0))
                    while self.peek().value == ",":
                        self.next()
                        args.append(self.parse_expr(0))
                self.expect("op", ")")
                return Call(t.value.lower(), args)
            return Col(t.value)
        if t.kind == "op":
            if t.value == "(":
                node = self.parse_expr(0)
                self.expect("op", ")")
                return node
            if t.value == "*":
                return Col("*")
        raise AQLSyntaxError(f"unexpected token {t.value!r} at {t.pos}")

    def parse_case(self) -> Case:
        whens: list[tuple[Any, Any]] = []
        else_: Any | None = None
        while True:
            t = self.next()
            if t.value == "when":
                cond = self.parse_expr(0)
                self.expect("kw", "then")
                whens.append((cond, self.parse_expr(0)))
            elif t.value == "else":
                else_ = self.parse_expr(0)
            elif t.value == "end":
                break
            else:
                raise AQLSyntaxError(f"unexpected {t.value!r} in CASE at {t.pos}")
        if not whens:
            raise AQLSyntaxError("CASE requires at least one WHEN")
        return Case(whens, else_)


def parse(text: str) -> Any:
    """Parse an AQL expression string into an AST."""
    return _Parser(tokenize(text)).parse()


# ---------------------------------------------------------------------------
# Compiler: AST → pyspark Column
# ---------------------------------------------------------------------------

Resolver = Callable[[str], Column]


def default_resolver(name: str) -> Column:
    return F.col(name)


# Closed function whitelist (reference errors on unknown functions,
# query/context/query_context_helper.go:723-725). Each entry maps to a
# builder over compiled arg Columns. All JVM-side builtins.
def _fn_convert_tz(args: list[Column]) -> Column:
    # MySQL convert_tz(ts, from, to): interpret ts as from_tz wall time,
    # re-express in to_tz wall time (reference constant-folds this to
    # ts + offset, query_context_helper.go:348-387; the tz-aware form is
    # DST-correct where the reference's constant offset is not)
    ts, from_tz, to_tz = args
    return F.from_utc_timestamp(F.to_utc_timestamp(ts, _lit_str(from_tz)), _lit_str(to_tz))


def _lit_str(c: Column) -> Column:
    return c  # tz args arrive as literal Columns already


_FUNCTIONS: dict[str, Callable[[list[Column]], Column]] = {
    # time (reference: query_context_helper.go:348-483)
    "convert_tz": _fn_convert_tz,
    "dayofweek": lambda a: F.dayofweek(a[0]),  # MySQL-compatible Sunday=1 in both
    "hour": lambda a: F.hour(a[0]),
    "minute": lambda a: F.minute(a[0]),
    "second": lambda a: F.second(a[0]),
    "from_unixtime": lambda a: F.from_unixtime(a[0]).cast("timestamp"),
    "to_unixtime": lambda a: F.unix_timestamp(a[0]),
    "now": lambda a: F.current_timestamp(),
    # misc scalar (reference: :526-539)
    "hex": lambda a: F.hex(a[0]),
    # array functions (reference: :603-721)
    "length": lambda a: F.size(a[0]),
    "array_length": lambda a: F.size(a[0]),
    "contains": lambda a: F.array_contains(a[0], a[1]),
    "array_contains": lambda a: F.array_contains(a[0], a[1]),
    # reference element_at is 0-BASED for non-negative indices
    # (ArrayElementAtFunctor, query/functor.hpp:540-569: index 0 = first,
    # negative = from end, out-of-range = null) — Spark's is 1-based, so
    # shift non-negative indices by one
    "element_at": lambda a: F.element_at(
        a[0], F.when(a[1] >= 0, a[1].cast("int") + 1)
               .otherwise(a[1].cast("int"))),
    "array_element_at": lambda a: F.element_at(
        a[0], F.when(a[1] >= 0, a[1].cast("int") + 1)
               .otherwise(a[1].cast("int"))),
    # numeric floor(x, N) → floor(x / N) * N (reference: SQL udfRegister.go:83-87)
    "floor": lambda a: F.floor(a[0] / a[1]) * a[1] if len(a) == 2 else F.floor(a[0]),
    "ceil": lambda a: F.ceil(a[0]),
    "abs": lambda a: F.abs(a[0]),
    "round": lambda a: F.round(a[0], 0) if len(a) == 1 else F.round(*a),
    # geo — injected by functions.geo at registry setup; placeholder errors
}


def register_function(name: str, builder: Callable[[list[Column]], Column]) -> None:
    """Extend the function whitelist (used by functions.geo / functions.hll)."""
    _FUNCTIONS[name.lower()] = builder


class UnknownFunctionError(ValueError):
    pass


def compile_ast(node: Any, resolver: Resolver = default_resolver) -> Column:
    """Compile a parsed AST node into a pyspark Column.

    Type rules kept from the reference (query_context_helper.go):
      * '/' always float division (:241-267) — both sides cast to double
      * string literals compare against enum/string columns; a value absent
        from the data simply compares false (Spark-native; matches the
        enum-miss → -1 → false semantics at :299-310)
      * IS TRUE / IS FALSE null-safe boolean tests
    """
    c = _compile(node, resolver)
    return c


def _compile(node: Any, r: Resolver) -> Column:
    if isinstance(node, Wrapped):
        return node.col
    if isinstance(node, Lit):
        return F.lit(node.value)
    if isinstance(node, Col):
        return r(node.name)
    if isinstance(node, Unary):
        x = _compile(node.operand, r)
        if node.op == "-":
            return -x
        if node.op in ("!", "not"):
            return ~x.cast("boolean")
        if node.op == "~":
            return F.bitwise_not(x)
        raise AQLSyntaxError(f"unknown unary op {node.op}")
    if isinstance(node, Binary):
        le, ri = _compile(node.left, r), _compile(node.right, r)
        op = node.op
        if op == "and":
            return le & ri
        if op == "or":
            return le | ri
        if op == "=":
            return le == ri
        if op == "!=":
            return le != ri
        if op == "<":
            return le < ri
        if op == "<=":
            return le <= ri
        if op == ">":
            return le > ri
        if op == ">=":
            return le >= ri
        if op == "+":
            return le + ri
        if op == "-":
            return le - ri
        if op == "*":
            return le * ri
        if op == "/":
            # reference: division is ALWAYS float (query_context_helper.go:241-267)
            return le.cast("double") / ri.cast("double")
        if op == "%":
            return le % ri
        if op == "&":
            return le.bitwiseAND(ri)
        if op == "|":
            return le.bitwiseOR(ri)
        if op == "^":
            return le.bitwiseXOR(ri)
        if op == "<<":
            if not isinstance(node.right, Lit):
                raise AQLSyntaxError("shift amount must be a literal")
            return F.shiftleft(le, node.right.value)
        if op == ">>":
            if not isinstance(node.right, Lit):
                raise AQLSyntaxError("shift amount must be a literal")
            return F.shiftright(le, node.right.value)
        if op == "like":
            if not isinstance(node.right, Lit):
                raise AQLSyntaxError("LIKE pattern must be a string literal")
            return le.like(node.right.value)
        raise AQLSyntaxError(f"unknown binary op {op}")
    if isinstance(node, InList):
        x = _compile(node.operand, r)
        vals = [_compile(i, r) for i in node.items]
        c = x.isin(*vals)
        return ~c if node.negated else c
    if isinstance(node, IsNull):
        x = _compile(node.operand, r)
        return x.isNotNull() if node.negated else x.isNull()
    if isinstance(node, IsBool):
        x = _compile(node.operand, r).cast("boolean")
        want = F.lit(node.value)
        c = x.eqNullSafe(want)
        return ~c if node.negated else c
    if isinstance(node, Between):
        x = _compile(node.operand, r)
        c = x.between(_compile(node.low, r), _compile(node.high, r))
        return ~c if node.negated else c
    if isinstance(node, Call):
        # reference rewrite: from_unixtime(X / 1000) IS the raw time
        # value X — millisecond-stored clients write this form and the
        # compiler unwraps it to the column itself
        # (query_context_helper.go:436-459). Other argument shapes fall
        # through to Spark's general from_unixtime (our engines's time
        # columns are real timestamps, so the generalization is safe).
        if node.func == "from_unixtime" and len(node.args) == 1 \
                and isinstance(node.args[0], Binary) \
                and node.args[0].op == "/" \
                and isinstance(node.args[0].right, Lit) \
                and node.args[0].right.value == 1000:
            return _compile(node.args[0].left, r)
        fn = _FUNCTIONS.get(node.func)
        if fn is None:
            raise UnknownFunctionError(
                f"unknown function {node.func!r} "
                "(closed whitelist, ref query_context_helper.go:723-725)")
        return fn([_compile(a, r) for a in node.args])
    if isinstance(node, Case):
        col: Column | None = None
        for cond, val in node.whens:
            cc, cv = _compile(cond, r), _compile(val, r)
            col = F.when(cc, cv) if col is None else col.when(cc, cv)
        assert col is not None
        return col.otherwise(_compile(node.else_, r)) if node.else_ is not None else col
    raise AQLSyntaxError(f"cannot compile node {node!r}")


def compile_expr(text: str, resolver: Resolver = default_resolver) -> Column:
    """Parse + compile an AQL expression string to a pyspark Column."""
    return compile_ast(parse(text), resolver)


def column_refs(node: Any) -> set[str]:
    """Collect referenced column names (for usage analysis / pruning audits)."""
    out: set[str] = set()

    def walk(n: Any) -> None:
        if isinstance(n, Col):
            out.add(n.name)
        elif isinstance(n, Unary):
            walk(n.operand)
        elif isinstance(n, Binary):
            walk(n.left); walk(n.right)
        elif isinstance(n, InList):
            walk(n.operand); [walk(i) for i in n.items]
        elif isinstance(n, (IsNull, IsBool)):
            walk(n.operand)
        elif isinstance(n, Between):
            walk(n.operand); walk(n.low); walk(n.high)
        elif isinstance(n, Call):
            [walk(a) for a in n.args]
        elif isinstance(n, Case):
            for c, v in n.whens:
                walk(c); walk(v)
            if n.else_ is not None:
                walk(n.else_)

    walk(node)
    return out
