"""Declarative SQL front-end: parse a practical ANSI-SQL subset and compile
it onto the engine's Ray Data operators.

The reference's user surface is SQL strings handed to Postgres
(/root/reference/queries/fact_studies.py:3-35, queries/dim_organizations.py);
this engine's native surface is Python composition. This module closes that
gap: ``sql("SELECT ...", sf_dir)`` returns a lazy ``ray.data.Dataset`` whose
plan uses the same scale-safe building blocks as the hand-written pipelines —
pruned parquet scans with row-group predicate pushdown, the broadcast-or-
shuffle ``auto_join`` planner, mergeable per-batch partial aggregation, and
vectorized ``pyarrow.compute`` expression evaluation (never a Python row
loop).

Supported grammar (documented subset — anything else raises ``SqlError``
with the offending token, never silently misparses):

    query     := core (UNION ALL core)* [ORDER BY item [ASC|DESC], ...]
                 [LIMIT n]
    core      := SELECT [DISTINCT] items FROM source join* [WHERE expr]
                 [GROUP BY exprs] [HAVING expr]
    source    := table [AS? alias] | '(' query ')' AS? alias
    join      := [INNER | LEFT [OUTER]] JOIN source ON col = col
    items     := '*' | expr [AS? alias] (',' ...)

Expressions: arithmetic (``+ - * / %``, SQL ``/`` on integers promotes to
double like DuckDB), string concat ``||``, comparisons, ``AND/OR/NOT`` with
Kleene null semantics, ``IN (literals)``, ``BETWEEN``, ``LIKE``,
``IS [NOT] NULL``, ``CASE WHEN``, ``CAST(x AS type)``, ``DATE '...'`` /
``TIMESTAMP '...'`` literals, scalar functions (lower, upper, length, abs,
round, floor, ceil, coalesce, nullif, substr, year, month, day), and
aggregates ``count(*) | count(x) | count(DISTINCT x) | sum | avg | min |
max``.

Scale shape (how each clause compiles):

- **FROM**: :func:`sources.parquet.read_table` with ``columns=`` pruned to
  the set of columns the query references, and every single-table WHERE
  conjunct that is expressible as a ``pyarrow.dataset`` expression pushed
  into the scan's row-group filter. Non-pushable single-table conjuncts
  become a vectorized batch filter immediately after the scan — *before*
  any join moves the rows.
- **JOIN**: :func:`functions.relational.auto_join` — measured small sides
  broadcast once via ``ray.put``; large sides take the partitioned hash
  join. Single-key equi-joins (the engine's skew/bucket levers stay
  available through the native API for anything fancier).
- **GROUP BY**: per-batch Arrow ``group_by`` partials (count/sum/min/max
  and sum+count for avg are all mergeable), then either a single
  tree-reduce combine (``cardinality="low"``, reporting-grade key spaces —
  the default) or a Ray ``groupby`` shuffle (``cardinality="high"``).
  ``count(DISTINCT x)`` is a two-stage distinct (per-batch + final) then a
  grouped count, joined back on the group keys.
- **ORDER BY/LIMIT**: ``Dataset.sort`` (+ ``limit`` for top-k).

Null semantics follow SQL: WHERE/HAVING drop null predicates, ``AND/OR``
are Kleene, comparisons with NULL yield NULL, ``count(x)`` skips nulls.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from vlm_eden_dataset_etl_ray.functions.relational import auto_join
from vlm_eden_dataset_etl_ray.sources.parquet import read_table


class SqlError(ValueError):
    """Raised for any unsupported or malformed SQL — loud, never a guess."""


# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+\.\d*|\.\d+|\d+)
      | (?P<str>'(?:[^']|'')*')
      | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
      | (?P<op><>|!=|<=|>=|\|\||[(),.*+\-/%=<>])
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "select", "distinct", "from", "where", "group", "by", "having", "order",
    "limit", "as", "and", "or", "not", "in", "between", "like", "is", "null",
    "case", "when", "then", "else", "end", "cast", "join", "inner", "left",
    "outer", "on", "union", "all", "asc", "desc", "true", "false", "date",
    "timestamp", "over", "partition", "qualify",
}


@dataclass
class _Tok:
    kind: str  # 'num' | 'str' | 'ident' | 'kw' | 'op' | 'eof'
    val: str
    pos: int


def _lex(text: str) -> list[_Tok]:
    toks, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            rest = text[i:].lstrip()
            if not rest:
                break
            raise SqlError(f"cannot tokenize SQL at: {rest[:30]!r}")
        i = m.end()
        if m.lastgroup == "ident":
            low = m.group("ident").lower()
            kind = "kw" if low in _KEYWORDS else "ident"
            toks.append(_Tok(kind, low if kind == "kw" else m.group("ident"), m.start()))
        elif m.lastgroup is not None:
            toks.append(_Tok(m.lastgroup, m.group(m.lastgroup), m.start()))
    toks.append(_Tok("eof", "", len(text)))
    return toks


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Col:
    name: str
    table: str | None = None


@dataclass(frozen=True)
class Lit:
    value: object
    type: str = "auto"  # 'auto' | 'date' | 'timestamp'


@dataclass(frozen=True)
class Bin:
    op: str
    left: object
    right: object


@dataclass(frozen=True)
class Not:
    arg: object


@dataclass(frozen=True)
class Func:
    name: str
    args: tuple
    distinct: bool = False
    star: bool = False  # count(*)


@dataclass(frozen=True)
class Case:
    whens: tuple  # ((cond, result), ...)
    default: object | None


@dataclass(frozen=True)
class Cast:
    arg: object
    to: str


@dataclass(frozen=True)
class InList:
    arg: object
    values: tuple
    negated: bool


@dataclass(frozen=True)
class InSubquery:
    arg: object
    query: "Query"
    negated: bool


@dataclass(frozen=True)
class ScalarSub:
    query: "Query"


@dataclass(frozen=True)
class WindowFunc:
    name: str
    args: tuple
    partition_by: tuple  # (Col, ...)
    order_by: tuple      # ((expr, asc), ...)


@dataclass(frozen=True)
class IsNull:
    arg: object
    negated: bool


@dataclass(frozen=True)
class LikeOp:
    arg: object
    pattern: str
    negated: bool


@dataclass
class Source:
    table: str | None  # base-table name, or None for a derived table
    alias: str
    sub: "Query | None" = None


@dataclass
class Join:
    how: str  # 'inner' | 'left'
    source: Source
    left_col: Col
    right_col: Col


@dataclass
class Core:
    items: list  # [(expr | '*', alias | None), ...]
    distinct: bool
    source: Source
    joins: list
    where: object | None
    group_by: list
    having: object | None
    qualify: object | None = None


@dataclass
class Query:
    cores: list  # UNION ALL chain
    order_by: list = field(default_factory=list)  # [(expr, asc: bool)]
    limit: int | None = None


_AGG_FUNCS = {"count", "sum", "avg", "min", "max"}
_SCALAR_FUNCS = {
    "lower", "upper", "length", "abs", "round", "floor", "ceil",
    "coalesce", "nullif", "substr", "substring", "year", "month", "day",
}
_WINDOW_FUNCS = {"row_number", "rank", "dense_rank", "ntile", "cume_dist",
                 "percent_rank", "sum", "min", "max", "count", "avg",
                 "lag", "lead", "first_value"}


class _Parser:
    def __init__(self, text: str):
        self.toks = _lex(text)
        self.i = 0

    # -- token helpers ------------------------------------------------------
    def peek(self, k: int = 0) -> _Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, val: str | None = None) -> _Tok | None:
        t = self.peek()
        if t.kind == kind and (val is None or t.val == val):
            return self.next()
        return None

    def expect(self, kind: str, val: str | None = None) -> _Tok:
        t = self.accept(kind, val)
        if t is None:
            got = self.peek()
            raise SqlError(f"expected {val or kind}, got {got.val!r} at char {got.pos}")
        return t

    # -- grammar ------------------------------------------------------------
    def parse(self) -> Query:
        q = self.query()
        self.expect("eof")
        return q

    def query(self) -> Query:
        cores = [self.core()]
        while self.peek().val == "union":
            self.next()
            self.expect("kw", "all")
            cores.append(self.core())
        order_by: list = []
        if self.accept("kw", "order"):
            self.expect("kw", "by")
            while True:
                e = self.expr()
                asc = True
                if self.accept("kw", "desc"):
                    asc = False
                else:
                    self.accept("kw", "asc")
                order_by.append((e, asc))
                if not self.accept("op", ","):
                    break
        limit = None
        if self.accept("kw", "limit"):
            limit = int(self.expect("num").val)
        return Query(cores, order_by, limit)

    def core(self) -> Core:
        self.expect("kw", "select")
        distinct = bool(self.accept("kw", "distinct"))
        items = []
        while True:
            if self.accept("op", "*"):
                items.append(("*", None))
            else:
                e = self.expr()
                alias = None
                if self.accept("kw", "as"):
                    alias = self.expect("ident").val
                elif self.peek().kind == "ident":
                    alias = self.next().val
                items.append((e, alias))
            if not self.accept("op", ","):
                break
        self.expect("kw", "from")
        source = self.source()
        joins = []
        while self.peek().val in ("join", "inner", "left"):
            how = "inner"
            if self.accept("kw", "left"):
                self.accept("kw", "outer")
                how = "left"
            else:
                self.accept("kw", "inner")
            self.expect("kw", "join")
            src = self.source()
            self.expect("kw", "on")
            cond = self.expr()
            if not (isinstance(cond, Bin) and cond.op == "="
                    and isinstance(cond.left, Col)
                    and isinstance(cond.right, Col)):
                raise SqlError("JOIN ON must be a single column equality")
            joins.append(Join(how, src, cond.left, cond.right))
        where = self.expr() if self.accept("kw", "where") else None
        group_by: list = []
        if self.accept("kw", "group"):
            self.expect("kw", "by")
            while True:
                group_by.append(self.expr())
                if not self.accept("op", ","):
                    break
        having = self.expr() if self.accept("kw", "having") else None
        qualify = self.expr() if self.accept("kw", "qualify") else None
        return Core(items, distinct, source, joins, where, group_by, having,
                    qualify)

    def source(self) -> Source:
        if self.accept("op", "("):
            sub = self.query()
            self.expect("op", ")")
            self.accept("kw", "as")
            alias = self.expect("ident").val
            return Source(None, alias, sub)
        name = self.expect("ident").val
        alias = name
        if self.accept("kw", "as"):
            alias = self.expect("ident").val
        elif self.peek().kind == "ident":
            alias = self.next().val
        return Source(name, alias)

    # expression precedence: OR < AND < NOT < predicate < add < mul < unary
    def expr(self):
        left = self.and_expr()
        while self.accept("kw", "or"):
            left = Bin("or", left, self.and_expr())
        return left

    def and_expr(self):
        left = self.not_expr()
        while self.accept("kw", "and"):
            left = Bin("and", left, self.not_expr())
        return left

    def not_expr(self):
        if self.accept("kw", "not"):
            return Not(self.not_expr())
        return self.predicate()

    def predicate(self):
        left = self.additive()
        t = self.peek()
        if t.kind == "op" and t.val in ("=", "!=", "<>", "<", "<=", ">", ">="):
            self.next()
            op = "!=" if t.val == "<>" else t.val
            return Bin(op, left, self.additive())
        negated = False
        if t.val == "not" and self.peek(1).val in ("in", "between", "like"):
            self.next()
            negated = True
            t = self.peek()
        if t.val == "in":
            self.next()
            self.expect("op", "(")
            if self.peek().val == "select":
                q = self.query()
                self.expect("op", ")")
                return InSubquery(left, q, negated)
            vals = []
            while True:
                v = self.primary()
                if not isinstance(v, Lit):
                    raise SqlError("IN list must contain literals")
                vals.append(v)
                if not self.accept("op", ","):
                    break
            self.expect("op", ")")
            return InList(left, tuple(vals), negated)
        if t.val == "between":
            self.next()
            lo = self.additive()
            self.expect("kw", "and")
            hi = self.additive()
            node = Bin("and", Bin(">=", left, lo), Bin("<=", left, hi))
            return Not(node) if negated else node
        if t.val == "like":
            self.next()
            pat = self.primary()
            if not isinstance(pat, Lit) or not isinstance(pat.value, str):
                raise SqlError("LIKE pattern must be a string literal")
            return LikeOp(left, pat.value, negated)
        if t.val == "is":
            self.next()
            neg = bool(self.accept("kw", "not"))
            self.expect("kw", "null")
            return IsNull(left, neg)
        return left

    def additive(self):
        left = self.mult()
        while True:
            t = self.peek()
            if t.kind == "op" and t.val in ("+", "-", "||"):
                self.next()
                left = Bin(t.val, left, self.mult())
            else:
                return left

    def mult(self):
        left = self.unary()
        while True:
            t = self.peek()
            if t.kind == "op" and t.val in ("*", "/", "%"):
                self.next()
                left = Bin(t.val, left, self.unary())
            else:
                return left

    def unary(self):
        if self.accept("op", "-"):
            arg = self.unary()
            if isinstance(arg, Lit) and isinstance(arg.value, (int, float)):
                return Lit(-arg.value)
            return Bin("-", Lit(0), arg)
        return self.primary()

    def primary(self):
        t = self.peek()
        if t.kind == "num":
            self.next()
            return Lit(float(t.val) if "." in t.val else int(t.val))
        if t.kind == "str":
            self.next()
            return Lit(t.val[1:-1].replace("''", "'"))
        if t.val == "null":
            self.next()
            return Lit(None)
        if t.val in ("true", "false"):
            self.next()
            return Lit(t.val == "true")
        if t.val in ("date", "timestamp") and self.peek(1).kind == "str":
            self.next()
            s = self.next().val
            return Lit(s[1:-1], type=t.val)
        if t.val == "case":
            self.next()
            whens = []
            while self.accept("kw", "when"):
                cond = self.expr()
                self.expect("kw", "then")
                whens.append((cond, self.expr()))
            default = self.expr() if self.accept("kw", "else") else None
            self.expect("kw", "end")
            if not whens:
                raise SqlError("CASE requires at least one WHEN")
            return Case(tuple(whens), default)
        if t.val == "cast":
            self.next()
            self.expect("op", "(")
            arg = self.expr()
            self.expect("kw", "as")
            ty = self.next().val.lower()
            self.expect("op", ")")
            return Cast(arg, ty)
        if t.kind == "ident":
            name = self.next().val
            if self.accept("op", "("):
                fname = name.lower()
                distinct = bool(self.accept("kw", "distinct"))
                star = False
                args: list = []
                if self.accept("op", "*"):
                    star = True
                elif self.peek().val != ")":
                    while True:
                        args.append(self.expr())
                        if not self.accept("op", ","):
                            break
                self.expect("op", ")")
                if self.peek().val == "over":
                    return self.window(fname, args)
                if fname not in _AGG_FUNCS and fname not in _SCALAR_FUNCS:
                    raise SqlError(f"unsupported function: {fname}")
                if star and fname != "count":
                    raise SqlError("'*' argument only valid in count(*)")
                return Func(fname, tuple(args), distinct, star)
            if self.accept("op", "."):
                col = self.expect("ident").val
                return Col(col, name)
            return Col(name)
        if self.accept("op", "("):
            if self.peek().val == "select":
                q = self.query()
                self.expect("op", ")")
                return ScalarSub(q)
            e = self.expr()
            self.expect("op", ")")
            return e
        raise SqlError(f"unexpected token {t.val!r} at char {t.pos}")

    def window(self, fname: str, args: list) -> WindowFunc:
        if fname not in _WINDOW_FUNCS:
            raise SqlError(f"unsupported window function: {fname}")
        self.expect("kw", "over")
        self.expect("op", "(")
        pb: list = []
        ob: list = []
        if self.accept("kw", "partition"):
            self.expect("kw", "by")
            while True:
                pb.append(self.expr())
                if not self.accept("op", ","):
                    break
        if self.accept("kw", "order"):
            self.expect("kw", "by")
            while True:
                e = self.expr()
                asc = True
                if self.accept("kw", "desc"):
                    asc = False
                else:
                    self.accept("kw", "asc")
                ob.append((e, asc))
                if not self.accept("op", ","):
                    break
        self.expect("op", ")")
        return WindowFunc(fname, tuple(args), tuple(pb), tuple(ob))


# ---------------------------------------------------------------------------
# AST utilities
# ---------------------------------------------------------------------------

def _walk(node):
    yield node
    if isinstance(node, Bin):
        yield from _walk(node.left)
        yield from _walk(node.right)
    elif isinstance(node, Not):
        yield from _walk(node.arg)
    elif isinstance(node, Func):
        for a in node.args:
            yield from _walk(a)
    elif isinstance(node, Case):
        for c, r in node.whens:
            yield from _walk(c)
            yield from _walk(r)
        if node.default is not None:
            yield from _walk(node.default)
    elif isinstance(node, Cast):
        yield from _walk(node.arg)
    elif isinstance(node, (InList, IsNull, LikeOp, InSubquery)):
        # InSubquery: only the probe arg lives in the OUTER scope; the
        # subquery has its own scope and compiles recursively.
        yield from _walk(node.arg)
    elif isinstance(node, WindowFunc):
        for a in node.args:
            yield from _walk(a)
        for p in node.partition_by:
            yield from _walk(p)
        for e, _ in node.order_by:
            yield from _walk(e)


def _cols(node) -> set[Col]:
    return {n for n in _walk(node) if isinstance(n, Col)}


def _aggs(node) -> list[Func]:
    return [n for n in _walk(node) if isinstance(n, Func) and n.name in _AGG_FUNCS]


def _conjuncts(node) -> list:
    if isinstance(node, Bin) and node.op == "and":
        return _conjuncts(node.left) + _conjuncts(node.right)
    return [node]


def _render(node) -> str:
    """Stable textual key for an expression (group-by matching, default
    output names)."""
    if isinstance(node, Col):
        return node.name
    if isinstance(node, Lit):
        return repr(node.value) if node.type == "auto" else f"{node.type} {node.value!r}"
    if isinstance(node, Bin):
        return f"({_render(node.left)} {node.op} {_render(node.right)})"
    if isinstance(node, Not):
        return f"(not {_render(node.arg)})"
    if isinstance(node, Func):
        inner = "*" if node.star else ", ".join(_render(a) for a in node.args)
        d = "distinct " if node.distinct else ""
        return f"{node.name}({d}{inner})"
    if isinstance(node, Case):
        parts = " ".join(f"when {_render(c)} then {_render(r)}" for c, r in node.whens)
        e = f" else {_render(node.default)}" if node.default is not None else ""
        return f"case {parts}{e} end"
    if isinstance(node, Cast):
        return f"cast({_render(node.arg)} as {node.to})"
    if isinstance(node, InList):
        vs = ", ".join(repr(v.value) for v in node.values)
        return f"({_render(node.arg)} {'not ' if node.negated else ''}in ({vs}))"
    if isinstance(node, IsNull):
        return f"({_render(node.arg)} is {'not ' if node.negated else ''}null)"
    if isinstance(node, LikeOp):
        return f"({_render(node.arg)} {'not ' if node.negated else ''}like {node.pattern!r})"
    if isinstance(node, InSubquery):
        return (f"({_render(node.arg)} {'not ' if node.negated else ''}"
                f"in subquery#{id(node.query)})")
    if isinstance(node, ScalarSub):
        return f"scalar_subquery#{id(node.query)}"
    if isinstance(node, WindowFunc):
        a = ", ".join(_render(x) for x in node.args)
        p = ", ".join(_render(x) for x in node.partition_by)
        o = ", ".join(f"{_render(e)} {'asc' if asc else 'desc'}"
                      for e, asc in node.order_by)
        return f"{node.name}({a}) over (partition by {p} order by {o})"
    raise SqlError(f"cannot render {node!r}")


# ---------------------------------------------------------------------------
# Expression → vectorized Arrow evaluation
# ---------------------------------------------------------------------------

_CAST_TYPES = {
    "bigint": pa.int64(), "int8": pa.int64(),
    "integer": pa.int32(), "int": pa.int32(), "int4": pa.int32(),
    "smallint": pa.int16(),
    "double": pa.float64(), "float8": pa.float64(),
    "real": pa.float32(), "float4": pa.float32(),
    "varchar": pa.string(), "text": pa.string(), "string": pa.string(),
    "date": pa.date32(),
    "timestamp": pa.timestamp("us"),
    "boolean": pa.bool_(), "bool": pa.bool_(),
}

_CMP = {"=": pc.equal, "!=": pc.not_equal, "<": pc.less, "<=": pc.less_equal,
        ">": pc.greater, ">=": pc.greater_equal}


def _lit_scalar(l: Lit):
    if l.type == "pa":
        return l.value  # already a typed pa.Scalar (resolved scalar subquery)
    if l.type == "date":
        import datetime as _dt
        return pa.scalar(_dt.date.fromisoformat(l.value), pa.date32())
    if l.type == "timestamp":
        import datetime as _dt
        v = l.value
        dt = _dt.datetime.fromisoformat(v) if ("T" in v or " " in v) else \
            _dt.datetime.combine(_dt.date.fromisoformat(v), _dt.time())
        return pa.scalar(dt, pa.timestamp("us"))
    return pa.scalar(l.value)


def _is_float(x) -> bool:
    t = x.type if isinstance(x, (pa.Array, pa.ChunkedArray, pa.Scalar)) else None
    return t is not None and pa.types.is_floating(t)


def _is_int(x) -> bool:
    t = x.type if isinstance(x, (pa.Array, pa.ChunkedArray, pa.Scalar)) else None
    return t is not None and pa.types.is_integer(t)


def _eval(node, t: pa.Table, resolve):
    """Evaluate `node` over table `t`; `resolve(Col) -> column name in t`.
    Returns a pa.Array/ChunkedArray or pa.Scalar (for pure-literal
    subtrees); callers that need an array use `_as_array`."""
    if isinstance(node, Col):
        return t.column(resolve(node))
    if isinstance(node, Lit):
        return _lit_scalar(node)
    if isinstance(node, Bin):
        if node.op in ("and", "or"):
            l = _eval(node.left, t, resolve)
            r = _eval(node.right, t, resolve)
            fn = pc.and_kleene if node.op == "and" else pc.or_kleene
            return fn(l, r)
        l = _eval(node.left, t, resolve)
        r = _eval(node.right, t, resolve)
        if node.op in _CMP:
            return _CMP[node.op](l, r)
        if node.op == "||":
            return pc.binary_join_element_wise(
                pc.cast(l, pa.string()), pc.cast(r, pa.string()), "")
        if node.op == "+":
            return pc.add_checked(l, r)
        if node.op == "-":
            return pc.subtract_checked(l, r)
        if node.op == "*":
            return pc.multiply_checked(l, r)
        if node.op == "/":
            # SQL (DuckDB) semantics: '/' always divides as double.
            return pc.divide(pc.cast(l, pa.float64()), pc.cast(r, pa.float64()))
        if node.op == "%":
            if _is_int(l) and _is_int(r):
                la = _as_array(l, t.num_rows)
                ln = la.to_numpy(zero_copy_only=False)
                rs = r.as_py() if isinstance(r, pa.Scalar) else \
                    _as_array(r, t.num_rows).to_numpy(zero_copy_only=False)
                with np.errstate(all="ignore"):
                    out = np.fmod(ln.astype("float64"), np.asarray(rs, "float64"))
                mask = pc.is_null(la).to_numpy(zero_copy_only=False)
                return pa.array(np.where(mask, 0, out).astype("int64"),
                                mask=mask)
            raise SqlError("'%' supported on integer operands only")
        raise SqlError(f"unsupported operator {node.op}")
    if isinstance(node, Not):
        return pc.invert(_eval(node.arg, t, resolve))
    if isinstance(node, IsNull):
        v = _as_array(_eval(node.arg, t, resolve), t.num_rows)
        return pc.is_valid(v) if node.negated else pc.is_null(v)
    if isinstance(node, InList):
        v = _as_array(_eval(node.arg, t, resolve), t.num_rows)
        vals = pa.array([x.value for x in node.values])
        try:
            vals = vals.cast(v.type)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            pass
        hit = pc.is_in(v, value_set=vals)
        # SQL: NULL IN (...) is NULL, not false.
        hit = pc.if_else(pc.is_null(v), pa.scalar(None, pa.bool_()), hit)
        return pc.invert(hit) if node.negated else hit
    if isinstance(node, LikeOp):
        v = _eval(node.arg, t, resolve)
        hit = pc.match_like(v, node.pattern)
        return pc.invert(hit) if node.negated else hit
    if isinstance(node, Case):
        out = None
        default = (_eval(node.default, t, resolve)
                   if node.default is not None else None)
        for cond, res in reversed(node.whens):
            c = pc.fill_null(_eval(cond, t, resolve), False)
            r = _eval(res, t, resolve)
            if out is None:
                if default is None:
                    # typed null fallback from the result branch
                    rt = r.type if hasattr(r, "type") else pa.null()
                    default = pa.scalar(None, rt if rt != pa.null() else pa.string())
                out = pc.if_else(c, r, default)
            else:
                out = pc.if_else(c, r, out)
        return out
    if isinstance(node, Cast):
        if node.to not in _CAST_TYPES:
            raise SqlError(f"unsupported CAST target: {node.to}")
        v = _eval(node.arg, t, resolve)
        target = _CAST_TYPES[node.to]
        vt = v.type if hasattr(v, "type") else None
        if vt is not None and pa.types.is_floating(vt) \
                and pa.types.is_integer(target):
            # SQL casts float→int via nearbyint = round HALF TO EVEN
            # (DuckDB: CAST(26.5 AS BIGINT)=26, CAST(27.5)=28); Arrow's
            # safe cast refuses non-integral floats and unsafe truncates —
            # round explicitly first.
            v = pc.round(v, round_mode="half_to_even")
            return pc.cast(v, target, safe=False)
        return pc.cast(v, target)
    if isinstance(node, Func):
        if node.name in _AGG_FUNCS:
            raise SqlError(f"aggregate {node.name}() outside GROUP BY context")
        args = [_eval(a, t, resolve) for a in node.args]
        return _scalar_fn(node.name, args)
    if isinstance(node, InSubquery):
        raise SqlError("IN (SELECT ...) is only supported as a top-level "
                       "WHERE conjunct")
    if isinstance(node, WindowFunc):
        raise SqlError("window functions are only supported as top-level "
                       "select items")
    raise SqlError(f"cannot evaluate {node!r}")


def _scalar_fn(name: str, args: list):
    if name == "lower":
        return pc.utf8_lower(args[0])
    if name == "upper":
        return pc.utf8_upper(args[0])
    if name == "length":
        return pc.cast(pc.utf8_length(args[0]), pa.int64())
    if name == "abs":
        return pc.abs_checked(args[0])
    if name == "round":
        nd = int(args[1].as_py()) if len(args) > 1 else 0
        return _sql_round(pc.cast(args[0], pa.float64()), nd)
    if name == "floor":
        return pc.floor(pc.cast(args[0], pa.float64()))
    if name == "ceil":
        return pc.ceil(pc.cast(args[0], pa.float64()))
    if name == "coalesce":
        return pc.coalesce(*args)
    if name == "nullif":
        a, b = args
        eq = pc.fill_null(pc.equal(a, b), False)
        at = a.type if hasattr(a, "type") else pa.string()
        return pc.if_else(eq, pa.scalar(None, at), a)
    if name in ("substr", "substring"):
        s = args[0]
        start = int(args[1].as_py()) - 1  # SQL is 1-based
        if start < 0:
            raise SqlError("substr start must be >= 1")
        if len(args) > 2:
            n = int(args[2].as_py())
            return pc.utf8_slice_codeunits(s, start, start + n)
        return pc.utf8_slice_codeunits(s, start)
    if name == "year":
        return pc.cast(pc.year(args[0]), pa.int64())
    if name == "month":
        return pc.cast(pc.month(args[0]), pa.int64())
    if name == "day":
        return pc.cast(pc.day(args[0]), pa.int64())
    raise SqlError(f"unsupported function: {name}")


def _sql_round(v, nd: int):
    """SQL ROUND with DuckDB's exact double semantics:
    ``nearbyint-style scale → half-away-from-zero → unscale``. Arrow's
    ``pc.round`` is NOT bit-identical — it leaves a value that is 1 ulp off
    the decimal grid unchanged (round(249288.58000000002, 2) returns the
    input), while DuckDB re-canonicalizes it to the nearest double of the
    grid point; order-dependent distributed sums land on such values, so
    parity requires the same formula."""
    scale = 10.0 ** nd
    if isinstance(v, pa.Scalar):
        x = v.as_py()
        if x is None:
            return pa.scalar(None, pa.float64())
        import math
        s = x * scale
        y = math.floor(s + 0.5) if x >= 0 else math.ceil(s - 0.5)
        return pa.scalar(y / scale, pa.float64())
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    mask = pc.is_null(v).to_numpy(zero_copy_only=False)
    x = v.to_numpy(zero_copy_only=False).astype("float64")
    with np.errstate(all="ignore"):
        s = np.nan_to_num(x, nan=0.0) * scale
        y = np.where(x >= 0, np.floor(s + 0.5), np.ceil(s - 0.5)) / scale
        y = np.where(np.isfinite(x), y, x)
    return pa.array(y, pa.float64(), from_pandas=False, mask=mask)


def _as_array(v, n: int):
    if isinstance(v, pa.Scalar):
        return pa.chunked_array([pa.repeat(v, n)])
    return v


# ---------------------------------------------------------------------------
# Predicate pushdown: AST conjunct → pyarrow.dataset expression (or None)
# ---------------------------------------------------------------------------

def _to_pads(node, resolve):
    import pyarrow.dataset as pads
    try:
        if isinstance(node, Bin) and node.op in _CMP or (
                isinstance(node, Bin) and node.op in ("and", "or")):
            if node.op in ("and", "or"):
                l = _to_pads(node.left, resolve)
                r = _to_pads(node.right, resolve)
                if l is None or r is None:
                    return None
                return (l & r) if node.op == "and" else (l | r)
            sides = []
            for side in (node.left, node.right):
                if isinstance(side, Col):
                    sides.append(pads.field(resolve(side)))
                elif isinstance(side, Lit):
                    sides.append(_lit_scalar(side))
                else:
                    return None
            l, r = sides
            return {"=": l == r, "!=": l != r, "<": l < r, "<=": l <= r,
                    ">": l > r, ">=": l >= r}[node.op]
        if isinstance(node, IsNull) and isinstance(node.arg, Col):
            f = pads.field(resolve(node.arg))
            return f.is_valid() if node.negated else f.is_null()
        if isinstance(node, InList) and isinstance(node.arg, Col) \
                and not node.negated:
            f = pads.field(resolve(node.arg))
            return f.isin([v.value for v in node.values])
    except (SqlError, KeyError):
        return None
    return None


# ---------------------------------------------------------------------------
# Compiler
# ---------------------------------------------------------------------------

class _Rel:
    """A compiled relation: the lazy Dataset plus a ZERO-ROW schema twin.

    Every per-batch transform in this compiler is a pure
    ``pa.Table → pa.Table`` closure, so applying the same closure to the
    0-row twin (a) type-checks the expression driver-side — errors surface
    as ``SqlError``/``ArrowInvalid`` at compile time instead of inside a Ray
    task — and (b) keeps the output schema known even when the result is
    empty (Ray drops empty blocks, so ``Dataset.schema()`` on an empty
    result is ``None``). :func:`sql` unions a 0-row carrier block built
    from the twin into the final plan so empty results keep their columns.
    """

    __slots__ = ("ds", "zero")

    def __init__(self, ds: rd.Dataset, zero: pa.Table):
        self.ds = ds
        self.zero = zero.slice(0, 0)

    def map(self, fn, **kwargs) -> "_Rel":
        zero = fn(self.zero)
        return _Rel(self.ds.map_batches(fn, batch_format="pyarrow",
                                        zero_copy_batch=True, **kwargs), zero)


class _Scope:
    """Name resolution over the flat post-join column space."""

    def __init__(self):
        self.sources: list[tuple[str, list[str]]] = []  # (alias, columns)

    def add(self, alias: str, columns: list[str]):
        if alias in (a for a, _ in self.sources):
            raise SqlError(f"duplicate table alias {alias!r}")
        self.sources.append((alias, list(columns)))

    def resolve(self, c: Col) -> str:
        if c.table is not None:
            for a, cols in self.sources:
                if a == c.table:
                    if c.name not in cols:
                        raise SqlError(f"no column {c.name!r} in {a!r}")
                    return c.name
            raise SqlError(f"unknown table alias {c.table!r}")
        hits = [a for a, cols in self.sources if c.name in cols]
        if not hits:
            raise SqlError(f"unknown column {c.name!r}")
        if len(hits) > 1:
            raise SqlError(f"ambiguous column {c.name!r} (in {hits})")
        return c.name

    def source_of(self, c: Col) -> str:
        if c.table is not None:
            return c.table
        hits = [a for a, cols in self.sources if c.name in cols]
        if not hits:
            raise SqlError(f"unknown column {c.name!r}")
        if len(hits) > 1:
            raise SqlError(f"ambiguous column {c.name!r} (in {hits})")
        return hits[0]

    def columns(self, alias: str) -> list[str]:
        for a, cols in self.sources:
            if a == alias:
                return cols
        raise SqlError(f"unknown table alias {alias!r}")


def _distinct_ds(rel: _Rel, cols: list[str], cardinality: str) -> _Rel:
    def _partial(t: pa.Table) -> pa.Table:
        return t.select(cols).group_by(cols, use_threads=False).aggregate([])

    part = rel.map(_partial)
    if cardinality == "high":
        out = part.ds.groupby(cols).map_groups(
            lambda g: g.slice(0, 1), batch_format="pyarrow")
        return _Rel(out, part.zero)
    from vlm_eden_dataset_etl_ray.functions.relational import _single_block
    out = _single_block(part.ds).map_batches(
        _partial, batch_format="pyarrow", batch_size=None)
    return _Rel(out, part.zero)


def _project(rel: _Rel, items: list[tuple], scope_resolve) -> _Rel:
    """items: [(expr, out_name)] evaluated vectorized per batch."""
    def _proj(t: pa.Table) -> pa.Table:
        cols, names = [], []
        for expr, name in items:
            v = _as_array(_eval(expr, t, scope_resolve), t.num_rows)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            cols.append(v)
            names.append(name)
        return pa.table(dict(zip(names, cols)))

    return rel.map(_proj)


def _filter_ds(rel: _Rel, pred, scope_resolve) -> _Rel:
    def _flt(t: pa.Table) -> pa.Table:
        mask = _as_array(_eval(pred, t, scope_resolve), t.num_rows)
        return t.filter(pc.fill_null(mask, False))

    return rel.map(_flt)


def _join_rel(left: _Rel, right: _Rel, left_on: str, right_on: str,
              how: str = "inner") -> _Rel:
    from vlm_eden_dataset_etl_ray.functions.relational import _join_out_schema
    out_schema = _join_out_schema(left.zero.schema, right.zero.schema,
                                  left_on, right_on)
    return _Rel(auto_join(left.ds, right.ds, left_on, right_on, how=how),
                out_schema.empty_table())


def _lit_py(l: Lit):
    return _lit_scalar(l).as_py() if l.type != "auto" else l.value


# -- aggregation ------------------------------------------------------------

def _compile_aggregate(rel: _Rel, core: Core, scope: _Scope, cardinality: str) -> _Rel:
    """GROUP BY plan: pre-project keys+agg inputs → per-batch Arrow partials
    → tree-reduce or shuffle combine → outer-expression projection."""
    from vlm_eden_dataset_etl_ray.functions.relational import _single_block

    # GROUP BY / HAVING ordinals and select-list aliases (DuckDB behavior:
    # a real column wins over a same-named alias)
    alias_map = {alias: e for e, alias in core.items
                 if alias is not None and e != "*"}

    def _subst(e):
        if isinstance(e, Col) and e.table is None and e.name in alias_map:
            try:
                scope.resolve(e)
                return e
            except SqlError:
                return alias_map[e.name]
        return e

    def _ordinal(e):
        if isinstance(e, Lit) and e.type == "auto" and isinstance(e.value, int):
            if not (1 <= e.value <= len(core.items)):
                raise SqlError(f"GROUP BY ordinal {e.value} out of range")
            item = core.items[e.value - 1][0]
            if item == "*":
                raise SqlError("GROUP BY ordinal cannot reference *")
            return item
        return e

    group_exprs = [_rewrite_expr(_ordinal(e), _subst) for e in core.group_by]
    having = _rewrite_expr(core.having, _subst) \
        if core.having is not None else None
    key_render = {_render(e): f"__k{i}" for i, e in enumerate(group_exprs)}

    # collect unique aggregates across select/having (order-by handled later
    # on named output columns)
    agg_nodes: list[Func] = []
    seen: dict[str, int] = {}
    roots = [e for e, _ in core.items if e != "*"]
    if having is not None:
        roots.append(having)
    for r in roots:
        for a in _aggs(r):
            key = _render(a)
            if key not in seen:
                seen[key] = len(agg_nodes)
                agg_nodes.append(a)
    if any(e == "*" for e, _ in core.items):
        raise SqlError("SELECT * not allowed with GROUP BY")

    # validate: non-aggregate parts of select items must be group exprs
    def _check(e):
        if _render(e) in key_render:
            return
        if isinstance(e, Func) and e.name in _AGG_FUNCS:
            return
        if isinstance(e, (Lit,)):
            return
        if isinstance(e, Col):
            raise SqlError(
                f"column {e.name!r} must appear in GROUP BY or an aggregate")
        for n in (e.left, e.right) if isinstance(e, Bin) else \
                (e.arg,) if isinstance(e, (Not, Cast, IsNull, InList, LikeOp)) else \
                e.args if isinstance(e, Func) else \
                ([c for w in e.whens for c in w] +
                 ([e.default] if e.default is not None else [])) if isinstance(e, Case) else ():
            if n is not None:
                _check(n)

    for e, _ in core.items:
        _check(e)

    # pre-projection: __k* key columns + __a* agg input columns
    pre_items = [(e, key_render[_render(e)]) for e in group_exprs]
    distinct_aggs: list[tuple[int, Func]] = []
    plain: list[tuple[int, Func]] = []
    for i, a in enumerate(agg_nodes):
        if a.distinct:
            if a.name != "count":
                raise SqlError("DISTINCT only supported with count()")
            distinct_aggs.append((i, a))
        else:
            plain.append((i, a))
        if not a.star:
            if len(a.args) != 1:
                raise SqlError(f"{a.name}() takes exactly one argument")
            pre_items.append((a.args[0], f"__a{i}"))

    keys = [key_render[_render(e)] for e in group_exprs]
    pre = _project(rel, pre_items, scope.resolve) if pre_items else rel

    def _final_name(i: int) -> str:
        return f"__agg{i}"

    main = None
    if plain or not distinct_aggs:
        # per-batch partial
        specs, pnames = [], []
        for i, a in enumerate(agg_nodes):
            if a.distinct:
                continue
            if a.name == "count" and a.star:
                specs.append(([], "count_all")); pnames.append(f"__p{i}")
            elif a.name == "count":
                specs.append((f"__a{i}", "count")); pnames.append(f"__p{i}")
            elif a.name == "sum":
                specs.append((f"__a{i}", "sum")); pnames.append(f"__p{i}")
            elif a.name == "min":
                specs.append((f"__a{i}", "min")); pnames.append(f"__p{i}")
            elif a.name == "max":
                specs.append((f"__a{i}", "max")); pnames.append(f"__p{i}")
            elif a.name == "avg":
                specs.append((f"__a{i}", "sum")); pnames.append(f"__ps{i}")
                specs.append((f"__a{i}", "count")); pnames.append(f"__pc{i}")
            else:  # pragma: no cover
                raise SqlError(f"unsupported aggregate {a.name}")

        def _partial(t: pa.Table, keys=tuple(keys), specs=tuple(specs),
                     pnames=tuple(pnames)) -> pa.Table:
            if keys:
                g = t.group_by(list(keys), use_threads=False).aggregate(list(specs))
                return g.rename_columns(list(keys) + list(pnames))
            aggs = {}
            for (col, fn), pn in zip(specs, pnames):
                if fn == "count_all":
                    aggs[pn] = pa.array([t.num_rows], pa.int64())
                else:
                    # keep the scalar's type: an empty/all-null batch must
                    # not degrade the partial column to arrow's null type
                    s = getattr(pc, fn)(t.column(col))
                    aggs[pn] = pa.array([s.as_py()], s.type)
            return pa.table(aggs)

        part = pre.map(_partial)

        # combine spec: how each partial column merges
        merge = []
        for i, a in enumerate(agg_nodes):
            if a.distinct:
                continue
            if a.name in ("count",):
                merge.append((f"__p{i}", "sum", _final_name(i)))
            elif a.name == "sum":
                merge.append((f"__p{i}", "sum", _final_name(i)))
            elif a.name == "min":
                merge.append((f"__p{i}", "min", _final_name(i)))
            elif a.name == "max":
                merge.append((f"__p{i}", "max", _final_name(i)))
            elif a.name == "avg":
                merge.append((f"__ps{i}", "sum", f"__fs{i}"))
                merge.append((f"__pc{i}", "sum", f"__fc{i}"))

        def _post(t: pa.Table) -> pa.Table:
            # finalize avg and count dtypes
            for i, a in enumerate(agg_nodes):
                if a.distinct:
                    continue
                if a.name == "avg":
                    s = pc.cast(t.column(f"__fs{i}"), pa.float64())
                    c = t.column(f"__fc{i}")
                    v = pc.if_else(pc.equal(c, 0),
                                   pa.scalar(None, pa.float64()),
                                   pc.divide(s, pc.cast(c, pa.float64())))
                    t = t.drop_columns([f"__fs{i}", f"__fc{i}"])
                    t = t.append_column(_final_name(i), v)
                elif a.name == "count":
                    idx = t.column_names.index(_final_name(i))
                    t = t.set_column(idx, _final_name(i),
                                     pc.cast(t.column(_final_name(i)), pa.int64()))
            return t

        def _combine(t: pa.Table, keys=tuple(keys), merge=tuple(merge)) -> pa.Table:
            if keys:
                g = t.group_by(list(keys), use_threads=False).aggregate(
                    [(c, f) for c, f, _ in merge])
                g = g.rename_columns(list(keys) + [o for _, _, o in merge])
            else:
                cols = {}
                for c, f, o in merge:
                    s = getattr(pc, f)(t.column(c))
                    cols[o] = pa.array([s.as_py()], s.type)
                g = pa.table(cols) if cols else pa.table({"__one": [1]})
            return _post(g)

        if cardinality == "high" and keys:
            from ray.data.aggregate import Max, Min, Sum
            ray_aggs = []
            for col, fn, out in merge:
                cls = {"sum": Sum, "min": Min, "max": Max}[fn]
                ray_aggs.append(cls(col, alias_name=out))
            out_ds = part.ds.groupby(keys).aggregate(*ray_aggs)
            out_ds = out_ds.map_batches(_post, batch_format="pyarrow")
            main = _Rel(out_ds, _combine(part.zero))
        else:
            main = _Rel(
                _single_block(part.ds).map_batches(
                    _combine, batch_format="pyarrow", batch_size=None),
                _combine(part.zero))

    # count(DISTINCT x): two-stage distinct, then grouped count
    for i, a in distinct_aggs:
        dd = _distinct_ds(pre, keys + [f"__a{i}"], cardinality)

        def _cnt(t: pa.Table, keys=tuple(keys), i=i) -> pa.Table:
            if keys:
                g = t.group_by(list(keys), use_threads=False).aggregate(
                    [(f"__a{i}", "count")])
                return g.rename_columns(list(keys) + [_final_name(i)])
            return pa.table({_final_name(i): pa.array(
                [pc.count(t.column(f"__a{i}")).as_py()], pa.int64())})

        # distinct output is one block already on the low path; count it
        dcount = _Rel(
            _single_block(dd.ds).map_batches(
                _cnt, batch_format="pyarrow", batch_size=None),
            _cnt(dd.zero))
        if main is None:
            main = dcount
        elif keys:
            main = _join_rel(main, dcount, keys[0], keys[0]) if len(keys) == 1 \
                else _merge_on_keys(main, dcount, keys)
        else:
            main = _cross_one_row(main, dcount)

    assert main is not None

    # outer projection: replace agg nodes / group exprs with their columns
    def _rewrite(e):
        r = _render(e)
        if r in key_render:
            return Col(key_render[r])
        if isinstance(e, Func) and e.name in _AGG_FUNCS:
            return Col(_final_name(seen[_render(e)]))
        if isinstance(e, Bin):
            return Bin(e.op, _rewrite(e.left), _rewrite(e.right))
        if isinstance(e, Not):
            return Not(_rewrite(e.arg))
        if isinstance(e, Cast):
            return Cast(_rewrite(e.arg), e.to)
        if isinstance(e, Case):
            return Case(tuple((_rewrite(c), _rewrite(x)) for c, x in e.whens),
                        _rewrite(e.default) if e.default is not None else None)
        if isinstance(e, InList):
            return InList(_rewrite(e.arg), e.values, e.negated)
        if isinstance(e, IsNull):
            return IsNull(_rewrite(e.arg), e.negated)
        if isinstance(e, LikeOp):
            return LikeOp(_rewrite(e.arg), e.pattern, e.negated)
        if isinstance(e, Func):
            return Func(e.name, tuple(_rewrite(a) for a in e.args))
        return e

    flat_resolve = lambda c: c.name  # noqa: E731

    if having is not None:
        main = _filter_ds(main, _rewrite(having), flat_resolve)

    out_items = []
    for j, (e, alias) in enumerate(core.items):
        name = alias or _render(e)
        out_items.append((_rewrite(e), name))
    return _project(main, out_items, flat_resolve)


def _merge_on_keys(left: _Rel, right: _Rel, keys: list[str]) -> _Rel:
    """Composite-key join of two aggregated (small) tables via a synthetic
    concatenated key — both sides are aggregation outputs (O(groups)), so
    the broadcast path of auto_join applies."""
    SEP = "\x1f"

    def _with_key(drop: bool):
        def _fn(t: pa.Table) -> pa.Table:
            parts = [pc.cast(t.column(k), pa.string()) for k in keys]
            joined = pc.binary_join_element_wise(*parts, SEP) \
                if len(parts) > 1 else parts[0]
            t = t.append_column("__jk", joined)
            return t.drop_columns(keys) if drop else t
        return _fn

    l2 = left.map(_with_key(False))
    r2 = right.map(_with_key(True))
    out = _join_rel(l2, r2, "__jk", "__jk")
    return out.map(lambda t: t.drop_columns(["__jk"]))


def _cross_one_row(left: _Rel, right: _Rel) -> _Rel:
    """Combine two 1-row global-aggregate results column-wise (both sides
    are single-row by construction: a no-GROUP-BY aggregate)."""
    import ray

    def _zip_ref(ref):
        def _fn(t: pa.Table) -> pa.Table:
            other: pa.Table = ray.get(ref)
            for name in other.column_names:
                t = t.append_column(name, other.column(name))
            return t
        return _fn

    rt = pa.concat_tables(
        right.ds.iter_batches(batch_format="pyarrow", batch_size=None))
    ref = ray.put(rt)

    zero = left.zero
    for f in right.zero.schema:
        zero = zero.append_column(f, pa.array([], f.type))
    return _Rel(left.ds.map_batches(_zip_ref(ref), batch_format="pyarrow"),
                zero)


# -- subqueries ---------------------------------------------------------------

def _rewrite_expr(e, fn):
    """Bottom-up structural rewrite; `fn` maps a node to its replacement
    (or returns it unchanged). Does NOT descend into nested Query scopes."""
    if isinstance(e, Bin):
        e = Bin(e.op, _rewrite_expr(e.left, fn), _rewrite_expr(e.right, fn))
    elif isinstance(e, Not):
        e = Not(_rewrite_expr(e.arg, fn))
    elif isinstance(e, Cast):
        e = Cast(_rewrite_expr(e.arg, fn), e.to)
    elif isinstance(e, Case):
        e = Case(tuple((_rewrite_expr(c, fn), _rewrite_expr(r, fn))
                       for c, r in e.whens),
                 _rewrite_expr(e.default, fn) if e.default is not None else None)
    elif isinstance(e, InList):
        e = InList(_rewrite_expr(e.arg, fn), e.values, e.negated)
    elif isinstance(e, InSubquery):
        e = InSubquery(_rewrite_expr(e.arg, fn), e.query, e.negated)
    elif isinstance(e, IsNull):
        e = IsNull(_rewrite_expr(e.arg, fn), e.negated)
    elif isinstance(e, LikeOp):
        e = LikeOp(_rewrite_expr(e.arg, fn), e.pattern, e.negated)
    elif isinstance(e, Func):
        e = Func(e.name, tuple(_rewrite_expr(a, fn) for a in e.args),
                 e.distinct, e.star)
    return fn(e)


def _resolve_scalar_subs(core: Core, sf_dir, tables, cardinality) -> None:
    """Execute each uncorrelated scalar subquery ONCE at compile time and
    splice its (1×1) result in as a typed literal — the reference's
    watermark-read idiom (`WHERE ts > (SELECT max(ts) …)`,
    /root/reference/queries/fact_studies.py:3-35) without re-running the
    subquery per batch. Correlated subqueries are not supported."""

    def fn(e):
        if not isinstance(e, ScalarSub):
            return e
        rel, cols = _compile_query(e.query, sf_dir, tables, cardinality)
        if len(cols) != 1:
            raise SqlError("scalar subquery must select exactly one column")
        batches = list(rel.ds.iter_batches(batch_format="pyarrow",
                                           batch_size=None))
        t = pa.concat_tables(batches) if batches else rel.zero
        if t.num_rows == 0:
            return Lit(None)
        if t.num_rows > 1:
            raise SqlError(f"scalar subquery returned {t.num_rows} rows")
        return Lit(t.column(0)[0], type="pa")

    core.items = [(e if e == "*" else _rewrite_expr(e, fn), a)
                  for e, a in core.items]
    if core.where is not None:
        core.where = _rewrite_expr(core.where, fn)
    core.group_by = [_rewrite_expr(e, fn) for e in core.group_by]
    if core.having is not None:
        core.having = _rewrite_expr(core.having, fn)


# broadcast budget for IN-subquery key sets; above it the partitioned
# hash_semi_join runs (module-level so tests can force the shuffle path)
IN_SUBQUERY_BROADCAST_BYTES = 64 * 1024 * 1024


def _apply_in_subquery(rel: _Rel, node: InSubquery, scope: _Scope, sf_dir,
                       tables, cardinality,
                       broadcast_threshold_bytes: int | None = None) -> _Rel:
    """`x [NOT] IN (SELECT k …)` as a semi/anti join. The subquery's
    DISTINCT keys are reduced distributed first; if the key set fits the
    broadcast budget it ships once via ``ray.put`` and filters per batch
    (:func:`broadcast_membership_filter`), else the partitioned
    :func:`hash_semi_join` runs (left rows + distinct right keys through
    one exchange — right payload never moves). SQL null semantics: a null
    probe never matches (dropped by IN *and* NOT IN); a null in the
    subquery result makes NOT IN match nothing at all."""
    from vlm_eden_dataset_etl_ray.functions.relational import (
        broadcast_membership_filter, hash_semi_join)

    if broadcast_threshold_bytes is None:
        broadcast_threshold_bytes = IN_SUBQUERY_BROADCAST_BYTES
    sub_rel, sub_cols = _compile_query(node.query, sf_dir, tables, cardinality)
    if len(sub_cols) != 1:
        raise SqlError("IN subquery must select exactly one column")

    # probe side: a plain column probes in place; an expression gets a
    # temporary key column (dropped after the filter)
    tmp = None
    if isinstance(node.arg, Col):
        colname = scope.resolve(node.arg)
        work = rel
    else:
        tmp = "__subq_probe"
        arg = node.arg

        def _addkey(t: pa.Table) -> pa.Table:
            v = _as_array(_eval(arg, t, scope.resolve), t.num_rows)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            return t.append_column(tmp, v)

        work = rel.map(_addkey)
        colname = tmp

    dd = _distinct_ds(sub_rel, [sub_cols[0]], cardinality)
    mat = dd.ds.materialize()
    size = mat.size_bytes() or 0

    if size <= broadcast_threshold_bytes:
        batches = list(mat.iter_batches(batch_format="pyarrow",
                                        batch_size=None))
        keys_tbl = pa.concat_tables(batches) if batches else dd.zero
        keys = keys_tbl.column(0).combine_chunks()
        has_null = keys.null_count > 0
        keys = keys.drop_null()
        if node.negated and has_null:
            # SQL: x NOT IN (set containing NULL) is never TRUE
            out = work.map(lambda t: t.slice(0, 0))
        else:
            out = _Rel(broadcast_membership_filter(
                work.ds, colname, keys, negate=node.negated), work.zero)
    else:
        # count right-side nulls with an O(blocks) metadata pass
        nulls = sum(
            b.column(0).null_count
            for b in mat.iter_batches(batch_format="pyarrow",
                                      batch_size=None))
        if node.negated and nulls:
            out = work.map(lambda t: t.slice(0, 0))
        else:
            right_key = sub_cols[0]
            right = mat
            if right_key == colname:
                right_key = "__subq_key"
                right = right.map_batches(
                    lambda t, rk=right_key: t.rename_columns([rk]),
                    batch_format="pyarrow")
            joined = hash_semi_join(work.ds, right, colname, right_key,
                                    anti=node.negated,
                                    bytes_hint=size * 4)
            if node.negated:
                # hash_semi_join's anti is NOT EXISTS (keeps null probes);
                # NOT IN drops them
                joined = joined.map_batches(
                    lambda t, c=colname: t.filter(pc.is_valid(t.column(c))),
                    batch_format="pyarrow", zero_copy_batch=True)
            out = _Rel(joined, work.zero)

    if tmp is not None:
        out = out.map(lambda t, c=tmp: t.drop_columns([c]))
    return out


# -- window functions ----------------------------------------------------------

def _apply_window(rel: _Rel, wf: WindowFunc, out: str, scope: _Scope) -> _Rel:
    """One window select item → the matching distributed window operator.
    Global (no PARTITION BY) forms ride the one-sort O(blocks)-driver
    family in :mod:`functions.windows`; partitioned ranking rides
    :func:`windows.keyed_rank_ids` (same shape, per-key carries);
    the per-key running/shift family (sum/min/max/count/avg/lag/lead/
    first_value) rides ONE fused groupby exchange via
    :func:`_apply_keyed_windows`."""
    from vlm_eden_dataset_etl_ray.functions import windows as W

    def _colnames(exprs, what):
        names = []
        for e in exprs:
            if not isinstance(e, Col):
                raise SqlError(f"window {what} must be plain columns "
                               f"(got {_render(e)})")
            names.append(scope.resolve(e))
        return names

    pks = _colnames(wf.partition_by, "PARTITION BY")
    order_cols = _colnames([e for e, _ in wf.order_by], "ORDER BY")
    desc = [not asc for _, asc in wf.order_by]

    name = wf.name
    if name in ("row_number", "rank", "dense_rank"):
        if wf.args:
            raise SqlError(f"{name}() takes no arguments")
        if pks:
            ds = W.keyed_rank_ids(rel.ds, pks, order_cols, kind=name,
                                  out_col=out, descending=desc or False)
        else:
            if not order_cols:
                raise SqlError(f"{name}() OVER () requires ORDER BY")
            fn = {"row_number": W.global_row_number, "rank": W.global_rank,
                  "dense_rank": W.global_dense_rank}[name]
            ds = fn(rel.ds, order_cols, out_col=out, descending=desc)
        return _Rel(ds, rel.zero.append_column(out, pa.array([], pa.int64())))

    if name in ("ntile", "cume_dist", "percent_rank"):
        if pks:
            raise SqlError(f"{name}() with PARTITION BY is not supported")
        if not order_cols:
            raise SqlError(f"{name}() requires ORDER BY")
        if name == "ntile":
            if len(wf.args) != 1 or not isinstance(wf.args[0], Lit):
                raise SqlError("ntile(n) requires a literal tile count")
            if any(desc):
                raise SqlError("ntile() DESC ordering is not supported")
            ds = W.ntile(rel.ds, int(wf.args[0].value), order_cols,
                         out_col=out)
            t = pa.int64()
        elif name == "cume_dist":
            ds = W.global_cume_dist(rel.ds, order_cols, out_col=out,
                                    descending=desc)
            t = pa.float64()
        else:
            ds = W.global_rank(rel.ds, order_cols, out_col=out,
                               descending=desc, percent=True)
            t = pa.float64()
        return _Rel(ds, rel.zero.append_column(out, pa.array([], t)))

    if name in _KEYED_WINDOWS:
        if len(pks) != 1:
            raise SqlError(f"{name}() OVER requires exactly one PARTITION "
                           "BY column")
        if not order_cols:
            raise SqlError(f"{name}() OVER requires ORDER BY")
        return _apply_keyed_windows(rel, [(wf, out)], scope)

    raise SqlError(f"unsupported window function: {name}")


_KEYED_WINDOWS = ("sum", "min", "max", "count", "avg", "lag", "lead",
                  "first_value")


def _match_topn(e) -> tuple[WindowFunc, int] | None:
    """``row_number() OVER (PARTITION BY col ORDER BY cols…) <= n`` (also
    ``< n+1`` / ``= 1``, either operand order) → (window, n). The physical
    rewrite target is relational.topk_per_key: per-batch partial top-k
    (≤k rows per key leave each batch — skew-proof) + run-boundary fold,
    instead of materializing a full global rank assignment and filtering."""
    if not isinstance(e, Bin):
        return None
    wf, lit, op = None, None, e.op
    if isinstance(e.left, WindowFunc) and isinstance(e.right, Lit):
        wf, lit = e.left, e.right
    elif isinstance(e.right, WindowFunc) and isinstance(e.left, Lit):
        wf, lit = e.right, e.left
        op = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "="}.get(op, op)
    if wf is None or wf.name != "row_number" or wf.args:
        return None
    if len(wf.partition_by) != 1 or not wf.order_by:
        return None
    if not all(isinstance(c, Col) for c in wf.partition_by) or \
            not all(isinstance(c, Col) for c, _ in wf.order_by):
        return None
    if not isinstance(lit.value, int) or isinstance(lit.value, bool):
        return None
    n = int(lit.value)
    if op == "<":
        n -= 1
    elif op == "=" and n != 1:
        return None
    elif op not in ("<", "<=", "="):
        return None
    return (wf, n) if n >= 1 else None


def _apply_keyed_windows(rel: _Rel, items: list, scope: _Scope) -> _Rel:
    """All per-key windows in ``items`` share one PARTITION BY / ORDER BY →
    ONE groupby exchange computes every column (relational.keyed_window_agg)
    instead of one shuffle per window call."""
    from vlm_eden_dataset_etl_ray.functions.relational import keyed_window_agg

    wf0 = items[0][0]
    pk = scope.resolve(wf0.partition_by[0])
    order_cols = [scope.resolve(e) for e, _ in wf0.order_by]
    desc = [not asc for _, asc in wf0.order_by]
    specs: list[tuple[str, str | None, str]] = []
    casts: list[tuple[str, pa.DataType]] = []
    zero = rel.zero
    for wf, out in items:
        name = wf.name
        offset = 1
        if name == "count" and not wf.args:
            val = None                             # count(*)
        elif name in ("lag", "lead") and len(wf.args) == 2:
            if not isinstance(wf.args[0], Col) \
                    or not isinstance(wf.args[1], Lit) \
                    or not isinstance(wf.args[1].value, int):
                raise SqlError(f"{name}(col, n) requires a plain column "
                               "and a literal integer offset")
            val = scope.resolve(wf.args[0])
            offset = int(wf.args[1].value)
        else:
            if len(wf.args) != 1 or not isinstance(wf.args[0], Col):
                raise SqlError(f"{name}() OVER takes one plain column "
                               "argument")
            val = scope.resolve(wf.args[0])
        src_t = zero.schema.field(val).type if val else pa.int64()
        # output types follow SQL: count→int64, avg→float64,
        # sum→int64/float64 by input, min/max/lag/lead/first_value→input
        if name == "count":
            out_t = pa.int64()
        elif name == "avg":
            out_t = pa.float64()
        elif name == "sum":
            out_t = pa.float64() if pa.types.is_floating(src_t) else pa.int64()
        else:
            out_t = src_t
        specs.append((name, val, out, offset) if name in ("lag", "lead")
                     else (name, val, out))
        if name not in ("lag", "lead", "first_value"):
            casts.append((out, out_t))
        zero = zero.append_column(out, pa.array([], out_t))

    ds = keyed_window_agg(rel.ds, pk, order_cols, specs,
                          descending=desc)
    if casts:
        def _cast(t: pa.Table, cs=tuple(casts)) -> pa.Table:
            for o, ot in cs:
                t = t.set_column(t.column_names.index(o), o,
                                 pc.cast(t.column(o), ot))
            return t
        ds = ds.map_batches(_cast, batch_format="pyarrow")
    return _Rel(ds, zero)


# -- core / query compilation ------------------------------------------------

def _compile_core(core: Core, sf_dir: str, tables, cardinality: str) -> tuple[_Rel, list[str]]:
    _resolve_scalar_subs(core, sf_dir, tables, cardinality)
    scope = _Scope()
    all_sources = [core.source] + [j.source for j in core.joins]

    # referenced columns per alias (for scan pruning)
    star = any(e == "*" for e, _ in core.items)
    refs: list[Col] = []
    for e, _ in core.items:
        if e != "*":
            refs.extend(_cols(e))
    for j in core.joins:
        refs.extend([j.left_col, j.right_col])
    if core.where is not None:
        refs.extend(_cols(core.where))
    for e in core.group_by:
        refs.extend(_cols(e))
    if core.having is not None:
        refs.extend(_cols(core.having))
    if core.qualify is not None:
        refs.extend(_cols(core.qualify))

    # bind each source: derived tables compile recursively; base tables get
    # schema from the parquet footer
    import pyarrow.parquet as pq
    import os
    schemas: dict[str, list[str]] = {}
    for src in all_sources:
        if src.sub is not None:
            sub_rel, sub_cols = _compile_query(src.sub, sf_dir, tables,
                                               cardinality)
            src._ds = sub_rel  # type: ignore[attr-defined]
            schemas[src.alias] = sub_cols
        elif tables is not None and src.table in tables:
            src._ds = tables[src.table]  # type: ignore[attr-defined]
            schemas[src.alias] = list(tables[src.table].schema().names)
        else:
            path = os.path.join(sf_dir, f"{src.table}.parquet")
            if not os.path.exists(path):
                raise SqlError(f"unknown table {src.table!r}")
            schemas[src.alias] = pq.read_schema(path).names
            src._ds = None  # type: ignore[attr-defined]
        scope.add(src.alias, schemas[src.alias])

    # resolve + bucket WHERE conjuncts by the single source they touch.
    # A conjunct on the null-supplying (right) side of a LEFT JOIN cannot
    # move below the join — `WHERE r.x IS NULL` is the anti-join idiom and
    # even null-rejecting predicates change which left rows survive — so
    # those stay post-join.
    left_protected = {j.source.alias for j in core.joins if j.how == "left"}
    conj = _conjuncts(core.where) if core.where is not None else []
    per_source: dict[str, list] = {s.alias: [] for s in all_sources}
    per_source_subq: dict[str, list] = {s.alias: [] for s in all_sources}
    post_join: list = []
    post_join_subq: list = []
    for c in conj:
        owners = {scope.source_of(col) for col in _cols(c)}
        is_subq = isinstance(c, InSubquery)
        if len(owners) == 1 and not (owners & left_protected):
            (per_source_subq if is_subq else per_source)[next(iter(owners))].append(c)
        elif is_subq:
            post_join_subq.append(c)
        else:
            post_join.append(c)

    # build each source's dataset: pruned scan + pushdown + residual filter
    def _needed(alias: str) -> list[str] | None:
        if star:
            return None
        need = set()
        for col in refs:
            try:
                owner = scope.source_of(col)
            except SqlError:
                continue  # select-list alias in GROUP BY/HAVING/ORDER BY
            if owner == alias:
                need.add(scope.resolve(col))
        for c in per_source[alias]:
            for col in _cols(c):
                need.add(scope.resolve(col))
        return sorted(need) or list(schemas[alias][:1])


    def _build(src: Source) -> _Rel:
        bound = getattr(src, "_ds", None)
        residual = list(per_source[src.alias])
        if bound is None:
            cols = _needed(src.alias)
            pushed, keep = None, []
            for c in residual:
                e = _to_pads(c, scope.resolve)
                if e is not None:
                    pushed = e if pushed is None else (pushed & e)
                else:
                    keep.append(c)
            path = os.path.join(sf_dir, f"{src.table}.parquet")
            sch = pq.read_schema(path).remove_metadata()
            if cols is not None:
                sch = pa.schema([sch.field(c) for c in cols])
            rel = _Rel(read_table(sf_dir, src.table, columns=cols,
                                  filter=pushed), sch.empty_table())
            residual = keep
        else:
            if isinstance(bound, _Rel):
                rel = bound
            else:
                bsch = bound.schema()
                zero = pa.schema(list(zip(bsch.names, bsch.types))).empty_table()
                rel = _Rel(bound, zero)
            if not star:
                cols = _needed(src.alias)
                if cols is not None and set(cols) != set(schemas[src.alias]):
                    rel = rel.map(lambda t, c=tuple(cols): t.select(list(c)))
        for c in residual:
            rel = _filter_ds(rel, c, scope.resolve)
        for c in per_source_subq[src.alias]:
            # semi/anti filter BEFORE any join moves these rows
            rel = _apply_in_subquery(rel, c, scope, sf_dir, tables, cardinality)
        return rel

    rel = _build(core.source)
    built = {core.source.alias}
    for j in core.joins:
        right = _build(j.source)
        lc_src = scope.source_of(j.left_col)
        if lc_src in built:
            lkey, rkey = scope.resolve(j.left_col), scope.resolve(j.right_col)
        else:
            lkey, rkey = scope.resolve(j.right_col), scope.resolve(j.left_col)
        rel = _join_rel(rel, right, lkey, rkey, how=j.how)
        built.add(j.source.alias)

    for c in post_join:
        rel = _filter_ds(rel, c, scope.resolve)
    for c in post_join_subq:
        rel = _apply_in_subquery(rel, c, scope, sf_dir, tables, cardinality)

    # window functions: hoisted out of the select items (top-level OR nested
    # inside scalar expressions, e.g. round(cume_dist() OVER …, 6)), computed
    # over the filtered/joined relation, then referenced like ordinary columns
    win_specs: list[tuple[WindowFunc, str]] = []

    def _hoist(e):
        if isinstance(e, WindowFunc):
            for wf, out in win_specs:
                if wf == e:
                    return Col(out)
            out = f"__win{len(win_specs)}"
            win_specs.append((e, out))
            return Col(out)
        return e

    for i, (e, alias) in enumerate(core.items):
        if e == "*":
            continue
        ne = _rewrite_expr(e, _hoist)
        if win_specs:
            # a bare `w() OVER … AS alias` projects straight through
            core.items[i] = (ne, alias or (_render(ne)
                             if not isinstance(ne, Col) else ne.name))

    # QUALIFY filters on window results (the declarative top-N-per-group
    # idiom: `QUALIFY row_number() OVER (…) <= k`). Select-list aliases
    # substitute in first, then its windows join the same hoist — an alias
    # of an identical OVER spec reuses the already-computed column
    qualify = core.qualify
    if qualify is not None:
        alias_map = {alias: e for e, alias in core.items
                     if alias is not None and e != "*"}

        def _subst_alias(e):
            if isinstance(e, Col) and e.table is None and e.name in alias_map:
                try:
                    scope.resolve(e)
                    return e
                except SqlError:
                    return alias_map[e.name]
            return e

        qualify = _rewrite_expr(qualify, _subst_alias)
        fast = _match_topn(qualify)
        if fast is not None and all(fast[0] != w for w, _ in win_specs):
            # the rank column is referenced nowhere else → skip computing
            # it entirely and take top-n per key with the pre-reduce
            from vlm_eden_dataset_etl_ray.functions.relational import \
                topk_per_key
            wf_t, n = fast
            pk = scope.resolve(wf_t.partition_by[0])
            ob = [(scope.resolve(c), "ascending" if asc else "descending")
                  for c, asc in wf_t.order_by]
            rel = _Rel(topk_per_key(rel.ds, pk, ob, n,
                                    cardinality=cardinality), rel.zero)
            qualify = None
        else:
            qualify = _rewrite_expr(qualify, _hoist)
            if not win_specs:
                raise SqlError("QUALIFY requires a window function in the "
                               "select list or the QUALIFY clause")
    if win_specs:
        if core.group_by:
            raise SqlError("window functions cannot be combined with "
                           "GROUP BY in one SELECT (use a derived table)")
        # fuse per-key windows sharing (PARTITION BY, ORDER BY) into one
        # groupby exchange; everything else applies one at a time
        fuse_groups: dict[tuple, list] = {}
        plan: list[tuple[str, object]] = []
        for wf, out in win_specs:
            if wf.name in _KEYED_WINDOWS and len(wf.partition_by) == 1 \
                    and wf.order_by:
                k = (wf.partition_by, wf.order_by)
                if k not in fuse_groups:
                    fuse_groups[k] = []
                    plan.append(("fused", k))
                fuse_groups[k].append((wf, out))
            else:
                plan.append(("single", (wf, out)))
        for kind, item in plan:
            if kind == "fused":
                rel = _apply_keyed_windows(rel, fuse_groups[item], scope)
            else:
                wf, out = item
                rel = _apply_window(rel, wf, out, scope)
        scope.add("__window", [out for _, out in win_specs])
        if qualify is not None:
            rel = _filter_ds(rel, qualify, scope.resolve)

    # aggregate vs plain projection
    has_agg = core.group_by or any(
        e != "*" and _aggs(e) for e, _ in core.items)
    if has_agg:
        rel = _compile_aggregate(rel, core, scope, cardinality)
        out_cols = [alias or _render(e) for e, alias in core.items]
    elif star:
        if len(core.items) != 1:
            raise SqlError("SELECT * cannot mix with other select items")
        out_cols = []
        seen_cols = set()
        for alias, cols in scope.sources:
            for c in cols:
                if c not in seen_cols:
                    out_cols.append(c)
                    seen_cols.add(c)
        rel = rel.map(lambda t, oc=tuple(out_cols): t.select(list(oc)))
    else:
        items = [(e, alias or _render(e)) for e, alias in core.items]
        out_cols = [n for _, n in items]
        rel = _project(rel, items, scope.resolve)

    if len(set(out_cols)) != len(out_cols):
        raise SqlError(f"duplicate output column names: {out_cols} "
                       "(use AS aliases)")
    if core.distinct:
        rel = _distinct_ds(rel, out_cols, cardinality)
    return rel, out_cols


def _compile_query(q: Query, sf_dir: str, tables, cardinality: str) -> tuple[_Rel, list[str]]:
    rel, cols = _compile_core(q.cores[0], sf_dir, tables, cardinality)
    for core in q.cores[1:]:
        r2, c2 = _compile_core(core, sf_dir, tables, cardinality)
        if c2 != cols:
            raise SqlError(f"UNION ALL column mismatch: {cols} vs {c2}")
        rel = _Rel(rel.ds.union(r2.ds), rel.zero)

    if q.order_by:
        sort_cols, desc, tmp = [], [], []
        for e, asc in q.order_by:
            if isinstance(e, Lit) and isinstance(e.value, int):
                # ORDER BY ordinal
                if not (1 <= e.value <= len(cols)):
                    raise SqlError(f"ORDER BY ordinal {e.value} out of range")
                sort_cols.append(cols[e.value - 1])
            elif isinstance(e, Col) and e.table is None and e.name in cols:
                sort_cols.append(e.name)
            else:
                name = f"__ord{len(tmp)}"
                tmp.append((e, name))
                sort_cols.append(name)
            desc.append(not asc)
        if tmp:
            def _add_ord(t: pa.Table, tmp=tuple(tmp)) -> pa.Table:
                for e, name in tmp:
                    v = _as_array(_eval(e, t, lambda c: c.name), t.num_rows)
                    if isinstance(v, pa.ChunkedArray):
                        v = v.combine_chunks()
                    t = t.append_column(name, v)
                return t
            rel = rel.map(_add_ord)
        out = rel.ds.sort(sort_cols, descending=desc)
        zero = rel.zero
        if q.limit is not None:
            out = out.limit(q.limit)
        if tmp:
            drop = tuple(n for _, n in tmp)
            out = out.map_batches(lambda t, d=drop: t.drop_columns(list(d)),
                                  batch_format="pyarrow")
            zero = zero.drop_columns(list(drop))
        rel = _Rel(out, zero)
    elif q.limit is not None:
        rel = _Rel(rel.ds.limit(q.limit), rel.zero)
    return rel, cols


def sql(
    query: str,
    sf_dir: str = ".",
    tables: dict[str, rd.Dataset] | None = None,
    cardinality: str = "low",
) -> rd.Dataset:
    """Compile and return a lazy Ray ``Dataset`` for ``query``.

    ``tables`` may pre-bind names to existing Datasets (e.g. a lake scan or
    an upstream pipeline stage); unbound names read ``{sf_dir}/{name}.parquet``
    through the pruned-scan path. ``cardinality`` sizes the aggregate /
    DISTINCT combine: ``"low"`` (default) tree-reduces partials in a single
    task (reporting-grade group counts); ``"high"`` uses the Ray groupby
    shuffle for key-per-row group spaces.
    """
    q = _Parser(query).parse()
    rel, _ = _compile_query(q, sf_dir, tables, cardinality)
    # union a 0-row carrier block so an empty result still reports its
    # schema (Ray drops empty blocks; the twin was type-checked through
    # every stage of the compile, so it IS the output schema)
    return rel.ds.union(rd.from_arrow(rel.zero))


def sql_table(
    query: str,
    sf_dir: str = ".",
    tables: dict[str, rd.Dataset] | None = None,
    cardinality: str = "low",
) -> pa.Table:
    """Run :func:`sql` and materialize the (small) result as a pyarrow
    Table. Unlike ``Dataset.to_pandas``, an EMPTY result keeps its exact
    column names and types — Ray's consumption paths drop empty blocks, so
    this falls back to the compile-time schema twin. Intended for
    reporting-grade results; a 100-TB result should be consumed with
    ``sql(...).write_parquet(...)``."""
    q = _Parser(query).parse()
    rel, _ = _compile_query(q, sf_dir, tables, cardinality)
    batches = list(rel.ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if batches:
        return pa.concat_tables(batches, promote_options="permissive")
    return rel.zero
