"""Cypher (read subset) → DataFrame compiler.

The reference's entire query surface is ~35 parameterized Cypher templates
(SURVEY §2; e.g. api/graph.py:269-276 point lookups, :197-241 neighbor
hops, :173-194 optional-match subgraph, :612-628 anti-join, :547-591
var-length paths, git_graph.py:64 ordered commit list). This module lets
a reference user run those template strings verbatim against a
PropertyGraph: a hand-rolled tokenizer + recursive-descent parser builds
a tiny pattern AST, and the compiler lowers it onto the SAME public
operators every typed endpoint uses — filters/joins for fixed-length
patterns, `operators.traversal` for `*` patterns. No optimizer of our
own: the lowered plan is plain DataFrame algebra, so Catalyst does
pushdown/pruning/join selection exactly as for the typed API.

Supported (the reference's read surface):
  MATCH (v:Label {k: $p})  [-[e:TYPE]-> (w)] , chained hops, multiple
  MATCH clauses, OPTIONAL MATCH (left-outer), path binding p=(a)-[:T*]->(b)
  WHERE: ID(v)=$x / v.prop=$x / v.prop <> < > <= >= $x / ID(v) IN $ids /
         v.prop IN $list / v.prop CONTAINS $s / STARTS WITH / IS NOT NULL /
         NOT ()-[:T]->(v) / AND and OR (AND binds tighter; the anti-join
         NOT-pattern cannot appear under OR)
  RETURN: vars, v.prop, ID(v), count(x), count(1), count(DISTINCT x),
          collect(x), sum/min/max/avg(v.prop) (numeric aggs coerce
          props-map strings);
  WITH: one aggregation stage (`WITH f, count(1) AS usage_count` — the
          reference's LLM-prompt idiom, prompts.py:24), optionally
          followed by WHERE on the aliases; an aggregate-free WITH is the
          reference's re-scoping no-op;
  UNWIND nodes(p) AS n after a var-length path (the prompt's "return
          individual node properties from a path" idiom) — n binds as a
          full node var;
  ORDER BY / SKIP / LIMIT / DISTINCT. WHERE also supports parenthesized
  boolean grouping. Keyword-shaped identifiers (a property or variable
  named `call`, `yield`, `contains`, ...) are accepted wherever the
  grammar expects a name.

Mutating clauses (MERGE/SET/DELETE) are intentionally out of scope —
writes go through the typed mutation layer (mutations/merge.py) which
implements MERGE semantics with id-return; a text front-end for writes
would only re-wrap it.

Result shape: a DataFrame whose columns are `<var>_<field>` for whole-node
returns, the expression alias otherwise — row-oriented encoding to the
reference's dict shapes is `service.api._encode_node`'s job.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# -- tokenizer ---------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<kw>(?i:OPTIONAL\s+MATCH|MATCH|WHERE|RETURN|ORDER\s+BY|LIMIT|DISTINCT|AND|OR|NOT|IN|IS|NULL|CONTAINS|STARTS\s+WITH|DESC|ASC|AS|SKIP|WITH|CALL|YIELD))(?![A-Za-z0-9_])"
    r"|(?P<num>\d+)"
    r"|(?P<param>\$[A-Za-z_]\w*)"
    r"|(?P<str>'[^']*'|\"[^\"]*\")"
    r"|(?P<name>[A-Za-z_]\w*)"
    r"|(?P<sym><-\[|\]->|\]-|-\[|<-|->|<>|<=|>=|[<>(){}:,.*=\[\]]))"
)


def _tokenize(q: str) -> list[tuple[str, str, str]]:
    """Tokens are (kind, canonical, raw): canonical is the uppercased
    keyword text the parser compares against; raw preserves source case so
    a keyword-shaped identifier (a variable or property named `call`,
    `yield`, `contains`, ...) can be recovered verbatim where the grammar
    expects a name."""
    out, i = [], 0
    q = q.strip()
    while i < len(q):
        m = _TOKEN_RE.match(q, i)
        if not m:
            raise CypherError(f"cannot tokenize at: {q[i:i+24]!r}")
        kind = m.lastgroup
        raw = m.group(kind)
        text = re.sub(r"\s+", " ", raw.upper()) if kind == "kw" else raw
        out.append((kind, text, raw))
        i = m.end()
    return out


class CypherError(ValueError):
    pass


# -- AST ---------------------------------------------------------------------

@dataclass
class NodePat:
    var: str | None
    labels: list[str] = field(default_factory=list)
    props: dict = field(default_factory=dict)  # {prop: param-or-literal}


@dataclass
class EdgePat:
    var: str | None
    etype: str | None
    direction: str  # "out" | "in"
    var_length: bool = False


@dataclass
class MatchChain:
    elements: list  # NodePat, EdgePat, NodePat, ...
    optional: bool = False
    path_var: str | None = None


@dataclass
class Cond:
    kind: str   # id_eq | prop_eq | prop_cmp | id_in | prop_in | contains |
    #             starts | notnull | no_inbound | or
    var: str | None = None
    prop: str | None = None
    value: object = None   # for kind == "or": the list of OR'd Conds
    etype: str | None = None
    op: str | None = None  # prop_cmp: one of <> < > <= >=


@dataclass
class RetItem:
    kind: str            # var | prop | id | count | collect
    var: str | None = None
    prop: str | None = None
    alias: str | None = None
    distinct: bool = False  # count(DISTINCT x)


@dataclass
class Query:
    matches: list[MatchChain]
    conds: list[Cond]
    returns: list[RetItem]
    distinct: bool = False
    order_by: tuple[str, str | None, bool] | None = None  # (var, prop, desc)
    skip: object = None   # int or $param (applied before limit)
    limit: object = None  # int or $param
    call: tuple | None = None  # (proc_name, [args], [yield names])
    with_items: list[RetItem] | None = None  # one WITH-aggregation stage
    post_conds: list[Cond] = field(default_factory=list)  # WHERE after WITH
    unwind: tuple | None = None  # (path_var, new_var) for UNWIND nodes(p)


# -- parser ------------------------------------------------------------------

class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self, k=0):
        return self.toks[self.i + k] if self.i + k < len(self.toks) else ("eof", "", "")

    def take(self, kind=None, text=None):
        t = self.peek()
        if kind and t[0] != kind or text and t[1] != text:
            raise CypherError(f"expected {text or kind}, got {t}")
        self.i += 1
        return t

    def at(self, text):
        return self.peek()[1] == text

    def take_name(self) -> str:
        """An identifier position (variable, property, label, edge type,
        alias): plain identifiers, but also tokens the tokenizer
        classified as keywords (an edge type like CONTAINS or a property
        named `call` collides with an operator/clause keyword). Returns
        the RAW source text so case is preserved."""
        t = self.peek()
        if t[0] == "name" or (t[0] == "kw" and re.fullmatch(r"[A-Za-z_]\w*", t[1])):
            self.i += 1
            return t[2]
        raise CypherError(f"expected name, got {t[:2]}")

    def at_ident(self) -> bool:
        t = self.peek()
        return t[0] == "name" or (
            t[0] == "kw" and re.fullmatch(r"[A-Za-z_]\w*", t[1]) is not None
        )

    # MATCH p=(a)-[:T*]->(b) etc.
    def parse(self) -> Query:
        matches, conds = [], []
        call = None
        with_items = None
        post_conds: list = []
        unwind = None
        while True:
            t = self.peek()
            if t[1] in ("MATCH", "OPTIONAL MATCH"):
                self.take()
                matches.extend(self._match_clause(optional=t[1] != "MATCH"))
            elif t[1] == "CALL":
                if call is not None:
                    raise CypherError("only one CALL clause supported")
                if matches:
                    # procedures here are row sources, not per-row
                    # subqueries — reordering them ahead of MATCH would
                    # silently change semantics, so reject at parse time
                    raise CypherError("CALL must precede MATCH clauses")
                self.take()
                call = self._call_clause()
            elif t[1] == "WHERE":
                self.take()
                if with_items is not None:
                    # WHERE after WITH filters the aggregated stage
                    post_conds.extend(self._where())
                else:
                    conds.extend(self._where())
            elif t[1] == "WITH":
                # ONE aggregation stage (the reference's LLM-prompt idiom
                # `WITH f, count(1) AS usage_count`, prompts.py:24); a
                # WITH with no aggregate is the reference's re-scoping
                # no-op (api/graph.py:564) and compiles to nothing
                if with_items is not None:
                    raise CypherError("only one WITH stage supported")
                self.take()
                with_items = [self._ret_item()]
                while self.at(","):
                    self.take()
                    with_items.append(self._ret_item())
            elif t[0] == "name" and t[1].upper() == "UNWIND":
                # the LLM-prompt idiom (prompts.py: "Use UNWIND ... to
                # return individual node properties from a path"):
                # UNWIND nodes(p) AS n — other list sources are the
                # mutation templates' $param lists, which the typed
                # mutation layer handles (graph.py:295,417)
                if unwind is not None:
                    raise CypherError("only one UNWIND supported")
                self.take()
                fn = self.take_name()
                if fn.lower() != "nodes":
                    raise CypherError("only UNWIND nodes(path) supported")
                self.take(text="(")
                src_var = self.take_name()
                self.take(text=")")
                self.take(text="AS")
                unwind = (src_var, self.take_name())
            elif t[1] == "RETURN":
                self.take()
                q = self._returns(matches, conds)
                q.call = call
                q.with_items = with_items
                q.post_conds = post_conds
                q.unwind = unwind
                return q
            else:
                raise CypherError(f"unexpected {t[:2]}")

    def _call_clause(self) -> tuple:
        # CALL dotted.proc.name(arg, ...) YIELD name [, name ...]
        parts = [self.take_name()]
        while self.at("."):
            self.take()
            parts.append(self.take_name())
        proc = ".".join(parts)
        self.take(text="(")
        args = []
        if not self.at(")"):
            args.append(self._value())
            while self.at(","):
                self.take()
                args.append(self._value())
        self.take(text=")")
        self.take(text="YIELD")
        yields = [self.take_name()]
        while self.at(","):
            self.take()
            yields.append(self.take_name())
        return (proc, args, yields)

    def _match_clause(self, optional) -> list[MatchChain]:
        chains = [self._chain(optional)]
        while self.at(","):
            self.take()
            chains.append(self._chain(optional))
        return chains

    def _chain(self, optional) -> MatchChain:
        path_var = None
        if self.peek()[0] == "name" and self.peek(1)[1] == "=":
            path_var = self.take()[1]
            self.take(text="=")
        elements = [self._node()]
        while self.peek()[1] in ("-[", "<-["):
            elements.append(self._edge())
            elements.append(self._node())
        return MatchChain(elements, optional=optional, path_var=path_var)

    def _node(self) -> NodePat:
        self.take(text="(")
        var = None
        labels: list[str] = []
        props: dict = {}
        if self.at_ident():
            var = self.take_name()
        while self.at(":"):
            self.take()
            labels.append(self.take_name())
        if self.at("{"):
            self.take()
            while not self.at("}"):
                k = self.take_name()
                self.take(text=":")
                props[k] = self._value()
                if self.at(","):
                    self.take()
            self.take(text="}")
        self.take(text=")")
        return NodePat(var, labels, props)

    def _edge(self) -> EdgePat:
        opener = self.take()[1]  # -[ or <-[
        var = None
        etype = None
        var_len = False
        if self.at_ident():
            var = self.take_name()
        if self.at(":"):
            self.take()
            etype = self.take_name()
        if self.at("*"):
            self.take()
            var_len = True
        closer = self.take()[1]  # ]-> or ]-
        if opener == "-[" and closer == "]->":
            direction = "out"
        elif opener == "<-[" and closer == "]-":
            direction = "in"
        else:
            raise CypherError(f"unsupported edge direction {opener}..{closer}")
        return EdgePat(var, etype, direction, var_len)

    def _value(self):
        t = self.peek()
        if t[0] == "param":
            self.take()
            return t[1]
        if t[0] == "num":
            self.take()
            return int(t[1])
        if t[0] == "str":
            self.take()
            return t[1][1:-1]
        raise CypherError(f"unsupported value {t}")

    def _where(self) -> list[Cond]:
        """Cypher precedence: AND binds tighter than OR —
        `a AND b OR c` is `(a AND b) OR c`; parentheses group freely.
        The returned list is the top-level AND conjunction the executor
        chains as filters (important: a top-level anti-join NOT-pattern
        stays its own conjunct)."""
        top = self._or_expr()
        if top.kind == "and":
            return top.value
        return [top]

    def _or_expr(self) -> Cond:
        alts = [self._and_expr()]
        while self.at("OR"):
            self.take()
            alts.append(self._and_expr())
        return alts[0] if len(alts) == 1 else Cond("or", value=alts)

    def _and_expr(self) -> Cond:
        items = [self._primary_cond()]
        while self.at("AND"):
            self.take()
            items.append(self._primary_cond())
        return items[0] if len(items) == 1 else Cond("and", value=items)

    def _primary_cond(self) -> Cond:
        # a leading "(" here is unambiguous grouping: bare conditions
        # start with NOT / ID( / a name, never "("
        if self.at("("):
            self.take()
            inner = self._or_expr()
            self.take(text=")")
            return inner
        return self._cond()

    def _cond(self) -> Cond:
        t = self.peek()
        if t[1] == "NOT":  # NOT ()-[:T]->(v)
            self.take()
            self.take(text="(")
            self.take(text=")")
            e = self._edge()
            n = self._node()
            if e.direction != "out" or n.var is None:
                raise CypherError("unsupported NOT pattern")
            return Cond("no_inbound", var=n.var, etype=e.etype)
        if t[0] == "name" and t[1].upper() == "ID":
            self.take()
            self.take(text="(")
            var = self.take("name")[1]
            self.take(text=")")
            if self.at("="):
                self.take()
                return Cond("id_eq", var=var, value=self._value())
            self.take(text="IN")
            return Cond("id_in", var=var, value=self._value())
        var = self.take_name()
        if not self.at("."):
            # bare-name comparison: a WITH-stage alias (`usage_count > 2`)
            nxt = self.peek()
            if nxt[1] in ("=", "<>", "<", ">", "<=", ">="):
                op = self.take()[1]
                return Cond("scalar_cmp", var=var, value=self._value(), op=op)
            raise CypherError(f"unsupported condition after {var}: {nxt[:2]}")
        self.take(text=".")
        prop = self.take_name()
        nxt = self.peek()
        if nxt[1] == "=":
            self.take()
            return Cond("prop_eq", var=var, prop=prop, value=self._value())
        if nxt[1] in ("<>", "<", ">", "<=", ">="):
            self.take()
            return Cond(
                "prop_cmp", var=var, prop=prop, value=self._value(), op=nxt[1]
            )
        if nxt[1] == "IN":
            self.take()
            return Cond("prop_in", var=var, prop=prop, value=self._value())
        if nxt[1] == "CONTAINS":
            self.take()
            return Cond("contains", var=var, prop=prop, value=self._value())
        if nxt[1] == "STARTS WITH":
            self.take()
            return Cond("starts", var=var, prop=prop, value=self._value())
        if nxt[1] == "IS":
            self.take()
            if self.at("NOT"):
                self.take()
                self.take(text="NULL")
                return Cond("notnull", var=var, prop=prop)
            raise CypherError("IS NULL unsupported (reference never uses it)")
        raise CypherError(f"unsupported condition after {var}.{prop}: {nxt}")

    def _returns(self, matches, conds) -> Query:
        distinct = False
        if self.at("DISTINCT"):
            self.take()
            distinct = True
        items = [self._ret_item()]
        while self.at(","):
            self.take()
            items.append(self._ret_item())
        order_by = None
        limit = None
        if self.at("ORDER BY"):
            self.take()
            var = self.take_name()
            prop = None
            if self.at("."):
                self.take()
                prop = self.take_name()
            desc = False
            if self.peek()[1] in ("ASC", "DESC"):
                desc = self.take()[1] == "DESC"
            order_by = (var, prop, desc)
        skip = None
        if self.at("SKIP"):
            self.take()
            skip = self._value()
        if self.at("LIMIT"):
            self.take()
            limit = self._value()
        if self.peek()[0] != "eof":
            raise CypherError(f"trailing tokens: {self.peek()}")
        return Query(matches, conds, items, distinct, order_by, skip, limit)

    def _ret_item(self) -> RetItem:
        t = self.peek()
        if t[0] == "name" and t[1].lower() in ("count", "collect") and self.peek(1)[1] == "(":
            fn = self.take()[1].lower()
            self.take(text="(")
            cdistinct = False
            if fn == "count" and self.at("DISTINCT"):
                self.take()
                cdistinct = True
            if fn == "count" and (self.at("*") or self.peek()[0] == "num"):
                # count(*) and the prompt idiom count(1) both count rows
                self.take()
                var = None
            else:
                var = self.take_name()
            self.take(text=")")
            item = RetItem(fn, var=var, distinct=cdistinct)
        elif (t[0] == "name" and t[1].lower() in ("sum", "min", "max", "avg")
              and self.peek(1)[1] == "("):
            fn = self.take()[1].lower()
            self.take(text="(")
            var = self.take_name()
            self.take(text=".")
            prop = self.take_name()
            self.take(text=")")
            item = RetItem(fn, var=var, prop=prop)
        elif t[0] == "name" and t[1].upper() == "ID" and self.peek(1)[1] == "(":
            self.take()
            self.take(text="(")
            var = self.take_name()
            self.take(text=")")
            item = RetItem("id", var=var)
        else:
            var = self.take_name()
            if self.at("."):
                self.take()
                prop = self.take_name()
                item = RetItem("prop", var=var, prop=prop)
            else:
                item = RetItem("var", var=var)
        if self.at("AS"):
            self.take()
            item.alias = self.take_name()
        return item


def parse_cypher(query: str) -> Query:
    return _Parser(_tokenize(query)).parse()


# -- compiler ----------------------------------------------------------------

NODE_FIELDS = ["id", "labels", "name", "path", "ext", "src_start",
               "src_end", "doc", "props", "coverage"]
EDGE_FIELDS = ["src", "dst", "type", "props"]

# Reference-property → storage-column mapping (SURVEY §1.2: the commit
# node's `hash` IS our `name`; `coverage_precentage` [sic] is `coverage`).
# Lets git templates like `(c:Commit {hash: $h})` run verbatim.
PROP_ALIASES = {"hash": "name", "coverage_precentage": "coverage"}


def _prop_col(prop: str) -> str:
    return PROP_ALIASES.get(prop, prop)


def _resolve(value, params: dict):
    if isinstance(value, str) and value.startswith("$"):
        if value[1:] not in params:
            raise CypherError(f"missing parameter {value}")
        return params[value[1:]]
    return value


def _node_df(graph, pat: NodePat, params) -> DataFrame:
    df = graph.nodes
    for lbl in pat.labels:
        df = df.filter(F.array_contains("labels", lbl))
    for k, v in pat.props.items():
        df = df.filter(F.col(_prop_col(k)) == F.lit(_resolve(v, params)))
    return df


def _prefix(df: DataFrame, var: str, fields) -> DataFrame:
    return df.select(*[F.col(c).alias(f"{var}_{c}") for c in fields])


class _Binder:
    """Progressively-joined binding table: one column set per bound var."""

    def __init__(self, graph, params):
        self.graph = graph
        self.params = params
        self.df: DataFrame | None = None
        self.vars: dict[str, str] = {}  # var -> "node" | "edge"
        self._anon = 0

    def gensym(self) -> str:
        self._anon += 1
        return f"_anon{self._anon}"

    def col(self, var: str, f: str) -> Column:
        return F.col(f"{var}_{f}")

    def prop(self, var: str, prop: str) -> Column:
        """A property access: direct column when the field exists on the
        entity, `props[key]` map access otherwise (FalkorDB stores ad-hoc
        properties exactly so — e.g. the CALLS/CONTAINS `pos`)."""
        f = _prop_col(prop)
        fields = EDGE_FIELDS if self.vars.get(var) == "edge" else NODE_FIELDS
        if f in fields:
            return self.col(var, f)
        return self.col(var, "props").getItem(f)

    def add_node(self, pat: NodePat, join_on: tuple[Column, str] | None,
                 optional: bool) -> str:
        var = pat.var or self.gensym()
        if var in self.vars:
            # re-reference of an already-bound var: apply extra filters
            df = self.df
            for lbl in pat.labels:
                df = df.filter(F.array_contains(self.col(var, "labels"), lbl))
            for k, v in pat.props.items():
                df = df.filter(
                    self.prop(var, k) == F.lit(_resolve(v, self.params)))
            self.df = df
            return var
        nd = _prefix(_node_df(self.graph, pat, self.params), var, NODE_FIELDS)
        if self.df is None:
            self.df = nd
        elif join_on is None:
            self.df = self.df.crossJoin(nd)
        else:
            left_col, right_field = join_on
            self.df = self.df.join(
                nd, left_col == F.col(f"{var}_{right_field}"),
                "left_outer" if optional else "inner",
            )
        self.vars[var] = "node"
        return var


def run_cypher(graph, query: str, params: dict | None = None) -> DataFrame:
    """Execute a read-only Cypher template against a PropertyGraph."""
    params = params or {}
    q = parse_cypher(query)
    b = _Binder(graph, params)

    if q.call is not None:
        _bind_call(b, q.call, params)

    var_length_chain = None
    for chain in q.matches:
        if any(isinstance(e, EdgePat) and e.var_length for e in chain.elements):
            if var_length_chain is not None:
                raise CypherError("only one var-length pattern supported")
            var_length_chain = chain
            continue
        _compile_chain(b, chain, params)

    # WHERE conditions that SEED a var-length pattern must bind before it
    if b.df is not None:
        for c in q.conds:
            b.df = _apply_cond(b, c)

    if var_length_chain is not None:
        if q.with_items and any(r.kind in _AGG_KINDS for r in q.with_items):
            raise CypherError("WITH aggregation over a var-length pattern unsupported")
        return _compile_var_length(b, var_length_chain, q, params)

    if q.unwind is not None:
        raise CypherError("UNWIND nodes(p) requires a var-length path p")

    if q.with_items:
        _apply_with(b, q.with_items)
    for c in q.post_conds:
        b.df = _apply_cond(b, c)

    return _project(b, q, params)


def _bind_call(b: _Binder, call: tuple, params) -> None:
    """Execute a CALL procedure and bind its YIELD columns.

    Parity surface: `db.idx.fulltext.queryNodes` is the ONE procedure the
    reference's templates use (api/graph.py:345, the auto-complete
    endpoint) — that template now runs verbatim. `algo.pageRank` /
    `algo.wcc` are the FalkorDB server-side analytics procedures
    (parity-in-kind: the reference's store exposes them even though its
    templates don't call them), lowered onto the verified kernels the
    typed queries use: pagerank over the (label, relationship)-restricted
    subgraph, and wcc onto the FIXPOINT component kernel
    (operators/components.py — bounded rounds would split
    large-diameter components). Node yields bind like a MATCH var
    (joinable, RETURN-able whole); scalar yields (score/componentId)
    bind as plain columns. CALL/YIELD tokenize as keywords, but the
    parser accepts keyword-shaped tokens wherever the grammar expects an
    identifier, so `call`/`yield` as variable or property names still
    parse (only clause-head positions treat them as keywords)."""
    proc, args, yields = call
    name = proc.lower()
    if name == "db.idx.fulltext.querynodes":
        # RediSearch-faithful TOKEN-LEVEL prefix matching: the name is
        # whitespace-tokenized and the query (one trailing '*' stripped)
        # prefix-matches ANY token — a node named 'my Customer' matches
        # 'Customer*', as it does on the reference's store. Exactly
        # whole-name-startswith for single-token names (the reference's
        # entities, api/graph.py:345), a superset for multi-token ones.
        # Documented residual narrowing: RediSearch's richer query
        # syntax (boolean operators, fields, fuzzy) is not parsed, and
        # `YIELD node, score` returns the nominal
        # 1/(1+|name|-|prefix|) length-closeness (longer completions
        # rank lower), not a BM25.
        if len(args) != 2 or not 1 <= len(yields) <= 2:
            raise CypherError("queryNodes(label, query) YIELD node [, score]")
        label = str(_resolve(args[0], params))
        qstr = str(_resolve(args[1], params))
        prefix = qstr[:-1] if qstr.endswith("*") else qstr
        var = yields[0]
        nd = (
            b.graph.nodes.filter(F.array_contains("labels", label))
            .filter(
                F.exists(
                    F.split(F.col("name"), " "),
                    lambda t: t.startswith(F.lit(prefix)),
                )
            )
            .orderBy("name", "id")
        )
        b.df = _prefix(nd, var, NODE_FIELDS)
        b.vars[var] = "node"
        if len(yields) == 2:
            score_var = yields[1]
            b.df = b.df.withColumn(
                score_var,
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.length(b.col(var, "name")) - F.lit(len(prefix)))
                ).cast("double"),
            )
            b.vars[score_var] = "scalar"
        return
    if name == "algo.scc":
        # Beyond-parity sibling of algo.wcc for DIRECTED subgraphs
        # (mutual recursion over CALLS edges), lowered onto the verified
        # bounded kernel (operators/scc.py). YIELD node, sccId: confirmed
        # members carry their SCC's min node id, trimmed singletons their
        # own id, unresolved -1 (the kernel's honest round-budget
        # residual).
        if len(yields) != 2:
            raise CypherError("algo.scc YIELD node, sccId")
        node_var, val_var = yields
        nodes, edges = b.graph.nodes, b.graph.edges
        if len(args) >= 1 and args[0]:
            label = str(_resolve(args[0], params))
            nodes = nodes.filter(F.array_contains("labels", label))
            ids = nodes.select(F.col("id"))
            edges = edges.join(
                ids.withColumnRenamed("id", "src"), "src", "semi"
            ).join(ids.withColumnRenamed("id", "dst"), "dst", "semi")
        if len(args) >= 2 and args[1]:
            edges = edges.filter(F.col("type") == str(_resolve(args[1], params)))
        from .operators.scc import scc_bounded

        res = scc_bounded(b.graph.spark, edges.select("src", "dst"))
        nd = _prefix(nodes, node_var, NODE_FIELDS)
        b.df = nd.join(
            res.select(
                F.col("node").alias(f"{node_var}_id"),
                F.col("scc_id").alias(val_var),
            ),
            f"{node_var}_id",
            # nodes with no edges at all have no kernel row: singletons
            "left",
        ).withColumn(
            val_var, F.coalesce(F.col(val_var), F.col(f"{node_var}_id"))
        )
        b.vars[node_var] = "node"
        b.vars[val_var] = "scalar"
        return
    if name in ("algo.pagerank", "algo.wcc"):
        if len(yields) != 2:
            raise CypherError(f"{proc} YIELD node, value")
        node_var, val_var = yields
        nodes, edges = b.graph.nodes, b.graph.edges
        # FalkorDB's procedure signature is (label, relationshipType) —
        # both restrict the subgraph the algorithm runs over
        if len(args) >= 1 and args[0]:
            label = str(_resolve(args[0], params))
            nodes = nodes.filter(F.array_contains("labels", label))
            ids = nodes.select(F.col("id"))
            edges = edges.join(
                ids.withColumnRenamed("id", "src"), "src", "semi"
            ).join(ids.withColumnRenamed("id", "dst"), "dst", "semi")
        if len(args) >= 2 and args[1]:
            edges = edges.filter(F.col("type") == str(_resolve(args[1], params)))
        if name == "algo.pagerank":
            from .operators.pagerank import pagerank

            res = pagerank(b.graph.spark, nodes, edges)
            val = F.col("rank")
        else:
            # true weakly-connected components need the FIXPOINT kernel
            # (alternating star, operators/components.py) — a bounded
            # round count would split large-diameter components
            from .operators.components import connected_components

            und = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
            cc = connected_components(b.graph.spark, und, "src", "dst")
            res = (
                nodes.select(F.col("id").alias("node"))
                .join(cc, "node", "left")
                .select(
                    "node",
                    F.coalesce("component", F.col("node")).alias("comp"),
                )
            )
            val = F.col("comp")
        nd = _prefix(nodes, node_var, NODE_FIELDS)
        b.df = nd.join(
            res.select(F.col("node").alias(f"{node_var}_id"), val.alias(val_var)),
            f"{node_var}_id",
        )
        b.vars[node_var] = "node"
        b.vars[val_var] = "scalar"
        return
    raise CypherError(f"unknown procedure {proc}")


def _compile_chain(b: _Binder, chain: MatchChain, params):
    els = chain.elements
    prev_var = b.add_node(els[0], None, optional=False)
    i = 1
    while i < len(els):
        edge: EdgePat = els[i]
        node: NodePat = els[i + 1]
        evar = edge.var or b.gensym()
        e = b.graph.edges
        if edge.etype:
            e = e.filter(F.col("type") == edge.etype)
        ed = _prefix(e, evar, EDGE_FIELDS)
        near, far = ("src", "dst") if edge.direction == "out" else ("dst", "src")
        how = "left_outer" if chain.optional else "inner"
        if b.df is None:
            raise CypherError("edge before any node binding")
        b.df = b.df.join(
            ed, b.col(prev_var, "id") == F.col(f"{evar}_{near}"), how
        )
        b.vars[evar] = "edge"
        prev_var = b.add_node(
            node, (F.col(f"{evar}_{far}"), "id"), optional=chain.optional
        )
        i += 2


def _cond_column(b: _Binder, c: Cond) -> Column:
    """A condition as a boolean Column — for every kind except the
    anti-join-shaped `no_inbound`, which has no Column form."""
    if c.kind == "id_eq":
        return b.col(c.var, "id") == F.lit(_resolve(c.value, b.params))
    if c.kind == "id_in":
        vals = [int(x) for x in _resolve(c.value, b.params)]
        return b.col(c.var, "id").isin(vals)
    if c.kind == "prop_eq":
        return b.prop(c.var, c.prop) == F.lit(_resolve(c.value, b.params))
    if c.kind == "prop_cmp":
        v = _resolve(c.value, b.params)
        col = b.prop(c.var, c.prop)
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            # numeric comparison regardless of storage type (props-map
            # values are strings); Cypher compares numerically when the
            # literal is a number
            col = col.cast("double")
        ops = {
            "<>": col != F.lit(v), "<": col < F.lit(v), ">": col > F.lit(v),
            "<=": col <= F.lit(v), ">=": col >= F.lit(v),
        }
        return ops[c.op]
    if c.kind == "prop_in":
        return b.prop(c.var, c.prop).isin(list(_resolve(c.value, b.params)))
    if c.kind == "contains":
        return b.prop(c.var, c.prop).contains(_resolve(c.value, b.params))
    if c.kind == "starts":
        return b.prop(c.var, c.prop).startswith(_resolve(c.value, b.params))
    if c.kind == "notnull":
        return b.prop(c.var, c.prop).isNotNull()
    if c.kind == "scalar_cmp":
        # bare-name comparison against a WITH-stage alias / YIELD column
        if b.vars.get(c.var) != "scalar":
            raise CypherError(f"{c.var} is not a scalar binding")
        v = _resolve(c.value, b.params)
        col = F.col(c.var)
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            col = col.cast("double")
        ops = {
            "=": col == F.lit(v), "<>": col != F.lit(v), "<": col < F.lit(v),
            ">": col > F.lit(v), "<=": col <= F.lit(v), ">=": col >= F.lit(v),
        }
        return ops[c.op]
    if c.kind == "and":
        out = None
        for alt in c.value:
            col = _cond_column(b, alt)
            out = col if out is None else (out & col)
        return out
    if c.kind == "or":
        out = None
        for alt in c.value:
            col = _cond_column(b, alt)
            out = col if out is None else (out | col)
        return out
    if c.kind == "no_inbound":
        raise CypherError(
            "NOT ()-[:T]->(v) cannot appear inside OR (it compiles to an "
            "anti-join, not a row predicate)"
        )
    raise CypherError(f"unsupported condition {c.kind}")


def _apply_cond(b: _Binder, c: Cond) -> DataFrame:
    df = b.df
    if c.kind == "no_inbound":
        e = b.graph.edges
        if c.etype:
            e = e.filter(F.col("type") == c.etype)
        tgt = e.select(F.col("dst").alias(f"{c.var}_id"))
        return df.join(tgt, f"{c.var}_id", "left_anti")
    return df.filter(_cond_column(b, c))


def _compile_var_length(b: _Binder, chain: MatchChain, q: Query, params):
    """p=(src)-[:T*]->(dest): endpoints must already be bound to single
    ids (the reference always anchors both, api/graph.py:564-569) — or the
    pattern is a reachability/closure scan with one anchor (api/graph.py:
    408-426)."""
    from .operators.traversal import find_paths

    a, e, c = chain.elements
    if e.direction != "out":
        raise CypherError("var-length only supported left-to-right")

    def _single_id(var):
        if b.df is None or var not in b.vars:
            return None
        rows = b.df.select(b.col(var, "id")).distinct().limit(2).collect()
        return int(rows[0][0]) if len(rows) == 1 else None

    src_id = _single_id(a.var) if a.var else None
    dst_id = _single_id(c.var) if c.var else None
    if src_id is None or dst_id is None:
        raise CypherError("var-length pattern needs both endpoints bound to single ids")
    paths = find_paths(b.graph.spark, b.graph.edges, src_id, dst_id,
                       edge_type=e.etype, max_depth=12)
    pvar = chain.path_var or "p"
    if q.unwind is not None:
        # UNWIND nodes(p) AS n: per-path expansion of the node-id array,
        # rebound as a full node var so RETURN n / n.prop / ID(n) and the
        # aggregate forms all work (the LLM-prompt idiom). Path order is
        # preserved per row via posexplode; duplicates across paths stay,
        # as Cypher's per-row UNWIND semantics require.
        src_var, new_var = q.unwind
        if src_var != pvar:
            raise CypherError(f"UNWIND nodes({src_var}): unknown path {src_var}")
        ex = paths.select(
            F.posexplode(F.col("path")).alias("_pos", "_nid")
        )
        nd = _prefix(b.graph.nodes, new_var, NODE_FIELDS)
        b2 = _Binder(b.graph, params)
        b2.df = ex.join(nd, F.col("_nid") == F.col(f"{new_var}_id")).drop("_nid")
        b2.vars = {new_var: "node"}
        if q.with_items:
            _apply_with(b2, q.with_items)
        for cnd in q.post_conds:
            b2.df = _apply_cond(b2, cnd)
        return _project(b2, q, params)
    out = paths.select(F.col("path").alias(f"{pvar}_nodes"),
                       F.col("depth").alias(f"{pvar}_depth"))
    if q.limit is not None:
        out = out.limit(int(_resolve(q.limit, params)))
    return out


_AGG_KINDS = ("count", "collect", "sum", "min", "max", "avg")


def _agg_alias(r: RetItem) -> str:
    if r.alias:
        return r.alias
    if r.kind in ("sum", "min", "max", "avg"):
        return f"{r.kind}_{r.var}_{r.prop}"
    if r.kind == "count":
        return f"count_{r.var or 'all'}"
    return f"collect_{r.var}"


def _agg_expr(b: _Binder, r: RetItem) -> Column:
    """One aggregate RetItem as an aliased aggregate Column (shared by the
    RETURN aggregation and the WITH stage)."""
    if r.var is not None and r.var not in b.vars:
        raise CypherError(f"unbound aggregate var {r.var}")
    if r.kind in ("sum", "min", "max", "avg"):
        target = b.prop(r.var, r.prop)
        if r.kind in ("sum", "avg"):
            # props-map values arrive as strings; numeric aggs
            # coerce like openCypher's numeric sum/avg
            target = target.cast("double")
        fn = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}[r.kind]
        return fn(target).alias(_agg_alias(r))
    if r.kind == "count":
        if r.var is None:
            target = F.lit(1)
        else:
            kind = b.vars.get(r.var, "node")
            if kind == "scalar":  # CALL ... YIELD value column
                target = F.col(r.var)
            else:
                target = b.col(r.var, "id" if kind == "node" else "src")
        agg = F.count_distinct(target) if r.distinct else F.count(target)
        return agg.alias(_agg_alias(r))
    kind = b.vars.get(r.var, "node")
    fields = NODE_FIELDS if kind == "node" else EDGE_FIELDS
    return F.collect_list(
        F.struct(*[b.col(r.var, f).alias(f) for f in fields])
    ).alias(_agg_alias(r))


def _apply_with(b: _Binder, items: list[RetItem]) -> None:
    """ONE WITH-aggregation stage (`WITH f, count(1) AS usage_count`,
    reference prompts.py:24): group by the non-aggregate items, compute
    the aggregates, and rebind the scope — key node/edge vars stay whole
    (grouped on identity, remaining fields carried with first(), exact
    because they are functionally dependent on the key), aggregates bind
    as scalar columns under their alias. A WITH with no aggregate is the
    reference's re-scoping no-op (api/graph.py:564) and compiles away."""
    aggs = [r for r in items if r.kind in _AGG_KINDS]
    if not aggs:
        return
    if b.df is None:
        raise CypherError("WITH aggregation before any MATCH binding")
    keys = [r for r in items if r.kind not in _AGG_KINDS]
    gcols: list[Column] = []
    carry: list[tuple[str, str]] = []
    newvars: dict[str, str] = {}
    for r in keys:
        if r.kind == "var":
            kind = b.vars.get(r.var)
            if kind is None:
                raise CypherError(f"unbound WITH var {r.var}")
            if kind == "scalar":
                gcols.append(F.col(r.var))
                newvars[r.var] = "scalar"
            elif kind == "node":
                gcols.append(b.col(r.var, "id"))
                carry.extend((r.var, f) for f in NODE_FIELDS if f != "id")
                newvars[r.var] = "node"
            else:  # edge identity is (src, dst, type)
                gcols.extend(b.col(r.var, f) for f in ("src", "dst", "type"))
                carry.append((r.var, "props"))
                newvars[r.var] = "edge"
        elif r.kind == "prop":
            alias = r.alias or f"{r.var}_{r.prop}"
            gcols.append(b.prop(r.var, r.prop).alias(alias))
            newvars[alias] = "scalar"
        elif r.kind == "id":
            alias = r.alias or f"id_{r.var}"
            gcols.append(b.col(r.var, "id").alias(alias))
            newvars[alias] = "scalar"
        else:
            raise CypherError(f"unsupported WITH item {r.kind}")
    carry_exprs = [
        F.first(F.col(f"{v}_{f}")).alias(f"{v}_{f}") for v, f in carry
    ]
    exprs = carry_exprs + [_agg_expr(b, r) for r in aggs]
    b.df = b.df.groupBy(*gcols).agg(*exprs) if gcols else b.df.agg(*exprs)
    for r in aggs:
        newvars[_agg_alias(r)] = "scalar"
    b.vars = newvars


def _project(b: _Binder, q: Query, params) -> DataFrame:
    df = b.df
    if df is None:
        raise CypherError("nothing matched/bound")

    aggs = [r for r in q.returns if r.kind in _AGG_KINDS]
    if aggs:
        keys = [r for r in q.returns if r.kind not in _AGG_KINDS]
        exprs = [_agg_expr(b, r) for r in aggs]
        if keys:
            kcols = []
            for r in keys:
                kcols.extend(_ret_cols(b, r))
            df = df.groupBy(*kcols).agg(*exprs)
        else:
            df = df.agg(*exprs)
    else:
        cols = []
        for r in q.returns:
            cols.extend(_ret_cols(b, r))
        # a WITH-stage alias used only for ordering (`WITH f, count(1) AS
        # usage_count RETURN f ORDER BY usage_count` — the reference's
        # most-called idiom) must survive the projection: carry it
        # through and drop it after the sort
        sort_carry = None
        if q.order_by is not None and not q.order_by[1]:
            ob_var = q.order_by[0]
            names = set()
            for r in q.returns:
                if r.kind == "var":
                    names.add(r.alias or r.var)
                else:
                    names.add(r.alias or "")
            if ob_var not in names and ob_var in df.columns:
                cols.append(F.col(ob_var))
                sort_carry = ob_var
        df = df.select(*cols)
        if q.distinct:
            df = df.distinct()

    if q.order_by is not None:
        var, prop, desc = q.order_by
        cname = f"{var}_{_prop_col(prop)}" if prop else var
        # ORDER BY over the reference's int-epoch props map (git_graph.py:64)
        if prop == "date" and f"{var}_props" in df.columns:
            col = b.col(var, "props").getItem("date").cast("long")
        elif cname in df.columns:
            col = F.col(cname)
        else:
            # the sort key must survive projection/aggregation (RETURN
            # count(n) ORDER BY n.name is invalid in Cypher too)
            raise CypherError(f"ORDER BY {var}.{prop or ''} not in RETURN scope")
        df = df.orderBy(col.desc() if desc else col.asc())
        if sort_carry is not None:
            df = df.drop(sort_carry)
    if q.skip is not None:
        df = df.offset(int(_resolve(q.skip, params)))
    if q.limit is not None:
        df = df.limit(int(_resolve(q.limit, params)))
    return df


def _ret_cols(b: _Binder, r: RetItem) -> list[Column]:
    if r.kind == "var":
        kind = b.vars.get(r.var)
        if kind is None:
            raise CypherError(f"unbound return var {r.var}")
        if kind == "scalar":  # a CALL ... YIELD value column
            return [F.col(r.var).alias(r.alias or r.var)]
        fields = NODE_FIELDS if kind == "node" else EDGE_FIELDS
        return [b.col(r.var, f) for f in fields]
    if r.kind == "prop":
        return [b.col(r.var, _prop_col(r.prop)).alias(r.alias or f"{r.var}_{r.prop}")]
    if r.kind == "id":
        return [b.col(r.var, "id").alias(r.alias or f"id_{r.var}")]
    raise CypherError(f"unsupported return item {r.kind}")
