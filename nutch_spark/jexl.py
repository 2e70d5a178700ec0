"""JEXL expressions (T14) compiled to Spark Column expressions.

The reference evaluates user-supplied Apache Commons JEXL3 scripts at
four sites — ``generate -expr`` (``crawl/Generator.java``), ``readdb
-dump -expr`` (``crawl/CrawlDbReader.java``), ``readhostdb -expr``
(``hostdb/ReadHostDb.java``) and the ``index-jexl-filter`` plugin
(``indexer/jexl/JexlIndexingFilter.java:44-128``) — all through
``util/JexlUtil.java:50-77``, which first rewrites ISO-8601 date
literals (``2016-03-20T00:00:00Z``) to epoch milliseconds and then
compiles with ``JexlBuilder().silent(true).strict(true)``.

This module is the real-JEXL upgrade of the repo's earlier T14
substitution (Spark-SQL expr strings): a recursive-descent parser for
the JEXL subset those call sites use, compiled straight to a Spark
``Column`` so the filter stays inside Catalyst/whole-stage codegen —
never a Python UDF.

Supported grammar (JEXL3 Parser.jjt precedence, highest binds last)::

    expr     := ternary
    ternary  := or ('?' expr ':' expr | '?:' expr)?
    or       := and   (('||' | 'or')  and)*
    and      := eq    (('&&' | 'and') eq)*
    eq       := rel   (('==' | '!=' | 'eq' | 'ne') rel)*
    rel      := add   (('<' '<=' '>' '>=' 'lt' 'le' 'gt' 'ge'
                        '=~' '!~') add)*
    add      := mul   (('+' | '-') mul)*
    mul      := unary (('*' | '/' | '%' | 'div' | 'mod') unary)*
    unary    := ('!' | 'not' | '-') unary | postfix
    postfix  := primary ('.' IDENT | '[' expr ']')*
    primary  := NUMBER | STRING | 'true' | 'false' | 'null'
              | IDENT | '(' expr ')'

Semantics mapping (each a documented, test-pinned choice):

- ``==``/``eq`` compile to ``eqNullSafe``: JEXL evaluates ``null ==
  null`` to true and ``x == null`` as a null test, which Spark's
  plain ``=`` (three-valued) would get wrong.
- The reference builds its engine ``strict(true).silent(true)`` and
  every call site keeps a row only on ``Boolean.TRUE.equals(result)``
  (JexlIndexingFilter.java:95-102, CrawlDatum.java:609-612): type
  errors and null propagation collapse to "drop the row". Spark's
  NULL propagation plus an ``IS TRUE`` gate lands in exactly the same
  place, so compiled filters use ``jexl_filter_column`` (`<col> <=> true`).
- ``=~`` / ``!~`` with a *literal string* right operand is Java
  ``String.matches`` (whole-string): compiled to an anchored
  ``rlike('^(?:pat)$')``. Non-literal patterns raise (the reference's
  sites only ever pass literals).
- ``a ?: b`` (elvis) compiles to ``coalesce(a, b)`` — the null
  branch of JEXL's "null or false" rule; the boolean-false branch
  would need runtime type dispatch and no reference expression uses
  it on booleans.
- Arithmetic is numeric-only (JEXL's string ``+`` concatenation is
  not supported; none of the reference's filter expressions build
  strings), and ``/`` follows Spark's fractional division: JEXL's
  JexlArithmetic divides two integers integrally (``3/2 == 1``), but
  operand types aren't knowable at compile time here — write
  ``floor(a / b)`` when integer division is meant.
- ``a || b`` replays JEXL's left-to-right strictness: a null left
  operand aborts the script (row dropped) even when the right side is
  true, while a true left short-circuits before a null right can
  (compiled as ``when(a IS NULL, NULL).otherwise(a OR b)``). ``&&``
  gets the symmetric wrapper: Spark's three-valued AND turns
  ``NULL && FALSE`` into FALSE where strict JEXL errors the script to
  null — indistinguishable under the ``IS TRUE`` row gate but
  observable when ``&&`` feeds a ternary condition or value context
  (e.g. hostdb JEXL overrides). ``!`` needs no wrapper.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from typing import Callable, Mapping, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class JexlError(ValueError):
    """Raised for unparsable or unsupported JEXL input. The reference
    surfaces this as parseExpression()->null, which every caller
    promotes to a hard error (JexlIndexingFilter.setConf:118-122)."""


# ---------------------------------------------------------------------------
# Date rewrite — JexlUtil.java:56-67
# ---------------------------------------------------------------------------

_DATE_PATTERN = re.compile(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z")


def rewrite_dates(expr: str) -> str:
    """Replace the FIRST ISO date found (and, like Java's
    ``String.replace``, every other occurrence of that exact
    substring) with its epoch-millisecond value. A second *distinct*
    date literal is left in place — faithfully mirroring the single
    ``matcher.find()`` in JexlUtil.java:58; there it then fails JEXL
    parsing, here it raises at tokenize time.

    Deviation: the date parses as UTC. The reference's pattern quotes
    the ``'Z'`` (JexlUtil.java:62), so DateUtils parses in the JVM's
    *default* timezone — a latent upstream quirk; the literal's own
    ``Z`` says UTC, so UTC is what we implement."""
    m = _DATE_PATTERN.search(expr)
    if not m:
        return expr
    date = m.group()
    try:
        parsed = datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
    except ValueError as exc:
        # Pattern-valid but calendar-invalid (e.g. 2023-02-30...) must
        # surface as JexlError like every other unparsable input, so
        # callers that catch JexlError for clean parse-failure
        # reporting aren't bypassed by a bare ValueError.
        raise JexlError(f"invalid date literal in JEXL expression: {date}") from exc
    millis = int(parsed.timestamp() * 1000)
    return expr.replace(date, str(millis))


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?|\.\d+)
  | (?P<str>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*")
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>=~|!~|==|!=|<=|>=|&&|\|\||\?:|[()\[\],?:.!<>+\-*/%])
    """,
    re.VERBOSE,
)

_KEYWORD_OPS = {
    "or": "||", "and": "&&", "eq": "==", "ne": "!=",
    "lt": "<", "le": "<=", "gt": ">", "ge": ">=",
    "div": "/", "mod": "%", "not": "!",
}


def _tokenize(expr: str) -> list[tuple[str, object]]:
    tokens: list[tuple[str, object]] = []
    pos = 0
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if not m:
            raise JexlError(f"jexl: cannot tokenize at ...{expr[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "ws":
            continue
        if kind == "num":
            if "." in text or "e" in text or "E" in text:
                tokens.append(("num", float(text)))
            else:
                tokens.append(("num", int(text)))
        elif kind == "str":
            delim, body = text[0], text[1:-1]
            # JEXL's StringParser unescapes only the ACTIVE delimiter,
            # backslash, and \uXXXX; unknown escapes stay verbatim
            # ('\d' stays '\d'), so regex patterns survive unmangled

            def _unescape(m: re.Match, _d=delim) -> str:
                e = m.group(1)
                if len(e) == 5 and e.startswith("u"):
                    return chr(int(e[1:], 16))
                if e in (_d, "\\"):
                    return e
                return "\\" + e

            tokens.append(
                ("str", re.sub(r"\\(u[0-9a-fA-F]{4}|.)", _unescape, body))
            )
        elif kind == "ident":
            low = text  # JEXL keywords are case-sensitive
            if low in _KEYWORD_OPS:
                tokens.append(("op", _KEYWORD_OPS[low]))
            elif low == "true":
                tokens.append(("bool", True))
            elif low == "false":
                tokens.append(("bool", False))
            elif low == "null":
                tokens.append(("null", None))
            else:
                tokens.append(("ident", text))
        else:
            tokens.append(("op", text))
    tokens.append(("eof", None))
    return tokens


# ---------------------------------------------------------------------------
# Parser -> tuple AST
# ---------------------------------------------------------------------------


class _Parser:
    def __init__(self, tokens: list[tuple[str, object]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, object]:
        return self.toks[self.i]

    def next(self) -> tuple[str, object]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def eat_op(self, *ops: str) -> str | None:
        kind, val = self.peek()
        if kind == "op" and val in ops:
            self.i += 1
            return str(val)
        return None

    def expect_op(self, op: str) -> None:
        if not self.eat_op(op):
            raise JexlError(f"jexl: expected {op!r}, got {self.peek()!r}")

    # precedence ladder -----------------------------------------------------

    def expr(self):
        return self.ternary()

    def ternary(self):
        cond = self.p_or()
        if self.eat_op("?:"):
            return ("elvis", cond, self.expr())
        if self.eat_op("?"):
            then = self.expr()
            self.expect_op(":")
            return ("ternary", cond, then, self.expr())
        return cond

    def p_or(self):
        node = self.p_and()
        while self.eat_op("||"):
            node = ("bin", "||", node, self.p_and())
        return node

    def p_and(self):
        node = self.p_eq()
        while self.eat_op("&&"):
            node = ("bin", "&&", node, self.p_eq())
        return node

    def p_eq(self):
        node = self.p_rel()
        while True:
            op = self.eat_op("==", "!=")
            if not op:
                return node
            node = ("bin", op, node, self.p_rel())

    def p_rel(self):
        node = self.p_add()
        while True:
            op = self.eat_op("<", "<=", ">", ">=", "=~", "!~")
            if not op:
                return node
            node = ("bin", op, node, self.p_add())

    def p_add(self):
        node = self.p_mul()
        while True:
            op = self.eat_op("+", "-")
            if not op:
                return node
            node = ("bin", op, node, self.p_mul())

    def p_mul(self):
        node = self.p_unary()
        while True:
            op = self.eat_op("*", "/", "%")
            if not op:
                return node
            node = ("bin", op, node, self.p_unary())

    def p_unary(self):
        op = self.eat_op("!", "-")
        if op:
            return ("unary", op, self.p_unary())
        return self.p_postfix()

    def p_postfix(self):
        node = self.p_primary()
        while True:
            if self.eat_op("."):
                kind, val = self.next()
                if kind != "ident":
                    raise JexlError(f"jexl: expected identifier after '.', got {val!r}")
                if self.eat_op("("):
                    # method call: the form exchange-jexl relies on
                    # (doc.getFieldValue('host'), exchanges.xml.template)
                    args: list = []
                    if not self.eat_op(")"):
                        args.append(self.expr())
                        while self.eat_op(","):
                            args.append(self.expr())
                        self.expect_op(")")
                    node = ("call", node, val, tuple(args))
                elif node[0] != "var":
                    raise JexlError("jexl: property access only on identifiers")
                else:
                    node = ("var", node[1] + (val,))
            elif self.eat_op("["):
                idx = self.expr()
                self.expect_op("]")
                node = ("index", node, idx)
            else:
                return node

    def p_primary(self):
        kind, val = self.next()
        if kind in ("num", "str", "bool"):
            return (kind, val)
        if kind == "null":
            return ("null",)
        if kind == "ident":
            return ("var", (val,))
        if kind == "op" and val == "(":
            node = self.expr()
            self.expect_op(")")
            return node
        raise JexlError(f"jexl: unexpected token {val!r}")


def parse_jexl(expr: str):
    """Date-rewrite then parse; returns the tuple AST. Raises
    ``JexlError`` on any syntax the subset does not cover (the
    reference returns null from parseExpression and its callers
    raise — ``JexlIndexingFilter.setConf``)."""
    if expr is None:
        raise JexlError("jexl: expression is None")
    p = _Parser(_tokenize(rewrite_dates(expr)))
    node = p.expr()
    if p.peek()[0] != "eof":
        raise JexlError(f"jexl: trailing input at {p.peek()!r}")
    return node


# ---------------------------------------------------------------------------
# Compile AST -> Spark Column
# ---------------------------------------------------------------------------

Resolver = Callable[[tuple[str, ...]], Column]
ContextValue = Union[Column, Callable[[tuple[str, ...]], Column]]


def _compile(node, resolve: Resolver) -> Column:
    tag = node[0]
    if tag in ("num", "str", "bool"):
        return F.lit(node[1])
    if tag == "null":
        return F.lit(None)
    if tag == "var":
        return resolve(node[1])
    if tag == "index":
        return F.element_at(_compile(node[1], resolve), _compile(node[2], resolve))
    if tag == "call":
        base, method, args = node[1], node[2], node[3]
        # NutchDocument.getFieldValue(name): first value of the named doc
        # field — the method exchange-jexl's canonical expression calls
        # (JexlExchange.match sets only `doc`); resolves like doc.<name>
        if (
            method == "getFieldValue"
            and base[0] == "var"
            and len(args) == 1
            and args[0][0] == "str"
        ):
            return resolve(base[1] + (args[0][1],))
        raise JexlError(f"jexl: unsupported method call .{method}(...)")
    if tag == "unary":
        x = _compile(node[2], resolve)
        return (~x) if node[1] == "!" else (-x)
    if tag == "elvis":
        return F.coalesce(_compile(node[1], resolve), _compile(node[2], resolve))
    if tag == "ternary":
        # A NULL condition here means an operand error inside the
        # condition (strict JEXL toBoolean(null) aborts the script ->
        # silent null), so it must propagate as NULL rather than fall
        # to the else-branch. Documented deviation: a *bare null
        # variable* as the condition (`my_tag ? a : b`) is value-null in
        # JEXL (ASTTernaryNode null-checks before toBoolean and takes
        # the else-branch without error); we cannot distinguish the two
        # in a compiled Column, and the reference's expressions always
        # use comparisons as conditions, where null == error.
        cond = _compile(node[1], resolve)
        return (
            F.when(cond.isNull(), F.lit(None))
            .when(cond, _compile(node[2], resolve))
            .otherwise(_compile(node[3], resolve))
        )
    if tag == "bin":
        op = node[1]
        if op in ("=~", "!~"):
            if node[3][0] != "str":
                raise JexlError("jexl: =~/!~ requires a literal string pattern")
            matched = _compile(node[2], resolve).rlike(f"^(?:{node[3][1]})$")
            return matched if op == "=~" else ~matched
        left = _compile(node[2], resolve)
        right = _compile(node[3], resolve)
        if op == "==":
            return left.eqNullSafe(right)
        if op == "!=":
            return ~left.eqNullSafe(right)
        if op == "&&":
            # JEXL && is strict left-to-right like ||: toBoolean(null)
            # on the LEFT errors the script (silent mode -> null) even
            # when the right side is false, while a false left
            # short-circuits before a null right can error. Spark's
            # three-valued AND resurrects NULL && FALSE to FALSE —
            # identical under the IS TRUE row gate, but observable when
            # && feeds a ternary condition or value context.
            return F.when(left.isNull(), F.lit(None).cast("boolean")).otherwise(
                F.when(~left, F.lit(False)).otherwise(right)
            )
        if op == "||":
            # JEXL evaluates || left-to-right: toBoolean(null) on the LEFT
            # errors the whole script (silent mode -> null -> row dropped)
            # before the right side can rescue it; a true left
            # short-circuits before a null right errors. Spark's plain OR
            # would resurrect NULL||TRUE to TRUE.
            return F.when(left.isNull(), F.lit(None).cast("boolean")).otherwise(
                left | right
            )
        if op == "<":
            return left < right
        if op == "<=":
            return left <= right
        if op == ">":
            return left > right
        if op == ">=":
            return left >= right
        if op == "+":
            return left + right
        if op == "-":
            return left - right
        if op == "*":
            return left * right
        if op == "/":
            return left / right
        if op == "%":
            return left % right
    raise JexlError(f"jexl: cannot compile node {node!r}")


def make_resolver(
    names: Mapping[str, ContextValue],
    fallback: Resolver | None = None,
) -> Resolver:
    """Build a variable resolver from a name->Column mapping. A dotted
    path first tries the full joined name, then the head segment: a
    ``Column`` head takes the remaining path as map keys
    (``element_at``), a callable head receives the remaining path (for
    nested contexts like JexlIndexingFilter's ``doc``). Unknown names
    go to ``fallback`` (e.g. CrawlDatum metadata) or raise."""

    def resolve(path: tuple[str, ...]) -> Column:
        joined = ".".join(path)
        if joined in names:
            v = names[joined]
            if isinstance(v, Column):
                return v
            return v(())
        head = names.get(path[0]) if len(path) > 1 else None
        if head is not None:
            if isinstance(head, Column):
                col = head
                for key in path[1:]:
                    col = F.element_at(col, F.lit(key))
                return col
            return head(path[1:])
        if fallback is not None:
            return fallback(path)
        raise JexlError(f"jexl: unknown variable {'.'.join(path)!r}")

    return resolve


def jexl_column(expr: str, resolve: Resolver) -> Column:
    """Parse + compile a JEXL expression against a resolver."""
    return _compile(parse_jexl(expr), resolve)


def jexl_filter_column(expr: str, resolve: Resolver) -> Column:
    """The row gate every reference site applies:
    ``Boolean.TRUE.equals(script.execute(ctx))`` — nulls (JEXL
    silent-mode errors) and false both drop the row."""
    return jexl_column(expr, resolve).eqNullSafe(F.lit(True))


# ---------------------------------------------------------------------------
# The reference's two standard contexts
# ---------------------------------------------------------------------------


def crawldatum_resolver(metadata_col: str | None = "metadata") -> Resolver:
    """CrawlDatum.execute's MapContext (crawl/CrawlDatum.java:569-607):
    ``url``, ``status`` (the status NAME, not the byte), ``fetchTime``,
    ``modifiedTime``, ``retries``, ``interval``, ``score``,
    ``signature`` (hex), plus every metadata key as a variable —
    Text-valued keys are exposed with ``-`` rewritten to ``_``
    (:601), so an unknown variable probes the map under both
    spellings."""
    from nutch_spark.operators.stats import status_name_col

    names: dict[str, ContextValue] = {
        "url": F.col("url"),
        "status": status_name_col(F.col("status")),
        "fetchTime": F.col("fetch_time"),
        "modifiedTime": F.col("modified_time"),
        "retries": F.col("retries"),
        "interval": F.col("fetch_interval"),
        "score": F.col("score"),
        "signature": F.col("signature"),
    }

    def metadata_fallback(path: tuple[str, ...]) -> Column:
        if metadata_col is None or len(path) != 1:
            raise JexlError(f"jexl: unknown variable {'.'.join(path)!r}")
        name = path[0]
        meta = F.col(metadata_col)
        # the reference registers every Text metadata key with '-'
        # rewritten to '_' (:601) and numeric keys verbatim — replay by
        # probing the raw key, then the dash-normalized key space (so a
        # key mixing dashes AND underscores, e.g. 'my-tag_x', still
        # reaches variable my_tag_x). Session mapKeyDedupPolicy=LAST_WIN
        # resolves post-rewrite collisions like the reference's
        # last-put-wins HashMap.
        rewritten = F.map_from_entries(
            F.transform(
                F.map_entries(meta),
                lambda e: F.struct(
                    F.regexp_replace(e["key"], "-", "_").alias("key"),
                    e["value"].alias("value"),
                ),
            )
        )
        return F.coalesce(
            F.element_at(meta, F.lit(name)),
            F.element_at(rewritten, F.lit(name)),
        )

    return make_resolver(names, metadata_fallback)


def hostdb_resolver(hostdb: DataFrame) -> Resolver:
    """ReadHostDb's MapContext (hostdb/ReadHostDb.java:96-131):
    ``unfetched fetched gone redirTemp redirPerm notModified`` are the
    per-status counts, ``redirs`` / ``ok`` the derived sums, and
    ``numRecords`` the row total. ``dnsFailures`` /
    ``connectionFailures`` come from the resolver threads the sandbox
    doesn't run — they resolve to the columns when a fixture provides
    them and to 0 otherwise (a host that was never probed). Numeric
    metadata variables (:114-131) resolve through the ``metadata`` map
    when present."""
    cols = set(hostdb.columns)

    def col_or_zero(name: str) -> Column:
        return F.col(name) if name in cols else F.lit(0)

    names: dict[str, ContextValue] = {
        "unfetched": col_or_zero("n_db_unfetched"),
        "fetched": col_or_zero("n_db_fetched"),
        "gone": col_or_zero("n_db_gone"),
        "redirTemp": col_or_zero("n_db_redir_temp"),
        "redirPerm": col_or_zero("n_db_redir_perm"),
        "redirs": col_or_zero("n_db_redir_temp") + col_or_zero("n_db_redir_perm"),
        "notModified": col_or_zero("n_db_notmodified"),
        "ok": col_or_zero("n_db_fetched") + col_or_zero("n_db_notmodified"),
        "numRecords": col_or_zero("n_urls"),
        "dnsFailures": col_or_zero("dns_failures"),
        "connectionFailures": col_or_zero("connection_failures"),
        "host": F.col("host"),
    }

    def metadata_fallback(path: tuple[str, ...]) -> Column:
        if "metadata" not in cols or len(path) != 1:
            raise JexlError(f"jexl: unknown variable {'.'.join(path)!r}")
        return F.element_at(F.col("metadata"), F.lit(path[0]))

    return make_resolver(names, metadata_fallback)


def indexing_doc_resolver(docs: DataFrame) -> Resolver:
    """JexlIndexingFilter.filter's context (:56-102): the datum fields
    (as in :meth:`crawldatum_resolver`, when the joined row carries
    them), ``doc.<field>`` resolving to the flattened document columns,
    and the three metadata maps when present. Any variable the row does
    not carry — ``doc.<field>`` or bare — resolves to NULL: strict JEXL
    errors on an undefined variable, silent mode turns that into a null
    script result, and the row gate drops the row (never a compile-time
    error, matching setConf which only rejects PARSE failures)."""
    from nutch_spark.operators.stats import status_name_col

    cols = set(docs.columns)
    names: dict[str, ContextValue] = {}
    for var, col, builder in (
        ("url", "url", None),
        ("status", "status", status_name_col),
        ("fetchTime", "fetch_time", None),
        ("modifiedTime", "modified_time", None),
        ("retries", "retries", None),
        ("interval", "fetch_interval", None),
        ("score", "score", None),
        ("signature", "signature", None),
        ("text", "text", None),
        ("title", "title", None),
    ):
        if col in cols:
            names[var] = builder(F.col(col)) if builder else F.col(col)
    for meta in ("documentMeta", "contentMeta", "parseMeta"):
        snake = re.sub(r"([A-Z])", r"_\1", meta).lower()
        if snake in cols:
            names[meta] = F.col(snake)

    def doc_field(rest: tuple[str, ...]) -> Column:
        if len(rest) != 1:
            raise JexlError("jexl: doc.<field> only")
        return F.col(rest[0]) if rest[0] in cols else F.lit(None)

    names["doc"] = doc_field
    return make_resolver(names, fallback=lambda path: F.lit(None))
