r"""jq-subset → Spark Column compiler (closes F4).

The reference's entire transformer language is jq: every transformer source
is a named jq program with JSON-Schema-typed input/output, evaluated per
value by jackson-jq
(``funcify-feature-eng-jq/src/main/kotlin/funcify/feature/transformer/jq/jackson/DefaultJacksonJqTransformer.kt:43-62,134-207``;
YAML reader ``JqTransformerYamlReader.kt``; shipped programs
``funcify-feature-eng-stream/src/main/resources/jq-transformers.yml:2-19``).

Here the same programs compile to **Catalyst Column expressions** — one
analyzer pass at plan time, then whole-stage-codegen'd JVM execution per
row. No jq runtime, no Python in the hot path: a jq transformer costs the
same as a hand-written ``F.when`` chain. This is the Spark-first answer to
"evaluate a jq program over 10^12 rows": don't interpret, compile.

Supported subset (everything the reference ships, plus the common core):

- identity ``.``, field access ``.a.b``, array index ``.[0]`` / ``.[-1]``
- pipe ``|``
- type filters ``numbers`` ``strings`` ``arrays`` ``booleans`` ``values``
- ``length``, ``floor``, ``ceil``, ``round``, ``sqrt``, ``fabs``, ``not``,
  ``tostring``, ``tonumber``, ``ascii_downcase``, ``ascii_upcase``;
  array builtins ``add``, ``min``, ``max``, ``sort``, ``unique``,
  ``reverse``, ``flatten``, ``first``, ``last``, ``any``, ``all``;
  unary-argument ``join/split/ltrimstr/rtrimstr/startswith/endswith/test``
  (``test`` uses Java regex flavor), ``abs``
- higher-order array forms, all compiled to JVM higher-order functions
  (``F.transform``/``F.filter``/``F.exists``/``F.forall``/``F.array_sort``
  — no Python per element): ``map(f)``, ``map(select(c) | f)``,
  ``sort_by(f)``, ``any(f)``, ``all(f)``, ``group_by(f)``, ``unique_by(f)``
- slices ``.[a:b]`` / ``.[a:]`` / ``.[:b]`` with negative and
  out-of-range bounds clamped as jq does (arrays and strings)
- object introspection, struct- and map-backed: ``keys``,
  ``keys_unsorted``, ``to_entries``, ``from_entries`` (→ MapType: keys
  are data), ``with_entries(f)``, ``has("k")``, ``in(obj)``,
  ``getpath(["a","b"])`` — struct-backed objects need the declared field
  list (``compile_jq(input_fields=...)`` from the schema's ``properties``,
  map-backed need ``map_input=True``); struct ``to_entries`` requires
  same-typed values (Spark arrays are homogeneous — a mixed-type object
  fails analysis with Spark's coercion error)
- regex streams: ``capture("(?<name>re)")`` (→ struct of named groups),
  ``[splits(re)]`` / ``[splits(re) | f]`` (collected split stream; bare
  ``splits`` outside ``[...]`` is rejected with the rewrite hint), the
  two-arg ``split(re; flags)`` regex form and ``test(re; flags)``
  (flags i/x/s)
- ``min_by(f)``/``max_by(f)`` (aggregate fold: first-minimal /
  last-maximal as jq's stable sort yields), ``map_values(f)`` and
  ``del(.k)`` over both object backings, object ``length`` (key count)
- assignments on objects (one field): update ``.k |= f`` (f sees the OLD
  field value) and plain ``.k = f`` (f evaluates against the root; new
  keys extend the object) — including the canonical
  ``with_entries(.value |= f)`` / ``(.key |= f)`` forms (entry structs
  are typed ``{key, value}``)
- arithmetic streams ``[range(n)]`` / ``[range(a;b)]`` /
  ``[range(a;b;step)]`` / ``[range(...) | f]`` (end-exclusive, positive
  integer step; → F.sequence, empty when a >= b)
- array construction ``[a, b, ...]`` and object construction
  ``{k: f, "quoted key": g, shorthand}`` (→ struct)
- stream-collect iteration ``[.[] | f]`` / ``[.path[] | f]`` (≡ ``map``,
  same select-at-head filtering) — bare ``.[]`` outside ``[...]`` is
  rejected with a rewrite hint since a column holds one value, not a stream
- string interpolation ``"\(expr)"`` (non-strings render via tostring,
  null renders as ``"null"`` as in jq)
- ``if COND then A elif B then C else D end`` (``else`` optional = identity)
- arithmetic ``+ - * / %`` (``/`` is float division, ``%`` truncates to
  integer — both as jq), unary minus, string/array ``+`` concat
- comparisons ``== != < <= > >=``
- boolean ``and`` ``or``, alternative ``//`` (jq truthiness: ``null`` and
  ``false`` are falsey, everything else — including ``0`` — truthy)
- literals: numbers, strings (double-quoted), ``null`` ``true`` ``false``
- parentheses

Static-typing deltas from dynamic jq (documented, deliberate):

- A Spark column has ONE type, so type filters resolve at compile time
  against the declared ``input_schema`` (pass-through on match or unknown,
  empty→NULL on static mismatch) rather than per value.
- The reference *throws* on schema-invalid input values
  (``DefaultJacksonJqTransformer.kt:89-113``). A distributed job must not
  die on one bad row: invalid (NULL) inputs surface as NULL outputs, and
  strict callers use plans/validation.py quarantine instead.
- jq's empty stream collapsing (scalar output + no result → null) maps to
  NULL, matching the reference's own
  ``convertResultListIntoOutputSchemaFormatIfPossible`` for the scalar case.
- Values reached through field/index access are statically typed ``any``;
  their jq truthiness is approximated as non-NULL-ness, so a BOOLEAN
  ``false`` stored in a struct field is truthy here. Compare explicitly
  (``.flag == true``) for boolean fields — the typed-input paths (declared
  ``input_schema: {type: boolean}``) have exact truthiness.
- Ordering comparisons (``<`` etc.) use SQL null propagation, not jq's
  total order across types (``null < false < …``); inside ``if`` both read
  as falsey, so the observable delta is limited to direct boolean outputs.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's shipped transformer YAML, transcribed verbatim from
# funcify-feature-eng-stream/src/main/resources/jq-transformers.yml:2-19
# (same list shape: name / input_schema / output_schema / expression).
REFERENCE_TRANSFORMERS_YAML = """\
---
- name: negative_to_null
  input_schema:
    type: number
  output_schema:
    type: number
  expression: "numbers | if . >= 0.0 then . else null end"
- name: list_size
  input_schema:
    type: array
  output_schema:
    type: integer
  expression: "arrays | length"
- name: extract_decade
  input_schema:
    type: integer
  output_schema:
    type: integer
  expression: "numbers | if . >= 1900 then . % 100 else null end"
...
"""


# ---------------------------------------------------------------- tokenizer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<field>\.[A-Za-z_][A-Za-z0-9_]*)
  | (?P<var>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>//|==|!=|<=|>=|\|=|=|\||<|>|\+|-|\*|/|%|\(|\)|\[|\]|\{|\}|\.|;|,|:)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

_KEYWORDS = {"if", "then", "elif", "else", "end", "and", "or", "not",
             "null", "true", "false", "reduce", "as"}


def tokenize(src: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise ValueError(f"jq: cannot tokenize at {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "ws":
            continue
        if kind == "ident" and text in _KEYWORDS:
            kind = text
        out.append((kind, text))
    out.append(("eof", ""))
    return out


# ------------------------------------------------------------------- parser
# AST: nested tuples. ('identity',) ('field', base, name) ('index', base, i)
# ('lit', v) ('typefilter', kind) ('builtin', name) ('if', [(cond, then)...], else|None)
# ('pipe', l, r) ('alt', l, r) ('and', l, r) ('or', l, r) ('not',)
# ('cmp', op, l, r) ('arith', op, l, r) ('neg', x)

_TYPE_FILTERS = {"numbers", "strings", "arrays", "booleans", "values", "nulls"}
_BUILTINS = {"length", "floor", "ceil", "fabs", "abs", "tostring", "tonumber",
             "ascii_downcase", "ascii_upcase", "add", "min", "max",
             "sort", "unique", "reverse", "first", "last", "flatten",
             "round", "sqrt", "any", "all", "tojson",
             "to_entries", "from_entries", "keys", "keys_unsorted"}
# one-argument builtins, called as name(arg)
_ARG_BUILTINS = {"join", "split", "ltrimstr", "rtrimstr", "startswith",
                 "endswith", "test", "select", "map", "sort_by", "contains",
                 "with_entries", "group_by", "unique_by", "has", "in",
                 "capture", "splits", "getpath",
                 "min_by", "max_by", "map_values", "del", "range"}
# builtins with BOTH a zero-arg form (over a boolean array) and a
# one-arg predicate form any(f)/all(f)
_OPT_ARG_BUILTINS = {"any", "all"}
# two-argument builtins, name(a; b) — jq separates arguments with ';'
_ARG2_BUILTINS = {"sub", "gsub"}
# builtins accepting one OR two arguments: split(s) literal / split(re; flags),
# test(re) / test(re; flags)
_ARG12_BUILTINS = {"split", "test"}


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str) -> tuple[str, str]:
        t = self.next()
        if t[0] != kind:
            raise ValueError(f"jq parse: expected {kind}, got {t}")
        return t

    # pipe := alt ('as' var '|' pipe | ('|' alt ['as' var '|' pipe])*)
    def _alt_update(self):
        # assignments `PATH |= F` / `PATH = F` sit between pipe and
        # alternative in jq's precedence: `a | .k |= f` ≡ `a | (.k |= f)`
        node = self.alt()
        if self.peek() == ("op", "|="):
            self.next()
            return ("update", node, self.alt())
        if self.peek() == ("op", "="):
            self.next()
            return ("assign", node, self.alt())
        return node

    def pipe(self):
        node = self._alt_update()
        if self.peek()[0] == "as":  # EXPR as $x | body — variable binding
            self.next()
            var = self.expect("var")[1][1:]
            t = self.next()
            if t != ("op", "|"):
                raise ValueError(f"jq parse: expected '|' after as ${var}, got {t}")
            return ("bind", node, var, self.pipe())
        while self.peek() == ("op", "|"):
            self.next()
            rhs = self._alt_update()
            if self.peek()[0] == "as":
                # mid-pipe binding: `a | b as $x | c` ≡ a | (b as $x | c) —
                # jq binds `as` tighter than the preceding pipe; within c,
                # '.' is a's output (the value at the binding point)
                self.next()
                var = self.expect("var")[1][1:]
                t = self.next()
                if t != ("op", "|"):
                    raise ValueError(
                        f"jq parse: expected '|' after as ${var}, got {t}"
                    )
                return ("pipe", node, ("bind", rhs, var, self.pipe()))
            node = ("pipe", node, rhs)
        return node

    # alt := or ('//' or)*
    def alt(self):
        node = self.orx()
        while self.peek() == ("op", "//"):
            self.next()
            node = ("alt", node, self.orx())
        return node

    def orx(self):
        node = self.andx()
        while self.peek()[0] == "or":
            self.next()
            node = ("or", node, self.andx())
        return node

    def andx(self):
        node = self.cmp()
        while self.peek()[0] == "and":
            self.next()
            node = ("and", node, self.cmp())
        return node

    def cmp(self):
        node = self.add()
        k, v = self.peek()
        if k == "op" and v in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            node = ("cmp", v, node, self.add())
        return node

    def add(self):
        node = self.mul()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("+", "-"):
                self.next()
                node = ("arith", v, node, self.mul())
            else:
                return node

    def mul(self):
        node = self.unary()
        while True:
            k, v = self.peek()
            if k == "op" and v in ("*", "/", "%"):
                self.next()
                node = ("arith", v, node, self.unary())
            else:
                return node

    def unary(self):
        if self.peek() == ("op", "-"):
            self.next()
            return ("neg", self.unary())
        return self.postfix()

    def postfix(self):
        node = self.primary()
        while True:
            k, v = self.peek()
            if k == "field":
                self.next()
                node = ("field", node, v[1:])
            elif k == "op" and v == "[":
                self.next()
                if self.peek() == ("op", "]"):  # .[] — iterate
                    self.next()
                    node = ("iterate", node)
                    continue

                def _signed_int() -> int:
                    sign = 1
                    if self.peek() == ("op", "-"):
                        self.next()
                        sign = -1
                    return sign * int(self.expect("num")[1])

                lo = None if self.peek() == ("op", ":") else _signed_int()
                if self.peek() == ("op", ":"):  # .[a:b] / .[a:] / .[:b]
                    self.next()
                    hi = None if self.peek() == ("op", "]") else _signed_int()
                    closing = self.next()
                    if closing != ("op", "]"):
                        raise ValueError(f"jq parse: expected ']', got {closing}")
                    node = ("slice", node, lo, hi)
                    continue
                closing = self.next()
                if closing != ("op", "]"):
                    raise ValueError(f"jq parse: expected ']', got {closing}")
                node = ("index", node, lo)
            else:
                return node

    def primary(self):
        k, v = self.peek()
        if k == "field":  # .name — field access on identity
            self.next()
            return ("field", ("identity",), v[1:])
        if k == "op" and v == ".":
            self.next()
            return ("identity",)
        if k == "num":
            self.next()
            return ("lit", float(v) if ("." in v or "e" in v or "E" in v) else int(v))
        if k == "str":
            self.next()
            return _parse_string(v[1:-1])
        if k == "null":
            self.next()
            return ("lit", None)
        if k == "true":
            self.next()
            return ("lit", True)
        if k == "false":
            self.next()
            return ("lit", False)
        if k == "not":
            self.next()
            return ("not",)
        if k == "if":
            return self.ifexpr()
        if k == "var":
            self.next()
            return ("var", v[1:])
        if k == "reduce":
            # reduce SRC as $x (INIT; UPDATE) — SRC is a postfix path
            # stream (.[] / .path[] / (pipe)[]); INIT/UPDATE are full pipes
            self.next()
            src = self.postfix()
            if self.peek()[0] != "as":
                raise ValueError(f"jq parse: expected 'as' in reduce, got {self.peek()}")
            self.next()
            var = self.expect("var")[1][1:]
            t = self.next()
            if t != ("op", "("):
                raise ValueError(f"jq parse: expected '(' in reduce, got {t}")
            init = self.pipe()
            t = self.next()
            if t != ("op", ";"):
                raise ValueError(f"jq parse: expected ';' in reduce, got {t}")
            update = self.pipe()
            t = self.next()
            if t != ("op", ")"):
                raise ValueError(f"jq parse: expected ')' closing reduce, got {t}")
            return ("reduce", src, var, init, update)
        if k == "ident":
            self.next()
            if v in _TYPE_FILTERS:
                return ("typefilter", v)
            callable_ = (v in _ARG_BUILTINS or v in _ARG2_BUILTINS
                         or v in _OPT_ARG_BUILTINS or v in _ARG12_BUILTINS)
            if self.peek() == ("op", "(") and callable_:
                # name(a) / name(a; b) — jq separates arguments with ';'
                self.next()
                args = [self.pipe()]
                while self.peek() == ("op", ";"):
                    self.next()
                    args.append(self.pipe())
                t = self.next()
                if t != ("op", ")"):
                    raise ValueError(f"jq parse: expected ')' after {v} args, got {t}")
                if v == "range":  # range(n) / range(a;b) / range(a;b;step)
                    if len(args) == 1:
                        return ("range", ("lit", 0), args[0], ("lit", 1))
                    if len(args) == 2:
                        return ("range", args[0], args[1], ("lit", 1))
                    if len(args) == 3:
                        return ("range", args[0], args[1], args[2])
                    raise ValueError("jq: range takes 1-3 arguments")
                one_ok = (v in _ARG_BUILTINS or v in _OPT_ARG_BUILTINS
                          or v in _ARG12_BUILTINS)
                two_ok = v in _ARG2_BUILTINS or v in _ARG12_BUILTINS
                if len(args) == 1 and one_ok:
                    return ("call", v, args[0])
                if len(args) == 2 and two_ok:
                    return ("call2", v, args[0], args[1])
                raise ValueError(f"jq: {v} does not take {len(args)} argument(s)")
            if v in _BUILTINS or v in _OPT_ARG_BUILTINS:
                return ("builtin", v)
            if callable_:
                raise ValueError(f"jq: {v} requires an argument, e.g. {v}(\"x\")")
            raise ValueError(f"jq: unsupported function {v!r}")
        if k == "op" and v == "(":
            self.next()
            node = self.pipe()
            t = self.next()
            if t != ("op", ")"):
                raise ValueError(f"jq parse: expected ')', got {t}")
            return node
        if k == "op" and v == "[":
            # array construction [a, b, ...] — jq's comma is stream concat;
            # over scalar filters that is exactly "collect into an array"
            self.next()
            items = []
            if self.peek() != ("op", "]"):
                items.append(self.pipe())
                while self.peek() == ("op", ","):
                    self.next()
                    items.append(self.pipe())
            t = self.next()
            if t != ("op", "]"):
                raise ValueError(f"jq parse: expected ']' in array, got {t}")
            return ("arr", items)
        if k == "op" and v == "{":
            # object construction {a: f, "b c": g, shorthand} → struct
            self.next()
            entries = []
            while self.peek() != ("op", "}"):
                kk, kv = self.next()
                if kk == "ident" or kk in _KEYWORDS:
                    key = kv
                elif kk == "str":
                    key = kv[1:-1]
                else:
                    raise ValueError(f"jq parse: bad object key {kk, kv}")
                if self.peek() == ("op", ":"):
                    self.next()
                    entries.append((key, self.pipe()))
                else:  # {a} shorthand ≡ {a: .a}
                    entries.append((key, ("field", ("identity",), key)))
                if self.peek() == ("op", ","):
                    self.next()
            self.next()  # consume }
            if not entries:
                raise ValueError("jq: empty object construction {} unsupported")
            return ("obj", entries)
        raise ValueError(f"jq parse: unexpected token {k, v}")

    def ifexpr(self):
        self.expect("if")
        arms = []
        cond = self.pipe()
        self.expect("then")
        arms.append((cond, self.pipe()))
        while self.peek()[0] == "elif":
            self.next()
            c = self.pipe()
            self.expect("then")
            arms.append((c, self.pipe()))
        els = None
        if self.peek()[0] == "else":
            self.next()
            els = self.pipe()
        self.expect("end")
        return ("if", arms, els)


def _unescape(body: str) -> str:
    # minimal escape handling: \" \\ \n \t
    return (body.replace(r"\\", "\x00").replace(r"\"", '"')
            .replace(r"\n", "\n").replace(r"\t", "\t").replace("\x00", "\\"))


def _unescape_level(s: str) -> str:
    r"""Peel ONE level of string-escaping: an interpolated expression lives
    inside a string token, so its nested string literals arrive as ``\"``
    and literal backslashes as ``\\`` — unwrap exactly those two so the
    inner tokenizer sees real quotes; other escapes (``\n``, ``\t``) stay
    intact for the inner string literal's own unescape pass."""
    out: list[str] = []
    i = 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s) and s[i + 1] in ('"', "\\"):
            out.append(s[i + 1])
            i += 2
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _parse_string(body: str):
    r"""A string literal, or ("interp", parts) when it contains jq
    interpolation ``\(expr)`` — parts alternate raw-str / sub-ASTs."""
    parts: list = []
    buf = ""
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body) and body[i + 1] == "(":
            # find the matching close paren (interpolated exprs may nest).
            # Nested string literals arrive as \"...\" regions (the outer
            # string token escapes their quotes) — parens inside them are
            # literal text and must NOT count toward the balance.
            # scan in outer-token UNITS (\x is one unit). Inside a nested
            # string, the unit \\ is the INNER escape introducer: the unit
            # after it is literal, so an inner escaped quote (\\ then \")
            # must not toggle the delimiter state.
            depth, j, in_str, inner_esc = 1, i + 2, False, False
            while j < len(body) and depth:
                ch = body[j]
                if ch == "\\" and j + 1 < len(body):
                    unit = body[j + 1]
                    j += 2
                    if in_str:
                        if inner_esc:
                            inner_esc = False
                        elif unit == "\\":
                            inner_esc = True
                        elif unit == '"':
                            in_str = False
                    elif unit == '"':
                        in_str = True
                    continue
                j += 1
                if in_str:
                    inner_esc = False
                    continue
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
            if depth:
                raise ValueError(f"jq: unterminated \\( in string {body!r}")
            if buf:
                parts.append(_unescape(buf))
                buf = ""
            parts.append(parse(_unescape_level(body[i + 2:j - 1])))
            i = j
            continue
        if c == "\\" and i + 1 < len(body):
            buf += body[i:i + 2]
            i += 2
            continue
        buf += c
        i += 1
    if not parts:
        return ("lit", _unescape(buf))
    if buf:
        parts.append(_unescape(buf))
    return ("interp", parts)


def parse(src: str):
    p = _Parser(tokenize(src))
    node = p.pipe()
    if p.peek()[0] != "eof":
        raise ValueError(f"jq parse: trailing tokens at {p.peek()}")
    return node


# ----------------------------------------------------------------- compiler
# Static types flowing through compilation: 'number' 'integer' 'string'
# 'boolean' 'array' 'object' 'null' 'any'.

_NUMERIC = {"number", "integer"}


def _truthy(col: Column, t: str) -> Column:
    """jq truthiness as a (possibly-NULL) boolean Column: false/null falsey,
    anything else (incl. 0, "") truthy."""
    if t == "boolean":
        return col  # NULL flows through; consumers coalesce to False
    if t == "null":
        return F.lit(False)
    return col.isNotNull()


def _join_types(a: str, b: str) -> str:
    if a == b:
        return a
    if a == "null":
        return b
    if b == "null":
        return a
    if {a, b} <= _NUMERIC:
        return "number"
    return "any"


# compile-time variable environment for $x bindings (reduce / as) — a
# PER-THREAD stack: plan construction may run from multiple driver threads
# (e.g. a ThreadPoolExecutor submitting independent actions), and a shared
# list would let one thread's clear()/push corrupt another's bindings.
class _ObjT(str):
    """Static type ``"object"`` enriched with compile-time knowledge.

    ``keys``: the declared field names (from JSON-Schema ``properties``
    passed to :func:`compile_jq`, an object construction ``{...}``, or
    ``capture``'s named groups) — what lets ``to_entries``/``keys``/``has``
    resolve statically over a StructType column.
    ``map_backed``: the value is a Spark MapType (the ``from_entries``
    output shape, whose keys are data, not schema).

    A plain ``str`` subclass so every existing ``t == "object"`` /
    ``t in (...)`` check keeps working unchanged."""

    def __new__(cls, keys=None, map_backed: bool = False):
        o = super().__new__(cls, "object")
        o.keys = tuple(keys) if keys is not None else None
        o.map_backed = bool(map_backed)
        return o


def _obj_keys(t) -> tuple | None:
    return getattr(t, "keys", None)


def _map_backed(t) -> bool:
    return bool(getattr(t, "map_backed", False))


# build() clears its own thread's stack so a failed compile can't leak
# bindings into the next one.
import threading as _threading

_VARS_TLS = _threading.local()


def _vars() -> list[tuple[str, Column, str]]:
    if not hasattr(_VARS_TLS, "stack"):
        _VARS_TLS.stack = []
    return _VARS_TLS.stack


def _compile(node, cur: Column, t: str) -> tuple[Column, str]:
    kind = node[0]
    if kind == "identity":
        return cur, t
    if kind == "pipe":
        mid, mt = _compile(node[1], cur, t)
        return _compile(node[2], mid, mt)
    if kind == "var":
        for name, col, vt in reversed(_vars()):
            if name == node[1]:
                return col, vt
        raise ValueError(f"jq: unbound variable ${node[1]}")
    if kind == "bind":  # EXPR as $x | body — '.' stays the input in body
        val, vt = _compile(node[1], cur, t)
        _vars().append((node[2], val, vt))
        try:
            return _compile(node[3], cur, t)
        finally:
            _vars().pop()
    if kind == "reduce":
        # reduce SRC as $x (INIT; UPDATE): fold the stream with Spark's
        # aggregate HOF — INIT sees '.' = the reduce input, UPDATE sees
        # '.' = the accumulator and $x = the element (jq semantics).
        # Spark's HOF requires a type-stable accumulator: integer INITs
        # widen to double when the source array is double-typed at runtime
        # is NOT inferred here — keep INIT and UPDATE the same type.
        src, var, init_n, upd_n = node[1], node[2], node[3], node[4]
        stages = _pipe_stages(src)
        if stages[0][0] != "iterate":
            raise ValueError(
                "jq reduce: source must be a stream (.[] / .path[] / (pipe)[])"
            )
        arr_col, _at = _compile(("arr", [src]), cur, t)
        init_col, it = _compile(init_n, cur, t)
        if it in ("integer", "number"):
            # jq numbers are IEEE doubles; widening the accumulator also
            # keeps Spark's aggregate HOF type-stable over double arrays
            init_col, it = init_col.cast("double"), "number"

        def merge(acc: Column, x: Column) -> Column:
            _vars().append((var, x, "any"))
            try:
                out, _ = _compile(upd_n, acc, it)
            finally:
                _vars().pop()
            # the HOF accumulator must keep one type across steps: pin
            # numeric updates (e.g. `. + $x | floor` -> long) back to double
            return out.cast("double") if it == "number" else out

        agg = F.aggregate(arr_col, init_col, merge)
        # jq: a null/absent stream is EMPTY — reduce returns the init value
        return F.when(arr_col.isNull(), init_col).otherwise(agg), it
    if kind == "lit":
        v = node[1]
        if v is None:
            return F.lit(None), "null"
        if isinstance(v, bool):
            return F.lit(v), "boolean"
        if isinstance(v, int):
            return F.lit(v), "integer"
        if isinstance(v, float):
            return F.lit(v), "number"
        return F.lit(v), "string"
    if kind == "field":
        base, bt = _compile(node[1], cur, t)
        if bt not in ("object", "any"):
            raise ValueError(f"jq: field access .{node[2]} on static type {bt}")
        return base.getField(node[2]), "any"
    if kind == "index":
        base, bt = _compile(node[1], cur, t)
        if bt not in ("array", "any"):
            raise ValueError(f"jq: index [{node[2]}] on static type {bt}")
        i = node[2]
        # jq 0-based; try_element_at is 1-based with negative-from-end, and
        # NULL (not ANSI error) past the end — jq .[i] out of range is null
        col = F.try_element_at(base, F.lit(i + 1 if i >= 0 else i))
        return col, "any"
    if kind == "arr":
        items = node[1]
        # [.[] | f] / [.path[] | f] — jq's collect-the-stream idiom ≡ map:
        # compile the iterate base, then route the rest of the pipe through
        # the same filter/transform machinery map() uses (select at the
        # head drops elements)
        if len(items) == 1:
            stages = _pipe_stages(items[0])
            head_is_splits = (
                stages[0][0] == "call" and stages[0][1] == "splits"
            )
            head_is_range = stages[0][0] == "range"
            if stages[0][0] == "iterate" or head_is_splits or head_is_range:
                if head_is_splits:
                    # [splits(re) | f] — regex-split stream collected
                    if t not in ("string", "any"):
                        raise ValueError(f"jq: splits over static type {t}")
                    sa = stages[0][2]
                    if sa[0] != "lit" or not isinstance(sa[1], str):
                        raise ValueError("jq: splits requires a literal regex")
                    base = F.split(cur, sa[1], -1)
                elif head_is_range:
                    # [range(a;b;step)] — arithmetic stream collected.
                    # jq range yields a, a+step, ... < b (end-exclusive);
                    # integer-valued args, positive step (the columnar
                    # subset; F.sequence with start>stop would silently
                    # DESCEND, so empty ranges guard explicitly)
                    lo = _compile(stages[0][1], cur, t)[0].cast("long")
                    hi = _compile(stages[0][2], cur, t)[0].cast("long")
                    step_n = stages[0][3]
                    neg_lit = (
                        step_n[0] == "neg"
                        and step_n[1][0] == "lit"
                        and isinstance(step_n[1][1], (int, float))
                    )
                    zero_or_neg = (
                        step_n[0] == "lit"
                        and isinstance(step_n[1], (int, float))
                        and step_n[1] <= 0
                    )
                    frac_lit = (
                        step_n[0] == "lit"
                        and isinstance(step_n[1], float)
                        and step_n[1] != int(step_n[1])
                    )
                    if neg_lit or zero_or_neg or frac_lit:
                        raise ValueError(
                            "jq: range step must be a positive integer in "
                            "the columnar subset (fractional steps would "
                            "silently truncate under the integer grid)"
                        )
                    st = _compile(step_n, cur, t)[0].cast("long")
                    last = lo + F.floor((hi - lo - 1) / st).cast("long") * st
                    # the st > 0 runtime guard covers DYNAMIC steps the
                    # literal check can't see: a nonpositive step yields
                    # the empty stream instead of an opaque F.sequence
                    # IllegalArgumentException mid-job
                    base = F.when(
                        (hi > lo) & (st > 0), F.sequence(lo, last, st)
                    ).otherwise(F.array().cast("array<bigint>"))
                else:
                    base, bt = _compile(stages[0][1], cur, t)
                    if bt not in ("array", "any"):
                        raise ValueError(f"jq: .[] over static type {bt}")
                rest = None
                for st in stages[1:]:
                    rest = st if rest is None else ("pipe", rest, st)
                if rest is None:
                    return base, "array"
                # splits elements are statically strings; .[] elements any
                elem_t = "string" if head_is_splits else "any"
                return _map_impl(rest, base, elem_t), "array"
        return F.array(*[_compile(n, cur, t)[0] for n in items]), "array"
    if kind == "iterate":
        raise ValueError(
            "jq: bare .[] produces a stream; in the columnar subset wrap it "
            "as [.[] | ...] (≡ map) so the result is a single array value")
    if kind == "range":
        raise ValueError(
            "jq: range(...) produces a stream; in the columnar subset wrap "
            "it as [range(a;b)] (→ array) or [range(n) | f]")
    if kind == "interp":
        # string interpolation "\(f)-\(g)": non-string parts render via
        # tostring; jq renders null as the 4-char string "null"
        parts = []
        for p in node[1]:
            if isinstance(p, str):
                parts.append(F.lit(p))
            else:
                c, ct = _compile(p, cur, t)
                parts.append(F.coalesce(c.cast("string"), F.lit("null")))
        return F.concat(*parts), "string"
    if kind == "obj":
        return (
            F.struct(*[_compile(n, cur, t)[0].alias(k) for k, n in node[1]]),
            _ObjT(keys=[k for k, _ in node[1]]),
        )
    if kind == "update":
        # PATH |= F: value at PATH replaced by F(old value) — the
        # with_entries idiom (.value |= f). Columnar subset: one field on
        # an object input. As in jq, an ABSENT key is added with F(null)
        # (jq: `.z |= f` ≡ `.z = (.z | f)`; null routes through our
        # documented SQL null propagation).
        tgt, rhs = node[1], node[2]
        if not (tgt[0] == "field" and tgt[1] == ("identity",)):
            raise ValueError("jq: |= supports a single field path, .k |= f")
        k = tgt[2]
        if t != "object":
            raise ValueError(f"jq: .{k} |= needs an object input (got {t})")
        if _map_backed(t):
            # old value (NULL when absent) → f → re-insert. Key ORDER is
            # part of jq's object semantics (keys_unsorted/to_entries
            # observe it): an existing key updates IN PLACE via
            # transform_values; only an absent key appends. A
            # filter-then-concat form would move updated keys to the end.
            # (val re-evaluates per entry inside the HOF — fine at jq
            # object sizes.)
            val = _compile(rhs, cur.getItem(k), "any")[0]
            updated = F.transform_values(
                cur, lambda mk, mv: F.when(mk == F.lit(k), val).otherwise(mv)
            )
            has_k = F.array_contains(F.map_keys(cur), F.lit(k))
            return (
                F.when(has_k, updated).otherwise(
                    F.map_concat(cur, F.create_map(F.lit(k), val))
                ),
                _ObjT(map_backed=True),
            )
        keys = _obj_keys(t)
        if keys is None:
            raise ValueError(
                "jq: |= needs the object's declared keys — declare "
                "input_fields or construct the object with {...} first"
            )
        out_keys = list(keys) if k in keys else list(keys) + [k]
        old = cur.getField(k) if k in keys else F.lit(None)
        new_val = _compile(rhs, old, "any" if k in keys else "null")[0]
        st = F.struct(
            *[
                (new_val if x == k else cur.getField(x)).alias(x)
                for x in out_keys
            ]
        )
        return F.when(cur.isNotNull(), st), _ObjT(keys=out_keys)
    if kind == "assign":
        # PATH = F: value at PATH set to F evaluated against the INPUT (jq:
        # `.a = .b` reads .b from the root) — unlike |=, whose F sees the
        # old field value. New keys are allowed (jq object extension).
        tgt, rhs = node[1], node[2]
        if not (tgt[0] == "field" and tgt[1] == ("identity",)):
            raise ValueError("jq: = supports a single field path, .k = f")
        k = tgt[2]
        if t != "object":
            raise ValueError(f"jq: .{k} = needs an object input (got {t})")
        val = _compile(rhs, cur, t)[0]
        if _map_backed(t):
            # same order contract as |=: existing key updates in place,
            # absent key appends (filter-then-concat would reorder)
            updated = F.transform_values(
                cur, lambda mk, mv: F.when(mk == F.lit(k), val).otherwise(mv)
            )
            has_k = F.array_contains(F.map_keys(cur), F.lit(k))
            return (
                F.when(has_k, updated).otherwise(
                    F.map_concat(cur, F.create_map(F.lit(k), val))
                ),
                _ObjT(map_backed=True),
            )
        keys = _obj_keys(t)
        if keys is None:
            raise ValueError(
                "jq: = needs the object's declared keys — declare "
                "input_fields or construct the object with {...} first"
            )
        out_keys = list(keys) if k in keys else list(keys) + [k]
        st = F.struct(
            *[
                (val if x == k else cur.getField(x)).alias(x)
                for x in out_keys
            ]
        )
        return F.when(cur.isNotNull(), st), _ObjT(keys=out_keys)
    if kind == "slice":
        base, bt = _compile(node[1], cur, t)
        lo_i, hi_i = node[2], node[3]
        if bt == "string":
            n = F.length(base)
        elif bt == "array":
            n = F.size(base)
        else:
            raise ValueError(
                "jq: slice .[a:b] needs a statically-typed array or string "
                f"input (got {bt}) — pipe through `arrays`/`strings` first"
            )

        def _norm(i, default):
            # jq slice bounds: negative = from end; out-of-range clamps
            if i is None:
                return default
            c = F.lit(int(i)) if i >= 0 else (n + F.lit(int(i))).cast("int")
            return F.greatest(F.least(c, n.cast("int")), F.lit(0))

        lo = _norm(lo_i, F.lit(0))
        hi = _norm(hi_i, n.cast("int"))
        ln = F.greatest(hi - lo, F.lit(0))
        if bt == "string":
            return F.when(base.isNotNull(), base.substr(lo + F.lit(1), ln)), "string"
        return F.when(base.isNotNull(), F.slice(base, lo + F.lit(1), ln)), "array"
    if kind == "typefilter":
        want = node[1]
        if want == "values":  # select(. != null)
            return (F.when(cur.isNotNull(), cur), t)
        match = {
            "numbers": _NUMERIC, "strings": {"string"}, "arrays": {"array"},
            "booleans": {"boolean"}, "nulls": {"null"},
        }[want]
        if t in match:
            return cur, t
        if t == "any":
            if want == "nulls":
                # null-ness is per-ROW data, not a static property of the
                # column — narrowing to "null" here would constant-fold
                # downstream builtins (null|length == 0) onto NON-null rows.
                # Unlike the other filters there is no Spark-analysis
                # backstop, so reject with the rewrite.
                raise ValueError(
                    "jq: `nulls` over an untyped path is per-row, not "
                    "static — write the value test explicitly "
                    "(e.g. `if . == null then ... end` or `select(. == null)`)"
                )
            # NARROW: the filter is a static type assertion over an
            # untyped path — downstream stages get the asserted type (a
            # wrong assertion fails at Spark analysis, same as jq's error)
            return cur, {
                "numbers": "number", "strings": "string", "arrays": "array",
                "booleans": "boolean",
            }[want]
        # static mismatch: empty stream → NULL (scalar collapse, see module doc)
        return F.lit(None), "null"
    if kind == "builtin":
        return _builtin(node[1], cur, t)
    if kind == "call":
        return _call(node[1], node[2], cur, t)
    if kind == "call2":
        return _call2(node[1], node[2], node[3], cur, t)
    if kind == "not":
        return ~F.coalesce(_truthy(cur, t), F.lit(False)), "boolean"
    if kind == "neg":
        col, ct = _compile(node[1], cur, t)
        return -col, ct if ct in _NUMERIC else "number"
    if kind == "if":
        result = None
        out_t = "null"
        expr = None
        for cond_node, then_node in node[1]:
            cond, ct = _compile(cond_node, cur, t)
            then_col, tt = _compile(then_node, cur, t)
            out_t = _join_types(out_t, tt)
            branch = (F.coalesce(_truthy(cond, ct), F.lit(False)), then_col)
            expr = [branch] if expr is None else expr + [branch]
        els_col, et = _compile(node[2], cur, t) if node[2] is not None else (cur, t)
        out_t = _join_types(out_t, et)
        chain = F.when(expr[0][0], expr[0][1])
        for c, v in expr[1:]:
            chain = chain.when(c, v)
        return chain.otherwise(els_col), out_t
    if kind == "alt":
        l, lt = _compile(node[1], cur, t)
        r, rt = _compile(node[2], cur, t)
        if lt == "boolean":
            return F.when(l, l).otherwise(r), _join_types(lt, rt)
        return F.coalesce(l, r), _join_types(lt, rt)
    if kind in ("and", "or"):
        l, lt = _compile(node[1], cur, t)
        r, rt = _compile(node[2], cur, t)
        lb = F.coalesce(_truthy(l, lt), F.lit(False))
        rb = F.coalesce(_truthy(r, rt), F.lit(False))
        return (lb & rb) if kind == "and" else (lb | rb), "boolean"
    if kind == "cmp":
        op, l, r = node[1], node[2], node[3]
        lc, _lt = _compile(l, cur, t)
        rc, _rt = _compile(r, cur, t)
        # jq equality is TOTAL: null == null is true, x != null is true —
        # null-safe comparison, not SQL's null-propagating =
        col = {
            "==": lc.eqNullSafe(rc), "!=": ~lc.eqNullSafe(rc), "<": lc < rc,
            "<=": lc <= rc, ">": lc > rc, ">=": lc >= rc,
        }[op]
        return col, "boolean"
    if kind == "arith":
        op, l, r = node[1], node[2], node[3]
        lc, lt = _compile(l, cur, t)
        rc, rt = _compile(r, cur, t)
        if op == "+":
            if lt == "string" or rt == "string" or lt == "array" or rt == "array":
                return F.concat(lc, rc), _join_types(lt, rt)
            return lc + rc, _join_types(lt, rt)
        if op == "-":
            return lc - rc, _join_types(lt, rt)
        if op == "*":
            return lc * rc, _join_types(lt, rt)
        if op == "/":
            # jq division is always float: 3/2 == 1.5
            return lc.cast("double") / rc.cast("double"), "number"
        if op == "%":
            # jq % truncates both operands toward zero to integers
            return lc.cast("long") % rc.cast("long"), "integer"
    raise ValueError(f"jq compile: unknown node {node!r}")


def _builtin(name: str, cur: Column, t: str) -> tuple[Column, str]:
    if name == "length":
        if t == "array" or t == "any":
            # jq: null|length == 0, but reference validates input first and a
            # distributed engine surfaces invalid rows as NULL (module doc)
            return F.when(cur.isNotNull(), F.size(cur)), "integer"
        if t == "string":
            return F.length(cur), "integer"
        if t in _NUMERIC:  # jq: length of a number is its absolute value
            return F.abs(cur), t
        if t == "object":  # number of keys
            if _map_backed(t):
                return F.when(cur.isNotNull(), F.size(cur)), "integer"
            keys = _obj_keys(t)
            if keys is not None:
                return F.when(cur.isNotNull(), F.lit(len(keys))), "integer"
            raise ValueError(
                "jq: length over an object needs declared keys or a MapType "
                "(input_fields / map_input)"
            )
        if t == "null":
            return F.lit(0), "integer"
        raise ValueError(f"jq: length on static type {t}")
    if name == "floor":
        return F.floor(cur), "integer"
    if name == "ceil":
        return F.ceil(cur), "integer"
    if name in ("fabs", "abs"):
        return F.abs(cur), t if t in _NUMERIC else "number"
    if name == "tostring":
        return cur.cast("string"), "string"
    if name == "tonumber":
        return cur.cast("double"), "number"
    if name == "ascii_downcase":
        return _ascii_case(cur, lower=True), "string"
    if name == "ascii_upcase":
        return _ascii_case(cur, lower=False), "string"
    if name == "add":
        # jq add: sum of a numeric array ([] -> null); string/object concat
        # variants are out of the static subset
        if t not in ("array", "any"):
            raise ValueError(f"jq: add on static type {t}")
        return (
            F.when(
                F.size(cur) > 0,
                F.aggregate(cur, F.lit(0.0), lambda acc, x: acc + x),
            ),
            "number",
        )
    if name == "min":
        if t not in ("array", "any"):
            raise ValueError(f"jq: min on static type {t}")
        return F.array_min(cur), "any"
    if name == "max":
        if t not in ("array", "any"):
            raise ValueError(f"jq: max on static type {t}")
        return F.array_max(cur), "any"
    if name in ("sort", "unique", "reverse", "flatten", "first", "last"):
        if t not in ("array", "any"):
            raise ValueError(f"jq: {name} on static type {t}")
        if name == "sort":
            # jq sorts null < false < true < numbers < strings; within ONE
            # Spark element type that collapses to nulls-first natural order
            return F.sort_array(cur), "array"
        if name == "unique":  # jq unique is sorted-distinct
            return F.sort_array(F.array_distinct(cur)), "array"
        if name == "reverse":
            return F.reverse(cur), "array"
        if name == "flatten":
            return F.flatten(cur), "array"
        if name == "first":  # first/last of [] is an error in jq; NULL here
            return F.try_element_at(cur, F.lit(1)), "any"
        return F.try_element_at(cur, F.lit(-1)), "any"
    if name == "round":
        # jq round = C round(): half away from zero — Spark HALF_UP on
        # doubles is the same rule
        return F.round(cur.cast("double"), 0).cast("long"), "integer"
    if name == "sqrt":
        return F.sqrt(cur.cast("double")), "number"
    if name in ("any", "all"):
        # zero-arg form: input is an array of booleans (e.g. map(.>0)|any);
        # jq truthiness of non-boolean elements is the 1-arg form's job
        if t not in ("array", "any"):
            raise ValueError(f"jq: {name} on static type {t}")
        elem = lambda x: F.coalesce(x.cast("boolean"), F.lit(False))  # noqa: E731
        if name == "any":  # jq: any([]) is false, all([]) is true — as Spark
            return F.exists(cur, elem), "boolean"
        return F.forall(cur, elem), "boolean"
    if name == "tojson":
        # complex values only (scalar tojson needs JSON string escaping,
        # which to_json gives for free on the nested form — wrap scalars in
        # an object/array upstream if they need serializing)
        if t not in ("object", "array", "any"):
            raise ValueError(f"jq: tojson supported for object/array, not {t}")
        return F.to_json(cur), "string"
    if name in ("keys", "keys_unsorted", "to_entries"):
        if t != "object":
            raise ValueError(f"jq: {name} needs an object input (static type {t})")
        if _map_backed(t):
            if name == "to_entries":
                # map_entries already yields array<struct<key, value>>
                return F.map_entries(cur), "array"
            ks = F.map_keys(cur)
            return (F.array_sort(ks) if name == "keys" else ks), "array"
        keys = _obj_keys(t)
        if keys is None:
            raise ValueError(
                f"jq: {name} needs the object's declared keys — declare the "
                "input schema's `properties` (compile_jq input_fields) or "
                "construct the object with {...} first"
            )
        if name == "to_entries":
            # struct fields are schema, so the entry list is compile-time;
            # values must share a coercible Spark type (array element rule)
            ents = F.array(
                *[
                    F.struct(F.lit(k).alias("key"), cur.getField(k).alias("value"))
                    for k in keys
                ]
            )
            return F.when(cur.isNotNull(), ents), "array"
        ks = sorted(keys) if name == "keys" else list(keys)
        return (
            F.when(cur.isNotNull(), F.array(*[F.lit(k) for k in ks])),
            "array",
        )
    if name == "from_entries":
        # array<struct{key, value}> → object; keys are DATA, so the result
        # is a MapType object (field access and has/keys still work on it)
        if t not in ("array", "any"):
            raise ValueError(f"jq: from_entries on static type {t}")
        ents = F.transform(
            cur,
            lambda e: F.struct(
                e.getField("key").cast("string").alias("key"),
                e.getField("value").alias("value"),
            ),
        )
        return F.map_from_entries(_last_wins(ents)), _ObjT(map_backed=True)
    raise ValueError(f"jq: unsupported builtin {name!r}")


def _last_wins(ents: Column) -> Column:
    """jq duplicate-key semantics for entry arrays: the key keeps its
    FIRST-occurrence position with its LAST-occurrence value
    ({key:a,v:1},{key:b},{key:a,v:3} → a:3, b — what jq's from_entries /
    object construction do). Without this, map_from_entries raises
    SparkRuntimeException mid-job on one duplicate key under the default
    mapKeyDedupPolicy=EXCEPTION. O(n²) HOFs per row — jq-object scale."""
    firsts = F.filter(
        ents,
        lambda e, i: ~F.exists(
            F.slice(ents, 1, i),
            lambda p: p.getField("key").eqNullSafe(e.getField("key")),
        ),
    )
    return F.transform(
        firsts,
        lambda e: F.struct(
            e.getField("key").alias("key"),
            F.element_at(
                F.filter(
                    ents,
                    lambda p: p.getField("key").eqNullSafe(e.getField("key")),
                ),
                -1,
            ).getField("value").alias("value"),
        ),
    )


def _pipe_stages(n):
    """Flatten the parser's left-associative pipe tree: a|b|c → [a, b, c]."""
    if n[0] == "pipe":
        return _pipe_stages(n[1]) + _pipe_stages(n[2])
    return [n]


def _elem_pred(arg_node):
    """Compile a filter into a per-element boolean lambda (jq truthiness)."""
    def pred(x: Column) -> Column:
        c, ct = _compile(arg_node, x, "any")
        return F.coalesce(_truthy(c, ct), F.lit(False))
    return pred


def _map_impl(arg_node, base: Column, elem_t: str = "any") -> Column:
    """jq ``map(f)`` → higher-order Column expression, fully JVM-side.

    ``select`` drops elements in jq (empty stream), which the scalar
    compiler cannot express (it collapses empty→NULL) — so ``select``
    stages at the HEAD of the map body compile to ``F.filter`` and the
    rest to ``F.transform``: ``map(select(c) | f)`` ≡ filter(c)→transform(f).
    A ``select`` later in the body (after a transform) is rejected with a
    rewrite hint rather than silently keeping NULL elements.
    """
    stages = _pipe_stages(arg_node)
    conds = []
    while stages and stages[0][0] == "call" and stages[0][1] == "select":
        conds.append(stages[0][2])
        stages = stages[1:]
    node = ("identity",)
    for st in stages:
        node = st if node == ("identity",) else ("pipe", node, st)

    def _has_select(n) -> bool:
        return (isinstance(n, tuple)
                and ((n[0] == "call" and n[1] == "select")
                     or any(_has_select(c) for c in n[1:])))

    if _has_select(node):
        raise ValueError(
            "jq: select inside map is only supported at the head of the "
            "body — rewrite as map(select(COND) | REST)")
    col = base
    for c in conds:
        col = F.filter(col, _elem_pred(c))
    if node != ("identity",):
        col = F.transform(col, lambda x: _compile(node, x, elem_t)[0])
    return col


def _call(name: str, arg_node, cur: Column, t: str) -> tuple[Column, str]:
    """Unary-argument builtins. The argument is evaluated against the SAME
    input as the call (jq semantics) — usually a literal."""
    import re as _re

    if name in ("group_by", "unique_by"):
        # jq group_by(f): sort by f(elem), split into runs of equal keys.
        # Columnar shape: distinct keys (sorted, nulls lowest as jq) →
        # per-key F.filter keeps original relative order within each group
        # (jq's stable-sort semantics). Fully JVM-side; O(k·n) per row over
        # per-row element counts, which is the [...]-literal scale.
        if t not in ("array", "any"):
            raise ValueError(f"jq: {name} on static type {t}")

        def _key_of(x: Column) -> Column:
            return _compile(arg_node, x, "any")[0]

        dkeys = F.sort_array(F.array_distinct(F.transform(cur, _key_of)))
        grouped = F.transform(
            dkeys, lambda k: F.filter(cur, lambda x: _key_of(x).eqNullSafe(k))
        )
        if name == "group_by":
            return grouped, "array"
        # unique_by: first element of each group = first occurrence in
        # original order (what jq's stable sort-then-group yields)
        return F.transform(grouped, lambda g: F.element_at(g, 1)), "array"
    if name in ("min_by", "max_by"):
        # jq: min_by returns the FIRST minimal element (stable sort + take
        # first), max_by the LAST maximal — an aggregate fold keeps exactly
        # that: min replaces the accumulator only on STRICTLY smaller keys,
        # max replaces on greater-or-equal. Empty/null input → null (jq).
        # Key order is jq's: null lowest.
        if t not in ("array", "any"):
            raise ValueError(f"jq: {name} on static type {t}")

        def _key(x: Column) -> Column:
            return _compile(arg_node, x, "any")[0]

        def _klt(a: Column, b: Column) -> Column:
            ka, kb = _key(a), _key(b)
            return (ka.isNull() & kb.isNotNull()) | F.coalesce(ka < kb, F.lit(False))

        if name == "min_by":
            def upd(acc: Column, x: Column) -> Column:
                return F.when(_klt(x, acc), x).otherwise(acc)
        else:
            def upd(acc: Column, x: Column) -> Column:
                return F.when(_klt(x, acc), acc).otherwise(x)
        head = F.try_element_at(cur, F.lit(1))
        rest = F.slice(cur, 2, F.greatest(F.size(cur) - 1, F.lit(0)))
        out = F.aggregate(rest, head, upd)
        return F.when(cur.isNotNull() & (F.size(cur) > 0), out), "any"
    if name == "map_values":
        # jq map_values(f) over an object: apply f to each value
        if t != "object":
            raise ValueError(f"jq: map_values needs an object input (got {t})")
        if _map_backed(t):
            return (
                F.transform_values(cur, lambda _k, v: _compile(arg_node, v, "any")[0]),
                _ObjT(map_backed=True),
            )
        keys = _obj_keys(t)
        if keys is None:
            raise ValueError(
                "jq: map_values needs the object's declared keys — declare "
                "input_fields or construct the object with {...} first"
            )
        st = F.struct(
            *[
                _compile(arg_node, cur.getField(k), "any")[0].alias(k)
                for k in keys
            ]
        )
        return F.when(cur.isNotNull(), st), _ObjT(keys=list(keys))
    if name == "del":
        # del(.k): remove one field from an object (the common jq form;
        # array-index del is out of the columnar subset)
        if not (
            arg_node[0] == "field" and arg_node[1] == ("identity",)
        ):
            raise ValueError("jq: del supports a single field path, del(.k)")
        k = arg_node[2]
        if t != "object":
            raise ValueError(f"jq: del(.{k}) needs an object input (got {t})")
        if _map_backed(t):
            return (
                F.map_filter(cur, lambda mk, _v: mk != F.lit(k)),
                _ObjT(map_backed=True),
            )
        keys = _obj_keys(t)
        if keys is None:
            raise ValueError(
                "jq: del needs the object's declared keys — declare "
                "input_fields or construct the object with {...} first"
            )
        kept = [x for x in keys if x != k]
        if not kept:
            raise ValueError(f"jq: del(.{k}) would leave an empty object")
        st = F.struct(*[cur.getField(x).alias(x) for x in kept])
        return F.when(cur.isNotNull(), st), _ObjT(keys=kept)
    if name == "with_entries":
        # with_entries(f) ≡ to_entries | map(f) | from_entries; entry
        # elements are {key, value} structs — typing them unlocks the
        # canonical `.value |= f` / `.key |= f` update forms inside f
        ents, _et = _builtin("to_entries", cur, t)  # validates object input
        mapped = _map_impl(arg_node, ents, _ObjT(keys=["key", "value"]))
        packed = F.transform(
            mapped,
            lambda e: F.struct(
                e.getField("key").cast("string").alias("key"),
                e.getField("value").alias("value"),
            ),
        )
        # a key-mapping f can COLLIDE keys (.key |= ascii_downcase over
        # "A" and "a") — jq resolves last-wins, not a runtime exception
        return F.map_from_entries(_last_wins(packed)), _ObjT(map_backed=True)
    if name == "getpath":
        if arg_node[0] != "arr" or not arg_node[1] or any(
            n[0] != "lit" or not isinstance(n[1], str) for n in arg_node[1]
        ):
            raise ValueError(
                'jq: getpath requires a literal string path, e.g. '
                'getpath(["a", "b"])'
            )
        col = cur
        for n in arg_node[1]:
            col = col.getField(n[1])
        return col, "any"
    if name == "splits":
        raise ValueError(
            "jq: splits(re) produces a stream; in the columnar subset wrap "
            'it as [splits(re)] (≡ split(re; "")) or [splits(re) | f]'
        )
    if name in ("map", "sort_by", "any", "all"):
        if t not in ("array", "any"):
            raise ValueError(f"jq: {name} on static type {t}")
        if name == "map":
            return _map_impl(arg_node, cur), "array"
        if name == "sort_by":
            # jq sort_by(f): stable sort by f(elem); NULL keys first (jq
            # orders null lowest)
            def cmp(a: Column, b: Column) -> Column:
                ka = _compile(arg_node, a, "any")[0]
                kb = _compile(arg_node, b, "any")[0]
                return (
                    F.when(ka.eqNullSafe(kb), F.lit(0))
                    .when(ka.isNull(), F.lit(-1))
                    .when(kb.isNull(), F.lit(1))
                    .when(ka < kb, F.lit(-1))
                    .otherwise(F.lit(1))
                )
            return F.array_sort(cur, cmp), "array"
        if name == "any":
            return F.exists(cur, _elem_pred(arg_node)), "boolean"
        return F.forall(cur, _elem_pred(arg_node)), "boolean"

    arg, at = _compile(arg_node, cur, t)
    lit = arg_node[1] if arg_node[0] == "lit" else None
    if name == "join":
        if t not in ("array", "any"):
            raise ValueError(f"jq: join on static type {t}")
        if lit is None or not isinstance(lit, str):
            raise ValueError("jq: join requires a literal string argument")
        return F.array_join(cur, lit), "string"
    if name == "split":
        # jq split(s) is LITERAL (regex is the two-arg form) — escape it
        if lit is None or not isinstance(lit, str):
            raise ValueError("jq: split requires a literal string argument")
        return F.split(cur, _re.escape(lit), -1), "array"
    if name == "ltrimstr":
        if lit is None or not isinstance(lit, str):
            raise ValueError("jq: ltrimstr requires a literal string argument")
        # jq: a non-matching prefix passes the input through unchanged
        return (
            F.when(
                cur.startswith(lit),
                cur.substr(F.lit(len(lit) + 1), F.length(cur)),
            ).otherwise(cur),
            "string",
        )
    if name == "rtrimstr":
        if lit is None or not isinstance(lit, str):
            raise ValueError("jq: rtrimstr requires a literal string argument")
        return (
            F.when(
                cur.endswith(lit),
                cur.substr(F.lit(1), F.length(cur) - F.lit(len(lit))),
            ).otherwise(cur),
            "string",
        )
    if name == "startswith":
        return cur.startswith(lit if lit is not None else arg), "boolean"
    if name == "endswith":
        return cur.endswith(lit if lit is not None else arg), "boolean"
    if name == "test":
        if lit is None or not isinstance(lit, str):
            raise ValueError("jq: test requires a literal regex argument")
        # Java regex flavor, not jq's Oniguruma — identical for the common
        # character-class/anchor/quantifier core
        return cur.rlike(lit), "boolean"
    if name == "contains":
        # string form only (jq's array/object containment is structural
        # recursion — out of the static subset)
        if t not in ("string", "any"):
            raise ValueError(f"jq: contains supported for strings, not {t}")
        if lit is not None and isinstance(lit, str):
            return cur.contains(lit), "boolean"
        return cur.contains(arg), "boolean"
    if name == "select":
        # jq select: the input when the predicate holds, EMPTY otherwise;
        # in the columnar mapping empty collapses to NULL (module doc) —
        # the same scalar-unwrap rule the reference applies to empty jq
        # streams (DefaultJacksonJqTransformer.kt:134-207)
        return F.when(F.coalesce(_truthy(arg, at), F.lit(False)), cur), t
    if name == "has":
        if t == "object":
            if _map_backed(t):
                return (
                    F.when(cur.isNotNull(), F.map_contains_key(cur, arg)),
                    "boolean",
                )
            if lit is None or not isinstance(lit, str):
                raise ValueError(
                    "jq: has(k) on a struct object requires a literal string key"
                )
            keys = _obj_keys(t)
            if keys is not None:
                # struct fields are schema: key presence is compile-time
                # (matches jq — a declared key holding null still HAS it)
                return F.when(cur.isNotNull(), F.lit(lit in keys)), "boolean"
            # unknown field set: closest columnar analog — the field is
            # non-NULL (absent JSON keys materialize as NULL in structs;
            # delta from jq's has() on an explicit null value, documented)
            return (
                F.when(cur.isNotNull(), cur.getField(lit).isNotNull()),
                "boolean",
            )
        if t in ("array", "any"):
            if t == "any" and isinstance(lit, str):
                # a string key means OBJECT membership, which the untyped
                # fallback below cannot answer: array-index semantics on a
                # map column would coerce the string key to a number and
                # return all-NULL — silently wrong. Pin the type instead.
                raise ValueError(
                    'jq: has("k") on a statically-untyped input compiles '
                    "to ARRAY index semantics — pin the object type first "
                    "(map_input=True / input_fields, or construct with "
                    "{...} / from_entries) so object membership compiles"
                )
            # has(n) over an array: the index exists
            return (
                F.when(cur.isNotNull(), (arg >= 0) & (arg < F.size(cur))),
                "boolean",
            )
        raise ValueError(f"jq: has on static type {t}")
    if name == "in":
        # input | in(CONTAINER) — the has() inverse
        if at == "array":
            return (
                F.when(arg.isNotNull(), (cur >= 0) & (cur < F.size(arg))),
                "boolean",
            )
        if at == "object":
            if _map_backed(at):
                return F.when(arg.isNotNull(), F.map_contains_key(arg, cur)), "boolean"
            keys = _obj_keys(at)
            if keys is not None:
                return F.when(arg.isNotNull(), cur.isin(*keys)), "boolean"
        raise ValueError(
            "jq: in(CONTAINER) requires an array or a constructed/"
            "from_entries object argument"
        )
    if name == "capture":
        if lit is None or not isinstance(lit, str):
            raise ValueError("jq: capture requires a literal regex argument")
        if t not in ("string", "any"):
            raise ValueError(f"jq: capture on static type {t}")
        groups = _named_groups(lit)
        if not groups:
            raise ValueError(
                "jq: capture requires at least one named group (?<name>...)"
            )
        st = F.struct(
            *[F.regexp_extract(cur, lit, gi).alias(nm) for nm, gi in groups]
        )
        # no match → NULL object (jq: empty stream → scalar collapse);
        # a non-participating optional group yields "" (Java regex), a
        # documented delta from jq's null
        return F.when(cur.rlike(lit), st), _ObjT(keys=[nm for nm, _ in groups])
    raise ValueError(f"jq: unsupported function {name!r}")


def _named_groups(regex: str) -> list[tuple[str, int]]:
    """(name, capture-group index) pairs of a Java-flavor regex, in order —
    skipping escapes, character classes, and non-capturing groups so the
    indexes line up with what regexp_extract sees."""
    out: list[tuple[str, int]] = []
    idx = 0
    i = 0
    in_class = False
    while i < len(regex):
        c = regex[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            i += 1
            continue
        if c == "[":
            in_class = True
            i += 1
            continue
        if c == "(":
            m = re.match(r"\(\?<([A-Za-z][A-Za-z0-9_]*)>", regex[i:])
            if m:
                idx += 1
                out.append((m.group(1), idx))
                i += m.end()
                continue
            if i + 1 < len(regex) and regex[i + 1] == "?":
                i += 2  # non-capturing / lookaround / flags group
                continue
            idx += 1
        i += 1
    return out


def _java_repl(repl: str) -> str:
    r"""Escape a literal replacement for Java's Matcher semantics ($ and \
    are special). jq's own replacement-string extras (\(.x) interpolation,
    named-capture refs) are not supported — literal replacements only."""
    return repl.replace("\\", "\\\\").replace("$", "\\$")


def _call2(name: str, a1, a2, cur: Column, t: str) -> tuple[Column, str]:
    """sub/gsub(regex; replacement) and split(regex; flags), literal args."""
    if a1[0] != "lit" or not isinstance(a1[1], str):
        raise ValueError(f"jq: {name} requires a literal regex first argument")
    if a2[0] != "lit" or not isinstance(a2[1], str):
        raise ValueError(f"jq: {name} requires a literal second argument")
    if t not in ("string", "any"):
        raise ValueError(f"jq: {name} on static type {t}")
    if name == "split":
        # jq split/2 is the REGEX form (split/1 is literal); flags: only
        # "" and "i" map onto Java regex — others (x, s, g) are rejected
        regex, flags = a1[1], a2[1]
        if flags not in ("", "i"):
            raise ValueError(f"jq: split flags {flags!r} unsupported (only '', 'i')")
        if "i" in flags:
            regex = "(?i)" + regex
        return F.split(cur, regex, -1), "array"
    if name == "test":
        # test(re; flags): i/x/s map onto Java inline flags; g is a no-op
        # for a boolean test and jq's n (ignore-empty) has no analog here
        regex, flags = a1[1], a2[1]
        bad = set(flags) - set("ixsg")
        if bad:
            raise ValueError(
                f"jq: test flags {''.join(sorted(bad))!r} unsupported "
                "(supported: i, x, s; g is a no-op)"
            )
        inline = "".join(c for c in flags if c in "ixs")
        if inline:
            regex = f"(?{inline})" + regex
        return cur.rlike(regex), "boolean"
    regex, repl = a1[1], _java_repl(a2[1])
    if name == "gsub":
        return F.regexp_replace(cur, regex, repl), "string"
    if name == "sub":
        # first-occurrence-only: anchor at \A with a lazy prefix group —
        # the composed pattern can match at most once, so regexp_replace's
        # replace-all collapses to replace-first; $1 restores the prefix
        # (always group 1: it opens first, before any group in `regex`)
        return (
            F.regexp_replace(cur, r"(?s)\A(.*?)(?:" + regex + ")", "$1" + repl),
            "string",
        )
    raise ValueError(f"jq: unsupported function {name!r}")


_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def _ascii_case(cur: Column, lower: bool) -> Column:
    # jq's ascii_downcase only maps A-Z (not full Unicode like F.lower)
    return F.translate(cur, _UPPER, _LOWER) if lower else F.translate(cur, _LOWER, _UPPER)


# -------------------------------------------------------------- entry point

_SCHEMA_TYPE_TO_STATIC = {
    "number": "number", "integer": "integer", "string": "string",
    "boolean": "boolean", "array": "array", "object": "object",
}


def compile_jq(expression: str, input_type: str = "any",
               output_type: str | None = None,
               input_fields: list[str] | None = None,
               map_input: bool = False):
    """Compile a jq program to a Column builder ``(Column) -> Column``.

    ``input_type``/``output_type`` are JSON-Schema ``type`` names from the
    transformer's declared schemas (``JqTransformerYamlReader.kt`` fields
    ``input_schema``/``output_schema``); they drive static type-filter
    resolution and the final output coercion. ``input_fields`` — the
    declared ``properties`` keys of an object input — unlocks the
    schema-introspecting builtins (``to_entries``/``keys``/``has``/
    ``with_entries``) over StructType columns, whose field set is
    compile-time in Spark. ``map_input=True`` declares the input object as
    a Spark MapType (keys are data, not schema) — the same builtins then
    compile to ``map_entries``/``map_keys``/``map_contains_key``.
    """
    ast = parse(expression)
    in_t = _SCHEMA_TYPE_TO_STATIC.get(input_type, "any")
    if map_input:
        in_t = _ObjT(map_backed=True)
    elif in_t == "object" and input_fields:
        in_t = _ObjT(keys=list(input_fields))

    def build(col: Column, **_ignored: Any) -> Column:
        _vars().clear()  # defensive: a failed compile on THIS thread must not leak $vars
        out, out_t = _compile(ast, col, in_t)
        return _coerce_output(out, out_t, output_type)

    build.__name__ = f"jq_{abs(hash(expression)) % 10**8}"
    build.jq_expression = expression
    return build


def _coerce_output(col: Column, inferred: str, want: str | None) -> Column:
    if want is None:
        return col
    if want == "integer" and inferred not in ("integer",):
        return col.cast("bigint")
    if want == "number" and inferred not in _NUMERIC:
        return col.cast("double")
    if want == "string" and inferred != "string":
        return col.cast("string")
    return col
