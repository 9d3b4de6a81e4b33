"""Schema-first model declaration: FeatureModel ⇄ GraphQL SDL.

The reference is schema-first — feature domains are COMPOSED from SDL
type definitions whose directives (@alias, @lastUpdated, @entityKey)
carry the engine semantics (materializer schema modules,
``schema/FeatureEngineeringModel.kt:24-52``). This module gives the
Spark engine the same front door in both directions:

- :func:`to_sdl` renders a declared :class:`FeatureModel` as one SDL
  ``type`` block — a reviewable, diffable schema artifact.
- :func:`from_sdl` parses that SDL back into a FeatureModel (stores and
  the transformer registry bind at parse time — SDL carries NAMES, the
  runtime provides the tables), so a schema file IS the model
  declaration.

Directive vocabulary (engine semantics; field types are descriptive and
validated for syntax only — planning derives types from Spark schemas,
the StructType-replaces-SDL-algebra convention of SURVEY §1.1):

- type-level ``@entity(key:, order:, eventTime:, maxDepth:)``
- ``@window(op:, col:, ...params)`` — window features
- ``@transformer(name:, args:, ...params)`` — registry transformers
- ``@asof(store:, rightTs:, valueCol:, allowExact:, rightOrder:,
  strategy:, toleranceS:, ...params)`` — point-in-time features
- ``@interval(store:, valueCol:, start:, end:, strategy:, ...params)``
  — SCD-2 containment features
- ``@alias(of:)`` — the reference's @alias: an output name for another
  feature/column

Round-trip law (pytest-pinned): ``from_sdl(to_sdl(m), ...)`` declares a
model whose ``materialize`` output is value-identical to ``m``'s, and
``to_sdl(from_sdl(s, ...))`` is idempotent on the canonical rendering.
"""

from __future__ import annotations

from typing import Any

from funcify_feature_eng_spark.plans.graphql import _GqlParser, _lex
from funcify_feature_eng_spark.plans.model import FeatureModel, PlanError

__all__ = ["to_sdl", "from_sdl"]


# ------------------------------------------------------------- rendering

_KIND_TYPE = {"window": "Float", "transformer": "Float",
              "asof": "Float", "interval": "String"}


def _sdl_value(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, str):
        # escape control characters too: the GraphQL string token forbids
        # raw newlines, so an unescaped \n would render SDL the lexer
        # cannot tokenize and break the from_sdl(to_sdl(m)) round-trip law
        esc = (
            v.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
        )
        return '"' + esc + '"'
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_sdl_value(x) for x in v) + "]"
    if isinstance(v, float):
        s = repr(v)
        return s if ("." in s or "e" in s or "E" in s) else s + ".0"
    return repr(v)


def _args(pairs: list[tuple[str, Any]]) -> str:
    inner = ", ".join(f"{k}: {_sdl_value(v)}" for k, v in pairs if v is not None)
    return f"({inner})" if inner else ""


def to_sdl(model: FeatureModel, type_name: str = "Features") -> str:
    """Render the declared model as one SDL type block (deterministic:
    declaration order for features, sorted for aliases)."""
    head = "type %s @entity%s" % (
        type_name,
        _args([
            ("key", model.entity_key),
            ("order", list(model.order)),
            ("eventTime", model.event_time),
            ("maxDepth", model.max_depth),
        ]),
    )
    # store REQUIREMENTS (the @lastUpdated directive rides here): SDL
    # carries names + temporal attributes, the runtime binds the tables
    for sname in sorted(model._stores):
        head += " @store" + _args(
            [("name", sname), ("lastUpdated", model._last_updated.get(sname))]
        )
    lines = [head + " {"]
    for name, s in model._features.items():
        ftype = _KIND_TYPE[s.kind]
        if s.kind == "window":
            d = "@window" + _args(
                [("op", s.op), ("col", s.col)] + sorted(s.params.items())
            )
        elif s.kind == "transformer":
            d = "@transformer" + _args(
                [("name", s.transformer), ("args", list(s.args))]
                + sorted(s.params.items())
            )
        elif s.kind == "asof":
            d = "@asof" + _args(
                [("store", s.store_name), ("rightTs", s.right_ts),
                 ("valueCol", s.value_col),
                 ("allowExact", s.allow_exact_matches),
                 ("rightOrder", list(s.right_order) or None),
                 ("strategy", s.strategy), ("toleranceS", s.tolerance_s),
                 ("direction", s.direction)]
                + sorted(s.params.items())
            )
        else:  # interval
            d = "@interval" + _args(
                [("store", s.store_name), ("valueCol", s.value_col),
                 ("start", s.start_col), ("end", s.end_col),
                 ("strategy", s.strategy)] + sorted(s.params.items())
            )
        lines.append(f"    {name}: {ftype} {d}")
    for alias, target in sorted(model._aliases.items()):
        lines.append(f"    {alias}: String @alias(of: {_sdl_value(target)})")
    lines.append("}")
    return "\n".join(lines) + "\n"


# --------------------------------------------------------------- parsing


class _SdlParser(_GqlParser):
    """SDL subset: one or more ``type Name @dirs { field: Type @dirs }``
    blocks (reusing the GraphQL lexer + value grammar; type refs allow
    ``Name``, ``Name!``, ``[Name]``, ``[Name!]!`` and are recorded only)."""

    def directives(self) -> list[tuple[str, dict[str, Any]]]:
        return self._skip_directives()  # parses (name, args) pairs

    def type_ref(self) -> str:
        out = ""
        if self.peek() == ("punct", "["):
            self.next()
            out = "[" + self.type_ref() + "]"
            self.expect("punct", "]")
        else:
            out = self.expect("name")[1]
        if self.peek() == ("punct", "!"):
            self.next()
            out += "!"
        return out

    def type_block(self) -> tuple[str, list, list]:
        self.expect("name", "type")
        tname = self.expect("name")[1]
        tdirs = self.directives()
        self.expect("punct", "{")
        fields = []
        while self.peek() != ("punct", "}"):
            fname = self.expect("name")[1]
            self.expect("punct", ":")
            ftype = self.type_ref()
            fdirs = self.directives()
            fields.append((fname, ftype, fdirs))
        self.next()
        return tname, tdirs, fields


_CAMEL = {"rightTs": "right_ts", "valueCol": "value_col",
          "allowExact": "allow_exact_matches", "rightOrder": "right_order",
          "toleranceS": "tolerance_s", "eventTime": "event_time",
          "maxDepth": "max_depth"}


def _take(args: dict, *names: str) -> dict:
    return {_CAMEL.get(k, k): args.pop(k) for k in list(args) if k in names}


def from_sdl(
    src: str,
    *,
    registry=None,
    stores: dict[str, Any] | None = None,
    sources: dict[str, tuple[Any, str]] | None = None,
) -> FeatureModel:
    """Parse an SDL type block into a declared FeatureModel.

    ``stores`` maps store names referenced by @asof/@interval fields to
    runtime tables (DataFrame or FeatureStore) — SDL carries names, the
    caller binds data; a referenced-but-unbound store raises PlanError
    naming the field. ``sources`` likewise pre-registers auto-join
    sources as ``name -> (df, key)``. Unknown directives raise (a schema
    typo must not silently drop a feature).
    """
    p = _SdlParser(_lex(src))
    tname, tdirs, fields = p.type_block()
    if p.peek()[0] != "eof":
        raise PlanError("SDL: exactly one type block per schema source "
                        f"(unexpected {p.peek()!r} after type {tname!r})")
    ent = dict(next((a for n, a in tdirs if n == "entity"), {}))
    model = FeatureModel(
        entity_key=ent.get("key", "conv_id"),
        order=tuple(ent.get("order", ("turn_idx", "ts"))),
        event_time=ent.get("eventTime", "ts"),
        registry=registry,
        max_depth=int(ent.get("maxDepth", 7)),
    )
    declared = [(dict(a)) for n, a in tdirs if n == "store"]
    bound = dict(stores or {})
    for d in declared:
        sname = d.get("name")
        if sname not in bound:
            raise PlanError(
                f"SDL: type {tname!r} declares store {sname!r} "
                f"(@store) but no binding was provided — pass "
                f"stores={{{sname!r}: <DataFrame|FeatureStore>}}"
            )
        model.register_store(sname, bound.pop(sname),
                             last_updated=d.get("lastUpdated"))
    for sname, store in bound.items():  # bindings beyond the declared set
        model.register_store(sname, store)
    for sname, (df, key) in (sources or {}).items():
        model.register_source(sname, df, key)

    for fname, _ftype, fdirs in fields:
        unknown = [n for n, _ in fdirs
                   if n not in ("window", "transformer", "asof", "interval",
                                "alias")]
        if unknown:
            raise PlanError(
                f"SDL field {fname!r}: unknown directive(s) "
                f"{['@' + u for u in unknown]} — a schema typo must not "
                "silently drop a feature"
            )
        sem = list(fdirs)
        if len(sem) != 1:
            raise PlanError(
                f"SDL field {fname!r}: exactly one of @window/@transformer/"
                f"@asof/@interval/@alias required (got {[n for n, _ in fdirs]})"
            )
        n, a = sem[0]
        a = dict(a)
        try:
            if n == "window":
                model.declare_window_feature(
                    fname, op=a.pop("op"), col=a.pop("col", None), **a
                )
            elif n == "transformer":
                model.declare_transformer_feature(
                    fname, transformer=a.pop("name"),
                    args=tuple(a.pop("args", ())), **a
                )
            elif n == "asof":
                kw = _take(a, "store", "rightTs", "valueCol", "allowExact",
                           "rightOrder", "strategy", "toleranceS",
                           "direction")
                model.declare_asof_feature(
                    fname, kw.pop("store"), params=a or None, **kw
                )
            elif n == "interval":
                kw = _take(a, "store", "valueCol", "start", "end", "strategy")
                model.declare_interval_feature(
                    fname, kw.pop("store"), params=a or None, **kw
                )
            else:
                model.alias(fname, a["of"])
        except KeyError as e:
            raise PlanError(f"SDL field {fname!r}: @{n} missing argument {e}")
    return model
