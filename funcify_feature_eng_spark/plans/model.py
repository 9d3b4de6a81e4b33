"""FeatureModel — the declarative feature registry + DAG compiler.

Re-expresses the reference's request-materialization pipeline
(``materializer/graph/RequestMaterializationGraph.kt:23-54`` →
``materializer/dispatch/DispatchedRequestMaterializationGraph.kt:14-26``)
Spark-first:

* a *request* is a list of output column names (the tabular entry point B,
  ``TabularQueryDocumentCreator.kt:44-108``),
* *compile* resolves each name against spine columns, the alias registry and
  declared features (the J1 auto-wiring precedence, simplified to: exact
  column → alias/convention-equivalent column → feature), topo-sorts the
  feature DAG (J5 ``dispatch/...DispatchService.kt:761-853``), and caches the
  plan by request shape (the 24 h plan cache,
  ``DefaultSingleRequestMaterializationGraphService.kt:78-84``),
* *lower* turns the plan into ONE DataFrame lineage: window features share a
  single window pass, transformer features become ``withColumns`` batches
  (whole-stage codegen keeps them in one stage), as-of features become
  ``asof_join`` stages. Spark's lazy DAG is the dispatched-publisher graph;
  Catalyst's ReuseExchange is the ``.cache()`` memoization.

Temporal auto-tracking (J3, ``StandardQueryConnector.kt:2512-2602``): the
model requires an ``event_time`` column and refuses to compile if the spine
lacks it — every feature value is implicitly "as of" that column.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from funcify_feature_eng_spark.functions.registry import TransformerRegistry, default_registry
from funcify_feature_eng_spark.functions.scalars import to_snake_case
from funcify_feature_eng_spark.operators import windows as W
from funcify_feature_eng_spark.operators.asof import asof_join

_WINDOW_OPS = {
    "lag", "lead", "ffill", "ffill_strict", "bfill", "gap", "session", "row_number",
    # event-time RANGE frames + context assembly (all strictly prior)
    "rolling_count", "rolling_sum", "rolling_distinct", "context",
    # within-entity scaling (unbounded frame over the model's entity
    # partition — shares the same Exchange as every other window feature;
    # NOT temporal-leakage-safe by construction: they see the entity's
    # whole history, the declared semantics of a per-entity normalization)
    "zscore", "minmax",
}


@dataclass
class FeatureSpec:
    name: str
    kind: str  # "transformer" | "window" | "asof"
    transformer: str | None = None
    args: tuple[str, ...] = ()  # column or feature names (by-name wiring, J1)
    op: str | None = None  # window op
    col: str | None = None  # window input column
    params: dict[str, Any] = field(default_factory=dict)
    # as-of fields
    store_name: str | None = None
    right_ts: str | None = None
    value_col: str | None = None
    allow_exact_matches: bool = True
    right_order: tuple[str, ...] = ()
    strategy: str = "union_window"
    tolerance_s: float | None = None
    direction: str = "backward"
    # interval (SCD-2 containment) fields
    start_col: str = "valid_from"
    end_col: str = "valid_to"

    def deps(self) -> tuple[str, ...]:
        if self.kind == "transformer":
            return self.args
        if self.kind == "window":
            return (self.col,) if self.col else ()
        return ()


class PlanError(ValueError):
    pass


class FeatureModel:
    """Registry of sources (named right-side tables), transformers and
    features over one entity spine — the FeatureEngineeringModel analog
    (``schema/FeatureEngineeringModel.kt:24-52``)."""

    def __init__(
        self,
        entity_key: str = "conv_id",
        order: Sequence[str] = ("turn_idx", "ts"),
        event_time: str = "ts",
        registry: TransformerRegistry | None = None,
        max_depth: int = 7,
    ) -> None:
        self.entity_key = entity_key
        self.order = tuple(order)
        self.event_time = event_time
        # plan-depth bound: the reference's ModelLimits.maximumOperationDepth
        # (default 7, min 3 — schema/limit/ModelLimits.kt:14-16,50)
        self.max_depth = max(int(max_depth), 3)
        self.registry = registry or default_registry()
        self._features: dict[str, FeatureSpec] = {}
        self._aliases: dict[str, str] = {}  # canon(alias) -> feature/column name
        self._stores: dict[str, DataFrame] = {}
        # unconnected data-element sources joinable on a key (J1 tiers 5/6)
        self._sources: dict[str, tuple[DataFrame, str, bool]] = {}
        # per-domain @lastUpdated registry (J3): store/source name → its
        # temporal attribute (LastUpdatedCoordinatesRegistry.kt:22-35)
        self._last_updated: dict[str, str] = {}
        self._plan_cache: dict[tuple[str, ...], list[FeatureSpec]] = {}
        # bumped on every declaration/alias/source registration; external
        # caches snapshotting this model (plans/document._doc_cache) fold
        # it into their keys so model mutation invalidates them
        self._mutations: int = 0

    # ------------------------------------------------------------- declare
    def register_store(self, name: str, store, last_updated: str | None = None) -> None:
        """A point-in-time right side: either a plain DataFrame (dimension
        state) or a :class:`~funcify_feature_eng_spark.store.FeatureStore`
        (lifecycle-managed, identity = (feature_id, contextual params)).

        ``last_updated`` registers the domain's temporal attribute (the
        @lastUpdated directive, ``StandardQueryConnector.kt:2512-2602``):
        as-of features over this store then need no per-feature ``right_ts``
        — each right-side source carries its own timestamp column."""
        if last_updated is not None:
            if isinstance(store, DataFrame) and last_updated not in store.columns:
                raise PlanError(
                    f"store {name!r}: @lastUpdated column {last_updated!r} "
                    f"not in its columns"
                )
            self._last_updated[name] = last_updated
        self._stores[name] = store
        # re-registering a store swaps its backing data: document-cache
        # snapshots must not keep serving the old frame
        self._mutations += 1

    def register_source(
        self, name: str, df: DataFrame, join_key: str | None = None, broadcast: bool = True
    ) -> None:
        """An *unconnected* data-element source (J1 tiers 5/6,
        ``StandardQueryConnector.kt:682-762``): a table not part of the spine
        whose fields can satisfy requested columns / feature arguments via an
        automatic equi-join on ``join_key`` (default: the entity key).
        ``broadcast=True`` marks it dimension-sized (J6 batched key loading)."""
        key = join_key or self.entity_key
        if key not in df.columns:
            raise PlanError(f"source {name!r}: join key {key!r} not in its columns")
        self._sources[name] = (df, key, broadcast)
        self._plan_cache.clear()
        self._mutations += 1

    def alias(self, alias: str, target: str) -> None:
        """@alias directive analog (AliasCoordinatesRegistry)."""
        self._aliases[to_snake_case(alias)] = target
        # the alias tier outranks the convention tier, so any cached plan
        # that resolved the name conventionally is now stale
        self._plan_cache.clear()
        self._mutations += 1

    def declare_transformer_feature(
        self, name: str, transformer: str, args: Sequence[str], **params: Any
    ) -> None:
        if transformer not in self.registry:
            raise PlanError(f"feature {name!r}: unknown transformer {transformer!r}")
        self._add(FeatureSpec(name, "transformer", transformer=transformer,
                              args=tuple(args), params=params))

    def declare_window_feature(
        self, name: str, op: str, col: str | None = None, **params: Any
    ) -> None:
        if op not in _WINDOW_OPS:
            raise PlanError(f"feature {name!r}: unknown window op {op!r} "
                            f"(known: {sorted(_WINDOW_OPS)})")
        self._add(FeatureSpec(name, "window", op=op, col=col, params=params))

    def declare_asof_feature(
        self,
        name: str,
        store: str,
        right_ts: str | None = None,
        value_col: str = "value",
        allow_exact_matches: bool = True,
        right_order: Sequence[str] = (),
        params: dict[str, Any] | None = None,
        strategy: str = "union_window",
        tolerance_s: float | None = None,
        direction: str = "backward",
    ) -> None:
        """A point-in-time feature against a registered store.

        When the registered store is a FeatureStore, materialization routes
        through ``FeatureStore.read_through`` with ``params`` as the
        contextual-parameter identity (two parameterizations of one feature
        path never collide — DispatchService.kt:960-1127 semantics).
        ``strategy`` / ``tolerance_s`` forward to :func:`asof_join` on the
        DataFrame-store path (pick ``"auto"`` to let skew stats decide; a
        tolerance nulls matches staler than the bound)."""
        if store not in self._stores:
            raise PlanError(f"feature {name!r}: store {store!r} not registered")
        self._add(FeatureSpec(name, "asof", store_name=store, right_ts=right_ts,
                              value_col=value_col, allow_exact_matches=allow_exact_matches,
                              right_order=tuple(right_order),
                              params=dict(params or {}),
                              strategy=strategy, tolerance_s=tolerance_s,
                              direction=direction))

    def declare_interval_feature(
        self,
        name: str,
        store: str,
        value_col: str = "value",
        start: str = "valid_from",
        end: str = "valid_to",
        strategy: str = "bucket",
        params: dict[str, Any] | None = None,
    ) -> None:
        """A containment (SCD-2 validity-interval) feature: the payload of
        the registered store's interval covering ``[start, end)`` ∋ the
        spine row's event time; NULL ``end`` is the open current epoch. A
        feature is one value per (entity, ts), so the store is wrapped in
        :func:`operators.intervals.guarded_disjoint` — overlapping
        intervals raise at materialization instead of silently fanning the
        spine out. ``params['bucket_s']`` tunes the bucket grid."""
        if store not in self._stores:
            raise PlanError(f"feature {name!r}: store {store!r} not registered")
        self._add(FeatureSpec(name, "interval", store_name=store,
                              value_col=value_col, start_col=start, end_col=end,
                              strategy=strategy, params=dict(params or {})))

    def _add(self, spec: FeatureSpec) -> None:
        if spec.name in self._features:
            raise PlanError(f"feature {spec.name!r} already declared")
        self._features[spec.name] = spec
        self._plan_cache.clear()
        self._mutations += 1

    # ------------------------------------------------------------- compile
    def resolve_name(
        self,
        requested: str,
        spine_cols: Sequence[str],
        variables: Sequence[str] = (),
    ) -> tuple[str, Any]:
        """Tabular name resolution — the J1 6-tier precedence
        (``StandardQueryConnector.kt:682-762``):
        (1) connected field: exact spine column → passthrough;
        (2) feature field (feature-on-feature wiring): exact feature;
        (3) alias registry (@alias, unique field on connected source);
        (4) convention-equivalent (snake_case) spine column or feature —
            the 'field with alternatives' tier;
        (5) field on an UNCONNECTED registered source (raw-input
            satisfiability) → automatic equi-join, ambiguity is an error;
        (6) the request's variable set → literal column
            (VARIABLE_VALUE_PROVIDED).
        Returns (kind, resolved) with kind in
        {column, feature, source, variable}; ``source`` resolves to
        (source_name, field_name)."""
        if requested in spine_cols:
            return ("column", requested)
        if requested in self._features:
            return ("feature", requested)
        canon = to_snake_case(requested)
        if canon in self._aliases:
            return self.resolve_name(self._aliases[canon], spine_cols, variables)
        for c in spine_cols:
            if to_snake_case(c) == canon:
                return ("column", c)
        for f in self._features:
            if to_snake_case(f) == canon:
                return ("feature", f)
        hits = [
            (src, field)
            for src, (df, _k, _b) in self._sources.items()
            for field in df.columns
            if field == requested or to_snake_case(field) == canon
        ]
        if len(hits) > 1:
            raise PlanError(
                f"output column {requested!r} is ambiguous across sources: "
                f"{sorted(f'{s}.{f}' for s, f in hits)}"
            )
        if hits:
            return ("source", hits[0])
        if requested in variables:
            return ("variable", requested)
        raise PlanError(
            f"cannot resolve output column {requested!r}: not a spine column, "
            f"feature, alias, source field, or variable "
            f"(features: {sorted(self._features)}; sources: {sorted(self._sources)})"
        )

    def compile(
        self,
        columns: Sequence[str],
        spine_cols: Sequence[str],
        var_keys: Sequence[str] = (),
    ) -> list[FeatureSpec]:
        """Topo-sorted feature stages needed for the requested columns
        (plan-cached by request shape + variable-KEY set, mirroring the
        reference's plan-cache key)."""
        key = (
            tuple(sorted(columns)) + ("|",) + tuple(sorted(spine_cols))
            + ("$",) + tuple(sorted(var_keys))
        )
        if key in self._plan_cache:
            return self._plan_cache[key]
        needed: dict[str, FeatureSpec] = {}

        def visit(fname: str, stack: tuple[str, ...]) -> None:
            if fname in stack:
                raise PlanError(f"feature dependency cycle: {' -> '.join(stack + (fname,))}")
            if len(stack) >= self.max_depth:
                raise PlanError(
                    f"feature dependency depth exceeds max_depth={self.max_depth} "
                    f"at {' -> '.join(stack + (fname,))}"
                )
            if fname in needed:
                return
            spec = self._features[fname]
            for dep in spec.deps():
                kind, resolved = self.resolve_name(dep, spine_cols, var_keys)
                if kind == "feature":
                    visit(resolved, stack + (fname,))
            needed[fname] = spec  # post-order insert = topo order

        for col in columns:
            kind, resolved = self.resolve_name(col, spine_cols, var_keys)
            if kind == "feature":
                visit(resolved, ())
        plan = list(needed.values())
        self._plan_cache[key] = plan
        return plan

    def describe(
        self,
        columns: Sequence[str],
        spine_cols: Sequence[str] = (),
        var_keys: Sequence[str] = (),
    ) -> dict[str, list[dict]]:
        """Human/tool-readable plan description — the reference's
        materialization-graph rendering analog (it serializes the request
        graph for inspection; here the same information is two lists).

        ``columns`` resolve exactly as :meth:`materialize` would resolve
        them (same 6-tier precedence, same errors). Returns
        ``{"columns": [...], "stages": [...]}`` where each column entry
        records its resolution tier and target, and each stage entry is
        one topo-ordered feature computation with its kind, operator /
        transformer / store, and dependency names. Pure metadata — no
        Spark job runs.
        """
        cols_out: list[dict] = []
        for col in columns:
            kind, resolved = self.resolve_name(col, list(spine_cols), var_keys)
            cols_out.append({"column": col, "resolves": kind, "target": resolved})
        stages_out: list[dict] = []
        for i, spec in enumerate(
            self.compile(columns, list(spine_cols), var_keys)
        ):
            entry: dict = {"stage": i, "feature": spec.name, "kind": spec.kind,
                           "depends_on": list(spec.deps())}
            if spec.kind == "window":
                entry["op"] = spec.op
            elif spec.kind == "transformer":
                entry["transformer"] = spec.transformer
            else:
                entry["store"] = spec.store_name
                entry["strategy"] = spec.strategy
            stages_out.append(entry)
        return {"columns": cols_out, "stages": stages_out}

    # ------------------------------------------------------------- lower/run
    def materialize(
        self,
        spine: DataFrame,
        columns: Sequence[str],
        variables: dict[str, Any] | None = None,
    ) -> DataFrame:
        """Entry point B analog: bare column-name list + spine → wide DataFrame
        with exactly the requested columns (features + pass-through) in
        request order. No sort is imposed — callers order on output when
        stable presentation matters (O1).

        ``variables`` is the request's variable set (J1 tier 6): a requested
        name or feature argument found in neither the spine, the features,
        nor a registered source binds to its variable value as a literal."""
        variables = dict(variables or {})
        if self.event_time not in spine.columns:
            raise PlanError(
                f"spine lacks event-time column {self.event_time!r} — temporal "
                "auto-tracking (J3) requires it on every source"
            )
        plan = self.compile(columns, spine.columns, tuple(sorted(variables)))

        # J1 wiring pass: resolve every requested column AND feature argument;
        # tier-5 hits become one pruned equi-join per source (broadcast for
        # dimension-sized sources, J6), tier-6 hits become literal columns.
        needed: dict[str, tuple[str, Any]] = {}
        for col in columns:
            needed[col] = self.resolve_name(col, spine.columns, variables)
        for spec in plan:
            for dep in spec.deps():
                needed.setdefault(dep, self.resolve_name(dep, spine.columns, variables))
        per_src: dict[str, dict[str, str]] = {}
        for req, (kind, res) in needed.items():
            if kind == "source":
                src, field = res
                per_src.setdefault(src, {})[req] = field
        df = spine
        for src, fields in per_src.items():
            src_df, join_key, bcast = self._sources[src]
            sel = src_df.select(
                join_key, *[F.col(f).alias(req) for req, f in fields.items()]
            )
            if bcast:
                sel = F.broadcast(sel)
            df = df.join(sel, on=join_key, how="left")
        for req, (kind, res) in needed.items():
            if kind == "variable":
                df = df.withColumn(req, F.lit(variables[req]))
            elif kind == "column" and res != req:
                # tier-4 convention match used as a feature ARGUMENT: the
                # stage lowers F.col(<name as written>), so alias it in
                df = df.withColumn(req, F.col(res))
        # tier-4 convention match resolving to a declared FEATURE: the
        # resolved column only exists once its stage has run, so the alias
        # is applied mid-plan as each stage lands (compile accepted the
        # wiring; without this the dependent stage's F.col(<as written>)
        # failed at analysis with an unresolved column)
        feat_aliases = {
            req: res
            for req, (kind, res) in needed.items()
            if kind == "feature" and res != req
        }

        def _land_feat_aliases(frame):
            for req, res in list(feat_aliases.items()):
                if res in frame.columns and req not in frame.columns:
                    frame = frame.withColumn(req, F.col(res))
                    del feat_aliases[req]
            return frame

        df = _land_feat_aliases(df)
        keys, order = (self.entity_key,), self.order

        # group consecutive same-kind stages so transformer batches stay in
        # one codegen stage and window features share the one window pass
        i = 0
        while i < len(plan):
            spec = plan[i]
            if spec.kind in ("transformer", "window"):
                batch = []
                while i < len(plan) and plan[i].kind in ("transformer", "window"):
                    batch.append(plan[i])
                    i += 1
                # a transformer may depend on a window feature in the same
                # batch — withColumns resolves sequentially via select chain
                exprs = {}
                for s in batch:
                    if s.kind == "transformer":
                        self._validate_transformer_input(s, df)
                    exprs[s.name] = self._lower_one(s, keys, order)
                    df = df.withColumn(s.name, exprs[s.name])
                    df = _land_feat_aliases(df)
            elif spec.kind == "interval":
                from funcify_feature_eng_spark.operators.intervals import (
                    guarded_disjoint,
                    interval_join,
                )

                store = self._stores[spec.store_name]
                payload = store.select(
                    self.entity_key, spec.start_col, spec.end_col,
                    F.col(spec.value_col).alias(spec.name),
                )
                df = interval_join(
                    df,
                    guarded_disjoint(
                        payload, self.entity_key, spec.start_col, spec.end_col
                    ),
                    on=self.entity_key,
                    ts=self.event_time,
                    start=spec.start_col,
                    end=spec.end_col,
                    how="left",
                    strategy=spec.strategy,
                    bucket_s=int(spec.params.get("bucket_s", 3600)),
                    null_end_is_open=True,
                ).drop(spec.start_col, spec.end_col)
                df = _land_feat_aliases(df)
                i += 1
                continue
            else:  # asof
                target = self._stores[spec.store_name]
                # lazy import: store.py imports asof_join from operators
                from funcify_feature_eng_spark.store import FeatureStore

                if isinstance(target, FeatureStore):
                    # lifecycle path: identity = (feature path, contextual
                    # params) — read_through filters on the computed hash
                    df = target.read_through(
                        df,
                        feature_id=spec.name,
                        out_col=spec.name,
                        ts_col=self.event_time,
                        params=spec.params,
                        allow_exact_matches=spec.allow_exact_matches,
                    )
                else:
                    # per-domain temporal attribute: explicit right_ts wins,
                    # else the store's registered @lastUpdated column (J3)
                    rts = spec.right_ts or self._last_updated.get(spec.store_name)
                    if rts is None:
                        raise PlanError(
                            f"as-of feature {spec.name!r}: store "
                            f"{spec.store_name!r} has no registered "
                            f"@lastUpdated column and the feature declares no "
                            f"right_ts — register_store(..., last_updated=...)"
                        )
                    df = asof_join(
                        df,
                        target,
                        on=[self.entity_key],
                        left_ts=self.event_time,
                        right_ts=rts,
                        value_cols={spec.value_col: spec.name},
                        allow_exact_matches=spec.allow_exact_matches,
                        right_order=spec.right_order,
                        strategy=spec.strategy,
                        tolerance_s=spec.tolerance_s,
                        direction=spec.direction,
                    )
                df = _land_feat_aliases(df)
                i += 1

        out_cols = []
        for col in columns:
            kind, resolved = needed[col]
            if kind in ("source", "variable"):
                out_cols.append(F.col(col))  # materialized under the requested name
            else:
                out_cols.append(F.col(resolved).alias(col))
        return df.select(*out_cols)

    def materialize_backfill(
        self,
        spine: DataFrame,
        columns: Sequence[str],
        *,
        start_s: int,
        end_s: int,
        variables: dict[str, Any] | None = None,
    ) -> DataFrame:
        """Backfill as a model verb: recompute the requested columns for
        every entity with >= 1 spine row in ``[start_s, end_s)`` epoch
        seconds (operators/backfill.py::entity_backfill under this
        model's entity/event-time declarations).

        The semi-join slice hands :meth:`materialize` each touched
        entity's COMPLETE history, so unbounded per-entity window
        features (lag/ffill/session/running — this model's §2.5 block)
        are exact; as-of/interval features read their full side tables
        regardless of the spine slice, so they are unaffected. Output =
        the materialized frame for touched entities only — the
        reference's tracked-value recomputation path
        (``schema/tracking/TrackableValue.kt:109-193``) expressed as a
        range-driven batch instead of per-request dispatch."""
        from funcify_feature_eng_spark.operators.backfill import entity_backfill

        def compute(sl: DataFrame, _keys) -> DataFrame:
            return self.materialize(sl, columns, variables=variables)

        return entity_backfill(
            spine,
            compute,
            ts_col=self.event_time,
            keys=[self.entity_key],
            start_s=start_s,
            end_s=end_s,
        )

    def _validate_transformer_input(self, spec: FeatureSpec, df: DataFrame) -> None:
        """P6 input-schema validation at plan time: each declared arg type on
        the transformer is checked against the bound column's actual Spark
        type (the analog of the reference's JSON-Schema check on the jq
        input — DefaultJacksonJqTransformer.kt:89-113)."""
        t = self.registry.get(spec.transformer)
        field_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        actual = {
            arg_name: field_types[col_name]
            for arg_name, col_name in zip(t.args, spec.args)
            if col_name in field_types
        }
        try:
            t.validate_input_types(actual)
        except TypeError as e:
            raise PlanError(f"feature {spec.name!r}: {e}") from e

    def _lower_one(self, spec: FeatureSpec, keys, order):
        if spec.kind == "transformer":
            cols = [F.col(a) for a in spec.args]
            return self.registry.apply(spec.transformer, *cols, **spec.params)
        op, c = spec.op, spec.col
        if op == "lag":
            return W.lag_col(c, keys, order, spec.params.get("n", 1))
        if op == "lead":
            return W.lead_col(c, keys, order, spec.params.get("n", 1))
        if op == "ffill":
            return W.ffill_col(c, keys, order)
        if op == "ffill_strict":
            return W.ffill_col(c, keys, order, strict_prior=True)
        if op == "bfill":
            return W.bfill_col(c, keys, order)
        if op == "gap":
            return W.gap_seconds(c or self.event_time, keys, order)
        if op == "session":
            return W.session_id(
                c or self.event_time, keys, order, spec.params.get("gap_threshold_s", 1800.0)
            )
        if op == "row_number":
            return W.row_number_col(keys, order)
        if op in ("rolling_count", "rolling_sum", "rolling_distinct"):
            # strictly-prior event-time RANGE frame over the model's
            # event_time. The epoch order key is inlined per feature, so
            # two rolling features build two WindowExec nodes over the SAME
            # exchange — declarative-layer convenience; the fused one-pass
            # form is operators/windows.py::rolling_time_agg
            w_s = int(spec.params.get("window_s", 3600))
            epoch = F.floor(
                F.unix_micros(F.col(self.event_time).cast("timestamp")) / F.lit(1000000)
            ).cast("long")
            wspec = W.time_range_window(keys, epoch, -w_s, -1)
            if op == "rolling_count":
                return F.count(F.col(c)).over(wspec).cast("long")
            if op == "rolling_sum":
                return F.coalesce(F.sum(F.col(c)).over(wspec), F.lit(0)).cast("long")
            return F.size(F.collect_set(F.col(c)).over(wspec)).cast("long")
        if op == "context":
            return W.prior_context_col(
                c, keys, order, int(spec.params.get("k", 3)), spec.params.get("sep", "|")
            )
        if op in ("zscore", "minmax"):
            # within-entity scaling over the SAME partition exchange as the
            # other window features (unbounded frame); exact-arithmetic
            # formulas shared with operators/scaling.py::standardize/
            # minmax_scale — the declarative twin of the frame-level ops.
            # Integral input is the caller's contract (scaling module doc).
            wspec = (
                Window.partitionBy(*[F.col(k) for k in keys])
                .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            )
            v = F.col(c)
            if op == "zscore":
                d = v.cast("decimal(38,0)")
                n = F.count(v).over(wspec).cast("decimal(38,0)")
                s1 = F.coalesce(
                    F.sum(d).over(wspec), F.lit(0).cast("decimal(38,0)")
                )
                s2 = F.coalesce(
                    F.sum(d * d).over(wspec), F.lit(0).cast("decimal(38,0)")
                )
                var_num = n * s2 - s1 * s1
                return F.when(
                    v.isNull() | (var_num <= 0), F.lit(None).cast("double")
                ).otherwise(
                    (n * d - s1).cast("double") / F.sqrt(var_num.cast("double"))
                )
            scale = int(spec.params.get("scale", 1_000_000))
            mn = F.min(v).over(wspec)
            mx = F.max(v).over(wspec)
            num = (v.cast("decimal(38,0)") - mn.cast("decimal(38,0)")) * F.lit(
                scale
            ).cast("decimal(38,0)")
            den = (mx - mn).cast("decimal(38,0)")
            from funcify_feature_eng_spark.operators.util import exact_floor_div

            return F.when(v.isNull(), F.lit(None).cast("bigint")).when(
                mx == mn, F.lit(0).cast("bigint")
            ).otherwise(exact_floor_div(num, den))
        raise PlanError(f"unhandled window op {op!r}")
