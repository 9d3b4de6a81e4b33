"""Declarative corpus-curation pipelines.

The reference's core idea is declare-then-materialize: sources,
transformers and features are REGISTERED, a request selects what it needs,
and the engine compiles one plan (``materializer`` module; our feature-grain
twin is ``plans/model.py::FeatureModel``). This module applies the same
philosophy to corpus-grain work — the dedup / filter / split / mixing
operators a 100 TB training-data pipeline chains: declare the stages once,
get ONE composed Spark job out (no intermediate materialization, Catalyst
sees the whole DAG), plus a human-readable lineage of what was declared.

Every stage delegates to the individually driver-gated operators
(operators/dedup.py, graph.py, sampling.py, contamination.py, text
functions) — the pipeline adds sequencing, declare-time validation and
provenance, never new semantics. The driver gate ``corpus_pipeline`` proves
value identity with the hand-composed capstone (``q_corpus_curation``).

Reference anchor: declare/compose lifecycle per
``DefaultSingleRequestMaterializationOrchestratorService.kt`` (request →
plan → materialize); the corpus-op inventory itself is the engine's
beyond-reference surface (SURVEY §2 extensions).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class CorpusPipeline:
    """Declare corpus stages, then :meth:`run` them as one composed job.

    Stage semantics (ORDER MATTERS — stages run in declaration order):

    - ``derive(name, col)`` — add a derived column (quality scores,
      language predictions) for later stages to consume.
    - ``exact_dedup()`` — keep the min-id row per distinct text.
    - ``near_dedup(quality_col=...)`` — MinHash-LSH pairs → connected
      components → keep the best-quality member per duplicate cluster.
      Pairs are computed over the PIPELINE INPUT corpus, not the current
      (already exact-deduped) frame: an exact duplicate removed earlier can
      still BRIDGE two near-dup clusters, and dropping it from the pair
      graph would split a cluster the full corpus connects — same
      conservative semantics as the hand-composed capstone.
    - ``filter(predicate)`` — keep rows matching a Column predicate.
    - ``decontaminate(eval_df)`` — drop docs sharing an n-gram with an
      eval set (n-gram-hash semi-join).
    - ``assign_split(weights)`` / ``sample(fraction)`` — deterministic
      hash-bucket split / subsample (operators/sampling.py semantics).
    - ``select(*cols)`` — final projection.

    Declare-time validation catches empty/duplicate stage configs; frame
    validation (column existence) happens at :meth:`run`, before any job
    is submitted.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        # (kind, human desc, fn(df, df0), resume key, side-input fp fn)
        self._stages: list[tuple] = []

    # ------------------------------------------------------------- stages
    def _add(self, kind: str, desc: str, fn, key: str,
             side_fp: Callable[[], str] | None = None) -> "CorpusPipeline":
        # `key` must capture EVERY parameter and expression that changes
        # the stage's semantics — it is what invalidates resume checkpoints
        # when a stage is edited (`desc` stays short for humans); `side_fp`
        # contributes side-input data identity (e.g. the eval corpus)
        self._stages.append((kind, desc, fn, key, side_fp))
        return self

    def derive(self, name: str, col: Column) -> "CorpusPipeline":
        if not name:
            raise ValueError("derive: empty column name")
        return self._add(
            "derive", f"derive {name}", lambda df, df0: df.withColumn(name, col),
            f"derive|{name}|{col}",
        )

    def filter(self, predicate: Column | str) -> "CorpusPipeline":
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        return self._add("filter", "filter", lambda df, df0: df.filter(pred),
                         f"filter|{pred}")

    def exact_dedup(self) -> "CorpusPipeline":
        from .operators.dedup import exact_dedup

        return self._add(
            "exact_dedup",
            "exact dedup (min-id per text)",
            lambda df, df0: exact_dedup(df, self.id_col, self.text_col),
            f"exact_dedup|{self.id_col}|{self.text_col}",
        )

    def near_dedup(
        self,
        *,
        quality_col: str,
        num_hashes: int = 64,
        bands: int = 16,
        shingle_k: int = 3,
        verify_threshold: float = 0.5,
    ) -> "CorpusPipeline":
        from .operators.dedup import minhash_lsh_pairs
        from .operators.graph import connected_components, keep_best_per_cluster

        if not quality_col:
            raise ValueError("near_dedup: quality_col is required (cluster winner rule)")

        def stage(df: DataFrame, df0: DataFrame) -> DataFrame:
            pairs = minhash_lsh_pairs(
                df0, self.id_col, self.text_col,
                num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
                verify_threshold=verify_threshold,
            )
            comp = connected_components(pairs)  # pair cols are doc_a/doc_b
            return keep_best_per_cluster(df, comp, self.id_col, quality_col)

        return self._add(
            "near_dedup",
            f"near-dup clusters (LSH {num_hashes}/{bands}, verify>={verify_threshold})"
            f" keep best {quality_col}",
            stage,
            f"near_dedup|{self.id_col}|{self.text_col}|{quality_col}|"
            f"{num_hashes}|{bands}|{shingle_k}|{verify_threshold}",
        )

    def decontaminate(
        self,
        eval_df: DataFrame,
        eval_id_col: str = "doc_id",
        eval_text_col: str = "text",
        k: int = 8,
        min_shared: int = 1,
    ) -> "CorpusPipeline":
        """Drop corpus docs sharing >= ``min_shared`` word k-grams with the
        eval set (the training-side inverse of
        ``operators.contamination.contamination_report``): eval grams
        reduce to distinct 8-byte hashes, corpus docs anti-join on the
        per-doc shared-gram count."""
        from .operators.contamination import _gram_hashes

        def stage(df: DataFrame, df0: DataFrame) -> DataFrame:
            eg = _gram_hashes(eval_df, eval_id_col, eval_text_col, k).select(
                "gh"
            ).distinct()
            tg = _gram_hashes(df, self.id_col, self.text_col, k)
            contaminated = (
                tg.join(eg, "gh")
                .groupBy("doc")
                .agg(F.count(F.lit(1)).alias("__n_shared"))
                .filter(F.col("__n_shared") >= min_shared)
                .select(F.col("doc").alias(self.id_col))
            )
            return df.join(contaminated, self.id_col, "left_anti")

        def side_fp() -> str:
            # the eval corpus is a DATA dependency: a changed eval set must
            # invalidate this stage's checkpoint or eval docs leak into the
            # curated corpus
            from .lineage import fingerprint_df

            return fingerprint_df(eval_df)

        return self._add(
            "decontaminate", f"decontaminate ({k}-gram semi-join)", stage,
            f"decontaminate|{self.id_col}|{self.text_col}|{eval_id_col}|"
            f"{eval_text_col}|{k}|{min_shared}",
            side_fp,
        )

    def assign_split(self, weights: dict[str, float], resolution: int = 10_000,
                     hash: bool = True, out_col: str = "split") -> "CorpusPipeline":
        from .operators.sampling import assign_split

        return self._add(
            "assign_split",
            f"split {weights}",
            lambda df, df0: assign_split(
                df, self.id_col, weights, out_col=out_col,
                resolution=resolution, hash=hash,
            ),
            f"assign_split|{self.id_col}|{sorted(weights.items())}|"
            f"{resolution}|{hash}|{out_col}",
        )

    def sample(self, fraction: float, resolution: int = 10_000,
               hash: bool = True) -> "CorpusPipeline":
        from .operators.sampling import deterministic_sample

        return self._add(
            "sample",
            f"deterministic sample {fraction}",
            lambda df, df0: deterministic_sample(
                df, self.id_col, fraction, resolution=resolution, hash=hash
            ),
            f"sample|{self.id_col}|{fraction}|{resolution}|{hash}",
        )

    def require(self, constraints) -> "CorpusPipeline":
        """Data-quality contract stage (:mod:`.operators.checks`): the
        constraint list evaluates in one aggregate job and the pipeline
        HALTS — a ``ValueError`` naming every failing constraint with its
        measured metric — before any downstream stage consumes a bad
        batch. Rows flow through unchanged (a gate, not a transform).
        Under a tracker the verdict re-evaluates only when the input's
        content fingerprint changes, like any other stage."""
        from .operators.checks import check_constraints

        constraints = list(constraints)

        def stage(df: DataFrame, df0: DataFrame) -> DataFrame:
            failed = [
                v for v in check_constraints(df, constraints).collect()
                if not v["passed"]
            ]
            if failed:
                detail = "; ".join(
                    f"{v['kind']}({v['column']}) metric={v['metric']} "
                    f"threshold={v['threshold']}" for v in failed
                )
                raise ValueError(
                    f"CorpusPipeline.require: {len(failed)} constraint(s) "
                    f"failed: {detail}"
                )
            return df

        key = "require|" + "|".join(
            f"{c.kind}:{c.column}:{c.threshold}:{c.extra}" for c in constraints
        )
        return self._add(
            "require", f"require {len(constraints)} constraints", stage, key
        )

    def select(self, *cols: str) -> "CorpusPipeline":
        if not cols:
            raise ValueError("select: need at least one column")
        return self._add("select", f"select {list(cols)}",
                         lambda df, df0: df.select(*cols),
                         f"select|{list(cols)}")

    # ---------------------------------------------------------------- run
    def describe(self) -> list[str]:
        """Human-readable stage lineage, in execution order."""
        return [st[1] for st in self._stages]

    def run(self, df: DataFrame, tracker=None, stage_prefix: str = "corpus") -> DataFrame:
        """Apply the declared stages to ``df``.

        Without ``tracker``: one composed lazy plan (Catalyst sees the whole
        DAG, nothing materializes until the caller acts).

        With a :class:`~funcify_feature_eng_spark.lineage.LineageTracker`:
        every stage output CHECKPOINTS with lineage + per-partition metrics,
        and a killed job resumes without recompute (north rule). Each
        stage's fingerprint combines (a) its INPUT frame's content identity
        — output plans can embed run-specific artifacts like localCheckpoint
        RDD ids, which would defeat resume — (b) the stage's full resume
        KEY (every parameter and expression string the stage was declared
        with), and (c) side-input data identity (decontaminate's eval
        corpus). So a changed source, an edited stage (new threshold,
        different predicate), or a changed side input each invalidate the
        stage and, through the rewritten checkpoint files, everything
        downstream.

        ``df`` must carry ``id_col`` and ``text_col``; validation runs
        BEFORE any stage so misdeclared pipelines fail without submitting
        a job. The input frame is retained (not materialized) for stages
        that consult the pre-dedup corpus (near_dedup's pair graph)."""
        if not self._stages:
            raise ValueError("CorpusPipeline: no stages declared")
        for c in (self.id_col, self.text_col):
            if c not in df.columns:
                raise ValueError(f"CorpusPipeline: input lacks column {c!r}")
        out = df
        for i, (kind, desc, fn, key, side_fp) in enumerate(self._stages):
            if tracker is None:
                out = fn(out, df)
            else:
                from .lineage import fingerprint_df

                side = side_fp() if side_fp is not None else ""
                in_fp = fingerprint_df(out, f"{stage_prefix}|{i}|{key}|{side}")
                stage_name = f"{stage_prefix}_{i:02d}_{kind}"
                src = out
                # build= defers stage construction to run_stage so a cache
                # hit skips even BUILDING the stage (near-dedup's pair
                # builder executes eagerly at build time)
                out = tracker.run_stage(
                    stage_name, build=lambda f=fn, s=src: f(s, df),
                    fingerprint=in_fp,
                )
        return out
