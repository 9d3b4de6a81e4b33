"""Driver-contract regression test: every queries() entry runs at sf0.001
and returns rows with a stable schema; oracle keys are a subset."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_).issubset(set(qs))
    # every query is oracle-backed: SQL-expressible ops inline, the
    # hash-dependent dedup ops via precomputed pure-Python fixtures
    assert sorted(set(qs) - set(os_)) == []


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_and_returns_rows(spark, sf_dir, name):
    fn = entrymod.queries()[name]
    df = fn(spark, sf_dir)
    schema1 = df.schema
    assert df.count() > 0
    # schema stability: re-invoking yields the same schema
    assert fn(spark, sf_dir).schema == schema1


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_first_50_cover_every_operator_family():
    """ORDERING CONTRACT (see the comment above queries()): the driver
    snapshots the FIRST 50 queries() entries as its hard value gate, so
    every operator family must keep >= 1 representative there — a future
    reorder must not silently drop one."""
    import __spark_entry__ as e

    first50 = set(list(e.queries())[:50])
    families = {
        "windows/sessions": {"turn_features", "sessionize", "window_fills",
                             "turn_features_segmented"},
        "survival": {"km_survival"},
        "asof": {"asof_prior_purchase"},
        "transcript-qa": {"role_sequence_audit"},
        "behavior": {"event_transitions", "next_purchase"},
        "documents": {"request_doc_features", "request_doc_nested"},
        "graphql": {"request_graphql_doc"},
        "validation": {"value_validation"},
        "json-extraction": {"event_props_extract"},
        "sources": {"shows_reshaped"},
        "scalar-functions": {"golden_scalars", "doc_list_ops"},
        "jq": {"jq_transformers"},
        "aggregations": {"pricing_summary", "event_sequences"},
        "joins": {"top_nations_revenue"},
        "feature-store": {"store_lifecycle", "incremental_refresh",
                          "scd2_point_read"},
        "intervals": {"interval_context"},
        "streaming": {"stream_turn_features", "stream_disorder_features",
                      "stream_dedup"},
        "dedup": {"dedup_exact", "minhash_lsh_pairs", "ngram_jaccard_pairs",
                  "dup_clusters", "dup_span_stats"},
        "privacy": {"k_anonymity_summary"},
        "scaling": {"feature_scaling"},
        "data-quality": {"quality_checks", "feature_parity_diff"},
        "similarity": {"ann_cosine_topk"},
        "retrieval": {"bm25_topk"},
        "backfill": {"bounded_backfill"},
        "sketches": {"kmv_distinct", "cms_tokens"},
        "agreement/eval": {"rater_agreement", "group_auc"},
        "sampling": {"doc_split"},
        "bpe": {"bpe_pieces"},
        "curation-pipeline": {"corpus_pipeline"},
        "text-analysis": {"lang_id"},
        "lm-scoring": {"doc_perplexity"},
        "multimodal": {"media_features"},
    }
    missing = {fam: reps for fam, reps in families.items()
               if not (reps & first50)}
    assert not missing, (
        f"operator families with no first-50 representative: {missing}"
    )
