"""Driver-style differential test: every registered query with an oracle
must match DuckDB at sf=0.01 (the driver's t2 correctness gate).

Covers BOTH tiers: the driver-verified first-50 window and the
EXTRA_QUERIES pytest tier (same comparison, local only)."""

from __future__ import annotations

import pytest

from distributed_vector_search_system_spark import registry

from .oracle_util import compare

_QUERIES = registry.all_queries()
_ORACLES = registry.all_oracle_sql()


def test_registry_row_counts():
    """Pin the registry composition so SURVEY.md's prose cannot drift
    from the code again (VERDICT r07 bookkeeping item): update these
    numbers — and the SURVEY close — together, deliberately."""
    assert len(registry.queries()) == 50
    assert len(registry.extra_queries()) == EXPECTED_EXTRA
    # every driver-window row is oracled; the pytest tier may hold
    # genuinely non-SQL-expressible entries (numpy-verified instead)
    assert len(registry.oracle_sql()) == 50
    assert len(registry.extra_oracle_sql()) == EXPECTED_EXTRA_ORACLED


#: pytest-tier row count / oracled subset — bump when adding operators
# r09: + sparse_topk, sparse_pruned_topk, sparse_index_topk,
# hybrid_weighted, sparse_store_mutations, sparse_engine_store (the
# learned-sparse family incl. its engine surface and the champion
# rank-capped tier sparse_champion_topk), bm25_boolean (AND/OR/NOT
# admissibility under ranking),
# hybrid_trimodal (all three legs fused), doc_facets, bm25_facets
# (faceted search), search_snippets (highlighting), retention_delete
# (bulk store sweep) — all exact-oracled
# r10: + maxsim_retention_delete (token-store bulk retention sweep
# after a mutation push, fold-then-filter oracle), sparse_rescore_topk
# (champion candidates + exact rescore, two-stage SQL replay), and the
# query-understanding family: bm25_fuzzy_topk (edit-distance expansion,
# levenshtein oracle), prefix_complete (autocomplete, starts_with
# oracle), bm25_collapse (field collapsing), bm25_prf_topk (pseudo-
# relevance feedback, full two-pass SQL replay)
# r10 (cont.): + bm25_mlt_topk (more-like-this: tf-idf term selection
# from seed docs + BM25 second pass, full two-pass SQL replay),
# function_score_boost / function_score_decay (field-value-factor and
# gaussian-decay composition onto the BM25 leg), ann_matryoshka_topk
# (d'-prefix coarse shortlist + exact full-dim rescore, two-stage
# replay) — all exact-oracled
# r10 (cont.): + contamination_overlap / decontaminate_docs (benchmark
# n-gram decontamination: per-(doc, item) shared-shingle audit and the
# drop-contaminated verb) — both exact-oracled
# r10 (cont.): + percolate_matches (reverse search: docs vs stored
# boolean queries with min_match + negative veto) and
# sparse_synonym_topk (two-channel thesaurus expansion over the
# tf-idf postings) — both exact-oracled
# r10 (cont.): + doc_histogram / bm25_hits_histogram (fixed-interval
# histogram aggregations, corpus and per-match-set) and bm25_sig_terms
# (significant terms, JLH vs corpus background) — all exact-oracled
# r10 (cont.): + bm25_page2 (stateless search_after pagination: page-1
# cursor resumes the ranking exactly, max-rank cursor semantics) —
# exact-oracled
# r10 (cont.): + bm25_rank_eval (offline ranking evaluation: per-query
# nDCG@k / MRR / P@k / R@k vs sparse-derived pseudo-qrels) —
# exact-oracled
# r10 (cont.): + percolate_scored (the boolean match set with per-pair
# BM25 relevance for alert prioritization) — exact-oracled
# r11: + percolate_store_matches (mutable standing-query registry:
# percolation after register + update + unregister equals the
# fold-then-match replay, per-query min_match incl. NULL="all") —
# exact-oracled.  The r11 opening rotation also moved six r10
# flagships into the driver window and six long-green rows out (counts
# unchanged).
# r11 (cont.): + function_score_recency (ES date-decay over the events
# fixture's timestamps: per-user last-event age in days composed onto
# the BM25 leg — origin "now", offset plateau, exp decay) —
# exact-oracled
# r11 (cont.): + events_extended_stats / events_percentiles /
# events_top_hits / docs_source_cardinality (the ES metric-aggregation
# family: population extended stats, exact interpolated percentiles,
# per-bucket top hits, exact cardinality — approximate GK/HLL tiers
# are property-tested in tests/test_aggregations.py) — all
# exact-oracled
# r11 (cont.): + spell_suggest / bm25_spell_topk (the term suggester —
# "did you mean" — and its single-best-correction retrieval
# composition; sixth query-understanding verb) and bm25_stemmed_topk
# (index-time analysis chain: stopword removal + S-stemming rewriting
# the indexed text, plural queries matching singular docs through the
# unmodified BM25) — all exact-oracled
# r11 (post-close): + events_date_histogram / events_pipeline_daily
# (calendar date_trunc buckets; cumulative_sum / derivative /
# moving_avg pipeline aggregations over the bucketed series),
# bm25_boosting (ES boosting query: soft negative demotion composed
# onto the BM25 leg), pii_audit_extended (four-class PII audit +
# scrub: url/email/phone/IPv4 in scrub order) — all exact-oracled.
# The r11 close rotation moved six r11 flagships into the driver
# window and six long-green rows out (counts unchanged).
# r11 (post-close, cont.): + docs_composite_page2 (ES composite
# aggregation: stateless bucket pagination, cursor predicate below the
# aggregate), events_matrix_stats (pairwise covariance/correlation),
# docs_rare_terms (long-tail vocabulary with spliced canaries),
# function_score_random (seeded deterministic random_score via the
# portable content hash) — all exact-oracled
# r11 (post-close, cont.): + doc_term_vectors (ES _termvectors:
# per-doc tf / 0-based positions / corpus df for a requested id set)
# and multi_index_topk (cross-index search with per-index boost —
# per-language corpora each scored with their OWN BM25 statistics,
# (index, id) result identity) — both exact-oracled
# r11 (post-close, cont.): + bm25_wildcard_topk (wildcard term
# queries: */? anchored whole-term expansion over the vocabulary, the
# fourth term-level query type) and cluster_balanced_sample (topic-
# quota subsampling: per-embedding-cluster cap chosen by portable hash
# — the post-dedup representation balancer) — both exact-oracled
# r11 (post-close, cont.): + dsl_bool_topk (the query-DSL front door's
# bool path, full SQL replay — every other DSL node type is
# equivalence-tested against its already-oracled operator in
# tests/test_querydsl.py) — exact-oracled
# r11 (post-close, cont.): + bm25_explain (ES _explain: per-term BM25
# score decomposition of requested (query, doc) pairs; pair weights
# sum to the ranked score; corpus-level df) — exact-oracled.  The DSL
# also gained a match_phrase node and the gated TextEngine.search_dsl
# / explain verbs.
# r12 (opening rotation, VERDICT r11 item 1): six never-driver-verified
# r11 addendum flagships promoted into the driver window
# (dsl_bool_topk, bm25_explain, multi_index_topk, bm25_wildcard_topk,
# events_date_histogram, docs_composite_page2); six long-green rows
# demoted with identical oracles (bm25_topk, hybrid_weighted,
# percolate_matches, bm25_boolean, bm25_fuzzy_topk,
# function_score_boost) — counts unchanged.
# r12: + dsl_query_aggs (full ES request composition: query + aggs +
# post_filter in one call; aggregations over the ENTIRE match set,
# post_filter restricting hits only; long-format single-statement
# DuckDB replay of both halves) — exact-oracled
# r12: + phrase_slop_topk (ES match_phrase with slop: adjusted-anchor
# window acceptance, transposition costs 2, covering-start counts;
# full SQL replay; DSL match_phrase node takes slop) — exact-oracled
# r12: + percolate_stream_store (push pipeline end-to-end: registry
# mutations by streaming_log_sink across a sink restart, then the
# corpus as a doc stream percolated across a checkpoint restart —
# shares percolate_store_matches' fold-then-match oracle verbatim)
# r12: + dsl_rescore_topk (ES rescore: phrase-rescore of the k-bounded
# window, score_mode contract incl. non-matching docs keeping
# query_weight·original, window ids broadcast into the second pass;
# both passes replayed in one DuckDB statement) — exact-oracled
# r12: + dsl_terms_subaggs (ES nested metric sub-aggregations inside a
# terms bucket, computed in the bucket's single hash aggregate —
# avg/min/max/value_count/exact-cardinality per bucket) — exact-oracled
# r12: + dsl_sorted_page2 (search_after on a FIELD SORT: strictly-
# after lexicographic cursor incl. the id tiebreaker, filtered on raw
# rows below the top-k window; oracle = rows 11..20 of the admissible
# set's total order) — exact-oracled
# r12: + dsl_knn_hybrid (ES top-level knn + query: BM25 + boost ·
# l2_norm similarity 1/(1+d²), exact squared-L2 knn leg, union +
# one-hash-aggregate fusion, no full-outer join — plan-locked) —
# exact-oracled
# r12: + dsl_bool_filter_topk (ES filter context: unscored metadata
# range/term/exists clauses ANDed into the bool admissible set,
# predicate pushed to the parquet scan, scores corpus-level) —
# exact-oracled
# r12: + budget_pack_by_source (token-budget packing: per-source
# greedy best-quality-first prefix under a fixed token budget — the
# corpus-budgeting step; window cum-sum replay, 208/500 kept at
# sf0.01) — exact-oracled
# r12 (close rotation): six round-12 flagships promoted into the
# driver window (dsl_query_aggs, phrase_slop_topk,
# percolate_stream_store, dsl_rescore_topk, dsl_knn_hybrid,
# dsl_bool_filter_topk); six long-green rows demoted with identical
# oracles (bm25_mlt_topk, bm25_prf_topk, bm25_sig_terms, doc_facets,
# events_top_hits, sparse_rescore_topk) — counts unchanged.
# r12 (post-close): + dsl_min_should_topk (ES minimum_should_match:
# should requires >= N distinct matched terms — the all_of aggregate
# generalized; unsatisfiable N returns nothing; scores untouched;
# scratch == indexed boolean form tested) — exact-oracled
# r12 (post-close): + dsl_multi_match_topk (ES multi_match: the same
# terms scored against several text fields, each with its OWN corpus
# statistics and a ^boost; best_fields/most_fields combine as one
# union + hash aggregate; title field synthesized via list_slice) —
# exact-oracled
# r12 (post-close): + dsl_constant_score (ES constant_score:
# filter-context matching with relevance off — every admitted doc
# scores exactly boost, page = first k admissible ids) — exact-oracled
# r12 (post-close): + bm25_stemmed_index_topk (the index-time analysis
# chain actually hitting a persisted posting index written over the
# analyzed text — shares bm25_stemmed_topk's oracle verbatim by the
# index's exactness contract) and dsl_fields_page (doc-value fields on
# the page + from-offset slicing: hit ids broadcast-semi-restrict the
# pruned attribute scan; the request also gained track_total_hits) —
# both exact-oracled
# r12 (post-close): + dsl_request_sigterms (significant_terms as a
# request aggregation over the query's FULL match set — foreground =
# every admissible doc, background = the whole corpus; the aggs body
# also gained the non-extended "stats" kind) — exact-oracled
# r13: + dsl_knn_filtered (pre-filtered kNN: knn.filter restricts the
# candidate vectors BEFORE the top-k cut, plus post_filter over the
# fused hybrid hits — full filter → top-k → fusion → post_filter
# replay), dsl_nested_buckets (bucket-in-bucket: terms-in-terms with a
# grandchild metric in ONE composite hash aggregate + parent size
# shaping), dsl_msearch (THREE heterogeneous requests through one
# multi-query plan — constraints as a VALUES relation, one
# admissibility aggregate, shared-statistics BM25, per-request k), and
# dsl_msearch_aggs (same-named aggs across requests as ONE
# query_id-labeled grouped aggregate) — all exact-oracled
# r13 (cont.): + dsl_range_aggs (ES range buckets — [from, to) with
# deliberate OVERLAP via a membership-array explode into one hash
# aggregate; filters / missing share the shape, pytest-covered) and
# dsl_top_hits_buckets (top_hits as a terms sub-agg — per-bucket
# exemplar rows off the oracled window operator) — both exact-oracled;
# TextEngine also gained the gated msearch batch verb
# r13 (cont.): + dsl_dis_max (best-clause-wins compound: one UNION of
# the legs' full scored sets + one hash aggregate, max + tie·(sum−max))
# and dsl_collapse_page (field collapsing through the request front
# door — exact over the FULL scored match set, per-group window below
# the global re-rank) — both exact-oracled
# r13 addendum: + dsl_filter_agg (the single-bucket filter agg with
# metric sub-aggs, driven through a bool whose filter context uses the
# new terms IN-list clause); ids query node, global agg, and top-level
# metric agg kinds are pytest-covered
# r13 addendum (cont.): + dsl_min_score_topk (the ES score floor —
# rank-prefix semantics, score-qualified total); the suggest section
# (term suggester via the oracled spell operator) and explain=true
# (per-term BM25 decomposition of the page) are pytest-equivalence
# covered, as translation-only layers over driver-green operators
# r13 addendum (cont.): + dsl_boxplot (quartile distribution over the
# match set, quantile_cont tier) and dsl_sampler_agg (metrics over
# only the top-shard_size scored matches — BM25 → top-N → metrics in
# one replay); weighted_avg / percentile_ranks / msearch per-request
# from are pytest-covered
# r13 post-close addendum: + dsl_multi_terms (composite-field terms,
# one hash aggregate on the tuple + grandchild metric) and
# dsl_pipeline_histogram (cum_sum / derivative / moving_avg appended
# to a histogram via the oracled pipeline_aggs — windows over the
# bucket-sized series); the more_like_this DSL node is pytest-
# equivalence covered over the oracled bm25_mlt_topk
# r13 post-close addendum (cont.): + phrase_prefix_topk
# (match_phrase_prefix, search-as-you-type — prefix completed to the
# alphabetically-first max_expansions vocabulary terms; the
# disjunction rides the exact anchor intersection unchanged) — exact
# vocabulary→expansion→anchor replay; the DSL node is equivalence-
# tested
EXPECTED_EXTRA = 157
EXPECTED_EXTRA_ORACLED = 156


def test_driver_window_holds_all_llm_queries():
    """The external driver checks only the first DRIVER_LIMIT entries;
    regression-lock the round-1 failure mode (LLM queries past the
    cutoff)."""
    names = list(registry.queries())
    assert len(names) <= registry.DRIVER_LIMIT
    llm_names = set(registry.llm.QUERIES)
    assert llm_names <= set(names[: registry.DRIVER_LIMIT])


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, sf_oracle, name):
    df = _QUERIES[name](spark, sf_oracle)
    ok, msg = compare(df, _ORACLES[name], sf_oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_weak_check_runs(spark, sf_oracle, name):
    """Queries without an oracle still must run and return a stable schema."""
    df = _QUERIES[name](spark, sf_oracle)
    assert df.columns
    assert df.count() >= 0
