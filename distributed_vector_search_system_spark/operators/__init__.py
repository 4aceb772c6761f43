from .knn import grouped_topk, knn, merge_topk, range_search, shard_cardinality, warm  # noqa: F401
from .retrieval import bm25_topk, hybrid_rrf_topk, mmr_rerank, rrf_fuse  # noqa: F401
from .similarity import ann_ivf_topk, ann_lsh_topk, cosine_topk, knn_join  # noqa: F401
from .mutations import MutationLog, apply_mutations  # noqa: F401
from .chunking import chunk_documents  # noqa: F401
from .paragraphs import paragraph_dedup  # noqa: F401
from .pq import pq_adc_topk, pq_encode, pq_fit, pq_sample_codebooks  # noqa: F401
from .sampling import hash_sample, hash_split, stratified_sample  # noqa: F401
from .sparse import (  # noqa: F401
    cap_postings,
    fuse_weighted,
    prune_postings,
    sparse_encode,
    sparse_encode_queries,
    sparse_topk,
)
from .facets import (  # noqa: F401
    facet_counts,
    facets_for_hits,
    histogram_facet,
    histogram_for_hits,
    significant_terms,
    topn_facet_counts,
)
from .snippets import best_window_snippets  # noqa: F401
from .boolean import boolean_matching_ids, boolean_matching_ids_index  # noqa: F401
from .mlt import bm25_mlt_topk, mlt_select_terms  # noqa: F401
from .scoring import decay_factor, field_value_factor, function_score  # noqa: F401
from .matryoshka import matryoshka_topk, prefix_cosine_topk, prefix_vector  # noqa: F401
from .contamination import contamination_overlap, decontaminate  # noqa: F401
from .percolate import percolate, percolate_scored, percolate_stream  # noqa: F401
from .synonyms import expand_query_terms, sparse_synonym_topk  # noqa: F401
from .pagination import page_cursor, search_after  # noqa: F401
from .rank_eval import mean_rank_eval, rank_eval  # noqa: F401
from .querydsl import search_dsl, search_request  # noqa: F401
from .phrase import phrase_slop_topk, phrase_topk, proximity_topk  # noqa: F401
from .sampling import budget_pack, temperature_sample  # noqa: F401
