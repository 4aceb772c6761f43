"""PySpark-native analytics engine with the query and data-processing
capabilities of ``DavidChuhongWang/Distributed-Vector-Search-System``.

The reference is a 3-node C++ exact-kNN vector search engine (per-shard
FAISS flat-L2 indices, OpenMP shard fan-out + top-k merge, LRU+TTL query
cache, Raft-replicated upsert/delete log).  This package re-expresses the
same capabilities Spark-first:

- ``engine``              — VectorEngine: the 5-RPC service surface as
                            library calls (consistency gates, caches,
                            persisted-index serving per snapshot epoch)
- ``text_engine``         — TextEngine (BM25 serving + doc mutations
                            under the same discipline) and HybridEngine
                            (fused lexical+vector front door; optional
                            learned-sparse third leg = trimodal serving)
- ``sparse_engine``       — SparseEngine: the learned-sparse surface
                            under the same gates/epochs/O(Δ)-store
                            discipline (model-encoded snapshots)
- ``operators.knn``       — exact kNN / batch kNN (reference Q1-Q6)
- ``operators.mutations`` — upsert/delete mutation log + last-writer-wins
                            compaction (reference M1-M4, R11)
- ``operators.cache``     — query-result cache, LRU+TTL (reference C1-C4)
- ``operators.dedup``     — exact / MinHash-LSH / SimHash / n-gram-Jaccard /
                            embedding-cosine dedup (north-star extensions)
- ``operators.similarity``— brute-force + LSH-bucketed ANN
- ``operators.asof``      — as-of / range joins composed from built-ins
- ``functions``           — distance kernels, portable hashing, text analysis
- ``streaming``           — mutation-log replay via foreachBatch, event windows
- ``sources``             — schema-checked parquet readers, config

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join strategy and AQE; Python only appears in Arrow-batched pandas UDF /
mapInPandas kernels on the numeric hot path.
"""

__version__ = "0.1.0"
