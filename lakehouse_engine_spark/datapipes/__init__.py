"""Datapipes — LLM-training-data pipeline operators beyond reference parity.

Deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH/IVF ANN), text analysis
(language-ID, quality scoring, token counting, fingerprinting) and multimodal
binary-column plumbing. All operators are built from JVM-side
``pyspark.sql.functions`` (higher-order array functions, no Python UDFs in
the hot path) and register in the engine's TransformerFactory.
"""

from lakehouse_engine_spark.datapipes import (  # noqa: E402,F401 — populate registry
    bpe,
    clustering,
    dedup,
    diff,
    embeddings,
    events,
    graph,
    history,
    joins,
    layout,
    multimodal,
    numeric,
    profiling,
    sampling,
    similarity,
    stateful,
    text,
)
