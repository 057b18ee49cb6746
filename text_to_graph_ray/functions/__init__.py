"""Large-scale training-data operations: deduplication (exact / MinHash-LSH /
SimHash / n-gram Jaccard / embedding-cosine / connected-component survivors),
similarity search (brute-force / LSH / IVF), text analysis + vocabulary,
deterministic sampling, embedding aggregates, multimodal column plumbing."""
