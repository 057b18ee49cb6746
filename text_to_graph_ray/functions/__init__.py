"""Large-scale training-data operations: deduplication (exact / MinHash-LSH /
SimHash / n-gram Jaccard / embedding-cosine), similarity search, text
analysis, multimodal column plumbing."""
