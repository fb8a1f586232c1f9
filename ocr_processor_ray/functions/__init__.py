"""Training-data operations beyond the reference's own operator set:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search, text analysis, multimodal plumbing, relational
helpers (broadcast + bucketed joins)."""
