"""Extension operators for large-scale data pipelines (SURVEY §2.D):
dedup (exact / MinHash / SimHash / n-gram Jaccard), similarity search,
text analysis, as-of joins, grouped top-k, multimodal column plumbing."""
