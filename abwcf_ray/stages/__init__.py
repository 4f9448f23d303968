"""Ray Data batch transforms for the crawl pipeline and the training-data
operators (dedup, text analysis, similarity search, multimodal plumbing)."""
