"""DataFrame operators: extraction, assembly, relational surface,
dedup, similarity, text analysis, multimodal plumbing."""
