"""Distributed check operators: identity constraints, content models, stats,
drift, dedup, similarity, text analysis, curation (decontamination, PII,
mixture/sampling), multimodal plumbing."""
