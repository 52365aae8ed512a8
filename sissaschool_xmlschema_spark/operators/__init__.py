"""Distributed check operators: identity constraints, content models, stats,
drift, dedup, similarity, text analysis, multimodal plumbing."""
