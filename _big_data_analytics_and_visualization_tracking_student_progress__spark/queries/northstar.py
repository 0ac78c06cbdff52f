"""North-star LLM-data-pipeline queries (dedup, similarity, text analysis,
multimodal) — filled in incrementally."""
