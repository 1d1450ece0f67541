"""Training-data pipeline operators (dedup, text analysis, similarity, multimodal)."""
