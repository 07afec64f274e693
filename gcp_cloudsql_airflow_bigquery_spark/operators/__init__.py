"""LLM-data-pipeline operators (SURVEY.md §7 M4; north star in
BASELINE.json): deduplication, similarity search, text analysis, and
multimodal-column plumbing over the ``documents``/``embeddings`` tables."""
