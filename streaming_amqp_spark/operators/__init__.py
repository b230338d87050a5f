"""LLM-data-pipeline operators (SURVEY.md §2C north-star extras): dedup,
similarity search, text analysis, multimodal columns — each designed for
100 TB scale (no driver-side collects, broadcast-able small sides, shuffle
only on the keys the algorithm requires)."""
