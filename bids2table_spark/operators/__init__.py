"""DataFrame-level operators mirroring the reference's dataflow surface
(SURVEY.md §2) plus the large-scale training-data pipeline operators
(dedup, similarity search, text analysis)."""
