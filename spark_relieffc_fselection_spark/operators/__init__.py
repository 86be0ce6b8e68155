"""Dataflow operators (SURVEY.md §2): kNN join, RELIEF weighting,
redundancy statistics, greedy selection, dedup, similarity search,
text analysis, multimodal plumbing."""
