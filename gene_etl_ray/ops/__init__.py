"""Operator library: relational query shapes (SURVEY §2 families),
training-data ops (dedup, text analysis, similarity search), and
multimodal stage plumbing. Everything is Ray-Data-first: vectorized
map_batches over Arrow/pandas batches, partial aggregation before
shuffles, broadcast small sides."""
