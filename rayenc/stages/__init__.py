"""Training-data pipeline stages beyond the reference's operator set.

The reference has no text analysis, dedup, or similarity ops
(SURVEY.md §2.5); these are the large-scale-training-pipeline additions
required by the brief: text analysis (lang-id, quality, tokens,
fingerprints), deduplication (exact, MinHash-LSH, SimHash, embedding
cosine, duplicated-substring span removal), PII scrubbing, document
chunking, benchmark decontamination, ANN search, and multimodal
plumbing stubs. All are
Dataset-first map_batches stages; shuffles only where semantics demand
(LSH bucket groupbys).
"""
