"""LLM-data-pipeline operators (SURVEY.md §2 B18-B23).

The north-star extensions beyond the reference's CDC surface: corpus
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard), vector
similarity search, text analysis (lang-ID, quality, tokens, fingerprints),
and multimodal binary columns. All designed shuffle-light for 100 TB: band
buckets instead of all-pairs, broadcast query sides, built-in functions
(JVM codegen) in every hot path.
"""
