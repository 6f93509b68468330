"""Large-scale training-data operations over Ray Datasets.

Beyond the reference's own operator set (SURVEY.md §2): deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
search, text analysis (language ID, quality scoring, token counting,
fingerprinting), windowed event aggregation, and relational demos
(partial-aggregate groupbys, broadcast joins, top-k).
"""
