"""Large-scale training-data pipeline operators.

Beyond the reference's own surface: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding cosine), approximate-nearest-
neighbor similarity search, text analysis (language id, quality,
tokenization, fingerprinting), and multimodal binary-column plumbing.
All designed partition-parallel: no driver-side collects, broadcast
only for genuinely small sides (query sets, hyperplanes).
"""
