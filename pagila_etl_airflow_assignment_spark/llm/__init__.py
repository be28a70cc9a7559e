"""Large-scale training-data-pipeline operators (BASELINE.json north star).

Beyond the reference's own surface: deduplication (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine), similarity search (brute-force + LSH ANN),
text analysis (language-ID, quality scoring, token counting, fingerprinting),
and multimodal binary-column plumbing. All designed Spark-first: built-in
columnar expressions wherever possible, Arrow-batched Pandas UDFs only where
semantics genuinely require Python.
"""
