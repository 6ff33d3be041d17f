"""LLM-data-pipeline operator library (SURVEY §2.11): deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(language-ID, quality scoring, token counting, TF-IDF, fingerprints),
and multimodal binary columns.

Everything stays JVM-side (built-in functions over exploded shingles /
higher-order array ops) except the clearly-marked pandas-UDF paths.
"""

from sora_spark.llm import ann, curate, dedup, multimodal, textstats  # noqa: F401
