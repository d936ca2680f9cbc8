"""LLM-training-data pipeline operators: dedup, similarity search,
text analysis, multimodal column plumbing. All hot paths are JVM
built-ins (higher-order array functions, hash-groupBy, broadcast joins);
Python appears only in the clearly-marked multimodal decode stubs.
"""
