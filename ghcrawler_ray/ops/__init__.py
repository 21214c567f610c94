"""Training-data pipeline operators over Ray Data.

Beyond the reference's own crawl operators (SURVEY.md §2), these are the
operations a large-scale web-text training-data pipeline needs: dedup
families (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search (brute-force and partitioned ANN), text
analysis (language-ID, quality scoring, token counting, fingerprinting),
windowed / sessionized event aggregation, and multimodal binary-column
plumbing. Every op is a Ray Data pipeline (map_batches + groupby), is
deterministic, and — where SQL-expressible — ships a DuckDB oracle in
``__ray_entry__.oracle_sql`` with matching column names.
"""
