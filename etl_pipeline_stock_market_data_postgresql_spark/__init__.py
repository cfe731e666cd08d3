"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL pipeline
(``aviyadav/etl-pipeline-stock-market-data-postgresql``).

The reference (surveyed in ``SURVEY.md``) is an incremental stock-market
ETL that delegates query execution to PostgreSQL/DuckDB. This package
re-expresses (a) the ETL dataflow semantics and (b) the delegated query
surface as idiomatic Spark DataFrame / SQL plans, plus the
beyond-reference large-scale data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Layout:
    session     -- SparkSession factory tuned for local[32] + cluster
    schemas     -- explicit StructTypes for the stock star schema
    sources/    -- Alpha-Vantage-shaped payload parsing, table loaders, JDBC
    operators/  -- idempotent upsert, watermark, as-of join, dedup, similarity
    functions/  -- multi-format time parsing, text stats, vector math
    streaming/  -- Structured Streaming ingest (watermark + dropDuplicates)
    multimodal/ -- binary-column plumbing (decode stubbed; no media libs here)
    pipeline    -- end-to-end ETL lifecycle mirroring the reference's main()
"""

__version__ = "0.1.0"
