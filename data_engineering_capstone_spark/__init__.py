"""data_engineering_capstone_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference capstone repo (``dangkhoipham/data_engineering_capstone``), built
Spark-first: DataFrame/SQL logical plans, Catalyst optimization, broadcast
joins for small dims, partitioned parquet layout, Structured Streaming for
event streams, and Pandas-UDF-backed operators only where built-ins cannot
express the semantics (MinHash dedup, ANN search, multimodal decode).

Layout:
    session     -- SparkSession factory with scale-aware defaults
    sources     -- readers (csv/parquet/json/orc, SAS fallback), writers
    operators   -- relational core: joins, aggs, windows, set ops, as-of
    functions   -- scalar function library: dates (SAS epoch), strings, json
    etl         -- reference-shaped I94 star-schema pipeline + quality checks
    llm         -- dedup / similarity / text-analysis / multimodal operators
    streaming   -- Structured Streaming windowed aggregations + stateful dedup
    catalog     -- the query catalog driving __spark_entry__.py
"""

__version__ = "0.1.0"
