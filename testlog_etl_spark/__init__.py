"""spark-jx: a PySpark-native analytics engine with the query and
data-processing capabilities of klahnakoski/TestLog-ETL (ActiveData-ETL).

Not a port: the reference is a row-at-a-time interpreted-Python JSON query
engine (JX) plus a queue-driven ETL; this package re-expresses the same
semantics as declarative Spark DataFrame plans so Catalyst/Tungsten pick
the physical strategy. Blueprint and operator inventory: SURVEY.md.

Layout
------
- ``session``      SparkSession factory tuned for local testing, designed
                   for cluster scale (AQE, shuffle partitions, Arrow).
- ``tables``       loaders for the driver's parquet star schema.
- ``expressions``  the JX expression -> pyspark Column compiler (SURVEY
                   SS2.2 E1-E31) with JX null/"missing" semantics.
- ``query``        the JX query runner: from/where/select/groupby/edges/
                   window/sort/limit/format (SURVEY SS3.1).
- ``operators``    edges+domains dense-cube machinery, window clauses.
- ``sources``      JSONL block source/sink, idempotent keyed sink (the
                   Elasticsearch-rollover stand-in), streaming sources.
- ``etl``          document transforms (SURVEY SS2.8 T1-T10).
- ``functions``    LLM-data-pipeline operators: dedup, similarity search,
                   text analysis, multimodal column plumbing.
- ``streaming``    Structured Streaming variants of the ETL jobs.
"""

__version__ = "0.1.0"
