"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference medical-data ETL pipeline
(amosjames334/Cloud-Native-Medical-Data-ETL-Pipeline), rebuilt Spark-first.

Layout:
    session     SparkSession factory tuned for batch ETL at scale
    schemas     explicit StructType contracts for every logical table
    functions/  pure Column-expression kernels (medical, text, vectors)
    operators/  DataFrame -> DataFrame transforms (transforms, enrich,
                quality, dedup, similarity, multimodal)
    sources/    ingestion (paginated REST fetch, partitioned lake IO)
    plans/      end-to-end pipeline assembly (run(date))
    streaming/  Structured Streaming ingestion of the events stream

Design stance (SURVEY.md §7.1): every reference semantic compiles to
native Spark column expressions — zero row-at-a-time Python UDFs on the
hot path — so Catalyst sees one lazy plan per pipeline run and
whole-stage codegen stays unbroken.
"""

__version__ = "0.1.0"
