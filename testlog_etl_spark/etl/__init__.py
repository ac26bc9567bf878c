"""ETL document transforms (SURVEY SS2.8 T1-T10), Spark-first.

The reference (activedata_etl/transforms/) walks documents row-at-a-time
in Python; here every transform is a DataFrame -> DataFrame function so
Catalyst fuses parse/filter/project into one codegen stage and the same
code serves batch and `foreachBatch` streaming (SS2.9).
"""
