"""boltzmannclean_spark — a PySpark-native analytics engine.

A from-scratch re-architecture of the capabilities of
``facultyai/boltzmannclean`` (RBM-based missing-value imputation over
DataFrames; see SURVEY.md §2.A) extended with a full relational /
streaming / LLM-data-pipeline operator surface (SURVEY.md §2.B),
expressed Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst, Pandas UDFs only where built-ins cannot express the
semantics (the RBM itself).

Layout:
    session.py    — SparkSession builder (AQE on, UTC, tuned shuffle)
    sources/      — table catalog over the driver's parquet testdata
    plans/        — query registry: name -> (spark_fn, oracle_sql)
    operators/    — relational + LLM-pipeline operators, one module per family
    functions/    — reusable column expressions (vector math, text, hashing)
    ml/           — RBMImputer estimator/transformer (numpy CD-1, mapInPandas)
    streaming/    — Structured Streaming ops over the events table
"""

__version__ = "0.1.0"
