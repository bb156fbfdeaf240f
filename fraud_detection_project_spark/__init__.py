"""fraud_detection_project_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``metasebiya/fraud-detection-project``
(a single-process pandas/sklearn fraud-feature pipeline), extended with
the operators a large-scale training-data pipeline needs (dedup,
similarity search, text analysis, streaming velocity features).

Everything is declared through the DataFrame / SQL API so Catalyst and
Tungsten pick the physical strategy; Python only crosses the JVM boundary
in Arrow-batched Pandas UDFs (SMOTE interpolation, embedding ops) — never
row-at-a-time.

Layout
------
- ``session``    SparkSession builder tuned for the target scale
- ``catalog``    explicit-schema table loading + temp-view registry
- ``config``     YAML config loading (reference: src/utils/config_loader.py)
- ``functions``  columnar scalar functions (ip, time, text, vectors)
- ``operators``  relational + data-pipeline operators (cleaning, joins,
                 windows, aggregates, dedup, similarity, multimodal)
- ``ml``         split / preprocessing / class-imbalance (MLlib-backed)
- ``pipeline``   end-to-end fraud prep pipeline (reference: processor.py)
- ``streaming``  Structured Streaming velocity features
"""

__version__ = "0.1.0"
