"""sparkprep — a PySpark-native EDA / data-preparation / pipeline engine.

Re-implements the capability surface of the reference corpus
(aekanun2020/2022Q1-PySpark-EDA-DataPrep-Automate, surveyed in SURVEY.md)
as a reusable, idiomatic Spark library:

- ``sparkprep.session``   — SparkSession factory (AQE, Arrow, sane defaults)
- ``sparkprep.sources``   — readers (csv/text/log/jdbc/parquet) and writers
- ``sparkprep.operators`` — profile / clean / dedup / transform / sample /
                            text / similarity / features / multimodal
- ``sparkprep.functions`` — native-expression replacements for the
                            reference's row-at-a-time Python UDFs
- ``sparkprep.plans``     — composable pipeline steps with timing and
                            row-conservation reports
- ``sparkprep.streaming`` — Structured Streaming path for what the
                            reference approximated with 15-min batch reruns

Design rules (SURVEY.md §4):
- DataFrame/SQL only; no RDDs in the hot path.
- No row-at-a-time Python UDFs — every reference UDF (X1-X11) is a native
  Catalyst expression here; Python appears only as Arrow-batched pandas
  UDFs where built-ins genuinely cannot express the semantics.
- Scalars (min/max/avg) for normalization/imputation are computed in ONE
  aggregate job, never one collect() per scalar.
- Partitioning is AQE-driven; nothing hard-codes ``repartition(60)``.
"""

__version__ = "0.1.0"
