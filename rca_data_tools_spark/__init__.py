"""rca_data_tools_spark — a PySpark-native analytics engine with the data
semantics of OOI-CabledArray/rca-data-tools (QA/QC dataflow over instrument
time-series), re-expressed Spark-first, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).

Layers
------
- ``session``   : SparkSession factory tuned for local testing and cluster scale.
- ``sources``   : readers for the engine's table formats (parquet/csv/json).
- ``functions`` : scalar/array column function library (QC bitmasks, positional
                  flags, vector math, text metrics).
- ``operators`` : relational + domain operators (interval/as-of joins,
                  climatology flagging, LTTB decimation, interpolation, dedup,
                  similarity search, sessionization).
- ``plans``     : config-driven calculation registry (CSV rows -> Column plans),
                  mirroring the reference's declarative UDF registry
                  (reference: rca_data_tools/qaqc/utils.py:327-358).
- ``streaming`` : Structured Streaming forms of the windowed operators.

All compute is DataFrame/SQL so Catalyst handles pruning, pushdown, join
planning and whole-stage codegen; Python kernels are confined to Arrow-batched
``applyInPandas``/``mapInPandas`` where semantics require (LTTB, per-row
least-squares, media decode).
"""

__version__ = "0.1.0"

from rca_data_tools_spark.session import get_spark  # noqa: F401
