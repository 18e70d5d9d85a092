from rca_data_tools_spark.functions import numeric, qc, text, vectors  # noqa: F401
