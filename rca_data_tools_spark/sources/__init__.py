from rca_data_tools_spark.sources.readers import TABLES, load_table, load_tables  # noqa: F401
