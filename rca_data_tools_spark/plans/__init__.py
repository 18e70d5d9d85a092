from rca_data_tools_spark.plans.registry import CalcRegistry, CalcSpec  # noqa: F401
