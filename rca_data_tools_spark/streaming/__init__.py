from rca_data_tools_spark.streaming.windows import (  # noqa: F401
    sessionized_counts,
    streaming_tumbling_agg,
    run_stream_to_memory,
)
