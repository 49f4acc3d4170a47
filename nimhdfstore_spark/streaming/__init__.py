from nimhdfstore_spark.streaming.windows import (  # noqa: F401
    sessionize_batch,
    tumbling_counts_batch,
    tumbling_counts_stream,
    user_totals_stateful_stream,
)
