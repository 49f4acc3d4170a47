from nimhdfstore_spark.streaming.scrub import (  # noqa: F401
    pii_scrub_stream,
    temperature_sample_stream,
)
from nimhdfstore_spark.streaming.windows import (  # noqa: F401
    dedup_events_stream,
    purchase_attribution_stream,
    session_window_stream,
    stream_into_store,
    sessionize_batch,
    sliding_counts_stream,
    tumbling_counts_batch,
    tumbling_counts_stream,
    user_totals_stateful_stream,
)
