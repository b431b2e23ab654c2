from sparkprep.streaming.events import (  # noqa: F401
    dedup_stream,
    dedup_stream_within_watermark,
    enrich_stream,
    foreach_batch_incremental_dedup,
    foreach_batch_jdbc,
    join_streams,
    read_events_stream,
    run_available_now,
    sessionize_stream,
    windowed_agg_stream,
)
from sparkprep.streaming.scd import (  # noqa: F401
    foreach_batch_scd2,
    init_dimension,
    read_dimension,
)
