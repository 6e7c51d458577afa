from ddataframeoperation_spark.streaming.ingest import (
    read_corpus,
    stream_dedup_ingest,
)
from ddataframeoperation_spark.streaming.stateful import (
    running_totals_per_user,
    running_totals_per_user_tws,
    token_budget_admission,
)
from ddataframeoperation_spark.streaming.windows import (
    bounded_state_partitions,
    events_as_stream,
    run_with_late_replay,
    tumbling_counts,
    sliding_counts,
    session_window_agg,
    stream_dedup,
    stream_interval_join,
    run_to_memory,
    ohlc_stream,
    stream_psi_bucket_counts,
    stream_daily_actives,
)

__all__ = [
    "bounded_state_partitions",
    "events_as_stream",
    "run_with_late_replay",
    "tumbling_counts",
    "sliding_counts",
    "session_window_agg",
    "stream_dedup",
    "stream_interval_join",
    "run_to_memory",
    "ohlc_stream",
    "stream_psi_bucket_counts",
    "stream_daily_actives",
    "running_totals_per_user",
    "running_totals_per_user_tws",
    "token_budget_admission",
    "stream_dedup_ingest",
    "read_corpus",
]
