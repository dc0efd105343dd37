from .ops import (
    fetch_rate_metrics,
    frontier_stream_dedup,
    stateful_host_budget_gate,
    stateful_refetch_gate,
    stream_exact_text_dedup,
    stream_quality_gate,
    stream_extract_articles,
    incremental_dedup_sink,
)

__all__ = [
    "frontier_stream_dedup",
    "fetch_rate_metrics",
    "stateful_host_budget_gate",
    "stateful_refetch_gate",
    "stream_exact_text_dedup",
    "stream_quality_gate",
    "stream_extract_articles",
    "incremental_dedup_sink",
]
