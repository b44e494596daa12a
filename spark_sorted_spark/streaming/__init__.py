"""Structured Streaming tier.

The reference has no continuous-query support — its "streaming" is
iterator-based single-pass batch processing (``README.md:4``, SURVEY
§2.6). This package extends the same key-grouped model to Spark
Structured Streaming: the per-key ordered fold becomes a stateful
streaming operator (``applyInPandasWithState``), the group-sorted
layout's per-key windows become event-time windows with watermarks,
and exact dedup becomes watermark-bounded streaming dedup.

Batch/stream parity contract: every op here, run over a bounded
stream with ``trigger(availableNow=True)``, produces the same relation
as its batch counterpart (modulo the documented cross-batch ordering
caveat on ``stream_fold_by_key``) — that is what the oracle gate
checks.
"""

from .ann import stream_index_embeddings
from .ingest import (
    stream_ingest_dedup,
    stream_maintain_ann_ivf_index,
    stream_maintain_ann_ivfpq_index,
    stream_maintain_ann_ivfsq8_index,
    stream_maintain_bm25_index,
    stream_maintain_gram_store,
)
from .ops import sessionize, stream_dedup, stream_stream_join, windowed_agg
from .run import run_available_now, stream_to_files
from .sketches import (
    compact_sketch_store,
    read_bloom,
    read_cms_cells,
    read_histogram,
    read_hll_estimate,
    read_hll_registers,
    read_kmv,
    read_kmv_estimate,
    stream_bloom,
    stream_cms_counts,
    stream_histogram,
    stream_hll_distinct,
    stream_kmv,
)
from .source import stream_table
from .stateful import stream_fold_by_key

__all__ = [
    "stream_index_embeddings",
    "stream_table",
    "windowed_agg",
    "sessionize",
    "stream_dedup",
    "stream_stream_join",
    "stream_fold_by_key",
    "stream_ingest_dedup",
    "stream_maintain_gram_store",
    "stream_maintain_bm25_index",
    "stream_maintain_ann_ivfpq_index",
    "stream_maintain_ann_ivf_index",
    "stream_maintain_ann_ivfsq8_index",
    "run_available_now",
    "stream_to_files",
    "stream_hll_distinct",
    "stream_kmv",
    "read_kmv",
    "read_kmv_estimate",
    "read_hll_registers",
    "read_hll_estimate",
    "stream_cms_counts",
    "read_cms_cells",
    "stream_histogram",
    "read_histogram",
    "stream_bloom",
    "read_bloom",
    "compact_sketch_store",
]
