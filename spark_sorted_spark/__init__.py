"""spark_sorted_spark — a PySpark-native engine with the query and
data-processing capabilities of tresata/spark-sorted, re-expressed in
DataFrame/Catalyst idioms, plus large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal).

Public surface:

* ``group_sort(df, keys, order_by=...)`` → ``GroupSortedFrame`` — the
  layout builder (one shuffle + partition-local secondary sort).
* ``GroupSortedFrame`` methods: ``filter`` / ``map_values`` /
  ``flat_map_values`` / ``map_key_values_to_values`` (narrow, layout
  preserving); ``map_stream_by_key`` / ``fold_left_by_key`` /
  ``reduce_left_by_key`` / ``scan_left_by_key`` (per-key streaming
  ops); ``merge_join*`` / ``merge_union`` (sort-merge joins & union).
* ``spark_sorted_spark.functions`` — dedup (incl. the appendable
  incremental band store) / clusters (connected-components
  canonicalization) / similarity (incl. persisted ANN indices and the
  batch k-NN join) / text (incl. PII redaction, vocabulary, Gopher
  repetition filters) / packing (sequence packing) / sketches
  (portable HLL, Bloom, count-min, and the HDR-style quantile
  histogram) / layout (Z-order clustering for multi-column parquet
  pruning) / multimodal (real stdlib WAV/BMP/PNG decode + resize) /
  sampling operator library.
* ``spark_sorted_spark.streaming`` — Structured Streaming tier
  (windowed/session aggregation, streaming dedup, stateful per-key
  fold, stream-stream join, and the ingest-dedup loop).
* ``spark_sorted_spark.operators.skew`` — salted two-stage
  aggregation; ``spark_sorted_spark.sources.bucketed`` — persistent
  bucketed/partitioned layouts.
"""

from .core import GroupSortedFrame, OrderSpec, assume_group_sorted, group_sort
from .session import get_spark

__all__ = [
    "GroupSortedFrame",
    "OrderSpec",
    "assume_group_sorted",
    "group_sort",
    "get_spark",
]

__version__ = "0.4.0"
