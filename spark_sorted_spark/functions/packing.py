"""Sequence packing: assign documents to fixed-token-budget training
packs (the GPT-style concat-and-chunk batch assembly step).

Training pipelines concatenate a deterministic document stream and
chunk it into fixed-size context windows; the packing table — which
pack(s) each document lands in — is what the data loader and any
contamination audit consume. ``pack_sequences`` computes exactly the
concat-and-chunk accounting: documents are ordered deterministically
inside each group (and optional shard), token offsets come from one
running-sum window, and a document spanning a chunk boundary reports
every pack it touches (``pack_first``..``pack_last``).

All integer arithmetic (token counts, running sums, ``div`` pack
ids) — bit-exact against the DuckDB oracle with no float tolerance.

Scale design (100 TB corpus): a single global document order is
inherently sequential, so the window would funnel each group through
one task. ``n_shards`` subdivides every group by ``doc_id % n_shards``
BEFORE packing — each shard packs independently (its own pack-id
space), so parallelism is ``groups × shards`` and the only cost is one
partially-filled final chunk per shard. That is the standard
trade-off real loaders make (shard-local packing, shard handoff never
crosses workers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    n_shards: int | None = None,
) -> DataFrame:
    """Concat-and-chunk pack assignment with ``budget`` tokens per
    pack. Output per document: ``(group_col[, shard], id_col,
    n_tokens, pack_first, pack_last, n_packs)`` where a document
    occupying token offsets ``[cum - n_tokens, cum)`` of its
    group/shard stream touches packs ``(cum - n_tokens) div budget``
    through ``(cum - 1) div budget``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    part = [group_col]
    pre = df
    if n_shards is not None:
        if n_shards <= 0:
            raise ValueError(f"n_shards must be positive, got {n_shards}")
        pre = df.withColumn("shard", F.col(id_col) % n_shards)
        part = [group_col, "shard"]
    w = (
        Window.partitionBy(*part)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        pre.withColumn("n_tokens", F.size(tokens(text_col)).cast("bigint"))
        .withColumn("cum_tok", F.sum("n_tokens").over(w))
        .withColumn("pack_first", F.expr(f"(cum_tok - n_tokens) div {budget}"))
        .withColumn("pack_last", F.expr(f"(cum_tok - 1) div {budget}"))
        .withColumn("n_packs", F.col("pack_last") - F.col("pack_first") + F.lit(1))
    )
    return out.select(
        *part, id_col, "n_tokens", "pack_first", "pack_last", "n_packs"
    )
