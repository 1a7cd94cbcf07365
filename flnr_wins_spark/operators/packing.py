"""Sequence packing: assign documents to fixed-token-budget training packs.

LLM pre-training concatenates documents into fixed-length sequences
("concat-and-chunk"). The distributed formulation: give every document a
deterministic position in a stable order, take the running token total, and
assign it to pack ``floor(start_offset / budget)`` — the pack a concatenated
stream would place its first token in.

A single global running sum would be one-partition at 100 TB (the classic
window-without-partition trap). So packing is SHARDED: documents are bucketed
by a content hash of their id into ``shards`` independent streams, and the
running sum windows over ``Window.partitionBy(shard)`` — every shard packs in
parallel, and the (shard, local pack) pair forms the global pack id. Shard
count scales with the cluster; order within a shard is (md5(id), id) — fully
deterministic, no rand(), engine-portable (the DuckDB oracle runs the same
expressions).

The reference has no notion of sequence assembly (it is a row-preserving
ETL); this is an engine extension for the LLM-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flnr_wins_spark.operators.split import split_bucket

# Bits reserved for the within-shard pack number in the composite pack id:
# 2^40 packs/shard. At a 512-token budget that is ~5.6e14 tokens per shard
# before overflow — three orders of magnitude past a 100 TB corpus even on a
# single shard — while leaving 23 high bits for the shard (long, sign-safe).
_LOCAL_PACK_BITS = 40


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shards: int = 32,
) -> DataFrame:
    """Add ``shard``, ``local_pack``, ``pack_id`` (global), and
    ``pack_offset`` columns.

    ``pack_offset`` is the document's first-token position within its shard's
    concatenated stream; ``local_pack = floor(pack_offset / budget)`` is the
    pack number within the shard, and ``pack_id = (shard << 40) | local_pack``
    composes the global id. (shard, local_pack) are also emitted separately so
    consumers never need to decode the composite. A shard overflowing 2^40
    packs raises at execution time rather than silently colliding into the
    next shard's id space. Documents longer than ``budget`` still get exactly
    one pack id (their head chunk's) — splitting oversized docs is the
    caller's decision.
    """
    sh = split_bucket(F.col(id_col), buckets=shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(token_col).cast("long")).over(w)
    offset = (running - F.col(token_col).cast("long")).alias("pack_offset")
    local = F.floor(F.col("pack_offset") / F.lit(budget))
    guarded_local = F.when(
        local < F.lit(1 << _LOCAL_PACK_BITS), local
    ).otherwise(
        F.raise_error(
            F.lit(f"pack_sequences: shard exceeded 2^{_LOCAL_PACK_BITS} packs; raise `shards`")
        )
    )
    return (
        df.withColumn("shard", sh)
        .withColumn("pack_offset", offset)
        .withColumn("local_pack", guarded_local)
        .withColumn(
            "pack_id",
            F.shiftleft(F.col("shard").cast("long"), _LOCAL_PACK_BITS)
            + F.col("local_pack"),
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split long documents into overlapping ``chunk_tokens``-sized windows —
    the 1->k complement of ``pack_sequences`` (packing groups short docs into
    a budget; chunking cuts long docs down to one).

    Emits (id, chunk_idx, chunk_n_tokens, chunk_text): chunk k starts at
    token ``k * (chunk_tokens - overlap)``; the last chunk may be short. A
    doc at or under the budget yields exactly one chunk (itself). Pure JVM
    higher-order expressions (split/sequence/slice/posexplode) over a narrow
    map + generate — no shuffle, no UDF; parallelism follows the scan's
    splits exactly like every other narrow curation pass.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    staged = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_tk")
    ).select(
        F.col(id_col),
        "_tk",
        # chunk count = 1 + ceil(max(0, n - chunk) / step); double arithmetic
        # is exact at any realistic doc length and matches the SQL oracle
        (
            F.lit(1)
            + F.ceil(
                F.greatest(F.size("_tk") - F.lit(chunk_tokens), F.lit(0))
                / F.lit(float(step))
            )
        ).cast("int").alias("_nc"),
    )
    exploded = staged.select(
        F.col(id_col),
        "_tk",
        F.posexplode(F.expr("sequence(0, _nc - 1)")).alias("chunk_idx", "_k"),
    )
    start = F.col("_k") * step + 1
    piece = F.slice("_tk", start, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.size(piece).cast("bigint").alias("chunk_n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def pack_texts(
    packed: DataFrame,
    id_col: str,
    text_col: str,
    eos: str = "<|eos|>",
) -> DataFrame:
    """Materialize each pack's training sequence: member documents joined by
    ``eos`` in the SAME deterministic (md5(id), id) order the running sum
    packed them in. Returns (pack_id, n_docs, seq_text).

    One groupBy on pack_id; each group is budget-bounded (a pack holds at
    most ~budget tokens by construction), so collect_list stays small no
    matter the corpus size — the safe kind of per-group collection. Order
    inside the group comes from ``array_sort`` over (md5, id, text) structs,
    not from collect_list's nondeterministic arrival order.
    """
    h = F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8"))
    member = F.struct(
        h.alias("h"), F.col(id_col).cast("long").alias("i"), F.col(text_col).alias("t")
    )
    return (
        packed.withColumn("_member", member)
        .groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.array_join(
                F.expr("transform(array_sort(collect_list(_member)), s -> s.t)"),
                eos,
            ).alias("seq_text"),
        )
    )


def pack_manifest(packed: DataFrame, token_col: str = "n_tokens") -> DataFrame:
    """Aggregate a packed frame into one row per pack (size accounting).

    ``token_col`` names the token-count column ``pack_sequences`` ran over —
    manifests are not hardwired to the default ``n_tokens`` name.
    """
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("tokens_total"),
    )
