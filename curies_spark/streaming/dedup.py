"""Streaming near-duplicate detection over a continuously-arriving
document corpus.

The reference is batch-only; this extends the engine's streaming
surface (streaming/ingest.py) to training-data curation. It exists
because round 3 made the MinHash signature a STATELESS map-only kernel
(operators/dedup.py ``minhash_signature_col`` — no Exchange): a
stateless column expression lifts to Structured Streaming unchanged,
so each micro-batch stages its documents (hash + signature) with one
pass and zero state store.

Cross-batch near-dup pairing runs in ``foreachBatch``: the new batch's
staged signatures band-join against the accumulated signature store
(plus themselves), verified pairs append to a pairs table, and the
batch's signatures append to the store. Both writes go to
batch-id-scoped subdirectories with overwrite, so a replayed batch
after a crash rewrites its own output instead of duplicating it —
idempotent, hence exactly-once end-to-end with the source checkpoint.

At scale the store join stays bucketed (band-key equi-join, never
all-pairs) and the store carries only ``(doc_id, mh, content_hash)``
— signatures, never text; its growth is the corpus's unique-CONTENT
rate, because exact duplicates collapse before banding (identical
contents have identical signatures, so banding them is quadratic in
the family size — each copy instead emits one pair to its family's
canonical id). The band join's shuffle is proportional to the BATCH,
not the store, once the store side is bucketed/partitioned by band
key in a real deployment (partitioned-store layout noted inline).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..plans.dedup_pipeline import band_pairs, estimated_jaccard_col
from ..plans.dedup_pipeline import stage_documents as _stage

__all__ = [
    "DOC_SCHEMA",
    "read_document_stream",
    "stream_stage_documents",
    "start_dedup_stream",
]

#: schema of the streamed documents table
DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
    ]
)


def read_document_stream(
    spark: SparkSession,
    source_dir: str,
    *,
    max_files_per_trigger: "int | None" = None,
) -> DataFrame:
    """File-source stream of documents parquet landing in a directory."""
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def stream_stage_documents(docs: DataFrame, *, k: int = 3) -> DataFrame:
    """The staging pass on a stream — identical plan to the batch
    pipeline's :func:`~curies_spark.plans.dedup_pipeline.stage_documents`
    (stateless map-only, so it is valid on a streaming DataFrame)."""
    return _stage(docs, k=k)


def _read_store(spark: SparkSession, store_path: str) -> "DataFrame | None":
    dirs = [str(p.parent) for p in Path(store_path).glob("*/_SUCCESS")]
    return spark.read.parquet(*dirs) if dirs else None


def _near_pairs(
    novel: DataFrame,
    store: "DataFrame | None",
    *,
    min_est_jaccard: float,
) -> DataFrame:
    """Near-dup pairs among exact-novel batch docs + vs the store,
    signature-estimate verified."""
    sig_cols = ("doc_id", "mh")
    combined = (
        novel.select(*sig_cols).unionByName(store.select(*sig_cols))
        if store is not None
        else novel.select(*sig_cols)
    )
    # band join over batch+store, keeping only pairs touching the batch:
    # a (store, store) pair was already emitted by an earlier batch
    new_ids = novel.select("doc_id")
    pairs = band_pairs(combined)
    pairs = pairs.join(
        new_ids.withColumnRenamed("doc_id", "id_a"), on="id_a", how="left_semi"
    ).unionByName(
        pairs.join(
            new_ids.withColumnRenamed("doc_id", "id_b"), on="id_b", how="left_semi"
        )
    ).distinct()
    sig = combined
    return (
        pairs.join(
            sig.select(F.col("doc_id").alias("id_a"), F.col("mh").alias("_ma")),
            on="id_a",
        )
        .join(
            sig.select(F.col("doc_id").alias("id_b"), F.col("mh").alias("_mb")),
            on="id_b",
        )
        .withColumn("est_jaccard", estimated_jaccard_col(F.col("_ma"), F.col("_mb")))
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .select("id_a", "id_b", "est_jaccard")
    )


def _pair_batch(
    staged_batch: DataFrame,
    store_path: str,
    *,
    min_est_jaccard: float,
) -> "tuple[DataFrame, DataFrame]":
    """Returns (pairs, novel): the batch's duplicate pairs and the
    exact-novel staged rows to append to the store.

    Exact duplicates are collapsed BEFORE the band join — identical
    contents share identical signatures, so banding them directly is
    quadratic in the duplicate-family size (a document repeated 10^6
    times would emit ~10^12 band pairs). Instead each exact copy emits
    ONE pair to its family's canonical id (est_jaccard = 1.0: the true
    Jaccard of identical shingle sets), and only unique contents enter
    the band join and the store — the same exact-winners-first order as
    the batch pipeline."""
    spark = staged_batch.sparkSession
    store = _read_store(spark, store_path)

    # within-batch exact collapse: min doc_id per content hash
    canon = staged_batch.groupBy("content_hash").agg(
        F.min("doc_id").alias("_canon")
    )
    with_canon = staged_batch.join(canon, on="content_hash")
    batch_exact = (
        with_canon.filter(F.col("doc_id") != F.col("_canon"))
        .select(
            F.col("_canon").alias("id_a"),
            F.col("doc_id").alias("id_b"),
            F.lit(1.0).alias("est_jaccard"),
        )
    )
    winners = with_canon.filter(F.col("doc_id") == F.col("_canon")).drop("_canon")

    if store is not None:
        # winners whose content already lives in the store: one exact
        # pair to the store's id, and they do NOT re-enter store/banding
        store_hashes = store.select(
            F.col("content_hash"), F.col("doc_id").alias("_store_id")
        )
        matched = winners.join(store_hashes, on="content_hash")
        store_exact = matched.select(
            F.col("_store_id").alias("id_a"),
            F.col("doc_id").alias("id_b"),
            F.lit(1.0).alias("est_jaccard"),
        )
        novel = winners.join(store_hashes, on="content_hash", how="left_anti")
        exact_pairs = batch_exact.unionByName(store_exact)
    else:
        novel = winners
        exact_pairs = batch_exact

    novel = novel.localCheckpoint()
    near = _near_pairs(novel, store, min_est_jaccard=min_est_jaccard)
    return exact_pairs.unionByName(near), novel


def start_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    k: int = 3,
    min_est_jaccard: float = 0.5,
    available_now: bool = True,
    max_files_per_trigger: "int | None" = None,
) -> StreamingQuery:
    """Start (or resume) the streaming near-dup detector.

    Writes under ``out_dir``: ``store/batch=N/`` (accumulated
    signatures) and ``pairs/batch=N/`` (verified near-dup pairs each
    new batch introduced). Batch-id-scoped overwrite keeps replays
    idempotent. In a real deployment the store would be a bucketed
    table partitioned by band-key hash so the store side of the join
    prunes to the batch's buckets; the parquet-per-batch layout is the
    sandbox stand-in (same role as partitioned parquet for Iceberg in
    plans/pipeline.py).
    """
    store_path = str(Path(out_dir) / "store")
    pairs_path = str(Path(out_dir) / "pairs")

    def process(batch: DataFrame, batch_id: int) -> None:
        staged = _stage(batch, k=k).localCheckpoint()
        pairs, novel = _pair_batch(
            staged, store_path, min_est_jaccard=min_est_jaccard
        )
        pairs.write.mode("overwrite").parquet(f"{pairs_path}/batch={batch_id}")
        novel.select("doc_id", "mh", "content_hash").write.mode(
            "overwrite"
        ).parquet(f"{store_path}/batch={batch_id}")

    writer = (
        read_document_stream(
            spark, source_dir, max_files_per_trigger=max_files_per_trigger
        )
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
