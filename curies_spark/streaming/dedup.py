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
all-pairs) and the store carries only ``(doc_id, mh)`` — signatures,
never text; its growth is the corpus's unique-document rate, and the
band join's shuffle is proportional to the BATCH, not the store, once
the store side is bucketed/partitioned by band key in a real
deployment (partitioned-store layout noted inline).
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


def read_document_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of documents parquet landing in a directory."""
    return spark.readStream.schema(DOC_SCHEMA).parquet(source_dir)


def stream_stage_documents(docs: DataFrame, *, k: int = 3) -> DataFrame:
    """The staging pass on a stream — identical plan to the batch
    pipeline's :func:`~curies_spark.plans.dedup_pipeline.stage_documents`
    (stateless map-only, so it is valid on a streaming DataFrame)."""
    return _stage(docs, k=k)


def _pair_batch(
    staged_batch: DataFrame,
    store_path: str,
    *,
    min_est_jaccard: float,
) -> DataFrame:
    """Near-dup pairs of the new batch: within-batch pairs plus
    batch-vs-store pairs, signature-estimate verified."""
    spark = staged_batch.sparkSession
    store_dir = Path(store_path)
    sig_cols = ("doc_id", "mh")
    if any(store_dir.glob("*/_SUCCESS")):
        store = spark.read.parquet(*[str(p.parent) for p in store_dir.glob("*/_SUCCESS")])
        combined = staged_batch.select(*sig_cols).unionByName(store.select(*sig_cols))
    else:
        combined = staged_batch.select(*sig_cols)
    # band join over batch+store, keeping only pairs touching the batch:
    # a (store, store) pair was already emitted by an earlier batch
    new_ids = staged_batch.select("doc_id")
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


def start_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    k: int = 3,
    min_est_jaccard: float = 0.5,
    available_now: bool = True,
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
        pairs = _pair_batch(
            staged, store_path, min_est_jaccard=min_est_jaccard
        )
        pairs.write.mode("overwrite").parquet(f"{pairs_path}/batch={batch_id}")
        staged.select("doc_id", "mh").write.mode("overwrite").parquet(
            f"{store_path}/batch={batch_id}"
        )

    writer = (
        read_document_stream(spark, source_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
