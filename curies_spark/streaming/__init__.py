"""Structured Streaming variants of the KG pipeline and dedup stages."""

from .ann import (
    EMBEDDING_SCHEMA,
    read_embedding_stream,
    start_ann_index_stream,
    start_ivf_index_stream,
)
from .dedup import (
    DOC_SCHEMA,
    read_document_stream,
    read_stream_components,
    read_stream_pairs,
    start_dedup_stream,
    stream_stage_documents,
    streamed_survivors,
)
from .ingest import (
    REPO_SCHEMA,
    read_repo_stream,
    start_triples_stream,
    stream_discover_prefixes,
    stream_file_edges,
    stream_prefix_counts,
)

__all__ = [
    "DOC_SCHEMA",
    "EMBEDDING_SCHEMA",
    "REPO_SCHEMA",
    "read_document_stream",
    "read_embedding_stream",
    "read_repo_stream",
    "read_stream_components",
    "read_stream_pairs",
    "start_ann_index_stream",
    "start_ivf_index_stream",
    "start_dedup_stream",
    "start_triples_stream",
    "stream_discover_prefixes",
    "stream_file_edges",
    "stream_prefix_counts",
    "stream_stage_documents",
    "streamed_survivors",
]
