"""Structured Streaming variants of the KG pipeline."""

from .ingest import (
    REPO_SCHEMA,
    read_repo_stream,
    start_triples_stream,
    stream_discover_prefixes,
    stream_file_edges,
    stream_prefix_counts,
)

__all__ = [
    "REPO_SCHEMA",
    "read_repo_stream",
    "start_triples_stream",
    "stream_discover_prefixes",
    "stream_file_edges",
    "stream_prefix_counts",
]
