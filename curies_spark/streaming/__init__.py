"""Structured Streaming variants of the KG pipeline."""

from .ingest import (
    REPO_SCHEMA,
    read_repo_stream,
    start_triples_stream,
    stream_file_edges,
)

__all__ = [
    "REPO_SCHEMA",
    "read_repo_stream",
    "start_triples_stream",
    "stream_file_edges",
]
