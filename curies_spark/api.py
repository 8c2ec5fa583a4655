"""Import-path parity for ``curies.api`` (reference src/curies/api.py):
the core converter/data-model names under their reference module path.

``Trie`` aliases :class:`curies_spark.core.trie.PrefixTrie` — the same
``parse_uri`` longest-prefix contract, implemented as a length-bucketed
hash map instead of a character tree (cheaper to pickle/broadcast and
faster for the byte-prefix probes the Arrow kernels use), so there is
deliberately no ``TrieNode`` class: the structure has no nodes.
"""

from .core.converter import (
    Converter,
    DuplicatePrefixes,
    DuplicateURIPrefixes,
    DuplicateValueError,
    NoCURIEDelimiterError,
    chain,
    upgrade_prefix_map,
)
from .core.record import (
    NamableReference,
    NamedReference,
    Prefix,
    PrefixMap,
    Record,
    Records,
    Reference,
    ReferenceTuple,
)
from .core.trie import PrefixTrie as Trie
from .sources.loaders import (
    load_extended_prefix_map,
    load_jsonld_context,
    load_prefix_map,
    load_shacl,
    write_extended_prefix_map,
    write_jsonld_context,
    write_shacl,
    write_tsv,
)

__all__ = [
    "Converter",
    "DuplicatePrefixes",
    "DuplicateURIPrefixes",
    "DuplicateValueError",
    "NamableReference",
    "NamedReference",
    "NoCURIEDelimiterError",
    "Prefix",
    "PrefixMap",
    "Record",
    "Records",
    "Reference",
    "ReferenceTuple",
    "Trie",
    "chain",
    "load_extended_prefix_map",
    "load_jsonld_context",
    "load_prefix_map",
    "load_shacl",
    "upgrade_prefix_map",
    "write_extended_prefix_map",
    "write_jsonld_context",
    "write_shacl",
    "write_tsv",
]
