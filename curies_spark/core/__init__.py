"""Driver-side semantic core: records, trie, converter, rules, discovery."""

from .converter import (
    CompressionError,
    ConversionError,
    Converter,
    CURIEStandardizationError,
    DuplicatePrefixes,
    DuplicateURIPrefixes,
    DuplicateValueError,
    ExpansionError,
    IdentifierStandardizationError,
    NoCURIEDelimiterError,
    PrefixStandardizationError,
    StandardizationError,
    URIStandardizationError,
    chain,
    upgrade_prefix_map,
)
from .discovery import discover
from .preprocessing import (
    BlocklistError,
    PreprocessingBlocklists,
    PreprocessingConverter,
    PreprocessingRewrites,
    PreprocessingRules,
)
from .reconciliation import remap_curie_prefixes, remap_uri_prefixes, rewire
from .record import (
    NamableReference,
    NamedReference,
    Record,
    Reference,
    ReferenceTuple,
    Triple,
)
from .trie import PrefixTrie
from .w3c import is_w3c_curie, is_w3c_prefix

__all__ = [
    "BlocklistError",
    "CompressionError",
    "ConversionError",
    "Converter",
    "CURIEStandardizationError",
    "DuplicatePrefixes",
    "DuplicateURIPrefixes",
    "DuplicateValueError",
    "ExpansionError",
    "IdentifierStandardizationError",
    "NamableReference",
    "NamedReference",
    "NoCURIEDelimiterError",
    "Triple",
    "PrefixStandardizationError",
    "PrefixTrie",
    "PreprocessingBlocklists",
    "PreprocessingConverter",
    "PreprocessingRewrites",
    "PreprocessingRules",
    "Record",
    "Reference",
    "ReferenceTuple",
    "StandardizationError",
    "URIStandardizationError",
    "chain",
    "discover",
    "is_w3c_curie",
    "is_w3c_prefix",
    "remap_curie_prefixes",
    "remap_uri_prefixes",
    "rewire",
    "upgrade_prefix_map",
]
