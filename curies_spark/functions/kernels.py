"""Columnar conversion kernels: every reference scalar function as a Spark column operator.

Physical design (see SURVEY.md §3.2-3.3):

- **Expansion / CURIE standardization are JVM-native.** A CURIE splits on
  the first delimiter with ``substring_index``/``locate``, the prefix is
  standardized through a ``MapType`` literal built from the broadcast
  converter's synonym-inclusive prefix map, and the URI is a ``concat``.
  Whole-stage codegen keeps the whole path in the JVM — no Python worker.
- **Compression (longest-prefix URI matching) has no native Spark
  operator.** For small converters we compile the prefix set into an
  ordered ``when``-chain of ``startswith`` probes (JVM, codegen'd,
  longest-first so the longest-prefix-wins guarantee of reference
  api.py:1762-1769 holds). Past a threshold, we switch to an
  ``arrow_udf`` doing length-bucketed vectorized probes against the
  broadcast converter: one C-speed byte-slice + hash set-lookup per
  DISTINCT URI-prefix length over the whole Arrow batch (byte-prefix
  match ≡ codepoint startswith for UTF-8), never per-row Python.
  Measured ~2× the reference's in-process per-core trie throughput at
  8 cores on a 200-record EPM (tools/bench_large_epm.py) and
  ~1.8M ops/s/core in-kernel.

Strictness mapping (reference api.py:1732-1778 etc.):
- default    → miss = NULL
- passthrough → ``F.coalesce(converted, original)``
- strict      → driver-side audit via :func:`assert_no_nulls`

Deviation from the reference, by design: per-row exceptions (e.g.
``NoCURIEDelimiterError`` for a CURIE without a delimiter,
reference utils.py:22-27) become NULLs; use :func:`assert_no_nulls`
to restore fail-fast semantics on the driver.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..core.converter import Converter
from ..core.w3c import LOCAL_UNIQUE_IDENTIFIER_PATTERN, NCNAME_PATTERN

__all__ = [
    "assert_no_nulls",
    "StrictConversionError",
    "compress_col",
    "compress_or_standardize_preprocessed_col",
    "parse_preprocessed_col",
    "parse_preprocessed_df",
    "preprocess_value_col",
    "curie_identifier_col",
    "curie_prefix_col",
    "expand_all_col",
    "expand_col",
    "format_curie_col",
    "hash_triple_col",
    "hash_uri_triple_col",
    "is_curie_col",
    "is_uri_col",
    "is_w3c_curie_col",
    "is_w3c_prefix_col",
    "parse_curie_col",
    "parse_uri_col",
    "standardize_curie_col",
    "standardize_prefix_col",
    "standardize_uri_col",
    "validate_identifier_col",
]

#: Above this many URI prefixes the compress kernel switches from a
#: codegen'd when-chain to the length-bucketed arrow_udf. The when-chain
#: is O(#prefixes) per row but JVM-side; the arrow_udf is O(#distinct
#: prefix lengths) batch-level kernels and pays the Python-worker
#: boundary once per Arrow batch.
NATIVE_COMPRESS_THRESHOLD = 48

#: Above this many prefix-map entries the expand kernel switches from a
#: MapType literal (embedded in the plan, constant-folded) to the
#: bucketed arrow_udf against the broadcast converter. Literal maps
#: beyond ~10k entries bloat the plan serialization shipped with every
#: task.
NATIVE_EXPAND_THRESHOLD = 10_000

PARSE_SCHEMA = StructType(
    [
        StructField("prefix", StringType(), True),
        StructField("identifier", StringType(), True),
    ]
)


class StrictConversionError(ValueError):
    """Raised by :func:`assert_no_nulls` — the columnar form of the
    reference's strict-mode ``ConversionError`` hierarchy."""


def _col(c: "Column | str") -> Column:
    return F.col(c) if isinstance(c, str) else c


def _broadcast(converter) -> Converter:
    """Accept either a raw Converter or a ``sc.broadcast`` handle."""
    if isinstance(converter, Converter):
        return converter
    return converter.value  # pyspark.Broadcast


def _converter_value_getter(converter):
    """Defer ``.value`` into the executor when a Broadcast is given, so the
    converter ships once per executor instead of once per serialized UDF."""
    if isinstance(converter, Converter):
        return lambda: converter
    return lambda: converter.value


# ---------------------------------------------------------------------------
# CURIE splitting (native)
# ---------------------------------------------------------------------------


def curie_prefix_col(curie: "Column | str") -> Column:
    """Prefix half of a CURIE — everything before the *first* delimiter
    (reference utils.py:30-32). NULL when there is no delimiter."""
    c = _col(curie)
    return F.when(F.locate(":", c) > 0, F.substring_index(c, ":", 1))


def curie_identifier_col(curie: "Column | str") -> Column:
    """Identifier half — everything after the first delimiter; may itself
    contain delimiters (``a1:b2:c3 → b2:c3``, reference tests/test_struct.py:44-48)."""
    c = _col(curie)
    pos = F.locate(":", c)
    return F.when(pos > 0, F.substr(c, pos + F.lit(1)))


def format_curie_col(prefix: "Column | str", identifier: "Column | str") -> Column:
    """``prefix:identifier`` (reference api.py:1583-1585)."""
    return F.concat(_col(prefix), F.lit(":"), _col(identifier))


# ---------------------------------------------------------------------------
# expansion (native fast path)
# ---------------------------------------------------------------------------


def _prefix_to_uri_map_expr(conv: Converter) -> Column:
    """MapType literal: every prefix + synonym → canonical URI prefix
    (reference ``prefix_map`` property, api.py:923-928)."""
    pairs: list[Column] = []
    for prefix, uri_prefix in conv.prefix_map.items():
        pairs.append(F.lit(prefix))
        pairs.append(F.lit(uri_prefix))
    return F.create_map(*pairs) if pairs else F.create_map()


def _synonym_to_prefix_map_expr(conv: Converter) -> Column:
    pairs: list[Column] = []
    for synonym, prefix in conv.synonym_to_prefix.items():
        pairs.append(F.lit(synonym))
        pairs.append(F.lit(prefix))
    return F.create_map(*pairs) if pairs else F.create_map()


def expand_col(
    curie: "Column | str",
    converter,
    *,
    passthrough: bool = False,
) -> Column:
    """CURIE → URI (reference ``Converter.expand``, api.py:1949-1983).

    Fully JVM-native for converters below :data:`NATIVE_EXPAND_THRESHOLD`:
    split on first delimiter → ``element_at`` against the broadcast
    synonym-inclusive prefix map → ``concat``. Misses (no delimiter,
    unknown prefix) are NULL, or the input when ``passthrough``.
    """
    c = _col(curie)
    conv = _broadcast(converter)
    if len(conv.prefix_map) <= NATIVE_EXPAND_THRESHOLD:
        prefix = F.substring_index(c, ":", 1)
        pos = F.locate(":", c)
        identifier = F.substr(c, pos + F.lit(1))
        uri_prefix = F.element_at(_prefix_to_uri_map_expr(conv), prefix)
        expanded = F.when(pos > 0, F.concat(uri_prefix, identifier))
    else:
        get = _converter_value_getter(converter)

        @F.arrow_udf(StringType())
        def _expand(arr):
            import pyarrow.compute as pc

            uri_prefixes, identifiers = _bucketed_prefix_match(
                arr, _expand_arrow_buckets(get())
            )
            return pc.binary_join_element_wise(uri_prefixes, identifiers, "")

        expanded = _expand(c)
    return F.coalesce(expanded, c) if passthrough else expanded


def expand_all_col(curie: "Column | str", converter) -> Column:
    """CURIE → array of all URIs, canonical first then synonyms in record
    order (reference ``expand_all``, api.py:1995-2027). NULL array on miss.

    Native: a ``MapType(string, array<string>)`` literal keyed by every
    prefix+synonym, then ``transform`` concatenates the identifier.
    Past :data:`NATIVE_EXPAND_THRESHOLD` the map literal would bloat
    every serialized task, so an ``arrow_udf`` takes over: the same
    length-bucketed byte-prefix probe as :func:`expand_col`, resolving
    to a RECORD INDEX instead of a single URI prefix, then a vectorized
    list fan-out (``np.repeat`` over per-record counts + one
    element-wise join) builds the result ListArray — no per-row Python.
    """
    c = _col(curie)
    conv = _broadcast(converter)
    if len(conv.prefix_map) > NATIVE_EXPAND_THRESHOLD:
        from pyspark.sql.types import ArrayType

        get = _converter_value_getter(converter)

        @F.arrow_udf(ArrayType(StringType()))
        def _expand_all(arr):
            import numpy as np
            import pyarrow as pa
            import pyarrow.compute as pc

            buckets, flat_values, rec_offsets, rec_counts = _expand_all_arrow_tables(
                get()
            )
            idx_arr, identifiers = _bucketed_prefix_match(arr, buckets)
            valid = pc.is_valid(idx_arr)
            valid_np = valid.to_numpy(zero_copy_only=False)
            idx_np = (
                idx_arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            counts_row = np.where(valid_np, rec_counts[idx_np], 0)
            offsets = np.concatenate(([0], np.cumsum(counts_row)))
            row_rep = np.repeat(np.arange(len(counts_row)), counts_row)
            # position of each output element inside its row's list
            pos = np.arange(int(offsets[-1]), dtype=np.int64) - np.repeat(
                offsets[:-1], counts_row
            )
            val_idx = rec_offsets[idx_np][row_rep] + pos
            bases = flat_values.take(pa.array(val_idx))
            idents_rep = identifiers.take(pa.array(row_rep))
            joined = pc.binary_join_element_wise(bases, idents_rep, "")
            return pa.ListArray.from_arrays(
                pa.array(offsets.astype(np.int32), pa.int32()),
                joined,
                mask=pc.invert(valid),
            )

        return _expand_all(c)
    pairs: list[Column] = []
    for record in conv.records:
        uri_prefixes = F.array(
            *[F.lit(u) for u in (record.uri_prefix, *record.uri_prefix_synonyms)]
        )
        for prefix in record._all_prefixes:
            pairs.append(F.lit(prefix))
            pairs.append(uri_prefixes)
    map_expr = F.create_map(*pairs) if pairs else F.create_map()
    prefix = F.substring_index(c, ":", 1)
    pos = F.locate(":", c)
    identifier = F.substr(c, pos + F.lit(1))
    bases = F.element_at(map_expr, prefix)
    return F.when(
        pos > 0, F.transform(bases, lambda base: F.concat(base, identifier))
    )


# ---------------------------------------------------------------------------
# compression (longest-prefix match)
# ---------------------------------------------------------------------------


def _native_pair_from_map(
    mapping: "dict[str, str]", uri: Column
) -> "tuple[Column, Column]":
    """(prefix, identifier) via an ordered when-chain over the given
    ``uri_prefix → prefix`` mapping, longest first — preserves the
    trie's longest-match guarantee within the mapping."""
    entries = sorted(mapping.items(), key=lambda kv: len(kv[0]), reverse=True)
    prefix_expr: Column = F.lit(None).cast(StringType())
    ident_expr: Column = F.lit(None).cast(StringType())
    # build the chain from the shortest up so the longest ends up outermost
    for uri_prefix, prefix in reversed(entries):
        cond = uri.startswith(uri_prefix)
        prefix_expr = F.when(cond, F.lit(prefix)).otherwise(prefix_expr)
        ident_expr = F.when(cond, F.substr(uri, F.lit(len(uri_prefix) + 1))).otherwise(
            ident_expr
        )
    return prefix_expr, ident_expr


def _native_compress_pair(conv: Converter, uri: Column) -> "tuple[Column, Column]":
    # NOTE a "hybrid" (JVM when-chain over the hot prefixes + Arrow
    # fallback for the tail) was measured and REJECTED: a 64-entry
    # codegen'd startsWith chain runs at ~260k rows/s on this host —
    # 3× slower than shipping every row through the Arrow kernel
    # (~800k rows/s at 3 partitions). Long when-chains are the slow
    # path; that is exactly why NATIVE_COMPRESS_THRESHOLD exists.
    return _native_pair_from_map(conv.reverse_prefix_map, uri)


def _build_arrow_buckets(mapping: "dict[str, str]"):
    """Per-BYTE-length (slice_len, binary key_set, value_array) pyarrow
    lookup tables. Keys are UTF-8 bytes: byte-prefix match is exactly
    equivalent to codepoint startswith for UTF-8 (prefix property), and
    byte slicing is O(1) offset math where codepoint slicing scans."""
    import pyarrow as pa

    buckets: dict[int, dict[bytes, str]] = {}
    for k, v in mapping.items():
        key = k.encode("utf-8")
        buckets.setdefault(len(key), {})[key] = v
    return [
        (
            length,
            pa.array(list(bucket.keys()), type=pa.binary()),
            pa.array(list(bucket.values())),
        )
        for length, bucket in sorted(buckets.items(), reverse=True)
    ]


def _arrow_buckets(conv: Converter):
    """Compression tables (uri_prefix → canonical prefix), cached on the
    converter — built once per executor."""
    cached = getattr(conv, "_arrow_buckets", None)
    if cached is None:
        cached = _build_arrow_buckets(conv.reverse_prefix_map)
        conv._arrow_buckets = cached
    return cached


def _expand_arrow_buckets(conv: Converter):
    """Expansion tables (``prefix:`` → canonical uri_prefix, synonyms
    included). Prefixes contain no delimiter, so no key is a byte-prefix
    of another — at most one bucket can hit, making bucket probing
    equivalent to split-on-first-colon + exact map lookup."""
    cached = getattr(conv, "_expand_arrow_buckets", None)
    if cached is None:
        cached = _build_arrow_buckets(
            {f"{prefix}:": uri_prefix for prefix, uri_prefix in conv.prefix_map.items()}
        )
        conv._expand_arrow_buckets = cached
    return cached


def _expand_all_arrow_tables(conv: Converter):
    """expand_all lookup tables, cached on the converter: length-bucketed
    ``prefix: → record index`` probes plus the record-major flattened
    URI-prefix array (canonical first, then synonyms in record order —
    reference api.py:2182-2219) with per-record offsets/counts for the
    vectorized list fan-out."""
    cached = getattr(conv, "_expand_all_arrow_tables_cache", None)
    if cached is None:
        import numpy as np
        import pyarrow as pa

        mapping: dict[str, int] = {}
        flat: list[str] = []
        rec_offsets: list[int] = []
        rec_counts: list[int] = []
        for i, record in enumerate(conv.records):
            uri_prefixes = [record.uri_prefix, *record.uri_prefix_synonyms]
            rec_offsets.append(len(flat))
            rec_counts.append(len(uri_prefixes))
            flat.extend(uri_prefixes)
            for prefix in record._all_prefixes:
                mapping[f"{prefix}:"] = i
        cached = (
            _build_arrow_buckets(mapping),
            pa.array(flat, pa.string()),
            np.asarray(rec_offsets, dtype=np.int64),
            np.asarray(rec_counts, dtype=np.int64),
        )
        conv._expand_all_arrow_tables_cache = cached
    return cached


def _bucketed_prefix_match(arr, buckets):
    """(matched value, remainder) Arrow arrays via length-bucketed
    vectorized probes: one byte-slice + set-lookup per DISTINCT key
    length (typically a few dozen) — every probe a C-speed kernel over
    the whole Arrow batch, no per-row Python. Longest length first ⇒
    longest-match wins."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    raw = arr.cast(pa.binary())  # zero-copy view; byte slicing is offset math
    # value type follows the buckets (string for prefix maps, int for
    # the expand_all record-index tables)
    matched_values = pa.nulls(n, buckets[0][2].type if buckets else pa.string())
    # remainders stay BINARY until every bucket has run: a bucket's byte
    # offset can split a multi-byte UTF-8 char on rows that did NOT
    # match that bucket, and casting such a tail to string throws —
    # if_else keeps only hit rows (whose offset is a char boundary by
    # construction: the byte-prefix matched exactly), so the single
    # final cast sees valid UTF-8 everywhere it is non-null
    remainders_bin = pa.nulls(n, pa.binary())
    matched = pc.is_null(arr)
    stop = 2**31 - 1
    for length, keys, values in buckets:
        if pc.all(matched).as_py():
            break
        sliced = pc.binary_slice(raw, 0, length)
        idx = pc.index_in(sliced, value_set=keys)
        hit = pc.and_not(pc.is_valid(idx), matched)
        if pc.any(hit).as_py():
            matched_values = pc.if_else(hit, pc.take(values, idx), matched_values)
            tail = pc.binary_slice(raw, length, stop)
            remainders_bin = pc.if_else(hit, tail, remainders_bin)
            matched = pc.or_(matched, hit)
    return matched_values, remainders_bin.cast(pa.string())


def _vectorized_longest_match(arr, conv: Converter):
    """(canonical prefix, identifier) for URI compression — longest
    URI-prefix match over the converter's reverse prefix map."""
    return _bucketed_prefix_match(arr, _arrow_buckets(conv))


def parse_uri_col(uri: "Column | str", converter) -> Column:
    """URI → struct(prefix, identifier) by longest-prefix match
    (reference ``parse_uri`` api.py:1793-1821 over the trie at api.py:3331-3347).

    Small converters compile to a codegen'd ``startswith`` chain; large
    ones use an Arrow-batched pandas UDF doing length-bucketed
    vectorized probes against the broadcast converter.
    """
    c = _col(uri)
    conv = _broadcast(converter)
    if len(conv.reverse_prefix_map) <= NATIVE_COMPRESS_THRESHOLD:
        prefix_expr, ident_expr = _native_compress_pair(conv, c)
        return F.when(
            prefix_expr.isNotNull(),
            F.struct(prefix_expr.alias("prefix"), ident_expr.alias("identifier")),
        )
    get = _converter_value_getter(converter)

    @F.arrow_udf(PARSE_SCHEMA)
    def _parse(arr):
        import pyarrow as pa

        prefixes, identifiers = _vectorized_longest_match(arr, get())
        return pa.StructArray.from_arrays(
            [prefixes, identifiers], names=["prefix", "identifier"]
        )

    struct = _parse(c)
    return F.when(struct.getField("prefix").isNotNull(), struct)


def compress_col(
    uri: "Column | str",
    converter,
    *,
    passthrough: bool = False,
) -> Column:
    """URI → CURIE with longest-prefix matching (reference ``compress``,
    api.py:1732-1778). Miss → NULL, or input when ``passthrough``."""
    c = _col(uri)
    conv = _broadcast(converter)
    if len(conv.reverse_prefix_map) <= NATIVE_COMPRESS_THRESHOLD:
        prefix_expr, ident_expr = _native_compress_pair(conv, c)
        compressed = F.when(
            prefix_expr.isNotNull(), F.concat(prefix_expr, F.lit(":"), ident_expr)
        )
    else:
        compressed = compress_udf(converter)(c)
    return F.coalesce(compressed, c) if passthrough else compressed


def compress_udf(converter):
    """The large-map compression kernel as a standalone arrow_udf —
    shared by :func:`compress_col` and SQL-function registration
    (:mod:`curies_spark.functions.sqlfuncs`)."""
    get = _converter_value_getter(converter)

    @F.arrow_udf(StringType())
    def _compress(arr):
        import pyarrow.compute as pc

        prefixes, identifiers = _vectorized_longest_match(arr, get())
        # element-wise join stays in Arrow; any-null → null (= miss)
        return pc.binary_join_element_wise(prefixes, identifiers, ":")

    return _compress


# ---------------------------------------------------------------------------
# standardization (native)
# ---------------------------------------------------------------------------


def _exact_match_udf(converter, mapping_attr: str, mapping_builder):
    """arrow_udf doing a whole-string exact lookup against a broadcast
    dict — one ``index_in`` + ``take`` per Arrow batch. The large-map
    twin of a MapType-literal ``element_at``."""
    get = _converter_value_getter(converter)

    @F.arrow_udf(StringType())
    def _lookup(arr):
        import pyarrow as pa
        import pyarrow.compute as pc

        conv = get()
        cached = getattr(conv, mapping_attr, None)
        if cached is None:
            mapping = mapping_builder(conv)
            cached = (pa.array(list(mapping)), pa.array(list(mapping.values())))
            setattr(conv, mapping_attr, cached)
        keys, values = cached
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return pc.take(values, pc.index_in(arr, value_set=keys))

    return _lookup


def standardize_prefix_col(
    prefix: "Column | str", converter, *, passthrough: bool = False
) -> Column:
    """Synonym → canonical prefix (reference api.py:2239-2278).

    MapType-literal probe for native-sized maps; a broadcast exact-match
    arrow_udf past :data:`NATIVE_EXPAND_THRESHOLD` (literal maps beyond
    ~10k entries bloat every serialized task)."""
    c = _col(prefix)
    conv = _broadcast(converter)
    if len(conv.synonym_to_prefix) <= NATIVE_EXPAND_THRESHOLD:
        standardized = F.element_at(_synonym_to_prefix_map_expr(conv), c)
    else:
        standardized = _exact_match_udf(
            converter, "_std_prefix_table", lambda cv: cv.synonym_to_prefix
        )(c)
    return F.coalesce(standardized, c) if passthrough else standardized


def parse_curie_col(curie: "Column | str", converter) -> Column:
    """CURIE → struct(prefix, identifier) with prefix standardization
    (reference ``parse_curie`` api.py:2039-2052). NULL when there is no
    delimiter or the prefix is unknown. Large maps go through the same
    bucketed arrow_udf machinery as expansion (keys ``prefix:`` — at
    most one can match, see :func:`_expand_arrow_buckets`)."""
    c = _col(curie)
    conv = _broadcast(converter)
    pos = F.locate(":", c)
    identifier = F.substr(c, pos + F.lit(1))
    if len(conv.synonym_to_prefix) <= NATIVE_EXPAND_THRESHOLD:
        raw_prefix = F.substring_index(c, ":", 1)
        norm_prefix = F.element_at(_synonym_to_prefix_map_expr(conv), raw_prefix)
        return F.when(
            (pos > 0) & norm_prefix.isNotNull(),
            F.struct(norm_prefix.alias("prefix"), identifier.alias("identifier")),
        )
    get = _converter_value_getter(converter)

    @F.arrow_udf(PARSE_SCHEMA)
    def _parse_curie(arr):
        import pyarrow as pa

        conv_v = get()
        buckets = getattr(conv_v, "_parse_curie_arrow_buckets", None)
        if buckets is None:
            buckets = _build_arrow_buckets(
                {f"{syn}:": canonical for syn, canonical in conv_v.synonym_to_prefix.items()}
            )
            conv_v._parse_curie_arrow_buckets = buckets
        prefixes, identifiers = _bucketed_prefix_match(arr, buckets)
        return pa.StructArray.from_arrays(
            [prefixes, identifiers], names=["prefix", "identifier"]
        )

    struct = _parse_curie(c)
    return F.when(struct.getField("prefix").isNotNull(), struct)


def standardize_curie_col(
    curie: "Column | str", converter, *, passthrough: bool = False
) -> Column:
    """Idempotent CURIE standardization (reference api.py:2298-2343)."""
    c = _col(curie)
    parsed = parse_curie_col(c, converter)
    standardized = F.when(
        parsed.isNotNull(),
        F.concat(
            parsed.getField("prefix"), F.lit(":"), parsed.getField("identifier")
        ),
    )
    return F.coalesce(standardized, c) if passthrough else standardized


def standardize_uri_col(
    uri: "Column | str", converter, *, passthrough: bool = False
) -> Column:
    """Idempotent URI standardization: longest-prefix parse then re-expand
    through the canonical URI prefix (reference api.py:2363-2413)."""
    c = _col(uri)
    conv = _broadcast(converter)
    parsed = parse_uri_col(c, converter)
    canonical = F.element_at(_prefix_to_uri_map_expr(conv), parsed.getField("prefix"))
    standardized = F.when(
        parsed.isNotNull(), F.concat(canonical, parsed.getField("identifier"))
    )
    return F.coalesce(standardized, c) if passthrough else standardized


# ---------------------------------------------------------------------------
# predicates & ambiguous forms
# ---------------------------------------------------------------------------


def is_uri_col(s: "Column | str", converter) -> Column:
    """Reference api.py:2676-2684: can the string be compressed?"""
    return compress_col(s, converter).isNotNull()


def is_curie_col(s: "Column | str", converter) -> Column:
    """Reference api.py:1823-1848: can the string be expanded?"""
    return expand_col(s, converter).isNotNull()


def compress_or_standardize_col(
    s: "Column | str", converter, *, passthrough: bool = False
) -> Column:
    """URI → CURIE, else CURIE standardization (reference api.py:1637-1686).
    Compression is tried first, mirroring ``parse``'s is_uri-then-is_curie
    order (api.py:1700-1708)."""
    c = _col(s)
    result = F.coalesce(compress_col(c, converter), standardize_curie_col(c, converter))
    return F.coalesce(result, c) if passthrough else result


def expand_or_standardize_col(
    s: "Column | str", converter, *, passthrough: bool = False
) -> Column:
    """CURIE → URI, else URI standardization (reference api.py:1876-1925)."""
    c = _col(s)
    result = F.coalesce(standardize_uri_col(c, converter), expand_col(c, converter))
    return F.coalesce(result, c) if passthrough else result


# ---------------------------------------------------------------------------
# preprocessing pipeline (reference preprocessing.py:265-417)
# ---------------------------------------------------------------------------


def _map_literal(mapping: "dict[str, str]") -> "Column | None":
    if not mapping:
        return None
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)


def _remap_full_expr(rules, c: Column, context: "str | None") -> Column:
    """Exact-string → CURIE rewrite; per-context rules win
    (reference preprocessing.py:91-99)."""
    ctx_map = _map_literal(rules.rewrites.resource_full.get(context, {}) if context else {})
    global_map = _map_literal(rules.rewrites.full)
    exprs = [F.element_at(m, c) for m in (ctx_map, global_map) if m is not None]
    if not exprs:
        return F.lit(None).cast(StringType())
    return F.coalesce(*exprs) if len(exprs) > 1 else exprs[0]


def _remap_prefix_expr(rules, c: Column, context: "str | None") -> Column:
    """First matching old-prefix replaces the head; context rules are
    consulted before global ones (reference preprocessing.py:101-110).
    Built as a when-chain in *reverse* rule order so the first rule ends
    up outermost (first match wins, like the reference's loop)."""
    expr: Column = c
    pairs: list[tuple[str, str]] = list(rules.rewrites.prefix.items())
    if context:
        pairs = list(rules.rewrites.resource_prefix.get(context, {}).items()) + pairs
    for old, new in reversed(pairs):
        expr = F.when(
            c.startswith(old), F.concat(F.lit(new), F.substr(c, F.lit(len(old) + 1)))
        ).otherwise(expr)
    return expr


def _blocked_expr(rules, c: Column, context: "str | None") -> Column:
    """Full/prefix/suffix blocklist membership (reference preprocessing.py:51-71)."""
    b = rules.blocklists
    cond = F.lit(False)
    full = list(b.full) + (list(b.resource_full.get(context, [])) if context else [])
    if full:
        cond = cond | c.isin(full)
    prefixes = list(b.prefix) + (
        list(b.resource_prefix.get(context, [])) if context else []
    )
    for p in prefixes:
        cond = cond | c.startswith(p)
    for s in b.suffix:
        cond = cond | c.endswith(s)
    return cond


PREPROCESSED_SCHEMA = "struct<value:string,full_curie:string,blocked:boolean>"


def preprocess_value_col(
    value: "Column | str",
    rules,
    *,
    context: "str | None" = None,
    preclean=None,
) -> Column:
    """The shared preamble of the preprocessing pipeline as ONE native
    struct column: preclean → full remap (short-circuits) → prefix remap
    → blocklist flag (reference ``_pre_process``, preprocessing.py:199-211).

    Returns ``struct(value, full_curie, blocked)``: ``full_curie`` set iff
    an exact rewrite hit (wins over everything), else ``value`` is the
    prefix-remapped string and ``blocked`` its blocklist verdict.
    """
    c = _col(value)
    if preclean is not None:
        c = preclean(c)
    full = _remap_full_expr(rules, c, context)
    remapped = _remap_prefix_expr(rules, c, context)
    return F.struct(
        F.when(full.isNull(), remapped).alias("value"),
        full.alias("full_curie"),
        F.when(full.isNotNull(), F.lit(False))
        .otherwise(_blocked_expr(rules, remapped, context))
        .alias("blocked"),
    )


def _postprocess_identifier_expr(rules, prefix: Column, identifier: Column) -> Column:
    """Per-prefix identifier suffix strip, first matching suffix wins
    (reference ``_post_process``, preprocessing.py:189-197)."""
    flat: list[tuple[str, str]] = [
        (p, s) for p, suffixes in rules.postprocessing.suffix.items() for s in suffixes
    ]
    expr = identifier
    for p, s in reversed(flat):
        expr = F.when(
            (prefix == p) & identifier.endswith(s),
            F.substring(identifier, 1, F.length(identifier) - len(s)),
        ).otherwise(expr)
    return expr


def parse_preprocessed_col(
    value: "Column | str",
    converter,
    rules,
    *,
    context: "str | None" = None,
    preclean=None,
) -> Column:
    """Columnar twin of ``PreprocessingConverter.parse``
    (reference preprocessing.py:213-227): preclean → remap_full →
    remap_prefix → blocklist → URI-else-CURIE parse → per-prefix suffix
    strip. Fully JVM-native for native-sized converters; ``blocked`` and
    unparsable inputs yield NULL (``block_action="pass"`` semantics —
    audit with :func:`assert_no_nulls` for fail-fast).
    """
    pre = preprocess_value_col(value, rules, context=context, preclean=preclean)
    s = pre.getField("value")
    parsed = F.coalesce(parse_uri_col(s, converter), parse_curie_col(s, converter))
    post_identifier = _postprocess_identifier_expr(
        rules, parsed.getField("prefix"), parsed.getField("identifier")
    )
    full = pre.getField("full_curie")
    full_pos = F.locate(":", full)
    return (
        # exact rewrites return the CURIE split on the first delimiter,
        # bypassing standardization AND postprocessing (preprocessing.py:221-223)
        F.when(
            full.isNotNull(),
            F.struct(
                F.substring_index(full, ":", 1).alias("prefix"),
                # str.partition semantics: no delimiter → empty identifier
                F.when(full_pos > 0, F.substr(full, full_pos + F.lit(1)))
                .otherwise(F.lit(""))
                .alias("identifier"),
            ),
        )
        .when(pre.getField("blocked"), F.lit(None).cast(PARSE_SCHEMA))
        .otherwise(
            F.when(
                parsed.isNotNull(),
                F.struct(
                    parsed.getField("prefix").alias("prefix"),
                    post_identifier.alias("identifier"),
                ),
            )
        )
    )


def parse_preprocessed_df(
    df: DataFrame,
    column: str,
    converter,
    rules,
    *,
    context: "str | None" = None,
    preclean=None,
    target: str = "parsed",
) -> DataFrame:
    """DataFrame form of :func:`parse_preprocessed_col` — USE THIS on real
    data. The single-Column form inlines the preamble into every field
    access (SimplifyExtractValueOps), exploding the expression tree
    combinatorially until whole-stage codegen overflows Janino's 64KB
    method limit and falls back to interpreted eval. Staging the pipeline
    through intermediate columns keeps each projection small:
    CollapseProject will not merge them because the struct columns are
    non-cheap and referenced more than once.
    """
    # collision-free staging names: suffix until unused in df.columns
    taken = set(df.columns)
    pre_col, parsed_col = "_pre", "_parsed"
    while pre_col in taken:
        pre_col += "_"
    while parsed_col in taken:
        parsed_col += "_"
    pre = preprocess_value_col(column, rules, context=context, preclean=preclean)
    out = df.withColumn(pre_col, pre)
    s = F.col(f"{pre_col}.value")
    out = out.withColumn(
        parsed_col, F.coalesce(parse_uri_col(s, converter), parse_curie_col(s, converter))
    )
    post_identifier = _postprocess_identifier_expr(
        rules, F.col(f"{parsed_col}.prefix"), F.col(f"{parsed_col}.identifier")
    )
    full = F.col(f"{pre_col}.full_curie")
    full_pos = F.locate(":", full)
    final = (
        F.when(
            full.isNotNull(),
            F.struct(
                F.substring_index(full, ":", 1).alias("prefix"),
                F.when(full_pos > 0, F.substr(full, full_pos + F.lit(1)))
                .otherwise(F.lit(""))
                .alias("identifier"),
            ),
        )
        .when(F.col(f"{pre_col}.blocked"), F.lit(None).cast(PARSE_SCHEMA))
        .otherwise(
            F.when(
                F.col(parsed_col).isNotNull(),
                F.struct(
                    F.col(f"{parsed_col}.prefix").alias("prefix"),
                    post_identifier.alias("identifier"),
                ),
            )
        )
    )
    return out.withColumn(target, final).drop(pre_col, parsed_col)


def compress_or_standardize_preprocessed_col(
    value: "Column | str",
    converter,
    rules,
    *,
    context: "str | None" = None,
    preclean=None,
    passthrough: bool = False,
) -> Column:
    """Preprocessed parse rendered back to a CURIE string — the entity
    linker's hot path when a rule set is configured."""
    parsed = parse_preprocessed_col(
        value, converter, rules, context=context, preclean=preclean
    )
    curie = F.when(
        parsed.isNotNull(),
        format_curie_col(parsed.getField("prefix"), parsed.getField("identifier")),
    )
    return F.coalesce(curie, _col(value)) if passthrough else curie


# ---------------------------------------------------------------------------
# triple hashing (native)
# ---------------------------------------------------------------------------


def hash_uri_triple_col(
    subject_uri: "Column | str",
    predicate_uri: "Column | str",
    object_uri: "Column | str",
    *,
    negate: bool = False,
) -> Column:
    """SHA-256 of the space-joined URI triple (reference
    triples/hash_utils.py:86-115); ``negate`` appends ``~``."""
    digest = F.sha2(
        F.concat_ws(" ", _col(subject_uri), _col(predicate_uri), _col(object_uri)), 256
    )
    return F.concat(digest, F.lit("~")) if negate else digest


def hash_triple_col(
    subject: "Column | str",
    predicate: "Column | str",
    object: "Column | str",
    converter,
    *,
    negate: bool = False,
) -> Column:
    """Hash of a CURIE triple after strict expansion (reference
    triples/hash_utils.py:17-83 and api.py:2735-2766)."""
    return hash_uri_triple_col(
        expand_col(subject, converter),
        expand_col(predicate, converter),
        expand_col(object, converter),
        negate=negate,
    )


# ---------------------------------------------------------------------------
# W3C validation (native rlike)
# ---------------------------------------------------------------------------


def is_w3c_prefix_col(prefix: "Column | str") -> Column:
    """Full NCName match (reference w3c.py:69-104)."""
    return _col(prefix).rlike(f"^{NCNAME_PATTERN}$")


def is_w3c_curie_col(curie: "Column | str") -> Column:
    """CURIE grammar with bracket/blank rejection (reference w3c.py:111-173).

    Note the reference's LUID probe is ``re.match`` (start-anchored only)
    against a pattern with a nullable alternative — it accepts any string —
    so validity reduces to the bracket/blank guards plus, when a non-empty
    prefix is present, the NCName check.
    """
    c = _col(curie)
    pos = F.locate(":", c)
    prefix = F.substring_index(c, ":", 1)
    luid_ok = F.lit(True)  # see docstring — reference LUID pattern matches anything
    _ = LOCAL_UNIQUE_IDENTIFIER_PATTERN  # retained for parity documentation
    return (
        F.when(c.contains("[") | c.contains("]"), F.lit(False))
        .when(F.trim(c) == "", F.lit(False))
        .when(pos == 0, luid_ok)  # no delimiter: LUID-only form (locate is 1-based)
        .when(prefix == "", luid_ok)  # ":x" — empty prefix is allowed
        .otherwise(prefix.rlike(f"^{NCNAME_PATTERN}$") & luid_ok)
    )


def validate_identifier_col(
    prefix: "Column | str", identifier: "Column | str", converter
) -> Column:
    """Per-prefix regex validation of identifiers against the converter's
    ``pattern_map`` (reference Record.pattern, api.py:683-689 + the
    ``standardize_identifier`` subclass hook, api.py:2066-2083): TRUE on
    full match, FALSE on mismatch, NULL when the prefix has no pattern.

    Native: an ordered when-chain (one ``rlike`` per patterned prefix) —
    pattern maps are record-scale, and each row evaluates exactly one
    branch's regex.
    """
    p, i = _col(prefix), _col(identifier)
    conv = _broadcast(converter)
    expr: Column = F.lit(None).cast("boolean")
    for record_prefix, pattern in reversed(list(conv.pattern_map.items())):
        # unconditional non-capturing wrap: idempotent for anchored
        # patterns, and immune to a literal trailing '\$' fooling an
        # endswith('$') heuristic into skipping the anchor
        anchored = "^(?:" + pattern + ")$"
        expr = F.when(p == record_prefix, i.rlike(anchored)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# strict-mode audit
# ---------------------------------------------------------------------------


def assert_no_nulls(df: DataFrame, column: str, *, label: str = "conversion") -> DataFrame:
    """Columnar strict mode: raise if any row failed to convert.

    The reference raises per value (``CompressionError`` etc.); at data
    scale we audit post-hoc — one job over the already-computed column.
    """
    misses = df.filter(F.col(column).isNull()).count()
    if misses:
        raise StrictConversionError(
            f"strict {label}: {misses} row(s) could not be converted in column {column!r}"
        )
    return df
