"""Demo fixtures shared by ``__spark_entry__`` queries and their DuckDB oracles.

The driver verifies each Spark query against an equivalent DuckDB SQL
string over the same parquet tables (see repo README / TESTDATA.md). To
keep the two sides in lock-step, this module defines:

- the demo extended prefix map (overlapping URI prefixes + synonyms, the
  same shapes as reference tests/test_api.py:299-320), and
- derivation rules that turn TPC-H-ish columns into URIs / CURIEs /
  triples, each expressed ONCE as a SQL fragment valid in *both* Spark
  SQL and DuckDB, plus
- oracle-side SQL generators (e.g. the longest-prefix CASE chain) built
  from the same EPM object the Spark kernels broadcast.
"""

from __future__ import annotations

from ..core.converter import Converter

__all__ = [
    "DEMO_EPM",
    "demo_converter",
    "oracle_compress_case",
    "oracle_expand_case",
    "oracle_standardize_prefix_case",
    "URI_EXPR",
    "CURIE_EXPR",
    "TRIPLE_SUBJECT_EXPR",
    "TRIPLE_OBJECT_EXPR",
    "TRIPLE_PREDICATE_EXPR",
]

CHEBI = "http://purl.obolibrary.org/obo/CHEBI_"
GO = "http://purl.obolibrary.org/obo/GO_"
OBO = "http://purl.obolibrary.org/obo/"

DEMO_EPM = [
    {
        "prefix": "CHEBI",
        "prefix_synonyms": ["chebi"],
        "uri_prefix": CHEBI,
        "uri_prefix_synonyms": ["https://identifiers.org/chebi:"],
    },
    {"prefix": "GO", "uri_prefix": GO},
    # overlapping URI prefix to exercise longest-prefix matching
    {"prefix": "OBO", "uri_prefix": OBO},
    {"prefix": "mesh", "uri_prefix": "http://id.nlm.nih.gov/mesh/"},
    {"prefix": "skos", "uri_prefix": "http://www.w3.org/2004/02/skos/core#"},
    {
        "prefix": "pubmed",
        "prefix_synonyms": ["PMID"],
        "uri_prefix": "https://pubmed.ncbi.nlm.nih.gov/",
        "uri_prefix_synonyms": ["http://www.ncbi.nlm.nih.gov/pubmed/"],
    },
]


def demo_converter() -> Converter:
    return Converter.from_extended_prefix_map(DEMO_EPM)


# ---------------------------------------------------------------------------
# shared input derivations (valid in BOTH Spark SQL and DuckDB)
# ---------------------------------------------------------------------------

#: URIs derived from lineitem: a skewed mix of canonical prefixes, a
#: synonym URI prefix, the overlapping OBO prefix, and unparsable noise.
#: Skew is intentional (CHEBI dominates) to mirror the Zipfian prefix
#: distribution called out in SURVEY.md §4.
URI_EXPR = (
    "CASE (l_orderkey * 7 + l_linenumber) % 8 "
    f"WHEN 0 THEN concat('{CHEBI}', CAST(l_partkey AS BIGINT)) "
    f"WHEN 1 THEN concat('{CHEBI}', CAST(l_suppkey AS BIGINT)) "
    f"WHEN 2 THEN concat('{GO}', CAST(l_partkey AS BIGINT)) "
    f"WHEN 3 THEN concat('{OBO}', 'go.owl') "
    "WHEN 4 THEN concat('https://identifiers.org/chebi:', CAST(l_partkey AS BIGINT)) "
    "WHEN 5 THEN concat('http://www.ncbi.nlm.nih.gov/pubmed/', CAST(l_orderkey AS BIGINT)) "
    "WHEN 6 THEN concat('http://id.nlm.nih.gov/mesh/C', CAST(l_partkey AS BIGINT)) "
    "ELSE concat('http://example.org/missing/', CAST(l_partkey AS BIGINT)) END"
)

#: CURIEs derived from lineitem: canonical, synonym, unknown prefixes,
#: multi-colon identifiers, and empty identifiers.
CURIE_EXPR = (
    "CASE (l_orderkey * 5 + l_linenumber) % 8 "
    "WHEN 0 THEN concat('CHEBI:', CAST(l_partkey AS BIGINT)) "
    "WHEN 1 THEN concat('chebi:', CAST(l_partkey AS BIGINT)) "
    "WHEN 2 THEN concat('GO:', CAST(l_partkey AS BIGINT)) "
    "WHEN 3 THEN concat('PMID:', CAST(l_orderkey AS BIGINT)) "
    "WHEN 4 THEN concat('mesh:C', CAST(l_partkey AS BIGINT)) "
    "WHEN 5 THEN concat('OBO:a:b:', CAST(l_partkey AS BIGINT)) "
    "WHEN 6 THEN 'CHEBI:' "
    "ELSE concat('missing:', CAST(l_partkey AS BIGINT)) END"
)

#: Mapping-style triples derived from orders. Modulo classes create true
#: 1:1, 1:N, N:1 and M:N structures; the second branch produces
#: same-prefix (p1, p1) and sparse (p1, p3) strata so prefix filters and
#: M:N detection have non-trivial work on every query.
TRIPLE_SUBJECT_EXPR = "concat('p1:', CAST(o_orderkey % 40 AS BIGINT))"
TRIPLE_OBJECT_EXPR = (
    "CASE o_orderkey % 7 "
    "WHEN 0 THEN concat('p1:', CAST(o_orderkey % 11 AS BIGINT)) "
    "WHEN 1 THEN concat('p3:', CAST(o_orderkey AS BIGINT)) "
    "ELSE concat('p2:', CAST(o_orderkey % 25 AS BIGINT)) END"
)
TRIPLE_PREDICATE_EXPR = (
    "CASE o_orderkey % 3 WHEN 0 THEN 'skos:exactMatch' "
    "WHEN 1 THEN 'skos:closeMatch' ELSE 'rdfs:seeAlso' END"
)

#: RDF-style triples whose parts are full URIs (plus literal noise in the
#: object slot) — the input for the distributed ``get_uris_from_rdf``
#: twin. The three URI families exercise all three discovery delimiters:
#: ``/`` (entity), ``#`` (skos/rdfs predicates), ``_`` (term_N objects).
URI_TRIPLE_SUBJECT_EXPR = (
    "concat('http://kg.example.org/entity/', CAST(o_orderkey % 40 AS BIGINT))"
)
URI_TRIPLE_PREDICATE_EXPR = (
    "CASE o_orderkey % 3 "
    "WHEN 0 THEN 'http://www.w3.org/2004/02/skos/core#exactMatch' "
    "WHEN 1 THEN 'http://www.w3.org/2004/02/skos/core#closeMatch' "
    "ELSE 'http://www.w3.org/2000/01/rdf-schema#seeAlso' END"
)
URI_TRIPLE_OBJECT_EXPR = (
    "CASE o_orderkey % 5 "
    "WHEN 0 THEN concat('http://vocab.example.org/term_', CAST(o_custkey % 30 AS BIGINT)) "
    "WHEN 1 THEN concat('a plain literal ', CAST(o_orderkey AS BIGINT)) "
    "ELSE concat('http://ont.example.org/x#', CAST(o_custkey % 20 AS BIGINT)) END"
)


#: Fully-expandable triples (all prefixes registered in the demo EPM) for
#: the SHA-256 hash query — the reference hashes over *expanded* URIs
#: (triples/hash_utils.py:86-115), so every prefix must resolve.
HASH_SUBJECT_EXPR = "concat('mesh:C', CAST(o_orderkey % 1000 AS BIGINT))"
HASH_OBJECT_EXPR = "concat('CHEBI:', CAST(o_custkey AS BIGINT))"
HASH_PREDICATE_EXPR = (
    "CASE o_orderkey % 2 WHEN 0 THEN 'skos:exactMatch' ELSE 'skos:closeMatch' END"
)

#: URIs against the LARGE generated EPM (sources.synthetic.generate_epm,
#: 200 records → above NATIVE_COMPRESS_THRESHOLD → the broadcast-trie
#: pandas-UDF compress path): parent namespaces, overlapping SUB_ child
#: namespaces (longest-match), mirror synonyms, and unregistered noise.
URI_LARGE_EXPR = (
    "CASE (l_orderkey + l_linenumber) % 4 "
    "WHEN 0 THEN concat('http://vocab', CAST((l_partkey % 20) * 10 AS BIGINT), "
    "'.example.org/term/', CAST(l_orderkey AS BIGINT)) "
    "WHEN 1 THEN concat('http://vocab', CAST((l_partkey % 20) * 10 AS BIGINT), "
    "'.example.org/term/SUB_', CAST(l_orderkey AS BIGINT)) "
    "WHEN 2 THEN concat('https://mirror.example.net/v', CAST((l_partkey % 67) * 3 AS BIGINT), "
    "'/', CAST(l_orderkey AS BIGINT)) "
    "ELSE concat('http://unregistered.example.com/', CAST(l_orderkey AS BIGINT)) END"
)


def large_converter() -> Converter:
    from ..sources.synthetic import generate_epm

    return Converter.from_extended_prefix_map(generate_epm(200))


#: Synthetic mention-bearing text derived from documents — the same
#: deterministic sentence on both sides, so regex mention scans agree.
CONTENT_EXPR = (
    "concat(text, ' see ', "
    f"'{CHEBI}', CAST(doc_id AS BIGINT), "
    "' and GO:', CAST(doc_id * 7 AS BIGINT), "
    "' or https://identifiers.org/chebi:', CAST(doc_id % 13 AS BIGINT), "
    "' not http://example.org/x/', CAST(doc_id AS BIGINT))"
)


#: Values exercising every preprocessing branch: exact rewrite, prefix
#: rewrite, full/prefix blocklists, postprocess suffix strip, plain
#: CURIE/URI, and unparsable noise.
PREPROC_VALUE_EXPR = (
    "CASE (l_orderkey * 3 + l_linenumber) % 8 "
    "WHEN 0 THEN 'is_a' "
    "WHEN 1 THEN concat('OBO:GO_', CAST(l_partkey AS BIGINT)) "
    "WHEN 2 THEN 'blockme' "
    "WHEN 3 THEN concat('bad:', CAST(l_partkey AS BIGINT)) "
    "WHEN 4 THEN concat('GO:', CAST(l_partkey AS BIGINT), '_obsolete') "
    "WHEN 5 THEN concat('chebi:', CAST(l_partkey AS BIGINT)) "
    f"WHEN 6 THEN concat('{CHEBI}', CAST(l_partkey AS BIGINT)) "
    "ELSE concat('noise_', CAST(l_partkey AS BIGINT)) END"
)


def demo_preprocessing_rules():
    """Rules matching PREPROC_VALUE_EXPR's branches."""
    from ..core.preprocessing import (
        PostprocessingRewrites,
        PreprocessingBlocklists,
        PreprocessingRewrites,
        PreprocessingRules,
    )

    return PreprocessingRules(
        rewrites=PreprocessingRewrites(
            full={"is_a": "skos:exactMatch"},
            prefix={"OBO:GO_": "GO:"},
        ),
        blocklists=PreprocessingBlocklists(full=["blockme"], prefix=["bad:"]),
        postprocessing=PostprocessingRewrites(suffix={"GO": ["_obsolete"]}),
    )


def oracle_preprocess_parse_sql(values_sql: str) -> str:
    """DuckDB replication of the preprocessing pipeline over the demo
    rules: full rewrite → prefix rewrite → blocklist → URI-else-CURIE
    parse → postprocess suffix strip."""
    compress = oracle_compress_case("remapped")
    standardize = oracle_standardize_curie_case("remapped")
    return (
        f"WITH v AS ({values_sql}), "
        "pre AS (SELECT value, "
        "CASE WHEN value = 'is_a' THEN 'skos:exactMatch' END AS full_curie, "
        "CASE WHEN starts_with(value, 'OBO:GO_') THEN concat('GO:', substr(value, 8)) "
        "ELSE value END AS remapped FROM v), "
        "flagged AS (SELECT *, (remapped = 'blockme' OR starts_with(remapped, 'bad:')) AS blocked FROM pre), "
        f"parsed AS (SELECT *, coalesce({compress}, {standardize}) AS curie0 FROM flagged), "
        "split AS (SELECT value, full_curie, blocked, "
        "CASE WHEN curie0 IS NOT NULL THEN split_part(curie0, ':', 1) END AS p0, "
        "CASE WHEN curie0 IS NOT NULL THEN substr(curie0, strpos(curie0, ':') + 1) END AS i0 "
        "FROM parsed) "
        "SELECT value, "
        "CASE WHEN full_curie IS NOT NULL THEN split_part(full_curie, ':', 1) "
        "WHEN blocked THEN NULL ELSE p0 END AS prefix, "
        "CASE WHEN full_curie IS NOT NULL THEN substr(full_curie, strpos(full_curie, ':') + 1) "
        "WHEN blocked THEN NULL "
        "WHEN p0 = 'GO' AND ends_with(i0, '_obsolete') THEN substr(i0, 1, length(i0) - 9) "
        "ELSE i0 END AS identifier "
        "FROM split"
    )


# ---------------------------------------------------------------------------
# oracle-side SQL generators (DuckDB dialect)
# ---------------------------------------------------------------------------


def oracle_discover_sql(
    uris_sql: str, *, cutoff: int = 2, github_filter: bool = True
) -> str:
    """DuckDB replication of URI-prefix discovery (delimiter priority
    ``# / _``, alnum LUID, distinct-LUID cutoff, lexicographic ``ns``
    numbering) over any URI-producing subquery."""
    gh = (
        " AND NOT (starts_with(uri, 'https://github.com') AND strpos(uri, 'issues') > 0)"
        if github_filter
        else ""
    )
    return (
        f"WITH uris AS (SELECT DISTINCT uri FROM ({uris_sql}) "
        f"WHERE uri IS NOT NULL{gh}), "
        "cand AS (SELECT uri, CASE "
        "WHEN regexp_full_match(uri, '(.*#)[\\p{L}\\p{N}]+') THEN regexp_extract(uri, '(.*#)[\\p{L}\\p{N}]+', 1) "
        "WHEN regexp_full_match(uri, '(.*/)[\\p{L}\\p{N}]+') THEN regexp_extract(uri, '(.*/)[\\p{L}\\p{N}]+', 1) "
        "WHEN regexp_full_match(uri, '(.*_)[\\p{L}\\p{N}]+') THEN regexp_extract(uri, '(.*_)[\\p{L}\\p{N}]+', 1) "
        "END AS uri_prefix FROM uris), "
        "grouped AS (SELECT uri_prefix, count(DISTINCT substr(uri, length(uri_prefix) + 1)) AS n_luids "
        f"FROM cand WHERE uri_prefix IS NOT NULL GROUP BY uri_prefix HAVING n_luids >= {cutoff}) "
        "SELECT concat('ns', CAST(row_number() OVER (ORDER BY uri_prefix) AS VARCHAR)) AS prefix, "
        "uri_prefix, n_luids FROM grouped"
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def oracle_compress_case(
    uri_sql: str, *, passthrough: bool = False, converter: "Converter | None" = None
) -> str:
    """DuckDB CASE chain implementing longest-prefix-match compression for
    the given EPM (default: demo) — ordered longest URI prefix first,
    mirroring the trie guarantee (reference api.py:1762-1769)."""
    conv = converter if converter is not None else demo_converter()
    entries = sorted(
        conv.reverse_prefix_map.items(), key=lambda kv: len(kv[0]), reverse=True
    )
    whens = " ".join(
        f"WHEN starts_with({uri_sql}, {_sql_quote(up)}) "
        f"THEN concat({_sql_quote(p)}, ':', substr({uri_sql}, {len(up) + 1}))"
        for up, p in entries
    )
    default = f" ELSE {uri_sql}" if passthrough else ""
    return f"CASE {whens}{default} END"


def oracle_expand_case(curie_sql: str, *, passthrough: bool = False) -> str:
    """DuckDB expression implementing CURIE→URI expansion with synonym
    prefix standardization for the demo EPM."""
    conv = demo_converter()
    prefix = f"CASE WHEN strpos({curie_sql}, ':') > 0 THEN split_part({curie_sql}, ':', 1) END"
    identifier = f"substr({curie_sql}, strpos({curie_sql}, ':') + 1)"
    whens = " ".join(
        f"WHEN {prefix} = {_sql_quote(p)} THEN concat({_sql_quote(up)}, {identifier})"
        for p, up in conv.prefix_map.items()
    )
    default = f" ELSE {curie_sql}" if passthrough else ""
    return f"CASE {whens}{default} END"


def oracle_standardize_prefix_case(prefix_sql: str) -> str:
    conv = demo_converter()
    whens = " ".join(
        f"WHEN {prefix_sql} = {_sql_quote(syn)} THEN {_sql_quote(p)}"
        for syn, p in conv.synonym_to_prefix.items()
    )
    return f"CASE {whens} END"


def oracle_standardize_curie_case(curie_sql: str, *, passthrough: bool = False) -> str:
    prefix = f"split_part({curie_sql}, ':', 1)"
    identifier = f"substr({curie_sql}, strpos({curie_sql}, ':') + 1)"
    std = oracle_standardize_prefix_case(prefix)
    expr = (
        f"CASE WHEN strpos({curie_sql}, ':') > 0 AND ({std}) IS NOT NULL "
        f"THEN concat({std}, ':', {identifier}) END"
    )
    if passthrough:
        expr = f"coalesce({expr}, {curie_sql})"
    return expr


def oracle_standardize_uri_case(uri_sql: str) -> str:
    """Longest-prefix parse then re-expand through the canonical URI prefix."""
    conv = demo_converter()
    entries = sorted(
        conv.reverse_prefix_map.items(), key=lambda kv: len(kv[0]), reverse=True
    )
    whens = " ".join(
        f"WHEN starts_with({uri_sql}, {_sql_quote(up)}) "
        f"THEN concat({_sql_quote(conv.bimap[p])}, substr({uri_sql}, {len(up) + 1}))"
        for up, p in entries
    )
    return f"CASE {whens} END"
