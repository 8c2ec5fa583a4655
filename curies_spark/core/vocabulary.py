"""Predefined vocabulary of common semantic-web references.

The engine's analog of the reference's ``curies.vocabulary`` module
(reference vocabulary.py:15-384): named constants for the predicates and
datatypes that KG pipelines emit — mapping predicates (SKOS + owl:sameAs),
RDF/RDFS/OWL core terms, Dublin Core provenance, XSD datatypes, and the
SEMAPV mapping-process vocabulary used to annotate how a mapping was
produced. Constants are re-derived from the public ontologies themselves
(SKOS, OWL, RDF(S), DCTERMS, XSD, SEMAPV), not copied from the reference.
"""

from __future__ import annotations

from .record import NamedReference

__all__ = [
    "broad_match",
    "close_match",
    "exact_match",
    "narrow_match",
    "related_match",
    "mapping_predicates",
    "owl_same_as",
    "equivalent_class",
    "equivalent_property",
    "rdf_type",
    "rdfs_label",
    "rdfs_comment",
    "rdfs_see_also",
    "rdfs_is_defined_by",
    "rdfs_subclass_of",
    "rdfs_subproperty_of",
    "rdfs_domain",
    "rdfs_range",
    "has_dbxref",
    "has_exact_synonym",
    "has_related_synonym",
    "has_broad_synonym",
    "has_narrow_synonym",
    "alternative_term",
    "definition",
    "creator",
    "contributor",
    "license",
    "charlie",
    "lexical_matching_process",
    "logical_reasoning_process",
    "manual_mapping_curation",
    "composite_matching_process",
    "semantic_similarity_process",
    "unspecified_matching_process",
    "matching_processes",
    "xsd_boolean",
    "xsd_date",
    "xsd_datetime",
    "xsd_decimal",
    "xsd_double",
    "xsd_float",
    "xsd_integer",
    "xsd_string",
    "xsd_year",
    "xsd_uri",
]

# --- SKOS mapping predicates --------------------------------------------

exact_match = NamedReference("skos", "exactMatch", "exact match")
close_match = NamedReference("skos", "closeMatch", "close match")
broad_match = NamedReference("skos", "broadMatch", "broad match")
narrow_match = NamedReference("skos", "narrowMatch", "narrow match")
related_match = NamedReference("skos", "relatedMatch", "related match")

owl_same_as = NamedReference("owl", "sameAs", "same as")
equivalent_class = NamedReference("owl", "equivalentClass", "equivalent class")
equivalent_property = NamedReference("owl", "equivalentProperty", "equivalent property")

#: the predicates a mapping triple may carry, strongest first
mapping_predicates: "list[NamedReference]" = [
    exact_match,
    owl_same_as,
    equivalent_class,
    equivalent_property,
    close_match,
    broad_match,
    narrow_match,
    related_match,
]

# --- RDF / RDFS core ------------------------------------------------------

rdf_type = NamedReference("rdf", "type", "type")
rdfs_label = NamedReference("rdfs", "label", "label")
rdfs_comment = NamedReference("rdfs", "comment", "comment")
rdfs_see_also = NamedReference("rdfs", "seeAlso", "see also")
rdfs_is_defined_by = NamedReference("rdfs", "isDefinedBy", "is defined by")
rdfs_subclass_of = NamedReference("rdfs", "subClassOf", "subclass of")
rdfs_subproperty_of = NamedReference("rdfs", "subPropertyOf", "subproperty of")
rdfs_domain = NamedReference("rdfs", "domain", "domain")
rdfs_range = NamedReference("rdfs", "range", "range")

# --- OBO-in-OWL / IAO annotation properties -------------------------------

has_dbxref = NamedReference("oboInOwl", "hasDbXref", "has database cross-reference")
has_exact_synonym = NamedReference("oboInOwl", "hasExactSynonym", "has exact synonym")
has_related_synonym = NamedReference("oboInOwl", "hasRelatedSynonym", "has related synonym")
has_broad_synonym = NamedReference("oboInOwl", "hasBroadSynonym", "has broad synonym")
has_narrow_synonym = NamedReference("oboInOwl", "hasNarrowSynonym", "has narrow synonym")
alternative_term = NamedReference("IAO", "0000118", "alternative term")
definition = NamedReference("IAO", "0000115", "definition")

# --- Dublin Core provenance -----------------------------------------------

creator = NamedReference("dcterms", "creator", "creator")
contributor = NamedReference("dcterms", "contributor", "contributor")
license = NamedReference("dcterms", "license", "license")  # noqa: A001

#: example curator reference used throughout the reference's docs
charlie = NamedReference("orcid", "0000-0003-4423-4370", "Charles Tapley Hoyt")

# --- SEMAPV mapping-process vocabulary --------------------------------------

lexical_matching_process = NamedReference(
    "semapv", "LexicalMatching", "lexical matching process"
)
logical_reasoning_process = NamedReference(
    "semapv", "LogicalReasoning", "logical reasoning process"
)
manual_mapping_curation = NamedReference(
    "semapv", "ManualMappingCuration", "manual mapping curation"
)
composite_matching_process = NamedReference(
    "semapv", "CompositeMatching", "composite matching process"
)
semantic_similarity_process = NamedReference(
    "semapv", "SemanticSimilarityThresholdMatching", "semantic similarity matching process"
)
unspecified_matching_process = NamedReference(
    "semapv", "UnspecifiedMatching", "unspecified matching process"
)

matching_processes: "list[NamedReference]" = [
    composite_matching_process,
    lexical_matching_process,
    logical_reasoning_process,
    manual_mapping_curation,
    semantic_similarity_process,
    unspecified_matching_process,
]

# --- XSD datatypes ----------------------------------------------------------

xsd_string = NamedReference("xsd", "string", "string")
xsd_boolean = NamedReference("xsd", "boolean", "boolean")
xsd_integer = NamedReference("xsd", "integer", "integer")
xsd_decimal = NamedReference("xsd", "decimal", "decimal")
xsd_float = NamedReference("xsd", "float", "float")
xsd_double = NamedReference("xsd", "double", "double")
xsd_date = NamedReference("xsd", "date", "date")
xsd_datetime = NamedReference("xsd", "dateTime", "datetime")
xsd_year = NamedReference("xsd", "gYear", "year")
xsd_uri = NamedReference("xsd", "anyURI", "URI")
