"""Deterministic synthetic source-code corpus (the ``repos`` input table).

Schema per BASELINE.json ``input_hint``: ``repo, path, commit, lang,
content`` — source text seeded with embedded URIs and CURIEs drawn from
a Bioregistry-style EPM, skewed toward ``obo``/``pubmed`` (the Zipfian
prefix distribution the north rule calls out), plus non-matching noise.

Generation is 100% Spark-native (``spark.range`` + hash-derived
columns): no Python RNG, no driver-side data, reproducible at any scale
— the same generator that makes 10^4 rows for tests would make 10^12 on
a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.converter import Converter

__all__ = ["PIPELINE_EPM", "pipeline_converter", "generate_repos"]

#: Bioregistry-style extended prefix map used by the KG pipeline fixtures.
PIPELINE_EPM = [
    {
        "prefix": "obo",
        "uri_prefix": "http://purl.obolibrary.org/obo/",
        "uri_prefix_synonyms": ["https://purl.obolibrary.org/obo/"],
    },
    {
        "prefix": "CHEBI",
        "prefix_synonyms": ["chebi"],
        "uri_prefix": "http://purl.obolibrary.org/obo/CHEBI_",
        "uri_prefix_synonyms": ["https://identifiers.org/chebi:"],
    },
    {"prefix": "GO", "prefix_synonyms": ["go"], "uri_prefix": "http://purl.obolibrary.org/obo/GO_"},
    {"prefix": "MONDO", "uri_prefix": "http://purl.obolibrary.org/obo/MONDO_"},
    {"prefix": "DOID", "uri_prefix": "http://purl.obolibrary.org/obo/DOID_"},
    {
        "prefix": "pubmed",
        "prefix_synonyms": ["PMID"],
        "uri_prefix": "https://pubmed.ncbi.nlm.nih.gov/",
        "uri_prefix_synonyms": ["http://www.ncbi.nlm.nih.gov/pubmed/"],
    },
    {"prefix": "mesh", "uri_prefix": "http://id.nlm.nih.gov/mesh/"},
    {
        "prefix": "uniprot",
        "uri_prefix": "https://www.uniprot.org/uniprotkb/",
        "uri_prefix_synonyms": ["http://purl.uniprot.org/uniprot/"],
    },
    {"prefix": "skos", "uri_prefix": "http://www.w3.org/2004/02/skos/core#"},
    {"prefix": "rdfs", "uri_prefix": "http://www.w3.org/2000/01/rdf-schema#"},
]


def pipeline_converter() -> Converter:
    return Converter.from_extended_prefix_map(PIPELINE_EPM)


def generate_repos(
    spark: SparkSession,
    n_files: int,
    *,
    n_repos: "int | None" = None,
    partitions: "int | None" = None,
) -> DataFrame:
    """Generate the deterministic repos corpus.

    Each file's content embeds 0-4 mentions whose prefix distribution is
    skewed (obo+pubmed ≈ 70%), mixed with noise tokens and near-miss
    URIs that must NOT link.
    """
    n_repos = n_repos or max(n_files // 50, 1)
    df = spark.range(0, n_files, 1, partitions or spark.sparkContext.defaultParallelism)
    fid = F.col("id")
    h = F.abs(F.xxhash64(fid))  # deterministic per-row entropy

    repo = F.concat(
        F.lit("org"), (h % 97).cast("string"), F.lit("/proj"), (fid % n_repos).cast("string")
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in ("py", "md", "java", "ttl", "json", "rs")]),
        ((h / 7) % 6).cast("int") + 1,
    )
    path = F.concat(
        F.lit("src/"),
        ((h / 11) % 20).cast("string"),
        F.lit("/file_"),
        (fid % 1000).cast("string"),
        F.lit("."),
        lang,
    )
    commit = F.sha1(fid.cast("string"))

    # skewed mention mix: thresholds over h%100 → obo 35%, pubmed 30%,
    # CHEBI 15%, GO 10%, synonym-form 5%, unparsable noise 5%
    bucket = h % 100
    mention1 = (
        F.when(bucket < 35, F.concat(F.lit("http://purl.obolibrary.org/obo/ns"), (h % 5).cast("string"), F.lit(".owl")))
        .when(bucket < 65, F.concat(F.lit("https://pubmed.ncbi.nlm.nih.gov/"), (h % 100000).cast("string")))
        .when(bucket < 80, F.concat(F.lit("http://purl.obolibrary.org/obo/CHEBI_"), (h % 20000).cast("string")))
        .when(bucket < 90, F.concat(F.lit("GO:"), F.lpad((h % 100000).cast("string"), 7, "0")))
        .when(bucket < 95, F.concat(F.lit("https://identifiers.org/chebi:"), (h % 9999).cast("string")))
        .otherwise(F.concat(F.lit("http://unlinked.example.com/x/"), (h % 50).cast("string")))
    )
    mention2 = (
        F.when(bucket % 3 == 0, F.concat(F.lit("PMID:"), ((h / 13) % 100000).cast("string")))
        .when(bucket % 3 == 1, F.concat(F.lit("MONDO:"), F.lpad(((h / 13) % 9999).cast("string"), 7, "0")))
        .otherwise(F.concat(F.lit("http://id.nlm.nih.gov/mesh/C"), ((h / 13) % 5000).cast("string")))
    )
    noise = F.concat(
        F.lit("def handler_"),
        (h % 1000).cast("string"),
        F.lit("(x): # lookup "),
        F.lit("https://example.org/not-registered/"),
        (h % 30).cast("string"),
    )
    content = F.concat_ws(
        " ",
        F.lit("// auto-generated module"),
        noise,
        F.lit("refs:"),
        mention1,
        F.when((h % 4) < 3, mention2),  # 25% of files have only one mention
        F.lit("end."),
    )
    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def generate_epm(n_records: int, *, synonyms: bool = True) -> "list[dict]":
    """Deterministic Bioregistry-scale extended prefix map: ``n_records``
    records with realistic URI shapes, nested/overlapping URI prefixes
    (every 10th record shares a parent namespace, exercising
    longest-prefix matching) and prefix/URI synonyms on every 3rd record.
    Above ``NATIVE_COMPRESS_THRESHOLD`` records the compress kernel takes
    the broadcast-trie pandas-UDF path — the north star's hot path."""
    records: list[dict] = []
    for i in range(n_records):
        prefix = f"ns{i}"
        if i % 10 == 5:
            # child namespace of the record 5 before it → overlapping
            uri_prefix = f"http://vocab{i - 5}.example.org/term/SUB_"
        else:
            uri_prefix = f"http://vocab{i}.example.org/term/"
        record: dict = {"prefix": prefix, "uri_prefix": uri_prefix}
        if synonyms and i % 3 == 0:
            record["prefix_synonyms"] = [f"NS{i}"]
            record["uri_prefix_synonyms"] = [f"https://mirror.example.net/v{i}/"]
        records.append(record)
    return records
