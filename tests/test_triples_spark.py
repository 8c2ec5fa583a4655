"""Ports of reference triples tests to the DataFrame operators.

Fixture topology from /root/reference/tests/test_triples/test_ops.py:19-61
(1:1, 1:N, N:1, M:N, cross-prefix, duplicate) and test_filter.py.
"""

import pytest
from pyspark.sql import Row

from curies_spark.core import Converter
from curies_spark.operators import triples as T
from curies_spark.operators.discovery import discover as spark_discover

EXACT = "skos:exactMatch"
SUB = "rdfs:subClassOf"

# reference test_ops.py:40-58
M1 = Row(subject="p1:1", predicate=EXACT, object="p2:A")  # one-to-one
M2 = Row(subject="p1:2", predicate=EXACT, object="p2:B")  # one-to-many
M3 = Row(subject="p1:2", predicate=EXACT, object="p2:C")
M4 = Row(subject="p1:4", predicate=EXACT, object="p2:D")  # many-to-one
M5 = Row(subject="p1:5", predicate=EXACT, object="p2:D")
M6 = Row(subject="p1:6", predicate=EXACT, object="p2:E")  # many-to-many
M7 = Row(subject="p1:6", predicate=EXACT, object="p2:F")
M8 = Row(subject="p1:7", predicate=EXACT, object="p2:E")
M9 = Row(subject="p1:7", predicate=EXACT, object="p2:F")
M10 = Row(subject="p1:1", predicate=EXACT, object="p3:gamma")
M11 = Row(subject="p1:1", predicate=EXACT, object="p2:A")  # duplicate of M1

ALL = [M1, M2, M3, M4, M5, M6, M7, M8, M9, M10, M11]


@pytest.fixture(scope="module")
def tdf(spark):
    return spark.createDataFrame(ALL)


def _rows(df):
    return [tuple(r) for r in df.select("subject", "predicate", "object").collect()]


def test_many_to_many(tdf):
    # reference test_ops.py:203-209: exactly the M:N component survives
    got = sorted(set(_rows(T.get_prefix_stratified_many_to_many(tdf))))
    want = sorted({tuple(m) for m in [M6, M7, M8, M9]})
    assert got == want

    kept = _rows(T.exclude_prefix_stratified_many_to_many(tdf))
    assert sorted(kept) == sorted(tuple(m) for m in [M1, M2, M3, M4, M5, M10, M11])


def test_many_to_many_needs_both_sides(spark):
    """1:N alone and N:1 alone are not M:N (reference test_ops.py:137-173)."""
    df = spark.createDataFrame([M1, M2, M3])  # only 1:N
    assert _rows(T.get_prefix_stratified_many_to_many(df)) == []
    df = spark.createDataFrame([M4, M5])  # only N:1
    assert _rows(T.get_prefix_stratified_many_to_many(df)) == []


def test_many_to_many_flip_filter(spark):
    """The flip step (reference ops.py:120-131) requires the subject to have
    ≥2 *popular* objects: s1→{o1,o2}, o1 popular, o2 not → not M:N."""
    rows = [
        Row(subject="p1:s1", predicate=EXACT, object="p2:o1"),
        Row(subject="p1:s1", predicate=EXACT, object="p2:o2"),
        Row(subject="p1:s2", predicate=EXACT, object="p2:o1"),
    ]
    df = spark.createDataFrame(rows)
    assert _rows(T.get_prefix_stratified_many_to_many(df)) == []


def test_reference_index(tdf):
    fwd = {
        r["reference"]: list(r["references"])
        for r in T.get_reference_index(tdf).collect()
    }
    assert fwd == {
        "p1:1": ["p2:A", "p3:gamma"],
        "p1:2": ["p2:B", "p2:C"],
        "p1:4": ["p2:D"],
        "p1:5": ["p2:D"],
        "p1:6": ["p2:E", "p2:F"],
        "p1:7": ["p2:E", "p2:F"],
    }
    bwd = {
        r["reference"]: list(r["references"])
        for r in T.get_reference_index(tdf, backward=True).collect()
    }
    assert bwd["p2:D"] == ["p1:4", "p1:5"]


def test_prefix_filters(spark):
    # reference test_filter.py:55-160 shapes
    c1, c2, c3 = "DOID:0050577", "mesh:C562966", "umls:C4551571"
    m1 = Row(subject=c1, predicate=EXACT, object=c2)
    m2 = Row(subject=c2, predicate=EXACT, object=c3)
    m3 = Row(subject=c1, predicate=EXACT, object=c3)
    df = spark.createDataFrame([m1, m2, m3])

    assert _rows(T.keep_prefixes_both(df, {"DOID", "mesh"})) == [tuple(m1)]
    with pytest.raises(ValueError):
        T.keep_prefixes_both(df, {"DOID"})
    assert sorted(_rows(T.keep_prefixes_either(df, {"DOID", "mesh"}))) == sorted(
        [tuple(m1), tuple(m2), tuple(m3)]
    )
    assert _rows(T.keep_subject_prefixes(df, "mesh")) == [tuple(m2)]
    assert _rows(T.keep_object_prefixes(df, "mesh")) == [tuple(m1)]
    assert _rows(T.exclude_subject_prefixes(df, "mesh")) == [tuple(m1), tuple(m3)]
    assert _rows(T.exclude_object_prefixes(df, {"mesh", "umls"})) == []
    assert _rows(T.exclude_prefixes_both(df, "umls")) == [tuple(m1)]

    same = Row(subject="DOID:1", predicate=SUB, object="DOID:2")
    df2 = spark.createDataFrame([m1, same])
    assert _rows(T.exclude_same_prefixes(df2)) == [tuple(m1)]

    assert _rows(T.keep_predicates(df2, SUB)) == [tuple(same)]


def test_reference_membership_filters(spark):
    c1, c2, c3 = "DOID:0050577", "mesh:C562966", "umls:C4551571"
    m1 = Row(subject=c1, predicate=EXACT, object=c2)
    m2 = Row(subject=c2, predicate=EXACT, object=c3)
    df = spark.createDataFrame([m1, m2])

    assert _rows(T.keep_references_either(df, [c1])) == [tuple(m1)]
    assert _rows(T.keep_references_both(df, [c1, c2])) == [tuple(m1)]
    with pytest.raises(ValueError):
        T.keep_references_both(df, [c1])
    assert _rows(T.exclude_references_both(df, [c1])) == [tuple(m2)]


def test_exclude_triples_and_hash(spark):
    converter = Converter.from_prefix_map(
        {
            "DOID": "http://purl.obolibrary.org/obo/DOID_",
            "skos": "http://www.w3.org/2004/02/skos/core#",
            "mesh": "http://id.nlm.nih.gov/mesh/",
            "umls": "https://uts.nlm.nih.gov/uts/umls/concept/",
            "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
        }
    )
    c1, c2, c3 = "DOID:0050577", "mesh:C562966", "DOID:225"
    m1 = Row(subject=c1, predicate=EXACT, object=c2)
    m2 = Row(subject=c2, predicate=EXACT, object=c3)
    m3 = Row(subject=c1, predicate="rdfs:subClassOf", object=c3)
    df = spark.createDataFrame([m1, m2, m3])

    # known digest from reference test_filter.py:365-373
    m1_hash = "081f943d3791dae3a85f8eb9190fee3fbdc47ba269a374e4a0a28a2b0b982625"
    assert _rows(T.keep_triples_by_hash(df, converter, m1_hash)) == [tuple(m1)]

    excl = spark.createDataFrame([m2])
    assert sorted(_rows(T.exclude_triples(df, excl))) == sorted([tuple(m1), tuple(m3)])


def test_df_filters(spark):
    df = spark.createDataFrame(
        [Row(curie="CHEBI:1"), Row(curie="CHEBI:2"), Row(curie="GO:3")]
    )
    assert T.filter_df_by_prefixes(df, "curie", "CHEBI").count() == 2
    assert T.filter_df_by_curies(df, "curie", ["CHEBI:1", "GO:3"]).count() == 2
    prefixes = {r["prefix"] for r in T.get_df_unique_prefixes(df, "curie").collect()}
    assert prefixes == {"CHEBI", "GO"}


def test_distributed_discovery(spark):
    from pyspark.sql import functions as F

    uris = (
        [Row(uri=f"http://ran.dom/{i:03}") for i in range(30)]
        + [Row(uri=f"http://a.org/path#x{i}") for i in range(4)]
        + [Row(uri=f"http://c.org/obo/GO_{i:07}") for i in range(2)]
        + [Row(uri="http://d.org/path#b ad")]
    )
    df = spark.createDataFrame(uris)
    converter = spark_discover(df, "uri")
    # must agree exactly with the driver-side reference port
    from curies_spark.core import discover as core_discover

    expected = core_discover([r["uri"] for r in uris])
    assert {(r.prefix, r.uri_prefix) for r in converter.records} == {
        (r.prefix, r.uri_prefix) for r in expected.records
    }
    assert converter.compress("http://ran.dom/002") is not None

    # with a pre-existing converter, its URIs are skipped
    known = Converter.from_prefix_map({"GO": "http://c.org/obo/GO_"})
    conv2 = spark_discover(df, "uri", converter=known)
    expected2 = core_discover([r["uri"] for r in uris], converter=known)
    assert {r.uri_prefix for r in conv2.records} == {
        r.uri_prefix for r in expected2.records
    }

    # cutoff semantics
    conv3 = spark_discover(df, "uri", cutoff=4)
    expected3 = core_discover([r["uri"] for r in uris], cutoff=4)
    assert {(r.prefix, r.uri_prefix) for r in conv3.records} == {
        (r.prefix, r.uri_prefix) for r in expected3.records
    }


def test_discovery_numbering_is_global_across_partitions(spark):
    """The two-phase ns-numbering (range partition → per-partition
    row_number + broadcast offsets) must reproduce the reference's
    GLOBAL lexicographic numbering when the surviving prefix set spans
    many partitions — the regime the old single-partition window
    handled by not scaling."""
    from curies_spark.operators.discovery import discover_records_df

    uris = spark.createDataFrame(
        [
            (f"http://site{i:03d}.example.org/page/{j}",)
            for i in range(40)
            for j in range(3)
        ],
        ["uri"],
    ).repartition(8)
    out = discover_records_df(uris, "uri", cutoff=2).collect()
    assert len(out) == 40
    by_prefix = {r["prefix"]: r["uri_prefix"] for r in out}
    numbered = [by_prefix[f"ns{i}"] for i in range(1, 41)]
    assert numbered == sorted(numbered)  # ns-i follows lexicographic order


def test_df_index_ops(spark):
    """prefix/CURIE → row-id indexes (reference dataframe.py:228-301)."""
    from curies_spark.operators.triples import get_df_curies_index, get_df_prefixes_index

    df = spark.createDataFrame(
        [(1, "CHEBI:1"), (2, "CHEBI:2"), (3, "GO:1"), (4, "CHEBI:1")],
        ["rid", "curie"],
    )
    by_prefix = {
        r["prefix"]: r["row_ids"]
        for r in get_df_prefixes_index(df, "curie", id_col="rid").collect()
    }
    assert by_prefix == {"CHEBI": [1, 2, 4], "GO": [3]}
    by_curie = {
        r["curie"]: r["row_ids"]
        for r in get_df_curies_index(df, "curie", id_col="rid").collect()
    }
    assert by_curie == {"CHEBI:1": [1, 4], "CHEBI:2": [2], "GO:1": [3]}


def test_uris_from_triples(spark):
    from curies_spark.operators.discovery import uris_from_triples

    df = spark.createDataFrame(
        [
            ("http://a.org/e/1", "http://w3.org/skos#exactMatch", "a literal"),
            ("http://a.org/e/1", "http://w3.org/skos#exactMatch", "http://b.org/t_7"),
            ("CHEBI:42", "rdfs:seeAlso", "ftp://files.example.org/x"),
        ],
        ["subject", "predicate", "object"],
    )
    got = sorted(r["uri"] for r in uris_from_triples(df).collect())
    # URI-shaped parts from every position, deduplicated; CURIEs and
    # literals excluded — the isinstance(URIRef) analogue
    assert got == [
        "ftp://files.example.org/x",
        "http://a.org/e/1",
        "http://b.org/t_7",
        "http://w3.org/skos#exactMatch",
    ]


def test_dataframe_valued_membership_sets(spark):
    """keep_triples_by_hash / filter_df_by_curies accept a DataFrame of
    values: the set stays distributed (semi-join) — no .collect() to
    build a driver-side literal — and matches the sequence form."""
    converter = Converter.from_prefix_map(
        {
            "DOID": "http://purl.obolibrary.org/obo/DOID_",
            "skos": "http://www.w3.org/2004/02/skos/core#",
            "mesh": "http://id.nlm.nih.gov/mesh/",
        }
    )
    c1, c2, c3 = "DOID:0050577", "mesh:C562966", "DOID:225"
    m1 = Row(subject=c1, predicate=EXACT, object=c2)
    m2 = Row(subject=c2, predicate=EXACT, object=c3)
    df = spark.createDataFrame([m1, m2])

    m1_hash = "081f943d3791dae3a85f8eb9190fee3fbdc47ba269a374e4a0a28a2b0b982625"
    hash_df = spark.createDataFrame([(m1_hash,)], ["h"])
    got = T.keep_triples_by_hash(df, converter, hash_df)
    assert _rows(got) == [tuple(m1)]
    # the helper column does not leak into the result
    assert got.columns == ["subject", "predicate", "object"]

    curies = spark.createDataFrame([Row(curie="CHEBI:1"), Row(curie="GO:3")])
    cdf = spark.createDataFrame(
        [Row(curie="CHEBI:1"), Row(curie="CHEBI:2"), Row(curie="GO:3")]
    )
    df_form = {r["curie"] for r in T.filter_df_by_curies(cdf, "curie", curies).collect()}
    seq_form = {
        r["curie"]
        for r in T.filter_df_by_curies(cdf, "curie", ["CHEBI:1", "GO:3"]).collect()
    }
    assert df_form == seq_form == {"CHEBI:1", "GO:3"}


def test_dataframe_module_filter_indexes(spark):
    """curies_spark.dataframe boolean-column twins of the reference's
    pandas boolean-Series indexes (reference dataframe.py:83-226)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from curies_spark import Converter
    from curies_spark.dataframe import (
        get_filter_df_by_curies_index,
        get_filter_df_by_prefixes_index,
    )

    df = spark.createDataFrame(
        [("CHEBI:1",), ("GO:2",), ("chebi:3",)], ["curie"]
    )

    idx = get_filter_df_by_prefixes_index(df, column="curie", prefixes=["CHEBI"])
    assert {r["curie"] for r in df.filter(idx).collect()} == {"CHEBI:1"}
    idx = get_filter_df_by_prefixes_index(df, column="curie", prefixes="GO")
    assert {r["curie"] for r in df.filter(idx).collect()} == {"GO:2"}

    conv = Converter.from_extended_prefix_map(
        [{"prefix": "CHEBI", "prefix_synonyms": ["chebi"],
          "uri_prefix": "http://purl.obolibrary.org/obo/CHEBI_"}]
    )
    known = df.filter(~F.col("curie").startswith("GO"))
    idx = get_filter_df_by_prefixes_index(
        known, column="curie", prefixes=["CHEBI"], method="precalculated",
        validate=True, converter=conv,
    )
    # synonym prefix standardizes to CHEBI before membership
    assert {r["curie"] for r in known.filter(idx).collect()} == {"CHEBI:1", "chebi:3"}
    # validate=True raises on out-of-converter prefixes at execution,
    # like the reference's strict parse (not a silent NULL drop)
    idx = get_filter_df_by_prefixes_index(
        df, column="curie", prefixes=["CHEBI"], method="precalculated",
        validate=True, converter=conv,
    )
    with _pytest.raises(Exception, match="could not standardize"):
        df.filter(idx).collect()
    with _pytest.raises(ValueError, match="converter"):
        get_filter_df_by_prefixes_index(
            df, column="curie", prefixes=["CHEBI"], method="precalculated"
        )

    idx = get_filter_df_by_curies_index(df, column="curie", curies={"GO:2", "nope:9"})
    assert {r["curie"] for r in df.filter(idx).collect()} == {"GO:2"}
    idx = get_filter_df_by_curies_index(df, column="curie", curies="CHEBI:1")
    assert {r["curie"] for r in df.filter(idx).collect()} == {"CHEBI:1"}


def test_table_format_seam(spark, tmp_path):
    """write/read_triples_parquet route through the TableFormat seam:
    the default ParquetTables keeps byte-identical behavior (partition
    dirs by subject prefix), a duck-typed format receives the call
    verbatim, and IcebergTables fails loud — with the configuration
    hint — when no catalog is configured (this container has no
    Iceberg runtime; where one exists, the catalog check passes and
    the same calls land in a lakehouse table)."""
    import os

    import pytest

    from curies_spark.sources.loaders import (
        read_triples_parquet,
        write_triples_parquet,
    )
    from curies_spark.sources.tables import IcebergTables, ParquetTables

    triples = spark.createDataFrame(
        [("p1:a", "skos:exactMatch", "p2:b"), ("p2:c", "skos:broadMatch", "p1:d")],
        ["subject", "predicate", "object"],
    )
    path = str(tmp_path / "kg")
    write_triples_parquet(triples, path)
    dirs = {d for d in os.listdir(path) if d.startswith("subject_prefix=")}
    assert dirs == {"subject_prefix=p1", "subject_prefix=p2"}
    back = read_triples_parquet(spark, path, tables=ParquetTables())
    assert back.count() == 2 and back.columns == ["subject", "predicate", "object"]

    calls = []

    class FakeTables:
        def write(self, df, table, *, mode="overwrite", partition_by=None):
            calls.append((table, mode, tuple(partition_by or ())))

        def read(self, spark, table):
            return triples

    write_triples_parquet(triples, "any://name", tables=FakeTables())
    assert calls == [("any://name", "overwrite", ("subject_prefix",))]

    with pytest.raises(RuntimeError, match="spark.sql.catalog.nocat"):
        IcebergTables(spark, "nocat")
