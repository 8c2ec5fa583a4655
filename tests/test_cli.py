"""CLI parity with the reference click CLI (reference cli.py:145-187):
``python -m curies_spark resolver|mapper LOCATION`` boots the web apps,
plus the engine-specific ``construct`` subcommand wrapping the Spark
job. Apps are captured via a patched ``_run_app`` and driven with test
clients — no sockets."""

from __future__ import annotations

import json

import pytest
from click.testing import CliRunner

from curies_spark import cli

PM = {"CHEBI": "http://purl.obolibrary.org/obo/CHEBI_"}


@pytest.fixture()
def capture_run(monkeypatch):
    captured = {}

    def fake_run_app(app, server, host, port):
        captured.update(app=app, server=server, host=host, port=port)

    monkeypatch.setattr(cli, "_run_app", fake_run_app)
    return captured


def _write_pm(tmp_path):
    path = tmp_path / "pm.json"
    path.write_text(json.dumps(PM))
    return str(path)


def test_help_lists_subcommands():
    result = CliRunner().invoke(cli.main, ["--help"])
    assert result.exit_code == 0
    for sub in ("resolver", "mapper", "construct"):
        assert sub in result.output


def test_resolver_from_prefix_map_file(tmp_path, capture_run):
    result = CliRunner().invoke(
        cli.main,
        ["resolver", _write_pm(tmp_path), "--format", "prefix_map", "--port", "9"],
    )
    assert result.exit_code == 0, result.output
    assert capture_run["server"] == "werkzeug" and capture_run["port"] == 9
    client = capture_run["app"].test_client()
    res = client.get("/CHEBI:138488")
    assert res.status_code == 302
    assert res.headers["Location"] == "http://purl.obolibrary.org/obo/CHEBI_138488"
    assert client.get("/missing:1").status_code == 422


def test_mapper_from_prefix_map_file(tmp_path, capture_run):
    result = CliRunner().invoke(
        cli.main, ["mapper", _write_pm(tmp_path), "--format", "prefix_map"]
    )
    assert result.exit_code == 0, result.output
    client = capture_run["app"].test_client()
    sparql = (
        "SELECT ?o WHERE { <http://purl.obolibrary.org/obo/CHEBI_2> "
        "<http://www.w3.org/2002/07/owl#sameAs> ?o }"
    )
    res = client.get(
        "/sparql", query_string={"query": sparql}, headers={"accept": "application/json"}
    )
    assert res.status_code == 200
    values = {
        b["o"]["value"]
        for b in json.loads(res.data)["results"]["bindings"]
    }
    assert "http://purl.obolibrary.org/obo/CHEBI_2" in values


def test_format_required_for_non_preset(tmp_path, capture_run):
    result = CliRunner().invoke(cli.main, ["resolver", _write_pm(tmp_path)])
    assert result.exit_code == 1
    assert "--format is required" in result.output


def test_resolver_from_preset_uses_injected_fetcher(capture_run):
    import curies_spark

    def fake_fetcher(url: str) -> str:
        return '{"@context": {"GO": "http://purl.obolibrary.org/obo/GO_"}}'

    previous = curies_spark.set_url_fetcher(fake_fetcher)
    try:
        result = CliRunner().invoke(cli.main, ["resolver", "obo"])
    finally:
        curies_spark.set_url_fetcher(previous)
    assert result.exit_code == 0, result.output
    res = capture_run["app"].test_client().get("/GO:1")
    assert res.headers["Location"] == "http://purl.obolibrary.org/obo/GO_1"


def test_construct_forwards_args(monkeypatch):
    seen = {}

    def fake_job_main(argv):
        seen["argv"] = argv
        return 0

    import curies_spark.plans.submit_job as sj

    monkeypatch.setattr(sj, "main", fake_job_main)
    result = CliRunner().invoke(
        cli.main, ["construct", "--synthetic", "10", "--output", "/tmp/x"]
    )
    assert result.exit_code == 0
    assert seen["argv"] == ["--synthetic", "10", "--output", "/tmp/x"]


def test_unhandled_framework_and_server_raise():
    with pytest.raises(ValueError, match="framework"):
        cli._get_resolver_app(object(), framework="django")
    with pytest.raises(ValueError, match="server"):
        cli._run_app(object(), server="apache", host="h", port=1)


# --- FastAPI variants: clear ImportError without fastapi, full round
# trip when it is installed (same lazy-glue pattern as database.py) ----------

try:
    import fastapi  # noqa: F401

    HAS_FASTAPI = True
except ImportError:
    HAS_FASTAPI = False


@pytest.mark.skipif(HAS_FASTAPI, reason="fastapi installed")
def test_fastapi_factories_raise_clear_importerror():
    from curies_spark.core.converter import Converter
    from curies_spark.services import mapping, resolver

    conv = Converter.from_prefix_map(PM)
    with pytest.raises(ImportError, match="fastapi"):
        resolver.get_fastapi_router(conv)
    with pytest.raises(ImportError, match="fastapi"):
        mapping.get_fastapi_mapping_router(conv)


@pytest.mark.skipif(not HAS_FASTAPI, reason="fastapi not installed")
def test_fastapi_resolver_and_mapper_round_trip():
    from starlette.testclient import TestClient

    from curies_spark.core.converter import Converter
    from curies_spark.services import get_fastapi_app, get_fastapi_mapping_app

    conv = Converter.from_prefix_map(PM)
    res = TestClient(get_fastapi_app(conv)).get(
        "/CHEBI:138488", follow_redirects=False
    )
    assert res.status_code == 302
    assert res.headers["location"] == "http://purl.obolibrary.org/obo/CHEBI_138488"

    sparql = (
        "SELECT ?o WHERE { <http://purl.obolibrary.org/obo/CHEBI_2> "
        "<http://www.w3.org/2002/07/owl#sameAs> ?o }"
    )
    res = TestClient(get_fastapi_mapping_app(conv)).get(
        "/sparql", params={"query": sparql}, headers={"accept": "application/json"}
    )
    assert res.status_code == 200
    assert "CHEBI_2" in res.text
