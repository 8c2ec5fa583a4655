"""Command-line interface: serve a resolver or mapper web app, or run
the KG construction job.

Mirrors the reference CLI surface (reference cli.py:1-187)::

    $ python -m curies_spark resolver --host 0.0.0.0 --port 8764 obo
    $ python -m curies_spark mapper --host 0.0.0.0 --port 8764 obo

The positional argument is either a preset converter name (bioregistry,
go, obo, monarch, prefixcommons — these need an installed URL fetcher,
:func:`curies_spark.set_url_fetcher`, since the engine never does
ambient network I/O) or a local file path / URL together with
``--format``. ``--framework`` picks flask (default) or fastapi;
``--server`` picks werkzeug (default) or uvicorn, exactly as in the
reference.

The engine-specific third subcommand runs the distributed pipeline::

    $ python -m curies_spark construct --synthetic 100000 --output /tmp/kg

(equivalently ``spark-submit curies_spark/plans/submit_job.py …`` on a
real cluster, plans/submit_job.py).
"""

from __future__ import annotations

import sys
from typing import Any, Callable, Mapping

import click

from .core.converter import Converter
from .sources import presets

__all__ = ["main"]

#: --format value → loader classmethod (reference cli.py:49-55); every
#: loader accepts a file path, URL, or literal via ``_prepare``
LOADERS: "dict[str, Callable[[str], Converter]]" = {
    "jsonld": Converter.from_jsonld,
    "prefix_map": Converter.from_prefix_map,
    "extended_prefix_map": Converter.from_extended_prefix_map,
    "reverse_prefix_map": Converter.from_reverse_prefix_map,
    "priority_prefix_map": Converter.from_priority_prefix_map,
}

#: preset converter name → getter (reference cli.py:57-63)
CONVERTERS: "Mapping[str, Callable[[], Converter]]" = {
    "bioregistry": presets.get_bioregistry_converter,
    "go": presets.get_go_converter,
    "monarch": presets.get_monarch_converter,
    "obo": presets.get_obo_converter,
    "prefixcommons": presets.get_prefixcommons_converter,
}


def _get_converter(location: str, format: "str | None") -> Converter:
    """Resolve the positional LOCATION argument (reference cli.py:66-72)."""
    if location in CONVERTERS:
        return CONVERTERS[location]()
    if format is None:
        click.secho("--format is required with remote data", fg="red")
        sys.exit(1)
    return LOADERS[format](location)


def _get_resolver_app(converter: Converter, framework: str) -> Any:
    from . import services

    if framework == "flask":
        return services.resolver.get_flask_app(converter)
    if framework == "fastapi":
        return services.resolver.get_fastapi_app(converter)
    raise ValueError(f"Unhandled framework: {framework}")


def _get_mapper_app(converter: Converter, framework: str) -> Any:
    from . import services

    if framework == "flask":
        return services.mapping.get_flask_mapping_app(converter)
    if framework == "fastapi":
        return services.mapping.get_fastapi_mapping_app(converter)
    raise ValueError(f"Unhandled framework: {framework}")


def _run_app(app: Any, server: str, host: str, port: int) -> None:
    """Boot the app under the chosen server (reference cli.py:97-111)."""
    if server == "uvicorn":
        import uvicorn

        uvicorn.run(app, host=host, port=port)
    elif server == "werkzeug":
        import flask

        if not isinstance(app, flask.Flask):
            raise NotImplementedError("werkzeug can only serve the flask framework")
        app.run(host=host, port=port)
    elif server == "gunicorn":
        raise NotImplementedError
    else:
        raise ValueError(f"Unhandled server: {server}")


LOCATION_ARGUMENT = click.argument("location")
FRAMEWORK_OPTION = click.option(
    "--framework",
    default="flask",
    type=click.Choice(["flask", "fastapi"]),
    show_default=True,
    help="The framework used to implement the app.",
)
SERVER_OPTION = click.option(
    "--server",
    default="werkzeug",
    type=click.Choice(["werkzeug", "uvicorn", "gunicorn"]),
    show_default=True,
    help="The web server used to run the app.",
)
FORMAT_OPTION = click.option(
    "--format",
    type=click.Choice(list(LOADERS)),
    help="The data structure of the resolver data. "
    "Required if not giving a preset converter name.",
)
HOST_OPTION = click.option(
    "--host",
    default="0.0.0.0",  # noqa: S104 — same default as the reference CLI
    show_default=True,
    help="The host where the service runs",
)
PORT_OPTION = click.option(
    "--port", type=int, default=8764, show_default=True,
    help="The port where the service runs",
)


@click.group()
def main() -> None:
    """curies-spark: KG construction engine and CURIE service CLI."""


@main.command(
    help="Serve a CURIE resolver app. "
    "LOCATION is a preset converter name, file path, or URL."
)
@LOCATION_ARGUMENT
@FRAMEWORK_OPTION
@SERVER_OPTION
@FORMAT_OPTION
@HOST_OPTION
@PORT_OPTION
def resolver(
    location: str, host: str, port: int, framework: str, format: str, server: str
) -> None:
    """Serve a resolver app (reference cli.py:150-165)."""
    converter = _get_converter(location, format)
    app = _get_resolver_app(converter, framework=framework)
    _run_app(app, server=server, host=host, port=port)


@main.command(
    help="Serve an owl:sameAs SPARQL mapper app. "
    "LOCATION is a preset converter name, file path, or URL."
)
@LOCATION_ARGUMENT
@FRAMEWORK_OPTION
@SERVER_OPTION
@FORMAT_OPTION
@HOST_OPTION
@PORT_OPTION
def mapper(
    location: str, host: str, port: int, framework: str, format: str, server: str
) -> None:
    """Serve a mapper app (reference cli.py:168-183)."""
    converter = _get_converter(location, format)
    app = _get_mapper_app(converter, framework=framework)
    _run_app(app, server=server, host=host, port=port)


@main.command(
    context_settings={"ignore_unknown_options": True},
    add_help_option=False,
    help="Run the distributed KG construction pipeline (Spark job). "
    "All flags are forwarded to plans/submit_job.py.",
)
@click.argument("job_args", nargs=-1, type=click.UNPROCESSED)
def construct(job_args: "tuple[str, ...]") -> None:
    """KG construction job (engine-specific; plans/submit_job.py)."""
    from .plans.submit_job import main as job_main

    sys.exit(job_main(list(job_args)))


if __name__ == "__main__":
    main()
