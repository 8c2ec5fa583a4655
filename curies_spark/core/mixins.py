"""Mixin ABCs for converter-aware object processing.

Semantics from reference mixins.py:13-285: objects that know how to
process/standardize themselves against a :class:`Converter`, plus
``process``/``standardize`` helpers polymorphic over None / a single
instance / an iterable. Driver-scale conveniences — the data-scale
equivalent is the ``DataFrame.transform`` convention over
:class:`curies_spark.functions.spark_converter.SparkConverter` columns.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Generic, Iterable, TypeVar

from .converter import Converter

__all__ = [
    "SemanticallyProcessable",
    "SemanticallyStandardizable",
    "process",
    "process_many",
    "standardize",
    "standardize_many",
]

X = TypeVar("X")


class SemanticallyProcessable(ABC, Generic[X]):
    """A class whose raw instances (e.g. holding unprocessed URIs) can be
    processed into reference-holding instances with a converter
    (reference mixins.py:25-77)."""

    @abstractmethod
    def process(self, converter: Converter) -> X:
        """Process this raw instance."""
        raise NotImplementedError


class SemanticallyStandardizable(ABC):
    """An object that can standardize every reference it holds against a
    converter (reference mixins.py:133-222)."""

    @abstractmethod
    def standardize(self, converter: Converter) -> "Any":
        """Standardize all references in the object."""
        raise NotImplementedError


def process(
    instances: "SemanticallyProcessable[X] | Iterable[SemanticallyProcessable[X]] | None",
    converter: Converter,
    *,
    return_iterator: bool = False,
) -> "X | list[X] | Iterable[X] | None":
    """Process None / one instance / an iterable of instances
    (reference mixins.py:112-127)."""
    if instances is None:
        return None
    if isinstance(instances, Iterable):
        if return_iterator:
            return (instance.process(converter) for instance in instances)
        return [instance.process(converter) for instance in instances]
    return instances.process(converter)


process_many = process


def standardize(
    instances: "SemanticallyStandardizable | Iterable[SemanticallyStandardizable] | None",
    converter: Converter,
    *,
    return_iterator: bool = False,
) -> "Any":
    """Standardize None / one instance / an iterable of instances
    (reference mixins.py:262-282)."""
    if instances is None:
        return None
    if isinstance(instances, Iterable):
        if return_iterator:
            return (instance.standardize(converter) for instance in instances)
        return [instance.standardize(converter) for instance in instances]
    return instances.standardize(converter)


standardize_many = standardize
