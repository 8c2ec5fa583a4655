"""Preprocessing rules: blocklists, rewrites, postprocessing.

Semantics from the reference (/root/reference/src/curies/preprocessing.py:34-417),
re-expressed without pydantic so the rules object broadcasts cheaply.

Pipeline order (reference preprocessing.py:265-417 ``PreprocessingConverter``):
preclean → remap_full (short-circuits) → remap_prefix → blocklist
(raise/pass) → base parse → postprocess suffix strip.
The same ordering is applied column-wise by
:func:`curies_spark.functions.kernels.parse_preprocessed_col`.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Literal

from .converter import Converter
from .record import ReferenceTuple

__all__ = [
    "BlockAction",
    "BlocklistError",
    "PostprocessingRewrites",
    "PreprocessingBlocklists",
    "PreprocessingConverter",
    "PreprocessingRewrites",
    "PreprocessingRules",
]

BlockAction = Literal["raise", "pass"]


class BlocklistError(ValueError):
    """An error for the blocklist (reference preprocessing.py:187-188)."""


@dataclass
class PreprocessingBlocklists:
    """Full/prefix/suffix blocklists, global and per-resource
    (reference preprocessing.py:34-78)."""

    full: list[str] = field(default_factory=list)
    resource_full: dict[str, list[str]] = field(default_factory=dict)
    prefix: list[str] = field(default_factory=list)
    resource_prefix: dict[str, list[str]] = field(default_factory=dict)
    suffix: list[str] = field(default_factory=list)

    def str_has_blocked_prefix(self, s: str, *, context: str | None = None) -> bool:
        if context:
            prefixes = self.resource_prefix.get(context, [])
            if prefixes and any(s.startswith(p) for p in prefixes):
                return True
        return any(s.startswith(p) for p in self.prefix)

    def str_has_blocked_suffix(self, s: str) -> bool:
        return any(s.endswith(suffix) for suffix in self.suffix)

    def str_is_blocked_full(self, s: str, *, context: str | None = None) -> bool:
        if context and s in self.resource_full.get(context, []):
            return True
        return s in self.full

    def str_is_blocked(self, s: str, *, context: str | None = None) -> bool:
        return (
            self.str_has_blocked_prefix(s, context=context)
            or self.str_has_blocked_suffix(s)
            or self.str_is_blocked_full(s, context=context)
        )


@dataclass
class PostprocessingRewrites:
    """Per-prefix identifier suffix strips (reference preprocessing.py:81-84)."""

    suffix: dict[str, list[str]] = field(default_factory=dict)


@dataclass
class PreprocessingRewrites:
    """Full-string and prefix rewrites, global and per-resource
    (reference preprocessing.py:87-130)."""

    full: dict[str, str] = field(default_factory=dict)
    resource_full: dict[str, dict[str, str]] = field(default_factory=dict)
    prefix: dict[str, str] = field(default_factory=dict)
    resource_prefix: dict[str, dict[str, str]] = field(default_factory=dict)

    def remap_full(self, s: str, *, context: str | None = None) -> ReferenceTuple | None:
        """Exact-string → CURIE replacement (reference preprocessing.py:103-119)."""
        if context:
            resource_rewrites = self.resource_full.get(context, {})
            if resource_rewrites and s in resource_rewrites:
                return ReferenceTuple.from_curie(resource_rewrites[s])
        if s in self.full:
            return ReferenceTuple.from_curie(self.full[s])
        return None

    def remap_prefix(self, s: str, *, context: str | None = None) -> str:
        """First matching old-prefix replaces the head (reference preprocessing.py:121-130)."""
        if context is not None:
            for old_prefix, new_prefix in self.resource_prefix.get(context, {}).items():
                if s.startswith(old_prefix):
                    return new_prefix + s[len(old_prefix):]
        for old_prefix, new_prefix in self.prefix.items():
            if s.startswith(old_prefix):
                return new_prefix + s[len(old_prefix):]
        return s


@dataclass
class PreprocessingRules:
    """Blocklists + rewrites + postprocessing (reference preprocessing.py:133-172)."""

    blocklists: PreprocessingBlocklists = field(default_factory=PreprocessingBlocklists)
    rewrites: PreprocessingRewrites = field(default_factory=PreprocessingRewrites)
    postprocessing: PostprocessingRewrites = field(default_factory=PostprocessingRewrites)

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "PreprocessingRules":
        b = data.get("blocklists", {})
        r = data.get("rewrites", {})
        p = data.get("postprocessing", {})
        return cls(
            blocklists=PreprocessingBlocklists(
                full=list(b.get("full", [])),
                resource_full={k: list(v) for k, v in b.get("resource_full", {}).items()},
                prefix=list(b.get("prefix", [])),
                resource_prefix={
                    k: list(v) for k, v in b.get("resource_prefix", {}).items()
                },
                suffix=list(b.get("suffix", [])),
            ),
            rewrites=PreprocessingRewrites(
                full=dict(r.get("full", {})),
                resource_full={k: dict(v) for k, v in r.get("resource_full", {}).items()},
                prefix=dict(r.get("prefix", {})),
                resource_prefix={
                    k: dict(v) for k, v in r.get("resource_prefix", {}).items()
                },
            ),
            postprocessing=PostprocessingRewrites(
                suffix={k: list(v) for k, v in p.get("suffix", {}).items()}
            ),
        )

    @classmethod
    def from_path(cls, path: "str | Path") -> "PreprocessingRules":
        return cls.from_dict(json.loads(Path(path).read_text()))

    def str_is_blocked(self, s: str, *, context: str | None = None) -> bool:
        return self.blocklists.str_is_blocked(s, context=context)

    def remap_full(self, s: str, *, context: str | None = None) -> ReferenceTuple | None:
        return self.rewrites.remap_full(s, context=context)

    def remap_prefix(self, s: str, *, context: str | None = None) -> str:
        return self.rewrites.remap_prefix(s, context=context)


def _identity(x: str) -> str:
    return x


class PreprocessingConverter(Converter):
    """A converter with pre-processing rules (reference preprocessing.py:196-417)."""

    def __init__(
        self,
        *args: Any,
        rules: "PreprocessingRules | str | Path",
        preclean: "Callable[[str], str] | None" = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(*args, **kwargs)
        if isinstance(rules, (str, Path)):
            rules = PreprocessingRules.from_path(rules)
        self.rules = rules
        self._preclean = preclean if preclean is not None else _identity

    @classmethod
    def from_converter(
        cls, converter: Converter, rules: "PreprocessingRules | str | Path"
    ) -> "PreprocessingConverter":
        return cls(records=converter.records, rules=rules)

    def _post_process(self, rt: ReferenceTuple | None) -> ReferenceTuple | None:
        # reference preprocessing.py:230-241
        if rt is None:
            return None
        if rt.prefix in self.rules.postprocessing.suffix:
            for s in self.rules.postprocessing.suffix[rt.prefix]:
                if rt.identifier.endswith(s):
                    return ReferenceTuple(rt.prefix, rt.identifier[: len(rt.identifier) - len(s)])
        return rt

    def _pre_process(
        self, s: str, *, context: str | None, block_action: BlockAction
    ) -> "tuple[str, ReferenceTuple | None, bool]":
        """Shared preamble → (rewritten string, full-remap hit, blocked?)."""
        s = self._preclean(s)
        if r1 := self.rules.remap_full(s, context=context):
            return s, r1, False
        s = self.rules.remap_prefix(s, context=context)
        if self.rules.str_is_blocked(s, context=context):
            if block_action == "raise":
                raise BlocklistError
            return s, None, True
        return s, None, False

    def parse(  # type: ignore[override]
        self,
        s: str,
        *,
        strict: bool = False,
        context: str | None = None,
        block_action: BlockAction = "raise",
    ) -> ReferenceTuple | None:
        s, full_hit, blocked = self._pre_process(s, context=context, block_action=block_action)
        if full_hit is not None:
            return full_hit
        if blocked:
            return None
        rv = super().parse(s, strict=strict)
        return self._post_process(rv)

    def parse_curie(  # type: ignore[override]
        self,
        curie: str,
        *,
        strict: bool = False,
        context: str | None = None,
        block_action: BlockAction = "raise",
    ) -> ReferenceTuple | None:
        curie, full_hit, blocked = self._pre_process(
            curie, context=context, block_action=block_action
        )
        if full_hit is not None:
            return full_hit
        if blocked:
            return None
        rv = super().parse_curie(curie, strict=strict)
        return self._post_process(rv)

    def parse_uri(  # type: ignore[override]
        self,
        uri: str,
        *,
        strict: bool = False,
        context: str | None = None,
        block_action: BlockAction = "raise",
    ) -> ReferenceTuple | None:
        uri, full_hit, blocked = self._pre_process(
            uri, context=context, block_action=block_action
        )
        if full_hit is not None:
            return full_hit
        if blocked:
            return None
        rv = super().parse_uri(uri, strict=strict)
        return self._post_process(rv)
