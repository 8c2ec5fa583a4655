"""Top-level alias so ``from curies_spark import vocabulary`` and
``import curies_spark.vocabulary`` mirror the reference's
``curies.vocabulary`` import paths (reference vocabulary.py)."""

from .core.vocabulary import *  # noqa: F401,F403
from .core.vocabulary import (  # noqa: F401  (dunder-safe explicit names)
    SemanticMappingScope,
    SynonymScope,
    SynonymScopeOIO,
)
