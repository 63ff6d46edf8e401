"""Declared analytical query surface.

``REGISTRY`` is the union of every query module's specs; the driver-facing
``__spark_entry__.queries()`` / ``oracle_sql()`` are views over it.
"""

from __future__ import annotations

from .curation import C as _curation
from .llm import L as _llm
from .relational import R as _relational
from .spec import QuerySpec, Registry
from .temporal import T as _temporal

REGISTRY = Registry()
REGISTRY.merge(_relational)
REGISTRY.merge(_llm)
REGISTRY.merge(_temporal)
REGISTRY.merge(_curation)

__all__ = ["REGISTRY", "QuerySpec", "Registry"]
