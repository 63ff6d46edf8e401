"""Vector math over ``array<float/double>`` columns, JVM-side.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic inside codegen — no
Arrow round-trip per row. For 64-dim embeddings this is fast enough that the
Pandas-UDF path (operators.similarity has one for wide batches) only wins on
very high dimensions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return col if isinstance(col, Column) else F.col(col)


def dot(a, b) -> Column:
    a, b = _c(a), _c(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    a = _c(a)
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
