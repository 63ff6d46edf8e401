"""Skew-mitigation operators.

AQE's skew-join splitting (on in session.py) handles most skew at runtime;
explicit salting remains the tool when one join key dominates so heavily
that even split partitions bottleneck, or on engines/paths where AQE can't
rewrite (streaming joins). The salted join is semantics-preserving — its
registered query's oracle is the PLAIN join, which is the point: same
result, different shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str | Column,
    small_key: str | Column,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot side salted: ``big`` rows get a uniform salt
    in [0, salts), ``small`` rows are replicated once per salt value, and
    the join key becomes (key, salt) — a key that hashed to ONE reducer
    now spreads over ``salts`` of them.

    Cost model: small side inflates x salts (keep it the genuinely small
    side); big side shuffles once either way. Use when a single key's row
    count >> the per-partition budget; otherwise let AQE handle it.
    ``F.rand(seed)`` salts are row-nondeterministic under retries, which is
    safe here because the salt never reaches the result — any salt
    assignment yields the same join output.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full outer would null-extend every unmatched small-side
        # REPLICA (one per salt) — not semantics-preserving
        raise ValueError(
            f"salted_join supports inner/left joins, got how={how!r}"
        )
    bk = F.col(big_key) if isinstance(big_key, str) else big_key
    sk = F.col(small_key) if isinstance(small_key, str) else small_key
    big_s = big.withColumn("_salt", F.floor(F.rand(seed=42) * salts).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    joined = big_s.join(
        small_s,
        (bk == sk) & (big_s["_salt"] == small_s["_salt"]),
        how,
    )
    return joined.drop("_salt")
