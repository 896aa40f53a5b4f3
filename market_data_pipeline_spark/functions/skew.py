"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting handles most cases at runtime (session.py turns it
on); salting is the explicit fallback for the shapes AQE can't fix — e.g., a
huge×medium join where one key holds a double-digit percentage of rows and
the medium side is too big to broadcast.

Technique: replicate the small side across ``n_salts`` copies; spread the big
side's hot rows across salts with a DETERMINISTIC salt derived from a
secondary column (never ``rand()`` — retries must produce identical
assignments). Each (key, salt) pair then joins a bounded slice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(col: Column, n_salts: int) -> Column:
    """Stable salt in [0, n_salts) from any column — same row, same salt,
    across retries and runs."""
    return F.pmod(F.xxhash64(col), F.lit(n_salts))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the big side salted by ``salt_from``.

    The small side is exploded ``n_salts``× (bounded, it's the small side);
    the big side's rows for any hot key spread across ``n_salts`` shuffle
    partitions instead of one. Result is identical to ``big.join(small, key,
    how)`` for inner/left joins.
    """
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    small_rep = small.withColumn("__salt", F.explode(salts))
    big_s = big.withColumn("__salt", deterministic_salt(F.col(salt_from), n_salts))
    joined = big_s.join(small_rep, [key, "__salt"], how)
    return joined.drop("__salt")
