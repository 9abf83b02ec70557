"""Skew mitigation for hot-key equi-joins: explicit key salting.

AQE's skewJoin (enabled in session.py) splits oversized sort-merge
partitions at runtime, but it only acts AFTER a skewed shuffle has been
written, and only on sort-merge joins. When a join key is known-skewed
upfront (the web reality: a handful of domains own most documents),
salting fixes the shuffle itself: the fact side scatters each hot key
across `n_salt` sub-keys, the dimension side replicates each row
`n_salt` times, and the join runs on (key, salt) with no partition ever
receiving more than ~1/n_salt of a hot key's rows.

Cost model: dimension side inflates n_salt x — use for fact-x-dim joins
where the dim is small-ish but too big (or too row-exploded) to
broadcast outright. For genuinely tiny dims, broadcast instead (see
spark/dims.py); for fact-x-fact skew, AQE remains the right tool.

Which salt a fact row draws is load-balancing only — correctness never
depends on it, since every dim row exists under every salt value.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `facts` (skewed on `on`) with `dim`, salted n_salt ways.

    Output columns = the plain `facts.join(dim, on, how)` columns; the
    salt never leaks. Supported `how`: inner / left / left_outer (the
    fact-preserving shapes salting is for; right/full would need the dim
    side de-replicated and are not what a skewed-fact join wants).
    """
    if n_salt < 2:
        raise ValueError("n_salt must be >= 2 (1 is just a plain join)")
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"unsupported how={how!r}: use inner/left/left_outer")
    on = list(on)

    # Any per-row value works — which salt a row draws only balances load.
    # xxhash64 over the key columns plus a partition-local counter spreads
    # even single-key inputs; all-identical rows sharing a salt would only
    # mean that key keeps 1/n of its skew, never a wrong result.
    salt_src = F.xxhash64(*on, F.monotonically_increasing_id())
    salted_facts = facts.withColumn(SALT_COL, F.pmod(salt_src, F.lit(n_salt)))

    # sequence of LONGs so the exploded salt matches pmod's type without a
    # cast around the generator (generators can't nest in expressions)
    salts = F.explode(
        F.sequence(F.lit(0).cast("long"), F.lit(n_salt - 1).cast("long"))
    )
    salted_dim = dim.withColumn(SALT_COL, salts)

    return salted_facts.join(salted_dim, on + [SALT_COL], how).drop(SALT_COL)
