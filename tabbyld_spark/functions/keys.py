"""Surrogate join-key expressions for the feature stack.

Every hot join/window/groupBy in the STI pipeline clusters on surrogate
hashes of the identity strings (operators/features.py scale notes).  The
default is one ``xxhash64`` long — globally unique w.h.p. at bench scale,
and every identity-bearing operation additionally carries the original
strings so a collision can only mis-attribute one narrow feature value.

At 10^12-row scale the 64-bit birthday bound stops being comfortable
(~2^40 mentions → ~2^-17 collision odds per pair class, millions of expected
collisions across the corpus), so ``SPARK_GRAFT_KEYBITS=128`` widens every
surrogate to a struct of two INDEPENDENT 64-bit halves (the second half
seeds ``xxhash64`` with a distinct literal).  A struct is still ONE key
column, so plan shape — join arity, window partitioning, exchange count —
is identical to the 64-bit run; only the shuffle key payload widens by 8
bytes.  Output is bit-identical either way (keys never appear in results);
tests/test_keys.py asserts both that and fixture-wide key uniqueness.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

# literal seed for the second, independent 64-bit half of a 128-bit key
_HALF2_SEED = "tabbyld-key-half2"


def keybits() -> int:
    """Surrogate key width in bits (env ``SPARK_GRAFT_KEYBITS``, 64 or 128);
    read per call so tests can flip it without module reloads."""
    return int(os.environ.get("SPARK_GRAFT_KEYBITS", "64"))


def skey(*cols: Column | str) -> Column:
    """Surrogate key over ``cols``: one 64-bit long by default, a two-half
    struct under ``SPARK_GRAFT_KEYBITS=128`` — one column either way."""
    h1 = F.xxhash64(*cols)
    if keybits() <= 64:
        return h1
    return F.struct(
        h1.alias("h1"), F.xxhash64(F.lit(_HALF2_SEED), *cols).alias("h2")
    )


def mention_skey() -> Column:
    """Mention-grain key: (table_id, col_role, mention)."""
    return skey("table_id", "col_role", "mention")


def entity_skey(col: Column | str = "entity") -> Column:
    return skey(col)
