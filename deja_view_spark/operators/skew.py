"""Explicit skew-handling join — the generic form of the hot-bucket
salting inside the LSH self-join (operators/selfjoin.py:128-215) for
the everyday case: a fact table whose join key is heavily skewed
(a hot repo, a viral document, a default value) joined to a dimension
too large to broadcast.

A plain shuffle join sends every row of a hot key to ONE reducer: the
job's wall clock becomes that single task. Salting splits each fact key
into ``n_salt`` sub-keys and replicates the dimension row to all of
them, so the hot key's rows spread over ``n_salt`` tasks at the cost of
writing the (small) dimension side ``n_salt`` times:

    fact:  (k, payload)        -> (k, salt = h(row) % n, payload)
    dim:   (k, attrs)          -> (k, salt = 0..n-1, attrs)   [explode]
    join on (k, salt)          == join on k, load spread n ways

AQE's skew-join splitting (spark.sql.adaptive.skewJoin.*) does this
adaptively at runtime for sort-merge joins; this operator is the
explicit, planner-independent form the north rule asks for ("explicit
salting of hot repos") — deterministic, works for any join strategy,
and composable with bucketed layouts.

The salt is a hash of the fact row's OTHER columns (not rand(): a
partition-layout-dependent salt would make the physical row placement
— and with it spill/ordering behavior — nondeterministic across
retries). Join RESULTS are identical to the unsalted join either way;
determinism here is about reproducible execution shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``on`` with an explicit ``n_salt``-way
    salt on the fact side. Supported ``how``: inner / left (the fact
    side is the preserved side; right/full would need the salt on the
    other side).

    Result equality: exactly the rows of ``fact.join(dim, on, how)``,
    any physical order."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    reserved = {"_salt"}
    if reserved & (set(fact.columns) | set(dim.columns)):
        raise ValueError("salted_join reserved column collision: _salt")

    non_key = [c for c in fact.columns if c not in keys]
    # hash of the full row spreads even a single hot key with duplicate
    # payloads; falls back to the key columns for key-only facts
    salt_src = non_key if non_key else keys
    f = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_src), F.lit(n_salt)).cast("int")
    )
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return f.join(d, [*keys, "_salt"], how).drop("_salt")
