"""Shared-relation reuse: the zero-cache replacement for ``persist()``.

A relation consumed by two (or more) branches of ONE returned plan does
not need a cache to compute once: if every consumer references the SAME
plan object — ``rel.alias(name)`` references, never per-side pre-renamed
``select()`` copies — the branches' subplans below their exchanges stay
canonically identical and Catalyst's ReuseExchange unifies them, so the
expensive map work (tokenize, explode, signature aggregation, ...)
executes once and every other side reads the same shuffle output.

The hazard this module exists to fence off (learned the expensive way in
``operators/dedup.py``, round 8): pre-renaming each side with a
``select()`` pushes the differing projections below the exchanges and
defeats the reuse — the historical workaround was a ``MEMORY_AND_DISK``
persist that was never released, i.e. one leaked session-lived
corpus-sized cache per call, which also memoized warm benchmark numbers
(CacheManager matches canonicalized plans across calls).  Route every
multi-consumer alias through these helpers instead of hand-rolling the
idiom; a grep-guard test (``tests/test_property.py``) rejects raw
multi-alias self-joins outside this module.

Two rules keep the reuse intact at call sites:

* rename/project ABOVE the join (``F.col("__ra.x").alias(...)`` on the
  joined result), never on the sides;
* make every branch reference the same column set where Catalyst could
  otherwise prune an aggregate expression out of one branch's exchange
  (e.g. aggregate ``F.count("c")`` instead of ``F.count(F.lit(1))`` when
  a sibling branch consumes ``c``).

Assert the contract with :func:`assert_reused_exchange` — reuse is only
visible in the FINAL adaptive plan, after an action.
"""

from __future__ import annotations

from typing import Callable, Union

from pyspark.sql import Column, DataFrame

__all__ = ["aliased_refs", "self_join_reusing", "assert_reused_exchange",
           "final_plan"]


def aliased_refs(rel: DataFrame, *names: str) -> tuple[DataFrame, ...]:
    """``len(names)`` alias references to the ONE plan object ``rel``.

    Every reference shares ``rel``'s canonical form, so joins between
    them (or against a third relation) deduplicate ``rel``'s exchanges
    via ReuseExchange instead of recomputing — or leaking a persist."""
    return tuple(rel.alias(n) for n in names)


def self_join_reusing(
    rel: DataFrame,
    cond: Union[Column, Callable[[DataFrame, DataFrame], Column]],
    a: str = "__ra",
    b: str = "__rb",
    how: str = "inner",
) -> DataFrame:
    """Self-join ``rel`` with itself under aliases ``a``/``b`` such that
    ReuseExchange computes the shared side once (zero persisted
    intermediates).

    ``cond`` is either a ready condition Column referencing the aliases
    by name (``F.col(f"{a}.key") == F.col(f"{b}.key")``) or a callable
    ``(left, right) -> Column`` over the two aliased references.  Select
    and rename only on the RETURNED joined frame — projecting the sides
    first is exactly the anti-pattern this helper retires."""
    la, lb = aliased_refs(rel, a, b)
    on = cond(la, lb) if callable(cond) else cond
    return la.join(lb, on, how)


def final_plan(df: DataFrame) -> str:
    """The executed physical plan, truncated to the FINAL adaptive form
    (AQE appends the initial plan after a marker — irrelevant here)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    cut = plan.find("== Initial Plan ==")
    return plan[:cut] if cut != -1 else plan


def assert_reused_exchange(df: DataFrame, forbid_cache: bool = True) -> None:
    """Execute ``df`` and assert its final adaptive plan contains a
    ReusedExchange (the shared side ran once) and — by default — no
    InMemoryTableScan (nothing fell back to a cache).  Test helper; also
    usable as a one-off debugging probe at new call sites."""
    df.collect()  # AQE reuse only materializes in the final plan
    plan = final_plan(df)
    assert "ReusedExchange" in plan, (
        "expected ReuseExchange to unify the shared relation's sides; "
        "check for pre-renamed select() sides or branch-divergent column "
        f"pruning.  Final plan:\n{plan}"
    )
    if forbid_cache:
        assert "InMemoryTableScan" not in plan, (
            f"plan reads a persisted cache:\n{plan}"
        )
