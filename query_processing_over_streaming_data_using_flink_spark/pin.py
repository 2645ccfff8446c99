"""Result pinning with an explain-mode escape hatch.

Several registered queries end with an eager ``localCheckpoint`` on
their bounded final table: it materializes the result executor-side
(no driver collect) and cuts the lineage so persisted intermediates
can be unpersisted before return — a long-lived session running the
full sweep leaks no cached blocks.

The cost of that discipline showed up in PLANS.md (round-11 verdict):
``df.explain`` on a checkpointed frame prints a single
``Scan ExistingRDD`` — the artifact can't show the joins the query's
own prose describes. ``pin_result`` is the same checkpoint with a
process-local switch: inside ``unpinned_for_explain()`` it becomes a
no-op, so ``scripts/dump_plans.py`` sees the real subtree while every
production/benchmark call path keeps the eager materialization.

FINAL-RESULT checkpoints route through here, and — since round 13 —
so do SHARED-INPUT pins: ``connected_components_clusters`` pins its
edges/nodes inputs via ``pin_result`` (operators/dedup.py) because a
merely *persisted* input's full lineage still renders into every
consumer's plan string, and the un-truncated LSH-pair subtree OOMed
the driver inside ``QueryExecution.explainString`` when the final
result was checkpointed eagerly. Pinning the shared inputs severs
that lineage in production while ``unpinned_for_explain()`` still
recovers the real subtree for the PLANS.md artifact.

Iteration-internal checkpoints (power iteration, BPE merge rounds,
connected-components label propagation, MMR selection) stay direct
``localCheckpoint`` calls: skipping those would make the explain plan
itself exponential in the round count, which is the opposite of a
readable artifact.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_EXPLAIN_MODE = False


def pin_result(df: DataFrame) -> DataFrame:
    """Eagerly materialize a bounded final result (localCheckpoint) —
    or, inside ``unpinned_for_explain()``, return ``df`` unchanged so
    its physical plan stays explainable."""
    if _EXPLAIN_MODE:
        return df
    return df.localCheckpoint(eager=True)


@contextmanager
def unpinned_for_explain():
    """Context manager for plan-dump tooling: while active,
    ``pin_result`` is a no-op. Do NOT collect large results inside —
    callers unpersist their intermediates right after pinning, so an
    unpinned frame re-evaluates its full lineage uncached."""
    global _EXPLAIN_MODE
    prev = _EXPLAIN_MODE
    _EXPLAIN_MODE = True
    try:
        yield
    finally:
        _EXPLAIN_MODE = prev
