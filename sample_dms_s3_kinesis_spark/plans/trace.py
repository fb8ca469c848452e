"""Debug-only capture of eagerly-materialized frames' plans.

Operators that eagerly materialize intermediates (localCheckpoint of
LSH banded frames / signatures, per-Lloyd-round PQ means, BPE driver
gates) leave only a ``Scan ExistingRDD`` in the final query plan, so
the hot-path subtree they actually execute is invisible to
``explain()`` on the query's result.  When $SPARK_GRAFT_PLAN_TRACE=1,
those operators call :func:`record` with the frame *before* it is
materialized; ``tools/explain_dump.py`` drains the buffer after
building each query and appends the captured plans to the query's plan
file, making the eager stages auditable.

Off by default: ``record`` is a no-op unless the env var is set, so
production paths pay one ``os.environ`` dict lookup and nothing else.
"""

from __future__ import annotations

import os

_TRACES: list[tuple[str, str]] = []


def enabled() -> bool:
    return os.environ.get("SPARK_GRAFT_PLAN_TRACE", "") == "1"


def record(label: str, df) -> None:
    """Capture ``df``'s formatted plan under ``label`` (no-op unless
    $SPARK_GRAFT_PLAN_TRACE=1).  Called with the frame BEFORE the
    eager materialization so the captured plan shows the real work."""
    if not enabled():
        return
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    _TRACES.append((label, plan))


def drain() -> list[tuple[str, str]]:
    """Return and clear every plan recorded since the last drain."""
    out = list(_TRACES)
    _TRACES.clear()
    return out
