"""Session-scoped bookkeeping for persisted relations.

Several kernels ``persist()`` bounded intermediate relations whose
final consumer is the (lazy) DataFrame they return — the function
cannot unpersist before returning, so across a long multi-query
session (the 132-query driver gate, bench reps) cached blocks would
accumulate in executor storage (r3 ADVICE finding).  Sites register
those relations here; the suite wrapper drains the registry when the
NEXT query is constructed — by then the previous query's action has
run, so eviction never costs a recompute.

``unpersist`` only drops cache entries (lineage is intact), so a stale
drain is always correctness-safe; it can at worst cost a recompute for
a caller that interleaves query construction, which no harness does.

For non-suite long sessions (where only the suite wrapper ever
drains), the registry is CAPPED (r4 ADVICE): past ``_MAX_REGISTERED``
entries the oldest relation is unpersisted and dropped on the spot —
bounded DataFrame references and bounded executor storage even if
``cleanup_persisted`` is never called.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)

_PERSISTED: list[DataFrame] = []

# generous bound: no single query registers more than a handful of
# relations, so eviction at the cap only ever touches relations whose
# consuming action is long finished
_MAX_REGISTERED = 64


def register_persisted(df: DataFrame) -> DataFrame:
    """Record ``df`` (already ``.persist()``-ed) for deferred cleanup."""
    _PERSISTED.append(df)
    while len(_PERSISTED) > _MAX_REGISTERED:
        old = _PERSISTED.pop(0)
        # lineage keeps eviction correct, but if the evicted relation's
        # consuming action has not run yet its subtree silently
        # recomputes — leave a trail so a recompute storm in a long
        # non-suite session is diagnosable (r5 ADVICE)
        _log.debug(
            "persist registry cap (%d) hit: evicting oldest relation %s",
            _MAX_REGISTERED,
            old,
        )
        try:
            old.unpersist()
        except Exception:  # pragma: no cover - session already stopped
            pass
    return df


def cleanup_persisted() -> int:
    """Unpersist every registered relation; returns how many."""
    n = len(_PERSISTED)
    for df in _PERSISTED:
        try:
            df.unpersist()
        except Exception:  # pragma: no cover - session already stopped
            pass
    _PERSISTED.clear()
    return n
