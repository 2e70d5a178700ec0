"""Lazy bucket-cap drop accounting shared by every banded-LSH path.

The no-silent-caps rule says a capped bucket (recall loss) must be
logged, never swallowed. Through round 4 the drop count was computed
with an eager ``.count()`` action at plan-construction time — a second
full pass over the banded data on every capped call, doubling the
capping stage's cost at 100 TB. This module makes the count ride the
caller's own first action instead, via ``DataFrame.observe``
(a ``CollectMetrics`` node placed between the ranking window and the
cap filter, so it sees the pre-filter row set): zero extra Spark jobs,
same logged numbers.

Because observed metrics only materialize when the caller runs an
action, the log line is emitted from a small daemon thread parked on
``Observation.get`` (which blocks JVM-side until the first action on
the observed plan completes). Production callers get the warning
automatically; deterministic consumers (tests, the crawl loop's
metrics table) call :func:`flush_cap_drop_logs` after their action to
join any finished logger threads before asserting.
"""

from __future__ import annotations

import itertools
import logging
import threading
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

_SEQ = itertools.count()
_LOCK = threading.Lock()
_PENDING: list[threading.Thread] = []


def observe_cap_drops(
    ranked: DataFrame,
    rank_col: str,
    bucket_cap: int,
    op_name: str,
    logger: logging.Logger,
    detail: str,
) -> DataFrame:
    """Attach a lazy dropped-membership counter to ``ranked`` (which
    must already carry a per-bucket ``rank_col``) and return the
    observed frame. The caller applies the ``rank_col <= bucket_cap``
    filter on the RETURNED frame — Catalyst keeps that filter above the
    CollectMetrics node because ``rank_col`` is produced by the window
    below it, so the metric always sees the uncapped row set.

    When the caller's first action completes, a daemon thread logs
    ``logger.warning`` with the drop count iff it is nonzero, with
    ``detail`` appended (the operator-specific recall-loss guidance).
    """
    obs = Observation(f"{op_name}_cap_drops_{next(_SEQ)}")
    observed = ranked.observe(
        obs,
        F.sum(
            F.when(F.col(rank_col) > bucket_cap, F.lit(1)).otherwise(F.lit(0))
        ).alias("dropped"),
    )
    t = threading.Thread(
        target=_wait_and_log,
        args=(obs, bucket_cap, op_name, logger, detail),
        daemon=True,
        name=f"cap-drops-{op_name}",
    )
    t.start()
    with _LOCK:
        _PENDING.append(t)
    return observed


def _wait_and_log(
    obs: Observation,
    bucket_cap: int,
    op_name: str,
    logger: logging.Logger,
    detail: str,
) -> None:
    try:
        dropped = obs.get.get("dropped")
    except Exception:  # session torn down before the action ran
        return
    if dropped:
        logger.warning(
            "%s: bucket_cap=%d dropped %d bucket memberships — %s",
            op_name,
            bucket_cap,
            dropped,
            detail,
        )


def flush_cap_drop_logs(timeout: float = 60.0) -> int:
    """Join logger threads whose observed action has completed, so
    their warnings are visible to the caller (tests assert on caplog
    after this). Threads still parked on a never-executed plan are left
    pending. Returns the number of threads joined."""
    with _LOCK:
        pending = _PENDING[:]
        del _PENDING[:]
    deadline = time.monotonic() + timeout
    joined = 0
    for t in pending:
        t.join(max(0.0, deadline - time.monotonic()))
        if t.is_alive():
            with _LOCK:
                _PENDING.append(t)
        else:
            joined += 1
    return joined
