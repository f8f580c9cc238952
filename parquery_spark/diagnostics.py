"""Driver-side measurement probes shared by the bench/scale tooling.

One implementation, two consumers (``bench.py`` and
``scripts/scale_smoke.py``) — the published artifacts must measure the
same way or their numbers silently diverge.
"""

from __future__ import annotations

import json


def shuffle_written(spark) -> int | None:
    """Total shuffle-write bytes so far (completed + active stages) via
    the status REST API; ``None`` when the UI is off or unreachable.

    Caveat: the API walks UI-RETAINED stages only — long sessions should
    raise ``spark.ui.retainedStages`` (the bench/smoke drivers set 20000)
    or deltas computed from two probes undercount.  Callers computing a
    delta must treat a NEGATIVE delta (stage eviction between probes) as
    "unknown", never publish it."""
    try:
        import urllib.request

        ui = spark.sparkContext.uiWebUrl
        if not ui:
            return None
        apps = json.load(
            urllib.request.urlopen(ui + "/api/v1/applications", timeout=5)
        )
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{apps[0]['id']}/stages",
                timeout=10,
            )
        )
        return sum(st.get("shuffleWriteBytes", 0) for st in stages)
    except Exception:
        return None


def shuffle_delta(before: int | None, after: int | None) -> int | None:
    """Guarded delta between two :func:`shuffle_written` probes: ``None``
    when either probe failed or stages were evicted in between (negative
    raw delta)."""
    if before is None or after is None:
        return None
    d = after - before
    return d if d >= 0 else None
