"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's stream path has no stateful operators at all
(SURVEY §2.9 — foreachBatch writes only). ``F.session_window`` covers
aggregate-per-session; this module adds the *continuous* variant: an
arbitrary per-key state machine carried across micro-batches, here an
inactivity-gap sessionizer that EMITS each session exactly once, when
it closes (a later event arrives beyond the gap, or the state times
out). At scale the state store is per-key and checkpointed with the
query — restart-safe like every Structured Streaming stateful op.
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_sessionize(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    watermark_delay: str = "0 seconds",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Emit one row per CLOSED session: keys + session_start /
    session_end / n_events.

    State per key: the currently-open session (start, end, count).
    A batch's events extend or close it; closed sessions are emitted in
    that batch's output. With ``idle_timeout_ms`` set, a key with no
    traffic closes its open session via processing-time timeout (else
    the final session stays open until more data or query end).
    """
    keys = list(keys)
    # key columns keep their ACTUAL input types (an int64 entity id
    # declared as string would fail Arrow serialization on first batch)
    out_ddl = (
        ", ".join(f"{k} {stream.schema[k].dataType.simpleString()}" for k in keys)
        + ", session_start timestamp, session_end timestamp, n_events long"
    )
    state_ddl = "start timestamp, end timestamp, n long"
    gap = gap_seconds

    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                closed.append((*key, s, e, n))
                state.remove()
            yield pd.DataFrame(
                closed, columns=[*keys, "session_start", "session_end", "n_events"]
            )
            return

        events = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        cur = list(state.get) if state.exists else None
        for t in events[ts_col]:
            t = pd.Timestamp(t)
            if cur is None:
                cur = [t, t, 1]
            elif (t - cur[1]).total_seconds() > gap:
                closed.append((*key, cur[0], cur[1], cur[2]))
                cur = [t, t, 1]
            else:
                # late (cross-batch out-of-order) events may precede the
                # open session's bounds — extend, never shrink
                cur[0] = min(cur[0], t)
                cur[1] = max(cur[1], t)
                cur[2] += 1
        if cur is not None:
            state.update((cur[0], cur[1], int(cur[2])))
            if idle_timeout_ms:
                state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            closed, columns=[*keys, "session_start", "session_end", "n_events"]
        )

    wm = stream.withWatermark(ts_col, watermark_delay) if watermark_delay else stream
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return wm.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_ddl,
        stateStructType=state_ddl,
        outputMode="append",
        timeoutConf=timeout,
    )
