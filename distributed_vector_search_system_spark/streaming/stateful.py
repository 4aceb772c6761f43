"""Custom stateful streaming operator: per-key running fold.

The reference's state machine replays mutations in order into per-shard
state (ApplyCommittedEntries, /root/reference/src/raft/raft_state.cc:416-459).
``running_user_fold`` is the generalized streaming form: arbitrary per-key
state maintained across micro-batches with ``applyInPandasWithState`` —
Arrow-batched (one pandas frame per key per batch, not per-row Python),
state store checkpointed by Structured Streaming.

Semantics: for each user, track (n_events, last event by (ts, event_id))
— identical to the batch ``rel_replay_fold`` query, which is the
equivalence oracle in tests/test_streaming.py.

Scale: state is partitioned by the grouping key across executors; the
state store holds one small fixed-width row per key (not per event), so
100 TB of events with 10^9 users is ~100 GB of state spread over the
cluster — bounded and spillable.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, last_event_id bigint, "
    "last_type string, last_value double"
)
STATE_SCHEMA = (
    "n bigint, last_ts double, last_event_id bigint, "
    "last_type string, last_value double"
)


def _fold(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, last_ts, last_id, last_type, last_value = state.get
    else:
        n, last_ts, last_id, last_type, last_value = 0, float("-inf"), -1, None, None

    for pdf in pdfs:
        if pdf.empty:
            continue
        n += len(pdf)
        # epoch seconds keep the state row fixed-width (timestamps don't
        # round-trip through the state store as cleanly as doubles)
        ts = pdf["ts"].astype("int64") / 1e9
        order = sorted(range(len(pdf)), key=lambda i: (ts.iloc[i], pdf["event_id"].iloc[i]))
        top = order[-1]
        cand = (float(ts.iloc[top]), int(pdf["event_id"].iloc[top]))
        if cand > (last_ts, last_id):
            last_ts, last_id = cand
            last_type = str(pdf["event_type"].iloc[top])
            last_value = float(pdf["value"].iloc[top])

    state.update((n, last_ts, last_id, last_type, last_value))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "last_event_id": [last_id],
            "last_type": [last_type],
            "last_value": [last_value],
        }
    )


def running_user_fold(events: DataFrame) -> DataFrame:
    """Apply the stateful fold; works on a streaming events DataFrame
    (columns: event_id, ts, user_id, event_type, value)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas variant (Spark ≥4.0 arbitrary-state API)
#
# Same fold, expressed with the newer StatefulProcessor interface: typed
# ValueState handles instead of a single opaque state tuple, explicit
# init/close lifecycle, and (unused here) timer support.  The RocksDB-
# backed state store behind transformWithState is the 100 TB shape —
# state lives off-heap per executor and survives micro-batch failover.
#
# Environment gate: Spark's TransformWithStateInPySpark runs a separate
# Python driver worker that talks to the JVM state server over protobuf;
# `google.protobuf` is not installed in this container, so the operator
# is constructed lazily and `tws_available()` reports whether it can
# actually run here (tests skip, not fake, when it cannot — same policy
# as the PIL-gated image decode in operators/multimodal.py).


def tws_available() -> bool:
    """True iff transformWithStateInPandas can run in this environment
    (requires the google.protobuf runtime for the state-server RPC)."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _tws_classes():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    return StatefulProcessor, StatefulProcessorHandle


def running_user_fold_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of :func:`running_user_fold` —
    identical output contract (OUTPUT_SCHEMA, update mode), verified
    equal in tests/test_streaming.py (skipped where protobuf is absent)."""
    StatefulProcessor, _ = _tws_classes()

    class _FoldProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState("fold", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, last_ts, last_id, last_type, last_value = self._state.get()
            else:
                n, last_ts, last_id, last_type, last_value = (
                    0, float("-inf"), -1, None, None,
                )
            for pdf in rows:
                if pdf.empty:
                    continue
                n += len(pdf)
                ts = pdf["ts"].astype("int64") / 1e9
                order = sorted(
                    range(len(pdf)),
                    key=lambda i: (ts.iloc[i], pdf["event_id"].iloc[i]),
                )
                top = order[-1]
                cand = (float(ts.iloc[top]), int(pdf["event_id"].iloc[top]))
                if cand > (last_ts, last_id):
                    last_ts, last_id = cand
                    last_type = str(pdf["event_type"].iloc[top])
                    last_value = float(pdf["value"].iloc[top])
            self._state.update((n, last_ts, last_id, last_type, last_value))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "last_event_id": [last_id],
                    "last_type": [last_type],
                    "last_value": [last_value],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_FoldProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
