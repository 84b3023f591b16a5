"""Custom stateful streaming operators via ``applyInPandasWithState``
(Arrow-batched per-key state — Spark's public API for operators its
built-in streaming aggregations can't express).

Nothing like this exists in the reference (row-at-a-time batch ETL);
this is the training-data-pipeline surface: deduplicating an unbounded
document/event stream requires remembering which keys have been seen
across micro-batches, which is exactly per-key state.

Scale notes: state lives in the state store partitioned by key (one
shuffle on the key columns per micro-batch); memory per key is a
single boolean here, so 10^9 seen keys ≈ tens of GB across the
cluster — bound it with ``ttl_minutes`` (event streams rarely need
exact-forever dedup; content streams can run unbounded and rely on
state-store RocksDB spilling).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup_first_seen(
    df: DataFrame,
    key_cols: Sequence[str],
    ttl_minutes: Optional[int] = None,
) -> DataFrame:
    """Emit only the FIRST row ever seen for each key tuple, across all
    micro-batches — streaming exact dedup.

    Within one micro-batch, "first" is the first row Spark delivers for
    the key (upstream order); across batches, state remembers the key
    and suppresses every later occurrence. With ``ttl_minutes`` the
    key's state expires after that much processing time without
    arrivals, after which the key is treated as new again (bounded
    state; the standard at-scale trade).

    Works on a streaming DataFrame in ``update`` output mode; on a
    batch DataFrame Spark rejects stateful APIs — use
    ``operators.dedup.exact_dedup`` there.
    """
    keys = list(key_cols)
    out_schema = df.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists
        if not already:
            state.update((True,))
            if ttl_minutes is not None:
                state.setTimeoutDuration(ttl_minutes * 60 * 1000)
            for pdf in pdfs:
                if len(pdf):
                    yield pdf.iloc[:1]
                    break
        else:
            if ttl_minutes is not None:
                state.setTimeoutDuration(ttl_minutes * 60 * 1000)
            for _ in pdfs:  # drain (protocol requires consuming the iterator)
                pass

    return df.groupBy(*keys).applyInPandasWithState(
        dedup, out_schema, state_schema, "update", timeout
    )


def streaming_domain_quota(
    df: DataFrame,
    group_cols: Sequence[str],
    cap: int,
    ttl_minutes: Optional[int] = None,
) -> DataFrame:
    """Emit at most ``cap`` rows per group tuple across the stream's
    lifetime — the streaming analogue of the batch per-domain
    frequency cap (operators/rangejoin.frequency_cap), with the draw
    the only semantic difference: batch selects by the salted-hash
    order over the WHOLE corpus (needs global knowledge), a stream can
    only admit in ARRIVAL order — the standard ingest-quota trade.
    NOT interchangeable: on the same rows the two policies generally
    keep DIFFERENT subsets (both capped, both correct) —
    tests/test_multimodal_streaming.py::test_domaincap_batch_vs_streaming_divergence
    pins a frozen corpus where they disagree. Replaying a stream's
    input through frequency_cap will NOT reproduce what the stream
    admitted; choose by semantics, not by engine.

    State per group is a single counter (8 bytes): 10^9 domains ≈ a
    few GB across the state store; ``ttl_minutes`` expires idle
    groups' quotas for the bounded-state variant (a domain going quiet
    for the TTL earns a fresh quota — rate limiting rather than a
    lifetime cap). Within a micro-batch, "first" follows Spark's
    delivery order; the admitted count never exceeds ``cap`` even
    when one batch delivers the whole group.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    keys = list(group_cols)
    out_schema = df.schema
    state_schema = T.StructType([T.StructField("n", T.LongType())])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def quota(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n = state.get[0] if state.exists else 0
        emitted = 0
        for pdf in pdfs:
            room = cap - n - emitted
            if room > 0 and len(pdf):
                take = pdf.iloc[:room]
                emitted += len(take)
                yield take
            # keep draining: the protocol requires consuming the iterator
        state.update((n + emitted,))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    return df.groupBy(*keys).applyInPandasWithState(
        quota, out_schema, state_schema, "update", timeout
    )
