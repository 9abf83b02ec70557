"""Streaming exact dedup with bounded state: dropDuplicatesWithinWatermark.

The batch twin is ops/dedup.exact_dedup (hash-groupBy, oracle-checked).
Streaming cannot keep every key ever seen — state must be bounded, so the
contract weakens to "no duplicates within the watermark horizon": a key's
state is dropped once the watermark passes it, exactly the trade a 10^12-doc
ingest pipeline makes (dedup-on-arrival within a window; global dedup stays
a batch job over the accumulated table).

Scale notes: state is keyed by the content hash (8 B + timestamp per key,
never payloads), partitioned by the shuffle on the key — the same uniform
64-bit distribution as batch exact dedup, so no skewed state stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    content_col: str = "text",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming frame -> ONE row per content hash within the watermark
    horizon (Spark keeps an arbitrary representative per key inside a
    microbatch — not necessarily the earliest-timestamped; observed
    empirically). Emits (content_hash, <original columns>)."""
    hashed = docs.withColumn("content_hash", F.xxhash64(F.col(content_col)))
    return hashed.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def near_dup_flags_stream(
    docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Streaming near-dup CANDIDATE flags against the persisted band
    index (ops/dedup.build_band_index): each arriving doc is minhash-
    banded with the exact batch recipe and stream-static-joined to the
    index on (band_id, band_hash) — the on-arrival "probably seen
    before" signal a recrawl ingest uses to route docs to the
    cheap path. Emits one row per flagged doc:
    (<id_col>, n_hits, sample_old_doc).

    Contract notes (deliberately candidates, not verified pairs): exact-
    Jaccard verification needs the old shingle sets joined per candidate
    — a second stateful join that belongs in the batch lane; the
    streaming flag is the LSH candidate signal (same trade as
    dedup_stream's watermark horizon). The static index side is re-read
    per micro-batch, so a newly-published index is picked up without
    restart.

    Scale: the banding is pure narrow expressions (explode + min-agg per
    doc happens INSIDE the streaming aggregate? no — per-row expression:
    shingles -> array of md5/xxhash mins computed via higher-order
    functions, no shuffle on the stream side before the join).
    """
    from pyspark.sql import functions as F

    from ..ops.dedup import shingles

    if bands * rows_per_band != num_hashes:
        raise ValueError(
            f"bands*rows_per_band ({bands}*{rows_per_band}) must equal "
            f"num_hashes ({num_hashes})"
        )
    sh = shingles(F.col(text_col), n)
    # per-row minhash signature via array_min over transformed shingles —
    # no explode/groupBy: stream rows stay independent (required for a
    # stream-static equi-join without an aggregate in front)
    def _min_expr(seed: int):
        # factory, NOT a default-arg closure: a 2-param lambda would be
        # taken as Spark's (element, index) form and bind seed to the
        # array index instead of the literal
        return F.array_min(F.transform(sh, lambda s: F.xxhash64(F.lit(seed), s)))

    mins = [_min_expr(seed).alias(f"h{seed}") for seed in range(num_hashes)]
    sig = docs.select(F.col(id_col), F.col(text_col), *mins)
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"h{b * rows_per_band + j}").cast("string")
                        for j in range(rows_per_band)
                    ],
                )
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        F.col(id_col),
        F.explode(F.array(*band_structs)).alias("band"),
    ).select(id_col, "band.band_id", "band.band_hash")

    index_bands = index.select(
        F.col("doc").alias("__old_doc"),
        F.posexplode("band_hashes").alias("band_id", "band_hash"),
    )
    return (
        banded.join(index_bands, ["band_id", "band_hash"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("__old_doc").alias("sample_old_doc"),
        )
    )


def rate_limited_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    capacity_tokens: int = 3,
    us_per_unit: int = 100_000,
) -> DataFrame:
    """Streaming twin of ops/ratelimit.token_bucket_admission: per-key
    event-time token bucket via applyInPandasWithState — the live
    politeness/quota gate (T2) with the SAME integer micro-token
    recurrence as the oracle-checked batch replay, so a replayed stream
    reproduces the batch decisions event-for-event (pinned by pytest).

    State per key = (token_units, last_ts_us): two BIGINTs regardless of
    history length. Events are processed in (ts, id) order WITHIN a
    micro-batch; cross-batch order is arrival order — the same
    at-ingest semantics as any online limiter (the batch op is the
    deterministic re-audit)."""
    from typing import Any, Iterable, Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..ops.ratelimit import TOKEN

    cap_units = capacity_tokens * TOKEN
    out_schema = "user_id long, event_id long, ts_us long, admitted boolean, token_units long"
    state_schema = "units long, last_us long"

    def admit(
        key: tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeouts configured
            state.remove()
            return
        units, last_us = state.get if state.exists else (cap_units, None)
        if last_us == -1:  # sentinel for "no prior event" across restarts
            last_us = None
        for batch in batches:
            batch = batch.sort_values(["ts_us", "event_id"])
            ids, tss, admitted, balances = [], [], [], []
            for eid, ts_us in zip(batch["event_id"], batch["ts_us"]):
                ts_us = int(ts_us)
                if last_us is not None:
                    units = min(cap_units, units + (ts_us - last_us) // us_per_unit)
                last_us = ts_us
                if units >= TOKEN:
                    units -= TOKEN
                    admitted.append(True)
                else:
                    admitted.append(False)
                ids.append(int(eid))
                tss.append(ts_us)
                balances.append(units)
            if ids:
                yield pd.DataFrame(
                    {
                        "user_id": pd.Series([user_id] * len(ids), dtype="int64"),
                        "event_id": pd.Series(ids, dtype="int64"),
                        "ts_us": pd.Series(tss, dtype="int64"),
                        "admitted": pd.Series(admitted, dtype="bool"),
                        "token_units": pd.Series(balances, dtype="int64"),
                    }
                )
        state.update((int(units), int(last_us) if last_us is not None else -1))

    narrow = events.select(
        F.col(key_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
    )
    return narrow.groupBy("user_id").applyInPandasWithState(
        admit,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
