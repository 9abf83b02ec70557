"""Event-time token-bucket rate limiting per key — the politeness /
quota-admission primitive (reference behavior: per-domain crawl pacing,
src/crawler.ts rate limits; here as a deterministic EVENT-TIME replay so
the decision for a historical log is reproducible and oracle-checkable).

Semantics: each key has a bucket of capacity ``capacity`` tokens, refilled
at ``rate`` tokens/second of EVENT time. An event is admitted iff the
bucket holds >= 1 token after refill; admission spends one token; denied
events spend nothing. The recurrence is inherently sequential per key —
exactly the applyInPandas case (same justification as ops/ewma.py): Python
touches only (key, ts, id) projections, Arrow-batched, one group per call.

Exact-arithmetic contract: tokens are tracked in INTEGER micro-token
units (1 token = 1_000_000 units) and refill is integer floor division
of the event-time delta — no floating point anywhere in the recurrence,
so Python and the DuckDB recursive-CTE oracle are bit-identical by
construction (float rounding modes differ between engines: Python
rounds half-even, DuckDB half-away-from-zero).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts_us long, admitted boolean, "
    "token_units long"
)

TOKEN = 1_000_000  # micro-token units per token


def _replay(pdf: pd.DataFrame, capacity_units: int, us_per_unit: int) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
    units = capacity_units
    prev_us = None
    admitted, balances = [], []
    for ts_us in pdf["ts_us"]:
        if prev_us is not None:
            units = min(capacity_units, units + (ts_us - prev_us) // us_per_unit)
        prev_us = ts_us
        if units >= TOKEN:
            units -= TOKEN
            admitted.append(True)
        else:
            admitted.append(False)
        balances.append(units)
    pdf["admitted"] = admitted
    pdf["token_units"] = balances
    return pdf


def token_bucket_admission(
    events,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    capacity_tokens: int = 3,
    us_per_unit: int = 100_000,
):
    """One row per event: (key, id, ts_us, admitted, token_units).

    ``us_per_unit`` sets the refill rate: one micro-token (1e-6 token)
    per that many event-time microseconds — us_per_unit=100_000 is
    10 units/s = 1e-5 tokens/s.

    Shape at 100 TB: one shuffle on the key (the same partitioning any
    per-key stateful pass needs); state per group is two scalars. Keys
    are independent — skewed hot keys cost their own group only, and the
    projection into Python is 3 narrow columns, never payloads.
    """
    from pyspark.sql import functions as F

    narrow = events.select(
        F.col(key_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
    )

    cap_units = capacity_tokens * TOKEN

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        return _replay(pdf, cap_units, us_per_unit)

    return narrow.groupBy("user_id").applyInPandas(apply, OUTPUT_SCHEMA)


def admission_summary(admissions) -> "object":
    """Per-key rollup of a token_bucket_admission result:
    (key, n_events, n_admitted, n_denied, admit_rate)."""
    from pyspark.sql import functions as F

    return admissions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("admitted").cast("long")).alias("n_admitted"),
        F.sum((~F.col("admitted")).cast("long")).alias("n_denied"),
        F.round(
            F.sum(F.col("admitted").cast("long")) / F.count(F.lit(1)), 6
        ).alias("admit_rate"),
    )
