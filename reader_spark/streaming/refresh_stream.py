"""Streaming crawl-refresh routing: stream-static delta against the
committed snapshot.

The batch twin is ops/delta.crawl_delta + jobs/refresh_job.py (oracle-
checked / e2e-tested). On a continuous recrawl, documents arrive as a
stream and the decision — new, changed, or unchanged vs the last
committed snapshot — must happen on arrival so only churn enters the
extraction sink. A stream can't see 'removed' (absence never arrives);
removal detection stays a batch diff over the accumulated table, the
same weakening dedup_stream documents for its watermark horizon.

Shape: the arriving doc is digested (md5 of its content column — a
pure map), then LEFT-JOINED stream-static against the committed (id,
digest) projection. Stream-static joins are stateless on the stream
side; the static side is re-read per micro-batch, so a snapshot
republished by the nightly batch job is picked up without restart.
Only ids and 32-hex digests cross the join — payloads stay in the
stream's own columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reader_spark.ops.delta import ADDED, CHANGED, UNCHANGED


def refresh_route_stream(
    stream: DataFrame,
    committed: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Annotate a streaming doc frame with its refresh status vs the
    static committed snapshot: 'added' (never committed), 'changed'
    (digest differs), 'unchanged'. Downstream: filter
    status != 'unchanged' into the extraction sink."""
    snap = committed.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_old_md5")
    )
    digested = stream.withColumn("_new_md5", F.md5(F.col(text_col)))
    joined = digested.join(snap, id_col, "left")
    status = (
        F.when(F.col("_old_md5").isNull(), ADDED)
        .when(F.col("_old_md5") != F.col("_new_md5"), CHANGED)
        .otherwise(UNCHANGED)
    )
    return joined.withColumn("status", status).drop("_old_md5", "_new_md5")


def refresh_frontier_stream(
    stream: DataFrame,
    committed: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The applied pass: only added+changed rows survive — what the
    streaming extraction sink consumes."""
    routed = refresh_route_stream(stream, committed, id_col, text_col)
    return routed.where(F.col("status").isin(ADDED, CHANGED))
