"""Policy propagation across duplicate clusters.

Deduplication keeps one exemplar per near-duplicate cluster — but
compliance flags (robots/ai.txt opt-out, DMCA takedown, license
revocation, PII verdicts) attach to INDIVIDUAL copies. If any member
of a duplicate cluster is flagged, the kept exemplar is the same
content and must be purged too, or the pipeline launders opted-out text
through its dedup step. This op closes that hole: flags propagate to
every member of a cluster (and to singletons trivially), producing the
purge manifest the export sink consumes.

Scale shape: one equi-join (members x flags on doc_id), one
map-side-combined groupBy(cluster_id) carrying a single max(flag)
long, one join back — digests and booleans shuffle, never content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["propagate_cluster_policy"]


def propagate_cluster_policy(
    members: DataFrame, flags: DataFrame
) -> DataFrame:
    """Propagate per-doc policy flags to whole duplicate clusters.

    ``members``: ``(cluster_id, doc_id)`` — every doc, singletons
    included (cluster_id = own doc_id under the min-id convention).
    ``flags``: ``(doc_id, flagged)`` — the per-copy policy verdicts;
    docs absent from ``flags`` count as unflagged.

    Returns ``(doc_id, cluster_id, flagged_self, flagged_cluster,
    purge)`` — ``purge`` is true iff ANY member of the doc's cluster is
    flagged.
    """
    m = members.select("cluster_id", "doc_id")
    f = flags.select(
        F.col("doc_id").alias("__fid"), F.col("flagged").alias("__fl")
    )
    joined = m.join(f, m["doc_id"] == f["__fid"], "left").select(
        "cluster_id",
        "doc_id",
        F.coalesce(F.col("__fl"), F.lit(False)).alias("flagged_self"),
    )
    cluster_flag = joined.groupBy("cluster_id").agg(
        F.max(F.col("flagged_self").cast("long")).alias("__cf")
    )
    return joined.join(cluster_flag, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "flagged_self",
        (F.col("__cf") == 1).alias("flagged_cluster"),
        (F.col("__cf") == 1).alias("purge"),
    )
