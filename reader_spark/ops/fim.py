"""Fill-in-the-middle (FIM) training-sample transform — the code-model
data-prep step published by Bavarian et al. 2022 ("Efficient Training
of Language Models to Fill in the Middle", the OpenAI FIM paper) and
used by StarCoder/CodeLlama-style pipelines: for a sampled fraction of
documents, split the text into (prefix, middle, suffix) at two random
character offsets and re-render with sentinel tokens so an
autoregressive model learns infilling.  PSM renders
``<pre>prefix<suf>suffix<mid>middle``; SPM (the paper's joined variant,
§3) renders ``<pre><suf>suffix<mid>prefixmiddle``; unsampled documents
pass through untransformed (mode ``ar``).

Everything is deterministic and within-row: the sampling decision, the
SPM/PSM choice and the two cut offsets all derive from md5 of the
document id (the repo's portable-hash discipline), so the transform is
a scan-bound projection — no shuffle, no UDF, reproducible across
engines and runs.  At 10^12 documents this is exactly the shape you
want: FIM rides the same pass that writes training shards.

The DuckDB twin replays the identical md5 arithmetic and substr
algebra; the character-conservation invariant (every sample contains
the full original text, re-ordered plus sentinels) is pinned by test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fim_transform", "PRE_TOK", "SUF_TOK", "MID_TOK"]

PRE_TOK = "<|fim_prefix|>"
SUF_TOK = "<|fim_suffix|>"
MID_TOK = "<|fim_middle|>"


def _h(tag: str, id_col: Column) -> Column:
    """Portable nonneg 32-bit hash: first 8 md5 hex digits."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"fim:{tag}:"), id_col.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def fim_transform(
    docs: DataFrame,
    fim_pct: int = 50,
    spm_pct: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic FIM sampling + rendering.

    Returns ``(doc_id, mode, n_chars, cut_lo, cut_hi, sample)`` —
    ``mode`` in {'ar', 'psm', 'spm'}; ``fim_pct``%% of documents are
    transformed (md5-bucket sampling), of which ``spm_pct``%% render
    SPM; cut offsets are two independent md5 draws in [0, n_chars]
    (order-normalized), so middles can be empty and can touch either
    end, exactly the paper's uniform character-level splits.  AR rows
    carry ``cut_lo = cut_hi = 0``.
    """
    if not (0 <= fim_pct <= 100 and 0 <= spm_pct <= 100):
        raise ValueError(
            f"fim_pct and spm_pct must be in [0, 100], got "
            f"{(fim_pct, spm_pct)}"
        )
    did = F.col(id_col)
    text = F.col(text_col)
    n = F.length(text)
    is_fim = _h("rate", did) % 100 < F.lit(fim_pct)
    is_spm = _h("spm", did) % 100 < F.lit(spm_pct)
    u = F.pmod(_h("a", did), n + 1)
    v = F.pmod(_h("b", did), n + 1)
    lo = F.least(u, v)
    hi = F.greatest(u, v)
    prefix = text.substr(F.lit(1), lo)
    middle = text.substr(lo + 1, hi - lo)
    suffix = text.substr(hi + 1, n - hi)
    psm = F.concat(
        F.lit(PRE_TOK), prefix, F.lit(SUF_TOK), suffix, F.lit(MID_TOK),
        middle,
    )
    spm = F.concat(
        F.lit(PRE_TOK), F.lit(SUF_TOK), suffix, F.lit(MID_TOK), prefix,
        middle,
    )
    return docs.select(
        did.cast("long").alias("doc_id"),
        F.when(~is_fim, "ar")
        .when(is_spm, "spm")
        .otherwise("psm")
        .alias("mode"),
        n.cast("long").alias("n_chars"),
        F.when(is_fim, lo).otherwise(0).cast("long").alias("cut_lo"),
        F.when(is_fim, hi).otherwise(0).cast("long").alias("cut_hi"),
        F.when(~is_fim, text).when(is_spm, spm).otherwise(psm).alias(
            "sample"
        ),
    )
