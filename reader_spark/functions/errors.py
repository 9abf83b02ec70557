"""Error taxonomy (reference: src/errors.ts:59-482 — 19 classes with a
`retryable` flag, plus wrapError :484).

In the dataset engine failed documents become ROWS, not exceptions (a thrown
executor error would kill the batch — SURVEY.md §1.1): every extraction row
carries (error_kind, error_msg), and this module maps kinds to retryability
so a driver can re-run the retryable quarantine subset (T5)."""

from __future__ import annotations

# kind -> retryable, mirroring the reference taxonomy. Kinds not produced by
# a batch engine (proxy/browser/network) are kept for corpus-recorded fetch
# errors that may ride along in the input table.
RETRYABLE: dict[str, bool] = {
    "NetworkError": True,
    "TimeoutError": True,
    "CloudflareError": True,
    "AccessDeniedError": False,
    "ContentExtractionError": False,
    "ValidationError": False,
    "InvalidUrlError": False,
    "RobotsBlockedError": False,
    "BrowserPoolError": True,
    "ClientClosedError": False,
    "NotInitializedError": False,
    "DNSError": False,
    "TLSError": True,
    "BotDetectedError": True,
    "ProxyConnectionError": True,
    "ProxyExhaustedError": False,
    "ContentTooLargeError": False,
    "MarkdownConversionError": False,
    "EmptyContentError": True,
    # Engine-native kinds (produced by reader_spark itself):
    "EmptyDocumentError": False,
    "BlockedPageError": True,
    "ValueError": False,
}


def is_retryable(error_kind: str | None) -> bool:
    """wrapError analogue: unknown kinds default to non-retryable
    (errors.ts:484-...,588)."""
    if error_kind is None:
        return False
    return RETRYABLE.get(error_kind, False)


def split_quarantine(extracted):
    """Split an extracted DataFrame into (ok, retryable, dead) — the T5
    quarantine pattern: re-run only the retryable subset."""
    from pyspark.sql import functions as F

    retryable_kinds = [k for k, v in RETRYABLE.items() if v]
    ok = extracted.where(F.col("error_kind").isNull())
    failed = extracted.where(F.col("error_kind").isNotNull())
    retryable = failed.where(F.col("error_kind").isin(retryable_kinds))
    dead = failed.where(~F.col("error_kind").isin(retryable_kinds))
    return ok, retryable, dead
