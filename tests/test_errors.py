"""Error-taxonomy parity: every retryability flag asserted by the
reference's tests/unit/errors.test.ts, against our kind->retryable map
(error ROWS replace exception classes in the dataset engine)."""

from reader_spark.functions.errors import RETRYABLE, is_retryable

# (kind, retryable) exactly as asserted in errors.test.ts:96-160
REFERENCE_FLAGS = [
    ("NetworkError", True),
    ("TimeoutError", True),
    ("CloudflareError", True),
    ("BotDetectedError", True),
    ("ProxyConnectionError", True),
    ("TLSError", True),
    ("EmptyContentError", True),
    ("BrowserPoolError", True),
    ("AccessDeniedError", False),
    ("DNSError", False),
    ("ProxyExhaustedError", False),
    ("ContentTooLargeError", False),
    ("ClientClosedError", False),
    ("InvalidUrlError", False),
    ("RobotsBlockedError", False),
]


def test_every_reference_flag_matches():
    for kind, flag in REFERENCE_FLAGS:
        assert RETRYABLE[kind] is flag, kind
        assert is_retryable(kind) is flag, kind


def test_unknown_kind_not_retryable():
    # wrapError analogue: anything unrecognized is a dead letter.
    assert is_retryable("SomethingNovel") is False
    assert is_retryable(None) is False


def test_quarantine_split_is_partition(spark_or_none=None):
    # pure check: the retryable/dead kind sets partition the taxonomy
    retryable = {k for k, v in RETRYABLE.items() if v}
    dead = {k for k, v in RETRYABLE.items() if not v}
    assert retryable | dead == set(RETRYABLE)
    assert not (retryable & dead)
