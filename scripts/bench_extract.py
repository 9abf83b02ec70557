"""Extraction-only bench retake (VERDICT r2 #3): measure ONLY the headline
full-corpus extraction against a same-session calibration line, repeating
the (calibrate, extract) pair so VM phase drift is visible instead of
aliased into the result.

Prints one JSON line:
  {"pairs": [{"calibration": c, "extract_sec": s, "docs_per_sec": d,
              "normalized_multiple": d/c}, ...],
   "best_normalized_multiple": ...}

normalized_multiple = parallel docs/sec over single-thread calibrated
docs/sec — the VM-speed-independent signal (r1: ~5.9, r2 driver run: ~4.0).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import CPUS, SF_DIR, ensure_corpus, parse_sf, time_extraction  # noqa: E402
from reader_spark.spark.session import get_spark  # noqa: E402


def calibrate(n: int = 300) -> float:
    from reader_spark.extract.pipeline import extract_document
    from reader_spark.fixtures import synth_payload

    payloads = [synth_payload(i, oversized_fraction=0.0) for i in range(n)]
    t0 = time.monotonic()
    for i, p in enumerate(payloads):
        extract_document(f"cal-{i}", p, "https://fixtures.test/cal")
    return round(n / (time.monotonic() - t0), 1)


def main() -> None:
    pairs = int(os.environ.get("PAIRS", "3"))
    sf = parse_sf(SF_DIR)
    n_docs = max(4000, int(sf * 1_500_000))
    scan_conf = {"spark.sql.files.maxPartitionBytes": str(1024 * 1024)}
    spark = get_spark(
        "bench_extract",
        master=f"local[{CPUS}]",
        arrow_max_records=256,
        extra_conf=scan_conf,
    )
    path = ensure_corpus(spark, f"sf{sf}", n_docs)
    out = []
    for _ in range(pairs):
        cal = calibrate()
        sec, n = time_extraction(spark, path, runs=1)
        dps = round(n / sec, 1)
        out.append(
            {
                "calibration": cal,
                "extract_sec": round(sec, 3),
                "docs": n,
                "docs_per_sec": dps,
                "normalized_multiple": round(dps / cal, 2),
            }
        )
        print(json.dumps(out[-1]), file=sys.stderr, flush=True)
    spark.stop()
    print(
        json.dumps(
            {
                "pairs": out,
                "best_normalized_multiple": max(
                    p["normalized_multiple"] for p in out
                ),
            }
        )
    )


if __name__ == "__main__":
    raise SystemExit(main())
