"""Session gate: oracle parity + determinism, recorded in PROGRESS.jsonl.

The r2 judge found an oracle regression (hll_intersection) that shipped
because nothing *ran* check_oracles as a gate — check_determinism checks
run-to-run stability, not Spark-vs-DuckDB agreement, so it cannot catch a
wrong oracle.  This script is the one command to run before claiming
"all oracles green":

    python scripts/gate.py            # full: oracles (sf0.01) + determinism
    python scripts/gate.py --oracles  # oracle sweep only

It shells out to the two checkers (each owns a SparkSession lifecycle) and
appends a result line to PROGRESS.jsonl:

    {"ts": ..., "gate": {"oracles": "ok", "determinism": "ok", ...}}
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

REPO = "/root/repo"


def run_checker(script: str) -> tuple[str, str]:
    """Run a checker subprocess; return (status, tail-of-output)."""
    proc = subprocess.run(
        [sys.executable, f"{REPO}/scripts/{script}"],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    out = proc.stdout + proc.stderr
    sys.stdout.write(out)
    # the verdict line, not whatever stderr noise happens to be last
    verdict = next(
        (
            ln
            for ln in reversed(out.strip().splitlines())
            if "ALL OK" in ln or "FAILURES" in ln or "FAIL" in ln
        ),
        out.strip().splitlines()[-1] if out.strip() else "",
    )
    return ("ok" if proc.returncode == 0 else "FAIL"), verdict


def main() -> int:
    oracles_only = "--oracles" in sys.argv[1:]
    record: dict = {"ts": time.time(), "gate": {}}
    status, tail = run_checker("check_oracles.py")
    record["gate"]["oracles"] = status
    record["gate"]["oracles_detail"] = tail
    if not oracles_only:
        status_d, tail_d = run_checker("check_determinism.py")
        record["gate"]["determinism"] = status_d
        record["gate"]["determinism_detail"] = tail_d
        status_p, tail_p = run_checker("check_plans.py")
        record["gate"]["plans"] = status_p
        record["gate"]["plans_detail"] = tail_p
    with open(f"{REPO}/PROGRESS.jsonl", "a") as fh:
        fh.write(json.dumps(record) + "\n")
    failed = [k for k, v in record["gate"].items() if v == "FAIL"]
    print("\nGATE:", "FAIL " + str(failed) if failed else "ALL OK")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
