"""Ad-hoc per-query timing harness for optimization work (guide §1.4).

bench.py is FROZEN for driver measurement; this file exists so individual
queries can be isolated with the noop sink, repeated, and their
`.explain("formatted")` plans dumped, without touching the frozen harness.

Usage:
    python bench_extra.py q1 q2 ...            # time each query once
    python bench_extra.py --repeat 3 q1        # best of 3
    python bench_extra.py --plans plans/r06 --suffix before q1 q2
    python bench_extra.py --explain-only --plans plans/r06 --suffix after q1

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reader_spark.spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--plans", default=None, help="dir to write explain output")
    ap.add_argument("--suffix", default="before", help="plan file suffix")
    ap.add_argument("--explain-only", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    # Same session shape as bench.py's main session.
    spark = get_spark(
        "bench_extra",
        master=f"local[{CPUS}]",
        arrow_max_records=256,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(1024 * 1024)},
    )
    all_queries = entrymod.queries()
    out: dict[str, float] = {}
    for name in args.names:
        fn = all_queries[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            import contextlib
            import io

            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        if args.explain_only:
            continue
        best = float("inf")
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
        print(f"{name}\t{out[name]}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
