"""Package reader_spark for spark-submit --py-files.

Builds a zip containing the reader_spark package (sources only, no
tests/caches) so jobs run on a cluster where the repo checkout is not on
PYTHONPATH:

    python scripts/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files reader_spark.zip jobs/extract_job.py ...

The driver ships the zip to every executor; `import reader_spark`
resolves from it on both sides. tests/test_jobs_cli.py proves this
end-to-end by running extract_job via spark-submit from OUTSIDE the
checkout with only the zip on the path.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    pkg_root = os.path.join(REPO, "reader_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "reader_spark.zip")
    print(build(out))
