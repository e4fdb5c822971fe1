#!/usr/bin/env python
"""Package the engine for spark-submit --py-files.

Produces a zip whose root contains the ``open_source_search_engine_spark``
package, import-ready on driver and executors:

    python scripts/make_pyfiles.py [/tmp/osse_pyfiles.zip]
    spark-submit --master local[8] --py-files /tmp/osse_pyfiles.zip \
        scripts/submit_build.py --input <transcripts.parquet> --warehouse /tmp/wh
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile


def make_pyfiles_zip(out_path: str = "/tmp/osse_pyfiles.zip") -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "open_source_search_engine_spark")
    tmp = tempfile.mkdtemp(prefix="osse-pyfiles-")
    staging = os.path.join(tmp, "stage")
    shutil.copytree(
        pkg,
        os.path.join(staging, os.path.basename(pkg)),
        ignore=shutil.ignore_patterns("__pycache__"),
    )
    base, ext = os.path.splitext(out_path)
    if ext != ".zip":
        base = out_path
    archive = shutil.make_archive(base, "zip", staging)
    shutil.rmtree(tmp, ignore_errors=True)
    return archive


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/osse_pyfiles.zip"
    print(make_pyfiles_zip(out))
