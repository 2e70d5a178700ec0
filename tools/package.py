"""Build ``nutch_spark.zip`` for ``spark-submit --py-files`` deployment.

The engine is pure Python (no build step), so cluster deployment is one
zip of the package plus any driver script::

    python tools/package.py [out.zip]
    spark-submit --master yarn --py-files nutch_spark.zip \
        crawl_loop.py --warehouse hdfs://... --cycles 3

``tests/test_spark_submit.py`` drives exactly this path end-to-end in a
cold separate process (the north rule's deployment clause).
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str = "nutch_spark.zip", root: str | None = None) -> str:
    root = root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(root, "nutch_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "nutch_spark.zip"))
