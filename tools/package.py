"""Build the --py-files artifact for spark-submit.

Produces ``dist/sissaschool_xmlschema_spark.zip`` containing the package —
the artifact the north rule's ``spark-submit --py-files`` deployment mode
ships to executors (Python-only package, no build step):

    python tools/package.py
    spark-submit --master <cluster> \
        --py-files dist/sissaschool_xmlschema_spark.zip \
        jobs/validate_job.py --input <table> --out <dir>
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "sissaschool_xmlschema_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(ROOT, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, ROOT))
    return out_path


if __name__ == "__main__":
    print(build())
