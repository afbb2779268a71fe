"""Build the --py-files zip for spark-submit (see tools/submit_job.py).

Zips ``localitysensitivesketch_spark/`` (sources only, deterministic order,
fixed timestamps so the artifact is reproducible) into
``dist/lss_spark.zip`` by default.

    python tools/build_pyfiles.py [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "localitysensitivesketch_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "lss_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    files = []
    for root, _dirs, names in os.walk(os.path.join(REPO, PKG)):
        if "__pycache__" in root:
            continue
        for n in names:
            if n.endswith(".py"):
                p = os.path.join(root, n)
                files.append((os.path.relpath(p, REPO), p))
    files.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, path in files:
            with open(path, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
