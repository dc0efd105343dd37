"""Build the `--py-files` artifact for cluster deployment.

The north-star deployment is `spark-submit --py-files risjbot_spark.zip
driver.py crawl ...` on a multi-executor cluster (the reference is driven
as `scrapy crawl <spider>`, /root/reference/RISJbot/README.md:26-60; the
Spark analogue ships the package to every executor as a zip on sys.path).

The zip is deterministic — entries sorted by arcname, timestamps zeroed
(the same reproducibility rule as the sinks' gzip mtime=0) — so re-building
from the same tree yields a byte-identical artifact whose sha256 can be
pinned in deploy manifests.

Usage:
    python tools/package_pyfiles.py [--out dist/risjbot_spark.zip]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "risjbot_spark"

# a fixed DOS timestamp (1980-01-01, the zip epoch) — same spirit as the
# sinks' gzip mtime=0: identical tree -> identical bytes
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build_zip(out_path: str, repo: str = REPO) -> str:
    """Zip every .py under risjbot_spark/ (package layout preserved);
    returns the artifact's sha256 hex digest."""
    pkg_root = os.path.join(repo, PACKAGE)
    arcs = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in filenames:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                arcs.append((os.path.relpath(full, repo), full))
    if not arcs:
        raise FileNotFoundError(f"no .py files under {pkg_root}")
    arcs.sort(key=lambda t: t[0])

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in arcs:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)

    with open(out_path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist",
                                                  "risjbot_spark.zip"))
    args = ap.parse_args()
    digest = build_zip(args.out)
    n = len(zipfile.ZipFile(args.out).namelist())
    print(f"{args.out}  files={n}  sha256={digest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
