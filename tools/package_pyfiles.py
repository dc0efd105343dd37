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


def build_zip(out_path: str, repo: str = REPO,
              extra_pkg_dirs: "list[str] | None" = None) -> str:
    """Zip every .py under risjbot_spark/ (package layout preserved);
    returns the artifact's sha256 hex digest.

    extra_pkg_dirs: directories whose CHILD packages are added at the
    zip ROOT — e.g. a vendored-library dir (tests/fixtures/fakelibs)
    ships its textblob/, pronouncing/, ... packages to every executor
    alongside risjbot_spark, so worker processes import them from the
    same --py-files artifact (the executor-level seam-proof path: a
    worker-side backend_flags() then reports the shipped libraries)."""
    pkg_root = os.path.join(repo, PACKAGE)
    arcs = []
    roots = [(pkg_root, repo)]
    for extra in extra_pkg_dirs or []:
        roots.append((extra, extra))
    for walk_root, rel_base in roots:
        for dirpath, dirnames, filenames in os.walk(walk_root):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    arcs.append((os.path.relpath(full, rel_base), full))
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
    ap.add_argument("--with-libs", action="append", default=[],
                    metavar="DIR",
                    help="also ship DIR's child packages at the zip root "
                         "(vendored NLP/media libraries for executors)")
    args = ap.parse_args()
    digest = build_zip(args.out, extra_pkg_dirs=args.with_libs)
    n = len(zipfile.ZipFile(args.out).namelist())
    print(f"{args.out}  files={n}  sha256={digest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
