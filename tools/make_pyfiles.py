"""Build the ``--py-files`` artifact for cluster deployment.

The north rule's deployment form is ``spark-submit --py-files`` on a
multi-executor cluster: the engine ships as a single zip that Spark
distributes to every executor's PYTHONPATH.  This builds that zip
DETERMINISTICALLY (fixed timestamps, sorted entries, STORED — no
compression, so the bytes don't depend on the zlib version) and the
artifact's sha256 is reproducible from the tree alone — the same
property the engine's outputs have.

Usage:
    python tools/make_pyfiles.py [--out dist/photo_dedup_spark.zip]

Then on a cluster:
    spark-submit --master yarn --num-executors N \
        --py-files dist/photo_dedup_spark.zip tools/submit_job.py \
        --input <parquet> --output <dir>
"""

from __future__ import annotations

import argparse
import zipfile
from pathlib import Path

# Fixed DOS timestamp for every entry (1980-01-01, the zip epoch):
# rebuilding from an identical tree yields a byte-identical artifact.
_EPOCH = (1980, 1, 1, 0, 0, 0)


def build_zip(repo_root: Path, out: Path) -> Path:
    pkg = repo_root / "photo_dedup_spark"
    if not pkg.is_dir():
        raise FileNotFoundError(f"package dir not found: {pkg}")
    out.parent.mkdir(parents=True, exist_ok=True)
    files = sorted(
        p for p in pkg.rglob("*.py") if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", compression=zipfile.ZIP_STORED) as zf:
        for p in files:
            arcname = str(p.relative_to(repo_root))
            info = zipfile.ZipInfo(arcname, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_STORED
            info.external_attr = 0o644 << 16
            zf.writestr(info, p.read_bytes())
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--out",
        default="dist/photo_dedup_spark.zip",
        help="output zip path (default: dist/photo_dedup_spark.zip)",
    )
    args = ap.parse_args()
    root = Path(__file__).resolve().parent.parent
    out = build_zip(root, Path(args.out))
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
