"""Build the --py-files zip for spark-submit (north_rule shipping mode).

Usage: python tools/package_pyfiles.py  -> dist/ccnews_spark.zip
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "commoncrawlnewsdataset_spark"
OUT = REPO / "dist" / "ccnews_spark.zip"


def main() -> None:
    OUT.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted(PKG.rglob("*.py")):
            z.write(py, py.relative_to(REPO))
    print(f"wrote {OUT} ({OUT.stat().st_size:,} bytes)")


if __name__ == "__main__":
    main()
