"""Build pero_ocr_spark.zip for `spark-submit --py-files`.

Usage:
    python make_submit_zip.py [out.zip]
    spark-submit --py-files pero_ocr_spark.zip your_job.py
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "pero_ocr_spark.zip")
    root = Path(__file__).parent / "pero_ocr_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(root.rglob("*.py")):
            z.write(p, p.relative_to(root.parent))
        n = len(z.namelist())
    print(f"wrote {out}: {n} modules, {out.stat().st_size} bytes")


if __name__ == "__main__":
    main()
