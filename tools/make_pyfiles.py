"""Build dist/aktuell_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> str:
    dist = ROOT / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "aktuell_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in sorted((ROOT / "aktuell_spark").rglob("*.py")):
            zf.write(path, path.relative_to(ROOT))
    print(out)
    return str(out)


if __name__ == "__main__":
    main()
