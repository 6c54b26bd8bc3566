"""Build tetrex_spark.zip for `spark-submit --py-files` deployment
(north-rule run mode). Pure stdlib; deterministic member order and
zeroed timestamps so rebuilding an unchanged tree is byte-identical.

Usage: python scripts/make_pyfiles.py [out.zip]
"""

from __future__ import annotations

import pathlib
import sys
import zipfile


def build(out: str = "tetrex_spark.zip") -> str:
    root = pathlib.Path(__file__).resolve().parent.parent
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((root / "tetrex_spark").rglob("*.py")):
            info = zipfile.ZipInfo(str(p.relative_to(root)))
            info.date_time = (1980, 1, 1, 0, 0, 0)
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, p.read_bytes())
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "tetrex_spark.zip"))
