"""Build the --py-files zip for spark-submit (``BASELINE.json:6``).

    python -m tile_gen_spark.jobs.package [out.zip]
"""

from __future__ import annotations

import os
import sys
import zipfile


def build_zip(out: str = "tilegen.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    pkg = os.path.join(root, "tile_gen_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    print(build_zip(sys.argv[1] if len(sys.argv) > 1 else "tilegen.zip"))
