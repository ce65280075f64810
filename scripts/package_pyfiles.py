"""Build the --py-files artifact: a zip of the tiflow_spark package.

    python scripts/package_pyfiles.py [out.zip]

spark-submit ships this to every executor (addPyFile), so pandas/Arrow
UDFs (the mounter, the Avro codec, multimodal featurize) resolve their
imports worker-side with no cluster install step.
"""

from __future__ import annotations

import os
import sys
import zipfile


def build(out: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "tiflow_spark")
    os.makedirs(os.path.dirname(os.path.abspath(out)) or ".", exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, repo))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dist/tiflow_spark.zip"
    print(build(out))
