"""Build the --py-files artifact for cluster submission.

    python tools/package.py              # → dist/solrizer_spark.zip
    spark-submit --master yarn \
        --py-files dist/solrizer_spark.zip job.py \
        --input db.pages --output s3://bucket/out --buckets 4096
"""

from __future__ import annotations

import os
import zipfile


def build(out: str = "dist/solrizer_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(root, "dist"), exist_ok=True)
    target = os.path.join(root, out) if not os.path.isabs(out) else out
    with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(root, "solrizer_spark")
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                # .c: the cscan kernel source rides the zip and is
                # compiled on first use per executor node (zip-safe
                # read via importlib.resources)
                if fn.endswith((".py", ".c")):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return target


if __name__ == "__main__":
    print(build())
