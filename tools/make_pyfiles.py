"""Package fog_spark for `spark-submit --py-files` (north_rule deploy shape).

Builds a zip of the pure-Python package (no data, no tests) and prints
the cluster launch line. On a real cluster the SAME code that runs in
this sandbox's local mode runs under YARN/K8s — nothing in the package
is local-mode-only (engine/fs goes through the Hadoop FS API, sessions
only differ by master URL / submit-time confs).

Usage:
    python tools/make_pyfiles.py [out.zip]
    spark-submit --master yarn --deploy-mode cluster \
        --py-files fog_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        fog_spark/cli.py --graph hdfs://.../repos.parquet --format repos \
        --app pagerank --run-dir hdfs://.../ckpt --out hdfs://.../ranks
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(REPO, "fog_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "fog_spark.zip")
    print(build(out))
