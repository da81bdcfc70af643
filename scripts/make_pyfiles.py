#!/usr/bin/env python3
"""Build the --py-files artifact for spark-submit deployment.

Produces dist/wspr_engine.zip containing the package; submit with:

    spark-submit --master <cluster> \\
        --py-files dist/wspr_engine.zip \\
        -- \\
        $(python -c 'import web_search_pagerank_project_spark.plans.cli as m; print(m.__file__)') \\
        --data <edges.csv.gz> [--search_query ...]

or any driver script that imports web_search_pagerank_project_spark.
scripts/spark_submit_smoke.sh runs the full golden pipeline this way.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "web_search_pagerank_project_spark"


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "wspr_engine.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
