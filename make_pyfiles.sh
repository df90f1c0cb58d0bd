#!/bin/sh
# Package the engine for `spark-submit --py-files` (BASELINE.json packaging
# requirement).  Usage:
#   ./make_pyfiles.sh                      # writes dist/holi_search_engine_spark.zip
#   spark-submit --py-files dist/holi_search_engine_spark.zip your_job.py
set -eu
cd "$(dirname "$0")"
mkdir -p dist
rm -f dist/holi_search_engine_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/holi_search_engine_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("holi_search_engine_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/holi_search_engine_spark.zip")
EOF
