#!/bin/sh
# Package the engine for cluster submission (north_rule: ships as
# spark-submit --py-files modules). Usage:
#   sh tools/package_pyfiles.sh             # -> dist/crawler_spark.zip
#   spark-submit --py-files dist/crawler_spark.zip crawler_spark/cli.py \
#       --seeds http://host0.example.com/p0 --checkpoint-dir /data/crawl1
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/crawler_spark.zip
python - <<'EOF'
import pathlib, zipfile
root = pathlib.Path(".")
with zipfile.ZipFile("dist/crawler_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("crawler_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote dist/crawler_spark.zip")
EOF
