#!/usr/bin/env bash
# Package the engine and launch the demo crawl via spark-submit --py-files
# (north_rule: "the whole job ships via spark-submit --py-files").
# Usage: scripts/submit_crawl.sh [master] [corpus_dir] [state_dir] [rounds]
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${1:-local[8]}"
CORPUS="${2:-/tmp/fc_demo_corpus}"
STATE="${3:-/tmp/fc_demo_state}"
ROUNDS="${4:-3}"

ZIP=/tmp/fraudcrawler_spark.zip
rm -f "$ZIP"
# package only the library (the driver script is passed separately)
python - <<EOF
import zipfile, os
with zipfile.ZipFile("$ZIP", "w") as z:
    for root, _, files in os.walk("fraudcrawler_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            p = os.path.join(root, f)
            z.write(p, p)
print("packaged", "$ZIP")
EOF

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  launch_demo_crawl.py "$CORPUS" "$STATE" "$ROUNDS"
