#!/usr/bin/env bash
# spark-submit --py-files deployment smoke: runs the reference golden
# pipeline from the zipped package only (cwd-independent), local master.
# On a real cluster, swap --master and add executor confs; nothing else
# changes (north_rule: "runs via spark-submit --py-files").
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=$(python "$REPO/scripts/make_pyfiles.py")
RUNNER=$(mktemp /tmp/wspr_runner_XXXX.py)
cat > "$RUNNER" <<'PY'
from web_search_pagerank_project_spark.plans.cli import main
main()
PY
cd /tmp  # prove imports come from the zip, not the repo checkout
exec spark-submit \
    --master "local[8]" \
    --conf spark.sql.shuffle.partitions=16 \
    --conf spark.ui.enabled=false \
    --py-files "$ZIP" \
    "$RUNNER" \
    "$@"
