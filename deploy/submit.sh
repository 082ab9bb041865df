#!/usr/bin/env bash
# R4: cluster submit entrypoint — the analogue of the reference's
# start.sh step 3 (`docker exec spark spark-submit /home/spark/main.py`,
# ref start.sh:36) with the container plumbing replaced by a plain
# spark-submit against whatever resource manager --master points at.
#
# Usage:
#   deploy/submit.sh [job.py] [extra spark-submit args...]
#
# Configuration comes from deploy/spark-submit.conf (copy the
# .template and fill credentials) plus the same environment variables
# the reference's compose file injects (docker-compose.yml:55-62):
#   BUCKET_NAME            s3a://bucket or file:///path base URI
#   DB_URL DB_USER DB_PASSWORD   JDBC sink target
#   TRIGGER_INTERVAL_SEC   micro-batch trigger (default 60)
set -euo pipefail
cd "$(dirname "$0")/.."

JOB="${1:-deploy/job_ingest.py}"
shift || true

CONF="deploy/spark-submit.conf"
if [[ ! -f "$CONF" ]]; then
    echo "no $CONF — copy deploy/spark-submit.conf.template and fill" >&2
    echo "the <...> placeholders (endpoint + credentials)." >&2
    exit 2
fi
if grep -q '<MINIO' "$CONF"; then
    echo "unfilled <...> placeholders remain in $CONF" >&2
    exit 2
fi

# Ship the engine package to the executors. zip of the package dir is
# the dependency the reference satisfied by volume-mounting ./code
# (docker-compose.yml:49-50). stdlib zipfile: no zip binary required
# on the submit host.
PKG=advanced_real_time_data_pipeline_and_analytical_processing_spark
ZIP="$(mktemp -d)/engine.zip"
python3 - "$PKG" "$ZIP" <<'PYEOF'
import os, sys, zipfile
pkg, out = sys.argv[1], sys.argv[2]
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk(pkg):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            p = os.path.join(root, f)
            z.write(p, p)
PYEOF

exec spark-submit \
    --properties-file "$CONF" \
    --py-files "$ZIP" \
    "$@" \
    "$JOB"
