#!/usr/bin/env bash
# North-rule invocation: the dedup pipeline as a spark-submit --py-files job.
#
#   tools/submit_job.sh <input.parquet> <workdir> [master] [extra spark-submit args...]
#
# Builds lsh_rs_spark.zip from the repo, then submits plans/pipeline.py.
# Verified in-sandbox: identical output to `python -m lsh_rs_spark.plans.pipeline`.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
INPUT="${1:?input parquet path}"
WORKDIR="${2:?workdir path}"
MASTER="${3:-local[8]}"
shift $(( $# > 3 ? 3 : $# ))

ZIP="$(mktemp -d)/lsh_rs_spark.zip"
( cd "$REPO" && python - "$ZIP" <<'PY'
import sys, zipfile, os
with zipfile.ZipFile(sys.argv[1], "w") as z:
    for root, dirs, files in os.walk("lsh_rs_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
PY
)

exec spark-submit \
    --master "$MASTER" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.sql.execution.arrow.pyspark.enabled=true \
    --py-files "$ZIP" \
    "$@" \
    "$REPO/lsh_rs_spark/plans/pipeline.py" \
    --input "$INPUT" --workdir "$WORKDIR" --resume
