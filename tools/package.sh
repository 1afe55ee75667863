#!/usr/bin/env bash
# Build dist/medacy_spark.zip for spark-submit --py-files (north rule:
# "ships via spark-submit --py-files to run at N and 4N executors").
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/medacy_spark.zip
zip -qr dist/medacy_spark.zip medacy_spark -x "*__pycache__*"
echo "built dist/medacy_spark.zip ($(du -h dist/medacy_spark.zip | cut -f1))"
