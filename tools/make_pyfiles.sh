#!/bin/sh
# Package the engine for spark-submit --py-files.
# Usage: tools/make_pyfiles.sh [out.zip]
set -e
cd "$(dirname "$0")/.."
out="${1:-engine.zip}"
rm -f "$out"
zip -qr "$out" html_parser_spark -x '*__pycache__*'
echo "$out"
