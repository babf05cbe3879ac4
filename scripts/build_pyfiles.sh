#!/bin/sh
# Build the --py-files artifact for spark-submit (north_rule packaging).
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/vectortiles_spark.zip
python - <<'PY'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/vectortiles_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("vectortiles_spark/**/*.py")):
        z.write(p, p.as_posix())
print("dist/vectortiles_spark.zip written")
PY
