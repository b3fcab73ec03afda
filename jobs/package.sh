#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/bitextor_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/bitextor_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("bitextor_spark/**/*.py")):
        z.write(p, p.as_posix())
    # trained default artifacts (langid profile, rerank model) — read
    # zip-safely via importlib.resources in bitextor_spark/models.py;
    # the langid_corpus training INPUTS stay out (build-time only)
    for p in sorted(root.glob("bitextor_spark/data/*")):
        if p.is_file():
            z.write(p, p.as_posix())
print("wrote dist/bitextor_spark.zip")
EOF
