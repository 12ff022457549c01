#!/bin/sh
# Package the engine for spark-submit --py-files (north_rule ship path).
# Produces dist/gaia_spark.zip containing gaia_spark/ gaia_ref/ gaia_synth/.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/gaia_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/gaia_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for pkg in ("gaia_spark", "gaia_ref", "gaia_synth"):
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, p)
print("wrote dist/gaia_spark.zip")
EOF
