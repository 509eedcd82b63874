#!/bin/sh
# Package the engine for spark-submit --py-files (north_rule launch mode).
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/pyofs_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile('dist/pyofs_spark.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk('pyofs_spark'):
        if '__pycache__' in root:
            continue
        for f in files:
            if f.endswith('.py'):
                z.write(os.path.join(root, f))
print('dist/pyofs_spark.zip written')
EOF
cat > dist/cli_main.py <<'EOF'
from pyofs_spark.cli import main
import sys
sys.exit(main())
EOF
echo "launch: spark-submit --master <cluster> --py-files dist/pyofs_spark.zip dist/cli_main.py tile-assign --out /tmp/tiles"
