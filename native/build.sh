#!/bin/sh
# Build the fastdata CPython extension in-place (no pip needed).
set -e
cd "$(dirname "$0")"
PYINC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
EXT=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
gcc -O3 -shared -fPIC -I"$PYINC" fastdata.c -o "../audio2photoreal_tpu/data/fastdata$EXT"
echo "built audio2photoreal_tpu/data/fastdata$EXT"
