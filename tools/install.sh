#!/bin/bash
# One-shot dev install (the reference's tools/install.sh analogue, minus
# docker orchestration — see Dockerfile for the container path).
# Usage: bash tools/install.sh [--tpu]
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--tpu" ]]; then
    pip install "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
else
    pip install jax
fi
pip install numpy pytest
pip install -e . --no-build-isolation

bash tools/build.sh

echo "----------------------------------------"
echo "install ok. quick checks:"
echo "  python -m pytest tests/ -q        # full suite (CPU, virtual mesh)"
echo "  python bench.py                   # headline benchmark (TPU)"
