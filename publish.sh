#!/bin/bash
# Release automation — the role of the reference's `publish.sh` (which
# copies src/ per crate and `cargo publish`es salva2d + salva3d). Here
# 2D/3D share one package (`dim` parameter), so one sdist + wheel.
#
# Usage:
#   ./publish.sh           build dist/ and verify the wheel imports
#   ./publish.sh --upload  also `twine upload dist/*` (needs credentials)
set -euo pipefail
cd "$(dirname "$0")"

rm -rf dist build/salva_tpu.egg-info
# Direct setuptools backend (no build isolation — works offline).
python -c "
from setuptools.build_meta import build_sdist, build_wheel
import os
os.makedirs('dist', exist_ok=True)
print(build_sdist('dist'))
print(build_wheel('dist'))
"

# Smoke-check: the wheel installs into a scratch prefix and imports.
tmp=$(mktemp -d)
pip install --quiet --no-deps --target "$tmp" dist/*.whl
PYTHONPATH="$tmp" python -c "import salva_tpu; print('wheel ok:', salva_tpu.__version__)"
rm -rf "$tmp"

if [[ "${1:-}" == "--upload" ]]; then
    python -m twine upload dist/*
else
    echo "dist/ ready (pass --upload to publish)"
fi
