#!/usr/bin/env bash
# Build the golden-parity oracle: the UNMODIFIED reference PolyTrajOptimizer
# compiled headlessly against the stubs in ./stubs. Eigen comes from the
# tensorflow wheel's vendored copy (no system Eigen in this image).
set -euo pipefail
cd "$(dirname "$0")"

REF=${REF:-/root/reference/src/Plan/traj_planner}
DECOMP=${DECOMP:-/root/reference/src/Plan/utils/DecompROS/decomp_ros_utils/include}
EIGEN=${EIGEN:-/opt/venv/lib/python3.12/site-packages/tensorflow/include}
if [ ! -d "$EIGEN/Eigen" ]; then
  EIGEN=$(python3 -c "import pathlib, tensorflow as tf; print(pathlib.Path(tf.__file__).parent / 'include')")
fi

mkdir -p build
g++ -O2 -std=c++14 -w \
  -I stubs \
  -I "$REF/include" \
  -I "$DECOMP" \
  -I "$EIGEN" \
  oracle_main.cpp "$REF/src/traj_optimizer.cpp" \
  -o build/golden_oracle
echo "built golden/build/golden_oracle"
