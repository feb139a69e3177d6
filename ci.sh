#!/bin/sh
# CI entry point (SURVEY.md C14; reference .travis.yml:4-6 runs
# `cargo test --release` + a no_std check).  One command, green, ~20 min
# cold / a few min warm on a 4-core CPU box (pytest-xdist runs test files
# in 4 worker processes — see pytest.ini; that isolation is also what
# keeps XLA:CPU's JIT under its per-process code-footprint limit):
#
#   sh ci.sh
#
# Stages:
#   1. build the native C host engine (regenerates the constants header)
#   2. full pytest suite on a virtual 8-device CPU mesh (tests/conftest.py
#      pins jax to CPU + the persistent compile cache) — covers the spec
#      oracle, host codecs, native parity, the device/tape engines, the
#      fused Pallas kernels in interpret mode, sharding invariance, and
#      the reference-scale sweeps
#   3. the driver-shaped multi-chip dryrun (sharded pairing + MSM on an
#      8-device mesh)
set -e
cd "$(dirname "$0")"

echo "== [1/3] native engine =="
sh native/build.sh

echo "== [2/3] pytest suite (virtual 8-device CPU mesh) =="
python3 -m pytest tests/ -q

echo "== [3/3] multi-chip dryrun =="
JAX_PLATFORMS=cpu python3 -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "CI OK"
