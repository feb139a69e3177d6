#!/bin/bash
# One-command TPU revalidation + measurement sweep (run when the axon
# tunnel is up; the round-2 outage blocked these).  Order matters: the
# golden checks gate everything else.
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:/root/.axon_site
f() { grep -vE "WARNING|cpu_aot|features:"; }

echo "== goldens (default spelling: lazy reduction ON since round 3) =="
timeout 3600 python scripts/tpu_check.py 2>&1 | f | tail -8

echo "== goldens with BN254_LAZY_FQ2=0 (eager fallback spelling) =="
BN254_LAZY_FQ2=0 timeout 3600 python scripts/tpu_check.py 2>&1 | f | tail -8

echo "== pairing batch sweep + phase breakdown =="
timeout 4800 python scripts/bench_pairing.py 2>&1 | f | tail -20

echo "== fused MSM (mixed-affine) vs the native C oracle =="
timeout 4800 python scripts/bench_msm_fused.py 18 20 2>&1 | f | tail -8

echo "== micro-benchmarks v2 -> benches/results.json =="
timeout 5400 python benches/api.py 2>&1 | f | tail -20

echo "== headline =="
timeout 2400 python bench.py 2>&1 | f | tail -3

echo "== 20k-pairing shootout =="
BN254_SHOOTOUT_DEVICE=1 timeout 4800 python shootout/run.py 10000 2>&1 | f | tail -3

echo "REVALIDATION DONE — record results in STATUS.md/BASELINE.md"
