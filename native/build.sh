#!/bin/sh
# Build the native host engine (regenerates the constants header first).
set -e
cd "$(dirname "$0")"
python3 gen_consts.py
${CC:-gcc} -O3 -shared -fPIC -Wall -fopenmp -o libbn254_host.so bn254_host.c
echo "built native/libbn254_host.so"
