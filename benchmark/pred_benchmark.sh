#!/bin/bash
# Inference throughput benchmark (port of reference pred_benchmark.sh).
set -e
cd "$(dirname "$0")"
python pred_benchmark.py "$@"
