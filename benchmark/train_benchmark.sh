#!/bin/bash
# Run the training benchmark matrix (port of reference
# benchmark/train_benchmark.sh: {fp32, bf16} configs; DataParallel rows
# are replaced by mesh data parallelism, see train_benchmark.py).
set -e
cd "$(dirname "$0")"
echo "=== fp32 ==="
python train_benchmark.py --synthetic "$@"
echo "=== bf16 ==="
python train_benchmark.py --synthetic --bf16 "$@"
