#!/bin/bash
# Differential correctness test, mirroring test/dlrm_s_test.sh:17-47:
# the reference diffs a tiny seeded run between its PyTorch and Caffe2
# twins; here the oracle pair is the JAX framework vs an independent
# torch implementation (tests/torch_oracle.py), plus golden losses.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/test_train.py -q -x "$@"
echo "dlrm_tpu_test: PASSED"
