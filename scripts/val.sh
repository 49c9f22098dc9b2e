#!/bin/bash
# Thin validation entry point (reference scripts/val.sh).
set -euo pipefail

export OMP_NUM_THREADS=${OMP_NUM_THREADS:-1}
: ${PYTHON_COMMAND:="python -m caiman_asr_tpu.val"}

${PYTHON_COMMAND} "$@"
