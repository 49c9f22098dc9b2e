#!/bin/bash
# Thin train entry point (reference scripts/train.sh): stamps a run
# timestamp and forwards every flag to the train CLI.
set -euo pipefail

export OMP_NUM_THREADS=${OMP_NUM_THREADS:-1}
: ${PYTHON_COMMAND:="python -m caiman_asr_tpu.train"}

TIMESTAMP=$(date '+%Y_%m_%d_%H_%M_%S')

${PYTHON_COMMAND} "$@" --timestamp="$TIMESTAMP"
