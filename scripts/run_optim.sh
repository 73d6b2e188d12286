#!/bin/bash
# Example invocation (reference: scripts/run_optim.sh) — 25-iteration CMA-ES
# style transfer with the basic chain and the AFx-Rep param metric.
python -m st_ito_tpu.cli.run_optim \
    "$1" \
    "$2" \
    --algorithm es \
    --effect-type basic \
    --max-iters 25 \
    --popsize 128 \
    --metric param \
    --savepop
