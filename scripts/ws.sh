#!/usr/bin/env bash
# Weak-scaling sweep (reference ws.sh): mesh family wave-tank-big{,2,4,8}
# paired with shard counts 1/2/4/8; results to data/weak-scaling.txt
set -euo pipefail
cd "$(dirname "$0")/.."
python -m experiments.scaling --mode weak --shards 1 2 4 8 --orders 3 4 \
  --virtual-devices "${VIRTUAL_DEVICES:-8}" --repeats "${REPEATS:-3}" "$@"
