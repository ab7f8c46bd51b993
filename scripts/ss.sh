#!/usr/bin/env bash
# Strong-scaling sweep (the reference's Convergence_and_Scaling/ss.sh
# equivalent): shard counts over a virtual (or real) device mesh; repeats
# handled inside experiments.scaling; results appended to data/strong-scaling.txt
set -euo pipefail
cd "$(dirname "$0")/.."
python -m experiments.scaling --mode strong --shards 1 2 4 8 --orders 3 4 \
  --virtual-devices "${VIRTUAL_DEVICES:-8}" --repeats "${REPEATS:-3}" "$@"
