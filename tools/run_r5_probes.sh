#!/bin/bash
# Round-5 follow-up probe driver: one TPU claim per probe batch because the
# axon backend stays RESOURCE_EXHAUSTED after ~5 large-geometry compiles in
# one process (jax.clear_caches is not enough — see tools/tpu_session_r5.py).
# Each batch is a fresh python process; results land in per-batch JSONs.
set -u
cd "$(dirname "$0")/.."
run() {  # run <tag> <probe-list>
  echo "=== batch $1: $2 ($(date +%H:%M:%S)) ==="
  python tools/tpu_session_r5.py --skip trace,bench \
    --probes "$2" --out "/tmp/r5_probe_$1.json"
  echo "=== batch $1 done rc=$? ($(date +%H:%M:%S)) ==="
}
run sq224 "sq224_b8,sq224_b4"
run h512 "h512_pad"
run xla "xla_augment_796"
run acc "acc2_796,acc4_796"
run b8 "b8_796"
run b8acc2 "b8_acc2_796"
echo "=== bench ($(date +%H:%M:%S)) ==="
python bench.py > /tmp/r5_bench.json
echo "=== all done rc=$? ($(date +%H:%M:%S)) ==="
