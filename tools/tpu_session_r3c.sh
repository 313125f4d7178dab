#!/bin/bash
# Tunnel-watch + TPU bench battery for the r3c session.
# Waits for the axon tunnel to recover (probe with a short timeout),
# then runs, in order: verify drive, Mosaic parity harness, the two new
# kernel benches, and bench.py A/B over assign/pyramid impls.
# Logs land in tools/ for committing.
set -u
cd "$(dirname "$0")/.."

probe() {
    timeout 90 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() != 'cpu'
print(float(jnp.sum(jnp.arange(4.0))))" >/dev/null 2>&1
}

echo "[$(date +%H:%M:%S)] waiting for tunnel..."
until probe; do
    sleep 120
done
echo "[$(date +%H:%M:%S)] tunnel up"

run() {  # run <log> <cmd...>
    local log="$1"; shift
    echo "[$(date +%H:%M:%S)] START $*"
    timeout 2400 "$@" >"$log" 2>&1
    echo "[$(date +%H:%M:%S)] EXIT $? -> $log"
}

run /tmp/verify_tpu.log            python /tmp/verify_tpu.py
run tools/tpu_parity_r3c.log       python tools/tpu_parity.py
run tools/bench_auction_r3.log     python tools/bench_auction.py
run tools/bench_pyramid_r3.log     python tools/bench_pyramid.py
run /tmp/bench_default.log         python bench.py
TPU_MOT_ASSIGN_IMPL=pallas  run /tmp/bench_assign_pallas.log  python bench.py
TPU_MOT_PYRAMID_IMPL=fused  run /tmp/bench_pyr_fused.log      python bench.py
echo "[$(date +%H:%M:%S)] ALL DONE"
