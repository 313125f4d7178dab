#!/bin/bash
# r4 TPU bench battery: converts the r3c claims into committed evidence
# (VERDICT r3 ask #2).  Probes the tunnel first; every log lands in
# tools/ for committing.  Uses `env VAR=...` (not the fragile
# env-prefix-on-shell-function form flagged in VERDICT r3 weak #7).
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

# Canonical number first: if the tunnel dies mid-battery, the headline
# evidence is already on disk.
run tools/bench_default_r4.log       python bench.py
# Mosaic parity for the new kernels (auction + pyramid compiled, not
# interpreted), then their standalone sweeps.
run tools/tpu_parity_r4.log          python tools/tpu_parity.py
run tools/bench_auction_r4.log       python tools/bench_auction.py
run tools/bench_pyramid_r4.log       python tools/bench_pyramid.py
# bench.py A/B over the knob-gated kernels.
run tools/bench_assign_pallas_r4.log env TPU_MOT_ASSIGN_IMPL=pallas python bench.py
run tools/bench_pyr_fused_r4.log     env TPU_MOT_PYRAMID_IMPL=fused python bench.py
# e2e battery incl. the int8 dynamic-PTQ serving stage (VERDICT ask #4).
run tools/bench_e2e_r4.log           python bench_e2e.py
echo "[$(date +%H:%M:%S)] ALL DONE"
