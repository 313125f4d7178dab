#!/bin/bash
# r5b battery: confirm the lifecycle-default change (n_init 2,
# max_age_tentative 2) on hardware — canonical bench (expect MOTA
# 0.9844 / HOTA 0.9374 at unchanged fps), bounce fixture (gates on its
# own cfg, expect unchanged 0.9873), hard fixture headline tiers.
# NOTE: do not edit tpu_mot/ while this runs.
set -u
cd "$(dirname "$0")/.."
probe() {
    timeout 90 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() != 'cpu'
print(float(jnp.sum(jnp.arange(4.0))))" >/dev/null 2>&1
}
echo "[$(date +%H:%M:%S)] waiting for tunnel..."
until probe; do sleep 120; done
echo "[$(date +%H:%M:%S)] tunnel up"
run() {
    local to="$1" log="$2"; shift 2
    echo "[$(date +%H:%M:%S)] START $*"
    timeout "$to" "$@" >"$log" 2>&1
    echo "[$(date +%H:%M:%S)] EXIT $? -> $log"
}
run 2400 tools/bench_default_r5b.log python bench.py
run 2400 tools/bounce_r5b.log python tools/bounce_fixture_tpu.py auto
run 2400 tools/bench_hard_fixture_r5b.log python tools/bench_hard_fixture.py
echo "[$(date +%H:%M:%S)] done"
