#!/bin/bash
# r4c battery: stacked-DFT formulation A/B (6 matmuls -> 2 per
# transform, TPU_MOT_FFT_STACKED) + consistent-tree re-verification of
# the parity harness and bounce fixture after the fwd_split removal.
# NOTE TO FUTURE SESSIONS: do not edit tpu_mot/ source while this runs —
# each stage imports the tree at its own start (the r4b fixture run was
# lost to exactly that race).
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

# Standalone KCF math: per-term vs stacked dependent chains.
run tools/profile_stages_r4c_perterm.log python tools/profile_stages.py
run tools/profile_stages_r4c_stacked.log \
    env TPU_MOT_FFT_STACKED=1 python tools/profile_stages.py

# Pipeline A/B at the shipped defaults.
run tools/bench_stacked_r4.log \
    env TPU_MOT_FFT_STACKED=1 python bench.py

# Numerics gates under stacked: precision ladder + bounce fixture.
run tools/tpu_parity_r4e_stacked.log \
    env TPU_MOT_FFT_STACKED=1 python tools/tpu_parity.py
run tools/bounce_stacked_r4.log \
    env TPU_MOT_FFT_STACKED=1 python tools/bounce_fixture_tpu.py auto

echo "[$(date +%H:%M:%S)] done"
