#!/bin/bash
# r4d battery: resume of tpu_session_r4c.sh — the prior session died
# mid-stage-3 (bench_stacked_r4.log holds only the backend warning).
# Stages 1-2 (standalone profiles, per-term vs stacked) completed and
# their logs are kept; this script re-runs the pipeline A/B with a
# SAME-SESSION per-term control (the tunnel swings ±5%, so the stacked
# number needs a paired baseline, not a cross-day one), then the
# numerics gates under stacked.
# NOTE TO FUTURE SESSIONS: do not edit tpu_mot/ source while this runs —
# each stage imports the tree at its own start.
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

# Pipeline A/B at the shipped defaults: per-term control first, then
# stacked, then per-term again (bracketing detects a mid-session tunnel
# drift that a single pair would misattribute to the knob).
run tools/bench_perterm_ctl_r4d.log python bench.py
run tools/bench_stacked_r4d.log \
    env TPU_MOT_FFT_STACKED=1 python bench.py
run tools/bench_perterm_ctl2_r4d.log python bench.py

# Numerics gates under stacked: precision ladder + bounce fixture.
run tools/tpu_parity_r4d_stacked.log \
    env TPU_MOT_FFT_STACKED=1 python tools/tpu_parity.py
run tools/bounce_stacked_r4d.log \
    env TPU_MOT_FFT_STACKED=1 python tools/bounce_fixture_tpu.py auto

echo "[$(date +%H:%M:%S)] done"
