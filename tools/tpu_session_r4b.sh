#!/bin/bash
# r4b follow-up battery: response-class forward routing + fwd_split
# precision mode.  Evidence for the uncommitted fft.py/kcf.py change
# set (see docs/BENCHMARKS.md r4 section once logged).
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

# Parity first: confirms the relaxed response-class tripwire and logs
# the fwd_split position on the precision ladder.
run tools/tpu_parity_r4d.log python tools/tpu_parity.py

# Behavioral gate for fwd_split: the bounce fixture is the only probe
# that separates precision modes (CPU tier is f32-exact).
run tools/bounce_fwdsplit_r4.log python tools/bounce_fixture_tpu.py \
    auto fwd_split

# Throughput: fwd_split vs the shipped auto(=fwd_high, response-class).
run tools/bench_prec_fwdsplit_r4.log \
    env TPU_MOT_KCF_PRECISION=fwd_split python bench.py
run tools/bench_auto_r4b.log python bench.py

echo "[$(date +%H:%M:%S)] done"
