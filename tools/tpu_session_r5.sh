#!/bin/bash
# r5 battery: gates + A/Bs for the two shipped r5 changes (per-scale
# forward-precision routing; s2d4 space-to-depth detector stem) plus the
# serving re-bench VERDICT r4 item 2 asked for (the committed e2e and
# configs[4] rows predate the r4e preprocess ship).
#
# Order: numerics gates first (a broken rescue invalidates every perf
# number after it), then the pipeline A/Bs, then serving, then the
# trained-net accuracy gates (slowest stage last so early results land
# even if the tunnel dies).
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

run() {  # run <timeout_s> <log> <cmd...>
    local to="$1" log="$2"; shift 2
    echo "[$(date +%H:%M:%S)] START $*"
    timeout "$to" "$@" >"$log" 2>&1
    echo "[$(date +%H:%M:%S)] EXIT $? -> $log"
}

# 1-2. Numerics gates under the routing change.
run 2400 tools/tpu_parity_r5.log python tools/tpu_parity.py
run 2400 tools/bounce_r5.log python tools/bounce_fixture_tpu.py auto

# 3. The heavy-config A/B: bench_variants' fhog31+3-scale row is the
# routing target (r4b: 2309.6 fps; pre-premium was 2629).
run 3600 tools/bench_variants_r5.log python tools/bench_variants.py

# 4. Canonical pipeline (default config is unit-scale: expect neutral).
run 2400 tools/bench_default_r5.log python bench.py

# 5. detect_batch re-profile with the stem (target <= 1.5 ms @ 8x1080p
# bf16 — VERDICT r4 item 1's done-criterion).
run 2400 tools/profile_detector_r5_s2d4.log \
    env TPU_MOT_STEM=s2d4 python tools/profile_detector.py

# 6-9. Serving A/Bs on the SHIPPED code (VERDICT item 2): direct control
# first, then the stem, for both the 720p e2e and the 8x1080p slice.
run 3600 tools/bench_e2e_r5_direct.log python bench_e2e.py
run 3600 tools/bench_e2e_r5_s2d4.log \
    env TPU_MOT_STEM=s2d4 python bench_e2e.py
run 3600 tools/bench_configs4_r5_direct.log python tools/bench_configs4.py
run 3600 tools/bench_configs4_r5_s2d4.log \
    env TPU_MOT_STEM=s2d4 python tools/bench_configs4.py

# 10. Trained-net accuracy gates: quant_map through the shipped bf16
# preprocess + the new stem_map phase (s2d4 on the trained net).
run 3600 tools/train_e2e_mota_r5.log python tools/train_e2e_mota.py

echo "[$(date +%H:%M:%S)] done"
