#!/bin/bash
# Round-5c TPU measurement queue — armed after the Aug 19 evening pool
# drop (the 5b queue completed 18:15; probes fail again by 20:30).
# Adds the two follow-ups the 5b data pointed at:
#   * fold-size ladder (per_frame_scan beat the 8-frame fold; the
#     SMEM fixes postdate the bisect that pinned chunk=8),
#   * config-3 per-stage anatomy (the 13.6 Mpixel/s row needs a
#     measured attribution before the sampler is rebuilt).
# Steps are bounded and logged; artifacts land under benchmarks/ so a
# later session can commit them even if this queue runs unattended.
#
# Usage: bash benchmarks/tpu_round5c.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-/tmp/r5cpipe}
mkdir -p "$LOGDIR"

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%T)" | tee -a "$LOGDIR/pipeline.log"
  timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%T)" | tee -a "$LOGDIR/pipeline.log"
  return $rc
}

# 0. Backend probe (bounded; the outage mode is an init hang).
step 00_probe 420 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices())
print(np.asarray(jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))))
" || { echo 'TPU unavailable — aborting queue'; exit 1; }

# 1. Headline bench at current HEAD (regression check + fresh capture).
step 10_bench 6000 python bench.py

# 2. Fold-size ladder on the flagship scene.
step 20_chunk_ladder 9000 python benchmarks/chunk_ladder.py \
  --chunks 16,32,64

# 3. Config-3 per-stage anatomy (measured attribution for the
#    13.6 Mpixel/s textured large-mesh row).
step 30_c3_anatomy 6000 python benchmarks/profile_config.py --config 3

# 4. Fresh flagship stage anatomy (post any new commits).
step 40_profile_stages 3000 python benchmarks/profile_stages.py

echo "=== queue done $(date -u +%T)" | tee -a "$LOGDIR/pipeline.log"
