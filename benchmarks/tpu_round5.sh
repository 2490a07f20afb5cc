#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r4 "Next round" items 1-3, 8).
#
# Every step is bounded by `timeout` and logged to $LOGDIR so a pool
# outage mid-queue still leaves partial artifacts (bench_all also
# rewrites its --out file after every row). Compile-heavy steps are
# LADDERED — a small size must succeed before the full-scale compile
# launches — because killing a client mid-compile orphans the remote
# helper's job and takes the shared pool down (the round-3 outage).
#
# Usage: bash benchmarks/tpu_round5.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-/tmp/r5pipe}
mkdir -p "$LOGDIR"

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%T)" | tee -a "$LOGDIR/pipeline.log"
  timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%T)" | tee -a "$LOGDIR/pipeline.log"
  return $rc
}

# 0. Backend must answer before anything compiles.
step 00_probe 420 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices())
print(np.asarray(jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))))
" || { echo 'TPU unavailable — aborting queue'; exit 1; }

# 1. Config sweep 1-4 with PSNR -> activates the parity gate (the
#    round's #1 deliverable). Fast-compiling configs first so a short
#    recovery window still yields rows (c2 23s / c4 19s / c3 90s in
#    round 2; c1 was 956s before the round-5 mip restructure);
#    --out is rewritten after every row.
step 10_bench_all_1234 10000 python benchmarks/bench_all.py \
  --configs 2,4,g,3,1 --out benchmarks/results_r05.json

# 1b. Config-1 again with the now-warm persistent compile cache
#     (utils/compile_cache.py): step 10's cold run wrote the cache
#     entries, so this records the serving-configuration compile time
#     (VERDICT r4 item 4 target: < 60 s). Merged as config "1_warmcache"
#     so the cold number in the main row stays honest.
step 11_c1_warm 2400 python benchmarks/bench_all.py --configs 1 \
  --out "$LOGDIR/results_c1_warm.json"
python - "$LOGDIR" <<'EOF'
import json, pathlib, sys
logdir = pathlib.Path(sys.argv[1])
main = pathlib.Path("benchmarks/results_r05.json")
warm = logdir / "results_c1_warm.json"
if main.exists() and warm.exists():
    rows = json.loads(main.read_text())
    rows = [r for r in rows if r.get("config") != "1_warmcache"]
    for r in json.loads(warm.read_text()):
        if r.get("config") == 1:
            r["config"] = "1_warmcache"
            rows.append(r)
    main.write_text(json.dumps(rows, indent=1) + "\n")
    print("merged warm config-1 row")
EOF

# 2. Headline bench — bench.py now measures BOTH serving shapes in one
#    run and reports the winner (no default flip needed).
step 20_bench 6000 python bench.py

# 3. 4K guard-band envelope proof artifact.
step 30_stress4k 2400 python benchmarks/stress_4k_envelope.py \
  --out benchmarks/stress4k_r05.json

# 4. Config-1 compile attribution. COLD cache dir so the attribution
#    is not polluted by step 10's entries (symmetric with step 41).
step 40_mip_compile 2400 env METALRENDERER_CACHE_DIR=/tmp/r5_gather_cache \
  python benchmarks/mip_compile_probe.py

# 4b. A/B the one-hot-matmul mip bilinear (METALRENDERER_MIP_IMPL=
#     matmul): Mosaic compilability + compile-time + runtime vs the
#     gather default, AFTER the main sweep so its rows are never at
#     risk. If compile_s drops and PSNR holds, flip the default.
step 41_mip_matmul_probe 2400 env METALRENDERER_MIP_IMPL=matmul \
  METALRENDERER_CACHE_DIR=/tmp/r5_matmul_cache \
  python benchmarks/mip_compile_probe.py
step 42_c1_matmul 2400 env METALRENDERER_MIP_IMPL=matmul \
  METALRENDERER_CACHE_DIR=/tmp/r5_matmul_cache \
  python benchmarks/bench_all.py --configs 1 \
  --out "$LOGDIR/results_c1_matmul.json"

# 5. Config-5 compile ladder: 250k must pass before 1M.
if step 50_attrib_250k 1800 python benchmarks/compile_attrib.py \
     --tris 250000 --stages prep,binning; then
  step 51_attrib_1m 4200 python benchmarks/compile_attrib.py \
    --tris 1000000 --stages prep,binning
fi

# 6. Config 5 AT SPEC (1M tris @ 3840x2160) — REQUIRED by the parity
#    gate once results_r05.json exists, so this step must land a row
#    (or a psnr_error row) in the main results file. Separate
#    invocation + merge so a compile-window blowout cannot damage the
#    configs-1-4 rows.
step 60_config5 9000 python benchmarks/bench_all.py --configs 5 \
  --tris5 1000000 --size5 3840x2160 --out "$LOGDIR/results_c5.json"
python - "$LOGDIR" <<'EOF'
import json, pathlib, sys
logdir = pathlib.Path(sys.argv[1])
main = pathlib.Path("benchmarks/results_r05.json")
c5 = logdir / "results_c5.json"
if main.exists() and c5.exists():
    rows = json.loads(main.read_text())
    rows = [r for r in rows if r.get("config") != 5]
    rows += json.loads(c5.read_text())
    main.write_text(json.dumps(rows, indent=1) + "\n")
    print("merged config-5 rows into", main)
EOF

# 7. Fresh flagship stage anatomy + the shadow-pass tuning sweep (the
#    dominant residual cost; flip shadow_tile_h default on this data).
step 70_profile_stages 3000 python benchmarks/profile_stages.py
step 71_shadow_tiles 3000 python benchmarks/shadow_tile_probe.py

echo "=== queue done $(date -u +%T)" | tee -a "$LOGDIR/pipeline.log"
