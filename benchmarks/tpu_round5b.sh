#!/bin/bash
# Round-5b TPU measurement queue — rerun after the r5 mid-round fixes:
# exact seam-tile mip sampling (visit lists), guard-clip MXU precision,
# SMEM budget fixes (packed subtiles, packed+capped mip visits, sampler
# sub-batching, chunked frame folds), shadow_tile_h=64 default.
#
# Every step is bounded by `timeout` and logged to $LOGDIR; bench_all
# rewrites its --out file after every row, so a pool outage mid-queue
# still leaves partial artifacts.
#
# Usage: bash benchmarks/tpu_round5b.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-/tmp/r5bpipe}
mkdir -p "$LOGDIR"

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%T)" | tee -a "$LOGDIR/pipeline.log"
  timeout "$tmo" "$@" > "$LOGDIR/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%T)" | tee -a "$LOGDIR/pipeline.log"
  return $rc
}

# 0. Backend probe.
step 00_probe 420 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices())
print(np.asarray(jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))))
" || { echo 'TPU unavailable — aborting queue'; exit 1; }

# 1. Config sweep 1-4 + the 1080p flagship golden. The shape ladder
#    (whole fold -> chunked fold -> per-frame scan) guarantees a timing
#    row per config even when a fold cannot compile.
step 10_bench_all 10000 python benchmarks/bench_all.py \
  --configs 2,4,g,3,1 --out benchmarks/results_r05.json

# 2. Headline bench: per_frame_scan + fused_chunked + frame_folded,
#    winner reported.
step 20_bench 6000 python bench.py

# 3. Config 5 AT SPEC (1M tris @ 3840x2160) + merge into the main file.
step 30_config5 9000 python benchmarks/bench_all.py --configs 5 \
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

# 4. Warm-cache config 1 (serving-configuration compile time).
step 40_c1_warm 2400 python benchmarks/bench_all.py --configs 1 \
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

# 5. A/B the one-hot-matmul mip bilinear on the textured configs (its
#    42x faster lowering matters for the scan-shape compile).
step 50_c3_matmul 4000 env METALRENDERER_MIP_IMPL=matmul \
  METALRENDERER_CACHE_DIR=/tmp/r5b_matmul_cache \
  python benchmarks/bench_all.py --configs 3 \
  --out "$LOGDIR/results_c3_matmul.json"

# 6. Fresh stage anatomy on the final code.
step 60_profile_stages 3000 python benchmarks/profile_stages.py

echo "=== queue done $(date -u +%T)" | tee -a "$LOGDIR/pipeline.log"
