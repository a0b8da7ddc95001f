#!/bin/bash
# Round-5 train-attribution captures (VERDICT r4 Next #5), serialized on the
# one chip. Persistent compile cache (/tmp/some_tpu_jax_cache) makes reruns
# cheap; first pass pays each leg's remote compile once.
set -u
cd "$(dirname "$0")/.."
L=.bench_logs

run() {
  local name=$1; shift
  echo "=== $name: $*" >&2
  timeout 1500 python tools/bench_train.py "$@" \
    > "$L/${name}_r5.json" 2> "$L/${name}_r5.err"
  echo "=== $name rc=$?" >&2
  tail -c 300 "$L/${name}_r5.json" >&2; echo >&2
}

# forward-only and grad-only at flagship geometry (grad leg re-cut r5:
# params-only tree, moments freed — the r4 OOM fix)
run train_fwd32   --B 32 --T 2048 --steps 8 --ablate fwd_loss_only
run train_grad32  --B 32 --T 2048 --steps 8 --ablate grad_only
# full step baselines + the two remat policies at flagship geometry
run train_base32  --B 32 --T 2048 --steps 8
run train_sac32   --B 32 --T 2048 --steps 8 --remat-policy save_attn_conv
run train_dots32  --B 32 --T 2048 --steps 8 --remat-policy dots
echo "=== capture_r5_train done" >&2
