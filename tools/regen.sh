#!/bin/bash
# Regenerate every artifact class this repo's claims rest on (VERDICT r4
# next #9: one documented command per artifact, no archaeology).
#
# Usage:  tools/regen.sh <target> [target ...]
#         tools/regen.sh all-cpu     # everything that runs without the TPU
#         tools/regen.sh all-tpu     # everything that needs the real chip
#
# Targets, their artifact, and the platform they need:
#   suite      -> exit status only            (CPU; quick suite, ~min)
#   fullsuite  -> exit status only            (CPU; + slow-marked tests)
#   dryrun     -> stdout DRYRUN OK            (CPU; 8-device virtual mesh)
#   multihost  -> stdout MULTIHOST OK         (CPU; 2 real processes x 4)
#   bench      -> BENCH_PRESETS.json + stdout (TPU; ~17 preset rows)
#   tpuacc     -> TPUACC_r05.json             (TPU; 5 phases + oracle)
#   trainacc   -> TRAINACC_r05.json,
#                 models/bp_e2e_predictor.npz (TPU; BP e2e training)
#   hand       -> models/hand_lm_standin_synth.{npz,json}   (TPU trainer)
#   palm       -> models/palm_det_standin_synth.{npz,json}  (TPU trainer)
#   seg        -> models/seg_standin_synth.{npz,json}       (TPU trainer)
#
# TPU targets serialize on the tunnel (two processes contending can wedge
# the sync-dispatch latch — .claude/skills/verify/SKILL.md); this script
# runs its targets sequentially for exactly that reason.
set -u
cd "$(dirname "$0")/.."
rc=0

run() {
  echo "=== regen: $* ==="
  "$@" || { echo "=== regen FAILED (rc=$?): $* ==="; rc=1; }
}

for t in "$@"; do
  case "$t" in
    all-cpu)  "$0" suite dryrun multihost || rc=1 ;;
    all-tpu)  "$0" hand palm seg tpuacc trainacc bench || rc=1 ;;
    suite)     run python -m pytest tests/ -q ;;
    fullsuite) run python -m pytest tests/ -m '' -q ;;
    dryrun)
      run env XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          JAX_PLATFORMS=cpu python -c \
          "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN OK')" ;;
    multihost)
      run env JAX_PLATFORMS=cpu python -c \
          "import __graft_entry__ as g; g.dryrun_multihost(); print('MULTIHOST OK')" ;;
    bench)     run env BENCH_ALL=1 python bench.py ;;
    tpuacc)    run python tools/tpu_accuracy.py ;;
    trainacc)  run env EPISODES=150 TRAIN_T=12 WARMUP=260 \
                   python tools/train_bp_e2e.py ;;
    hand)      run python tools/train_hand_standin.py ;;
    palm)      run python tools/train_palm_standin.py ;;
    seg)       run python tools/train_seg_standin.py ;;
    *) echo "unknown target: $t"; rc=1 ;;
  esac
done
exit $rc
