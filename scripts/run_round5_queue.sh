#!/bin/bash
# Round-5 queue A — the joint-OID north-star chain (VERDICT r4 task 1;
# third round on the queue). Runs seed 42 to convergence, per-image eval
# report, the 27 val overlays, then seed repeats (7/1234) and the
# RGB-only ablation for the mean±spread + depth-delta table ACCURACY.md
# needs. Both round-4 failure modes are fixed before launch:
#   - stall-kill during cold multi-bucket compiles: cli/main.py now runs
#     a background liveness heartbeat (prints every 2 min while a step
#     is in flight), so supervise.py's 900 s window cannot fire mid-compile;
#   - the rc=1 NaN misclassification: the NaN hard-exit is now rc=42 and
#     supervise.py retries rc=1 like any crash.
# Every step tees into logs_r5/ (tracked), drops a .sentinels/r5_*
# sentinel on success, and harvests run metadata immediately (VERDICT r4
# task 7: evidence durable as it lands).
set -x
set -o pipefail
cd "$(dirname "$0")/.."
export DFVOD_JAX_CACHE="$PWD/.jax_cache"
mkdir -p logs_r5 output .sentinels

# wait for the TPU tunnel (hung-RPC episodes recover on their own)
for i in $(seq 1 60); do
  if timeout 120 python -c "import jax,jax.numpy as jnp; print(jax.devices()); print(float(jnp.sum(jnp.ones((8,)))))"; then
    break
  fi
  echo "tunnel check $i failed; retrying in 60s"; sleep 60
  [ "$i" = 60 ] && exit 1
done

# idempotent dataset materialization (images/ are symlinks into the
# reference sample and die with host swaps; annotations are tracked)
python tools/oid_hands_labels.py 2>&1 | tee logs_r5/datasets.log
python tools/make_oid_joint.py   2>&1 | tee -a logs_r5/datasets.log

step() { # step <name> <deadline_s> <cmd...>
  local name=$1 deadline=$2; shift 2
  if [ -f ".sentinels/r5_$name" ]; then echo "skip $name (sentinel)"; return 0; fi
  if python scripts/supervise.py --stall 900 --deadline "$deadline" -- \
      "$@" 2>&1 | tee "logs_r5/$name.log"; then
    touch ".sentinels/r5_$name"
    bash scripts/harvest_artifacts.sh logs_r5/artifacts || true
  else
    echo "STEP FAILED: $name" | tee -a "logs_r5/$name.log"
    return 1
  fi
}

# ---- seed 42: the headline run (45 epochs; round-3's 20-image run was
# still improving late, so watch best_meta.json and extend if needed) ----
step oid_joint_s42 9000 \
  env EPOCHS=45 EXP_DIR=output/oid_joint/ \
  bash configs/training/OID_Joint.sh --auto_resume

step oid_joint_s42_eval 1500 \
  python scripts/eval_oid_report.py --resume output/oid_joint/best

step oid_overlays 1500 \
  python scripts/demo_oid.py --out output/oid_overlays \
    --resume output/oid_joint/best --num_images 27 --keep_prob 0.3

# ---- seed repeats (spread estimate) ----
for SEED in 7 1234; do
  step oid_joint_s${SEED} 6000 \
    env EPOCHS=25 EXP_DIR=output/oid_joint_s${SEED}/ \
    bash configs/training/OID_Joint.sh --seed ${SEED} --auto_resume
  step oid_joint_s${SEED}_eval 1500 \
    python scripts/eval_oid_report.py --resume output/oid_joint_s${SEED}/best
done

# ---- RGB-only ablation (explicit USE_DEPTH=off contract) ----
step oid_joint_baseline 6000 \
  env EPOCHS=25 FUSION=Baseline USE_DEPTH=off EXP_DIR=output/oid_joint_baseline/ \
  bash configs/training/OID_Joint.sh --auto_resume
step oid_joint_baseline_eval 1500 \
  python scripts/eval_oid_report.py --resume output/oid_joint_baseline/best \
    --fusion_type Baseline

echo QUEUE_R5A_DONE
