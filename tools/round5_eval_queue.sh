#!/bin/bash
# Round-5 serialized TPU evaluation queue (one TPU process at a time).
# Run AFTER the sigma=1.0 400-epoch training finished and its checkpoint was
# snapshotted to sigma_variants/s1.0_e400_bestg.msgpack.
# Stages:
#   1. sigma=1.0 e400 evals (test split): truncated t*=499, DDIM K=1
#   2. sigma=0.1 conditional training (150 ep)  [checkpoint guard will move
#      the sigma=1.0 bestg aside; we snapshotted it first]
#   3. sigma=0.1 evals (full cell): truncated t*=29, DDIM K=1
#   4. uncond sigma=0.1 training (150 ep, linear)
#   5. DDRM evals: t*=27 test split; full-cell cold-CLI timing x2 with
#      HICDIFF_SETUP_TIMING=1 (ask-5 measurement)
# Each stage logs to _work/logs/r5_*.log; the queue aborts on first failure.
set -e
cd "$(dirname "$0")/.."
ROOT=_work/fullscale
SV=$ROOT/Model_Weights/sigma_variants
LOG=_work/logs
mkdir -p $SV $LOG

run() { echo "=== $(date -u +%H:%M:%S) $1"; shift; timeout 5400 "$@"; }

# ---- stage 1: sigma=1.0 e400 quality (test split)
run "s1.0 e400 truncated t*=499" \
  python inference.py -u 0 -s 1.0 -b 64 --schedule sigmoid --t-start auto \
  --bf16 --chro test --root $ROOT --weights $SV/s1.0_e400_bestg.msgpack \
  --no-metrics --out-tag _e400 > $LOG/r5_s1_e400_trunc.log 2>&1
run "s1.0 e400 DDIM K=1" \
  python inference.py -u 0 -s 1.0 -b 64 --schedule sigmoid --t-start auto \
  --sampling-steps 1 --bf16 --chro test --root $ROOT \
  --weights $SV/s1.0_e400_bestg.msgpack --no-metrics --out-tag _e400_k1 \
  > $LOG/r5_s1_e400_k1.log 2>&1
run "s1.0 e150 truncated t*=499 (budget comparison)" \
  python inference.py -u 0 -s 1.0 -b 64 --schedule sigmoid --t-start auto \
  --bf16 --chro test --root $ROOT --weights $SV/s1.0_e150_bestg.msgpack \
  --no-metrics --out-tag _e150 > $LOG/r5_s1_e150_trunc.log 2>&1

# ---- stage 2: sigma=0.1 conditional training
run "train cond sigma=0.1 150ep" \
  python train.py -u 0 -b 64 -e 150 -s 0.1 --schedule sigmoid \
  --timestep 1000 --bf16 --ema-decay 0.999 --ckpt-throttle 300 \
  --root $ROOT > $LOG/r5_train_s01.log 2>&1
cp $ROOT/Model_Weights/bestg_40000_c64_s64_Human1_HiCedrn_cond_l2_sig.msgpack \
   $SV/s0.1_e150_bestg.msgpack

# ---- stage 3: sigma=0.1 quality (full cell)
run "s0.1 truncated t*=29 full cell" \
  python inference.py -u 0 -s 0.1 -b 64 --schedule sigmoid --t-start auto \
  --bf16 --chro all --root $ROOT --no-metrics --out-tag _r5 \
  > $LOG/r5_s01_trunc.log 2>&1
run "s0.1 DDIM K=1 full cell" \
  python inference.py -u 0 -s 0.1 -b 64 --schedule sigmoid --t-start auto \
  --sampling-steps 1 --bf16 --chro all --root $ROOT --no-metrics \
  --out-tag _r5_k1 > $LOG/r5_s01_k1.log 2>&1

# ---- stage 4: uncond sigma=0.1 training (linear, the reference uncond config)
run "train uncond sigma=0.1 150ep" \
  python train.py -u 1 -b 64 -e 150 -s 0.1 --schedule linear \
  --timestep 1000 --bf16 --ema-decay 0.999 --ckpt-throttle 300 \
  --root $ROOT > $LOG/r5_train_uncond.log 2>&1

# ---- stage 5: DDRM evals + ask-5 cold-CLI timing
run "ddrm t*=27 test split" \
  python inference.py -u 1 -s 0.1 -b 64 --schedule linear --t-start auto \
  --bf16 --chro test --root $ROOT --no-metrics --out-tag _r5 \
  > $LOG/r5_ddrm_trunc.log 2>&1
HICDIFF_SETUP_TIMING=1 run "ddrm full-cell cold timing run 1" \
  python inference.py -u 1 -s 0.1 -b 64 --schedule linear --t-start auto \
  --bf16 --chro all --root $ROOT --no-metrics --out-tag _r5_cold1 \
  > $LOG/r5_ddrm_cold1.log 2>&1
HICDIFF_SETUP_TIMING=1 run "ddrm full-cell cold timing run 2" \
  python inference.py -u 1 -s 0.1 -b 64 --schedule linear --t-start auto \
  --bf16 --chro all --root $ROOT --no-metrics --out-tag _r5_cold2 \
  > $LOG/r5_ddrm_cold2.log 2>&1

echo "=== queue done $(date -u +%H:%M:%S)"
