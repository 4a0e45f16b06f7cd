#!/bin/bash
# Round-5 session-3 work queue, after the FOURTH machine reset wiped /tmp
# (dataset, stage markers, trainstates). Git-tracked state survived:
# registry = mse/{1_56,2_56,5_112,9_192,10_192} + ssim/9_192, all MSE cores
# inside the good band (<=3e-4), ssim/9_192 at 0.0645 (target <=0.03).
#
# Stage order (VERDICT r4 priorities; each stage marker-gated, anytime):
#   [D] dataset rebuild (CPU-cheap, required by everything below)
#   [B] bench cache warm — secures the driver's end-of-round BENCH even if
#       the tunnel dies later
#   [F] fixed-kernel pallas/fused A/B at 512x1024 (VERDICT item 3); results
#       committed as an artifact so a reset can't lose the measurement again
#   [L] the 13 missing registry slots (round4_train.sh + round4b_train.sh,
#       now incl. ssim/5_112) — VERDICT missing #1
#   [S] ssim/9_192 quality top-up, params-only reseed (trainstate wiped)
#   [R] RD --decode tables over the installed registry (VERDICT missing #2)
#   [H] high-res window/chunk A/B (VERDICT item 4)
#   [W] final bench warm
#
# Steering: touch /tmp/.skip_F (etc.) to skip a stage; /tmp/r3_stop stops
# the ladder scripts at their next edge and this chain at stage edges.
#
#   setsid nohup bash tools/r5_chain.sh >>/tmp/r5_chain.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."

stop_check () { [ -f /tmp/r3_stop ] && { echo "=== r3_stop: chain stopping ($(date -u)) ==="; exit 0; }; return 0; }

# ---- [D] dataset -------------------------------------------------------------
DATA=/tmp/synth360
if [ ! -f $DATA/train_val.dic ]; then
    echo "=== [D] dataset rebuild ($(date -u)) ==="
    JAX_PLATFORMS=cpu python tools/make_synth_dataset.py --out $DATA --n-train 256 --n-test 16 \
        || { echo "FATAL: dataset rebuild failed"; exit 1; }
fi
head -128 $DATA/train.txt > $DATA/train128.txt
stop_check

# ---- [B] bench cache warm ------------------------------------------------------
if [ ! -f /tmp/.bench_warm_done ] && [ ! -f /tmp/.skip_B ]; then
    echo "=== [B] bench cache warm ($(date -u)) ==="
    BENCH_HIGHRES_BUDGET=1200 timeout 7200 python bench.py \
        && touch /tmp/.bench_warm_done \
        || echo "bench warm failed/timed out rc=$? (continuing)"
fi
stop_check

# ---- [F] fixed-kernel pallas/fused A/B at 512x1024 ---------------------------
# Round-4's A/B ran PRE-fix kernels (Mosaic i1-relayout failures); both
# round-5 fixes (f32 multiply-masks, commits 783ba6b + 8a1bf63) are
# CPU-verified but never compiled on real TPU. Measure gather (shipped
# default) vs pallas window vs the fused VMEM step kernel; the result is
# committed so the third lost-measurement can't happen.
if [ ! -f /tmp/.r5_pallas_ab_done ] && [ ! -f /tmp/.skip_F ]; then
    echo "=== [F] pallas/fused A/B ($(date -u)) ==="
    timeout 8000 python tools/prof_scan_manual.py --hw 512 1024 --iters 3 \
        --configs gather:4:256 pallas:4:256 fused:4:256 fused:1:256 fusedu:4:256 \
        > /tmp/r5_pallas_ab.log 2>&1 \
        && touch /tmp/.r5_pallas_ab_done \
        || echo "pallas A/B failed/timed out rc=$? (continuing)"
    tail -40 /tmp/r5_pallas_ab.log
    mkdir -p demo/ab
    cp /tmp/r5_pallas_ab.log demo/ab/r5_pallas_ab_512.log
    git add -f demo/ab/r5_pallas_ab_512.log \
        && git commit -q -m "On-chip A/B artifact: window modes at 512x1024 (fixed Pallas kernels)" \
               -- demo/ab/r5_pallas_ab_512.log || true
fi
stop_check

# ---- [L] registry ladder: the 13 missing slots --------------------------------
if [ ! -f /tmp/.skip_L ]; then
    echo "=== [L] round4_train.sh ($(date -u)) ==="
    bash tools/round4_train.sh >>/tmp/r4_train.log 2>&1 \
        || echo "round4_train.sh exited rc=$? (continuing)"
    tail -5 /tmp/r4_train.log
    stop_check
    echo "=== [L] round4b_train.sh ($(date -u)) ==="
    bash tools/round4b_train.sh >>/tmp/r4b_train.log 2>&1 \
        || echo "round4b_train.sh exited rc=$? (continuing)"
    tail -5 /tmp/r4b_train.log
fi
stop_check

# ---- [S] ssim/9_192 quality top-up (params-only reseed) -----------------------
# The r4_followup topup required a live trainstate; this machine has none.
# Reseed from the INSTALLED checkpoint (fresh Adam at lr 1e-5 is the same
# gentle recipe every converged SSIM finetune used), 4-epoch segments,
# gated on the committed .tloss.
COMMON="--img-dir $DATA --train-list $DATA/train128.txt --test-list $DATA/test.txt \
        --difficulty-dict $DATA/train_val.dic --batch-size 2 --acc-batch 2 \
        --test-batch-size 2"
if [ ! -f /tmp/.skip_S ]; then
    OUT=demo/ssim/9_192.pkl; D=demo/train_run_ssim192; P=ent_opt_192_192_16
    for k in 1 2; do
        stop_check
        CUR=$(cat ${OUT%.pkl}.tloss)
        python -c "import sys; sys.exit(0 if float('$CUR') <= 0.03 else 1)" \
            && { echo "=== [S] $OUT at $CUR <= 0.03; done ==="; break; }
        echo "=== [S] ssim topup segment $k (cur $CUR) ($(date -u)) ==="
        if [ -f $D/${P}_trainstate.pkl ]; then
            python -m pseudocylindrical_convolution_tpu.train.loop $COMMON \
                --resume $D/${P}_trainstate.pkl --epochs 4 \
                --valid-dim 192 --alpha 1 --beta 10 --gamma 0 --lr 1e-5 --save-dir $D
        else
            python -m pseudocylindrical_convolution_tpu.train.loop $COMMON \
                --resume $OUT --epochs 4 \
                --valid-dim 192 --alpha 1 --beta 10 --gamma 0 --lr 1e-5 --save-dir $D
        fi || { echo "=== [S] train failed rc=$?; continuing ==="; break; }
        SJ=$D/${P}_saver.json
        [ -f $SJ ] || break
        TL=$(python -c "import json; print(json.load(open('$SJ'))[0])")
        if python -c "import sys; sys.exit(0 if float('$TL') < float('$CUR') else 1)"; then
            cp $D/${P}_best_0.pkl $OUT
            echo "$TL" > ${OUT%.pkl}.tloss
            git add -f "$OUT" "${OUT%.pkl}.tloss" \
                && git commit -q -m "Registry top-up: $OUT (tloss $TL)" \
                       -- "$OUT" "${OUT%.pkl}.tloss"
            echo "=== [S] committed $OUT (tloss $TL) ==="
        fi
    done
fi
stop_check

# ---- [R] RD tables over the installed registry --------------------------------
if [ ! -f /tmp/.r5_rd_done ] && [ ! -f /tmp/.skip_R ]; then
    echo "=== [R] rd_curve --decode ($(date -u)) ==="
    ls $DATA/test_*.npy | head -6 > /tmp/r5_eval_list.txt
    mkdir -p demo/ab
    timeout 14400 python tools/rd_curve.py --img-file /tmp/r5_eval_list.txt --decode \
        > demo/ab/r5_rd_mse.txt 2>&1 \
        || echo "rd_curve mse rc=$? (partial table kept)"
    stop_check
    timeout 10800 python tools/rd_curve.py --img-file /tmp/r5_eval_list.txt --ssim --decode \
        > demo/ab/r5_rd_ssim.txt 2>&1 \
        || echo "rd_curve ssim rc=$? (partial table kept)"
    git add -f demo/ab/r5_rd_mse.txt demo/ab/r5_rd_ssim.txt \
        && git commit -q -m "RD --decode tables over the rebuilt registry" \
               -- demo/ab/r5_rd_mse.txt demo/ab/r5_rd_ssim.txt || true
    touch /tmp/.r5_rd_done
    tail -15 demo/ab/r5_rd_mse.txt
fi
stop_check

# ---- [H] high-res A/B ----------------------------------------------------------
if [ ! -f /tmp/.r4_highres_ab_done ] && [ ! -f /tmp/.skip_H ]; then
    echo "=== [H] high-res A/B ($(date -u)) ==="
    timeout 9000 python tools/prof_scan_manual.py --hw 2048 4096 --iters 2 \
        --configs gather:4:256 gather:8:256 fused:4:256 fused:8:256 \
        > /tmp/r4_highres_ab.log 2>&1 \
        && touch /tmp/.r4_highres_ab_done \
        || echo "high-res A/B rc=$? (continuing)"
    tail -15 /tmp/r4_highres_ab.log
    cp /tmp/r4_highres_ab.log demo/ab/r5_highres_ab.log 2>/dev/null
    git add -f demo/ab/r5_highres_ab.log \
        && git commit -q -m "On-chip A/B artifact: window/chunk modes at 2048x4096" \
               -- demo/ab/r5_highres_ab.log || true
fi
stop_check

# ---- [W] final bench warm ------------------------------------------------------
echo "=== [W] final bench warm ($(date -u)) ==="
BENCH_HIGHRES_BUDGET=2400 timeout 7200 python bench.py 2>&1 | tail -5

echo "=== R5 CHAIN DONE ($(date -u)) ==="
