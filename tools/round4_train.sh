#!/bin/bash
# Round-4 registry filler: the remaining rate points. Every slot uses a
# valid_dim already trained ({56, 112, 192}, cli.py channel lists), so each
# point is a ~6-epoch same-vd finetune at a different alpha/beta -- no
# entropy-init phase needed (shapes match).
#
# Installed by rounds 2-3: mse/{1_56, 2_56, 5_112, 9_192, 10_192},
# ssim/{5_112, 9_192}. This script fills, in priority order (one curve
# point per vd/alpha first, then densification):
#
#   mse/3_56    (alpha=1,  from mse/2_56)     model-idx 2
#   mse/4_112   (alpha=3,  from mse/5_112)    model-idx 3
#   mse/8_192   (alpha=3,  from mse/9_192)    model-idx 7
#   ssim/8_192  (beta=10 alpha=2, from mse/9_192)   ssim-idx 7
#   ssim/1_56   (beta=10 alpha=3, from mse/1_56)    ssim-idx 0
#   mse/6_112   (alpha=2 restage, from mse/5_112)   model-idx 5
#   mse/7_112   (alpha=1,  from mse/6_112)    model-idx 6
#   ssim/2_56   (beta=10 alpha=2, from mse/2_56)    ssim-idx 1
#
# Run from the repo root, one process at a time on the TPU tunnel:
#   bash tools/round4_train.sh >/tmp/r4_train.log 2>&1 &
set -e
cd "$(dirname "$0")/.."

DATA=/tmp/synth360
[ -d $DATA ] || python tools/make_synth_dataset.py --out $DATA --n-train 256 --n-test 16
head -128 $DATA/train.txt > $DATA/train128.txt

COMMON="--img-dir $DATA --train-list $DATA/train128.txt --test-list $DATA/test.txt \
        --difficulty-dict $DATA/train_val.dic --batch-size 2 --acc-batch 2 \
        --test-batch-size 2"

train () {
    # up to 3 attempts: the axon remote-compile path throws transient HTTP
    # errors ("response body closed before all bytes were read") that
    # previously killed the whole marathon via set -e; a genuine failure
    # just fails fast three times.  Resume flags make retries cheap (the
    # trainstate from the last finished epoch is picked up).
    local a
    for a in 1 2 3; do
        [ -f /tmp/r3_stop ] && { echo "=== /tmp/r3_stop present; marathon stopping ==="; exit 0; }
        python -m pseudocylindrical_convolution_tpu.train.loop $COMMON "$@" && return 0
        echo "=== train attempt $a failed (rc=$?); retrying in 60s ==="
        sleep 60
    done
    return 1
}

# point <run-dir> <prefix> <fallback-init> <install-path> <args...>
#
# POST-MORTEM (round 3, session 3): 4-epoch finetunes install RD-DEGRADED
# points. Epoch 1 is the only E/D-phase epoch (loop.py: epoch % 4 == 1)
# and a FRESH Adam at lr 1e-4 kicks the converged encoder/decoder off its
# minimum (3_56 landed at MSE 0.00343 @ 0.250bpp vs source 2_56 at
# 0.00138 @ 0.248bpp, tloss +2.1e-3); entropy-only epochs 2..4 cannot
# repair distortion. 6 epochs gives E/D a recovery epoch at 5 -- the
# recipe every converged extras run (2_56, 9_192) actually used. Gate the
# install on the final anchor-relative tloss (good points sit in
# [-3e-4, +9e-5]) so a diverged run never reaches the registry.
point () {
    local D=$1 P=$2 FB=$3 OUT=$4; shift 4
    if [ -f $OUT ]; then
        echo "=== $OUT already installed; skipping ==="
        return 0
    fi
    [ -f $FB ] || { echo "=== $OUT: init ckpt $FB missing; skip ==="; return 0; }
    if [ ! -f $D/.done ]; then
        if [ -f $D/${P}_trainstate.pkl ]; then
            # warm Adam moments: the resumed E/D epoch is gentle
            train --resume $D/${P}_trainstate.pkl --epochs 3 "$@" --save-dir $D \
                || { echo "=== $OUT: training failed 3x; point skipped ==="; return 0; }
        else
            train --resume $FB --epochs 6 "$@" --save-dir $D \
                || { echo "=== $OUT: training failed 3x; point skipped ==="; return 0; }
        fi
        touch $D/.done
    fi
    # GATE is family-scaled: MSE tloss is in [0,1]-MSE units (good points
    # sit in [-3e-4, +9e-5]); SSIM tloss is in SSIM units (installed
    # synthetic-set points sit at +0.02..0.04 below the anchor).
    local TL=$(grep "^tloss" $D/${P}_log.txt | awk '{print $2}' | grep -iv nan | sort -g | head -1)
    if ! python -c "import sys; sys.exit(0 if float('$TL') < ${GATE:-3e-4} else 1)"; then
        echo "=== $OUT: tloss $TL above gate ${GATE:-3e-4}; NOT installed ==="
        return 0
    fi
    mkdir -p "$(dirname $OUT)"
    cp $D/${P}_best_0.pkl $OUT
    # commit the install immediately (machine-reset lesson: an uncommitted
    # registry can be zeroed by a driver restart; pathspec-limited so no
    # unrelated staged work is swept in)
    git add -f "$OUT" && git commit -q -m "Registry: $OUT (finetune, tloss $TL)" -- "$OUT"
    echo "=== installed+committed $OUT (tloss $TL) ==="
}

# MSE finetunes (lr default 1e-4: same recipe that converged for 2_56/9_192)
point demo/train_run_3_56  ent_opt_192_56_16  demo/mse/2_56.pkl  demo/mse/3_56.pkl  --valid-dim 56  --alpha 1
point demo/train_run_4_112 ent_opt_192_112_16 demo/mse/5_112.pkl demo/mse/4_112.pkl --valid-dim 112 --alpha 3
# cheap points first (vd56/vd112 epochs run ~3x faster than vd192's
# ~14-min epochs -- final-session breadth reorder; 8_192/ssim8_192 moved
# to the end so a session cut cannot strand the whole tail behind them)
# SSIM finetunes (lr 1e-5: RD_EVIDENCE.md post-mortem); SSIM-units gate
GATE=0.05
point demo/train_run_ssim1_56  ent_opt_192_56_16  demo/mse/1_56.pkl  demo/ssim/1_56.pkl \
    --valid-dim 56 --alpha 3 --beta 10 --gamma 0 --lr 1e-5
GATE=3e-4
point demo/train_run_6_112 ent_opt_192_112_16 demo/mse/5_112.pkl demo/mse/6_112.pkl --valid-dim 112 --alpha 2
point demo/train_run_7_112 ent_opt_192_112_16 demo/mse/6_112.pkl demo/mse/7_112.pkl --valid-dim 112 --alpha 1
GATE=0.05
point demo/train_run_ssim2_56 ent_opt_192_56_16 demo/mse/2_56.pkl demo/ssim/2_56.pkl \
    --valid-dim 56 --alpha 2 --beta 10 --gamma 0 --lr 1e-5
GATE=3e-4
point demo/train_run_8_192 ent_opt_192_192_16 demo/mse/9_192.pkl demo/mse/8_192.pkl --valid-dim 192 --alpha 3
GATE=0.05
point demo/train_run_ssim8_192 ent_opt_192_192_16 demo/mse/9_192.pkl demo/ssim/8_192.pkl \
    --valid-dim 192 --alpha 2 --beta 10 --gamma 0 --lr 1e-5

# RD tables move to round4b_train.sh (run once over the complete registry)
echo "=== ROUND-4 MARATHON DONE ==="
