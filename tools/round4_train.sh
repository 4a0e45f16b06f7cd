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

train () { python -m pseudocylindrical_convolution_tpu.train.loop $COMMON "$@"; }

# point <run-dir> <prefix> <fallback-init> <install-path> <args...>
point () {
    local D=$1 P=$2 FB=$3 OUT=$4; shift 4
    if [ ! -f $D/.done ]; then
        if [ -f $D/${P}_trainstate.pkl ]; then
            train --resume $D/${P}_trainstate.pkl --epochs 2 "$@" --save-dir $D
        else
            # 4 epochs: same-vd finetunes (shapes match) converge in 3-4
            # epochs in every round-3 run; 6 was headroom we can't afford
            # with 12 points in one session
            train --resume $FB --epochs 4 "$@" --save-dir $D
        fi
        touch $D/.done
    fi
    mkdir -p "$(dirname $OUT)"
    cp $D/${P}_best_0.pkl $OUT
    echo "=== installed $OUT ==="
}

# MSE finetunes (lr default 1e-4: same recipe that converged for 2_56/9_192)
point demo/train_run_3_56  ent_opt_192_56_16  demo/mse/2_56.pkl  demo/mse/3_56.pkl  --valid-dim 56  --alpha 1
point demo/train_run_4_112 ent_opt_192_112_16 demo/mse/5_112.pkl demo/mse/4_112.pkl --valid-dim 112 --alpha 3
point demo/train_run_8_192 ent_opt_192_192_16 demo/mse/9_192.pkl demo/mse/8_192.pkl --valid-dim 192 --alpha 3
# SSIM finetunes (lr 1e-5: RD_EVIDENCE.md post-mortem)
point demo/train_run_ssim8_192 ent_opt_192_192_16 demo/mse/9_192.pkl demo/ssim/8_192.pkl \
    --valid-dim 192 --alpha 2 --beta 10 --gamma 0 --lr 1e-5
point demo/train_run_ssim1_56  ent_opt_192_56_16  demo/mse/1_56.pkl  demo/ssim/1_56.pkl \
    --valid-dim 56 --alpha 3 --beta 10 --gamma 0 --lr 1e-5
point demo/train_run_6_112 ent_opt_192_112_16 demo/mse/5_112.pkl demo/mse/6_112.pkl --valid-dim 112 --alpha 2
point demo/train_run_7_112 ent_opt_192_112_16 demo/mse/6_112.pkl demo/mse/7_112.pkl --valid-dim 112 --alpha 1
point demo/train_run_ssim2_56 ent_opt_192_56_16 demo/mse/2_56.pkl demo/ssim/2_56.pkl \
    --valid-dim 56 --alpha 2 --beta 10 --gamma 0 --lr 1e-5

# RD tables move to round4b_train.sh (run once over the complete registry)
echo "=== ROUND-4 MARATHON DONE ==="
