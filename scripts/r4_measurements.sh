#!/bin/bash
# Round-4 measurement chain (single chip — runs must be serial):
#  1. network+split ablation groups at 1024^2 (VERDICT r3 #6)
#  2. network group 2048^2 spot-check (1 scene)
#  3. flagship encode+decode scale rows (VERDICT r3 #3)
set -x
cd /root/repo
python scripts/ablations.py --size 1024 --scenes 2 --k-min 1 --k-max 6 \
    --groups network split --out validation/ablations_1024 \
    > /tmp/abl1024.out 2>/tmp/abl1024.err
echo "ablations_1024 exit=$?"
python scripts/ablations.py --size 2048 --scenes 1 --k-min 1 --k-max 6 \
    --groups network --out validation/ablations_2048 \
    > /tmp/abl2048.out 2>/tmp/abl2048.err
echo "ablations_2048 exit=$?"
python scripts/scale_check.py --flagship --K 5 \
    > /tmp/flagship.out 2>/tmp/flagship.err
echo "flagship exit=$?"
