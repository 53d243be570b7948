#!/bin/bash
# Round-3 TPU queue (one TPU process at a time, serialized here).
# 1. bench.py sanity run (bench changed this round: embedded-config load +
#    fast_train_steps_per_sec — the driver artifact must not crash).
# 2. FiraCode conv_ps wide rerun to convergence WITH checkpoints: the
#    round-2 run died at epoch 245/300 to a hung device call and had no
#    checkpoint dir; this closes RESULTS.md's dangling row.
cd /root/repo
python bench.py > extended_runs/bench_r3_check.log 2>&1
mkdir -p extended_runs/firacode_convps_wide_r3
(cd /tmp && python /root/repo/model.py --train --epochs 300 --decoder conv_ps \
    --decoder-channels 256,256,128,64,32 \
    --schedule cosine --leaky-clamp 0.01 \
    --checkpoint-dir /root/repo/extended_runs/firacode_convps_wide_r3/ckpt \
    --output /root/repo/extended_runs/firacode_convps_wide_r3 \
    --weights /root/repo/extended_runs/firacode_convps_wide_r3/weights.npz) \
    > extended_runs/firacode_convps_wide_r3.log 2>&1
echo done > extended_runs/round3_queue_done.marker
