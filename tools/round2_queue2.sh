#!/bin/bash
# Follow-on TPU queue: waits for round2_queue.sh to finish, then runs the
# measurement batch (one TPU process at a time throughout).
cd /root/repo
while [ ! -f extended_runs/queue_done.marker ]; do sleep 60; done
python tools/ab_profiles.py fast cotangent   > extended_runs/ab_cotangent.log 2>&1
python tools/ab_profiles.py conv conv_ps     > extended_runs/ab_convps.log 2>&1
python tools/bench_serve.py 8 20 64          > extended_runs/bench_serve_tpu.log 2>&1
python tools/render_implicit_demo.py 2000    > extended_runs/implicit_demo.log 2>&1
# Montserrat conv_ps: epoch-time + quality vs the resize conv variant.
python tools/run_montserrat_conv.py 400 1e-3 conv_ps > extended_runs/montserrat_conv_ps.log 2>&1
# Bounded FiraCode conv_ps run: params/quality tradeoff on monospace.
mkdir -p extended_runs/firacode_convps
(cd /tmp && python /root/repo/model.py --train --epochs 150 --decoder conv_ps \
    --schedule cosine --leaky-clamp 0.01 \
    --output /root/repo/extended_runs/firacode_convps \
    --weights /root/repo/extended_runs/firacode_convps/weights.npz) \
    > extended_runs/firacode_convps.log 2>&1
echo done > extended_runs/queue2_done.marker
