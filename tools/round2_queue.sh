#!/bin/bash
# Sequential TPU run queue (ONE TPU process at a time): the conv-decoder
# Montserrat convergence run, then the leaky-clamp HC rerun.
cd /root/repo
python tools/run_montserrat_conv.py 1000 1e-3 > extended_runs/montserrat_conv.log 2>&1
python tools/run_montserrat_hc.py 400 5e-4 > extended_runs/montserrat_hc.log 2>&1
echo "queue done" > extended_runs/queue_done.marker
