#!/bin/bash
# Waits for the conv_ps continuation (PID $1) to exit, then runs the wide
# conv_ps capacity probe. One TPU process at a time.
cd /root/repo
while kill -0 "$1" 2>/dev/null; do sleep 60; done
python tools/run_montserrat_conv.py 400 1e-3 conv_ps --wide > extended_runs/montserrat_conv_ps_wide.log 2>&1
echo done > extended_runs/queue3_done.marker
