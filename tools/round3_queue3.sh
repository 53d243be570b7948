#!/bin/bash
# Round-3 queue 3: runs after queue2. Verifies the driver's exact
# multichip path under the REAL axon environment (VERDICT r2 item 1:
# parent initializes the TPU, then dryrun_multichip(8) must
# self-provision a clean 8-device CPU child and complete).
cd /root/repo
while [ ! -f extended_runs/round3_queue2_done.marker ]; do sleep 60; done
python - > extended_runs/dryrun_axon_verify.log 2>&1 <<'EOF'
import jax
print("parent platform:", jax.devices()[0].platform, "n =", len(jax.devices()))
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn)(*args)
print("entry ok:", out.shape)
g.dryrun_multichip(8)
print("REAL-ENV DRYRUN OK")
EOF
echo done > extended_runs/round3_queue3_done.marker
