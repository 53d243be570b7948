"""Round-4 task-5 micro-session: remat A/B + profiler-trace attribution.

One python process = one TPU claim (back-to-back processes can serialize
behind a stale grant; measured this round, see CLAUDE.md). Runs:
  1. ab_profiles timing for fast_handrolled vs the two remat_frontend
     policies (TrainConfig.remat_frontend, VERDICT r3 #5's non-kernel lever);
  2. a jax.profiler trace of fast_handrolled (+ best remat variant), with
     device busy/idle attribution parsed from the xplane proto.
"""

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys

import ab_profiles
import trace_step


def main() -> None:
    sys.argv = ["ab_profiles", "fast_handrolled", "fast_hr_rematdots", "fast_hr_rematfull"]
    ab_profiles.main()
    for nm in ("fast_handrolled", "fast_hr_rematdots"):
        print(json.dumps(trace_step.run_profile(nm)), flush=True)


if __name__ == "__main__":
    main()
