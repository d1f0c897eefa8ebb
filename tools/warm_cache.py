"""Pre-compile every TPU program bench.py uses into the persistent
compile cache (.jax_cache/), so the driver's bench run never pays a
cold tunnel compile (round-3 lesson: one un-warm compile ate the whole
bench budget).

Implementation: run the bench itself in --warm mode (generous alarms);
identical call sites guarantee identical cache keys.  Run alone — one
process per TPU.
"""

import os
import subprocess
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
rc = subprocess.call(
    [sys.executable, os.path.join(repo, "bench.py"), "--warm"], cwd=repo
)
sys.exit(rc)
