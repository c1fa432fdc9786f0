"""Two-process ``jax.distributed`` smoke — the multi-host (DCN) path.

SURVEY §2.5 lists ``initialize_distributed`` as the "DCN only if ever
multi-host" hook; VERDICT r3 item 5 asked for an executed 2-process proof
that it initializes and communicates rather than a single-process no-op.
The worker (scripts/dcn_smoke.py) joins through the production entry
point, builds the framework's own data mesh over the global device view
and runs one jitted cross-process sum (gloo collectives, CPU backend).

Subprocess-based because jax.distributed can only initialize once per
process — it must not contaminate the in-process test runtime.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE = os.path.join(REPO, "scripts", "dcn_smoke.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_mesh_sums_across_dcn():
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # 1 local device per process
    procs = [
        subprocess.Popen(
            [sys.executable, SMOKE,
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(i)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} rc={p.returncode}:\n{out}"
        assert f"DCN_SMOKE_OK pid={i} sum=3.0" in out, out
