"""Multi-HOST serving: two real jax.distributed processes on CPU.

Validates the full multi-node stack (parallel/distributed.py): global runtime
formation, a mesh spanning both processes (the between-process axis is the
DCN analog), engine construction with cross-process shardings, the
controller-broadcast request stream, and identical outputs on every host —
the reference's multi-node CI runs the same single-node scripts under
mpirun (tests/multinode_helpers/mpi_wrapper1.sh).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys, json
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

rank = int(sys.argv[1])
port = sys.argv[2]
bport = int(sys.argv[3])

from flexflow_tpu.parallel.distributed import (
    RequestBroadcaster, init_distributed, is_controller, serve_distributed,
)

init_distributed(f"127.0.0.1:{port}", 2, rank)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

import jax.numpy as jnp
import numpy as np
from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.parallel import make_mesh
from flexflow_tpu.serving import GenerationConfig, InferenceEngine, RequestManager

spec = specs.ModelSpec(
    arch="LlamaForCausalLM", vocab_size=128, hidden_size=32, num_layers=2,
    num_heads=4, num_kv_heads=4, head_dim=8, intermediate_size=64,
    max_position_embeddings=128, norm_eps=1e-6,
)
# identical on every process: same seed, generated on the global mesh is not
# needed — init on host then shard (values identical per process)
params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.float32)
# data axis spans the two processes (the DCN analog); model axis within
mesh = make_mesh(data=2, model=4)
engine = InferenceEngine(spec, params, max_requests_per_batch=4,
                         max_seq_len=64, cache_dtype=jnp.float32, mesh=mesh)
rm = RequestManager(engine, seed=0)

bc = RequestBroadcaster(port=bport)
rng = np.random.RandomState(0)
prompts = [rng.randint(1, 128, size=6).tolist() for _ in range(3)]
cfg = GenerationConfig(max_new_tokens=12)
reqs = serve_distributed(
    rm, bc, prompts if is_controller() else None,
    cfg if is_controller() else None,
)
print("TOKENS", json.dumps([r.output_tokens for r in reqs]), flush=True)
bc.close()
"""


def _free_port():
    s = socket.socket()
    s.bind(("", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_distributed_serving(tmp_path):
    port, bport = _free_port(), _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo" + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(r), str(port), str(bport)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd="/root/repo",
        )
        for r in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    toks = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("TOKENS ")]
        assert lines, out[-3000:]
        toks.append(lines[-1])
    # identical outputs on controller and follower
    assert toks[0] == toks[1]
    import json as _json

    parsed = _json.loads(toks[0].split(" ", 1)[1])
    assert len(parsed) == 3 and all(len(t) == 12 for t in parsed)
