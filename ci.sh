#!/usr/bin/env bash
# Single-entrypoint CI: full test suite + graft-entry compile checks + a bench
# smoke — all on a virtual 8-device CPU mesh (no TPU needed). Mirrors the
# reference's gpu-ci.yml pipeline stages (python interface -> alignment ->
# inference -> training) collapsed into the pytest suite (SURVEY.md §4).
set -euo pipefail
cd "$(dirname "$0")"

# Lanes (reference gpu-ci.yml splits stages; the driver's CI budget is a few
# minutes): default = fast lane (critical-path tests, <5 min); "full" runs
# everything.
LANE="${1:-fast}"

if [ "$LANE" = "fast" ]; then
  echo "== FAST lane: critical-path tests (run './ci.sh full' for all) =="
  python -m pytest -x -q \
    tests/test_serving.py tests/test_speculative.py \
    tests/test_hf_alignment.py tests/test_pp_serving.py \
    tests/test_quant.py tests/test_training.py
else
  echo "== FULL lane: entire suite (CPU, 8 virtual devices) =="
  python -m pytest tests/ -x -q
fi

echo "== graft entry: single-chip forward compile check =="
JAX_PLATFORMS=cpu python -c "
import __graft_entry__ as g
import jax
fn, args = g.entry()
jax.jit(fn).lower(*args).compile()
print('entry() compiles OK')
"

echo "== graft entry: 8-device SPMD dry run =="
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python -c "
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun_multichip(8) OK')
"

echo "== bench smoke (tiny config, CPU) =="
python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.serving import GenerationConfig, InferenceEngine, RequestManager

spec = specs.ModelSpec(
    arch="LlamaForCausalLM", vocab_size=256, hidden_size=64, num_layers=2,
    num_heads=4, num_kv_heads=4, head_dim=16, intermediate_size=128,
    max_position_embeddings=256, norm_eps=1e-6)
params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.bfloat16)
eng = InferenceEngine(spec, params, max_requests_per_batch=4, max_seq_len=128)
rm = RequestManager(eng, decode_horizon=8, pipelined=True)
rng = np.random.RandomState(0)
reqs = rm.generate([rng.randint(1, 256, size=16).tolist() for _ in range(6)],
                   GenerationConfig(max_new_tokens=24))
assert all(len(r.output_tokens) > 0 for r in reqs)
print("bench smoke OK:", sum(len(r.output_tokens) for r in reqs), "tokens")
EOF

echo "== CI green =="
