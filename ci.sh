#!/usr/bin/env bash
# Single-entrypoint CI: full test suite + graft-entry compile checks + a bench
# smoke — all on a virtual 8-device CPU mesh (no TPU needed). Mirrors the
# reference's gpu-ci.yml pipeline stages (python interface -> alignment ->
# inference -> training) collapsed into the pytest suite (SURVEY.md §4).
set -euo pipefail
cd "$(dirname "$0")"

# Lanes (reference gpu-ci.yml splits stages; the driver's CI budget is a few
# minutes). Tests measured >~10 s carry @pytest.mark.slow (tests/conftest.py):
#   fast (default): critical-path files minus slow + the bench-spec gate, <5 min
#   full:           entire suite minus slow, ~12 min
#   all:            everything including slow
LANE="${1:-fast}"

if [ "$LANE" = "fast" ]; then
  echo "== FAST lane: critical path ('./ci.sh full' / './ci.sh all' for more) =="
  python -m pytest -x -q -m "not slow" \
    tests/test_serving.py tests/test_speculative.py \
    tests/test_hf_alignment.py tests/test_pp_serving.py tests/test_pp_spec.py \
    tests/test_quant.py tests/test_training.py
  # the bench-spec gate always runs (the bench file must never ship broken)
  python -m pytest -x -q tests/test_bench_spec.py
elif [ "$LANE" = "full" ]; then
  echo "== FULL lane: suite minus slow-marked (CPU, 8 virtual devices) =="
  python -m pytest tests/ -x -q -m "not slow"
else
  echo "== ALL lane: entire suite including slow =="
  python -m pytest tests/ -x -q
fi

# NOTE: JAX_PLATFORMS=cpu is NOT enough here — the ambient axon boot hook
# can override it and device init then blocks on the (possibly wedged)
# tunnel. jax.config.update('jax_platforms', 'cpu') BEFORE any device use is
# the reliable CPU pin (same reason tests/conftest.py sets both).
echo "== graft entry: single-chip forward compile check =="
JAX_PLATFORMS=cpu python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
fn, args = g.entry()
jax.jit(fn).lower(*args).compile()
print('entry() compiles OK')
"

echo "== graft entry: 8-device SPMD dry run =="
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
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
