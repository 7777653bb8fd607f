"""Auxiliary subsystem tests: debug dumps, HTTP endpoint, trace generator +
request-rate replay (reference §5 aux subsystems)."""

import json
import os
import sys
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from flexflow_tpu import specs
from flexflow_tpu.models import decoder, params as params_lib
from flexflow_tpu.serving import GenerationConfig, InferenceEngine, RequestManager
from flexflow_tpu.utils.debug_dump import DebugDumper, forward_with_traces

TINY = specs.ModelSpec(
    arch="LlamaForCausalLM",
    vocab_size=96,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    intermediate_size=128,
    max_position_embeddings=128,
    norm_eps=1e-6,
)


@pytest.fixture(scope="module")
def tiny_params():
    return params_lib.init_params(TINY, jax.random.PRNGKey(0))


def test_debug_traces_match_forward(tiny_params, tmp_path):
    tokens = jnp.asarray([[3, 17, 91, 5]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    want, _ = decoder.forward(TINY, tiny_params, tokens, pos)
    got, traces = forward_with_traces(TINY, tiny_params, tokens, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    for l in range(TINY.num_layers):
        for key in ("q_proj", "attn_output", "output"):
            assert f"layers.{l}.{key}" in traces

    dumper = DebugDumper(str(tmp_path))
    d = dumper.dump_step(traces)
    f = os.path.join(d, "layers.0.attn_output", "shard_0.npy")
    assert os.path.exists(f)
    arr = np.load(f)
    np.testing.assert_allclose(arr, np.asarray(traces["layers.0.attn_output"]))
    assert dumper.dump_step(traces).endswith("fwd_step_1")


def test_trace_generator_and_replay(tiny_params):
    from benchmarks.generate_trace import generate_trace
    from benchmarks.req_rate_benchmark import run_trace, summarize

    trace = generate_trace(arrival_rate=50.0, duration_s=0.2,
                           prompt_len_mean=6, output_len_mean=5, max_len=32,
                           seed=0)
    assert len(trace) > 1
    engine = InferenceEngine(
        TINY, tiny_params, max_requests_per_batch=4, max_seq_len=64,
        cache_dtype=jnp.float32,
    )
    rm = RequestManager(engine)
    import time
    t0 = time.monotonic()
    reqs = run_trace(rm, trace, TINY.vocab_size, time_scale=0.1)
    stats = summarize(reqs, time.monotonic() - t0)
    assert stats["requests"] == len(trace)
    assert stats["output_tokens"] > 0
    assert stats["latency_ms_p99"] >= stats["latency_ms_p50"]


def test_http_server(tiny_params, tmp_path):
    """Serve a tiny model through the stdlib endpoint and round-trip JSON."""

    class _FakeTok:
        def __call__(self, p, return_tensors=None):
            return {"input_ids": [ord(c) % TINY.vocab_size for c in p]}

        def decode(self, ids, skip_special_tokens=True):
            return "".join(chr(32 + (i % 90)) for i in ids)

    from flexflow_tpu.serve import LLM

    class _FakeLLM:
        """Minimal LLM duck-type (real tokenizer files unavailable offline)."""

        output_file = ""

        def __init__(self):
            engine = InferenceEngine(
                TINY, tiny_params, max_requests_per_batch=2, max_seq_len=64,
                cache_dtype=jnp.float32,
            )
            self.rm = RequestManager(engine)
            self.tokenizer = _FakeTok()

        def generate(self, prompts, **kw):
            return LLM.generate(self, prompts, **kw)

    from inference.entrypoint.http_server import serve

    llm = _FakeLLM()
    server = serve(llm, port=0)
    port = server.server_address[1]
    try:
        body = json.dumps({"prompt": "hi there", "max_new_tokens": 5}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = json.loads(resp.read())
        assert len(out["output_tokens"]) == 5
        assert isinstance(out["output"], str)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=10
        ) as resp:
            assert resp.read() == b"ok"
    finally:
        server.shutdown()


def test_ffconfig_parse_args():
    from flexflow_tpu.config import FFConfig

    cfg = FFConfig.parse_args([
        "-b", "32", "-e", "4", "-lr", "0.05",
        "-tensor-parallelism-degree", "4",
        "-pipeline-parallelism-degree", "2",
        "--max-sequence-length", "512",
        "-8bit-quantization", "--fusion", "--profiling",
        "-ll:gpu", "4", "-ll:fsize", "14000",
        "--only-data-parallel",
    ])
    assert cfg.batch_size == 32 and cfg.epochs == 4
    assert cfg.learning_rate == 0.05
    assert cfg.tensor_parallelism_degree == 4
    assert cfg.pipeline_parallelism_degree == 2
    assert cfg.max_sequence_length == 512
    assert cfg.quantization == "int8"
    assert cfg.profiling and cfg.fusion and cfg.only_data_parallel


def test_step_timer():
    from flexflow_tpu.utils.profiling import StepTimer

    t = StepTimer()
    with t.phase("decode"):
        pass
    with t.phase("decode"):
        pass
    with t.phase("prefill"):
        pass
    lines = t.report()
    assert any("decode" in l and "count 2" in l for l in lines)
    assert any("prefill" in l for l in lines)


def test_per_op_profile_reference_style():
    """--profiling per-op report (reference per-kernel brackets,
    linear_kernels.cu:144-178): every decoder op gets its own timed line."""
    import jax
    import jax.numpy as jnp

    from flexflow_tpu import specs
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.utils.profiling import per_op_profile

    spec = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=128, hidden_size=64,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
        intermediate_size=128, max_position_embeddings=128, norm_eps=1e-6,
    )
    params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.float32)
    lines = per_op_profile(spec, params, batch=2, seq=8, cache_len=32, reps=2)
    text = "\n".join(lines)
    for op in ("RMSNorm", "Linear (qkv)", "IncMultiHeadSelfAttention",
               "Linear (o_proj)", "MLP", "Embedding", "LMHead"):
        assert op in text, (op, text)
    assert text.count("forward time =") >= 7, text


def test_profiling_flag_prints_per_op(capsys):
    """RequestManager drains -> [Profile] per-op lines appear under
    --profiling."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from flexflow_tpu import specs
    from flexflow_tpu.config import config as ffconfig
    from flexflow_tpu.models import params as params_lib
    from flexflow_tpu.serving import (
        GenerationConfig, InferenceEngine, RequestManager,
    )

    spec = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=128, hidden_size=64,
        num_layers=2, num_heads=4, num_kv_heads=4, head_dim=16,
        intermediate_size=128, max_position_embeddings=128, norm_eps=1e-6,
    )
    params = params_lib.init_params(spec, jax.random.PRNGKey(0), jnp.float32)
    old = ffconfig.profiling
    ffconfig.profiling = True
    try:
        eng = InferenceEngine(spec, params, max_requests_per_batch=2,
                              max_seq_len=64, cache_dtype=jnp.float32)
        rm = RequestManager(eng)
        rm.generate([[3, 4, 5]], GenerationConfig(max_new_tokens=4))
    finally:
        ffconfig.profiling = old
    out = capsys.readouterr().out
    assert "IncMultiHeadSelfAttention forward time =" in out
    assert "[Profile]" in out


def test_recompile_state_buckets():
    """RecompileState (reference recompile.h:26-40): trigger/alter drive a
    bucketed static-capacity change and the jitted step recompiles exactly
    once per NEW bucket (jit caches by static arg — returning to an old
    bucket is free)."""
    import functools

    import jax
    import jax.numpy as jnp

    from flexflow_tpu.utils.recompile import RecompileState, round_up_bucket

    compiles = []

    @functools.partial(jax.jit, static_argnames=("capacity",))
    def step(x, capacity):
        compiles.append(capacity)  # trace-time side effect
        pad = int(capacity * 4)
        return jnp.pad(x, (0, pad - x.shape[0])).sum()

    state = {"capacity_factor": 1.0, "overflow": 0.0}
    rs = RecompileState(
        trigger=lambda s: s["overflow"] > 0.1,
        alter=lambda s: s.update(
            capacity_factor=round_up_bucket(s["capacity_factor"] * 1.4)),
    )
    x = jnp.ones((3,))
    seen = []
    for overflow in (0.0, 0.2, 0.0, 0.3, 0.0):
        state["overflow"] = overflow
        rs.step(state)
        step(x, capacity=state["capacity_factor"])
        seen.append(state["capacity_factor"])
    assert rs.recompilations == 2
    assert seen == [1.0, 1.5, 1.5, 3.0, 3.0]
    # one trace per distinct bucket only
    assert compiles == [1.0, 1.5, 3.0]
