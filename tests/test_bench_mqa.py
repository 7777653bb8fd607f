"""Execute the REAL bench_mqa phase body at tiny scale every CI run (the
same no-dead-phases policy as tests/test_bench_spec.py)."""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_mqa  # noqa: E402
from flexflow_tpu import specs  # noqa: E402

TINY_MQA = specs.ModelSpec(
    arch="FalconForCausalLM", vocab_size=512, hidden_size=128,
    num_layers=2, num_heads=8, num_kv_heads=1, head_dim=16,
    intermediate_size=256, max_position_embeddings=256,
    norm="layernorm", norm_eps=1e-5, norm_bias=True, pos="rope",
    parallel_attn=True, act="gelu",
)


def test_run_mqa_benchmark_tiny(capsys):
    tps = bench_mqa.run_mqa_benchmark(
        TINY_MQA, batch=2, max_seq=128, max_new=8, horizon=4,
        metric="tiny_mqa")
    assert tps > 0.0
    out = capsys.readouterr().out
    recs = [json.loads(l) for l in out.splitlines()
            if l.startswith('{"metric"')]
    assert any(r["metric"] == "tiny_mqa" for r in recs)
