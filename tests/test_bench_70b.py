"""Execute the bench_70b.run_70b_slice body at tiny scale (the bench file
must never ship with a phase that was never executed — VERDICT r2 #1a)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_70b  # noqa: E402
from flexflow_tpu import specs  # noqa: E402


def test_run_70b_slice_tiny(capsys):
    tiny = specs.ModelSpec(
        arch="LlamaForCausalLM", vocab_size=128, hidden_size=64,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        intermediate_size=128, max_position_embeddings=128, norm_eps=1e-5)
    per_ms = bench_70b.run_70b_slice(slots=2, max_seq=64, window=64,
                                     spec_override=tiny)
    assert per_ms > 0
    out = capsys.readouterr().out
    metrics = {json.loads(l)["metric"] for l in out.splitlines()
               if l.startswith('{"metric"')}
    assert {"llama70b_width_slice_ms_per_step",
            "llama70b_width_slice_tokens_per_sec",
            "llama70b_width_slice_x_hbm_floor"} <= metrics
