"""Execute the REAL bench_spec.run_spec_benchmarks body at tiny scale.

VERDICT r2 #1a: the round-2 bench shipped with a NameError on its INT4 path
because nothing ever executed the function. This test injects small specs
into the exact production function (same code path the driver captures:
INT8 incremental + INT4 incremental + INT4 spec + prefix gate + metric
emission), so a broken phase fails CI instead of dying silently under
``bench.py``'s phase isolation.
"""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench_spec  # noqa: E402


def test_run_spec_benchmarks_tiny(capsys):
    ratio = bench_spec.run_spec_benchmarks(
        include_int8_incr=True,
        draft_spec=bench_spec.DRAFT_S,
        verifier_spec=bench_spec.VERIFIER_S,
        batch=2,
        max_seq=256,
        max_new=8,
        horizon=4,
        metric_suffix="tiny",
        sharpen_steps=12,
        draft_ckpt=6,
        curve_ckpts=(4, 6, 9),  # the acceptance-curve path must execute too
    )
    assert ratio > 0.0
    out = capsys.readouterr().out
    metrics = {}
    for line in out.splitlines():
        if line.startswith('{"metric"'):
            rec = json.loads(line)
            metrics[rec["metric"]] = rec
    expected = {
        "llamatiny_int8_incr_tokens_per_sec_chip",
        "spec_decode_speedup_vs_incremental_tiny_int4",
        "spec_decode_output_tokens_per_sec_chip_tiny_int4",
        "incr_decode_output_tokens_per_sec_chip_tiny_int4",
        "mean_verified_tokens_per_step",
        "spec_outputs_prefix20_match_tiny_int4",
        "spec_tiny_int4_rep_min_tokens_per_sec",
        "spec_tiny_int4_rep_median_tokens_per_sec",
        "spec_tiny_int4_rep_max_tokens_per_sec",
        "incr_tiny_int4_rep_min_tokens_per_sec",
        "spec_speedup_at_ckpt4_tiny_int4",
        "spec_acc_at_ckpt4_tiny_int4",
        "spec_speedup_at_ckpt6_tiny_int4",
        "spec_speedup_at_ckpt9_tiny_int4",
    }
    assert expected <= set(metrics), sorted(expected - set(metrics))
    for rec in metrics.values():
        assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
