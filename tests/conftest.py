"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's test philosophy (SURVEY.md §4): HuggingFace is the
numeric oracle; parallelism configs must agree with each other. Tests run on
CPU so they are hermetic and exercise the same XLA sharding paths as TPU.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the single real
# TPU chip (axon tunnel); tests must not contend for it. The site hook imports
# jax at interpreter startup, so the env var alone is too late — update the
# config explicitly too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

assert jax.default_backend() == "cpu", jax.default_backend()


# ---------------------------------------------------------------------------
# test tiering (VERDICT r2 #9): tests measured >~10 s on the CI box carry
# @pytest.mark.slow so ci.sh can run a <5 min fast lane and a ~12 min full
# lane (`-m "not slow"`); `./ci.sh all` still runs everything.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

_SLOW = {
    ("test_quant_properties.py", "test_batch_dims_match_independent"),
    ("test_quant_properties.py", "test_roundtrip_shape_and_bound"),
    ("test_quant_properties.py", "test_pallas_kernel_matches_dequant_dot"),
    ("test_pipeline.py", "test_pp_grad_matches"),
    ("test_pipeline.py", "test_trainer_with_pipeline"),
    ("test_bench_spec.py", "test_run_spec_benchmarks_tiny"),
    ("test_auto_parallel.py", "test_optimize_layout_measured"),
    ("test_auto_parallel.py", "test_trainer_mesh_auto_wired"),
    ("test_pp_serving.py", "test_pp_serving_matches_single_device"),
    ("test_pp_serving.py", "test_pp_chunked_prefill_matches"),
    ("test_pp_serving.py",
     "test_pp_overlapped_horizon_matches_stepwise_and_fills_pipeline"),
    ("test_pp_spec.py", "test_pp_spec_matches_single_device_and_incremental"),
    ("test_pp_spec.py", "test_pp_spec_tp_composition"),
    ("test_pp_spec.py", "test_pp_spec_horizon_matches"),
    ("test_tree_merge.py", "test_merged_multi_ssm_matches_incremental"),
    ("test_examples.py", "test_inception_training_example"),
    ("test_examples.py", "test_resnet"),
    ("test_spec_pair.py", "test_fast_quant_matches_reference_construction"),
    ("test_spec_pair.py", "test_embedded_verifier_cached_decode_matches"),
    ("test_serving.py", "test_incremental_matches_recompute"),
    ("test_serving.py", "test_horizon_decode_matches_alibi"),
    ("test_speculative.py", "test_spec_eos"),
    ("test_speculative.py", "test_multi_ssm_rotation"),
    ("test_speculative.py", "test_spec_continuous_batching"),
    ("test_speculative.py", "test_perfect_draft_accepts_tree_depth"),
    ("test_speculative.py", "test_spec_equals_incremental"),
    ("test_speculative.py", "test_pipelined_spec_equals_incremental"),
    ("test_mesh_serving.py", "test_tp_spec_serving_matches_single_device"),
    ("test_mesh_serving.py", "test_tp_dp_serving_matches_single_device"),
    ("test_ring_attention.py", "test_cp_cached_decode_matches_split"),
    ("test_ring_attention.py", "test_cp_cached_decode_tree_mask"),
    ("test_distributed.py", "test_two_process_distributed_serving"),
    ("test_spec_sampling.py",
     "test_engine_sample_step_greedy_matches_fused_step"),
    ("test_spec_sampling.py", "test_manager_sampling_requests_complete"),
    ("test_serving_zoo.py", "test_cached_decode_matches_recompute"),
    ("test_peft.py", "test_finetune_coscheduled"),
    ("test_entrypoints.py", "test_openai_compatible_server"),
    ("test_entrypoints.py", "test_openai_streaming"),
    ("test_entrypoints.py", "test_openai_error_handling_and_stop"),
    ("test_pp_serving.py", "test_pp_serving_with_lora_matches_base_engine"),
    ("test_pp_spec.py", "test_pp_spec_sampling_requests_complete"),
    ("test_pp_spec.py", "test_pp_spec_zoo_families"),
    ("test_serving_zoo.py", "test_pp_serving_matches_base_for_zoo"),
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: measured >~10 s on the CI box (ci.sh lanes)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.path.name if hasattr(item, "path") else ""
        tname = item.name.split("[")[0]
        if (fname, tname) in _SLOW:
            item.add_marker(pytest.mark.slow)
