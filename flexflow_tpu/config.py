"""FFConfig — the framework's flag/config system.

TPU-native mirror of the reference's FFConfig
(/root/reference/include/flexflow/config.h:131-211 +
``FFConfig::parse_args`` model.cc:4300-4636): training knobs, parallelism
degrees, serving capacities, quantization, fusion/profiling toggles —
settable from kwargs, environment (``FF_*``), or an argv-style parser.
Legion resource flags (-ll:*) have no TPU analog and are accepted-ignored.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence


def _env_flag(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v not in ("0", "false", "False", "")


@dataclasses.dataclass
class FFConfig:
    # training (reference -b/-e/-lr/--nodes)
    batch_size: int = 64
    epochs: int = 1
    learning_rate: float = 0.01
    weight_decay: float = 0.0
    seed: int = 0

    # parallelism degrees (config.h:186-188)
    data_parallelism_degree: int = 1
    tensor_parallelism_degree: int = 1
    pipeline_parallelism_degree: int = 1
    num_microbatches: int = 0  # 0 -> = pipeline degree
    expert_parallel: bool = False
    only_data_parallel: bool = False  # skip layout search (config.h:180)
    auto_parallel: bool = False  # Unity-lite layout search in compile()
    substitution_json: Optional[str] = None  # rule file (config.h:197)

    # auto-parallelization search (reference --budget/--alpha)
    search_budget: int = 8
    search_alpha: float = 1.2

    # serving capacities (request_manager.h:135-159)
    max_requests_per_batch: int = 8
    max_tokens_per_batch: int = 128
    max_sequence_length: int = 256
    max_beam_width: int = 3
    max_beam_depth: int = 8  # reference BeamSearchBatchConfig (batch_config.h:197)
    max_spec_tree_token_num: int = 64
    max_concurrent_adapters: int = 1
    max_lora_rank: int = 32

    # scheduler
    # 16 balances throughput against post-EOS waste: EOS is only observed
    # at horizon fetch (one-horizon pipelined lag), so EOS-heavy workloads
    # waste up to ~2 horizons of decode per retired request. The benches
    # pass horizon=64 explicitly (fixed max_new workloads never hit EOS).
    decode_horizon: int = 16
    # in-flight horizons: the reference keeps a 4-deep future queue
    # (request_manager.cc:3122-3137); same default here
    pipeline_depth: int = 4
    spec_horizon: int = 8  # device-chained speculative iterations
    # (8 beat 4 and 16 on-chip at 7B INT4 w2d6 — probe_r4/bench_spec r4)

    # numerics / quantization (-4bit/-8bit-quantization, --offload)
    data_type: str = "bfloat16"
    quantization: Optional[str] = None  # "int4" | "int8"
    quantization_group_size: int = 128
    cpu_offload: bool = False

    # execution toggles
    fusion: bool = True  # XLA fuses by construction; kept for parity
    profiling: bool = False
    inference_debugging: bool = False
    # Decode-attention kernel: ON by default, but the decoder additionally
    # gates it to the measured winning regime (grouped-query G >= 8 at
    # S <= 2048 — bench_gqa_decode.py on-chip); MHA/MQA decode stays on XLA
    use_pallas_attention: bool = _env_flag("FF_PALLAS_ATTENTION", True)
    use_pallas_quant_matmul: bool = _env_flag("FF_PALLAS_QUANT_MATMUL", True)
    # (The r4 INT4 group-dot kernel and its FF_INT4_GROUPDOT flag were
    # deleted in r5: measured e2e LOSS on-chip — see quant_matmul.py header
    # and benchmarks/probe_r5_groupdot.py.)
    # Fused projection carriers on the serving path: wq/wk/wv concatenated
    # into one [D, H+2KH, Dh] carrier and wg/wu into [D, 2F] at engine build
    # (decoder.fuse_qkv_params), so decode pays one quant-matmul kernel call
    # per group instead of three/two (measured 54.6 us vs 67.1 us/layer for
    # QKV at 7B INT4 — benchmarks/tune_int4_variants.py). Outputs are exact
    # per-column but NOT bitwise-equal to the unfused carriers (different
    # kernel blockings change fp accumulation order), so the flag flips the
    # WHOLE engine — decode, prefill and tree-verify stay mutually
    # consistent. Single-mesh engines only (TP shards the fused carrier's
    # head axis unevenly across q/k/v blocks; mesh engines keep split
    # carriers). ON by default: +4% on the 7B INT4 spec path end-to-end
    # (763.6 vs 734.1 tok/s, benchmarks/probe_r5_hsweep.py on-chip).
    fuse_qkv: bool = _env_flag("FF_FUSE_QKV", True)
    # flash prefill kernel (ops/pallas/flash_prefill.py): beats the XLA
    # masked-softmax path at every measured shape (1.4x at S=512 up to 60x at
    # S=8192 on v5e), so ON by default; inference prefill only (no VJP)
    use_pallas_prefill: bool = _env_flag("FF_PALLAS_PREFILL", True)
    verbose: bool = False

    @classmethod
    def from_env(cls, **overrides) -> "FFConfig":
        cfg = cls(**overrides)
        for f in dataclasses.fields(cls):
            env = os.environ.get("FF_" + f.name.upper())
            if env is None:
                continue
            if f.type in ("int", int):
                setattr(cfg, f.name, int(env))
            elif f.type in ("float", float):
                setattr(cfg, f.name, float(env))
            elif f.type in ("bool", bool):
                setattr(cfg, f.name, env not in ("0", "false", ""))
            else:
                setattr(cfg, f.name, env)
        return cfg

    @classmethod
    def parse_args(cls, argv: Sequence[str]) -> "FFConfig":
        """Reference-style flag parsing (model.cc:4300-4636 subset)."""
        cfg = cls()
        flags = {
            "-b": ("batch_size", int), "--batch-size": ("batch_size", int),
            "-e": ("epochs", int), "--epochs": ("epochs", int),
            "-lr": ("learning_rate", float),
            "--learning-rate": ("learning_rate", float),
            "-data-parallelism-degree": ("data_parallelism_degree", int),
            "-tensor-parallelism-degree": ("tensor_parallelism_degree", int),
            "-pipeline-parallelism-degree": ("pipeline_parallelism_degree", int),
            "--budget": ("search_budget", int),
            "--search-budget": ("search_budget", int),
            "--alpha": ("search_alpha", float),
            "--max-requests-per-batch": ("max_requests_per_batch", int),
            "--max-tokens-per-batch": ("max_tokens_per_batch", int),
            "--max-sequence-length": ("max_sequence_length", int),
            "--substitution-json": ("substitution_json", str),
        }
        boolean = {
            "--only-data-parallel": "only_data_parallel",
            "-auto-parallelism": "auto_parallel",
            "--auto-parallelism": "auto_parallel",
            "--fusion": "fusion",
            "--profiling": "profiling",
            "--inference-debugging": "inference_debugging",
            "--verbose": "verbose",
            "-enable-peft": None,
            "--offload": "cpu_offload",
        }
        i = 0
        argv = list(argv)
        while i < len(argv):
            a = argv[i]
            if a in flags:
                name, typ = flags[a]
                setattr(cfg, name, typ(argv[i + 1]))
                i += 2
            elif a in ("-4bit-quantization",):
                cfg.quantization = "int4"
                i += 1
            elif a in ("-8bit-quantization",):
                cfg.quantization = "int8"
                i += 1
            elif a in boolean:
                if boolean[a]:
                    setattr(cfg, boolean[a], True)
                i += 1
            elif a.startswith("-ll:"):  # Legion resource flags: ignored
                i += 2
            else:
                i += 1
        return cfg


def ensure_cpu_devices(n: int) -> None:
    """Give the CPU backend >= n virtual devices (reference -ll:cpu analog).

    Only effective before the first backend use; on the TPU backend it is a
    no-op (device count is physical). The ambient site hook imports jax at
    interpreter startup, so env vars like XLA_FLAGS are too late — the config
    update below is the reliable path (same trick as tests/conftest.py).
    """
    import jax

    if os.environ.get("JAX_PLATFORMS", "") != "cpu" or n <= 1:
        return
    try:
        # the site hook may have re-pinned the platform after reading env
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n)
    except RuntimeError:
        pass  # backend already initialized; caller's mesh build will report


# module-level default config (mutable runtime toggles live here)
config = FFConfig.from_env()
