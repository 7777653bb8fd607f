"""HuggingFace checkpoint loading: local model dir -> decoder params pytree.

TPU-native replacement for the reference's weight pipeline
(/root/reference/python/flexflow/serve/serve.py:183-425 download/convert to
per-tensor binary files + /root/reference/src/runtime/file_loader.cc load with
one Legion task per weight): we mmap safetensors shards (or torch .bin
fallback) and build the stacked-layer pytree directly, with optional
quantize-on-load (file_loader.cc:417-670) and optional mesh sharding on the
way to device.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from flexflow_tpu.models import params as params_lib
from flexflow_tpu.specs import ModelSpec, from_hf_config_file


class LazyStateDict:
    """Mapping-like view over a model dir's safetensors/bin shards.

    Tensors load lazily (safetensors mmap) so peak host memory stays near one
    tensor, mirroring the reference's per-weight-file loads.
    """

    def __init__(self, model_dir: str):
        self.model_dir = model_dir
        self._index: Dict[str, str] = {}
        self._open_files: Dict[str, Any] = {}
        self._torch_shards: Dict[str, Dict[str, Any]] = {}

        st_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
        if st_files:
            # prefer the native mmap reader (zero-copy; native/safetensors_reader.cc)
            from flexflow_tpu.utils import native_safetensors

            if native_safetensors.available():
                self._mode = "native"
                for f in st_files:
                    nf = native_safetensors.NativeSafetensors(f)
                    self._open_files[f] = nf
                    for name in nf.keys():
                        self._index[name] = f
                return
            from safetensors import safe_open

            for f in st_files:
                with safe_open(f, framework="np") as sf:
                    for name in sf.keys():
                        self._index[name] = f
            self._safe_open = safe_open
            self._mode = "safetensors"
            return

        bin_files = sorted(glob.glob(os.path.join(model_dir, "pytorch_model*.bin")))
        if not bin_files:
            raise FileNotFoundError(f"No weights found in {model_dir}")
        import torch

        for f in bin_files:
            shard = torch.load(f, map_location="cpu", weights_only=True)
            for name in shard:
                self._index[name] = f
            self._torch_shards[f] = shard
        self._mode = "torch"

    def __contains__(self, name: str) -> bool:
        return name in self._index

    def keys(self):
        return self._index.keys()

    def __getitem__(self, name: str) -> np.ndarray:
        f = self._index[name]
        if self._mode == "native":
            return self._open_files[f][name]
        if self._mode == "safetensors":
            if f not in self._open_files:
                self._open_files[f] = self._safe_open(f, framework="np")
            return self._open_files[f].get_tensor(name)
        t = self._torch_shards[f][name]
        return t.detach().cpu().float().numpy()


def load_spec(model_dir: str) -> ModelSpec:
    return from_hf_config_file(os.path.join(model_dir, "config.json"))


def load_params(
    model_dir: str,
    spec: Optional[ModelSpec] = None,
    *,
    dtype=jnp.bfloat16,
    quantize_bits: Optional[int] = None,
    quantize_group_size: int = 128,
    mesh=None,
):
    """Load a local HF model dir into the decoder params pytree.

    quantize_bits 4/8 applies weight-only quantize-on-load; ``mesh`` shards
    params on the way to device.
    """
    spec = spec or load_spec(model_dir)
    sd = LazyStateDict(model_dir)
    params = params_lib.convert_hf_state_dict(spec, sd, dtype)
    if quantize_bits:
        from flexflow_tpu.quant import quantize_params

        params = quantize_params(
            spec, params, bits=quantize_bits, group_size=quantize_group_size,
            compute_dtype=dtype,
        )
    if mesh is not None:
        from flexflow_tpu.parallel.sharding import shard_params

        params = shard_params(spec, params, mesh)
    return spec, params
