from flexflow_tpu.peft.lora import (  # noqa: F401
    LoraConfig,
    hf_module_to_key,
    init_lora_params,
    lora_scaling,
    merge_lora,
)
