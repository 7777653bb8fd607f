from flexflow_tpu.quant.weight_only import (  # noqa: F401
    QuantizedArray,
    as_array,
    dequantize,
    quantize,
    quantize_params,
)
