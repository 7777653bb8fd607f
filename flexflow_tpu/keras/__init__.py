"""Keras-compatible frontend.

TPU-native mirror of the reference's Keras frontend
(/root/reference/python/flexflow/keras/ — ``models/{model,sequential}.py``,
``layers/{core,convolutional,normalization,merge,pool}.py``): a familiar
Sequential/functional API that lowers onto the FFModel DSL and its fused
jitted training step.
"""

from flexflow_tpu.keras.layers import (  # noqa: F401
    Activation,
    Add,
    AveragePooling2D,
    BatchNormalization,
    Concatenate,
    Conv2D,
    Conv2DTranspose,
    Dense,
    Dropout,
    Embedding,
    Flatten,
    GroupNormalization,
    Input,
    LayerNormalization,
    Maximum,
    MaxPooling2D,
    Minimum,
    Multiply,
    Permute,
    Reshape,
    Subtract,
)
from flexflow_tpu.keras.models import Model, Sequential  # noqa: F401
from flexflow_tpu.keras.optimizers import SGD, Adam  # noqa: F401
from flexflow_tpu.keras import callbacks  # noqa: F401
from flexflow_tpu.keras import datasets  # noqa: F401
from flexflow_tpu.keras import initializers  # noqa: F401
from flexflow_tpu.keras import losses  # noqa: F401
from flexflow_tpu.keras import metrics  # noqa: F401
from flexflow_tpu.keras import preprocessing  # noqa: F401
from flexflow_tpu.keras import regularizers  # noqa: F401
