from flexflow_tpu.keras.datasets import cifar10, mnist  # noqa: F401
