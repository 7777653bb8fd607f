from flexflow_tpu.keras.preprocessing import sequence, text  # noqa: F401
