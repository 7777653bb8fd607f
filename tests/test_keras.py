"""Keras frontend tests (reference: examples/python/keras + keras frontend)."""

import numpy as np

import flexflow_tpu.keras as keras
from flexflow_tpu.keras import (
    Activation, Add, BatchNormalization, Concatenate, Conv2D, Dense, Dropout,
    Flatten, Input, MaxPooling2D, Sequential,
)
from flexflow_tpu.keras.models import InputTensor, Model


def _toy(n=256, d=16, classes=4, seed=0):
    rng = np.random.RandomState(seed)
    w = rng.randn(d, classes)
    x = rng.randn(n, d).astype(np.float32)
    y = (x @ w).argmax(-1).astype(np.int32)
    return x, y


def test_sequential_mlp():
    x, y = _toy()
    model = Sequential([
        Input(shape=(16,), batch_size=32),
        Dense(64, activation="relu"),
        Dropout(0.1),
        Dense(4),
    ])
    model.compile(optimizer=keras.Adam(learning_rate=1e-2),
                  loss="sparse_categorical_crossentropy")
    hist = model.fit(x, y, batch_size=32, epochs=12)
    assert hist[-1]["accuracy"] > 0.85
    out = model.predict(x[:32])
    assert out.shape == (32, 4)
    assert "dense" in model.summary()


def test_sequential_cnn():
    rng = np.random.RandomState(0)
    x = rng.randn(64, 1, 8, 8).astype(np.float32)
    y = (x.mean(axis=(1, 2, 3)) > 0).astype(np.int32)
    model = Sequential()
    model.add(Input(shape=(1, 8, 8), batch_size=16))
    model.add(Conv2D(8, 3, padding="same", activation="relu"))
    model.add(MaxPooling2D(2))
    model.add(BatchNormalization(relu=True))
    model.add(Flatten())
    model.add(Dense(2))
    model.compile(optimizer=keras.SGD(learning_rate=1e-2, momentum=0.9))
    hist = model.fit(x, y, batch_size=16, epochs=10)
    assert hist[-1]["accuracy"] > 0.75


def test_functional_two_branch():
    x, y = _toy(d=8, classes=2)
    inp = InputTensor(shape=(8,), batch_size=32)
    b1 = Dense(16, activation="relu")(inp)
    b2 = Dense(16, activation="tanh")(inp)
    merged = Concatenate(axis=1)([b1, b2])
    summed = Add()([Dense(8)(merged), Dense(8)(merged)])
    out = Dense(2)(Activation("relu")(summed))
    model = Model(inputs=inp, outputs=out)
    model.compile(optimizer=keras.Adam(learning_rate=1e-2))
    hist = model.fit(x, y, batch_size=32, epochs=10)
    assert hist[-1]["accuracy"] > 0.8


def test_callbacks_lr_schedule_and_history():
    """LearningRateScheduler + History + VerifyMetrics (reference
    python/flexflow/keras/callbacks.py)."""
    import numpy as np

    from flexflow_tpu import keras

    rng = np.random.RandomState(0)
    x = rng.rand(64, 8).astype("float32")
    y = (x.sum(-1) > 4.0).astype("int64")

    model = keras.Sequential([
        keras.Input(shape=(8,), batch_size=16),
        keras.Dense(16, activation="relu"),
        keras.Dense(2),
    ])
    model.compile(optimizer=keras.SGD(learning_rate=0.5),
                  loss="sparse_categorical_crossentropy")
    sched = keras.callbacks.LearningRateScheduler(lambda e: 0.5 * (0.5 ** e))
    hist_cb = keras.callbacks.History()
    model.fit(x, y, batch_size=16, epochs=3,
              callbacks=[sched, hist_cb, keras.callbacks.VerifyMetrics(0.5)])
    assert len(hist_cb.history["loss"]) == 3
    assert abs(model.optimizer.lr - 0.5 * 0.25) < 1e-9


def test_regularizer_and_initializer():
    import numpy as np

    from flexflow_tpu import keras

    rng = np.random.RandomState(0)
    x = rng.rand(32, 4).astype("float32")
    y = rng.randint(0, 2, 32).astype("int64")

    def build(reg):
        model = keras.Sequential([
            keras.Input(shape=(4,), batch_size=16),
            keras.Dense(8, activation="relu",
                        kernel_regularizer=reg,
                        kernel_initializer=keras.initializers.RandomNormal(
                            stddev=0.1, seed=3)),
            keras.Dense(2),
        ])
        model.compile(optimizer=keras.SGD(learning_rate=0.1),
                      loss="sparse_categorical_crossentropy")
        return model

    m_reg = build(keras.regularizers.L2(1.0))
    m_base = build(None)
    m_reg.fit(x, y, batch_size=16, epochs=3, shuffle=False)
    m_base.fit(x, y, batch_size=16, epochs=3, shuffle=False)
    w_reg = np.asarray(
        m_reg.ff.params[m_reg.ff._nodes[1].name]["w"])
    w_base = np.asarray(
        m_base.ff.params[m_base.ff._nodes[1].name]["w"])
    # same init (seeded initializer), so the L2 penalty must shrink weights
    assert np.linalg.norm(w_reg) < np.linalg.norm(w_base)


def test_preprocessing_and_synthetic_datasets():
    import numpy as np

    from flexflow_tpu.keras.datasets import mnist
    from flexflow_tpu.keras.preprocessing.sequence import pad_sequences
    from flexflow_tpu.keras.preprocessing.text import Tokenizer

    tok = Tokenizer(oov_token="<oov>")
    tok.fit_on_texts(["the cat sat", "the dog sat down"])
    seqs = tok.texts_to_sequences(["the cat ran"])
    assert len(seqs[0]) == 3  # 'ran' -> oov id
    padded = pad_sequences(seqs, maxlen=5)
    assert padded.shape == (1, 5) and padded[0, 0] == 0

    (xtr, ytr), (xte, yte) = mnist.load_data(synthetic=True)
    assert xtr.shape == (512, 28, 28) and ytr.shape == (512,)


def test_merge_and_shape_layers():
    """Subtract/Multiply/Maximum/Minimum + Reshape/Permute (reference
    keras/layers/merge.py:119-170, core.py:279-311) — numeric check vs
    numpy through FFModel.forward."""
    import numpy as np

    from flexflow_tpu import keras
    from flexflow_tpu.keras import (
        Maximum, Minimum, Multiply, Permute, Reshape, Subtract,
    )
    from flexflow_tpu.keras.models import InputTensor, Model

    a = InputTensor(shape=(4, 6), batch_size=8)
    b = InputTensor(shape=(4, 6), batch_size=8, builder=a.builder)
    s = Subtract()([a, b])
    m = Multiply()([a, b])
    hi = Maximum()([s, m])
    lo = Minimum()([s, m])
    r = Reshape((6, 4))(hi)
    p = Permute((2, 1))(r)          # [B, 4, 6]
    out = Multiply()([p, lo])
    model = Model(inputs=[a, b], outputs=out)
    model.compile(optimizer=None, loss="mean_squared_error")

    rng = np.random.RandomState(0)
    xa = rng.randn(8, 4, 6).astype(np.float32)
    xb = rng.randn(8, 4, 6).astype(np.float32)
    got = model.ffmodel.forward([xa, xb])
    sub, mul = xa - xb, xa * xb
    want = (np.maximum(sub, mul).reshape(8, 6, 4).transpose(0, 2, 1)
            * np.minimum(sub, mul))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
