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
