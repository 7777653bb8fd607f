"""Training example smoke tests (reference tests/training_tests.sh analog)."""

import os

import numpy as np
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_mnist_mlp():
    from examples import mnist_mlp
    mnist_mlp.main()


def test_resnet():
    from examples import resnet
    resnet.main(batch_size=8, epochs=1, samples=16)


def test_dlrm():
    from examples import dlrm
    dlrm.main(batch_size=16, epochs=2, samples=64)


def test_transformer():
    from examples import transformer
    transformer.main(batch_size=8, epochs=2, samples=32)


def test_moe_training_example():
    """Reference examples/cpp/mixture_of_experts/moe.cc analog — exercises
    the gate->topk->experts->aggregate composite through full training."""
    from examples.moe import main

    hist = main(batch_size=8, epochs=1, samples=32)
    assert np.isfinite(hist[-1]["loss"])


def test_inception_training_example():
    """Reference examples/cpp/InceptionV3 analog (inception towers)."""
    from examples.inception import main

    hist = main(batch_size=4, epochs=1, samples=8)
    assert np.isfinite(hist[-1]["loss"])


def test_xdl_training_example():
    from examples.xdl import main

    hist = main(batch_size=8, epochs=1, samples=16)
    assert np.isfinite(hist[-1]["loss"])


def test_candle_uno_training_example():
    from examples.candle_uno import main

    hist = main(batch_size=8, epochs=1, samples=16)
    assert np.isfinite(hist[-1]["loss"])


def test_resnext_training_example():
    from examples.resnext50 import main

    hist = main(batch_size=4, epochs=1, samples=8)
    assert np.isfinite(hist[-1]["loss"])


def test_mlp_unify_training_example():
    """Reference examples/cpp/MLP_Unify (two-tower dense stack)."""
    from examples.mlp_unify import main

    hist = main([])
    assert np.isfinite(hist[-1]["loss"])


def test_split_training_example():
    """Reference examples/python/native/split.py (concat/split towers)."""
    from examples.split_test import main

    hist = main(epochs=1, batch=4)
    assert np.isfinite(hist[-1]["loss"])


def test_bert_proxy_training_example():
    """Reference examples/python/native/bert_proxy_native.py (hand-built
    MHA from dense/reshape/transpose/batch_matmul)."""
    from examples.bert_proxy import main

    hist = main([])
    assert np.isfinite(hist[-1]["loss"])


def test_cifar10_cnn_training_example():
    from examples.cifar10_cnn import main

    hist = main(epochs=1, batch=4, samples=16)
    assert np.isfinite(hist[-1]["loss"])


def test_multi_head_attention_training_example():
    from examples.multi_head_attention import main

    hist = main(epochs=2, batch=4, seq=8, hidden=32)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] <= hist[0]["loss"] + 1e-3
