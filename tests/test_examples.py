"""Training example smoke tests (reference tests/training_tests.sh analog)."""

import os
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
