"""Native C++ component tests: safetensors reader vs the reference library,
BPE core vs HF tokenizers on the same vocab/merges."""

import json

import numpy as np
import pytest

from flexflow_tpu.utils import native_safetensors, native_tokenizer


@pytest.fixture(scope="module")
def built():
    if not native_safetensors.available():
        pytest.skip("g++ unavailable")
    if not native_tokenizer.available():
        pytest.skip("g++ unavailable")
    return True


def test_safetensors_reader_matches(tmp_path, built):
    from safetensors.numpy import save_file

    rng = np.random.RandomState(0)
    tensors = {
        "a.weight": rng.randn(16, 8).astype(np.float32),
        "b.bias": rng.randn(8).astype(np.float16),
        "c.ids": rng.randint(0, 100, size=(3, 4, 5)).astype(np.int64),
        "d.flags": (rng.randn(6) > 0),
        "scalar": np.array(3.5, dtype=np.float32),
    }
    path = str(tmp_path / "test.safetensors")
    save_file(tensors, path)

    f = native_safetensors.NativeSafetensors(path)
    assert set(f.keys()) == set(tensors.keys())
    for name, want in tensors.items():
        got = f[name]
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)
    f.close()


def test_safetensors_bf16(tmp_path, built):
    import jax.numpy as jnp
    from safetensors.numpy import save_file
    import ml_dtypes

    x = np.asarray(jnp.asarray([[1.5, -2.25], [0.125, 3.0]], jnp.bfloat16))
    path = str(tmp_path / "bf16.safetensors")
    save_file({"w": x}, path)
    f = native_safetensors.NativeSafetensors(path)
    got = f["w"]  # converted to float32
    np.testing.assert_array_equal(got, x.astype(np.float32))


def test_bpe_matches_hf(tmp_path, built):
    # build a small byte-level BPE with the `tokenizers` library, then compare
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=[],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "hello world, hello tokenizer! testing byte level bpe merges",
        "speculative decoding verifies token trees on TPUs",
    ] * 20
    tok.train_from_iterator(corpus, trainer)

    vocab = tok.get_vocab()
    # extract merges by saving the tokenizer json
    tok.save(str(tmp_path / "tok.json"))
    with open(tmp_path / "tok.json") as f:
        tj = json.load(f)
    merges = [
        m if isinstance(m, str) else " ".join(m)
        for m in tj["model"]["merges"]
    ]

    ours = native_tokenizer.NativeBPETokenizer(vocab, merges)
    for text in [
        "the quick brown fox",
        "hello world",
        "testing bpe merges on TPUs",
    ]:
        want = tok.encode(text).ids
        got = ours.encode(text)
        assert got == want, (text, got, want)
        assert ours.decode(got) == text
