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


def test_native_scheduler_matches_python_loop():
    """Native ff_process_horizon == the Python reference loop over a fuzzed
    batch of slots (EOS, stop ids, max-new, and seq-budget retirement)."""
    import numpy as np

    from flexflow_tpu.utils import native_scheduler

    if not native_scheduler.available():
        import pytest

        pytest.skip("native scheduler lib unavailable")

    rng = np.random.RandomState(0)
    n, b = 8, 16
    eos = np.asarray([2, 7], np.int32)
    for trial in range(20):
        tokens = rng.randint(0, 12, size=(n, b)).astype(np.int32)
        active = (rng.rand(b) < 0.8).astype(np.int32)
        counts0 = rng.randint(0, 5, size=b).astype(np.int32)
        max_new = rng.randint(3, 12, size=b).astype(np.int32)
        totals0 = counts0 + rng.randint(1, 10, size=b).astype(np.int32)
        budget = rng.randint(8, 30, size=b).astype(np.int32)
        margin = 4
        stop_ids = np.full((b, 2), -1, np.int32)
        stop_counts = np.zeros(b, np.int32)
        stop_ids[::3, 0] = 5
        stop_counts[::3] = 1

        # python reference
        ref_taken = np.zeros(b, np.int64)
        ref_fin = np.zeros(b, np.int64)
        ref_out = np.zeros((b, n), np.int64)
        for s in range(b):
            if not active[s]:
                continue
            c, t = int(counts0[s]), int(totals0[s])
            for i in range(n):
                tok = int(tokens[i, s])
                ref_out[s, ref_taken[s]] = tok
                ref_taken[s] += 1
                c += 1
                t += 1
                stop = tok in eos.tolist() or (
                    stop_counts[s] and tok in stop_ids[s, :stop_counts[s]]
                )
                if not stop and c >= max_new[s]:
                    stop = True
                if not stop and t + margin > budget[s]:
                    stop = True
                if stop:
                    ref_fin[s] = 1
                    break

        counts = counts0.copy()
        totals = totals0.copy()
        out, taken, fin = native_scheduler.process_horizon(
            tokens, active, counts, max_new, totals, budget, margin,
            eos, stop_ids, stop_counts,
        )
        assert (taken == ref_taken).all(), trial
        assert (fin == ref_fin).all(), trial
        for s in range(b):
            assert (out[s, :taken[s]] == ref_out[s, :taken[s]]).all()
