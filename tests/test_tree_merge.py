"""Multi-SSM merged-tree verification tests.

Pins: merge_dfs_trees dedup/cap/padding semantics, and the end-to-end
property the reference gates on — merged multi-SSM speculative output is
bit-identical to incremental greedy decoding (lossless), while verifying all
drafts in ONE LLM pass per iteration.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flexflow_tpu import specs
from flexflow_tpu.models import params as params_lib
from flexflow_tpu.serving import GenerationConfig, InferenceEngine, RequestManager
from flexflow_tpu.serving.spec_manager import MultiSSMSpecManager
from flexflow_tpu.serving.speculative import SpecEngine
from flexflow_tpu.serving.tree_merge import merge_dfs_trees

TINY = specs.ModelSpec(
    arch="LlamaForCausalLM",
    vocab_size=96,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    num_kv_heads=4,
    head_dim=16,
    intermediate_size=128,
    max_position_embeddings=256,
    norm_eps=1e-6,
)


def test_merge_dedups_shared_prefix():
    # tree A: root 7 -> [3 -> 5, 4]; tree B: root 7 -> [3 -> 6, 9]
    a = (np.asarray([7, 3, 4, 5]), np.asarray([-1, 0, 0, 1]))
    b = (np.asarray([7, 3, 9, 6]), np.asarray([-1, 0, 0, 1]))
    t, p, d = merge_dfs_trees([a, b], cap=16, pad_to=16)
    # shared (root->3) deduped: 7,3,4,5 then 9,6 appended
    np.testing.assert_array_equal(t[:6], [7, 3, 4, 5, 9, 6])
    np.testing.assert_array_equal(p[:6], [-1, 0, 0, 1, 0, 1])
    np.testing.assert_array_equal(d[:6], [0, 1, 1, 2, 1, 2])
    assert (p[6:] == -2).all()  # padding never matches a walk position


def test_merge_identical_trees_collapse():
    a = (np.asarray([7, 3, 4, 5]), np.asarray([-1, 0, 0, 1]))
    t, p, _ = merge_dfs_trees([a, a, a], cap=8, pad_to=8)
    np.testing.assert_array_equal(t[:4], [7, 3, 4, 5])
    assert (p[4:] == -2).all()


def test_merge_respects_cap():
    a = (np.asarray([7, 1, 2, 3]), np.asarray([-1, 0, 0, 0]))
    b = (np.asarray([7, 4, 5, 6]), np.asarray([-1, 0, 0, 0]))
    t, p, _ = merge_dfs_trees([a, b], cap=5, pad_to=8)
    np.testing.assert_array_equal(t[:5], [7, 1, 2, 3, 4])
    assert (p[5:] == -2).all()  # 5, 6 dropped at the cap


def test_merge_drops_orphaned_subtrees():
    # parent 1 dropped at cap -> its child must be dropped too, not orphaned
    a = (np.asarray([7, 1, 2]), np.asarray([-1, 0, 0]))
    b = (np.asarray([7, 4, 9]), np.asarray([-1, 0, 1]))  # 9 child of 4
    t, p, _ = merge_dfs_trees([a, b], cap=4, pad_to=8)
    np.testing.assert_array_equal(t[:4], [7, 1, 2, 4])
    assert (p[4:] == -2).all()  # 9's parent (4) kept, 9 dropped at cap


def test_merged_multi_ssm_matches_incremental():
    params = params_lib.init_params(TINY, jax.random.PRNGKey(0))

    def engine(width, depth):
        return SpecEngine(
            TINY, params, TINY, params,
            beam_width=width, beam_depth=depth,
            max_requests_per_batch=2, max_seq_len=160,
            cache_dtype=jnp.float32,
        )

    # two SSMs with different tree shapes share the one LLM cache
    mgr = MultiSSMSpecManager(
        [engine(2, 3), engine(1, 4)], merged=True
    )
    prompts = [[3, 17, 91, 5], [2, 4, 8, 16, 32]]
    cfg = GenerationConfig(max_new_tokens=24)
    got = mgr.generate(prompts, cfg)

    inc_engine = InferenceEngine(
        TINY, params, max_requests_per_batch=2, max_seq_len=160,
        cache_dtype=jnp.float32,
    )
    inc = RequestManager(inc_engine).generate(prompts, cfg)
    for g, i in zip(got, inc):
        assert g.output_tokens == i.output_tokens, (
            g.output_tokens, i.output_tokens)
    # merged mode verifies once per iteration across both drafts
    assert mgr.mean_verified_tokens_per_step > 1.0
