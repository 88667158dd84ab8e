"""Channel sampling (HCS/DCS) distribution and invariant tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diverse_channel_vit_tpu.ops import dcs_select, force_include, gumbel_topk, uniform_subset


class TestGumbelTopK:
    def test_no_replacement(self):
        key = jax.random.PRNGKey(0)
        logits = jnp.zeros(10)
        for i in range(20):
            idx = np.asarray(gumbel_topk(jax.random.fold_in(key, i), logits, 6))
            assert len(set(idx.tolist())) == 6

    def test_distribution_matches_softmax_for_k1(self):
        # k=1 gumbel-top-k == categorical(softmax(logits))
        logits = jnp.log(jnp.array([0.7, 0.2, 0.1]))
        key = jax.random.PRNGKey(1)
        draws = jax.vmap(lambda k: gumbel_topk(k, logits, 1)[0])(
            jax.random.split(key, 4000)
        )
        counts = np.bincount(np.asarray(draws), minlength=3) / 4000
        np.testing.assert_allclose(counts, [0.7, 0.2, 0.1], atol=0.03)

    def test_peaky_temperature_is_deterministic_topk(self):
        # with very low temperature, sampling collapses to top-k
        scores = jnp.array([5.0, 1.0, 4.0, 0.5, 3.0]) / 1e-6
        key = jax.random.PRNGKey(2)
        idx = set(np.asarray(gumbel_topk(key, scores, 3)).tolist())
        assert idx == {0, 2, 4}


class TestUniformSubset:
    def test_uniform_marginals(self):
        key = jax.random.PRNGKey(3)
        draws = jax.vmap(lambda k: uniform_subset(k, 8, 3))(jax.random.split(key, 3000))
        counts = np.bincount(np.asarray(draws).ravel(), minlength=8) / (3000 * 3)
        np.testing.assert_allclose(counts, np.full(8, 1 / 8), atol=0.02)


class TestForceInclude:
    def test_noop_when_present(self):
        idx = jnp.array([3, 1, 4])
        out = force_include(idx, jnp.array(1))
        np.testing.assert_array_equal(np.asarray(out), [3, 1, 4])

    def test_overwrites_last_when_absent(self):
        idx = jnp.array([3, 1, 4])
        out = force_include(idx, jnp.array(0))
        np.testing.assert_array_equal(np.asarray(out), [3, 1, 0])


class TestDCS:
    def _embed(self):
        # channels 0,1 nearly parallel; channel 2 orthogonal to both
        return jnp.array(
            [
                [1.0, 0.0, 0.0],
                [0.999, 0.01, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.99, 0.1],
            ],
            jnp.float32,
        )

    def test_lowest_cosine_prefers_dissimilar(self):
        emb = self._embed()
        # aggregate over keys: pairs picked should mostly be cross-cluster
        hits = 0
        for i in range(200):
            idx = np.asarray(
                dcs_select(jax.random.PRNGKey(i), 2, "lowest_cosine", channel_embed=emb)
            )
            # anchor + its most dissimilar partner: one from {0,1}, one from {2,3}
            if (idx[0] in (0, 1)) != (idx[1] in (0, 1)):
                hits += 1
        assert hits == 200

    def test_lowest_cosine_prob_bias(self):
        emb = self._embed()
        cross = 0
        n = 400
        for i in range(n):
            idx = np.asarray(
                dcs_select(
                    jax.random.PRNGKey(i), 2, "lowest_cosine_prob", channel_embed=emb, temp=0.05
                )
            )
            if (idx[0] in (0, 1)) != (idx[1] in (0, 1)):
                cross += 1
        assert cross / n > 0.9  # strongly prefers diverse pairs at low temp

    def test_anchor_always_included(self):
        emb = self._embed()
        for i in range(50):
            key = jax.random.PRNGKey(i)
            idx = np.asarray(dcs_select(key, 2, "lowest_cosine_prob", channel_embed=emb, temp=10.0))
            anchor = int(jax.random.randint(jax.random.split(key)[0], (), 0, emb.shape[0]))
            assert anchor in idx.tolist()

    def test_jit_one_compile_per_k(self):
        emb = self._embed()
        fn = jax.jit(lambda k, e: dcs_select(k, 2, "lowest_cosine_prob", channel_embed=e))
        a = fn(jax.random.PRNGKey(0), emb)
        b = fn(jax.random.PRNGKey(1), emb)
        assert a.shape == b.shape == (2,)

    @pytest.mark.parametrize("method", ["uniform", "lowest_cosine", "highest_cosine", "lowest_cosine_prob"])
    def test_valid_distinct_indices(self, method):
        emb = self._embed()
        for i in range(30):
            idx = np.asarray(dcs_select(jax.random.PRNGKey(i), 3, method, channel_embed=emb))
            assert len(set(idx.tolist())) == 3
            assert ((idx >= 0) & (idx < 4)).all()
