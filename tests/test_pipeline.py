"""Pipeline parallelism (parallel/pipeline.py): GPipe over a pipe mesh axis.

The stacked-params layout is exactly BlockStack's nn.scan layout, so the
pipeline consumes real model checkpoints; forward and parameter grads must
match the sequential stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diverse_channel_vit_tpu.models.vit import Block, BlockStack
from diverse_channel_vit_tpu.parallel import make_mesh
from diverse_channel_vit_tpu.parallel.pipeline import pipeline_apply

DIM, N, HEADS = 32, 16, 2


def _stacked(depth=4, key=0):
    stack = BlockStack(depth=depth, num_heads=HEADS, mlp_ratio=2.0,
                       attention_impl="xla", remat=False)
    x = jnp.zeros((2, N, DIM))
    params = stack.init({"params": jax.random.key(key)}, x, train=False)["params"]
    return stack, params


def _block_apply(layer_params, h):
    block = Block(num_heads=HEADS, mlp_ratio=2.0, attention_impl="xla")
    return block.apply({"params": layer_params}, h, train=False)


@pytest.mark.parametrize("pipe,m", [(2, 4), (4, 4), (4, 8)])
def test_pipeline_matches_sequential(pipe, m):
    stack, params = _stacked(depth=4)
    x = jax.random.normal(jax.random.key(1), (8, N, DIM))
    want = stack.apply({"params": params}, x, train=False)
    mesh = make_mesh({"pipe": pipe}, devices=jax.devices()[:pipe])
    got = pipeline_apply(_block_apply, params["blocks"]["block"], x, mesh,
                         n_microbatches=m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_pipeline_grads_match_sequential():
    """Reverse pipeline via autodiff: d(loss)/d(stacked params) equals the
    sequential stack's."""
    stack, params = _stacked(depth=4, key=2)
    x = jax.random.normal(jax.random.key(3), (4, N, DIM))
    mesh = make_mesh({"pipe": 4}, devices=jax.devices()[:4])

    g_pp = jax.grad(lambda p: jnp.sum(pipeline_apply(
        _block_apply, p["blocks"]["block"], x, mesh, n_microbatches=4) ** 2))(params)
    g_ref = jax.grad(lambda p: jnp.sum(
        stack.apply({"params": p}, x, train=False) ** 2))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5),
        g_pp, g_ref,
    )


def test_pipeline_multi_block_stage():
    """depth 8 on 2 stages: each device scans 4 local blocks."""
    stack, params = _stacked(depth=8, key=4)
    x = jax.random.normal(jax.random.key(5), (4, N, DIM))
    want = stack.apply({"params": params}, x, train=False)
    mesh = make_mesh({"pipe": 2}, devices=jax.devices()[:2])
    got = pipeline_apply(_block_apply, params["blocks"]["block"], x, mesh,
                         n_microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
