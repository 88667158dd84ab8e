"""Ring attention (ops/ring_attention.py): sequence-parallel exactness.

The ``seq`` mesh axis is the TPU-native long-sequence scaling path
(channel-token sequences grow as C*(H/p)^2 — reference models/vit.py caps
at what one GPU holds). Forward and grads must match the dense oracle
bit-for-tolerance on the virtual 8-device CPU mesh.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from diverse_channel_vit_tpu.ops.attention import xla_attention
from diverse_channel_vit_tpu.ops.ring_attention import (
    pad_for_seq_shards,
    ring_attention,
    ring_attention_packed,
)
from diverse_channel_vit_tpu.parallel import make_mesh

B, H, N, DH = 2, 3, 64, 16


def _qkv(n=N, key=0):
    ks = jax.random.split(jax.random.key(key), 3)
    shape = (B, H, n, DH)
    return tuple(jax.random.normal(k, shape, jnp.float32) for k in ks)


def _ring_fn(mesh, axis_size, valid_len=None):
    fn = functools.partial(
        ring_attention, axis_name="seq", axis_size=axis_size,
        valid_len=valid_len,
    )
    spec = P(None, None, "seq", None)
    return jax.jit(
        jax.shard_map(
            lambda q, k, v: fn(q, k, v), mesh=mesh,
            in_specs=(spec, spec, spec), out_specs=spec,
        )
    )


@pytest.mark.parametrize("seq_devices", [2, 4, 8])
def test_ring_matches_dense(seq_devices):
    mesh = make_mesh({"seq": seq_devices}, devices=jax.devices()[:seq_devices])
    q, k, v = _qkv()
    got = _ring_fn(mesh, seq_devices)(q, k, v)
    want = xla_attention(q, k, v, DH**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ring_valid_len_masking():
    """Global-column masking across shards == dense masked attention,
    including a fully-masked trailing shard (N=64, valid 40: shard 7's
    whole block and half of shard 5's are pad)."""
    mesh = make_mesh({"seq": 8})
    q, k, v = _qkv(key=3)
    valid = 40
    got = _ring_fn(mesh, 8, valid_len=valid)(q, k, v)
    want = xla_attention(q, k, v, DH**-0.5, valid_len=valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ring_grads_match_dense():
    """jax.grad differentiates through the ppermute ring: dq/dk/dv equal
    the dense oracle's."""
    mesh = make_mesh({"seq": 4}, devices=jax.devices()[:4])
    q, k, v = _qkv(key=5)
    w = jax.random.normal(jax.random.key(9), (B, H, N, DH))

    ring = _ring_fn(mesh, 4)
    loss_ring = lambda q, k, v: jnp.sum(ring(q, k, v) * w)
    loss_dense = lambda q, k, v: jnp.sum(xla_attention(q, k, v, DH**-0.5) * w)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for gr, gd in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gd),
                                   atol=3e-5, rtol=3e-5)


def test_ring_packed_layout():
    """Lane-packed (B, N/P, H*dh) wrapper matches the head-split path."""
    mesh = make_mesh({"seq": 4}, devices=jax.devices()[:4])
    q, k, v = _qkv(key=7)
    pack = lambda x: x.transpose(0, 2, 1, 3).reshape(B, N, H * DH)
    spec = P(None, "seq", None)
    fn = jax.jit(
        jax.shard_map(
            lambda q, k, v: ring_attention_packed(
                q, k, v, H, axis_name="seq", axis_size=4),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        )
    )
    got = fn(pack(q), pack(k), pack(v))
    want = pack(xla_attention(q, k, v, DH**-0.5))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_pad_for_seq_shards():
    x = jnp.ones((2, 13, 8))
    xp, valid = pad_for_seq_shards(x, 4)
    assert xp.shape[1] == 16 and valid == 13
    assert float(jnp.sum(xp[:, 13:])) == 0.0
    x2, valid2 = pad_for_seq_shards(jnp.ones((2, 16, 8)), 4)
    assert x2.shape[1] == 16 and valid2 is None


# ---------------------------------------------------------------------------
# Sequence-parallel block stack (parallel/sequence.py)
# ---------------------------------------------------------------------------


def _stack(depth=2, dim=32, heads=2):
    from diverse_channel_vit_tpu.models.vit import BlockStack

    return BlockStack(depth=depth, num_heads=heads, mlp_ratio=2.0,
                      attention_impl="xla", remat=False)


def test_seq_parallel_blocks_match_unsharded():
    """BlockStack forward with tokens sharded over seq == unsharded, incl.
    pad masking when N doesn't divide the axis (N=25 over 4 shards)."""
    from diverse_channel_vit_tpu.parallel import make_mesh, seq_parallel_apply

    stack = _stack()
    dim, n = 32, 25
    x = jax.random.normal(jax.random.key(0), (2, n, dim))
    params = stack.init({"params": jax.random.key(1)}, x, train=False)["params"]
    want = stack.apply({"params": params}, x, train=False)

    mesh = make_mesh({"seq": 4}, devices=jax.devices()[:4])
    got = seq_parallel_apply(stack, params, x, mesh, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_seq_parallel_param_grads_match():
    """shard_map's transpose psums the weight grads over the seq axis:
    d(loss)/d(params) through seq_parallel_apply == unsharded."""
    from diverse_channel_vit_tpu.parallel import make_mesh, seq_parallel_apply

    stack = _stack()
    dim, n = 32, 32
    x = jax.random.normal(jax.random.key(2), (2, n, dim))
    params = stack.init({"params": jax.random.key(3)}, x, train=False)["params"]
    mesh = make_mesh({"seq": 4}, devices=jax.devices()[:4])

    g_sp = jax.grad(lambda p: jnp.sum(
        seq_parallel_apply(stack, p, x, mesh, train=False) ** 2))(params)
    g_ref = jax.grad(lambda p: jnp.sum(
        stack.apply({"params": p}, x, train=False) ** 2))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5),
        g_sp, g_ref,
    )


def test_seq_parallel_with_data_axis():
    """dp x sp mesh: batch over data, tokens over seq, same numbers."""
    from diverse_channel_vit_tpu.parallel import make_mesh, seq_parallel_apply

    stack = _stack()
    dim, n = 32, 16
    x = jax.random.normal(jax.random.key(4), (4, n, dim))
    params = stack.init({"params": jax.random.key(5)}, x, train=False)["params"]
    want = stack.apply({"params": params}, x, train=False)
    mesh = make_mesh({"data": 2, "seq": 4})
    got = seq_parallel_apply(stack, params, x, mesh, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
