"""Real-TPU smoke of the fused path at non-flagship geometries:

- CHAMMI-like 12-channel 224^2 (2353 -> 2432 tokens) with proxy+TDL losses
- ViT-base width (D=768, 12 heads) at JUMP-CP geometry, smaller batch
- dh=128 (3 heads) sanity re-run
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diverse_channel_vit_tpu.compile_cache import enable

enable()

from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier
from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
from diverse_channel_vit_tpu.training.schedules import make_lr_schedule
from diverse_channel_vit_tpu.training.steps import make_train_step


def smoke(tag, *, c, img, dim, depth, heads, batch, loss_type, with_head,
          k=None, patch=16):
    backbone = ChannelVisionTransformer(
        num_total_channels=c, img_size=img, patch_size=patch, embed_dim=dim,
        depth=depth, num_heads=heads, proxy_loss_lambda=0.1,
        ortho_loss_v1_lambda=1.0, dtype=jnp.bfloat16,
    )
    model = ChannelAdaptiveClassifier(backbone=backbone, embed_dim=dim,
                                      num_classes=21, with_head=with_head)
    lr = make_lr_schedule("cosine", 4e-5, dict(t_initial=10, warmup_t=1,
                                               warmup_lr_init=1e-6),
                          num_epochs=10, steps_per_epoch=10)
    tx = make_optimizer("adamw", dict(weight_decay=0.04), lr_schedule=lr,
                        total_steps=100)
    x0 = jnp.zeros((2, c, img, img), jnp.float32)
    state = create_train_state(model, tx, rng=jax.random.key(0),
                               sample_input=x0, sample_channel_ids=jnp.arange(c))
    step = make_train_step(model, channel_ids=range(c), k=k,
                           hcs_method="lowest_cosine_prob" if k else "none",
                           patch_size=patch, loss_type=loss_type,
                           extra_loss_lambda=1.0, donate=True)
    data = {"image": jax.random.normal(jax.random.key(1), (batch, c, img, img)),
            "label": jnp.arange(batch) % 21}
    key = jax.random.key(2)
    state, m = step(state, data, key)
    loss0 = float(m["loss"])
    t0 = time.perf_counter()
    iters = 5
    for i in range(iters):
        state, m = step(state, data, jax.random.fold_in(key, i))
    loss1 = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    import math

    ok = math.isfinite(loss0) and math.isfinite(loss1)
    print(f"{tag}: loss {loss0:.4f} -> {loss1:.4f} finite={ok} "
          f"{dt*1e3:.0f} ms/step ({batch/dt:.1f} imgs/s)", flush=True)
    assert ok, tag


if __name__ == "__main__":
    # CHAMMI-superset geometry: 12 channels -> 12*196+1 = 2353 -> pad 2432
    smoke("chammi12 proxy+TDL ViT-S", c=12, img=224, dim=384, depth=12,
          heads=6, batch=32, loss_type="proxy", with_head=False)
    # DCS sampling at k=5 of 12 (981 -> 1024 tokens)
    smoke("chammi12 DCS k=5", c=12, img=224, dim=384, depth=12, heads=6,
          batch=32, loss_type="proxy", with_head=False, k=5)
    # ViT-base width
    smoke("base D=768 jump_cp", c=8, img=224, dim=768, depth=12, heads=12,
          batch=16, loss_type="ce", with_head=True)
    # MXU-native geometry
    smoke("dh128 jump_cp", c=8, img=224, dim=384, depth=12, heads=3,
          batch=64, loss_type="ce", with_head=True)
    # So2Sat geometry: 18 channels, 32x32, patch 8 -> 18*16+1 = 289 tokens
    # (odd/unpadded -> exercises the UNfused packed-flash path on TPU)
    smoke("so2sat 18ch p8", c=18, img=32, dim=384, depth=12, heads=6,
          batch=128, loss_type="ce", with_head=True, patch=8)
