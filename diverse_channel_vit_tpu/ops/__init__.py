from .initializers import trunc_normal_init, scaled_orthogonal_init, conv_patch_init
from .losses import (
    cross_entropy_loss,
    orthogonal_projection_loss,
    orthogonal_projection_loss_dense,
    proxy_loss,
)
from .sampling import (
    dcs_select,
    force_include,
    gumbel_topk,
    uniform_subset,
)
from .attention import multi_head_attention, flash_attention

__all__ = [
    "trunc_normal_init",
    "scaled_orthogonal_init",
    "conv_patch_init",
    "cross_entropy_loss",
    "proxy_loss",
    "orthogonal_projection_loss",
    "orthogonal_projection_loss_dense",
    "gumbel_topk",
    "uniform_subset",
    "force_include",
    "dcs_select",
    "multi_head_attention",
    "flash_attention",
]
