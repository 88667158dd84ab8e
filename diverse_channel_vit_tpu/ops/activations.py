"""Activation helpers.

GELU exactness is a measured performance cliff on TPU: the erf-based exact
GELU (torch ``nn.GELU()`` default, used throughout the reference) costs
~1.8 ms/layer at flagship geometry because the erf evaluation neither
fuses into the producing GEMM nor runs fast on the VPU, while the
tanh-approximate form is FREE (12-layer MLP chain: 40.3 ms exact vs
18.8 ms tanh vs 18.7 ms with no gelu at all — it disappears into the GEMM
epilogue). max|gelu_tanh - gelu_erf| ≈ 3e-4 absolute, far below training
noise, so the tanh form is the default; set ``model.gelu_exact=true`` (or
flip :data:`GELU_EXACT_DEFAULT`) for bit-level parity runs — the golden
reference-parity tests do.
"""

from __future__ import annotations

from typing import Optional

import jax

# process-wide default, set once from config (trainer) before models build
GELU_EXACT_DEFAULT = False


def set_gelu_exact(exact: bool) -> None:
    global GELU_EXACT_DEFAULT
    GELU_EXACT_DEFAULT = bool(exact)


def gelu(x: jax.Array, exact: Optional[bool] = None) -> jax.Array:
    if exact is None:
        exact = GELU_EXACT_DEFAULT
    return jax.nn.gelu(x, approximate=not exact)
