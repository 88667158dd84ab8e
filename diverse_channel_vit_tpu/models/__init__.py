"""Model zoo.

Importing this package populates :data:`MODEL_REGISTRY`
(reference ``models/__init__.py`` exports 12 factories; this zoo grows to
match — see SURVEY.md §2.3/2.4 for the inventory).
"""

from .registry import MODEL_REGISTRY, build_model, register_model
from . import dichavit  # noqa: F401  (registers dichavit, channelvit_adapt)
from . import vit_adapt  # noqa: F401
from . import depthwise_vit  # noqa: F401  (registers depthwisevit_adapt)
from . import hyper_vit  # noqa: F401  (registers hypervit_adapt)
from . import template_mixing_vit  # noqa: F401  (registers templatemixingvit)
from . import convnext_variants  # noqa: F401  (registers the 6 ConvNeXt models)

from .channel_vit import ChannelVisionTransformer, SIZE_PRESETS
from .wrappers import ChannelAdaptiveClassifier, model_scale

__all__ = [
    "MODEL_REGISTRY",
    "build_model",
    "register_model",
    "ChannelVisionTransformer",
    "ChannelAdaptiveClassifier",
    "model_scale",
    "SIZE_PRESETS",
]
