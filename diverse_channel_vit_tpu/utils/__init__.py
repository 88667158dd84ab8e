from .enums import (
    ChannelInitialization,
    ChannelPoolingType,
    DataSplit,
    FeaturePooling,
    FirstLayerInit,
    NewChannelLeaveOneOut,
    NormType,
)
from .misc import AverageMeter, Timer, set_seeds

__all__ = [
    "ChannelInitialization",
    "ChannelPoolingType",
    "DataSplit",
    "FeaturePooling",
    "FirstLayerInit",
    "NewChannelLeaveOneOut",
    "NormType",
    "AverageMeter",
    "Timer",
    "set_seeds",
]
