from .transforms import (
    ExtCenterCrop,
    ExtCompose,
    ExtNormalize,
    ExtRandomCrop,
    ExtRandomHorizontalFlip,
    ExtRandomScale,
    ExtResize,
    ExtToArray,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from .voc import VOCSegmentation
from .cityscapes import Cityscapes
from .synthetic import SyntheticSegmentation
from .pipeline import make_loader, prefetch_to_device
