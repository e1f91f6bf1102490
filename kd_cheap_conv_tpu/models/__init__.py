from .factory import (
    MODEL_FACTORY,
    build_model,
    deeplabv3_mobilenet,
    deeplabv3_resnet50,
    deeplabv3_resnet101,
    deeplabv3_xception,
    deeplabv3plus_mobilenet,
    deeplabv3plus_resnet50,
    deeplabv3plus_resnet101,
    deeplabv3plus_xception,
)
from .deeplab import SegmentationModel
