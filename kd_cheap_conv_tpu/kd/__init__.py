from .replace import (
    AtrousSeparableConvolution,
    backbone_stages,
    convert_to_separable_conv,
    replace_cheap_convs,
)
from .distill import KDConfig, HintAdapters
