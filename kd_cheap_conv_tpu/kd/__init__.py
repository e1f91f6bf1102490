from .replace import (
    AtrousSeparableConvolution,
    CheapConvSpec,
    backbone_stages,
    convert_to_separable_conv,
    replace_cheap_convs,
)
from .distill import KDConfig, HintAdapters, kd_total_loss, make_hint_adapters
from .cached import CachedLogitsDataset, precompute_teacher_logits
from .progressive import ProgressiveConfig, run_progressive
