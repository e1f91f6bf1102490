"""TPU-native knowledge-distillation-by-cheap-conv-replacement framework.

Rebuilds the capabilities of lehduong/Knowledge-Distillation-by-Replacing-Cheap-Conv
(a DeepLabV3+ semantic-segmentation KD fork; see SURVEY.md — the reference
mount was empty, so capability citations point at BASELINE.json) as an
idiomatic JAX/XLA/Pallas framework:

- ``ops``      — TPU-first conv/resize/loss primitives (NHWC, lax + Pallas)
- ``models``   — flax NNX backbones (ResNet, MobileNetV2, Xception-65),
                 ASPP, DeepLabV3/V3+ heads, model factory
- ``kd``       — cheap-conv replacement surgery, KD losses, progressive schedule
- ``data``     — VOC/Cityscapes datasets, joint transforms, device prefetch
- ``train``    — jitted train/eval steps, optimizer groups, checkpointing
- ``parallel`` — mesh/sharding helpers (SPMD data parallelism over ICI)
- ``utils``    — streaming segmentation metrics, visualization
"""

__version__ = "0.1.0"
