"""Pascal VOC 2012 segmentation dataset (SURVEY.md §2.3).

Supports image_set 'train' / 'val' / 'trainaug' (10,582-image SBD-augmented
split using SegmentationClassAug labels — BASELINE.json config #2). 21
classes, ignore_index 255, `decode_target` color palette for visualization.

Offline environment: the dataset cannot be downloaded (SURVEY.md §7); the
loader reads a local VOCdevkit tree if present and raises a clear error
otherwise. Use data.synthetic for tests/benchmarks without real data.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

VOC_CLASSES = (
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
    "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


def voc_cmap(n: int = 256) -> np.ndarray:
    """The standard VOC color map (bit-reversal palette)."""
    cmap = np.zeros((n, 3), dtype=np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


_CMAP = voc_cmap()


class VOCSegmentation:
    """Indexable dataset yielding (image uint8 HWC, label uint8 HW)."""

    num_classes = 21
    ignore_index = 255

    def __init__(self, root: str, image_set: str = "train", transform=None,
                 year: str = "2012"):
        self.transform = transform
        base = os.path.join(root, f"VOC{year}")
        if not os.path.isdir(base):
            # allow root to already point at the VOC20XX directory
            if os.path.isdir(os.path.join(root, "JPEGImages")):
                base = root
            else:
                raise FileNotFoundError(
                    f"VOC dataset not found under {root!r}. This environment "
                    "is offline; provide a local VOCdevkit/VOC2012 tree or use "
                    "data.synthetic.SyntheticSegmentation."
                )
        image_dir = os.path.join(base, "JPEGImages")
        if image_set == "trainaug":
            mask_dir = os.path.join(base, "SegmentationClassAug")
            split_f = os.path.join(base, "ImageSets", "Segmentation",
                                   "train_aug.txt")
            if not os.path.isfile(split_f):
                split_f = os.path.join(base, "ImageSets", "Segmentation",
                                       "trainaug.txt")
        else:
            mask_dir = os.path.join(base, "SegmentationClass")
            split_f = os.path.join(base, "ImageSets", "Segmentation",
                                   f"{image_set}.txt")
        with open(split_f) as f:
            names = [ln.strip() for ln in f if ln.strip()]
        self.images = [os.path.join(image_dir, n + ".jpg") for n in names]
        self.masks = [os.path.join(mask_dir, n + ".png") for n in names]

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx, rng: np.random.Generator | None = None):
        img = np.asarray(Image.open(self.images[idx]).convert("RGB"))
        lbl = np.asarray(Image.open(self.masks[idx]))
        if self.transform is not None:
            img, lbl = self.transform(img, lbl, rng)
        return img, lbl

    @classmethod
    def decode_target(cls, mask) -> np.ndarray:
        """train ids -> RGB colors for visualization."""
        mask = np.asarray(mask)
        return _CMAP[np.where(mask == 255, 0, mask)]
