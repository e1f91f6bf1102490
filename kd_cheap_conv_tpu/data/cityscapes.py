"""Cityscapes dataset with the 34->19 train-id label remap
(SURVEY.md §2.3, BASELINE.json:5 "label remap"; config #3 uses fine
annotations at 769² crops).

The class table (name, id, train_id, color) matches the official Cityscapes
label definitions; `encode_target` maps raw ids to train ids (unused -> 255)
via a lookup table, `decode_target` maps train ids to colors.
"""

from __future__ import annotations

import os
from collections import namedtuple

import numpy as np
from PIL import Image

CityscapesClass = namedtuple(
    "CityscapesClass",
    ["name", "id", "train_id", "category", "category_id", "has_instances",
     "ignore_in_eval", "color"],
)

# Official cityscapesScripts label table.
CLASSES = [
    CityscapesClass("unlabeled",            0, 255, "void", 0, False, True, (0, 0, 0)),
    CityscapesClass("ego vehicle",          1, 255, "void", 0, False, True, (0, 0, 0)),
    CityscapesClass("rectification border", 2, 255, "void", 0, False, True, (0, 0, 0)),
    CityscapesClass("out of roi",           3, 255, "void", 0, False, True, (0, 0, 0)),
    CityscapesClass("static",               4, 255, "void", 0, False, True, (0, 0, 0)),
    CityscapesClass("dynamic",              5, 255, "void", 0, False, True, (111, 74, 0)),
    CityscapesClass("ground",               6, 255, "void", 0, False, True, (81, 0, 81)),
    CityscapesClass("road",                 7, 0, "flat", 1, False, False, (128, 64, 128)),
    CityscapesClass("sidewalk",             8, 1, "flat", 1, False, False, (244, 35, 232)),
    CityscapesClass("parking",              9, 255, "flat", 1, False, True, (250, 170, 160)),
    CityscapesClass("rail track",          10, 255, "flat", 1, False, True, (230, 150, 140)),
    CityscapesClass("building",            11, 2, "construction", 2, False, False, (70, 70, 70)),
    CityscapesClass("wall",                12, 3, "construction", 2, False, False, (102, 102, 156)),
    CityscapesClass("fence",               13, 4, "construction", 2, False, False, (190, 153, 153)),
    CityscapesClass("guard rail",          14, 255, "construction", 2, False, True, (180, 165, 180)),
    CityscapesClass("bridge",              15, 255, "construction", 2, False, True, (150, 100, 100)),
    CityscapesClass("tunnel",              16, 255, "construction", 2, False, True, (150, 120, 90)),
    CityscapesClass("pole",                17, 5, "object", 3, False, False, (153, 153, 153)),
    CityscapesClass("polegroup",           18, 255, "object", 3, False, True, (153, 153, 153)),
    CityscapesClass("traffic light",       19, 6, "object", 3, False, False, (250, 170, 30)),
    CityscapesClass("traffic sign",        20, 7, "object", 3, False, False, (220, 220, 0)),
    CityscapesClass("vegetation",          21, 8, "nature", 4, False, False, (107, 142, 35)),
    CityscapesClass("terrain",             22, 9, "nature", 4, False, False, (152, 251, 152)),
    CityscapesClass("sky",                 23, 10, "sky", 5, False, False, (70, 130, 180)),
    CityscapesClass("person",              24, 11, "human", 6, True, False, (220, 20, 60)),
    CityscapesClass("rider",               25, 12, "human", 6, True, False, (255, 0, 0)),
    CityscapesClass("car",                 26, 13, "vehicle", 7, True, False, (0, 0, 142)),
    CityscapesClass("truck",               27, 14, "vehicle", 7, True, False, (0, 0, 70)),
    CityscapesClass("bus",                 28, 15, "vehicle", 7, True, False, (0, 60, 100)),
    CityscapesClass("caravan",             29, 255, "vehicle", 7, True, True, (0, 0, 90)),
    CityscapesClass("trailer",             30, 255, "vehicle", 7, True, True, (0, 0, 110)),
    CityscapesClass("train",               31, 16, "vehicle", 7, True, False, (0, 80, 100)),
    CityscapesClass("motorcycle",          32, 17, "vehicle", 7, True, False, (0, 0, 230)),
    CityscapesClass("bicycle",             33, 18, "vehicle", 7, True, False, (119, 11, 32)),
    CityscapesClass("license plate",       -1, 255, "vehicle", 7, False, True, (0, 0, 142)),
]

# id -> train_id lookup (256-entry for uint8 labels; unused ids -> 255)
_ID_TO_TRAIN = np.full(256, 255, dtype=np.uint8)
for c in CLASSES:
    if c.id >= 0:
        _ID_TO_TRAIN[c.id] = c.train_id

# train_id -> color (19 classes + 255->black)
_TRAIN_TO_COLOR = np.zeros((256, 3), dtype=np.uint8)
for c in CLASSES:
    if c.train_id != 255:
        _TRAIN_TO_COLOR[c.train_id] = c.color


def encode_target(target) -> np.ndarray:
    """Raw Cityscapes ids (0..33) -> train ids (0..18, void=255)."""
    target = np.asarray(target, dtype=np.uint8)
    try:
        from ..native import remap_u8

        out = remap_u8(target, _ID_TO_TRAIN)
        if out is not None:
            return out
    except Exception:
        pass
    return _ID_TO_TRAIN[target]


def decode_target(target) -> np.ndarray:
    """Train ids -> RGB colors."""
    return _TRAIN_TO_COLOR[np.asarray(target, dtype=np.uint8)]


class Cityscapes:
    """Indexable dataset yielding (image uint8 HWC, train-id label uint8 HW).

    Layout: root/leftImg8bit/{split}/{city}/*_leftImg8bit.png and
    root/gtFine/{split}/{city}/*_gtFine_labelIds.png.
    """

    num_classes = 19
    ignore_index = 255
    encode_target = staticmethod(encode_target)
    decode_target = staticmethod(decode_target)

    def __init__(self, root: str, split: str = "train", mode: str = "fine",
                 transform=None):
        self.transform = transform
        gt_dir = "gtFine" if mode == "fine" else "gtCoarse"
        img_root = os.path.join(root, "leftImg8bit", split)
        lbl_root = os.path.join(root, gt_dir, split)
        if not os.path.isdir(img_root):
            raise FileNotFoundError(
                f"Cityscapes not found under {root!r}. This environment is "
                "offline; provide a local tree or use data.synthetic."
            )
        self.images, self.targets = [], []
        for city in sorted(os.listdir(img_root)):
            cdir = os.path.join(img_root, city)
            for fname in sorted(os.listdir(cdir)):
                self.images.append(os.path.join(cdir, fname))
                base = fname.replace("_leftImg8bit.png", "")
                self.targets.append(os.path.join(
                    lbl_root, city, f"{base}_{gt_dir}_labelIds.png"))

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx, rng: np.random.Generator | None = None):
        img = np.asarray(Image.open(self.images[idx]).convert("RGB"))
        lbl = encode_target(np.asarray(Image.open(self.targets[idx])))
        if self.transform is not None:
            img, lbl = self.transform(img, lbl, rng)
        return img, lbl
