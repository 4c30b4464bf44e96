"""Synthetic VOC-like mini dataset for pipeline tests (test-only)."""

import os
import random

import numpy as np
from PIL import Image

VOC = ["aeroplane", "bicycle", "bird", "boat", "bottle",
       "bus", "car", "cat", "chair", "cow", "diningtable",
       "dog", "horse", "motorbike", "person", "pottedplant",
       "sheep", "sofa", "train", "tvmonitor"]


def make_voc_like(root, n_images=10, classes_per_image=2, size=(64, 48), seed=0):
    """Create images/, labels/, labels_1c/, list + dict files under root.
    Returns dict of useful paths."""
    rng = random.Random(seed)
    nprng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    lab_dir = os.path.join(root, "labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lab_dir, exist_ok=True)

    per_class_imgs = {c: [] for c in range(20)}
    img_paths = []
    for i in range(n_images):
        w, h = size
        arr = nprng.randint(0, 255, (h, w, 3), np.uint8)
        path = os.path.join(img_dir, f"im{i:03d}.png")
        Image.fromarray(arr).save(path)
        img_paths.append(path)

        rows = []
        # first box cycles classes so n_images >= 20 covers every class
        for j in range(rng.randint(1, classes_per_image)):
            cls = (i % 20) if j == 0 else rng.randrange(20)
            cx, cy = rng.uniform(0.25, 0.75), rng.uniform(0.25, 0.75)
            bw, bh = rng.uniform(0.1, 0.4), rng.uniform(0.1, 0.4)
            rows.append((cls, cx, cy, bw, bh))
            per_class_imgs[cls].append((path, (cls, cx, cy, bw, bh)))
        with open(os.path.join(lab_dir, f"im{i:03d}.txt"), "w") as f:
            for r in rows:
                f.write("%d %.6f %.6f %.6f %.6f\n" % r)

    # labels_1c per class
    cls_lists = {}
    for cid, items in per_class_imgs.items():
        cname = VOC[cid]
        d = os.path.join(root, "labels_1c", cname)
        os.makedirs(d, exist_ok=True)
        paths = []
        for path, row in items:
            base = os.path.basename(path).replace(".png", ".txt")
            with open(os.path.join(d, base), "a") as f:
                f.write("%d %.6f %.6f %.6f %.6f\n" % row)
            if path not in paths:
                paths.append(path)
        if paths:
            lst = os.path.join(root, f"{cname}_train.txt")
            with open(lst, "w") as f:
                f.write("\n".join(paths) + "\n")
            cls_lists[cname] = lst

    train_list = os.path.join(root, "train.txt")
    with open(train_list, "w") as f:
        f.write("\n".join(img_paths) + "\n")

    # traindict covering classes that have images
    traindict = os.path.join(root, "traindict.txt")
    with open(traindict, "w") as f:
        for cname, lst in cls_lists.items():
            f.write(f"{cname} {lst}\n")

    return {
        "root": root,
        "train_list": train_list,
        "traindict": traindict,
        "img_paths": img_paths,
        "cls_lists": cls_lists,
    }
