#!/usr/bin/env python3
"""Single-image forward/backward debugging harness (reference debug.py).

    python debug.py cfgfile weightfile imgpath

Loads one image + its label, runs forward + region loss + backward, prints
the first BN layer's parameters, activation samples, and per-layer gradient
norms — the gradient-hook analogue of the torch version (debug.py:68-92),
which printed any gradient blob whose max exceeded a threshold."""

import os
import sys

import numpy as np


def main(cfgfile, weightfile, imgpath):
    import jax
    import jax.numpy as jnp

    from fewshot_detection_tpu.config import parse_cfg
    from fewshot_detection_tpu.models import weights_io
    from fewshot_detection_tpu.models.darknet import apply_network, init_params
    from fewshot_detection_tpu.models.spec import build_spec
    from fewshot_detection_tpu.ops.region_loss import region_loss
    from fewshot_detection_tpu.utils.imaging import load_image_resized

    spec = build_spec(parse_cfg(cfgfile))
    params = init_params(spec, 0)
    if weightfile and os.path.exists(weightfile):
        (params,), _ = weights_io.load_weights(weightfile, [spec], [params])

    from fewshot_detection_tpu.data.datasets import get_labpath, topath

    labpath = get_labpath(topath(imgpath))
    label = np.zeros((1, 50, 5), np.float32)
    if os.path.exists(labpath) and os.path.getsize(labpath):
        rows = np.loadtxt(labpath).reshape(-1, 5)[:50]
        label[0, : rows.shape[0]] = rows

    first_bn = next(
        p["bn"] for l, p in zip(spec.layers, params)
        if l.kind == "conv" and l.batch_normalize
    )
    print("--- bn gamma ---\n", np.asarray(first_bn["gamma"])[:8])
    print("--- bn beta ---\n", np.asarray(first_bn["beta"])[:8])
    print("--- bn running_mean ---\n", np.asarray(first_bn["mean"])[:8])
    print("--- bn running_var ---\n", np.asarray(first_bn["var"])[:8])

    img = load_image_resized(imgpath, spec.width, spec.height)[None]
    print("----- img -----\n", img.ravel()[:16])
    print("----- target -----\n", label.ravel()[:16])

    region = spec.region

    def loss_fn(p):
        y, _ = apply_network(spec, p, jnp.asarray(img), train=True)
        loss, metrics = region_loss(
            y, jnp.asarray(label), jnp.ones(1), jnp.asarray(0), region
        )
        return loss, (y, metrics)

    (loss, (y, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    print("----- output -----\n", np.asarray(y).ravel()[:16])
    print(f"loss = {float(loss):.6f}  nGT={int(metrics['nGT'])}")

    print("----- gradient norms per layer -----")
    for layer, g in zip(spec.layers, grads):
        if g is None:
            continue
        gw = np.asarray(g["w"])
        line = f"layer {layer.index:3d} {layer.kind:<6s} |dw|max {np.abs(gw).max():.3e}"
        if np.abs(gw).max() > 10:
            line += "   <-- LARGE"
        print(line)


if __name__ == "__main__":
    if len(sys.argv) == 4:
        main(sys.argv[1], sys.argv[2], sys.argv[3])
    else:
        print("Usage: python debug.py cfgfile weightfile imgpath")
