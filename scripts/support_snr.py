"""Support-code signal-to-noise diagnostic for episodic training.

Streams real augmented support batches through the learnet (the exact
MetaDataset train path: jitter/flip/HSV, mask synthesis — dataset.py:418-421
semantics) and measures whether the per-class dynamic-weight codes carry a
class signal at all:

  * within-class distance: mean ||code(draw, c) - mean_draws(code(c))||
  * across-class distance: mean ||mean_draws(code(c)) - grand mean||
  * 1-NN accuracy: held-out draw's code matched to the nearest other-draws
    class mean (chance = 1/n_cls)

If across/within is well below 1 and 1-NN is near chance, the support codes
are episode noise — the cross-copy classification gradient
(region_loss.py:303-335 semantics) has no consistent signal to follow and
streaming cls pins at ln(n_cls) regardless of LR or schedule. This is a
property of the DATASET (e.g. synthetic classes whose discriminative
feature is randomized per instance), not of the model: it separated "task
unlearnable" from "pipeline bug" in the round-3 investigation (PERF.md
"Streaming episodic learning").

Usage:
  python scripts/support_snr.py datacfg darknetcfg learnetcfg [weights]
"""

import random
import sys

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def measure(datacfg, darknetcfg, learnetcfg, weightfile=None, n_draws=6,
            seed=99):
    import jax
    import jax.numpy as jnp

    from fewshot_detection_tpu.cli.common import resolve_configs
    from fewshot_detection_tpu.data import MetaDataset
    from fewshot_detection_tpu.models import weights_io
    from fewshot_detection_tpu.models.meta import (
        MetaSpec, init_meta_params, meta_forward)
    from fewshot_detection_tpu.models.spec import build_spec

    data_options, dk, ln, settings = resolve_configs(
        datacfg, darknetcfg, learnetcfg)
    spec = MetaSpec(build_spec(dk), build_spec(ln))
    params = init_meta_params(spec, 0)
    if weightfile:
        (dp, lp), _ = weights_io.load_weights(
            weightfile, [spec.darknet, spec.learnet],
            [params["darknet"], params["learnet"]])
        params = {"darknet": dp, "learnet": lp}

    metaset = MetaDataset(data_options["meta"], settings, train=True,
                          num_replicas=1, rng=random.Random(seed))
    n_cls = len(metaset.classes)
    mit = metaset.batches(n_cls)
    draws = []
    for _ in range(n_draws):
        metax, mask = next(mit)
        dw, _ = meta_forward(spec, params,
                             jnp.asarray(metax, jnp.float32),
                             jnp.asarray(mask, jnp.float32),
                             metain_type=settings.metain_type, train=True)
        draws.append(np.concatenate(
            [np.asarray(w.astype(jnp.float32)).reshape(n_cls, -1)
             for w in jax.tree_util.tree_leaves(dw)], axis=1))

    C = np.stack(draws)                    # (D, n_cls, dim)
    mu = C.mean(axis=0)
    within = float(np.linalg.norm(C - mu[None], axis=-1).mean())
    across = float(np.linalg.norm(mu - mu.mean(0)[None], axis=-1).mean())
    correct = total = 0
    for d in range(len(C)):
        mu_o = np.delete(C, d, axis=0).mean(axis=0)
        for c in range(n_cls):
            correct += int(np.argmin(
                np.linalg.norm(mu_o - C[d, c][None], axis=-1)) == c)
            total += 1
    return {
        "n_cls": n_cls,
        "n_draws": n_draws,
        "within": round(within, 3),
        "across": round(across, 3),
        "ratio": round(across / max(within, 1e-9), 3),
        "nn_acc": round(correct / total, 3),
        "chance": round(1.0 / n_cls, 3),
    }


def main():
    import json

    import jax

    jax.config.update("jax_platforms", "cpu")
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(1)
    weights = sys.argv[4] if len(sys.argv) > 4 else None
    print(json.dumps(measure(sys.argv[1], sys.argv[2], sys.argv[3], weights)))


if __name__ == "__main__":
    main()
