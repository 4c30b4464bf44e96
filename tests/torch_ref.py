"""Independent torch (CPU) oracle for numerical parity tests.

Builds the forward pass from OUR NetSpec + params in NCHW using
torch.nn.functional, mirroring the layer semantics of the original PyTorch
implementation (conv+BN+leaky, stride-1 replicate-pad maxpool, the fork's
reorg permutation, route/shortcut). Used only inside tests to validate that
the JAX NHWC executor computes the same function.
"""

import numpy as np
import torch
import torch.nn.functional as F


def _to_torch_w(w_hwio):
    # HWIO -> OIHW
    return torch.from_numpy(np.ascontiguousarray(np.asarray(w_hwio).transpose(3, 2, 0, 1)))


def reorg_torch(x, stride=2):
    b, c, h, w = x.shape
    s = stride
    x = x.view(b, c, h // s, s, w // s, s).transpose(3, 4).contiguous()
    x = x.view(b, c, h // s * (w // s), s * s).transpose(2, 3).contiguous()
    x = x.view(b, c, s * s, h // s, w // s).transpose(1, 2).contiguous()
    return x.view(b, s * s * c, h // s, w // s)


def torch_forward(spec, params, x, train=False):
    """x: torch tensor NCHW float32. Returns final output NCHW."""
    outputs = {}
    for layer in spec.layers:
        kind = layer.kind
        p = params[layer.index]
        if kind == "conv":
            if layer.dynamic:
                raise NotImplementedError("static oracle only")
            w = _to_torch_w(p["w"])
            b = torch.from_numpy(np.asarray(p["b"])) if "b" in p else None
            x = F.conv2d(x, w, b, stride=layer.stride, padding=layer.pad,
                         groups=layer.groups)
            if layer.batch_normalize:
                bn = p["bn"]
                x = F.batch_norm(
                    x,
                    torch.from_numpy(np.asarray(bn["mean"])).clone(),
                    torch.from_numpy(np.asarray(bn["var"])).clone(),
                    torch.from_numpy(np.asarray(bn["gamma"])),
                    torch.from_numpy(np.asarray(bn["beta"])),
                    training=train,
                    momentum=0.1,
                    eps=1e-5,
                )
            if layer.activation == "leaky":
                x = F.leaky_relu(x, 0.1)
            elif layer.activation == "relu":
                x = F.relu(x)
        elif kind == "maxpool":
            if layer.stride == 1:
                x = F.max_pool2d(F.pad(x, (0, 1, 0, 1), mode="replicate"), 2, stride=1)
            else:
                x = F.max_pool2d(x, layer.size, layer.stride)
        elif kind == "reorg":
            x = reorg_torch(x, layer.stride)
        elif kind == "route":
            if len(layer.sources) == 1:
                x = outputs[layer.sources[0]]
            else:
                x = torch.cat([outputs[s] for s in layer.sources], dim=1)
        elif kind == "shortcut":
            x = outputs[layer.sources[0]] + outputs[layer.sources[1]]
            if layer.activation == "leaky":
                x = F.leaky_relu(x, 0.1)
        elif kind == "globalmax":
            x = F.max_pool2d(x, x.shape[-1])
        elif kind in ("globalavg", "avgpool"):
            x = F.adaptive_avg_pool2d(x, 1)
        elif kind == "softmax":
            x = F.softmax(x, dim=1)
        elif kind == "connected":
            w = torch.from_numpy(np.asarray(p["w"]).T.copy())
            b = torch.from_numpy(np.asarray(p["b"]))
            x = F.linear(x.reshape(x.shape[0], -1), w, b)
            if layer.activation == "leaky":
                x = F.leaky_relu(x, 0.1)
        elif kind in ("region", "cost"):
            pass
        elif kind == "split":
            bounds = np.cumsum((0,) + layer.splits)
            x = x[:, bounds[-2]: bounds[-1]]
        else:
            raise NotImplementedError(kind)
        outputs[layer.index] = x
    return x
