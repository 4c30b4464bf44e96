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


def torch_forward(spec, params, x, train=False, start=0, stop=None):
    """x: torch tensor NCHW float32. Returns final output NCHW."""
    y, _ = torch_walk(spec, params, x, train=train, start=start, stop=stop)
    return y


def torch_walk(spec, params, x, train=False, start=0, stop=None):
    """Like torch_forward but also collects [split] layer outputs, in order
    (darknet_meta.py:120-126: each Split emits a dynamic-weight tensor)."""
    outputs = {}
    splits = []
    stop = len(spec.layers) if stop is None else stop
    for layer in spec.layers[start:stop]:
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
            splits.append(x[:, bounds[0]: bounds[1]])
            x = x[:, bounds[-2]: bounds[-1]]
        else:
            raise NotImplementedError(kind)
        outputs[layer.index] = x
    return x, splits


# ---------------------------------------------------------------------------
# meta path oracle — direct port of the reference's dynamic semantics
# (/root/reference/dynamic_conv.py:110-168, darknet_meta.py:16-35, 107-195)
# ---------------------------------------------------------------------------


def dynamic_conv_torch(x, dw, layer, is_first, shared_w=None):
    """Reference DynamicConv2d.forward (dynamic_conv.py:125-164), NCHW.

    x: (B, C, H, W) if is_first else (B*n_cls, C, H, W)
    dw: (n_cls, Cd, kh, kw); shared_w: (partial, kh, kw) or None.
    """
    n_cls = dw.size(0)
    if shared_w is not None:
        dw = torch.cat([shared_w.unsqueeze(0).repeat(n_cls, 1, 1, 1), dw], dim=1)
    n_channels = x.size(1)
    if is_first:
        inp = x.repeat(1, n_cls, 1, 1)
    else:
        assert x.size(0) % n_cls == 0
        b = x.size(0) // n_cls
        inp = x.view(b, n_cls * n_channels, x.size(2), x.size(3))
    group_size = dw.size(1) // n_channels
    groups = n_cls * n_channels // group_size
    w = dw.reshape(-1, group_size, dw.size(2), dw.size(3))
    y = F.conv2d(inp, w, None, layer.stride, layer.pad, 1, groups)
    return y.view(-1, n_channels, y.size(-2), y.size(-1))


def maybe_repeat_torch(x1, x2):
    """darknet_meta.py:16-35 — b-major class broadcast of the smaller batch."""
    n1, n2 = x1.size(0), x2.size(0)
    if n1 < n2:
        assert n2 % n1 == 0
        shape = x1.shape[1:]
        x1 = x1.repeat(n2 // n1, *[1] * x1.dim()).transpose(0, 1).contiguous()
        x1 = x1.view(-1, *shape)
    elif n1 > n2:
        assert n1 % n2 == 0
        shape = x2.shape[1:]
        x2 = x2.repeat(n1 // n2, *[1] * x2.dim()).transpose(0, 1).contiguous()
        x2 = x2.view(-1, *shape)
    return x1, x2


def torch_meta_forward(spec, params, metax, mask, metain_type=2, train=False):
    """darknet_meta.py:107-128: optional backbone-stem prefix (6-ch split
    trick), mask concat, learnet walk collecting split outputs + final."""
    feat_layer = spec.learnet.feat_layer
    if feat_layer > 0:
        done_split = metax.size(1) == 6
        if done_split:
            metax = torch.cat(torch.split(metax, 3, dim=1))
        metax = torch_forward(
            spec.darknet, params["darknet"], metax, train=train, stop=feat_layer
        )
        if done_split:
            metax = torch.cat(torch.split(metax, metax.size(0) // 2), dim=1)
    if metain_type in (2, 3):
        metax = torch.cat([metax, mask], dim=1)
    out, splits = torch_walk(spec.learnet, params["learnet"], metax, train=train)
    return splits + [out]


def torch_detect_forward(spec, params, x, dynamic_weights, train=False):
    """darknet_meta.py:130-195: backbone walk where dynamic convs consume the
    class codes and 2-source routes class-broadcast via maybe_repeat."""
    dparams = params["darknet"]
    outputs = {}
    dyn_cnt = 0
    for layer in spec.darknet.layers:
        kind = layer.kind
        p = dparams[layer.index]
        if kind == "conv" and layer.dynamic:
            shared = None
            if layer.partial is not None:
                # stored HWIO-style (kh, kw, partial) -> (partial, kh, kw)
                shared = torch.from_numpy(
                    np.ascontiguousarray(np.asarray(p["w"]).transpose(2, 0, 1))
                )
            dw = dynamic_weights[dyn_cnt]
            x = dynamic_conv_torch(x, dw, layer, dyn_cnt == 0, shared)
            dyn_cnt += 1
            if layer.batch_normalize:
                bn = p["bn"]
                x = F.batch_norm(
                    x,
                    torch.from_numpy(np.asarray(bn["mean"])).clone(),
                    torch.from_numpy(np.asarray(bn["var"])).clone(),
                    torch.from_numpy(np.asarray(bn["gamma"])),
                    torch.from_numpy(np.asarray(bn["beta"])),
                    training=train, momentum=0.1, eps=1e-5,
                )
            if layer.activation == "leaky":
                x = F.leaky_relu(x, 0.1)
        elif kind == "route":
            if len(layer.sources) == 1:
                x = outputs[layer.sources[0]]
            else:
                x1, x2 = outputs[layer.sources[0]], outputs[layer.sources[1]]
                if not layer.concat:
                    x = (x1, x2)
                else:
                    x1, x2 = maybe_repeat_torch(x1, x2)
                    x = torch.cat((x1, x2), 1)
        elif kind == "shortcut":
            x = outputs[layer.sources[0]] + outputs[layer.sources[1]]
            if layer.activation == "leaky":
                x = F.leaky_relu(x, 0.1)
        else:
            x = torch_forward(
                spec.darknet, dparams, x, train=train,
                start=layer.index, stop=layer.index + 1,
            )
        outputs[layer.index] = x
    return x


def get_region_boxes_v2_torch(output, n_models, conf_thresh, num_classes,
                              anchors, num_anchors, only_objectness=1,
                              validation=False):
    """CPU port of the reference meta decode (utils.py:195-290): cross-copy
    softmax over the n_models batch copies, then the triple filter loop."""
    cs = n_models
    nA, nC = num_anchors, num_classes
    anchor_step = len(anchors) // num_anchors
    if output.dim() == 3:
        output = output.unsqueeze(0)
    batch = output.size(0)
    assert output.size(1) == (5 + nC) * nA
    nH = h = output.size(2)
    nW = w = output.size(3)
    assert batch % n_models == 0
    bs = batch // n_models

    cls = output.view(batch, nA, 5 + nC, nH, nW)
    cls = cls.index_select(2, torch.linspace(5, 5 + nC - 1, nC).long()).squeeze()
    cls = cls.reshape(bs, cs, nA * nC * nH * nW).transpose(1, 2).contiguous()
    cls = cls.view(bs * nA * nC * nH * nW, cs)
    cls = torch.nn.Softmax(dim=1)(cls)
    cls_confs = (
        cls.view(bs, nA * nC * nH * nW, cs).transpose(1, 2).contiguous()
        .view(bs * cs * nA, nC, nH * nW).transpose(1, 2).reshape(-1, nC)
    )

    output = output.view(batch * nA, 5 + nC, h * w).transpose(0, 1).contiguous()
    output = output.view(5 + nC, batch * nA * h * w)
    grid_x = torch.linspace(0, w - 1, w).repeat(h, 1).repeat(
        batch * nA, 1, 1).view(-1)
    grid_y = torch.linspace(0, h - 1, h).repeat(w, 1).t().repeat(
        batch * nA, 1, 1).view(-1)
    xs = torch.sigmoid(output[0]) + grid_x
    ys = torch.sigmoid(output[1]) + grid_y
    anchor_w = torch.Tensor(anchors).view(nA, anchor_step).index_select(
        1, torch.LongTensor([0]))
    anchor_h = torch.Tensor(anchors).view(nA, anchor_step).index_select(
        1, torch.LongTensor([1]))
    anchor_w = anchor_w.repeat(batch, 1).repeat(1, 1, h * w).view(-1)
    anchor_h = anchor_h.repeat(batch, 1).repeat(1, 1, h * w).view(-1)
    ws = torch.exp(output[2]) * anchor_w
    hs = torch.exp(output[3]) * anchor_h
    det_confs = torch.sigmoid(output[4])
    cls_max_confs, cls_max_ids = torch.max(cls_confs, 1)
    cls_max_confs = cls_max_confs.view(-1)
    cls_max_ids = cls_max_ids.view(-1)

    sz_hw = h * w
    sz_hwa = sz_hw * nA
    all_boxes = []
    for b in range(batch):
        boxes = []
        for cy in range(h):
            for cx in range(w):
                for i in range(nA):
                    ind = b * sz_hwa + i * sz_hw + cy * w + cx
                    det_conf = float(det_confs[ind])
                    conf = det_conf if only_objectness else det_conf * float(
                        cls_max_confs[ind])
                    if conf > conf_thresh:
                        box = [
                            float(xs[ind]) / w, float(ys[ind]) / h,
                            float(ws[ind]) / w, float(hs[ind]) / h,
                            det_conf, float(cls_max_confs[ind]),
                            int(cls_max_ids[ind]),
                        ]
                        if (not only_objectness) and validation:
                            for c in range(nC):
                                tmp = float(cls_confs[ind][c])
                                if c != box[6] and det_conf * tmp > conf_thresh:
                                    box.extend([tmp, c])
                        boxes.append(box)
        all_boxes.append(boxes)
    return all_boxes
