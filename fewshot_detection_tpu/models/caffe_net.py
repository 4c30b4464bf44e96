"""Caffe prototxt import (reference models/caffe_net.py:55-331 equivalent).

Parses a .prototxt network description and converts the layer graph into
darknet block form so the standard NetSpec executor runs it. Supported
layers: Convolution (+BatchNorm/Scale pairs), ReLU (merged into the
producing layer), Pooling (MAX / AVE / global), InnerProduct, Softmax,
Eltwise SUM (-> shortcut), Concat (-> route). `.caffemodel` weight import
required the caffe runtime in the reference too (caffe_net.py:157-159) and
is not supported; initialize or convert weights externally."""

from __future__ import annotations

import re


def parse_prototxt(protofile: str) -> dict:
    """Minimal recursive prototxt parser -> {props, layers: [dict]}.

    Repeated keys (e.g. `top`) collect into lists."""
    with open(protofile) as f:
        text = f.read()
    # strip comments
    text = re.sub(r"#.*", "", text)
    tokens = re.findall(r"\"[^\"]*\"|'[^']*'|[\w.+-]+|[{}:]", text)

    pos = 0

    def parse_block():
        nonlocal pos
        block: dict = {}
        while pos < len(tokens):
            tok = tokens[pos]
            if tok == "}":
                pos += 1
                return block
            key = tok
            pos += 1
            if pos < len(tokens) and tokens[pos] == ":":
                pos += 1
                val = tokens[pos]
                pos += 1
                val = val.strip("\"'")
                _insert(block, key, val)
            elif pos < len(tokens) and tokens[pos] == "{":
                pos += 1
                sub = parse_block()
                _insert(block, key, sub)
            else:
                _insert(block, key, True)
        return block

    def _insert(block, key, val):
        if key in block:
            if not isinstance(block[key], list):
                block[key] = [block[key]]
            block[key].append(val)
        else:
            block[key] = val

    top = parse_block()
    layers = top.pop("layer", [])
    if isinstance(layers, dict):
        layers = [layers]
    return {"props": top, "layers": layers}


def _as_list(v):
    return v if isinstance(v, list) else [v]


def caffe_to_blocks(protofile: str, height: int = 224, width: int = 224,
                    channels: int = 3) -> list[dict[str, str]]:
    """Convert a prototxt layer graph into darknet blocks."""
    net = parse_prototxt(protofile)
    layers = net["layers"]

    blocks: list[dict[str, str]] = [
        {"type": "net", "batch": "1", "height": str(height),
         "width": str(width), "channels": str(channels)}
    ]
    # blob name -> index of the block producing it (in our block list,
    # 0-based over non-header blocks)
    producer: dict[str, int] = {}

    def top_of(l):
        return _as_list(l.get("top", l.get("name")))[0]

    def bottoms(l):
        return _as_list(l.get("bottom", []))

    def emit(block, top_name):
        blocks.append(block)
        producer[top_name] = len(blocks) - 2  # index among non-header blocks

    i = 0
    while i < len(layers):
        l = layers[i]
        ltype = l.get("type", "")
        if ltype in ("Input", "Data"):
            i += 1
            continue
        if ltype == "Convolution":
            p = l.get("convolution_param", {})
            size = int(p.get("kernel_size", 1))
            block = {
                "type": "convolutional",
                "batch_normalize": "0",
                "filters": str(p.get("num_output")),
                "size": str(size),
                "stride": str(p.get("stride", 1)),
                "pad": "1" if int(p.get("pad", 0)) else "0",
                "activation": "linear",
            }
            # absorb following BatchNorm/Scale/ReLU acting on the same blob
            j = i + 1
            top = top_of(l)
            while j < len(layers):
                nxt = layers[j]
                if bottoms(nxt) != [top] or top_of(nxt) != top:
                    break
                if nxt.get("type") == "BatchNorm" or nxt.get("type") == "Scale":
                    block["batch_normalize"] = "1"
                elif nxt.get("type") == "ReLU":
                    block["activation"] = "relu"
                else:
                    break
                j += 1
            emit(block, top)
            i = j
            continue
        if ltype == "ReLU":
            # in-place ReLU on an existing blob: retro-fit the producer
            top = top_of(l)
            src = producer.get(bottoms(l)[0])
            if src is not None and blocks[src + 1]["type"] in ("convolutional",
                                                               "shortcut"):
                blocks[src + 1]["activation"] = "relu"
                producer[top] = src
            i += 1
            continue
        if ltype == "Pooling":
            p = l.get("pooling_param", {})
            if p.get("global_pooling") in ("true", True):
                kind = "globalavg" if p.get("pool", "MAX") == "AVE" else "globalmax"
                emit({"type": kind}, top_of(l))
            else:
                emit(
                    {
                        "type": "maxpool",
                        "size": str(p.get("kernel_size", 2)),
                        "stride": str(p.get("stride", 2)),
                    },
                    top_of(l),
                )
            i += 1
            continue
        if ltype == "InnerProduct":
            p = l.get("inner_product_param", {})
            emit(
                {"type": "connected", "output": str(p.get("num_output")),
                 "activation": "linear"},
                top_of(l),
            )
            i += 1
            continue
        if ltype == "Softmax":
            emit({"type": "softmax"}, top_of(l))
            i += 1
            continue
        if ltype == "Eltwise":
            srcs = [producer[b] for b in bottoms(l)]
            cur = len(blocks) - 1  # index of current (to-be) block among non-header
            other = [s for s in srcs if s != cur - 0]
            frm = min(srcs)
            emit(
                {"type": "shortcut", "from": str(frm - len(blocks) + 1),
                 "activation": "linear"},
                top_of(l),
            )
            i += 1
            continue
        if ltype == "Concat":
            srcs = [producer[b] for b in bottoms(l)]
            rel = [str(s - (len(blocks) - 1)) for s in srcs]
            emit({"type": "route", "layers": ",".join(rel)}, top_of(l))
            i += 1
            continue
        if ltype == "Dropout":
            producer[top_of(l)] = producer.get(bottoms(l)[0], len(blocks) - 2)
            i += 1
            continue
        raise NotImplementedError(f"caffe layer type {ltype!r} not supported")

    return blocks


def build_caffe_spec(protofile: str, height: int = 224, width: int = 224,
                     channels: int = 3):
    from .spec import build_spec

    return build_spec(caffe_to_blocks(protofile, height, width, channels))
