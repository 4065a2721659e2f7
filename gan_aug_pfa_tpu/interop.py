"""Torch ``.pth`` checkpoint interop (both directions, standalone).

The reference ecosystem's artifacts are bare ``model.state_dict()`` files
loaded by stem (reference generate_synthetic_data.py:18,48 and
evaluate.py:20,343-351).  This module converts those state dicts to/from
the rebuild's Flax variable trees **by key structure alone** — it never
imports ``/root/reference`` — so a reference-trained ``generator_epoch_200
.pth`` drops straight into ``generate_synthetic_data.py`` /``evaluate.py``
here, and a TPU-trained ``.msgpack`` can be exported back for reference
tooling.

Torch is used only to (de)serialize the pickle container; all tensor work
is numpy.  Weight-layout conventions (validated empirically against the
reference models in scripts/check_forward_parity.py / check_gan_parity.py):

  * Conv2d            torch (O, I, kh, kw)  <->  flax (kh, kw, I, O)
  * ConvTranspose2d   torch (I, O, kh, kw)  <->  flax (kh, kw, I, O)
                      with the spatial taps FLIPPED (torch convT correlates
                      with the unflipped kernel; flax ConvTranspose 'SAME'
                      convolves — the flip makes them equal).
  * BatchNorm2d       weight/bias/running_mean/running_var  <->
                      scale/bias (params) + mean/var (batch_stats);
                      num_batches_tracked ignored on import, emitted as 0
                      on export (torch load_state_dict(strict=True) wants it).

Architectures handled (reference models.py):
  * SiameseUNet          — fixed attribute names (models.py:47-145)
  * UNetGenerator        — recursive UnetSkipConnectionBlock Sequentials
                           (models.py:149-208); parsed structurally so any
                           num_downs works
  * NLayerDiscriminator  — flat Conv/BN Sequential (models.py:212-247)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

# ---------------------------------------------------------------------------
# tensor-layout transforms


def _conv_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _conv_to_torch(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


def _convT_to_flax(w: np.ndarray) -> np.ndarray:
    w = np.transpose(w, (2, 3, 0, 1))
    return np.ascontiguousarray(w[::-1, ::-1])


def _convT_to_torch(w: np.ndarray) -> np.ndarray:
    w = np.ascontiguousarray(w[::-1, ::-1])
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


# ---------------------------------------------------------------------------
# torch file IO (torch used only as the pickle container)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pth`` state dict as {key: float32-preserving ndarray}."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # older torch without weights_only
        sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):  # a whole module was saved
        sd = sd.state_dict()
    return {k: np.asarray(v.detach().numpy()) for k, v in sd.items()
            if hasattr(v, "detach")}


def save_torch_state_dict(path: str, sd: Dict[str, np.ndarray]) -> None:
    import torch

    # np.array(copy=True) also makes jax-backed non-writable views safe to
    # hand to torch.from_numpy.
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
               path)


def detect_arch(sd: Dict[str, np.ndarray]) -> str:
    """'siamese' | 'generator' | 'discriminator' from key structure."""
    keys = sd.keys()
    if any(k.startswith("dconv_down1.") for k in keys):
        return "siamese"
    if any(k.startswith("model.model.") for k in keys):
        return "generator"
    if any(k.startswith("model.") and k.split(".")[1].isdigit()
           for k in keys):
        return "discriminator"
    raise ValueError(
        "unrecognized torch state dict (expected reference SiameseUNet, "
        f"UNetGenerator, or NLayerDiscriminator keys); got e.g. "
        f"{sorted(keys)[:3]}"
    )


# ---------------------------------------------------------------------------
# SiameseUNet (reference models.py:47-145; flax models/siamese_unet.py)

_SIAMESE_SEQS = (
    "dconv_down1", "dconv_down2", "dconv_down3", "dconv_down4",
    "bottleneck", "dconv_up3", "dconv_up2", "dconv_up1", "dconv_last",
)
_SIAMESE_GATES = ("att3", "att2", "att1", "att_last")
# (flax conv name, flax bn name, torch conv idx, torch bn idx) within the
# reference double_conv Sequential(Conv,BN,ReLU,Conv,BN,ReLU).
_DC_LAYOUT = (("conv0", "bn0", 0, 1), ("conv1", "bn1", 3, 4))
# Attention gate: flax (conv, bn) <- torch Sequential attr (models.py:18-44).
_GATE_LAYOUT = (("w_g", "bn_g", "W_g"), ("w_x", "bn_x", "W_x"),
                ("psi", "bn_psi", "psi"))


def _bn_from(sd, prefix):
    return (
        {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]},
        {"mean": sd[prefix + ".running_mean"],
         "var": sd[prefix + ".running_var"]},
    )


def _bn_to(out, prefix, p, s):
    out[prefix + ".weight"] = np.asarray(p["scale"])
    out[prefix + ".bias"] = np.asarray(p["bias"])
    out[prefix + ".running_mean"] = np.asarray(s["mean"])
    out[prefix + ".running_var"] = np.asarray(s["var"])
    out[prefix + ".num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def siamese_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for name in _SIAMESE_SEQS:
        p, s = {}, {}
        for cname, bname, ci, bi in _DC_LAYOUT:
            p[cname] = {"kernel": _conv_to_flax(sd[f"{name}.{ci}.weight"])}
            bp, bs = _bn_from(sd, f"{name}.{bi}")
            p[bname], s[bname] = bp, bs
        params[name], stats[name] = p, s
    for name in _SIAMESE_GATES:
        p, s = {}, {}
        for cname, bname, tattr in _GATE_LAYOUT:
            p[cname] = {
                "kernel": _conv_to_flax(sd[f"{name}.{tattr}.0.weight"]),
                "bias": sd[f"{name}.{tattr}.0.bias"],
            }
            bp, bs = _bn_from(sd, f"{name}.{tattr}.1")
            p[bname], s[bname] = bp, bs
        params[name], stats[name] = p, s
    params["conv_head"] = {
        "kernel": _conv_to_flax(sd["conv_last.weight"]),
        "bias": sd["conv_last.bias"],
    }
    return {"params": params, "batch_stats": stats}


def siamese_to_torch(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    params, stats = variables["params"], variables["batch_stats"]
    out: Dict[str, np.ndarray] = {}
    for name in _SIAMESE_SEQS:
        for cname, bname, ci, bi in _DC_LAYOUT:
            out[f"{name}.{ci}.weight"] = _conv_to_torch(
                np.asarray(params[name][cname]["kernel"]))
            _bn_to(out, f"{name}.{bi}", params[name][bname],
                   stats[name][bname])
    for name in _SIAMESE_GATES:
        for cname, bname, tattr in _GATE_LAYOUT:
            out[f"{name}.{tattr}.0.weight"] = _conv_to_torch(
                np.asarray(params[name][cname]["kernel"]))
            out[f"{name}.{tattr}.0.bias"] = np.asarray(
                params[name][cname]["bias"])
            _bn_to(out, f"{name}.{tattr}.1", params[name][bname],
                   stats[name][bname])
    out["conv_last.weight"] = _conv_to_torch(
        np.asarray(params["conv_head"]["kernel"]))
    out["conv_last.bias"] = np.asarray(params["conv_head"]["bias"])
    return out


# ---------------------------------------------------------------------------
# UNetGenerator (recursive skip blocks)


def _nest(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Flat dotted keys -> nested dict tree."""
    tree: Dict[str, Any] = {}
    for k, v in sd.items():
        parts = k.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _block_from_torch(block: Dict[str, Any]) -> Any:
    """Convert one UnetSkipConnectionBlock subtree (the dict under its
    'model' Sequential) to flax (params, batch_stats).

    Classification is structural: integer-indexed children are modules;
    a child with running stats is a norm, a child with a 'model' child is
    the nested submodule, 4-D-weight children are convs — first conv =
    downconv (Conv2d), last conv = upconv (ConvTranspose2d); norms before
    the upconv index are downnorm, after it upnorm (reference
    models.py:183-200 orderings)."""
    idxs = sorted((int(i) for i in block), key=int)
    convs, norms, sub = [], [], None
    for i in idxs:
        child = block[str(i)]
        if "model" in child:
            sub = child["model"]
        elif "running_mean" in child:
            norms.append(i)
        elif "weight" in child:
            convs.append(i)
    down_i, up_i = convs[0], convs[-1]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    dc = block[str(down_i)]
    params["downconv"] = {"kernel": _conv_to_flax(dc["weight"])}
    if "bias" in dc:
        params["downconv"]["bias"] = dc["bias"]
    uc = block[str(up_i)]
    params["upconv"] = {"kernel": _convT_to_flax(uc["weight"])}
    if "bias" in uc:
        params["upconv"]["bias"] = uc["bias"]
    for i in norms:
        # middle blocks: downnorm(2) < upconv(5) < upnorm(6); innermost:
        # the only norm (4) follows upconv (3) — so position decides.
        name = "downnorm" if i < up_i else "upnorm"
        node = block[str(i)]
        params[name] = {"scale": node["weight"], "bias": node["bias"]}
        stats[name] = {"mean": node["running_mean"],
                       "var": node["running_var"]}
    if sub is not None:
        sp, ss = _block_from_torch(sub)
        params["submodule"], stats["submodule"] = sp, ss
    return params, stats


def generator_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree = _nest(sd)
    p, s = _block_from_torch(tree["model"]["model"])
    return {"params": {"model": p}, "batch_stats": {"model": s}}


def _block_to_torch(params, stats, out, prefix):
    """Inverse of _block_from_torch: emit torch Sequential indices per the
    reference orderings (models.py:183-200):
      outermost (submodule, no upnorm):  downconv=0, submodule=1, upconv=3
      innermost (no submodule):          downconv=1, upconv=3, upnorm=4
      middle:                            downconv=1, downnorm=2,
                                         submodule=3, upconv=5, upnorm=6"""
    has_sub = "submodule" in params
    has_upnorm = "upnorm" in params
    if has_sub and not has_upnorm:  # outermost
        di, si, ui, uni, dni = 0, 1, 3, None, None
    elif not has_sub:  # innermost
        di, si, ui, uni, dni = 1, None, 3, 4, None
    else:  # middle
        di, si, ui, uni, dni = 1, 3, 5, 6, 2
    dc = params["downconv"]
    out[f"{prefix}.{di}.weight"] = _conv_to_torch(np.asarray(dc["kernel"]))
    if "bias" in dc:
        out[f"{prefix}.{di}.bias"] = np.asarray(dc["bias"])
    if dni is not None and "downnorm" in params:
        _bn_to(out, f"{prefix}.{dni}", params["downnorm"],
               stats["downnorm"])
    if si is not None:
        _block_to_torch(params["submodule"], stats["submodule"], out,
                        f"{prefix}.{si}.model")
    uc = params["upconv"]
    out[f"{prefix}.{ui}.weight"] = _convT_to_torch(np.asarray(uc["kernel"]))
    if "bias" in uc:
        out[f"{prefix}.{ui}.bias"] = np.asarray(uc["bias"])
    if uni is not None and "upnorm" in params:
        _bn_to(out, f"{prefix}.{uni}", params["upnorm"], stats["upnorm"])


def generator_to_torch(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    _block_to_torch(variables["params"]["model"],
                    variables["batch_stats"]["model"], out, "model.model")
    return out


# ---------------------------------------------------------------------------
# NLayerDiscriminator (flat Sequential)


def discriminator_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree = _nest(sd)["model"]
    idxs = sorted(tree, key=int)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    convs = [i for i in idxs if "running_mean" not in tree[i]]
    norms = [i for i in idxs if "running_mean" in tree[i]]
    for n, i in enumerate(convs):
        name = "conv_out" if n == len(convs) - 1 else f"conv{n}"
        params[name] = {"kernel": _conv_to_flax(tree[i]["weight"])}
        if "bias" in tree[i]:
            params[name]["bias"] = tree[i]["bias"]
    for n, i in enumerate(norms, start=1):
        params[f"bn{n}"] = {"scale": tree[i]["weight"],
                            "bias": tree[i]["bias"]}
        stats[f"bn{n}"] = {"mean": tree[i]["running_mean"],
                           "var": tree[i]["running_var"]}
    return {"params": params, "batch_stats": stats}


def discriminator_to_torch(variables: Dict[str, Any]
                           ) -> Dict[str, np.ndarray]:
    """Emit the reference n_layers=3 Sequential indices: convs at
    0,2,5,8,11 and norms at 3,6,9 (models.py:221-243)."""
    params, stats = variables["params"], variables["batch_stats"]
    n_bn = sum(1 for k in params if k.startswith("bn"))
    conv_idxs = [0] + [2 + 3 * n for n in range(n_bn)] + [2 + 3 * n_bn]
    bn_idxs = [3 + 3 * n for n in range(n_bn)]
    conv_names = [f"conv{n}" for n in range(len(conv_idxs) - 1)] + [
        "conv_out"]
    out: Dict[str, np.ndarray] = {}
    for name, i in zip(conv_names, conv_idxs):
        out[f"model.{i}.weight"] = _conv_to_torch(
            np.asarray(params[name]["kernel"]))
        if "bias" in params[name]:
            out[f"model.{i}.bias"] = np.asarray(params[name]["bias"])
    for n, i in enumerate(bn_idxs, start=1):
        _bn_to(out, f"model.{i}", params[f"bn{n}"], stats[f"bn{n}"])
    return out


# ---------------------------------------------------------------------------
# top-level entry points

_FROM_TORCH = {"siamese": siamese_from_torch,
               "generator": generator_from_torch,
               "discriminator": discriminator_from_torch}
_TO_TORCH = {"siamese": siamese_to_torch,
             "generator": generator_to_torch,
             "discriminator": discriminator_to_torch}


def variables_from_torch_file(path: str, arch: Optional[str] = None
                              ) -> Dict[str, Any]:
    """Load a reference ``.pth`` into a flax {params, batch_stats} tree
    (float32 leaves), auto-detecting the architecture unless given."""
    sd = load_torch_state_dict(path)
    arch = arch or detect_arch(sd)
    return _FROM_TORCH[arch](sd)


def torch_state_dict_from_variables(variables: Dict[str, Any],
                                    arch: str) -> Dict[str, np.ndarray]:
    return _TO_TORCH[arch](variables)
