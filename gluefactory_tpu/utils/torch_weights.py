"""Torch-checkpoint -> flax-params converters.

Covers the official pretrained weights a reference user would bring along
(SURVEY.md §7.3 "weight conversion fidelity"):
  - SuperPoint (MagicLeap official, no BN; rpautrat open, BN folded)
  - LightGlue (official, incl. the reference's rename map
    `lightglue.py:375-401` semantics)
  - SuperGlue (MagicLeap official, BN folded, conf.norm="none")

All converters return the flax params pytree matching the corresponding
`gluefactory_tpu` module's `init` structure (scan-stacked layers get a
leading L axis). No torch code runs on device: tensors are read on CPU and
converted to numpy.
"""

from __future__ import annotations

import numpy as np


def load_torch_state_dict(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def t_linear(sd, name):
    """torch Linear -> flax Dense."""
    out = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def t_conv(sd, name):
    """torch Conv2d (O, I, H, W) -> flax Conv (H, W, I, O)."""
    w = sd[f"{name}.weight"]
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def t_layernorm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def fold_bn_conv(sd, conv_name, bn_name, eps=1e-5):
    """Fold an inference BatchNorm into the preceding conv
    (keeps the flax module norm-free, SuperPoint docstring)."""
    w = sd[f"{conv_name}.weight"]  # (O, I, H, W)
    b = sd.get(f"{conv_name}.bias", np.zeros(w.shape[0], w.dtype))
    gamma = sd[f"{bn_name}.weight"]
    beta = sd[f"{bn_name}.bias"]
    mean = sd[f"{bn_name}.running_mean"]
    var = sd[f"{bn_name}.running_var"]
    scale = gamma / np.sqrt(var + eps)
    w_f = w * scale[:, None, None, None]
    b_f = (b - mean) * scale + beta
    return {
        "kernel": np.ascontiguousarray(np.transpose(w_f, (2, 3, 1, 0))),
        "bias": b_f,
    }


def fold_bn_linear(sd, lin_name, bn_name, eps=1e-5):
    w = sd[f"{lin_name}.weight"]  # (O, I)
    b = sd.get(f"{lin_name}.bias", np.zeros(w.shape[0], w.dtype))
    gamma = sd[f"{bn_name}.weight"]
    beta = sd[f"{bn_name}.bias"]
    mean = sd[f"{bn_name}.running_mean"]
    var = sd[f"{bn_name}.running_var"]
    scale = gamma / np.sqrt(var + eps)
    return {
        "kernel": np.ascontiguousarray((w * scale[:, None]).T),
        "bias": (b - mean) * scale + beta,
    }


# ---------------------------------------------------------------------------
# SuperPoint
# ---------------------------------------------------------------------------


def convert_superpoint(sd: dict) -> dict:
    """MagicLeap official SuperPoint (conv1a..convDb, no BN) -> flax params.

    Matches `models/extractors/superpoint.py` with
    channels=[64, 64, 128, 128, 256], norm="none".
    """
    names = [("conv1a", "conv1b"), ("conv2a", "conv2b"), ("conv3a", "conv3b"), ("conv4a", "conv4b")]
    params = {}
    for i, (a, b) in enumerate(names):
        params[f"b{i}_0"] = {"conv": t_conv(sd, a)}
        params[f"b{i}_1"] = {"conv": t_conv(sd, b)}
    params["det0"] = {"conv": t_conv(sd, "convPa")}
    params["det1"] = t_conv(sd, "convPb")
    params["desc0"] = {"conv": t_conv(sd, "convDa")}
    params["desc1"] = t_conv(sd, "convDb")
    return {"params": params}


def _bn_affine(sd, bn, eps=1e-3):
    """Eval-mode BatchNorm as a per-channel (scale, bias) affine.

    The rpautrat VGGBlock order is conv -> relu -> BN
    (`superpoint_open.py:61-77`, eps=0.001): BN after the nonlinearity cannot
    be folded into the conv, so it becomes the flax block's post-relu affine
    (`models/extractors/superpoint.py` norm="affine")."""
    gamma = sd[f"{bn}.weight"]
    beta = sd[f"{bn}.bias"]
    mean = sd[f"{bn}.running_mean"]
    var = sd[f"{bn}.running_var"]
    scale = gamma / np.sqrt(var + eps)
    return scale.astype(np.float32), (beta - mean * scale).astype(np.float32)


def convert_superpoint_open(sd: dict) -> dict:
    """rpautrat open SuperPoint -> flax params for conf.norm='affine'.

    Official layout (`superpoint_open.py:80-124`): `backbone.{i}.{j}.conv.*`
    + `.bn.*` VGGBlocks (conv->relu->BN), `detector.{0,1}.*`,
    `descriptor.{0,1}.*`. The relu'd blocks keep BN as a post-relu affine;
    the relu-free head blocks (`detector.1`, `descriptor.1`) fold BN into the
    conv exactly (no nonlinearity in between, eps=0.001).
    Also accepts classic magicleap-style `convXy`/`bnXy` naming.
    """
    def conv_affine(conv, bn):
        out = {"conv": t_conv(sd, conv)}
        if f"{bn}.running_mean" in sd:
            s, b = _bn_affine(sd, bn)
            out["post_scale"] = s
            out["post_bias"] = b
        return out

    def conv_bn(conv, bn):
        if f"{bn}.running_mean" in sd:
            return fold_bn_conv(sd, conv, bn, eps=1e-3)
        return t_conv(sd, conv)

    if "backbone.0.0.conv.weight" in sd:  # official rpautrat layout
        params = {}
        for i in range(4):
            for j in range(2):
                params[f"b{i}_{j}"] = conv_affine(
                    f"backbone.{i}.{j}.conv", f"backbone.{i}.{j}.bn"
                )
        params["det0"] = conv_affine("detector.0.conv", "detector.0.bn")
        params["det1"] = conv_bn("detector.1.conv", "detector.1.bn")
        params["desc0"] = conv_affine("descriptor.0.conv", "descriptor.0.bn")
        params["desc1"] = conv_bn("descriptor.1.conv", "descriptor.1.bn")
        return {"params": params}

    if "conv1a.weight" in sd:  # magicleap-style names with bn
        pairs = [
            ("conv1a", "bn1a"), ("conv1b", "bn1b"),
            ("conv2a", "bn2a"), ("conv2b", "bn2b"),
            ("conv3a", "bn3a"), ("conv3b", "bn3b"),
            ("conv4a", "bn4a"), ("conv4b", "bn4b"),
        ]
        params = {}
        for i in range(4):
            params[f"b{i}_0"] = {"conv": conv_bn(*pairs[2 * i])}
            params[f"b{i}_1"] = {"conv": conv_bn(*pairs[2 * i + 1])}
        params["det0"] = {"conv": conv_bn("convPa", "bnPa")}
        params["det1"] = conv_bn("convPb", "bnPb")
        params["desc0"] = {"conv": conv_bn("convDa", "bnDa")}
        params["desc1"] = conv_bn("convDb", "bnDb")
        return {"params": params}
    raise ValueError(f"unrecognized SuperPoint state dict: {list(sd)[:5]}")


# ---------------------------------------------------------------------------
# LightGlue
# ---------------------------------------------------------------------------

# the reference's official-weight rename map (`lightglue.py:395-400`), plus
# the current module naming (`cross_attn.to_out`, `lightglue.py:180`)
_LG_RENAMES = [
    ("self_attn.prj", "self_attn.Wqkv"),
    ("attn.proj", "attn.out_proj"),
    ("self_attn.merge", "self_attn.out_proj"),
    ("cross_attn.merge", "cross_attn.out_proj"),
    ("cross_attn.to_out", "cross_attn.out_proj"),
    ("transformers.", "transformers."),
]


def qkv_columns_3hd(wqkv: dict, n_heads: int = 4) -> dict:
    """Reorder fused-QKV output columns from the official innermost (Dh, 3)
    to the TPU-friendly outermost (3, H, Dh) (`lightglue.qkv_layout: 3hd`).
    Pure column permutation of the SAME weights — outputs are identical, the
    module just slices contiguously instead of stride-3 lane gathers."""
    kernel, bias = np.asarray(wqkv["kernel"]), np.asarray(wqkv["bias"])
    D3 = kernel.shape[1]
    D = D3 // 3
    o_new = np.arange(D3)
    # new index o' = j*D + r  reads old index  o = r*3 + j
    perm = (o_new % D) * 3 + o_new // D
    return {
        "kernel": np.ascontiguousarray(kernel[:, perm]),
        "bias": np.ascontiguousarray(bias[perm]),
    }


def convert_lightglue(sd: dict, n_layers: int = 9, qkv_layout: str = "dh3") -> dict:
    """Official LightGlue checkpoint -> flax params (scan-stacked layers)."""
    # normalize historical key names
    renamed = {}
    for k, v in sd.items():
        for old, new in _LG_RENAMES:
            k = k.replace(old, new)
        renamed[k] = v
    sd = renamed

    def stack(fn):
        per_layer = [fn(i) for i in range(n_layers)]
        return _stack_trees(per_layer)

    if "input_proj.weight" in sd:
        input_proj = t_linear(sd, "input_proj")
    else:
        # input_dim == descriptor_dim -> the reference uses nn.Identity
        # (`lightglue.py:354-357`); our module always projects, so synthesize
        # the identity Dense
        D = sd["transformers.0.self_attn.Wqkv.weight"].shape[1]
        input_proj = {
            "kernel": np.eye(D, dtype=np.float32),
            "bias": np.zeros(D, np.float32),
        }
    params = {
        "input_proj": input_proj,
        "posenc_freqs": np.ascontiguousarray(sd["posenc.Wr.weight"].T),
        "layers": stack(lambda i: _lg_layer(sd, i, n_layers, qkv_layout)),
    }
    return {"params": params}


def _permute_rotary_qk(wqkv: dict, n_heads: int = 4) -> dict:
    """Interleaved -> half-split rotary pair layout for the q/k columns.

    Our `apply_cached_rotary_emb` stores rotation pair i at head dims
    (i, Dh/2+i) instead of the reference's interleaved (2i, 2i+1) —
    layout-friendly on TPU lanes (see `ops/attention.py`). Permuting the
    SAME columns of both q and k leaves every attention logit unchanged:
    (P R q)·(P R k) = (R q)·(R k) for any fixed permutation P.

    wqkv: flax Dense params {kernel: (D, 3D), bias: (3D,)} with output
    index o = (h*Dh + d)*3 + j, j in {q=0, k=1, v=2} (official layout).
    """
    kernel, bias = np.asarray(wqkv["kernel"]), np.asarray(wqkv["bias"])
    D3 = kernel.shape[1]
    D = D3 // 3
    Dh = D // n_heads
    half = Dh // 2
    perm = np.arange(D3)
    for h in range(n_heads):
        for j in (0, 1):  # q and k only; v untouched
            base = h * Dh * 3 + j
            old = base + 3 * np.concatenate(
                [2 * np.arange(half), 2 * np.arange(half) + 1]
            )
            perm[base + 3 * np.arange(Dh)] = old
    return {
        "kernel": np.ascontiguousarray(kernel[:, perm]),
        "bias": np.ascontiguousarray(bias[perm]),
    }


def _lg_layer(sd, i, n_layers, qkv_layout: str = "dh3"):
    p = f"transformers.{i}"
    wqkv = _permute_rotary_qk(t_linear(sd, f"{p}.self_attn.Wqkv"))
    if qkv_layout == "3hd":
        wqkv = qkv_columns_3hd(wqkv)
    layer = {
        "self_attn": {
            "Wqkv": wqkv,
            "out_proj": t_linear(sd, f"{p}.self_attn.out_proj"),
            "ffn0": t_linear(sd, f"{p}.self_attn.ffn.0"),
            "ffn_norm": t_layernorm(sd, f"{p}.self_attn.ffn.1"),
            "ffn1": t_linear(sd, f"{p}.self_attn.ffn.3"),
        },
        "cross_attn": {
            "to_qk": t_linear(sd, f"{p}.cross_attn.to_qk"),
            "to_v": t_linear(sd, f"{p}.cross_attn.to_v"),
            "out_proj": t_linear(sd, f"{p}.cross_attn.out_proj"),
            "ffn0": t_linear(sd, f"{p}.cross_attn.ffn.0"),
            "ffn_norm": t_layernorm(sd, f"{p}.cross_attn.ffn.1"),
            "ffn1": t_linear(sd, f"{p}.cross_attn.ffn.3"),
        },
        "log_assignment": {
            "final_proj": t_linear(sd, f"log_assignment.{i}.final_proj"),
            "matchability": t_linear(sd, f"log_assignment.{i}.matchability"),
        },
    }
    # token confidence heads exist for layers 0..L-2; pad the last with zeros
    if f"token_confidence.{i}.token.0.weight" in sd:
        layer["token_confidence"] = t_linear(sd, f"token_confidence.{i}.token.0")
    elif f"token_confidence.{i}.token.weight" in sd:
        layer["token_confidence"] = t_linear(sd, f"token_confidence.{i}.token")
    else:
        ref = layer["log_assignment"]["matchability"]
        layer["token_confidence"] = {
            "kernel": np.zeros_like(ref["kernel"]),
            "bias": np.zeros_like(ref["bias"]),
        }
    return layer


# ---------------------------------------------------------------------------
# SuperGlue
# ---------------------------------------------------------------------------


def convert_superglue(sd: dict, n_layers: int = 9) -> dict:
    """MagicLeap official SuperGlue -> flax params (conf.norm='none').

    Official layout: kenc.encoder.{0,3,6,9,12} convs1d with BN at {1,4,7,10},
    gnn.layers.{i} alternating self/cross, final_proj conv1d, bin_score.
    Conv1d (O, I, 1) weights are treated as linear layers.
    """
    def conv1d_as_linear(name):
        w = sd[f"{name}.weight"]
        if w.ndim == 3:
            w = w[..., 0]
        out = {"kernel": np.ascontiguousarray(w.T)}
        if f"{name}.bias" in sd:
            out["bias"] = sd[f"{name}.bias"]
        return out

    def conv1d_bn_fold(conv, bn):
        w = sd[f"{conv}.weight"]
        if w.ndim == 3:
            w = w[..., 0]
        b = sd.get(f"{conv}.bias", np.zeros(w.shape[0], w.dtype))
        gamma, beta = sd[f"{bn}.weight"], sd[f"{bn}.bias"]
        mean, var = sd[f"{bn}.running_mean"], sd[f"{bn}.running_var"]
        scale = gamma / np.sqrt(var + 1e-5)
        return {
            "kernel": np.ascontiguousarray((w * scale[:, None]).T),
            "bias": (b - mean) * scale + beta,
        }

    kenc = {}
    enc_ids = [0, 3, 6, 9]
    for j, eid in enumerate(enc_ids):
        kenc[f"mlp{j}"] = conv1d_bn_fold(f"kenc.encoder.{eid}", f"kenc.encoder.{eid + 1}")
    kenc["out"] = conv1d_as_linear("kenc.encoder.12")

    def gnn_layer(i):
        # official alternates layer types: even=self, odd=cross, 2 per round
        def prop(idx):
            p = f"gnn.layers.{idx}"
            return {
                "q": conv1d_as_linear(f"{p}.attn.proj.0"),
                "k": conv1d_as_linear(f"{p}.attn.proj.1"),
                "v": conv1d_as_linear(f"{p}.attn.proj.2"),
                "merge": conv1d_as_linear(f"{p}.attn.merge"),
                "mlp0": conv1d_bn_fold(f"{p}.mlp.0", f"{p}.mlp.1"),
                "mlp1": conv1d_as_linear(f"{p}.mlp.3"),
            }

        return {"self": prop(2 * i), "cross": prop(2 * i + 1)}

    params = {
        "input_proj": conv1d_as_linear("input_proj"),
        "kenc": kenc,
        "gnn": _stack_trees([gnn_layer(i) for i in range(n_layers)]),
        "final_proj": conv1d_as_linear("final_proj"),
        "bin_score": np.asarray(sd["bin_score"]).reshape(()),
    }
    return {"params": params}


def _stack_trees(trees: list) -> dict:
    """Stack a list of identical pytrees along a new leading axis."""
    out = {}
    for k in trees[0]:
        vals = [t[k] for t in trees]
        if isinstance(vals[0], dict):
            out[k] = _stack_trees(vals)
        else:
            out[k] = np.stack(vals)
    return out


# ---------------------------------------------------------------------------
# ALIKED
# ---------------------------------------------------------------------------


def convert_aliked(sd: dict, model_name: str = "aliked-n16") -> dict:
    """Official ALIKED checkpoint -> flax params for `extractors/aliked.py`.

    Reference arch `gluefactory/models/extractors/aliked.py:593-735`:
    ConvBlock/ResBlock encoder (BatchNorm eval -> AffineNorm scale/bias),
    DeformableConv2d (offset conv + regular conv; the regular conv weight
    (O, I, 3, 3) flattens to our (9*I, O) tap-major matmul layout), 1x1
    aggregation convs, 4-conv score head, SDDH descriptor head (offset convs
    flattened to matmuls, sf_conv 1x1, agg_weights passthrough).
    """

    def bn_affine(bn, eps=1e-5):
        gamma = sd[f"{bn}.weight"]
        beta = sd[f"{bn}.bias"]
        mean = sd[f"{bn}.running_mean"]
        var = sd[f"{bn}.running_var"]
        scale = gamma / np.sqrt(var + eps)
        return {
            "scale": scale.astype(np.float32),
            "bias": (beta - mean * scale).astype(np.float32),
        }

    def dcn(name):
        # regular_conv (O, I, 3, 3) -> (3*3*I, O) with row-major taps,
        # channel-fastest (matches samples.reshape(B,H,W,K*K*C) @ w)
        w = sd[f"{name}.regular_conv.weight"]
        O, I, Kh, Kw = w.shape
        w = np.transpose(w, (2, 3, 1, 0)).reshape(Kh * Kw * I, O)
        return {
            "offset_conv": t_conv(sd, f"{name}.offset_conv"),
            "weight": np.ascontiguousarray(w),
        }

    def conv_block(name):
        return {
            "conv1": t_conv(sd, f"{name}.conv1"),
            "bn1": bn_affine(f"{name}.bn1"),
            "conv2": t_conv(sd, f"{name}.conv2"),
            "bn2": bn_affine(f"{name}.bn2"),
        }

    def res_block(name, dcn_block):
        mk = dcn if dcn_block else (lambda n: t_conv(sd, n))
        return {
            "conv1": mk(f"{name}.conv1"),
            "bn1": bn_affine(f"{name}.bn1"),
            "conv2": mk(f"{name}.conv2"),
            "bn2": bn_affine(f"{name}.bn2"),
            "downsample": t_conv(sd, f"{name}.downsample"),
        }

    def sddh():
        # offset_conv.0: (2M, C, 3, 3) valid conv on a 3x3 patch == matmul
        # over the flattened patch; patch layout (ps, ps, C) row-major
        w0 = sd["desc_head.offset_conv.0.weight"]  # (2M, C, 3, 3)
        M2, C, Kh, Kw = w0.shape
        w0 = np.transpose(w0, (2, 3, 1, 0)).reshape(Kh * Kw * C, M2)
        w1 = sd["desc_head.offset_conv.2.weight"][:, :, 0, 0]  # (2M, 2M)
        sf = sd["desc_head.sf_conv.weight"][:, :, 0, 0]  # (C, C)
        return {
            "offset_conv0": np.ascontiguousarray(w0),
            "offset_bias0": sd["desc_head.offset_conv.0.bias"],
            "offset_conv1": np.ascontiguousarray(w1.T),
            "offset_bias1": sd["desc_head.offset_conv.2.bias"],
            "sf_conv": np.ascontiguousarray(sf.T),
            "agg_weights": sd["desc_head.agg_weights"],
        }

    params = {
        "block1": conv_block("block1"),
        "block2": res_block("block2", False),
        "block3": res_block("block3", True),
        "block4": res_block("block4", True),
        "conv1": t_conv(sd, "conv1"),
        "conv2": t_conv(sd, "conv2"),
        "conv3": t_conv(sd, "conv3"),
        "conv4": t_conv(sd, "conv4"),
        "score0": t_conv(sd, "score_head.0"),
        "score1": t_conv(sd, "score_head.2"),
        "score2": t_conv(sd, "score_head.4"),
        "score3": t_conv(sd, "score_head.6"),
        "desc_head": sddh(),
    }
    return {"params": params}


# ---------------------------------------------------------------------------
# DINOv2
# ---------------------------------------------------------------------------


def convert_dinov2(sd: dict, depth: int | None = None) -> dict:
    """Official DINOv2 checkpoint -> flax params for `backbones/dinov2.py`.

    Accepts BOTH key namings for the same architecture:
      - torch-hub `facebookresearch/dinov2` (`blocks.N.attn.qkv.weight`,
        `ls1.gamma`, `patch_embed.proj`, `pos_embed`, `norm`);
      - `transformers.Dinov2Model` (`encoder.layer.N.attention.attention.
        {query,key,value}`, `layer_scale1.lambda1`, `embeddings.*`,
        `layernorm`) — the oracle used by `tests/test_dinov2.py`.

    The flax module uses a fused QKV Dense with columns ordered [q|k|v]
    (one MXU matmul); separate torch q/k/v weights are concatenated.
    """
    hub = "cls_token" in sd

    def pick(*names):
        for n in names:
            if n in sd:
                return sd[n]
        raise KeyError(names[0])

    if depth is None:
        pat = "blocks." if hub else "encoder.layer."
        depth = 1 + max(
            int(k[len(pat):].split(".")[0]) for k in sd if k.startswith(pat)
        )

    def block(i):
        if hub:
            p = f"blocks.{i}"
            qkv = t_linear(sd, f"{p}.attn.qkv")
            out = {
                "norm1": t_layernorm(sd, f"{p}.norm1"),
                "qkv": qkv,
                "proj": t_linear(sd, f"{p}.attn.proj"),
                "ls1_gamma": sd[f"{p}.ls1.gamma"],
                "norm2": t_layernorm(sd, f"{p}.norm2"),
                "ls2_gamma": sd[f"{p}.ls2.gamma"],
            }
            if f"{p}.mlp.w12.weight" in sd:  # SwiGLU (giant)
                out["w12"] = t_linear(sd, f"{p}.mlp.w12")
                out["w3"] = t_linear(sd, f"{p}.mlp.w3")
            else:
                out["fc1"] = t_linear(sd, f"{p}.mlp.fc1")
                out["fc2"] = t_linear(sd, f"{p}.mlp.fc2")
            return out
        p = f"encoder.layer.{i}"
        a = f"{p}.attention.attention"
        qkv = {
            "kernel": np.ascontiguousarray(
                np.concatenate(
                    [sd[f"{a}.{n}.weight"].T for n in ("query", "key", "value")],
                    axis=1,
                )
            ),
            "bias": np.concatenate(
                [sd[f"{a}.{n}.bias"] for n in ("query", "key", "value")]
            ),
        }
        out = {
            "norm1": t_layernorm(sd, f"{p}.norm1"),
            "qkv": qkv,
            "proj": t_linear(sd, f"{p}.attention.output.dense"),
            "ls1_gamma": sd[f"{p}.layer_scale1.lambda1"],
            "norm2": t_layernorm(sd, f"{p}.norm2"),
            "ls2_gamma": sd[f"{p}.layer_scale2.lambda1"],
        }
        if f"{p}.mlp.weights_in.weight" in sd:  # transformers SwiGLU naming
            out["w12"] = t_linear(sd, f"{p}.mlp.weights_in")
            out["w3"] = t_linear(sd, f"{p}.mlp.weights_out")
        else:
            out["fc1"] = t_linear(sd, f"{p}.mlp.fc1")
            out["fc2"] = t_linear(sd, f"{p}.mlp.fc2")
        return out

    params = {
        "cls_token": pick("cls_token", "embeddings.cls_token"),
        "pos_embed": pick("pos_embed", "embeddings.position_embeddings"),
        "patch_embed": t_conv(
            sd,
            "patch_embed.proj" if hub else "embeddings.patch_embeddings.projection",
        ),
        "norm": t_layernorm(sd, "norm" if hub else "layernorm"),
        "blocks": _stack_trees([block(i) for i in range(depth)]),
    }
    return {"params": params}


# ---------------------------------------------------------------------------
# DISK (official thin U-Net; kornia `feature.DISK.from_pretrained` weights)
# ---------------------------------------------------------------------------


def convert_disk(sd: dict) -> dict:
    """Official DISK checkpoint -> flax params for
    `models/extractors/disk.py` (`arch: "official"`).

    The reference loads these through kornia
    (`gluefactory/models/extractors/disk_kornia.py:28`); the underlying
    module tree is the `unets` thin U-Net: `unet.path_down.{0..4}` /
    `unet.path_up.{0..3}`, each block one 5x5 Conv2d (+ a per-channel PReLU
    for every block except down_0; InstanceNorm2d carries no parameters).

    Matching is STRUCTURAL within each block prefix — the conv kernel is the
    block's 4D tensor, its bias the 1D tensor of matching out-channels, the
    PReLU slope the remaining 1D tensor — so exact Sequential indices
    (which depend on the vendored `unets` version) do not matter. PReLU
    slopes stored as a single scalar broadcast to per-channel.
    """
    import re

    # tolerate {"extractor.unet...."} (original disk repo saves the full
    # training harness) and bare {"path_down...."} trees
    groups: dict = {}
    for k, v in sd.items():
        m = re.search(r"path_(down|up)\.(\d+)\.", k)
        if m is None:
            continue
        groups.setdefault((m.group(1), int(m.group(2))), {})[k] = np.asarray(v)

    if not groups:
        raise ValueError(
            "no `path_down`/`path_up` keys found — not a DISK U-Net "
            f"state dict (keys: {sorted(sd)[:5]}...)")

    def block(kind, idx):
        g = groups[(kind, idx)]
        convs = {k: v for k, v in g.items() if v.ndim == 4}
        if len(convs) != 1:
            raise ValueError(
                f"path_{kind}.{idx}: expected exactly one conv weight, got "
                f"{sorted(convs)}")
        (wk, w), = convs.items()
        out_ch, in_ch = w.shape[:2]
        ones = {k: v for k, v in g.items() if v.ndim == 1}
        bias = ones.pop(wk[: -len("weight")] + "bias", None)
        if bias is None:  # bias key not named alongside the weight
            cands = [k for k, v in ones.items() if v.shape == (out_ch,)]
            assert len(cands) == 1, f"ambiguous conv bias in path_{kind}.{idx}"
            bias = ones.pop(cands[0])
        p = {"conv": {
            "kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": bias,
        }}
        if not (kind == "down" and idx == 0):
            alphas = [v for v in ones.values() if v.shape in ((in_ch,), (1,))]
            assert len(alphas) == 1, (
                f"path_{kind}.{idx}: expected one PReLU slope, got "
                f"{[v.shape for v in ones.values()]}")
            p["alpha"] = np.broadcast_to(
                alphas[0], (in_ch,)).astype(np.float32).copy()
        elif ones:
            raise ValueError(f"unexpected 1D params in first block: {ones}")
        return p

    n_down = 1 + max(i for k, i in groups if k == "down")
    n_up = 1 + max(i for k, i in groups if k == "up")
    unet = {f"down_{i}": block("down", i) for i in range(n_down)}
    unet.update({f"up_{j}": block("up", j) for j in range(n_up)})
    return {"params": {"unet": unet}}
