"""Checkpoint conversion: HF PyTorch state_dicts → wfl_asr_tpu param pytrees.

Used both to import pretrained encoders (when weights are available locally)
and by the numeric-parity test suite (random-init HF models as oracles).
Torch is only imported lazily — the framework itself never depends on it.
"""

from __future__ import annotations

import functools
from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor → float32 numpy."""
    return np.asarray(x.detach().cpu().numpy(), dtype=np.float32)


def _linear(sd: Dict, prefix: str) -> dict:
    p = {"w": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["b"] = _t(sd[f"{prefix}.bias"])
    return p


def _layer_norm(sd: Dict, prefix: str) -> dict:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _conv(sd: Dict, prefix: str) -> dict:
    p = {"w": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["b"] = _t(sd[f"{prefix}.bias"])
    return p


def _weight_normed_conv(sd: Dict, prefix: str) -> dict:
    """Fold torch weight-norm (dim=2 — per kernel position, the wav2vec2
    convention) into a plain conv weight."""
    if f"{prefix}.parametrizations.weight.original0" in sd:
        g = _t(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _t(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        g = _t(sd[f"{prefix}.weight_g"])
        v = _t(sd[f"{prefix}.weight_v"])
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    p = {"w": g * v / np.maximum(norm, 1e-12)}
    if f"{prefix}.bias" in sd:
        p["b"] = _t(sd[f"{prefix}.bias"])
    return p


# ---------------------------------------------------------------------------
# WavLM
# ---------------------------------------------------------------------------

def convert_wavlm(sd: Dict, arch) -> dict:
    """HF ``WavLMModel`` state_dict → ``init_wavlm``-shaped pytree."""
    sd = {k.removeprefix("wavlm."): v for k, v in sd.items()}

    conv_layers = []
    for i in range(len(arch.conv_dim)):
        layer = {"conv": _conv(sd, f"feature_extractor.conv_layers.{i}.conv")}
        ln_key = f"feature_extractor.conv_layers.{i}.layer_norm.weight"
        if ln_key in sd:
            layer["norm"] = _layer_norm(sd, f"feature_extractor.conv_layers.{i}.layer_norm")
        conv_layers.append(layer)

    params = {
        "feature_encoder": conv_layers,
        "feature_projection": {
            "ln": _layer_norm(sd, "feature_projection.layer_norm"),
            "proj": _linear(sd, "feature_projection.projection"),
        },
        "pos_conv": _weight_normed_conv(sd, "encoder.pos_conv_embed.conv"),
        "encoder_ln": _layer_norm(sd, "encoder.layer_norm"),
        "rel_attn_embed": {
            "w": _t(sd["encoder.layers.0.attention.rel_attn_embed.weight"]),
        },
        "layers": [],
    }

    i = 0
    while f"encoder.layers.{i}.attention.q_proj.weight" in sd:
        pre = f"encoder.layers.{i}"
        params["layers"].append({
            "q": _linear(sd, f"{pre}.attention.q_proj"),
            "k": _linear(sd, f"{pre}.attention.k_proj"),
            "v": _linear(sd, f"{pre}.attention.v_proj"),
            "out": _linear(sd, f"{pre}.attention.out_proj"),
            "gru_gate_const": _t(sd[f"{pre}.attention.gru_rel_pos_const"]).reshape(-1),
            "gru_gate": _linear(sd, f"{pre}.attention.gru_rel_pos_linear"),
            "attn_ln": _layer_norm(sd, f"{pre}.layer_norm"),
            "ff_in": _linear(sd, f"{pre}.feed_forward.intermediate_dense"),
            "ff_out": _linear(sd, f"{pre}.feed_forward.output_dense"),
            "final_ln": _layer_norm(sd, f"{pre}.final_layer_norm"),
        })
        i += 1
    return params


# ---------------------------------------------------------------------------
# Whisper encoder
# ---------------------------------------------------------------------------

def convert_whisper_encoder(sd: Dict, arch) -> dict:
    """HF ``WhisperModel`` (or bare encoder) state_dict → ``init_whisper_encoder``
    pytree. Accepts full-model dicts (keys prefixed ``encoder.``/``model.encoder.``)."""
    for prefix in ("model.encoder.", "encoder."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k.removeprefix(prefix): v for k, v in sd.items()
                  if k.startswith(prefix)}
            break

    params = {
        "conv1": _conv(sd, "conv1"),
        "conv2": _conv(sd, "conv2"),
        "embed_positions": _t(sd["embed_positions.weight"]),
        "ln_post": _layer_norm(sd, "layer_norm"),
        "layers": [],
    }
    i = 0
    while f"layers.{i}.self_attn.q_proj.weight" in sd:
        pre = f"layers.{i}"
        k_proj = {"w": _t(sd[f"{pre}.self_attn.k_proj.weight"]).T}
        if f"{pre}.self_attn.k_proj.bias" in sd:
            k_proj["b"] = _t(sd[f"{pre}.self_attn.k_proj.bias"])
        params["layers"].append({
            "attn_ln": _layer_norm(sd, f"{pre}.self_attn_layer_norm"),
            "q": _linear(sd, f"{pre}.self_attn.q_proj"),
            "k": k_proj,
            "v": _linear(sd, f"{pre}.self_attn.v_proj"),
            "out": _linear(sd, f"{pre}.self_attn.out_proj"),
            "final_ln": _layer_norm(sd, f"{pre}.final_layer_norm"),
            "ff_in": _linear(sd, f"{pre}.fc1"),
            "ff_out": _linear(sd, f"{pre}.fc2"),
        })
        i += 1
    return params


# ---------------------------------------------------------------------------
# Full reference tagger checkpoints (.pt from usamireko/WFL-ASR train.py)
# ---------------------------------------------------------------------------

def _lstm_from_torch(sd: Dict, prefix: str, num_layers: int,
                     bidirectional: bool = True) -> list:
    layers = []
    for i in range(num_layers):
        dirs = []
        for suffix in (("", "_reverse") if bidirectional else ("",)):
            dirs.append({
                "w_ih": _t(sd[f"{prefix}.weight_ih_l{i}{suffix}"]).T,
                "w_hh": _t(sd[f"{prefix}.weight_hh_l{i}{suffix}"]).T,
                "b_ih": _t(sd[f"{prefix}.bias_ih_l{i}{suffix}"]),
                "b_hh": _t(sd[f"{prefix}.bias_hh_l{i}{suffix}"]),
            })
        layers.append(dirs)
    return layers


def _conformer_from_torch(sd: Dict, pre: str) -> tuple:
    """One reference ConformerBlock (model.py:21-52) → (params, state)."""
    dim = sd[f"{pre}.ln1.weight"].shape[0]
    in_w = _t(sd[f"{pre}.self_attn.in_proj_weight"])          # [3E, E]
    in_b = _t(sd[f"{pre}.self_attn.in_proj_bias"])
    qw, kw, vw = np.split(in_w, 3, axis=0)
    qb, kb, vb = np.split(in_b, 3, axis=0)

    def ff(p):
        return {"ln": _layer_norm(sd, f"{p}.net.0"),
                "in": _linear(sd, f"{p}.net.1"),
                "out": _linear(sd, f"{p}.net.4")}

    params = {
        "ff1": ff(f"{pre}.ff1"), "ff2": ff(f"{pre}.ff2"),
        "q": {"w": qw.T, "b": qb}, "k": {"w": kw.T, "b": kb},
        "v": {"w": vw.T, "b": vb},
        "attn_out": _linear(sd, f"{pre}.self_attn.out_proj"),
        "ln1": _layer_norm(sd, f"{pre}.ln1"),
        "ln2": _layer_norm(sd, f"{pre}.ln2"),
        "conv_pw1": _conv(sd, f"{pre}.conv.0"),
        "conv_main": _conv(sd, f"{pre}.conv.2"),
        "bn": {"scale": _t(sd[f"{pre}.conv.3.weight"]),
               "bias": _t(sd[f"{pre}.conv.3.bias"])},
        "conv_pw2": _conv(sd, f"{pre}.conv.5"),
    }
    state = {"bn": {"mean": _t(sd[f"{pre}.conv.3.running_mean"]),
                    "var": _t(sd[f"{pre}.conv.3.running_var"])}}
    return params, state


def convert_tagger(sd: Dict, arch) -> tuple:
    """Reference ``BIOPhonemeTagger.state_dict()`` → (params, state) for
    ``apply_tagger``. Encoder weights are routed to the matching converter;
    all head weights map 1:1 (reference model.py:96-142)."""
    params: Dict = {}
    if arch.encoder_type == "whisper":
        params["encoder"] = convert_whisper_encoder(
            {k.removeprefix("encoder."): v for k, v in sd.items()
             if k.startswith("encoder.")}, arch.whisper)
    elif arch.encoder_type == "wavlm":
        params["encoder"] = convert_wavlm(
            {k.removeprefix("encoder."): v for k, v in sd.items()
             if k.startswith("encoder.")}, arch.wavlm)

    params["lang"] = {"emb": {"w": _t(sd["lang_emb.weight"])},
                      "proj": _linear(sd, "lang_proj")}

    if arch.enable_bilstm and "bilstm.weight_ih_l0" in sd:
        params["bilstm"] = _lstm_from_torch(sd, "bilstm",
                                            arch.bilstm_num_layers)

    conformers, conformer_states = [], []
    i = 0
    while f"conformer_layers.{i}.ln1.weight" in sd:
        p, s = _conformer_from_torch(sd, f"conformer_layers.{i}")
        conformers.append(p)
        conformer_states.append(s)
        i += 1
    params["conformer"] = conformers

    if arch.enable_dilated_conv and "dilated_conv_stack.0.weight" in sd:
        stack = []
        j = 0
        while f"dilated_conv_stack.{j}.weight" in sd:
            stack.append(_conv(sd, f"dilated_conv_stack.{j}"))
            j += 2  # ReLU modules occupy odd indices
        params["dilated"] = stack

    params["classifier"] = _linear(sd, "classifier")
    params["offset_head"] = {"conv1": _conv(sd, "boundary_offset_head.0"),
                             "conv2": _conv(sd, "boundary_offset_head.2")}
    return params, {"conformer": conformer_states}


def _put_linear(out: Dict, prefix: str, p) -> None:
    """Write a linear pytree {w[, b]} as torch-convention state_dict keys
    (weight transposed). Shared by every export path — the transpose/bias
    convention must stay in one place."""
    out[f"{prefix}.weight"] = np.asarray(p["w"]).T
    if "b" in p:
        out[f"{prefix}.bias"] = np.asarray(p["b"])


def _put_ln(out: Dict, prefix: str, p) -> None:
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])


def export_wavlm(params, arch) -> Dict:
    """Inverse of ``convert_wavlm``: pytree → HF ``WavLMModel`` state_dict
    keys (numpy values). The pos-conv weight-norm is reconstructed as
    original1 = folded weight, original0 = its per-kernel-position norm —
    folding back reproduces the weight exactly."""
    out: Dict = {}
    put_linear = functools.partial(_put_linear, out)
    put_ln = functools.partial(_put_ln, out)

    for i, layer in enumerate(params["feature_encoder"]):
        pre = f"feature_extractor.conv_layers.{i}"
        out[f"{pre}.conv.weight"] = np.asarray(layer["conv"]["w"])
        if "b" in layer["conv"]:
            out[f"{pre}.conv.bias"] = np.asarray(layer["conv"]["b"])
        if "norm" in layer:
            put_ln(f"{pre}.layer_norm", layer["norm"])
    put_ln("feature_projection.layer_norm", params["feature_projection"]["ln"])
    put_linear("feature_projection.projection",
               params["feature_projection"]["proj"])

    w = np.asarray(params["pos_conv"]["w"])
    out["encoder.pos_conv_embed.conv.parametrizations.weight.original0"] = \
        np.sqrt((w ** 2).sum(axis=(0, 1), keepdims=True))
    out["encoder.pos_conv_embed.conv.parametrizations.weight.original1"] = w
    if "b" in params["pos_conv"]:
        out["encoder.pos_conv_embed.conv.bias"] = \
            np.asarray(params["pos_conv"]["b"])
    put_ln("encoder.layer_norm", params["encoder_ln"])

    rel = np.asarray(params["rel_attn_embed"]["w"])
    for i, layer in enumerate(params["layers"]):
        pre = f"encoder.layers.{i}"
        if i == 0:
            # HF stores the shared bucket table on layer 0 only
            out[f"{pre}.attention.rel_attn_embed.weight"] = rel
        put_linear(f"{pre}.attention.q_proj", layer["q"])
        put_linear(f"{pre}.attention.k_proj", layer["k"])
        put_linear(f"{pre}.attention.v_proj", layer["v"])
        put_linear(f"{pre}.attention.out_proj", layer["out"])
        out[f"{pre}.attention.gru_rel_pos_const"] = \
            np.asarray(layer["gru_gate_const"]).reshape(1, -1, 1, 1)
        put_linear(f"{pre}.attention.gru_rel_pos_linear", layer["gru_gate"])
        put_ln(f"{pre}.layer_norm", layer["attn_ln"])
        put_linear(f"{pre}.feed_forward.intermediate_dense", layer["ff_in"])
        put_linear(f"{pre}.feed_forward.output_dense", layer["ff_out"])
        put_ln(f"{pre}.final_layer_norm", layer["final_ln"])
    return out


def export_whisper_encoder(params) -> Dict:
    """Inverse of ``convert_whisper_encoder``: pytree → bare HF
    ``WhisperEncoder`` state_dict keys (numpy values)."""
    out: Dict = {}
    put_linear = functools.partial(_put_linear, out)
    put_ln = functools.partial(_put_ln, out)

    for name in ("conv1", "conv2"):
        out[f"{name}.weight"] = np.asarray(params[name]["w"])
        if "b" in params[name]:
            out[f"{name}.bias"] = np.asarray(params[name]["b"])
    out["embed_positions.weight"] = np.asarray(params["embed_positions"])
    put_ln("layer_norm", params["ln_post"])
    for i, layer in enumerate(params["layers"]):
        pre = f"layers.{i}"
        put_ln(f"{pre}.self_attn_layer_norm", layer["attn_ln"])
        put_linear(f"{pre}.self_attn.q_proj", layer["q"])
        put_linear(f"{pre}.self_attn.k_proj", layer["k"])
        put_linear(f"{pre}.self_attn.v_proj", layer["v"])
        put_linear(f"{pre}.self_attn.out_proj", layer["out"])
        put_ln(f"{pre}.final_layer_norm", layer["final_ln"])
        put_linear(f"{pre}.fc1", layer["ff_in"])
        put_linear(f"{pre}.fc2", layer["ff_out"])
    return out


def export_tagger(params, state, arch) -> Dict:
    """Inverse of ``convert_tagger``: our pytrees → a reference-compatible
    torch state_dict (numpy values; caller wraps in torch tensors). The
    encoder is exported under the reference's ``encoder.`` prefix
    (model.py:70/80 keeps the HF module as ``self.encoder``)."""
    out: Dict = {}
    if arch.encoder_type == "wavlm" and "encoder" in params:
        for k, v in export_wavlm(params["encoder"], arch.wavlm).items():
            out[f"encoder.{k}"] = v
    elif arch.encoder_type == "whisper" and "encoder" in params:
        for k, v in export_whisper_encoder(params["encoder"]).items():
            out[f"encoder.{k}"] = v

    put_linear = functools.partial(_put_linear, out)
    put_ln = functools.partial(_put_ln, out)

    def put_conv(prefix, p):
        out[f"{prefix}.weight"] = np.asarray(p["w"])
        if "b" in p:
            out[f"{prefix}.bias"] = np.asarray(p["b"])

    put_linear("lang_proj", params["lang"]["proj"])
    out["lang_emb.weight"] = np.asarray(params["lang"]["emb"]["w"])
    if "bilstm" in params:
        for i, dirs in enumerate(params["bilstm"]):
            for d, suffix in zip(dirs, ("", "_reverse")):
                out[f"bilstm.weight_ih_l{i}{suffix}"] = np.asarray(d["w_ih"]).T
                out[f"bilstm.weight_hh_l{i}{suffix}"] = np.asarray(d["w_hh"]).T
                out[f"bilstm.bias_ih_l{i}{suffix}"] = np.asarray(d["b_ih"])
                out[f"bilstm.bias_hh_l{i}{suffix}"] = np.asarray(d["b_hh"])
    for i, (p, s) in enumerate(zip(params["conformer"], state["conformer"])):
        pre = f"conformer_layers.{i}"
        for name, key in (("ff1", "ff1"), ("ff2", "ff2")):
            put_ln(f"{pre}.{name}.net.0", p[key]["ln"])
            put_linear(f"{pre}.{name}.net.1", p[key]["in"])
            put_linear(f"{pre}.{name}.net.4", p[key]["out"])
        out[f"{pre}.self_attn.in_proj_weight"] = np.concatenate(
            [np.asarray(p[k]["w"]).T for k in ("q", "k", "v")], axis=0)
        out[f"{pre}.self_attn.in_proj_bias"] = np.concatenate(
            [np.asarray(p[k]["b"]) for k in ("q", "k", "v")], axis=0)
        put_linear(f"{pre}.self_attn.out_proj", p["attn_out"])
        put_ln(f"{pre}.ln1", p["ln1"])
        put_ln(f"{pre}.ln2", p["ln2"])
        put_conv(f"{pre}.conv.0", p["conv_pw1"])
        put_conv(f"{pre}.conv.2", p["conv_main"])
        out[f"{pre}.conv.3.weight"] = np.asarray(p["bn"]["scale"])
        out[f"{pre}.conv.3.bias"] = np.asarray(p["bn"]["bias"])
        out[f"{pre}.conv.3.running_mean"] = np.asarray(s["bn"]["mean"])
        out[f"{pre}.conv.3.running_var"] = np.asarray(s["bn"]["var"])
        # torch BatchNorm1d state: required for the reference's strict
        # load (infer.py:205-208); the count itself only matters for
        # momentum=None BN, which the reference never configures.
        out[f"{pre}.conv.3.num_batches_tracked"] = np.asarray(0, np.int64)
        put_conv(f"{pre}.conv.5", p["conv_pw2"])
    if "dilated" in params:
        for j, p in enumerate(params["dilated"]):
            put_conv(f"dilated_conv_stack.{j * 2}", p)
    put_linear("classifier", params["classifier"])
    put_conv("boundary_offset_head.0", params["offset_head"]["conv1"])
    put_conv("boundary_offset_head.2", params["offset_head"]["conv2"])
    return out
