"""Shims that let the torch reference at /root/reference import on this
image (zero egress: its deps ``rotary_embedding_torch`` and ``omegaconf``
are not installed and cannot be).

The rotary shim reimplements the subset of the public lucidrains
``rotary-embedding-torch`` package that the reference uses
(reference: owl_wms/nn/rope.py:65-79, 104 — ``RotaryEmbedding`` with
'pixel'/'lang' frequency families, ``.freqs``, ``get_axial_freqs`` with
per-axis offsets). It follows the published library source; the
``offsets=(0,0,0,1)`` pad-axis trick maps the size-1 axis position
linspace(-1,1,1)=[-1] to 0, i.e. an identity rotation for padding dims.

The omegaconf stub only needs to be importable — parity tests construct
reference configs as plain namespaces instead of via Config.from_yaml.
"""

import math
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _build_rotary_module():
    import torch
    from torch import nn

    mod = types.ModuleType("rotary_embedding_torch")

    class RotaryEmbedding(nn.Module):
        def __init__(self, dim, freqs_for="lang", theta=10000,
                     max_freq=10, **_kw):
            super().__init__()
            self.freqs_for = freqs_for
            if freqs_for == "lang":
                freqs = 1.0 / (theta ** (
                    torch.arange(0, dim, 2)[: dim // 2].float() / dim))
            elif freqs_for == "pixel":
                freqs = torch.linspace(1.0, max_freq / 2, dim // 2) * math.pi
            else:
                raise ValueError(f"unsupported freqs_for: {freqs_for}")
            self.freqs = nn.Parameter(freqs, requires_grad=False)

        def forward(self, t, seq_len=None, offset=0):
            freqs = torch.einsum(
                "..., f -> ... f", t.type(self.freqs.dtype), self.freqs)
            return torch.repeat_interleave(freqs, 2, dim=-1)

        def get_axial_freqs(self, *dims, offsets=None):
            colon = slice(None)
            all_freqs = []
            for ind, dim in enumerate(dims):
                if self.freqs_for == "pixel":
                    pos = torch.linspace(-1.0, 1.0, steps=dim)
                else:
                    pos = torch.arange(dim).float()
                if offsets is not None:
                    pos = pos + offsets[ind]
                freqs = self.forward(pos, seq_len=dim)
                all_axis = [None] * len(dims)
                all_axis[ind] = colon
                all_freqs.append(freqs[(Ellipsis, *all_axis, colon)])
            all_freqs = torch.broadcast_tensors(*all_freqs)
            return torch.cat(all_freqs, dim=-1)

    def _rotate_half(x):
        x = x.unflatten(-1, (-1, 2))
        x1, x2 = x.unbind(-1)
        return torch.stack((-x2, x1), dim=-1).flatten(-2)

    def apply_rotary_emb(freqs, t, start_index=0, scale=1.0):
        rot_dim = freqs.shape[-1]
        left = t[..., :start_index]
        mid = t[..., start_index:start_index + rot_dim]
        right = t[..., start_index + rot_dim:]
        mid = (mid * freqs.cos() * scale) + \
            (_rotate_half(mid) * freqs.sin() * scale)
        return torch.cat((left, mid, right), dim=-1)

    mod.RotaryEmbedding = RotaryEmbedding
    mod.apply_rotary_emb = apply_rotary_emb
    return mod


def _build_omegaconf_stub():
    mod = types.ModuleType("omegaconf")

    class OmegaConf:
        @staticmethod
        def create(*a, **k):
            raise NotImplementedError(
                "omegaconf stub: construct reference configs as namespaces")

        structured = create

    mod.OmegaConf = OmegaConf
    return mod


def _empty_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _install_import_stubs():
    """Importable placeholders for deps the reference's package-level
    imports pull in but the parity tests never execute (wandb / moviepy /
    diffusers / owl_vaes). Attribute access works; calling raises."""

    class _Unavailable:
        def __init__(self, *a, **k):
            raise NotImplementedError("stubbed dependency (parity tests "
                                      "never execute this path)")

    def _unavailable_fn(*a, **k):
        raise NotImplementedError("stubbed dependency")

    if "wandb" not in sys.modules:
        sys.modules["wandb"] = _empty_module(
            "wandb", init=_unavailable_fn, log=_unavailable_fn,
            Video=_Unavailable, Audio=_Unavailable, Image=_Unavailable,
            watch=_unavailable_fn)
    if "diffusers" not in sys.modules:
        sys.modules["diffusers"] = _empty_module(
            "diffusers", AutoencoderDC=_Unavailable)
    if "owl_vaes" not in sys.modules:
        sys.modules["owl_vaes"] = _empty_module(
            "owl_vaes", from_pretrained=_unavailable_fn)
    if "moviepy" not in sys.modules:
        moviepy = _empty_module("moviepy")
        editor = _empty_module("moviepy.editor",
                               ImageSequenceClip=_Unavailable)
        audio = _empty_module("moviepy.audio")
        audio_clip = _empty_module("moviepy.audio.AudioClip",
                                   AudioArrayClip=_Unavailable)
        moviepy.editor = editor
        moviepy.audio = audio
        audio.AudioClip = audio_clip
        sys.modules.update({
            "moviepy": moviepy, "moviepy.editor": editor,
            "moviepy.audio": audio, "moviepy.audio.AudioClip": audio_clip})
    if "dotenv" not in sys.modules:
        sys.modules["dotenv"] = _empty_module(
            "dotenv", load_dotenv=lambda *a, **k: None)


def install():
    """Register the shims and put the reference repo on sys.path."""
    if "rotary_embedding_torch" not in sys.modules:
        try:
            import rotary_embedding_torch  # noqa: F401
        except ImportError:
            sys.modules["rotary_embedding_torch"] = _build_rotary_module()
    if "omegaconf" not in sys.modules:
        try:
            import omegaconf  # noqa: F401
        except ImportError:
            sys.modules["omegaconf"] = _build_omegaconf_stub()
    _install_import_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
