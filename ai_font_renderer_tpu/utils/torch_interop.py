"""torch state_dict interop: consume and produce ``font_renderer.pth``.

The reference persists its model as a raw torch state_dict
(helpers.py:18,76-105) of ``AttentionFontRenderer`` (model.py:129-204).
This module maps that contract onto our flat param dict losslessly in both
directions, so:

  * a reference-trained ``font_renderer.pth`` can be served/rendered by
    this framework (``afr render --weights font_renderer.pth``), and
  * weights trained here can be exported for the reference to load.

Layout differences handled:

  * torch ``nn.Linear`` stores ``weight`` as [out, in] and computes
    ``x @ W.T``; we store [in, out] and compute ``x @ W`` — transpose.
  * ``attention.in_proj_weight`` is the stacked [3E, E] q/k/v projection
    (torch packs q first, then k, then v); we keep separate wq/wk/wv in
    [E, E] x-then-W orientation — split rows, then transpose each block.
  * ``layer_norm.weight/bias`` -> ``ln_scale``/``ln_bias`` (same shape).
  * ``embedding.weight`` and ``positional_encoding`` map 1:1.

Only the reference's linear-decoder architecture exists in torch, so the
conv decoder families have no state_dict counterpart; exporting them
raises.

Forward parity with identical weights is proven in
tests/test_torch_parity.py (reference model imported unmodified).
"""

from __future__ import annotations

import numpy as np

# our key -> (torch key, needs_transpose)
_DIRECT = {
    "embedding": ("embedding.weight", False),
    "pos": ("positional_encoding", False),
    "wo": ("attention.out_proj.weight", True),
    "bo": ("attention.out_proj.bias", False),
    "ln_scale": ("layer_norm.weight", False),
    "ln_bias": ("layer_norm.bias", False),
    "fc1_w": ("fc1.weight", True),
    "fc1_b": ("fc1.bias", False),
    "out_w": ("fc_output.weight", True),
    "out_b": ("fc_output.bias", False),
}


def from_state_dict(sd: dict) -> dict:
    """torch ``AttentionFontRenderer`` state_dict -> our param dict (numpy)."""
    import jax.numpy as jnp

    def arr(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    params = {}
    for ours, (theirs, transpose) in _DIRECT.items():
        a = arr(sd[theirs]).astype(np.float32)
        params[ours] = a.T if transpose else a
    in_w = arr(sd["attention.in_proj_weight"]).astype(np.float32)  # [3E, E]
    in_b = arr(sd["attention.in_proj_bias"]).astype(np.float32)  # [3E]
    e = in_w.shape[1]
    assert in_w.shape[0] == 3 * e, f"in_proj_weight shape {in_w.shape}"
    params["wq"] = in_w[:e].T
    params["wk"] = in_w[e : 2 * e].T
    params["wv"] = in_w[2 * e :].T
    params["bq"] = in_b[:e]
    params["bk"] = in_b[e : 2 * e]
    params["bv"] = in_b[2 * e :]
    return {k: jnp.asarray(v) for k, v in params.items()}


def to_state_dict(params: dict):
    """Our param dict -> torch state_dict loadable by the reference model."""
    import torch

    if "out_w" not in params:
        raise ValueError(
            "only the linear-decoder architecture has a torch counterpart; "
            "conv/conv_ps checkpoints cannot be exported to .pth"
        )

    def t(a):
        return torch.from_numpy(np.asarray(a, dtype=np.float32).copy())

    sd = {}
    for ours, (theirs, transpose) in _DIRECT.items():
        a = np.asarray(params[ours], dtype=np.float32)
        sd[theirs] = t(a.T if transpose else a)
    e = np.asarray(params["wq"]).shape[0]
    in_w = np.concatenate(
        [np.asarray(params[k], dtype=np.float32).T for k in ("wq", "wk", "wv")],
        axis=0,
    )
    in_b = np.concatenate(
        [np.asarray(params[k], dtype=np.float32) for k in ("bq", "bk", "bv")]
    )
    assert in_w.shape == (3 * e, e)
    sd["attention.in_proj_weight"] = t(in_w)
    sd["attention.in_proj_bias"] = t(in_b)
    return sd


def load_pth(path: str) -> dict:
    """Load a reference ``font_renderer.pth`` into our param dict."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return from_state_dict(sd)


def save_pth(params: dict, path: str, mcfg=None) -> None:
    """Export our params as a torch state_dict the reference can load.

    ``mcfg`` is accepted for signature parity with save_params; the torch
    contract is a bare state_dict (helpers.py:76-79), so no config rides
    along — the reference reconstructs the model from its own constants.
    """
    import torch

    torch.save(to_state_dict(params), path)
