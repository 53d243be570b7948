"""AttentionFontRenderer: char codes -> pixel sheet, as pure functions.

Functionally equivalent to the reference model (model.py:129-204):

    embed(128->32) + dropout                      (model.py:136-137,166-168)
    + learned positional encoding [100,32]        (model.py:140-141,171-172)
    -> 1x MultiheadAttention(4 heads, dropout)    (model.py:144,175-177)
    -> residual + post-LayerNorm                  (model.py:145,180)
    -> ReLU(Linear 32->64) + dropout              (model.py:148-149,183-184)
    -> flatten 100*64 -> Linear 6400->19200       (model.py:152,196)
    -> reshape [80,240], clamp(0,1)               (model.py:156,199-202)

~122.9M parameters, 99.99% of them in the output projection — the model IS a
giant GEMM with a small attention frontend, which is exactly what the MXU
wants. Design choices for TPU:

  * pure ``init``/``apply`` with params as a flat dict pytree — jit/grad/
    shard-friendly, no framework state;
  * dropout via explicit PRNG keys (deterministic, replayable);
  * the dominant GEMM runs in bf16 with f32 accumulation (params stay f32);
  * positional encodings stay LEARNED: the reference found sinusoidal and
    RoPE fail completely on this task (model.py:26-27).

The reference's zero-padding of short sequences (model.py:190-193) is
preserved structurally: inputs are always padded to max_length with code 0,
and padded positions flow through attention unmasked exactly as in the
reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import ModelConfig


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init(key: jax.Array, cfg: ModelConfig = ModelConfig()) -> dict:
    """Initialize parameters (distributions follow torch's module defaults)."""
    e, h = cfg.embedding_dim, cfg.hidden_dim
    flat = cfg.max_length * h
    pixels = cfg.sheet_height * cfg.sheet_width
    keys = jax.random.split(key, 12)
    xavier = (6.0 / (e + e)) ** 0.5  # MHA in_proj: xavier_uniform
    return {
        "embedding": jax.random.normal(keys[0], (cfg.vocab_size, e)),
        "pos": cfg.pos_init_std * jax.random.normal(keys[1], (cfg.max_length, e)),
        "wq": _uniform(keys[2], (e, e), xavier),
        "wk": _uniform(keys[3], (e, e), xavier),
        "wv": _uniform(keys[4], (e, e), xavier),
        "bq": jnp.zeros((e,)),
        "bk": jnp.zeros((e,)),
        "bv": jnp.zeros((e,)),
        "wo": _uniform(keys[5], (e, e), 1.0 / e**0.5),
        "bo": jnp.zeros((e,)),
        "ln_scale": jnp.ones((e,)),
        "ln_bias": jnp.zeros((e,)),
        "fc1_w": _uniform(keys[6], (e, h), 1.0 / e**0.5),
        "fc1_b": _uniform(keys[7], (h,), 1.0 / e**0.5),
        "out_w": _uniform(keys[8], (flat, pixels), 1.0 / flat**0.5),
        "out_b": _uniform(keys[9], (pixels,), 1.0 / flat**0.5),
    }


def param_count(params: dict) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def _dropout(x, rate, key, train, bits=False):
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    if bits:
        # Mask from raw uint8 PRNG bits: 4x less mask traffic than
        # bernoulli's f32-uniform path. Keep prob quantizes to 1/256.
        mask = jax.random.bits(key, x.shape, jnp.uint8) < int(keep * 256)
    else:
        mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))


def attention(params, x, cfg: ModelConfig, *, train=False, key=None):
    """Multi-head self-attention, math-equal to torch's MultiheadAttention.

    x: [B, S, E]. Softmax(QK^T / sqrt(E/H)) with dropout on the attention
    probabilities (as torch applies it), then output projection. Softmax
    statistics are f32 regardless of the activation dtype.
    """
    B, S, E = x.shape
    H = cfg.num_heads
    d = E // H
    dt = x.dtype
    q = (x @ params["wq"].astype(dt) + params["bq"].astype(dt)).reshape(B, S, H, d)
    k = (x @ params["wk"].astype(dt) + params["bk"].astype(dt)).reshape(B, S, H, d)
    v = (x @ params["wv"].astype(dt) + params["bv"].astype(dt)).reshape(B, S, H, d)
    logits = jnp.einsum(
        "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(d))
    probs = jax.nn.softmax(logits, axis=-1).astype(dt)
    if train:
        probs = _dropout(probs, cfg.dropout_rate, key, train, cfg.bits_dropout)
    out = jnp.einsum(
        "bhst,bthd->bshd", probs, v, preferred_element_type=jnp.float32
    ).astype(dt).reshape(B, S, E)
    return out @ params["wo"].astype(dt) + params["bo"].astype(dt)


def _layer_norm(x, scale, bias, eps=1e-5):
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def frontend(
    params: dict,
    codes: jax.Array,
    cfg: ModelConfig = ModelConfig(),
    *,
    train: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """Everything before the output projection: codes -> flat [B, 6400].

    Split out so the fused train step (train/step.py) can drive the
    frontend through jax.vjp while handling the dominant GEMM + its
    optimizer update in a fused Pallas kernel. ``apply`` composes this with
    the projection; the dropout key schedule lives here so both paths draw
    identical masks.
    """
    B, S = codes.shape
    S = min(S, cfg.max_length)
    codes = codes[:, :S]
    if train:
        k_emb, k_attn, k_fc = jax.random.split(key, 3)
    else:
        k_emb = k_attn = k_fc = None
    dt = jnp.bfloat16 if cfg.bf16_frontend else jnp.float32

    x = params["embedding"].astype(dt)[codes]  # [B, S, E]
    x = _dropout(x, cfg.dropout_rate, k_emb, train, cfg.bits_dropout)
    x = x + params["pos"].astype(dt)[:S]

    if cfg.fused_attention and B % cfg.fused_attention_tile == 0:
        from ..ops.fused_attention import fused_attention as _fa

        rate = cfg.dropout_rate if train else 0.0
        if train:
            seed = (
                jax.random.bits(k_attn, (), jnp.uint32) & jnp.uint32(0x7FFFFFFF)
            ).astype(jnp.int32)
        else:
            seed = jnp.int32(0)
        weights = {
            k: params[k]
            for k in ("wq", "wk", "wv", "wo", "bq", "bk", "bv", "bo")
        }
        interp = jax.default_backend() != "tpu"
        attn = _fa(
            cfg.num_heads, rate, cfg.fused_attention_tile, interp, x, weights, seed
        )
    else:
        attn = attention(params, x, cfg, train=train, key=k_attn)
    # LayerNorm statistics in f32 even under a bf16 frontend.
    x = _layer_norm(
        (x + attn).astype(jnp.float32), params["ln_scale"], params["ln_bias"]
    ).astype(dt)

    x = jax.nn.relu(x @ params["fc1_w"].astype(dt) + params["fc1_b"].astype(dt))
    x = _dropout(x, cfg.fc_dropout_rate, k_fc, train, cfg.bits_dropout)

    flat = x.astype(jnp.float32).reshape(B, S * cfg.hidden_dim)
    full = cfg.max_length * cfg.hidden_dim
    if flat.shape[1] < full:  # zero-pad short sequences (model.py:190-193)
        flat = jnp.pad(flat, ((0, 0), (0, full - flat.shape[1])))
    return flat


@partial(jax.jit, static_argnames=("cfg", "train"))
def apply(
    params: dict,
    codes: jax.Array,
    cfg: ModelConfig = ModelConfig(),
    *,
    train: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """Forward pass: int codes [B, <=max_length] -> sheets [B, H, W] in [0,1]."""
    B = codes.shape[0]
    flat = frontend(params, codes, cfg, train=train, key=key)

    # The dominant GEMM: [B, 6400] @ [6400, 19200]. bf16 inputs, f32
    # accumulation — the MXU's native mode.
    if cfg.use_pallas_output:
        from ..ops.fused_output import fused_output

        sheet = fused_output(flat, params["out_w"], params["out_b"])
        return sheet.reshape(B, cfg.sheet_height, cfg.sheet_width)
    dt = jnp.bfloat16 if cfg.bf16_matmul else jnp.float32
    sheet = (
        jnp.dot(
            flat.astype(dt),
            params["out_w"].astype(dt),
            preferred_element_type=jnp.float32,
        )
        + params["out_b"]
    )
    sheet = sheet.reshape(B, cfg.sheet_height, cfg.sheet_width)
    return jnp.clip(sheet, 0.0, 1.0)  # clamped linear output (model.py:156)
