"""Pure-numpy oracle of the REFERENCE forward pass.

A dependency-free (no equinox, no jax) reimplementation of the reference
``OutputSequenceGenerator.__call__`` semantics (model.py:740-769) and every
sub-module it touches:

  * Stem / Downsample / ConvNeXt Block     — model.py:84-167
  * final norm + transpose                 — model.py:759-762
  * TransformerStack of alternating local/global layers — model.py:615-670
  * SelfAttention with compressed KV + interleaved RoPE — model.py:260-374,
    rope.py:12-53
  * LocalSelfAttention incl. the padded-coordinate scatter quirk where the
    window outputs are accumulated at PADDED coordinates into an
    ORIGINAL-length buffer with JAX's drop-out-of-bounds scatter semantics
    — model.py:409-471
  * fp32 softmax (model.py:252) and fp32 LayerNorm casts (model.py:100,117,
    162,190,539,546,759)
  * Decoder LN -> Linear -> sigmoid        — model.py:185-198

It consumes the reference-layout weight tree produced by
``tests.test_convert_reference.build_reference_tree`` (Equinox field layout:
Linear weights (out, in), Conv1d weights (out, in/groups, K) with (out, 1)
bias) so the same weights can be run through our TPU-native forward and this
oracle and compared bit-for-tolerance.

Everything runs per-sample in float32, matching the reference's inference
path with an f32 input (dropout/SDD inert — model.py:71-74).
"""

from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _gelu(x):
    # tanh approximation — jax.nn.gelu's default, used by the reference
    # (model.py:164,234).
    x = np.asarray(x, np.float32)
    return 0.5 * x * (
        1.0 + np.tanh(np.sqrt(2.0 / np.pi).astype(np.float32)
                      * (x + 0.044715 * x ** 3))
    )


def _layer_norm_rows(x, p, eps=1e-5):
    """eqx.nn.LayerNorm over the last axis of each row (f32). x: (..., C)."""
    x = np.asarray(x, np.float32)
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    y = (x - mean) / np.sqrt(var + eps)
    return y * np.asarray(p["weight"], np.float32) + np.asarray(p["bias"], np.float32)


def _layer_norm_channels(x_cl, p, eps=1e-5):
    """Reference CNN LayerNorm: vmap over positions, normalize the channel
    axis (model.py:100,117,162).  x_cl: (C, L)."""
    return _layer_norm_rows(x_cl.T, p, eps).T


def _conv1d(x_cl, p, stride=1, same=False):
    """Strided 1-D conv, channels-first, eqx weight layout (O, I, K) with
    (O, 1) bias.  Plain loop over kernel taps — an oracle, not a kernel."""
    w = np.asarray(p["weight"], np.float32)
    b = np.asarray(p["bias"], np.float32)
    out_ch, in_ch, k = w.shape
    if same:
        left = (k - 1) // 2
        right = k - 1 - left
        x_cl = np.pad(x_cl, ((0, 0), (left, right)))
    length = (x_cl.shape[1] - k) // stride + 1
    out = np.zeros((out_ch, length), np.float32)
    for tap in range(k):
        # x slice aligned to tap: (I, length)
        xs = x_cl[:, tap : tap + stride * length : stride]
        out += w[:, :, tap] @ xs
    return out + b


def _depthwise_conv1d_same(x_cl, p):
    """groups == channels, SAME padding (model.py:131-138).  Weight
    (C, 1, K)."""
    w = np.asarray(p["weight"], np.float32)
    b = np.asarray(p["bias"], np.float32)
    c, _, k = w.shape
    left = (k - 1) // 2
    right = k - 1 - left
    xp = np.pad(x_cl, ((0, 0), (left, right)))
    length = x_cl.shape[1]
    out = np.zeros((c, length), np.float32)
    for tap in range(k):
        out += w[:, 0, tap][:, None] * xp[:, tap : tap + length]
    return out + b


def _linear(x, p):
    """eqx.nn.Linear: y = W @ x (+ b); applied row-wise.  x: (S, in)."""
    y = np.asarray(x, np.float32) @ np.asarray(p["weight"], np.float32).T
    if "bias" in p:
        y = y + np.asarray(p["bias"], np.float32)
    return y


def _softmax(x):
    x = np.asarray(x, np.float32)
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# RoPE (rope.py:12-53) — interleaved even/odd pairs
# ---------------------------------------------------------------------------


def precompute_rope(dim, max_pos, theta=10000.0):
    inv_freq = 1.0 / (
        theta ** (np.arange(0, dim, 2, dtype=np.float32)[: dim // 2] / dim)
    )
    t = np.arange(0, max_pos, dtype=np.float32)
    freqs = np.outer(t, inv_freq)
    return np.cos(freqs), np.sin(freqs)


def _apply_rope(x_shd, cos, sin):
    """x: (S, H, hd); cos/sin: (max_pos, hd//2)."""
    s = x_shd.shape[0]
    c = cos[:s][:, None, :]  # (S, 1, hd/2)
    sn = sin[:s][:, None, :]
    x1 = x_shd[..., 0::2].astype(np.float32)
    x2 = x_shd[..., 1::2].astype(np.float32)
    out = np.stack([x1 * c - x2 * sn, x1 * sn + x2 * c], axis=-1)
    return out.reshape(x_shd.shape)


# ---------------------------------------------------------------------------
# attention (model.py:241-374)
# ---------------------------------------------------------------------------


def _self_attention(x_sd, p, num_heads, cos, sin):
    s = x_sd.shape[0]
    q = _linear(x_sd, p["query_up_proj"]).reshape(s, num_heads, -1)
    q = _apply_rope(q, cos, sin)
    c_kv = _linear(x_sd, p["kv_down_proj"])
    k = _linear(c_kv, p["key_up_proj"]).reshape(s, num_heads, -1)
    k = _apply_rope(k, cos, sin)
    v = _linear(c_kv, p["value_up_proj"]).reshape(s, num_heads, -1)

    q = q / math.sqrt(q.shape[-1])
    logits = np.einsum("shd,Shd->hsS", q, k)
    weights = _softmax(logits)
    attn = np.einsum("hsS,Shd->shd", weights, v).reshape(s, -1)
    return _linear(attn, p["output_proj"])


def _local_self_attention(x_sd, p, num_heads, cos, sin, window):
    """model.py:409-471 with the quirks reproduced exactly:

    * pad split left/right (extra sample RIGHT when odd) so every position is
      covered by a window;
    * window outputs are scatter-added at PADDED coordinates into a buffer of
      the ORIGINAL length — indices >= seq_len are dropped (JAX's default
      out-of-bounds scatter mode), and the first `left` rows hold the outputs
      of the padding positions.
    """
    seq_len, hidden = x_sd.shape
    stride = window // 2
    required = stride - (seq_len - window) % stride
    if required != stride:
        left = required // 2
        right = required - left
        xp = np.pad(x_sd, ((left, right), (0, 0)))
    else:
        xp = x_sd
    num_windows = (xp.shape[0] - window) // stride + 1

    output = np.zeros((seq_len, hidden), np.float32)
    count = np.zeros((seq_len,), np.float32)
    for wi in range(num_windows):
        start = wi * stride
        out_w = _self_attention(
            xp[start : start + window], p["self_attention"], num_heads, cos, sin
        )
        for t in range(window):
            idx = start + t
            if idx < seq_len:  # OOB scatter updates are dropped
                output[idx] += out_w[t]
                count[idx] += 1
    return output / count[:, None]


def _feed_forward(x_sd, p):
    h = _linear(x_sd, p["attention_to_intermediate_proj"])
    x1, x2 = np.split(h, 2, axis=-1)
    return _linear(_gelu(x1) * x2, p["intermediate_to_attention_proj"])


def _transformer_layer(x_sd, p, num_heads, cos, sin, window=None):
    """Pre-LN layer (model.py:529-556)."""
    a_in = _layer_norm_rows(x_sd, p["attention_norm"])
    if window is not None:
        r = _local_self_attention(
            a_in, p["attention_block"], num_heads, cos, sin, window
        )
    else:
        r = _self_attention(a_in, p["attention_block"], num_heads, cos, sin)
    h = x_sd + r
    f_in = _layer_norm_rows(h, p["feed_forward_norm"])
    return h + _feed_forward(f_in, p["feed_forward_block"])


# ---------------------------------------------------------------------------
# full forward (model.py:740-769)
# ---------------------------------------------------------------------------


def _tree_index(tree, i):
    """Select layer i from a stacked (filter_vmap-style) leaf tree."""
    if isinstance(tree, dict):
        return {k: _tree_index(v, i) for k, v in tree.items()}
    return np.asarray(tree)[i]


def reference_forward(ref_tree, cfg, samples_cl, local_context=16):
    """Run the reference forward on one sample.

    ref_tree: reference-layout weights (build_reference_tree output)
    cfg: our ModelConfig (geometry only)
    samples_cl: (2, N) float32, channels-first like the reference input
    Returns (logits, probs), each (frames, output_vocab).
    """
    h = np.asarray(samples_cl, np.float32)

    # CNN stages: Sequential(downsample, blocks...) per stage (model.py:707-713)
    for i, stage in enumerate(ref_tree["layers"]):
        seq = stage["layers"]
        if i == 0:  # Stem: conv stride=k, then LN (model.py:98-100)
            h = _conv1d(h, seq[0]["conv"], stride=5)
            h = _layer_norm_channels(h, seq[0]["norm"])
        else:  # Downsample: LN then conv k=2 s=2 (model.py:116-118)
            h = _layer_norm_channels(h, seq[0]["norm"])
            h = _conv1d(h, seq[0]["conv"], stride=2)
        for blk in seq[1:]:  # Block (model.py:160-167), SDD inert at inference
            out = _depthwise_conv1d_same(h, blk["depth_conv"])
            out = _layer_norm_channels(out, blk["norm"])
            out = _conv1d(out, blk["point_conv_1"])
            out = _gelu(out)
            out = _conv1d(out, blk["point_conv_2"])
            h = np.asarray(blk["gamma"], np.float32)[:, None] * out + h

    h = _layer_norm_channels(h, ref_tree["norm"])  # model.py:759
    h = h.T  # (L, C) — model.py:762

    heads = cfg.num_transformer_heads
    cos, sin = precompute_rope(cfg.attention_size, cfg.rope_max_positions)
    stacked = ref_tree["transformer"]["layers"]
    for li in range(cfg.num_transformer_layers):
        h = _transformer_layer(
            h, _tree_index(stacked["local_attention"], li), heads, cos, sin,
            window=local_context,
        )
        h = _transformer_layer(
            h, _tree_index(stacked["global_attention"], li), heads, cos, sin,
        )

    # Decoder (model.py:185-198)
    out = _layer_norm_rows(h, ref_tree["decoder"]["norm"])
    logits = _linear(out, ref_tree["decoder"]["decoder_pooling"])
    probs = 1.0 / (1.0 + np.exp(-logits))
    return logits, probs
