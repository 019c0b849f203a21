"""Custom init surgery — the reference's (disabled) ``init_model``
(train.py:573-644): re-draw attention projection weights and all CNN conv
weights from N(0, 0.2), CNN conv biases from N(0, 0.01), and zero attention
projection biases.  The reference keeps the call commented out
(train.py:792); this exists for capability parity behind
``TrainConfig.use_custom_init``.

Targets (matching the reference's leaf selection):
  * SelfAttention query_down/query_up/kv_down/key_up/value_up weights —
    ours are ``q_up``, ``kv_down``, ``k_up``, ``v_up`` (the query-down path
    is commented out in the reference too, model.py:286-299); the out-proj is
    NOT touched.  All are bias-free here; the reference zeroes their biases.
  * Every Conv1d — stem, downsamples, depthwise convs AND the two pointwise
    convs per ConvNeXt block (eqx.nn.Conv1d in the reference, ``pw1``/``pw2``
    Linear params here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.nn import Params
from ..models.rope import rope_permutation

_ATTN_KEYS = ("q_up", "kv_down", "k_up", "v_up")
_CONV_KEYS = ("conv", "depth_conv", "pw1", "pw2")

_HEAD_WEIGHT_STD = 0.2
_CNN_WEIGHT_STD = 0.2
_CNN_BIAS_STD = 0.01


def apply_init_surgery(params: Params, key: jax.Array, num_heads: int) -> Params:
    """Re-initialize attention-projection and conv weights in place of the
    default uniform init.  ``num_heads`` is needed because our q/k weights
    are stored in the RoPE halves layout (models/rope.py) — the fresh draws
    get the same permutation so downstream kernels see a consistent layout
    (a column permutation of an iid normal is identically distributed, so
    this matches the reference statistically either way)."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(params)[0]
    n = len(leaves_with_paths)
    keys = jax.random.split(key, n)

    def path_names(path):
        # DictKey has .key, SequenceKey has .idx — keep both so leaves in
        # different list entries (CNN stages) don't collide.
        return [p.key if hasattr(p, "key") else p.idx for p in path]

    replacements = {}
    for i, (path, leaf) in enumerate(leaves_with_paths):
        names = path_names(path)
        if len(names) < 2:
            continue
        parent, field = names[-2], names[-1]
        if parent in _ATTN_KEYS and field == "w":
            w = jax.random.normal(keys[i], leaf.shape, leaf.dtype) * _HEAD_WEIGHT_STD
            if parent in ("q_up", "k_up"):
                # Stacked transformer leaves carry leading (num_layers,) axes;
                # the halves permutation applies to the output-column axis.
                *lead, in_dim, out_dim = w.shape
                perm = rope_permutation(out_dim // num_heads)
                w = w.reshape(*lead, in_dim, num_heads, out_dim // num_heads)
                w = w[..., perm].reshape(*lead, in_dim, out_dim)
            replacements[tuple(names)] = w
        elif parent in _ATTN_KEYS and field == "b":
            replacements[tuple(names)] = jnp.zeros_like(leaf)
        elif parent in _CONV_KEYS and field == "w":
            replacements[tuple(names)] = (
                jax.random.normal(keys[i], leaf.shape, leaf.dtype) * _CNN_WEIGHT_STD
            )
        elif parent in _CONV_KEYS and field == "b":
            replacements[tuple(names)] = (
                jax.random.normal(keys[i], leaf.shape, leaf.dtype) * _CNN_BIAS_STD
            )

    def rebuild(path, leaf):
        names = tuple(path_names(path))
        return replacements.get(names, leaf)

    return jax.tree_util.tree_map_with_path(rebuild, params)
