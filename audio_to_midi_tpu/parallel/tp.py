"""Tensor (model) parallelism: Megatron-style sharding over a "model" axis.

The reference scales only by data parallelism (replicated params,
train.py:833-842); population members are its only other axis.  On TPU the
idiomatic way to go past DP is GSPMD tensor parallelism: *place* the
transformer weights with NamedShardings that split attention heads and FFN
hidden units over the mesh's "model" axis and let jit propagate the layout
through the unchanged forward/backward — XLA inserts exactly the classic
Megatron collectives (an all-reduce after the attention out-projection and
after the FFN out-projection, plus a GLU-halves reshard — see the ``in_proj``
rule below), riding ICI, without any model-code change.

Sharding rules (everything else replicated over "model"):

  * ``attention/{q_up,k_up,v_up}/w`` — (.., D|ckv, H*hd): split the OUTPUT
    (head) dim.  The RoPE halves-layout permutation
    (rope.permute_qk_weight_for_rope) permutes lanes WITHIN each head, so
    head blocks stay contiguous and a per-head split is layout-safe; heads
    are kept whole (require H % model_size == 0).
  * ``attention/out/w`` — (.., H*hd, D): split the INPUT dim; the contraction
    over the sharded dim is the layer's all-reduce point.
  * ``ff/in_proj/{w,b}`` — (.., D, 2*inter): split the OUTPUT dim.  The GLU
    halves split (transformer.feed_forward) happens at column ``inter``, so a
    contiguous shard of the flat (D, 2*inter) concat holds gate-only or
    value-only columns — NOT matching gate/value pairs; GSPMD inserts one
    reshard (all-to-all over "model" of the (B, S, inter) halves) to realign
    them for the elementwise ``gelu(x1)*x2``.  Pairing the columns per shard
    would need a column permutation of the stored weight (and its inverse on
    out_proj rows), breaking layout-independence of the checkpoint format —
    at inter=512/seq 250 the activation reshard is tiny over ICI, so the
    flat layout is kept.
  * ``ff/out_proj/w`` — (.., inter, D): split the INPUT dim (all-reduce point).
  * ``kv_down`` (the MLA compression, ckv = 64 lanes) and all norms/decoder/
    CNN params are replicated — ckv is far below a useful shard size.

Leaves may carry leading (ensemble,) and/or (num_layers,) stacking axes;
specs are built per-leaf from the trailing dims, with axis 0 optionally
sharded over "ensemble".  Anything that does not divide evenly falls back to
replicated (a layout choice can never change semantics under GSPMD, but we
never create padded shards).

Composes with the existing axes into ("ensemble", "data", "model") meshes:
params shard over ensemble x model and replicate over data; batches shard
over data; gradients all-reduce over data — all inside one jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey

from .mesh import ENSEMBLE_AXIS, MODEL_AXIS

# (enclosing module, leaf param) -> which trailing dim to split: "col" = last
# axis (projection outputs / biases), "row" = second-to-last (projection
# inputs; the contraction that becomes the all-reduce).  The tuples only
# apply INSIDE an "attention"/"ff" module (the decoder also has an "out"
# linear, which must stay replicated) — _tp_dim checks membership.
_COL = {("q_up", "w"), ("k_up", "w"), ("v_up", "w"), ("in_proj", "w"), ("in_proj", "b")}
_ROW = {("out", "w"), ("out_proj", "w")}
_ATTENTION_TAILS = {("q_up", "w"), ("k_up", "w"), ("v_up", "w"), ("out", "w")}


def _dict_names(path) -> Tuple[str, ...]:
    return tuple(k.key for k in path if isinstance(k, DictKey))


def _tp_dim(names: Tuple[str, ...]) -> Optional[str]:
    if len(names) < 2:
        return None
    tail = names[-2:]
    module = "attention" if tail in _ATTENTION_TAILS else "ff"
    if module not in names:
        return None
    if tail in _COL:
        return "col"
    if tail in _ROW:
        return "row"
    return None


def _leaf_spec(path, leaf, msize: int, num_heads: int, ensemble: bool) -> P:
    dims = [None] * leaf.ndim
    if ensemble and leaf.ndim > 0:
        dims[0] = ENSEMBLE_AXIS
    kind = _tp_dim(_dict_names(path))
    names = _dict_names(path)
    if kind == "col" and leaf.ndim >= (2 if names[-1] == "w" else 1):
        # Head projections: keep heads whole so each shard holds complete
        # contiguous (head, hd) blocks (halves-layout RoPE permutes within a
        # head only).
        head_proj = names[-2] in ("q_up", "k_up", "v_up")
        if leaf.shape[-1] % msize == 0 and not (head_proj and num_heads % msize):
            dims[-1] = MODEL_AXIS
    elif kind == "row" and leaf.ndim >= 2:
        if leaf.shape[-2] % msize == 0:
            dims[-2] = MODEL_AXIS
    return P(*dims)


def tp_spec_tree(params, mesh: Mesh, *, num_heads: int, ensemble: bool = False):
    """Per-leaf NamedShardings for a param (or optimizer-state) pytree.

    Works on any tree whose leaves are reached through the param dict names
    (optimizer moments mirror the param tree, so Adam's mu/nu shard exactly
    like the weights they track); leaves with no TP rule — counts, norms,
    CNN/decoder weights — replicate over "model".
    """
    if MODEL_AXIS not in mesh.shape:
        raise ValueError(f'mesh has no "{MODEL_AXIS}" axis: {dict(mesh.shape)}')
    msize = mesh.shape[MODEL_AXIS]

    def spec(path, leaf):
        return NamedSharding(mesh, _leaf_spec(path, leaf, msize, num_heads, ensemble))

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_tp(params, mesh: Mesh, *, num_heads: int, ensemble: bool = False):
    """Place a pytree with Megatron TP (+ optional ensemble axis-0) sharding."""
    specs = tp_spec_tree(params, mesh, num_heads=num_heads, ensemble=ensemble)
    return jax.tree.map(jax.device_put, params, specs)


# ---------------------------------------------------------------------------
# Head-sharded Pallas attention under TP (VERDICT r04 #7)
#
# The fused attention kernels (ops/pallas_attention.py) are single-chip
# programs: GSPMD cannot partition the opaque pallas_call, so TP used to
# force attention_impl="xla" (+16.2 ms/step by PERF.md's own measurement).
# But attention heads never interact, and the TP sharding rule keeps heads
# whole per shard (head-split rule above) — so the kernels can run
# per-shard on their local heads inside a `jax.shard_map` that is MANUAL
# over the "model" (and, when the batch divides, "data") axes and AUTO over
# everything else (the ensemble axis stays a vmap dim; shard_map's batching
# rule handles it).  The all-reduce stays at the out-projection, exactly as
# in the einsum formulation.  models/attention.py consults this module-level
# context at trace time; the train loop sets it whenever the mesh has an
# active model axis and the attention impl is kernel-based.
# ---------------------------------------------------------------------------

_TP_ATTENTION_MESH: Optional[Mesh] = None


def set_tp_attention_mesh(mesh: Optional[Mesh]) -> None:
    """Enable (mesh with a >1 "model" axis) or clear (None / no model axis)
    head-sharded Pallas attention.  Read at trace time by models/attention;
    set it before the first step/eval trace and keep it constant for the
    run (jit caches traces)."""
    global _TP_ATTENTION_MESH
    if mesh is not None and mesh.shape.get(MODEL_AXIS, 1) > 1:
        _TP_ATTENTION_MESH = mesh
    else:
        _TP_ATTENTION_MESH = None


def tp_attention_mesh() -> Optional[Mesh]:
    return _TP_ATTENTION_MESH
