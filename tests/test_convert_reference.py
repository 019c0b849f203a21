"""Reference-checkpoint conversion: build a reference-shaped (Equinox field
layout) tree from our params via the inverse layout mapping, convert it back,
and check exact round-trip — validating every transpose/squeeze/stack rule."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from audio_to_midi_tpu.config import ModelConfig
from audio_to_midi_tpu.models import model as model_lib
from convert_reference_checkpoint import convert_reference_tree

CFG = ModelConfig(
    dims=(4, 8),
    depths=(2, 1),
    num_transformer_layers=2,
    num_transformer_heads=2,
    attention_size=8,
    compressed_attention_kv_size=8,
    compressed_attention_q_size=8,
)


def _to_ref_conv(p):
    return {
        "weight": np.transpose(np.asarray(p["w"]), (2, 1, 0)),
        "bias": np.asarray(p["b"])[:, None],
    }


def _to_ref_conv1x1(p):
    return {
        "weight": np.asarray(p["w"]).T[:, :, None],
        "bias": np.asarray(p["b"])[:, None],
    }


def _to_ref_linear(p):
    out = {"weight": np.asarray(p["w"]).T}
    if "b" in p:
        out["bias"] = np.asarray(p["b"])
    return out


def _to_ref_ln(p):
    return {"weight": np.asarray(p["scale"]), "bias": np.asarray(p["bias"])}


def _sw(x):
    return np.swapaxes(np.asarray(x), -1, -2)  # stacked (L, in, out) -> (L, out, in)


def _unpermute_rope(w, num_heads):
    """Our halves layout -> the reference's interleaved layout (inverse of
    rope.permute_qk_weight_for_rope).  w: (..., in, H*hd)."""
    from audio_to_midi_tpu.models.rope import rope_permutation

    hd = w.shape[-1] // num_heads
    perm = rope_permutation(hd)
    inverse = np.argsort(perm)
    shaped = np.asarray(w).reshape(*w.shape[:-1], num_heads, hd)
    return shaped[..., inverse].reshape(w.shape)


def _to_ref_attention(p, h=None):
    h = CFG.num_transformer_heads if h is None else h
    return {
        "query_up_proj": {"weight": _sw(_unpermute_rope(p["q_up"]["w"], h))},
        "kv_down_proj": {"weight": _sw(p["kv_down"]["w"])},
        "key_up_proj": {"weight": _sw(_unpermute_rope(p["k_up"]["w"], h))},
        "value_up_proj": {"weight": _sw(p["v_up"]["w"])},
        "output_proj": {"weight": _sw(p["out"]["w"])},
    }


def _to_ref_layer(p, local: bool, h=None):
    attn = _to_ref_attention(p["attention"], h)
    return {
        "attention_norm": _to_ref_ln(p["attention_norm"]),
        "attention_block": {"self_attention": attn} if local else attn,
        "feed_forward_norm": _to_ref_ln(p["ff_norm"]),
        "feed_forward_block": {
            "attention_to_intermediate_proj": {
                "weight": _sw(p["ff"]["in_proj"]["w"]),
                "bias": np.asarray(p["ff"]["in_proj"]["b"]),
            },
            "intermediate_to_attention_proj": {
                "weight": _sw(p["ff"]["out_proj"]["w"]),
                "bias": np.asarray(p["ff"]["out_proj"]["b"]),
            },
        },
    }


def build_reference_tree(params, cfg: ModelConfig):
    """Inverse of convert_reference_tree, reference model.py field layout."""
    layers = []
    for i, stage in enumerate(params["cnn"]["stages"]):
        seq = [
            {
                "conv": _to_ref_conv(stage["down"]["conv"]),
                "norm": _to_ref_ln(stage["down"]["norm"]),
            }
        ]
        for j in range(cfg.depths[i]):
            b = jax.tree.map(lambda x: np.asarray(x)[j], stage["blocks"])
            seq.append(
                {
                    "depth_conv": _to_ref_conv(b["depth_conv"]),
                    "point_conv_1": _to_ref_conv1x1(b["pw1"]),
                    "point_conv_2": _to_ref_conv1x1(b["pw2"]),
                    "norm": _to_ref_ln(b["norm"]),
                    "gamma": np.asarray(b["gamma"]),
                }
            )
        layers.append({"layers": seq})

    t = params["transformer"]
    return {
        "layers": layers,
        "norm": _to_ref_ln(params["cnn"]["final_norm"]),
        "transformer": {
            "layers": {
                "local_attention": _to_ref_layer(
                    t["local"], local=True, h=cfg.num_transformer_heads
                ),
                "global_attention": _to_ref_layer(
                    t["global"], local=False, h=cfg.num_transformer_heads
                ),
            }
        },
        "decoder": {
            "decoder_pooling": _to_ref_linear(params["decoder"]["out"]),
            "norm": _to_ref_ln(params["decoder"]["norm"]),
        },
    }


def test_convert_round_trip_exact():
    params, _ = model_lib.init(jax.random.PRNGKey(0), CFG)
    ref_tree = build_reference_tree(params, CFG)
    converted = convert_reference_tree(ref_tree, CFG)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(converted)[0]
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_converted_params_run_forward():
    params, _ = model_lib.init(jax.random.PRNGKey(1), CFG)
    converted = convert_reference_tree(build_reference_tree(params, CFG), CFG)
    rope = model_lib.make_rope(CFG)
    audio = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 200))
    a = model_lib.forward(params, CFG, audio, rope)[0]
    b = model_lib.forward(jax.tree.map(np.asarray, converted), CFG, audio, rope)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
