"""HuggingFace checkpoint transplant into the JAX param pytree.

Counterpart of the reference's ``from_pretrained`` state-dict transplant
(``/root/reference/hydragen/llama.py:1398-1422``): take a transformers
``LlamaForCausalLM`` (or just its state dict) and produce the stacked-layer
param pytree used by ``hydragen_tpu.models.llama``.

Weight orientation: torch ``nn.Linear`` stores ``[out, in]``; our einsums use
``[in, out]``, so every projection is transposed once at load time.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from hydragen_tpu.models.config import ModelConfig


def _to_np(t):
    # torch tensor (cpu) or numpy array -> numpy
    if hasattr(t, "detach"):
        t = t.detach().to("cpu")
        try:
            return t.numpy()
        except TypeError:
            # bf16 torch tensors can't go straight to numpy
            return t.float().numpy()
    return np.asarray(t)


def _np_quantize(arr: np.ndarray):
    """Host-side symmetric int8 quantization over the in-features axis (-2).

    Quantizing on the host before device transfer keeps peak device HBM at
    the int8 size — a 7B checkpoint cannot hold bf16 originals plus int8
    copies on one 16 GB chip.
    """
    from hydragen_tpu.ops.quant import QuantizedTensor

    arr = arr.astype(np.float32)
    amax = np.abs(arr).max(axis=-2, keepdims=True)
    scale = np.maximum(amax, 1e-8) / 127.0
    q = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
    return QuantizedTensor(
        q=jnp.asarray(np.swapaxes(q, -1, -2)),  # stored [out, in]
        scale=jnp.asarray(np.squeeze(scale, -2), dtype=jnp.float32),
    )


def _np_quantize4(arr: np.ndarray, group: int = 128):
    """Host-side symmetric int4 group-wise quantization (ops/quant.quantize4
    semantics: bf16-rounded scales, [-7, 7] grid, planar nibble pack)."""
    import ml_dtypes

    from hydragen_tpu.ops.quant import Quantized4Tensor, pick_group4

    *lead, K, N = arr.shape
    g = pick_group4(K, group)
    G = K // g
    wf = arr.astype(np.float32).reshape(*lead, G, g, N)
    amax = np.abs(wf).max(axis=-2, keepdims=True)
    gscale = (np.maximum(amax, 1e-8) / 7.0).astype(ml_dtypes.bfloat16)
    q = np.clip(np.round(wf / gscale.astype(np.float32)), -7, 7)
    q = q.astype(np.int8).reshape(*lead, K, N)
    qt = np.swapaxes(q, -1, -2).astype(np.int32)  # [.., out, in]
    lo, hi = qt[..., : K // 2], qt[..., K // 2:]
    return Quantized4Tensor(
        qp=jnp.asarray(((hi << 4) | (lo & 0xF)).astype(np.int8)),
        gscale=jnp.asarray(np.squeeze(gscale, -2)),
    )


def params_from_hf_state_dict(state_dict, cfg: ModelConfig, quantization=None):
    """Convert a HF Llama state dict to the stacked param pytree.

    quantization="int8" (or "w8a8" — same INT8 storage, the engine only
    changes the matmul path) quantizes the projection matrices (and
    lm_head) on the host during conversion; "int4"/"w4a8" packs the
    projections to INT4 group-wise (lm_head stays INT8 — quality-critical,
    see ops/quant.py quantize_params).
    """
    assert quantization in (None, "int8", "w8a8", "int4", "w4a8")
    dt = cfg.jax_dtype
    L = cfg.num_hidden_layers
    quant = quantization is not None
    int4 = quantization in ("int4", "w4a8")

    def get(name):
        return _to_np(state_dict[name])

    def stack(fmt, transpose=False, quantize=False):
        mats = [get(fmt.format(i)) for i in range(L)]
        arr = np.stack([m.T if transpose else m for m in mats])
        if quantize and quant:
            return _np_quantize4(arr) if int4 else _np_quantize(arr)
        return jnp.asarray(arr, dtype=dt)

    params = {
        "embed_tokens": jnp.asarray(get("model.embed_tokens.weight"), dtype=dt),
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype=dt),
        "layers": {
            "input_norm": stack("model.layers.{}.input_layernorm.weight"),
            "post_attn_norm": stack("model.layers.{}.post_attention_layernorm.weight"),
            "wq": stack("model.layers.{}.self_attn.q_proj.weight", transpose=True, quantize=True),
            "wk": stack("model.layers.{}.self_attn.k_proj.weight", transpose=True, quantize=True),
            "wv": stack("model.layers.{}.self_attn.v_proj.weight", transpose=True, quantize=True),
            "wo": stack("model.layers.{}.self_attn.o_proj.weight", transpose=True, quantize=True),
            "gate": stack("model.layers.{}.mlp.gate_proj.weight", transpose=True, quantize=True),
            "up": stack("model.layers.{}.mlp.up_proj.weight", transpose=True, quantize=True),
            "down": stack("model.layers.{}.mlp.down_proj.weight", transpose=True, quantize=True),
        },
    }
    if cfg.attention_bias:
        params["layers"]["bq"] = stack("model.layers.{}.self_attn.q_proj.bias")
        params["layers"]["bk"] = stack("model.layers.{}.self_attn.k_proj.bias")
        params["layers"]["bv"] = stack("model.layers.{}.self_attn.v_proj.bias")
        params["layers"]["bo"] = stack("model.layers.{}.self_attn.o_proj.bias")

    if "lm_head.weight" in state_dict:
        head = get("lm_head.weight").T
        params["lm_head"] = _np_quantize(head) if quant else jnp.asarray(head, dtype=dt)
    else:
        assert cfg.tie_word_embeddings
        params["lm_head"] = params["embed_tokens"].T
    return params


def from_hf_model(hf_model, dtype: str = "bfloat16", quantization=None):
    """(config, params) from an in-memory transformers LlamaForCausalLM."""
    cfg = ModelConfig.from_hf_config(hf_model.config, dtype=dtype)
    params = params_from_hf_state_dict(
        hf_model.state_dict(), cfg, quantization=quantization
    )
    return cfg, params


def from_pretrained(model_name_or_path: str, dtype: str = "bfloat16",
                    quantization=None):
    """Load a HF checkpoint from disk/hub and convert.

    Mirrors ``HydragenLlamaForCausalLM.from_pretrained`` (llama.py:1398-1422).
    """
    from transformers import AutoModelForCausalLM

    hf_model = AutoModelForCausalLM.from_pretrained(model_name_or_path)
    return from_hf_model(hf_model, dtype=dtype, quantization=quantization)
