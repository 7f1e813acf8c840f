"""RoBERTa / METER checkpoint import into the language encoder.

The reference initializes its language stack from a local RoBERTa/METER
checkpoint with key remapping and the ``jump_init_txt`` even-layer skip
initialization for shallower students (reference:
pretrain_src/train_r2r_magic.py:183-254).  This module does the same against
HuggingFace ``roberta``-style state dicts, converting torch Linear layouts
([out, in]) to flax kernels ([in, out]).
"""

from __future__ import annotations

import numpy as np

from .checkpoint import flatten_params, unflatten_params


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def roberta_to_lang_encoder(hf_state: dict, num_layers: int,
                            jump_init: bool = False,
                            prefix: str = "lang_encoder") -> dict:
    """Map a HF roberta state dict -> flat {our_name: array}.

    ``jump_init``: take every second source layer (0, 2, 4, ...) so a
    6-layer student inherits from a 12-layer encoder
    (train_r2r_magic.py jump_init_txt).
    """
    sd = {k.removeprefix("roberta."): np.asarray(v)
          for k, v in hf_state.items()}
    out = {}

    def emb(src, dst):
        if src in sd:
            out[f"{prefix}.{dst}.embedding"] = sd[src]

    emb("embeddings.word_embeddings.weight", "word_embeddings")
    emb("embeddings.position_embeddings.weight", "position_embeddings")
    emb("embeddings.token_type_embeddings.weight", "token_type_embeddings")
    if "embeddings.LayerNorm.weight" in sd:
        out[f"{prefix}.emb_norm.scale"] = sd["embeddings.LayerNorm.weight"]
        out[f"{prefix}.emb_norm.bias"] = sd["embeddings.LayerNorm.bias"]

    for i in range(num_layers):
        src_i = 2 * i if jump_init else i
        s = f"encoder.layer.{src_i}"
        d = f"{prefix}.layer_{i}"
        if f"{s}.attention.self.query.weight" not in sd:
            break
        for name in ("query", "key", "value"):
            out[f"{d}.attention.{name}.kernel"] = _t(
                sd[f"{s}.attention.self.{name}.weight"])
            out[f"{d}.attention.{name}.bias"] = sd[
                f"{s}.attention.self.{name}.bias"]
        out[f"{d}.attention.out.kernel"] = _t(
            sd[f"{s}.attention.output.dense.weight"])
        out[f"{d}.attention.out.bias"] = sd[f"{s}.attention.output.dense.bias"]
        out[f"{d}.attention_norm.LayerNorm_0.scale"] = sd[
            f"{s}.attention.output.LayerNorm.weight"]
        out[f"{d}.attention_norm.LayerNorm_0.bias"] = sd[
            f"{s}.attention.output.LayerNorm.bias"]
        out[f"{d}.ffn.intermediate.kernel"] = _t(
            sd[f"{s}.intermediate.dense.weight"])
        out[f"{d}.ffn.intermediate.bias"] = sd[f"{s}.intermediate.dense.bias"]
        out[f"{d}.ffn.output.kernel"] = _t(sd[f"{s}.output.dense.weight"])
        out[f"{d}.ffn.output.bias"] = sd[f"{s}.output.dense.bias"]
        out[f"{d}.ffn_norm.LayerNorm_0.scale"] = sd[
            f"{s}.output.LayerNorm.weight"]
        out[f"{d}.ffn_norm.LayerNorm_0.bias"] = sd[f"{s}.output.LayerNorm.bias"]
    return out


def load_roberta_weights(params, hf_state: dict, num_layers: int,
                         jump_init: bool = False):
    """Merge mapped RoBERTa weights into an existing param tree; returns
    (new_params, loaded_names)."""
    mapped = roberta_to_lang_encoder(hf_state, num_layers, jump_init)
    flat = flatten_params(params)
    loaded = []
    for name, arr in mapped.items():
        matches = [k for k in flat if k.endswith(name)]
        for k in matches:
            if flat[k].shape == arr.shape:
                flat[k] = arr.astype(flat[k].dtype)
                loaded.append(k)
    nested, _, _ = unflatten_params(flat)
    return nested, loaded
