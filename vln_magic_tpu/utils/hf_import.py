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


def _cross_layer_map(sd: dict, src: str, dst: str) -> dict:
    """Map one METER ``BertCrossLayer`` (cross_modal_image_layers.N) onto our
    ``CrossModalLayer`` (models/layers.py:135): METER ``attention`` is the
    visual self-attention, ``crossattention`` the vision-queries-language
    attention, ``intermediate``/``output`` the FFN."""
    out = {}
    pairs = (("crossattention", "crossattention", "crossattention_norm"),
             ("attention", "self_attention", "self_norm"))
    for meter_attn, ours_attn, ours_norm in pairs:
        if f"{src}.{meter_attn}.self.query.weight" not in sd:
            continue
        for name in ("query", "key", "value"):
            out[f"{dst}.{ours_attn}.{name}.kernel"] = _t(
                sd[f"{src}.{meter_attn}.self.{name}.weight"])
            out[f"{dst}.{ours_attn}.{name}.bias"] = sd[
                f"{src}.{meter_attn}.self.{name}.bias"]
        out[f"{dst}.{ours_attn}.out.kernel"] = _t(
            sd[f"{src}.{meter_attn}.output.dense.weight"])
        out[f"{dst}.{ours_attn}.out.bias"] = sd[
            f"{src}.{meter_attn}.output.dense.bias"]
        out[f"{dst}.{ours_norm}.LayerNorm_0.scale"] = sd[
            f"{src}.{meter_attn}.output.LayerNorm.weight"]
        out[f"{dst}.{ours_norm}.LayerNorm_0.bias"] = sd[
            f"{src}.{meter_attn}.output.LayerNorm.bias"]
    if f"{src}.intermediate.dense.weight" in sd:
        out[f"{dst}.ffn.intermediate.kernel"] = _t(
            sd[f"{src}.intermediate.dense.weight"])
        out[f"{dst}.ffn.intermediate.bias"] = sd[f"{src}.intermediate.dense.bias"]
        out[f"{dst}.ffn.output.kernel"] = _t(sd[f"{src}.output.dense.weight"])
        out[f"{dst}.ffn.output.bias"] = sd[f"{src}.output.dense.bias"]
        out[f"{dst}.ffn_norm.LayerNorm_0.scale"] = sd[
            f"{src}.output.LayerNorm.weight"]
        out[f"{dst}.ffn_norm.LayerNorm_0.bias"] = sd[f"{src}.output.LayerNorm.bias"]
    return out


def meter_to_params(meter_state: dict, num_l_layers: int, num_x_layers: int,
                    jump_init: bool = False) -> dict:
    """Map a METER checkpoint (``meter_clip16_224_roberta_pretrain.ckpt``
    state_dict) onto the flat relative names of our model: the
    ``text_transformer`` stack -> lang_encoder (with ``jump_init_txt``
    even-layer skip for shallower students) and each
    ``cross_modal_image_layers.N`` -> BOTH ``local_encoder.layer_N`` and
    ``global_encoder.layer_N``, exactly the reference's remap prefixes
    (train_r2r_magic.py:190-254: bert.lang_encoder,
    bert.{local,global}_encoder.encoder.crossattention)."""
    sd = {k: np.asarray(v) for k, v in meter_state.items()}
    txt = {k.removeprefix("text_transformer."): v for k, v in sd.items()
           if k.startswith("text_transformer.")}
    out = roberta_to_lang_encoder(txt, num_l_layers, jump_init)
    for i in range(num_x_layers):
        src = f"cross_modal_image_layers.{i}"
        for enc in ("local_encoder", "global_encoder"):
            out.update(_cross_layer_map(sd, src, f"{enc}.layer_{i}"))
        # METER's text-side cross layers are text-queries-image — our
        # lang2visn attention (use_lang2visn_attn, model config:27)
        tsrc = f"cross_modal_text_layers.{i}"
        if f"{tsrc}.crossattention.self.query.weight" in sd:
            for enc in ("local_encoder", "global_encoder"):
                dst = f"{enc}.layer_{i}"
                for name in ("query", "key", "value"):
                    out[f"{dst}.lang2visn_attention.{name}.kernel"] = _t(
                        sd[f"{tsrc}.crossattention.self.{name}.weight"])
                    out[f"{dst}.lang2visn_attention.{name}.bias"] = sd[
                        f"{tsrc}.crossattention.self.{name}.bias"]
                out[f"{dst}.lang2visn_attention.out.kernel"] = _t(
                    sd[f"{tsrc}.crossattention.output.dense.weight"])
                out[f"{dst}.lang2visn_attention.out.bias"] = sd[
                    f"{tsrc}.crossattention.output.dense.bias"]
                out[f"{dst}.lang2visn_norm.LayerNorm_0.scale"] = sd[
                    f"{tsrc}.crossattention.output.LayerNorm.weight"]
                out[f"{dst}.lang2visn_norm.LayerNorm_0.bias"] = sd[
                    f"{tsrc}.crossattention.output.LayerNorm.bias"]
    return out


def merge_mapped_weights(params, mapped: dict):
    """Exact-path merge of {relative_name: array} into a param tree.  The
    tree root may be ``params.`` (navigator) or ``params.bert.`` (pretrain
    model, the reference's ``bert.`` trunk prefix); both are probed with
    EXACT names — no suffix matching, so same-suffix submodules can never
    mis-link.  Returns (new_params, loaded_names, skipped_names)."""
    flat = flatten_params(params)
    loaded, skipped = [], []
    for name, arr in mapped.items():
        for full in (f"params.{name}", f"params.bert.{name}"):
            if full in flat:
                if flat[full].shape == np.shape(arr):
                    flat[full] = np.asarray(arr, dtype=flat[full].dtype)
                    loaded.append(full)
                else:
                    skipped.append(full)
                break
        else:
            skipped.append(name)
    nested, _, _ = unflatten_params(flat)
    return nested, loaded, skipped


def load_roberta_weights(params, hf_state: dict, num_layers: int,
                         jump_init: bool = False):
    """Merge mapped RoBERTa weights into an existing param tree; returns
    (new_params, loaded_names)."""
    mapped = roberta_to_lang_encoder(hf_state, num_layers, jump_init)
    nested, loaded, _ = merge_mapped_weights(params, mapped)
    return nested, loaded


def load_meter_weights(params, meter_state: dict, num_l_layers: int,
                       num_x_layers: int, jump_init: bool = False):
    """Merge a METER checkpoint into a param tree: language stack + both
    cross-modal encoders' attention/FFN kernels (the reference's
    init_pretrained='meter' path, train_r2r_magic.py:183-254).  Returns
    (new_params, loaded_names, skipped_names)."""
    mapped = meter_to_params(meter_state, num_l_layers, num_x_layers,
                             jump_init)
    return merge_mapped_weights(params, mapped)
