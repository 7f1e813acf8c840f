"""Checkpointing: orbax-native save/resume + reference ``.pt`` interop.

The reference persists navigator checkpoints as
``{'vln_bert': {'epoch': int, 'state_dict': {name: tensor}}}`` (reference:
map_nav_src/r2r/agent_base.py:298-359) and pretraining checkpoints as flat
``model_step_{N}.pt`` state dicts (pretrain_src/utils/save.py:29-74).  Interop
here works over that container format with dot-joined flax paths as names, a
``key_map`` hook for adapting external naming schemes, the reference's
tolerant ``module.`` prefix stripping (agent_base.py:336-339), and its
role-aware KD-head filtering (agent_base.py:326-332).

Native checkpoints use orbax with async-friendly single-file trees and
best/latest rotation mirroring ``best_{env}.pt`` / ``latest_dict.pt``
(main_nav.py:486-541).
"""

from __future__ import annotations

import os
import re
from typing import Callable, Optional

import jax
import numpy as np

KD_HEAD_NAMES = (
    # the 7 projection heads + 5 ability weights dropped when loading a
    # teacher for co-training (agent_base.py:326-332)
    "txt_emb_w", "vp_txt_w", "gmap_txt_w", "local_cross_w", "global_cross_w",
    "kdl_img_w", "kdl_avg_img_w", "kdl_txt_weight", "kdl_img_weight",
    "kdl_local_weight", "kdl_global_weight", "kdl_predict_weight",
)


def flatten_params(params) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = ".".join(str(getattr(p, "key", getattr(p, "name", p)))
                        for p in path)
        flat[name] = np.asarray(leaf)
    return flat


def unflatten_params(flat: dict, template=None):
    """Rebuild a nested dict from dot-joined names; if ``template`` is given,
    fill its structure (missing keys keep template values, extra keys are
    reported)."""
    if template is not None:
        tflat = flatten_params(template)
        missing = [k for k in tflat if k not in flat]
        unexpected = [k for k in flat if k not in tflat]
        merged = {k: flat.get(k, v) for k, v in tflat.items()}
        for k, v in merged.items():
            want = tuple(np.shape(tflat[k]))
            have = tuple(np.shape(v))
            if have != want:
                # reshape ONLY true singleton/0-d drift (shapes equal up to
                # size-1 dims).  Anything else — e.g. a torch [out,in] kernel
                # against a flax [in,out] template — must raise, never be
                # silently scrambled by a reshape.
                core = lambda s: tuple(d for d in s if d != 1)
                if (int(np.prod(have)) == int(np.prod(want))
                        and (int(np.prod(want)) == 1
                             or core(have) == core(want))):
                    merged[k] = np.reshape(v, want)
                else:
                    raise ValueError(
                        f"shape mismatch for {k}: ckpt {have} vs model {want}")
        nested = _nest(merged)
        return nested, missing, unexpected
    return _nest(flat), [], []


def _nest(flat: dict):
    out = {}
    for name, v in flat.items():
        node = out
        parts = name.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


# ----- reference .pt interop -----

def save_torch_checkpoint(params, path: str, epoch: int = 0,
                          optimizer_state=None):
    """Write the reference navigator container format."""
    import torch

    flat = flatten_params(params)
    state_dict = {k: torch.from_numpy(np.array(v, copy=True))
                  for k, v in flat.items()}
    states = {"vln_bert": {"epoch": epoch, "state_dict": state_dict}}
    if optimizer_state is not None:
        states["vln_bert"]["optimizer"] = optimizer_state
    torch.save(states, path)


def load_torch_checkpoint(path: str, template=None,
                          key_map: Optional[Callable[[str], str | None]] = None,
                          drop_kd_heads: bool = False):
    """Read a reference-format checkpoint into a flax param tree.

    ``key_map(name) -> new_name | None`` adapts external naming (None drops
    the entry).  ``drop_kd_heads`` reproduces the teacher-load filtering.
    Returns (params_nested, epoch, missing, unexpected).
    """
    import torch

    states = torch.load(path, map_location="cpu", weights_only=False)
    blob = states.get("vln_bert", states)
    state_dict = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    epoch = blob.get("epoch", 0) if isinstance(blob, dict) else 0

    flat = {}
    for name, tensor in state_dict.items():
        if name.startswith("module."):      # DDP prefix fix (agent_base.py:336)
            name = name[len("module."):]
        if key_map is not None:
            name = key_map(name)
            if name is None:
                continue
        if drop_kd_heads and any(h in name for h in KD_HEAD_NAMES):
            continue
        flat[name] = tensor.detach().numpy()
    nested, missing, unexpected = unflatten_params(flat, template)
    return nested, epoch, missing, unexpected


def pretrain_to_nav_key_map(name: str) -> str | None:
    """Adapt pretraining checkpoint names to the navigator tree: the shared
    trunk lives under ``bert.`` in the pretrain model (matching the
    reference's checkpoint remap prefix, train_r2r_magic.py:193-206); task
    heads are dropped.  Use as ``key_map`` for load_torch_checkpoint when
    loading a ``--bert_ckpt_file`` (parser.py:44)."""
    drop = ("mlm_head", "mrc_head", "cfp_txt_pool", "cfp_gmap_pool",
            "cfp_vp_pool", "cfp_fused_pool", "og_obj_proj", "og_loc_proj",
            "og_state_proj")
    if any(f".{d}." in name or name.startswith(f"params.{d}.") for d in drop):
        return None
    return name.replace("params.bert.", "params.")


# ----- orbax-native checkpoints -----

class CheckpointManager:
    """latest/best rotation over orbax (main_nav.py:486-541 semantics)."""

    def __init__(self, ckpt_dir: str):
        import orbax.checkpoint as ocp

        self.dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, name):
        return os.path.join(self.dir, name)

    def save(self, name: str, tree):
        import orbax.checkpoint as ocp

        path = self._path(name)
        self._ckptr.save(path, tree, force=True)
        return path

    def restore(self, name: str, template=None):
        path = self._path(name)
        if template is not None:
            return self._ckptr.restore(path, item=template)
        return self._ckptr.restore(path)

    def save_latest(self, tree):
        return self.save("latest", tree)

    def save_best(self, env_name: str, tree):
        return self.save(f"best_{env_name}", tree)

    def has(self, name: str) -> bool:
        return os.path.exists(self._path(name))
