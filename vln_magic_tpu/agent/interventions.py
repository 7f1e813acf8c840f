"""Causal-intervention tooling: backdoor z-dictionaries and frontdoor CFP
dictionaries (the GOAT lineage carried by MAGIC).

Covers the reference's ``update_z_dict`` (reference: map_nav_src/r2r/
agent.py:1162-1351 — batch all train instructions, pick landmark/direction
token embeddings, mean-pool per word, compute p(z) priors, rewrite the
dictionary, optional base64-TSV persist), ``extract_cfp_features``
(agent.py:1516-1561 — pooled txt/vp/gmap trajectory features dumped to TSV)
and ``KMeansPicker`` (map_nav_src/utils/data.py:436-512 — KMeans per feature
family, one exemplar per cluster as the frontdoor dictionary).

Word picking is list-driven (the reference's spaCy POS pass reduces to its
action list + category map, utils/data.py:203-320); spaCy is not required.
"""

from __future__ import annotations

import base64
import csv
import sys

import jax
import jax.numpy as jnp
import numpy as np

# the reference's direction/action vocabulary (utils/data.py:207-213 lists
# the same closed class of motion words)
DEFAULT_DIRECTION_WORDS = frozenset(
    "right left down up forward around straight into front behind exit enter "
    "besides through stop out wait passed climb leave past before after "
    "between along back".split())


class WordPicker:
    """Find landmark / direction token positions in instructions."""

    def __init__(self, direction_words=DEFAULT_DIRECTION_WORDS,
                 landmark_words=None, cat_file: str | None = None):
        self.direction_words = set(direction_words)
        self.landmark_words = set(landmark_words or [])
        if cat_file:
            with open(cat_file) as f:
                rows = csv.DictReader(f, delimiter="\t")
                for r in rows:
                    name = (r.get("category") or r.get("mpcat40") or "").strip()
                    if name:
                        self.landmark_words.add(name.lower())

    def pick(self, words: list[str]):
        """(landmark_positions, direction_positions) over a word list."""
        lm, dr = [], []
        for i, w in enumerate(words):
            lw = w.lower().strip(".,!?")
            if lw in self.direction_words:
                dr.append(i)
            elif lw in self.landmark_words or (not self.landmark_words
                                               and lw.isalpha() and len(lw) > 3):
                lm.append(i)
        return lm, dr


class Zdict:
    """A backdoor dictionary: features [N, D] + priors p(z) [N, 1]."""

    def __init__(self, features: np.ndarray, pzs: np.ndarray,
                 keys: list[str] | None = None):
        self.features = np.asarray(features, np.float32)
        self.pzs = np.asarray(pzs, np.float32).reshape(-1, 1)
        self.keys = keys or [str(i) for i in range(len(self.features))]

    def as_batch(self, batch_size: int):
        f = jnp.broadcast_to(jnp.asarray(self.features),
                             (batch_size,) + self.features.shape)
        p = jnp.broadcast_to(jnp.asarray(self.pzs),
                             (batch_size,) + self.pzs.shape)
        return f, p

    # --- base64 TSV persistence (reference LoadZdict, data_utils.py:45-103;
    #     writer agent.py:1306-1351) ---

    def save_tsv(self, path: str):
        with open(path, "w", newline="") as f:
            w = csv.writer(f, delimiter="\t")
            for key, feat, pz in zip(self.keys, self.features, self.pzs):
                w.writerow([key, float(pz[0]), base64.b64encode(
                    np.ascontiguousarray(feat, np.float32).tobytes()
                ).decode("ascii")])

    @classmethod
    def load_tsv(cls, path: str, dim: int):
        csv.field_size_limit(sys.maxsize)
        keys, feats, pzs = [], [], []
        with open(path) as f:
            for row in csv.reader(f, delimiter="\t"):
                keys.append(row[0])
                pzs.append(float(row[1]))
                feats.append(np.frombuffer(base64.b64decode(row[2]),
                                           dtype=np.float32)[:dim])
        return cls(np.stack(feats), np.asarray(pzs), keys)


def update_backdoor_dict(navigator, items, picker: WordPicker,
                         batch_size: int = 64, max_entries: int = 81,
                         lang_fn=None):
    """Rebuild the instruction z-dict from the current model — the
    reference's ``update_z_dict`` (agent.py:1162-1304).

    Runs the language encoder over all training instructions, mean-pools
    token embeddings per landmark/direction word, and derives p(z) from
    occurrence counts.  Returns {'direction': Zdict, 'landmark': Zdict}.

    ``lang_fn(params, ids, mask)``: pass a pre-jitted language forward to
    reuse its compile cache across periodic refreshes (a fresh ``jax.jit``
    per refresh recompiles each time — 20-40 s on TPU).
    """
    from .navigator import pad_instructions

    sums = {"landmark": {}, "direction": {}}
    counts = {"landmark": {}, "direction": {}}

    lang = lang_fn or jax.jit(lambda p, ids, mask: navigator.model.apply(
        p, ids, mask, method=type(navigator.model).language))

    for i in range(0, len(items), batch_size):
        chunk = items[i : i + batch_size]
        txt_ids, txt_masks = pad_instructions(
            chunk, navigator.cfg.env.max_instr_len)
        embeds, _ = lang(navigator.params, jnp.asarray(txt_ids),
                         jnp.asarray(txt_masks))
        embeds = np.asarray(embeds)
        for b, it in enumerate(chunk):
            words = it["instruction"].split()
            lm, dr = picker.pick(words)
            # +1 for the BOS token offset in the encoding
            for kind, positions in (("landmark", lm), ("direction", dr)):
                for pos in positions:
                    tpos = pos + 1
                    if tpos >= txt_masks.shape[1] or not txt_masks[b, tpos]:
                        continue
                    w = words[pos].lower().strip(".,!?")
                    sums[kind][w] = sums[kind].get(w, 0.0) + embeds[b, tpos]
                    counts[kind][w] = counts[kind].get(w, 0) + 1

    out = {}
    for kind in ("landmark", "direction"):
        ws = sorted(counts[kind], key=counts[kind].get, reverse=True)
        ws = ws[:max_entries]
        if not ws:
            d = navigator.cfg.model.hidden_size
            out[kind] = Zdict(np.zeros((1, d), np.float32), np.ones((1, 1)))
            continue
        total = sum(counts[kind][w] for w in ws)
        feats = np.stack([sums[kind][w] / counts[kind][w] for w in ws])
        pzs = np.array([counts[kind][w] / total for w in ws])
        out[kind] = Zdict(feats, pzs, ws)
    return out


def save_backdoor_tsv(path: str, dicts: dict):
    """Persist {'direction': Zdict, 'landmark': Zdict} to one TSV with
    kind-prefixed keys ("direction:left") in the reference row layout
    (key, p(z), base64 float32 features — agent.py:1306-1351)."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        for kind, z in dicts.items():
            for key, feat, pz in zip(z.keys, z.features, z.pzs):
                w.writerow([f"{kind}:{key}", float(pz[0]), base64.b64encode(
                    np.ascontiguousarray(feat, np.float32).tobytes()
                ).decode("ascii")])


def load_backdoor_tsv(path: str, dim: int):
    """Load a backdoor z-dict TSV (``--*_backdoor_dict_file``).  Accepts the
    kind-prefixed layout written by :func:`save_backdoor_tsv`; rows without
    a kind prefix (reference-written instr dicts) are classified by the
    direction-word list, everything else landing in 'landmark'."""
    csv.field_size_limit(sys.maxsize)
    rows = {"direction": ([], [], []), "landmark": ([], [], [])}
    with open(path) as f:
        for row in csv.reader(f, delimiter="\t"):
            key, pz, blob = row[0], float(row[1]), row[2]
            if ":" in key and key.split(":", 1)[0] in rows:
                kind, key = key.split(":", 1)
            else:
                kind = ("direction" if key.lower() in DEFAULT_DIRECTION_WORDS
                        else "landmark")
            ks, ps, fs = rows[kind]
            ks.append(key)
            ps.append(pz)
            fs.append(np.frombuffer(base64.b64decode(blob),
                                    np.float32)[:dim])
    out = {}
    for kind, (ks, ps, fs) in rows.items():
        if not fs:
            out[kind] = Zdict(np.zeros((1, dim), np.float32),
                              np.ones((1, 1)))
            continue
        out[kind] = Zdict(np.stack(fs), np.asarray(ps), ks)
    return out


def build_rollout_zdicts(backdoor=None, front=None, pad_entries: int = 0):
    """Package one role's backdoor Zdicts + frontdoor family features into
    the structure ``Rollout.run(zdicts={role: ...})`` consumes (the
    reference's get_front_variable / _language_variable z plumbing,
    agent.py:43-90,767-791).

    ``pad_entries`` pads the backdoor feature tables to a fixed row count so
    periodic refreshes never change array shapes (a shape change would
    retrace the jitted train step).  Padded rows carry p(z)=0, which the
    model's log-prior attention bias suppresses (models/vlnbert.py
    ZdictAttention)."""
    out = {}
    if backdoor:
        def padded(z: Zdict):
            f, p = z.features, z.pzs
            if pad_entries and len(f) < pad_entries:
                extra = pad_entries - len(f)
                f = np.concatenate(
                    [f, np.zeros((extra, f.shape[1]), np.float32)])
                p = np.concatenate([p, np.zeros((extra, 1), np.float32)])
            return f[:pad_entries or None], p[:pad_entries or None]

        dzf, dzp = padded(backdoor["direction"])
        lzf, lzp = padded(backdoor["landmark"])
        out["instr_zdict"] = {
            "direction_features": dzf, "direction_pzs": dzp,
            "landmark_features": lzf, "landmark_pzs": lzp,
        }
    if front:
        out["front_txt_feats"] = front["txt"]
        out["front_vp_feats"] = front["vp"]
        out["front_gmap_feats"] = front["gmap"]
    return out


def extract_cfp_features(navigator, items, builder, batch_size: int = 32):
    """Pooled txt/vp/gmap features per trajectory via the navigator's
    extract_cfp mode (agent.py:1516-1561).  Returns {family: [N, D]} plus
    instr ids."""
    model = navigator.model

    def fwd(params, batch):
        txt_embeds, _ = model.apply(params, batch["txt_ids"],
                                    batch["txt_masks"],
                                    method=type(model).language)
        pano_flat = {k: batch[k].reshape((-1,) + batch[k].shape[2:])
                     for k in ("traj_view_fts", "traj_loc_fts",
                               "traj_nav_types", "traj_pano_masks")}
        pano_embeds, pano_fused, _ = model.apply(
            params, pano_flat["traj_view_fts"], pano_flat["traj_loc_fts"],
            pano_flat["traj_nav_types"], pano_flat["traj_pano_masks"],
            method=type(model).panorama)
        b, s = batch["traj_view_fts"].shape[:2]
        pano_embeds = pano_embeds.reshape((b, s) + pano_embeds.shape[1:])
        pano_fused = pano_fused.reshape((b, s, -1))
        step = jnp.maximum(batch["gmap_src_step"], 0)
        slot = batch["gmap_src_slot"]
        bi = jnp.arange(b)[:, None]
        gmap_img = jnp.where((slot >= 0)[..., None],
                             pano_embeds[bi, step, jnp.maximum(slot, 0)],
                             pano_fused[bi, step])
        gmap_img = gmap_img * (batch["gmap_src_step"] >= 0)[..., None]
        final = batch["final_step"]
        last_pano = pano_embeds[jnp.arange(b), final]
        d = last_pano.shape[-1]
        vp_img = jnp.concatenate([jnp.zeros((b, 2, d)), last_pano], 1)
        outs = model.apply(
            params, txt_embeds, batch["txt_masks"], gmap_img,
            batch["gmap_step_ids"], batch["gmap_pos_fts"], batch["gmap_masks"],
            batch["gmap_visited_masks"], batch["gmap_pair_dists"], vp_img,
            batch["vp_pos_fts"], batch["vp_masks"], batch["vp_nav_masks"],
            batch["gmap_local_slot"], batch["vp_cand_visited"],
            method=type(model).navigation)
        return model.apply(params, txt_embeds, outs["gmap_embeds"],
                           outs["vp_embeds"], method=type(model).extract_cfp)

    jfwd = jax.jit(fwd)
    fams = {"txt": [], "gmap": [], "vp": []}
    ids = []
    for i in range(0, len(items), batch_size):
        chunk = items[i : i + batch_size]
        batch = builder.cfp_batch(chunk)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        out = jfwd(navigator.params, jb)
        for k in fams:
            fams[k].append(np.asarray(out[k]))
        ids.extend(it["instr_id"] for it in chunk)
    return {k: np.concatenate(v) for k, v in fams.items()}, ids


def save_cfp_tsv(path: str, features: dict, ids):
    """reference cfp_features_{iter}.tsv layout (agent.py:1549-1561)."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        for i, instr_id in enumerate(ids):
            row = [instr_id]
            for k in ("txt", "gmap", "vp"):
                row.append(base64.b64encode(np.ascontiguousarray(
                    features[k][i], np.float32).tobytes()).decode("ascii"))
            w.writerow(row)


def load_cfp_tsv(path: str, dim: int):
    csv.field_size_limit(sys.maxsize)
    ids, fams = [], {"txt": [], "gmap": [], "vp": []}
    with open(path) as f:
        for row in csv.reader(f, delimiter="\t"):
            ids.append(row[0])
            for j, k in enumerate(("txt", "gmap", "vp")):
                fams[k].append(np.frombuffer(base64.b64decode(row[1 + j]),
                                             np.float32)[:dim])
    return {k: np.stack(v) for k, v in fams.items()}, ids


class KMeansPicker:
    """Frontdoor dictionary builder (utils/data.py:436-512): KMeans per
    family, one random exemplar per cluster on each pick."""

    def __init__(self, features: dict, n_clusters: int = 24, seed: int = 0):
        from sklearn.cluster import KMeans

        self.features = features
        self.n_clusters = n_clusters
        self.models = {}
        self.assignments = {}
        for k, x in features.items():
            n = min(n_clusters, len(x))
            km = KMeans(n_clusters=n, n_init=4, random_state=seed).fit(x)
            self.models[k] = km
            self.assignments[k] = km.labels_

    def random_pick_front_features(self, rng: np.random.Generator):
        """{family: [n_clusters, D]} — one sampled exemplar per cluster."""
        out = {}
        for k, x in self.features.items():
            labels = self.assignments[k]
            rows = []
            for c in range(self.models[k].n_clusters):
                idx = np.flatnonzero(labels == c)
                rows.append(x[rng.choice(idx)] if len(idx)
                            else np.zeros(x.shape[1], np.float32))
            out[k] = np.stack(rows)
        return out
