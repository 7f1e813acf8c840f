"""Speaker driver: vocabulary, path-feature assembly, teacher-forced
training, and back-translation inference.

Counterpart of the reference's speaker stack (reference: map_nav_src/r2r/
transpeaker.py:14-358 Speaker driver; speaker_utils.py:106-258 legacy
tokenizer + vocab build): path features use the 128-d speaker angle features
(parser.py:117), training is teacher-forced CE over gt instructions, and
``infer_batch`` greedily decodes new instructions for augmented paths with
feature-dropout noise (drop_env, agent.py:737-752).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..env.geometry import get_angle_fts
from ..models.speaker import TransSpeaker, greedy_decode

SPEAKER_ANGLE_SIZE = 128


class SpeakerTokenizer:
    """Word-level vocabulary built from training instructions
    (speaker_utils.py:216-244 build/read vocab)."""

    PAD, BOS, EOS, UNK = 0, 1, 2, 3

    def __init__(self, vocab: list[str]):
        self.words = ["<PAD>", "<BOS>", "<EOS>", "<UNK>"] + vocab
        self.index = {w: i for i, w in enumerate(self.words)}

    @classmethod
    def build(cls, items, min_count: int = 1, max_size: int = 988):
        from collections import Counter

        c = Counter()
        for it in items:
            c.update(w.lower().strip(".,!?") for w in
                     it["instruction"].split())
        vocab = [w for w, n in c.most_common(max_size) if n >= min_count and w]
        return cls(vocab)

    @property
    def vocab_size(self):
        return len(self.words)

    def encode(self, text: str, max_len: int = 80):
        ids = [self.index.get(w.lower().strip(".,!?"), self.UNK)
               for w in text.split()][: max_len - 2]
        return [self.BOS] + ids + [self.EOS]

    def decode(self, ids) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i == self.EOS:
                break
            if i > self.UNK:
                out.append(self.words[i])
        return " ".join(out)

    def shrink(self, ids):
        """Strip BOS/EOS/PAD (speaker_utils Tokenizer.shrink semantics)."""
        out = []
        for i in ids:
            i = int(i)
            if i == self.EOS:
                break
            if i not in (self.PAD, self.BOS):
                out.append(i)
        return out


class Speaker:
    """Owns the TransSpeaker, its optimizer, and path-feature assembly."""

    def __init__(self, world, feat_dim: int, vocab_size: int,
                 max_steps: int = 10, max_len: int = 40, lr: float = 1e-4,
                 hidden: int = 512, layers: int = 3, heads: int = 4,
                 word_size: int = 256, rng=None, feat_dropout: float = 0.3):
        self.world = world
        self.t = world.tables
        self.S = max_steps
        self.L = max_len
        self.feat_dim = feat_dim
        self.feat_dropout = feat_dropout
        # ctor contract transpeaker.py:34-39: feature_size, hidden_size
        # (--hDim), word_size (--wemb), tgt_vocab_size.  --aemb,
        # --proj_hidden and --subout are parsed by the reference
        # (parser.py:107-113) but never reach its Transpeaker — they are
        # legacy LSTM-speaker knobs; we keep the same accept-and-ignore
        # behavior at the CLI.
        self.model = TransSpeaker(vocab_size=vocab_size, hidden_size=hidden,
                                  word_size=word_size, num_layers=layers,
                                  num_heads=heads)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        k, self.rng = jax.random.split(rng)
        dc = feat_dim + SPEAKER_ANGLE_SIZE
        self.params = self.model.init(
            k, jnp.zeros((1, self.S, dc)), jnp.zeros((1, self.S, 36, dc)),
            jnp.ones((1, self.S), bool), jnp.zeros((1, 4), jnp.int32))
        self.opt = optax.chain(optax.clip_by_global_norm(40.0),
                               optax.adamw(lr))
        self.opt_state = self.opt.init(self.params)
        self._train_step = None
        self._infer = None
        self._infer_sample = False

    # ----- checkpointing (transpeaker.py:322-344) -----

    def save(self, epoch: int, path: str):
        """Snapshot in the reference container format:
        ``{'transpeaker': {'epoch', 'state_dict', 'optimizer'}}``
        (transpeaker.py:322-337).  The optimizer state is stored as ordered
        leaves; its tree structure is rebuilt from the live opt on load."""
        import torch

        from ..utils.checkpoint import flatten_params

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        state_dict = {k: torch.from_numpy(np.array(v, copy=True))
                      for k, v in flatten_params(self.params).items()}
        opt_leaves = [np.asarray(x) for x in
                      jax.tree_util.tree_leaves(self.opt_state)]
        torch.save({"transpeaker": {"epoch": epoch + 1,
                                    "state_dict": state_dict,
                                    "optimizer": opt_leaves}}, path)

    def load(self, path: str, load_optim: bool = False) -> int:
        """Load parameters (and optionally optimizer state, the reference's
        ``loadOptim``, transpeaker.py:338-352).  Returns the stored epoch."""
        import torch

        from ..utils.checkpoint import unflatten_params

        states = torch.load(path, map_location="cpu", weights_only=False)
        blob = states["transpeaker"]
        flat = {k: v.detach().numpy() for k, v in blob["state_dict"].items()}
        nested, missing, unexpected = unflatten_params(flat, self.params)
        if missing or unexpected:
            raise ValueError(
                f"speaker checkpoint mismatch: missing={missing[:3]} "
                f"unexpected={unexpected[:3]}")
        self.params = jax.tree_util.tree_map(jnp.asarray, nested)
        if load_optim and blob.get("optimizer") is not None:
            treedef = jax.tree_util.tree_structure(self.opt_state)
            leaves = [jnp.asarray(x) for x in blob["optimizer"]]
            self.opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
        return int(blob.get("epoch", 0))

    # ----- feature assembly (from_shortest_path, transpeaker.py:159) -----

    def path_features(self, items, noise=None):
        t = self.t
        B = len(items)
        dc = self.feat_dim + SPEAKER_ANGLE_SIZE
        cand = np.zeros((B, self.S, dc), np.float32)
        pano = np.zeros((B, self.S, 36, dc), np.float32)
        masks = np.zeros((B, self.S), bool)
        for b, it in enumerate(items):
            si = it["scan_idx"]
            path = list(np.asarray(it["path_idx"]))[: self.S + 1]
            heading = 0.0
            for s, (cur, nxt) in enumerate(zip(path[:-1], path[1:])):
                cands = t.cand_ids[si, cur]
                j = int(np.argmax(cands == nxt))
                view = int(t.cand_view[si, cur, j])
                ch = float(t.cand_heading[si, cur, j])
                ce = float(t.cand_elevation[si, cur, j])
                feats36 = np.asarray(t.features[si, cur], np.float32)
                if noise is not None:
                    feats36 = feats36 * noise
                ang = get_angle_fts(np.array([ch - heading]), np.array([ce]),
                                    SPEAKER_ANGLE_SIZE)[0]
                cand[b, s] = np.concatenate([feats36[view], ang])
                base_h = (view % 12) * np.pi / 6
                from ..env.geometry import ALL_VIEW_ANGLES
                pano_ang = get_angle_fts(ALL_VIEW_ANGLES[:, 0] - base_h,
                                         ALL_VIEW_ANGLES[:, 1],
                                         SPEAKER_ANGLE_SIZE)
                pano[b, s] = np.concatenate([feats36, pano_ang], 1)
                masks[b, s] = True
                heading = base_h
        return cand, pano, masks

    def drop_env_noise(self, rng: np.random.Generator):
        """Feature-dropout mask for back-translation noise
        (drop_env, agent.py:738)."""
        keep = (rng.random(self.feat_dim) >= self.feat_dropout)
        return (keep / (1.0 - self.feat_dropout)).astype(np.float32)

    # ----- training (teacher-forced CE, transpeaker.py:207) -----

    def _make_train_step(self):
        def loss_fn(params, cand, pano, masks, tokens, tok_masks, rng):
            logits = self.model.apply(
                params, cand, pano, masks, tokens[:, :-1],
                deterministic=False, rngs={"dropout": rng})
            tgt = tokens[:, 1:]
            valid = tok_masks[:, 1:]
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
            return (ce * valid).sum() / jnp.maximum(valid.sum(), 1)

        def step(params, opt_state, cand, pano, masks, tokens, tok_masks, rng):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, cand, pano, masks, tokens, tok_masks, rng)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return jax.jit(step, donate_argnums=(0, 1))

    def encode_targets(self, items, tok: SpeakerTokenizer):
        B = len(items)
        tokens = np.full((B, self.L), tok.EOS, np.int32)
        masks = np.zeros((B, self.L), bool)
        for b, it in enumerate(items):
            ids = tok.encode(it["instruction"], self.L)
            tokens[b, : len(ids)] = ids
            masks[b, : len(ids)] = True
        return tokens, masks

    def train_step(self, items, tok: SpeakerTokenizer):
        if self._train_step is None:
            self._train_step = self._make_train_step()
        cand, pano, masks = self.path_features(items)
        tokens, tok_masks = self.encode_targets(items, tok)
        self.rng, k = jax.random.split(self.rng)
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, jnp.asarray(cand), jnp.asarray(pano),
            jnp.asarray(masks), jnp.asarray(tokens), jnp.asarray(tok_masks), k)
        return float(loss)

    # ----- inference / back-translation -----

    def infer_batch(self, items, tok: SpeakerTokenizer, noise=None,
                    sample=False, rng=None, temperature: float = 1.0):
        if self._infer is None or self._infer_sample != sample:
            self._infer = jax.jit(
                lambda p, c, pn, m, r, t: greedy_decode(
                    self.model, p, c, pn, m, self.L, tok.BOS, tok.EOS, r,
                    sample, t))
            self._infer_sample = sample
        cand, pano, masks = self.path_features(items, noise=noise)
        if rng is None:
            self.rng, rng = jax.random.split(self.rng)
        tokens = self._infer(self.params, jnp.asarray(cand), jnp.asarray(pano),
                             jnp.asarray(masks), rng,
                             jnp.float32(temperature))
        return np.asarray(tokens)

    @staticmethod
    def sample_temperature(iteration: int, total_iters: int,
                           start: float = 1.0, end: float = 0.5) -> float:
        """EnvDrop-style sampling-temperature decay for back-translation:
        exploratory (hot) generations early, near-greedy late.  Linear in
        training progress; the decode jit takes temperature as a traced
        scalar so the schedule never recompiles."""
        frac = min(max(iteration / max(total_iters, 1), 0.0), 1.0)
        return start + (end - start) * frac

    def evaluate(self, items, tok: SpeakerTokenizer):
        """Corpus BLEU-4 of greedy generations against gt instructions
        (the role of the reference's libbleu-backed scorer)."""
        from ..native import bleu_score

        tokens = self.infer_batch(items, tok)
        hyps = [tok.shrink(row[1:]) for row in tokens]
        refs = [tok.encode(it["instruction"], self.L)[1:-1] for it in items]
        return bleu_score(hyps, refs)

    def back_translate(self, items, tok: SpeakerTokenizer, rng=None,
                       beam: int = 0, sample: bool = False,
                       temperature: float = 1.0):
        """Replace instructions with speaker generations under feature
        dropout noise (the rollout's self-train path, agent.py:737-752).
        ``beam > 1`` uses beam search and keeps the best hypothesis;
        ``sample=True`` draws at ``temperature`` (see ``sample_temperature``
        for the EnvDrop-style decay schedule).
        Returns new item dicts with regenerated instruction text."""
        nprng = np.random.default_rng(0 if rng is None else rng)
        noise = self.drop_env_noise(nprng)
        if beam and beam > 1:
            from ..models.speaker import beam_decode

            cand, pano, masks = self.path_features(items, noise=noise)
            import jax.numpy as jnp

            toks, _ = beam_decode(self.model, self.params, jnp.asarray(cand),
                                  jnp.asarray(pano), jnp.asarray(masks),
                                  self.L, tok.BOS, tok.EOS, beam=beam)
            tokens = np.asarray(toks[:, 0])
        else:
            tokens = self.infer_batch(items, tok, noise=noise, sample=sample,
                                      temperature=temperature)
        out = []
        for it, row in zip(items, tokens):
            new = dict(it)
            new["instruction"] = tok.decode(row[1:])
            out.append(new)
        return out, noise
