"""Mechanize the HIGHEST-precision rule for one-hot selections.

docs/PERF.md (methodology cautions) records a TPU-only silent-wrongness
class: the default TPU matmul precision runs f32 einsums through bf16
passes, so a one-hot contraction that SELECTS values returns bf16-rounded
entries, not the exact table rows a gather fetches (measured round 3:
``bf16(2e6) != 2e6`` broke the UNOBS sentinel compare; vp geometry drift
shifted greedy trajectories).  CPU tests cannot catch this — CPU einsums
are true f32 — so the discipline must be structural: this test walks the
package AST and asserts

1. every ``einsum`` call either pins ``precision=`` (and that pin resolves
   to ``Precision.HIGHEST``), or appears in the explicit allowlist below of
   contractions whose operands are bf16-exact (0/1 masks, small ints) or
   genuine model compute (attention/pooling matmuls where bf16 passes are
   the intended precision);
2. the allowlisted (file, function, subscripts) -> count table matches
   exactly, so DELETING one ``precision=`` pin (the site would surface as a
   new unpinned einsum) or ADDING a new unpinned einsum fails the suite and
   forces a deliberate decision.

When this test fails on new code: if the contraction carries VALUES that
feed comparisons, geometry, or any exact-selection semantics, pin
``precision=jax.lax.Precision.HIGHEST``; if it is a mask/flag/small-int or
a bf16-compute matmul, extend UNPINNED_OK with a category comment and
TPU-check the semantic fraction (bench.py) before landing.
"""

import ast
import collections
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "vln_magic_tpu"

# (relative file, enclosing function, subscripts) -> expected count of
# einsum sites that may run at DEFAULT precision.  Categories:
#   [mask]    0/1 one-hot against 0/1 flags — exact in bf16
#   [int]     small-int values (<= 256: step ids, counts) — exact in bf16
#   [compute] model matmul where bf16 passes are the intended precision
#   [bnd]     bounded-magnitude values feeding bf16 model compute anyway
#             (feature rows, embeddings) — rounding equals the model's own
#             compute-dtype cast; TPU-validated vs goldens (round 3)
UNPINNED_OK = {
    # observed-subgraph APSP relax: distances enter model geometry via
    # pos-ft normalization; relax min-plus validated vs networkx on TPU
    ("agent/rollout.py", "relax_observed", "bn,bnm->bm"): 2,    # [bnd]
    # candidate view-feature selection feeding the bf16 panorama encoder
    ("agent/rollout.py", "assemble_pano", "bcv,bvd->bcd"): 1,   # [bnd]
    # node-embed scatter/gather of model activations (bf16 compute)
    ("agent/rollout.py", "update_node_embeds", "bcn,bn->bc"): 1,    # [mask]
    ("agent/rollout.py", "update_node_embeds", "bcn,bcd->bnd"): 1,  # [compute]
    ("agent/rollout.py", "assemble_gmap", "bgn,bnd->bgd"): 1,       # [compute]
    # gmap token rows: observed/visited flags + step ids (small ints)
    ("agent/rollout.py", "assemble_gmap_base", "bgn,bn->bg"): 3,    # [mask/int]
    ("agent/rollout.py", "assemble_gmap_base", "bgn,bnd->bgd"): 1,  # [bnd]
    ("agent/rollout.py", "assemble_gmap_base", "bn,bnm->bm"): 2,    # [bnd]
    ("agent/rollout.py", "assemble_gmap_base", "bgn,bnm->bgm"): 1,  # [bnd]
    ("agent/rollout.py", "assemble_gmap_base", "bgm,bhm->bgh"): 1,  # [bnd]
    # vp distance/step rows feeding pos fts (validated vs goldens)
    ("agent/rollout.py", "assemble_vp_base", "bn,bnm->bm"): 2,      # [bnd]
    # transition: next-hop walk rows (small int node ids <= gmap budget
    # would NOT be exact at Matterport scale in bf16 — these two carry
    # dist/next-hop rows only into masked min/argmin whose candidates are
    # re-validated by cand_mask; TPU-checked round 3)
    ("agent/rollout.py", "transition", "bn,bnm->bm"): 1,        # [bnd]
    ("agent/rollout.py", "transition", "bnm,bm->bn"): 1,        # [mask]
    ("agent/rollout.py", "walk", "bn,bn->b"): 1,                # [int]
    ("agent/rollout.py", "_observed_next", "bn,bnc->bc"): 1,    # [bnd]
    ("agent/rollout.py", "_observed_next", "bcn,bn->bc"): 2,    # [bnd]
    ("agent/rollout.py", "_record_backtrack", "bn,bnm->bm"): 1, # [bnd]
    # model compute: attention/pooling matmuls (bf16 is the point; the
    # second QK site carries preferred_element_type=f32 — an ACCUMULATOR
    # dtype choice, not a precision pin — for ModelConfig.attn_logits_f32)
    ("models/layers.py", "__call__", "bqhd,bkhd->bhqk"): 2,     # [compute]
    ("models/layers.py", "__call__", "bhqk,bkhd->bqhd"): 1,     # [compute]
    ("models/mega.py", "__call__", "xqd,xkd->xqk"): 1,          # [compute]
    ("models/mega.py", "__call__", "xqk,xkd->xqd"): 1,          # [compute]
    ("models/vlnbert.py", "__call__", "bp,bpd->bd"): 1,         # [compute]
    ("models/vlnbert.py", "navigation", "bgp,bp->bg"): 1,       # [compute]
    ("ops/attention.py", "fused_attention_reference",
     "bhqd,bhkd->bhqk"): 1,                                     # [compute]
    ("ops/attention.py", "fused_attention_reference",
     "bhqk,bhkd->bhqd"): 1,                                     # [compute]
    ("ops/attention.py", "packed_attention_reference",
     "bqhd,bkhd->bhqk"): 1,                                     # [compute]
    ("ops/attention.py", "packed_attention_reference",
     "bhqk,bkhd->bqhd"): 1,                                     # [compute]
    ("pretrain/model.py", "og", "bod,bd->bo"): 1,               # [compute]
}

# sites that MUST stay pinned (value-carrying selections: sentinel
# compares, geometry, stop scores) — counted so a deleted pin is caught
# even if an identical unpinned site exists elsewhere
PINNED_REQUIRED = {
    ("agent/rollout.py", "add", "bcn,bn->bc"): 1,
    ("agent/rollout.py", "assemble_gmap_base", "bn,bnd->bd"): 1,
    ("agent/rollout.py", "assemble_vp_base", "bn,bnd->bd"): 1,
    ("agent/rollout.py", "assemble_vp_base", "bn,bn->b"): 1,
    ("agent/rollout.py", "assemble_vp_base", "bcn,bn->bc"): 1,
    ("agent/rollout.py", "assemble_vp_base", "bcn,bnd->bcd"): 1,
}


def _collect(path: pathlib.Path):
    """(function, subscripts, pinned, precision_value_node) per einsum."""
    tree = ast.parse(path.read_text())
    out = []

    class V(ast.NodeVisitor):
        def __init__(self):
            self.stack = ["<module>"]

        def visit_FunctionDef(self, n):
            self.stack.append(n.name)
            self.generic_visit(n)
            self.stack.pop()

        visit_AsyncFunctionDef = visit_FunctionDef

        def visit_Call(self, n):
            f = n.func
            name = f.attr if isinstance(f, ast.Attribute) else \
                getattr(f, "id", None)
            if name == "einsum":
                subs = n.args[0].value if n.args and isinstance(
                    n.args[0], ast.Constant) else "?"
                prec = next((k.value for k in n.keywords
                             if k.arg == "precision"), None)
                out.append((self.stack[-1], subs, prec, n.lineno))
            self.generic_visit(n)

    V().visit(tree)
    return out


def _resolves_to_highest(node, src: str) -> bool:
    if isinstance(node, ast.Attribute):
        return node.attr == "HIGHEST"
    if isinstance(node, ast.Name):
        # a local alias like `hi = jax.lax.Precision.HIGHEST`
        return f"{node.id} = jax.lax.Precision.HIGHEST" in src
    return False


def test_every_einsum_is_pinned_or_allowlisted():
    unpinned = collections.Counter()
    pinned = collections.Counter()
    bad_pins = []
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        src = path.read_text()
        for fn, subs, prec, line in _collect(path):
            key = (rel, fn, subs)
            if prec is None:
                unpinned[key] += 1
            else:
                pinned[key] += 1
                if not _resolves_to_highest(prec, src):
                    bad_pins.append(f"{rel}:{line} {fn} '{subs}'")

    assert not bad_pins, (
        "einsum precision= pins that do not resolve to Precision.HIGHEST "
        f"(use HIGHEST or drop the kw + allowlist): {bad_pins}")

    extra = {k: v for k, v in unpinned.items()
             if v != UNPINNED_OK.get(k, 0)}
    missing = {k: v for k, v in UNPINNED_OK.items()
               if unpinned.get(k, 0) != v}
    assert not extra and not missing, (
        "unpinned einsum sites changed.  If a NEW site carries selected "
        "VALUES (sentinel compares, geometry, stop scores), pin "
        "precision=jax.lax.Precision.HIGHEST; if it is mask/flag/small-int "
        "or bf16 model compute, extend UNPINNED_OK with a category comment "
        "and TPU-check the semantic fraction first (docs/PERF.md "
        f"methodology).  unexpected={dict(extra)} "
        f"missing_or_moved={missing}")

    for key, n in PINNED_REQUIRED.items():
        assert pinned.get(key, 0) >= n, (
            f"required HIGHEST pin removed at {key} — this is the "
            "TPU-silent-wrongness class of docs/PERF.md (bf16-rounded "
            "selected values); restore precision=jax.lax.Precision.HIGHEST")
