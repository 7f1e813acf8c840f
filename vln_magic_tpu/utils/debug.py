"""Numerical sanitizers: NaN/Inf detection with module attribution and
cross-host parameter consistency checks.

Equivalent of the reference's NanDetector forward/backward hooks
(reference: map_nav_src/fairseq/nan_detector.py:12-91) and the fairseq
trainer's cross-rank grad-norm consistency check
(fairseq/trainer.py:999-1031).  In JAX the mechanism inverts: instead of
module hooks we check pytrees between jitted steps (cheap, on-device
reductions) and attribute NaNs to the first offending parameter/output by
name.
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np


def nonfinite_report(tree, prefix: str = "") -> list[str]:
    """Names of leaves containing NaN/Inf (empty list = clean)."""
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if not hasattr(leaf, "dtype") or not jnp.issubdtype(
                jnp.asarray(leaf).dtype, jnp.floating):
            continue
        if not bool(jnp.isfinite(leaf).all()):
            name = prefix + ".".join(
                str(getattr(p, "key", getattr(p, "name", p))) for p in path)
            bad.append(name)
    return bad


def assert_finite(tree, where: str = ""):
    bad = nonfinite_report(tree)
    if bad:
        raise FloatingPointError(
            f"non-finite values {('in ' + where) if where else ''}: "
            + ", ".join(bad[:10])
            + (f" (+{len(bad) - 10} more)" if len(bad) > 10 else ""))


def grad_health(grads) -> dict:
    """One fused pass: global norm, max abs, nonfinite count — the signals
    the reference's detector and grad-norm check surface."""
    leaves = [jnp.asarray(g) for g in jax.tree_util.tree_leaves(grads)
              if hasattr(g, "dtype")]
    sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves)
    mx = max((jnp.max(jnp.abs(g)) for g in leaves), default=jnp.zeros(()))
    nonfinite = sum(jnp.sum(~jnp.isfinite(g)) for g in leaves)
    return {"grad_norm": jnp.sqrt(sq), "grad_max": mx,
            "grad_nonfinite": nonfinite}


def param_fingerprint(params) -> str:
    """Deterministic digest of a parameter tree — compare across hosts/
    restores (the reference's desync sanitizer, expressed as a hash check
    after checkpoint load)."""
    h = hashlib.sha256()
    for path, leaf in sorted(
            jax.tree_util.tree_leaves_with_path(params),
            key=lambda kv: str(kv[0])):
        h.update(str(path).encode())
        h.update(np.ascontiguousarray(np.asarray(leaf, np.float32)).tobytes())
    return h.hexdigest()[:16]


def check_params_in_sync(params) -> bool:
    """All-process agreement on the param fingerprint (multi-host runs).
    Single-process: trivially True."""
    if jax.process_count() == 1:
        return True
    from jax.experimental import multihost_utils

    fp = np.frombuffer(
        bytes.fromhex(param_fingerprint(params)), dtype=np.uint8)
    gathered = multihost_utils.process_allgather(fp)
    return bool((gathered == gathered[0]).all())


class NanGuard:
    """Wrap a step function: re-raises with attribution when outputs go
    non-finite; optionally checks inputs too.  Zero cost when disabled."""

    def __init__(self, enabled: bool = True, check_inputs: bool = False):
        self.enabled = enabled
        self.check_inputs = check_inputs

    def __call__(self, fn):
        if not self.enabled:
            return fn

        def wrapped(*args, **kwargs):
            if self.check_inputs:
                assert_finite(args, "step inputs")
            out = fn(*args, **kwargs)
            assert_finite(out, "step outputs")
            return out

        return wrapped
