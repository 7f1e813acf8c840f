"""Device-side (jnp) mirrors of :mod:`vln_magic_tpu.env.geometry`.

The reference computes these per step on the host with numpy inside the
rollout hot loop (reference: map_nav_src/r2r/env.py:213-247, agent.py:175-328);
here they run inside the jitted step so the TPU never waits on the host.
Formulas are identical to the numpy versions (which are golden-tested against
the reference conventions).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..env.geometry import ALL_VIEW_ANGLES, MAX_DIST, MAX_STEP

# numpy, not jnp: a module-level jnp array is a device-array closure constant
# in every program that uses it, and lowering syncs on fetching its value
# (see rollout.py BIG/UNOBS note); a numpy constant embeds without a sync.
ALL_VIEW_ANGLES_J = np.asarray(ALL_VIEW_ANGLES, dtype=np.float32)  # (36, 2)


def angle_feature(heading, elevation, angle_feat_size: int = 4):
    base = jnp.stack(
        [jnp.sin(heading), jnp.cos(heading), jnp.sin(elevation), jnp.cos(elevation)],
        axis=-1,
    )
    reps = angle_feat_size // 4
    if reps > 1:
        base = jnp.concatenate([base] * reps, axis=-1)
    return base


def rel_pos(a, b, base_heading=0.0, base_elevation=0.0):
    """(heading, elevation, dist) from a to b; broadcasts over leading dims.

    Matches env.geometry.rel_pos_features (the simulator's transposed-axis
    arcsin convention)."""
    d = b - a
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    xy = jnp.maximum(jnp.sqrt(dx**2 + dy**2), 1e-8)
    xyz = jnp.maximum(jnp.sqrt(dx**2 + dy**2 + dz**2), 1e-8)
    heading = jnp.arcsin(jnp.clip(dx / xy, -1.0, 1.0))
    heading = jnp.where(dy < 0, jnp.pi - heading, heading)
    elevation = jnp.arcsin(jnp.clip(dz / xyz, -1.0, 1.0))
    return heading - base_heading, elevation - base_elevation, xyz


def pos_features_7(cur_pos, node_pos, graph_dist, graph_steps, cur_heading,
                   cur_elevation, angle_feat_size: int = 4):
    """7-d gmap position features (angle 4 + [line/30, graph/30, steps/10]),
    matching env.geometry.gmap_pos_features / reference env.py:213-235."""
    h, e, dist = rel_pos(cur_pos, node_pos, cur_heading[..., None],
                         cur_elevation[..., None])
    ang = angle_feature(h, e, angle_feat_size)
    rel = jnp.stack(
        [dist / MAX_DIST, graph_dist / MAX_DIST, graph_steps / MAX_STEP], axis=-1)
    return jnp.concatenate([ang, rel], axis=-1)


def view_angles_relative(base_heading, base_elevation):
    """(B, 36, 2) view-center angles relative to the agent's current base
    view orientation (reference env.py:345: feature || angle_feature[viewId])."""
    rel = ALL_VIEW_ANGLES_J[None, :, :] - jnp.stack(
        [base_heading, base_elevation], axis=-1)[:, None, :]
    return rel
