"""Headline-scene grouping floor: per-sphere-exact slab candidates.

exp_dense_floor.py measured the DENSE scene's geometric culling floor (4.3
spheres/segment exact vs 543 carried at morton gc=96 — the finding behind kd
grouping). This runs the same question at the HEADLINE scene: per-sphere
boxes are gc=1 groups through the same box/entered machinery, giving the
mean/straggler candidate-sphere counts a PERFECT grouping would reach. The
gap between that and kd/sah gc=16 is the remaining grouping-quality headroom
(if small, further split-rule work is dead — spend elsewhere).

    python scripts/exp_headline_floor.py     # CPU, ~5 min
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from exp_kd_grouping import boxes_over_order, entered_stats, replay_segments


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from bevyray_tpu import rtiow
    from bevyray_tpu.kernels.pallas.grouping import kd_order

    world = rtiow.final_scene(seed=42)
    O, D, scene = replay_segments(world, 960, 540, 2, 4)
    print(json.dumps({"probe": "headline_segments", "n_seg": int(O.shape[0])}),
          flush=True)
    sp = scene.spheres
    args = (sp.cx, sp.cy, sp.cz, sp.radius, np.asarray(sp.valid))
    ident = np.arange(np.shape(sp.cx)[0])
    # gc=1: every sphere its own box == per-sphere-exact slab candidates.
    gmn, gmx = boxes_over_order(*args, ident, 1)
    entered_stats(O, D, gmn, gmx, "headline_exact_gc1", 1)
    # The shipped orders at gc=16 for comparison (same segment set).
    for rule in ("median", "sah"):
        perm = kd_order(*args, 16, rule=rule)
        gmn, gmx = boxes_over_order(*args, perm, 16)
        entered_stats(O, D, gmn, gmx, f"headline_{rule}_gc16", 16)
    return 0


if __name__ == "__main__":
    sys.exit(main())
