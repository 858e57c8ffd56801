"""Host-side sphere-ordering strategies for the megakernel's culling groups.

The megakernel's group/candidate AABBs are unions over CONSECUTIVE runs of the
prepared sphere table (prepare_pallas_scene), so the table ORDER alone decides
culling quality. Round 1-3 shipped a morton sort; a CPU-exact geometry replay
(scripts/exp_dense_floor.py, exp_kd_grouping.py, 2026-08-17) showed morton-run
union boxes are far from the geometric floor — on the dense 5,000-sphere bench
a bounce segment slab-enters mean 5.65 of 54 group boxes (543 candidate
spheres) while its per-sphere-exact candidate set is only 4.3 spheres, and
entered counts barely improve with finer morton runs (the boxes overlap rays
almost independently of granularity).

``kd_order`` instead builds equal-size spatially-tight clusters: recursive
widest-axis median splits with split points aligned to the candidate-group
grid, so every gc-run of the final order is one compact cluster. Same table
sizes, same mask machinery, same kernel — a pure permutation. Replay stats
(same probes):

  scene            order    mean entered   straggler   candidate spheres
  dense gc=96      morton   5.65           23.4        542.8
  dense gc=96      kd       3.10           14.6        297.2
  headline gc=16   morton   2.67           10.8        42.8
  headline gc=16   kd       2.53            8.4        40.5

The quarantine rule matches _morton_key: oversized spheres (r > 0.25 x scene
extent — their AABB would poison any cluster's bound) lead the order, padding
trails it.
"""

from __future__ import annotations

from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

__all__ = ["kd_order", "cached_order"]

# Split-rule knob: "sah" picks, at every kd split, the (axis, grid-aligned
# cut) minimizing count-weighted surface area of the two halves' c±r boxes
# (prefix/suffix scans, O(n) per axis); "median" is the widest-center-axis
# grid-aligned median cut SAH generalizes. Either value is a pure permutation
# — images are bit-identical; only culling quality moves. HARDWARE A/B
# (GROUP_AB_r04.json, paired interleaved): median WINS at the headline —
# 390.3 vs 334.3 Mrays/s (sah −14%) at gc=16 — despite the replay pre-screen
# (scripts/exp_kd_sah.py) predicting sah −17% entered groups / −8% straggler.
# Second confirmed case (after the dense "pair-bound" misread) that replay
# entered-counts alone do NOT predict walk wall time; "median" stays default
# on measurement.
KD_RULE = "median"


def kd_order(cx, cy, cz, radius, valid, gc: int,
             rule: str | None = None) -> np.ndarray:
    """Permutation of the sphere table into equal-size spatially-tight
    clusters aligned to the ``gc``-sphere candidate-group grid.

    Host NumPy (data-dependent recursion does not trace); runs once per scene
    revision — the reference rebuilds its BVH every frame (extract.rs:316-321),
    so a per-revision host sort is strictly cheaper than its baseline.
    """
    rule = KD_RULE if rule is None else rule
    if rule not in ("median", "sah"):
        raise ValueError(f"kd_order rule {rule!r} must be 'median' or 'sah'")
    cx, cy, cz = (np.asarray(v, np.float32) for v in (cx, cy, cz))
    r = np.abs(np.asarray(radius, np.float32))
    live = np.asarray(valid, bool) & (r > 0)
    c = np.stack([cx, cy, cz], axis=1)
    ext = float((c[live].max(0) - c[live].min(0)).max()) if live.any() else 1.0
    big = live & (r > 0.25 * max(ext, 1e-6))
    out = list(np.flatnonzero(big))
    rest = np.flatnonzero(live & ~big)

    def sa(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                + d[..., 0] * d[..., 2])

    def split(idx, offset):
        # ``offset`` = global position of idx[0] in the final order; cuts are
        # aligned to the gc grid so every group is a whole cluster (the first
        # cluster is short when the quarantine block misaligns it).
        room = (-offset) % gc or gc      # slots left in the current group
        if len(idx) <= room:
            out.extend(idx)
            return
        n = len(idx)
        if rule == "sah":
            # Min over (axis, grid-aligned cut) of nl·SA(left) + nr·SA(right),
            # boxes over c±r so big-radius members count.
            cuts = np.arange(room, n, gc)
            best = None
            for ax in range(3):
                order_ax = idx[np.argsort(c[idx, ax], kind="stable")]
                lo = c[order_ax] - r[order_ax, None]
                hi = c[order_ax] + r[order_ax, None]
                pre_mn = np.minimum.accumulate(lo, 0)
                pre_mx = np.maximum.accumulate(hi, 0)
                suf_mn = np.minimum.accumulate(lo[::-1], 0)[::-1]
                suf_mx = np.maximum.accumulate(hi[::-1], 0)[::-1]
                cost = (cuts * sa(pre_mn[cuts - 1], pre_mx[cuts - 1])
                        + (n - cuts) * sa(suf_mn[cuts], suf_mx[cuts]))
                k = int(cost.argmin())
                if best is None or cost[k] < best[0]:
                    best = (float(cost[k]), order_ax, int(cuts[k]))
            _, order, cut = best
        else:
            ax = int(np.ptp(c[idx], axis=0).argmax())
            order = idx[np.argsort(c[idx, ax], kind="stable")]
            half = n // 2
            cut = (room + max(0, (half - room) // gc) * gc
                   if half >= room else room)
        split(order[:cut], offset)
        split(order[cut:], offset + cut)

    split(rest, len(out))
    out.extend(np.flatnonzero(~live))
    perm = np.asarray(out, np.int32)
    assert perm.shape[0] == c.shape[0]
    return perm


# Keyed LRU so per-frame callers (the sharded step front-end) don't re-sort;
# ``leaves`` rides in each entry to keep the id()-based key unique while
# cached (id() values are only unique among live objects).
_ORDER_CACHE: "OrderedDict" = OrderedDict()
_ORDER_CACHE_MAX = 8


def cached_order(scene, cand_size: int = 0):
    """The kd permutation for ``scene``'s sphere table as a device array,
    LRU-cached on the sphere buffer identities + group size."""
    import jax

    from .megakernel import _auto_cand_size

    sp = scene.spheres
    leaves = jax.tree.leaves(sp)
    key = (tuple(id(x) for x in leaves), int(cand_size), KD_RULE)
    hit = _ORDER_CACHE.get(key)
    if hit is not None:
        _ORDER_CACHE.move_to_end(key)
        return hit[0]
    gc = cand_size or _auto_cand_size(np.shape(sp.cx)[0])
    order = jnp.asarray(kd_order(sp.cx, sp.cy, sp.cz, sp.radius,
                                 np.asarray(sp.valid), gc))
    _ORDER_CACHE[key] = (order, leaves)
    while len(_ORDER_CACHE) > _ORDER_CACHE_MAX:
        _ORDER_CACHE.popitem(last=False)
    return order
