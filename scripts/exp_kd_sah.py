"""KD split-rule probe: can smarter cuts beat the shipped widest-axis median?

The shipped kd_order (kernels/pallas/grouping.py) splits on the widest
CENTER-extent axis at the grid-aligned median. Two refinements, pre-screened
here with the same CPU-exact geometry replay as exp_kd_grouping.py before any
TPU time is spent:

  kd_r    — radius-aware axis choice: pick the axis with the widest
            (c+r)max-(c-r)min extent (a big-radius sphere stretches a
            cluster's box even when centers are tight).
  kd_sah  — full SAH-style cut: at every split try all 3 axes x every
            grid-aligned cut, minimizing nl*SA(left box) + nr*SA(right box)
            with boxes over c+-r (prefix/suffix scans make this O(n) per
            axis). The shipped rule is the special case "widest axis, cut
            nearest the median".

Replay metrics (mean entered groups / straggler over 4096-lane draws) on both
benchmark scenes. If neither beats shipped kd materially, record the negative
in CLAUDE.md; if kd_sah wins, wire it behind pallas_grouping and A/B on TPU.

    python scripts/exp_kd_sah.py     # CPU, ~5-10 min
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from exp_kd_grouping import boxes_over_order, entered_stats, replay_segments


def _quarantine(cx, cy, cz, radius, valid):
    live = np.asarray(valid) & (np.asarray(radius) != 0)
    c = np.stack([np.asarray(cx), np.asarray(cy), np.asarray(cz)], 1)
    r = np.abs(np.asarray(radius))
    ext = (c[live].max(0) - c[live].min(0)).max() if live.any() else 1.0
    big = live & (r > 0.25 * ext)
    return c, r, live, big


def kd_r_order(cx, cy, cz, radius, valid, gc):
    """Shipped kd with radius-aware axis choice (extent over c+-r)."""
    c, r, live, big = _quarantine(cx, cy, cz, radius, valid)
    out = list(np.flatnonzero(big))
    rest = np.flatnonzero(live & ~big)

    def split(idx, offset):
        room = (-offset) % gc or gc
        if len(idx) <= room:
            out.extend(idx)
            return
        ext = (c[idx] + r[idx, None]).max(0) - (c[idx] - r[idx, None]).min(0)
        ax = int(ext.argmax())
        order = idx[np.argsort(c[idx, ax], kind="stable")]
        half = len(idx) // 2
        cut = room + max(0, (half - room) // gc) * gc if half >= room else room
        split(order[:cut], offset)
        split(order[cut:], offset + cut)

    split(rest, len(out))
    out.extend(np.flatnonzero(~live))
    return np.asarray(out)


def kd_sah_order(cx, cy, cz, radius, valid, gc):
    """SAH cut: min over (axis, grid-aligned cut) of nl*SA_l + nr*SA_r."""
    c, r, live, big = _quarantine(cx, cy, cz, radius, valid)
    out = list(np.flatnonzero(big))
    rest = np.flatnonzero(live & ~big)

    def sa(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + \
            d[..., 0] * d[..., 2]

    def split(idx, offset):
        room = (-offset) % gc or gc
        if len(idx) <= room:
            out.extend(idx)
            return
        n = len(idx)
        # Valid grid-aligned cuts: room, room+gc, ..., < n.
        cuts = np.arange(room, n, gc)
        best = None
        for ax in range(3):
            order = idx[np.argsort(c[idx, ax], kind="stable")]
            lo = c[order] - r[order, None]
            hi = c[order] + r[order, None]
            pre_mn = np.minimum.accumulate(lo, 0)
            pre_mx = np.maximum.accumulate(hi, 0)
            suf_mn = np.minimum.accumulate(lo[::-1], 0)[::-1]
            suf_mx = np.maximum.accumulate(hi[::-1], 0)[::-1]
            cost = (cuts * sa(pre_mn[cuts - 1], pre_mx[cuts - 1])
                    + (n - cuts) * sa(suf_mn[cuts], suf_mx[cuts]))
            k = int(cost.argmin())
            if best is None or cost[k] < best[0]:
                best = (float(cost[k]), order, int(cuts[k]))
        _, order, cut = best
        split(order[:cut], offset)
        split(order[cut:], offset + cut)

    split(rest, len(out))
    out.extend(np.flatnonzero(~live))
    return np.asarray(out)


def run_scene(tag, world, W, H, SPP, BOUNCES, gcs):
    from bevyray_tpu.kernels.pallas.grouping import kd_order

    O, D, scene = replay_segments(world, W, H, SPP, BOUNCES)
    print(json.dumps({"probe": f"{tag}_segments", "n_seg": int(O.shape[0])}),
          flush=True)
    sp = scene.spheres
    args = (sp.cx, sp.cy, sp.cz, sp.radius, np.asarray(sp.valid))
    for gc in gcs:
        for name, fn in (("kd", kd_order), ("kd_r", kd_r_order),
                         ("sah", kd_sah_order)):
            perm = fn(*args, gc)
            gmn, gmx = boxes_over_order(*args, perm, gc)
            entered_stats(O, D, gmn, gmx, f"{tag}_{name}_gc{gc}", gc)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from exp_large_scene import make_world
    from bevyray_tpu import rtiow

    run_scene("dense", make_world(), 320, 192, 2, 4, gcs=(96, 48))
    run_scene("headline", rtiow.final_scene(seed=42), 960, 540, 2, 4,
              gcs=(16,))
    return 0


if __name__ == "__main__":
    sys.exit(main())
