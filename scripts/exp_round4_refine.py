"""Round-4 probe: overlap-aware refinement of the kd grouping (VERDICT item 3).

The kd/SAH orders are greedy top-down splits; the walk's true objective is the
expected number of group boxes a bounce segment slab-enters (and its 4096-lane
tile straggler).  For uniformly-distributed lines, E[entered] is proportional
to the total surface area of the group boxes (integral geometry: the measure
of lines meeting a convex body scales with its surface area), so the analytic
refinement target is

    minimize  sum_k SA(box of group k)   over equal-size gc partitions.

This probe post-optimizes the SAH order with pairwise SWAP local search
(equal-size preserving): for group pairs whose boxes overlap or nearly touch,
evaluate all gc x gc single-sphere swaps with leave-one-out boxes from
prefix/suffix min/max scans, apply the best improving swap per pair, sweep to
convergence.  Then replays both bench scenes' bounce segments (exact geometry,
exp_kd_grouping machinery) to see whether the SA drop moves mean/straggler
entered counts — the quantity the kernel actually pays.

    python scripts/exp_round4_refine.py     # CPU, ~10 min
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

from exp_kd_grouping import boxes_over_order, entered_stats, replay_segments


def _group_sa(mn, mx):
    d = np.maximum(mx - mn, 0.0)
    return d[0] * d[1] + d[1] * d[2] + d[0] * d[2]


def refine_swaps(c, r, perm, gc, n_live, max_sweeps=40, seed=0):
    """Swap local search minimizing total group-box SA.

    ``perm`` lists live spheres first (quarantine + clustered), padding last;
    only full gc groups among the first n_live entries are touched, and the
    quarantine block (leading groups, if any) participates like any other —
    a swap that shrinks total SA is accepted wherever it is found.
    Returns the refined permutation (a copy).
    """
    perm = np.asarray(perm).copy()
    n_groups = n_live // gc  # trailing partial group is left alone
    if n_groups < 2:
        return perm
    pts = c[perm[:n_groups * gc]].reshape(n_groups, gc, 3)
    rad = r[perm[:n_groups * gc]].reshape(n_groups, gc)
    lo = pts - rad[..., None]
    hi = pts + rad[..., None]

    def group_boxes():
        return lo.min(1), hi.max(1)

    for sweep in range(max_sweeps):
        gmn, gmx = group_boxes()
        sa = _group_sa(gmn.T, gmx.T)
        # Candidate pairs: boxes that overlap (separating-axis test) — swaps
        # between disjoint groups can't beat splitting them apart.
        overlap = ((gmn[:, None] <= gmx[None, :]).all(-1)
                   & (gmx[:, None] >= gmn[None, :]).all(-1))
        ii, jj = np.nonzero(np.triu(overlap, 1))
        if ii.size == 0:
            break
        improved = False
        # Leave-one-out boxes per group: prefix/suffix scans over members.
        inf = np.float32(np.inf)
        pre_mn = np.minimum.accumulate(lo, 1)
        pre_mx = np.maximum.accumulate(hi, 1)
        suf_mn = np.minimum.accumulate(lo[:, ::-1], 1)[:, ::-1]
        suf_mx = np.maximum.accumulate(hi[:, ::-1], 1)[:, ::-1]
        loo_mn = np.full_like(lo, inf)
        loo_mx = np.full_like(hi, -inf)
        loo_mn[:, 1:] = pre_mn[:, :-1]
        loo_mx[:, 1:] = pre_mx[:, :-1]
        loo_mn[:, :-1] = np.minimum(loo_mn[:, :-1], suf_mn[:, 1:])
        loo_mx[:, :-1] = np.maximum(loo_mx[:, :-1], suf_mx[:, 1:])

        touched = np.zeros(n_groups, bool)
        for a, b in zip(ii, jj):
            if touched[a] or touched[b]:
                continue
            # (gc_a, gc_b) swap grid: member i of a <-> member j of b.
            na_mn = np.minimum(loo_mn[a][:, None], lo[b][None, :])
            na_mx = np.maximum(loo_mx[a][:, None], hi[b][None, :])
            nb_mn = np.minimum(loo_mn[b][None, :], lo[a][:, None])
            nb_mx = np.maximum(loo_mx[b][None, :], hi[a][:, None])
            cost = (_group_sa(na_mn.transpose(2, 0, 1), na_mx.transpose(2, 0, 1))
                    + _group_sa(nb_mn.transpose(2, 0, 1),
                                nb_mx.transpose(2, 0, 1)))
            k = int(cost.argmin())
            i, j = divmod(k, gc)
            if cost[i, j] < (sa[a] + sa[b]) - 1e-7:
                ga, gb = a * gc + i, b * gc + j
                pi, pj = perm[ga], perm[gb]
                perm[ga], perm[gb] = pj, pi
                pts[a, i], rad[a, i] = c[pj], r[pj]
                pts[b, j], rad[b, j] = c[pi], r[pi]
                lo[a, i] = pts[a, i] - rad[a, i]
                hi[a, i] = pts[a, i] + rad[a, i]
                lo[b, j] = pts[b, j] - rad[b, j]
                hi[b, j] = pts[b, j] + rad[b, j]
                touched[a] = touched[b] = True
                improved = True
        if not improved:
            break
    return perm, sweep + 1


def run_scene(tag, world, W, H, SPP, BOUNCES, gcs):
    from bevyray_tpu.kernels.pallas.grouping import kd_order

    O, D, scene = replay_segments(world, W, H, SPP, BOUNCES)
    print(json.dumps({"probe": f"{tag}_segments", "n_seg": int(O.shape[0])}),
          flush=True)
    sp = scene.spheres
    args = (sp.cx, sp.cy, sp.cz, sp.radius, np.asarray(sp.valid))
    c = np.stack([np.asarray(sp.cx), np.asarray(sp.cy), np.asarray(sp.cz)],
                 1).astype(np.float32)
    r = np.abs(np.asarray(sp.radius)).astype(np.float32)
    live = np.asarray(sp.valid) & (r > 0)
    n_live = int(live.sum())
    for gc in gcs:
        for rule in ("median", "sah"):
            perm = kd_order(*args, gc, rule=rule)
            gmn, gmx = boxes_over_order(*args, perm, gc)
            sa0 = float(_group_sa(gmn, gmx)[np.isfinite(
                _group_sa(gmn, gmx))].sum())
            entered_stats(O, D, gmn, gmx, f"{tag}_{rule}_gc{gc}", gc)
            t0 = time.perf_counter()
            ref, sweeps = refine_swaps(c, r, perm, gc, n_live)
            dt = time.perf_counter() - t0
            gmn, gmx = boxes_over_order(*args, ref, gc)
            sa1 = float(_group_sa(gmn, gmx)[np.isfinite(
                _group_sa(gmn, gmx))].sum())
            print(json.dumps({"probe": f"{tag}_{rule}+refine_gc{gc}_sa",
                              "sa_before": round(sa0, 1),
                              "sa_after": round(sa1, 1),
                              "sweeps": sweeps,
                              "host_ms": round(dt * 1e3, 1)}), flush=True)
            entered_stats(O, D, gmn, gmx, f"{tag}_{rule}+refine_gc{gc}", gc)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from exp_large_scene import make_world
    from bevyray_tpu import rtiow

    run_scene("headline", rtiow.final_scene(seed=42), 960, 540, 2, 4,
              gcs=(16, 8))
    run_scene("dense", make_world(), 320, 192, 2, 4, gcs=(96, 48, 32))
    return 0


if __name__ == "__main__":
    sys.exit(main())
