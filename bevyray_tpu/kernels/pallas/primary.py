"""Host-side per-block primary-ray sphere shortlists for the megakernel.

The megakernel's phase-split mode traces every sample's bounce-0 segment in a
fully coherent pass (see ``megakernel._render_kernel``). Because a 64×64 pixel
block's primary rays share ~3° of field of view, the set of spheres any of them
can hit is tiny (measured on the RTiOW final scene: mean ~3-7 of 512, max 23
per block, aspect-dependent), so the bounce-0 intersection can walk a
per-block shortlist instead of the whole table. This module builds those
shortlists on the host — it needs concrete camera values, so it runs OUTSIDE
jit, once per (scene, camera, config), in NumPy, block-vectorized (~13 ms for
510 blocks × 512 spheres at 1080p; the per-block-loop version was 97 ms —
BENCH_EDIT_r03).

Conservativeness contract (what makes the fast path exact): a sphere is culled
from a block's shortlist only if NO primary ray of that block can hit it.
Primary rays differ from the block's pinhole frustum by (a) sub-pixel jitter —
covered by widening the frustum to the block's pixel BOUNDS plus the jitter
half-width in NDC (raygen adds (ju-0.5)/w_px of NDC, reference
raytrace.wgsl:139-156) — and (b) the thin-lens aperture offset (extension,
default off) — covered by inflating every sphere's radius with a distance-aware
defocus margin (a defocus ray at forward parameter t = z/focus_distance strays
at most (aperture/2)·max(1, t-1) from SOME pinhole ray through the same focal
point).

Shortlists are front-to-back sorted by a per-sphere lower bound on the hit
distance, t_lo = max(0, |c - cam| - r - lens_radius), and chunked by SL_CHUNK;
each chunk's t_lo lets the kernel stop walking as soon as no live ray's current
best hit can be beaten (the chunk t_lo sequence is non-decreasing).
"""

from __future__ import annotations

import numpy as np

SL_CHUNK = 8      # spheres per early-out chunk (kernel unrolls this)
# Capacity cap; blocks needing more fall back to the full walk. 512 (round 4,
# was 256): the dense 5,000-sphere bench has 8/60 blocks at 329-387 members —
# at 256 those blocks full-walked AND their overflow disabled the
# shortlist-local attribute tables for the whole frame (slattr requires zero
# overflow). Capacity is still the per-compile max BLOCK count rounded to
# SL_CHUNK, so small scenes (headline max 23) are unaffected.
SL_MAX = 512
N_SL_ROWS = 5     # cx, cy, cz, r², global sphere index (exact in f32 ≤ 2^24)


def shortlist_capacity(counts: np.ndarray) -> int:
    """Static per-compile capacity: max block count rounded up to the next
    power of two (≥ SL_CHUNK, ≤ SL_MAX).

    Power-of-two quantization (round 5) exists for the MOVING-CAMERA path:
    ``sl``/``slmeta``/``slattr`` shapes are jit-static, so every distinct
    capacity is a full megakernel recompile (minutes on the TPU tunnel).
    SL_CHUNK-granular rounding gave an orbiting camera a recompile nearly
    every frame as the max block count wandered; pow2 buckets make the whole
    orbit share one or two compiled shapes. Padding is inert (r² = -1e30
    rows, +inf chunk t_lo — the kernel's early-out never enters them)."""
    need = int(counts.max()) if counts.size else 0
    cap = SL_CHUNK
    while cap < min(need, SL_MAX):
        cap *= 2
    return min(cap, SL_MAX)


def live_mask(sph: np.ndarray) -> np.ndarray:
    """Real spheres in the kernel table: r² > 0, trailing sphere-0 padding
    duplicates excluded (prepare_pallas_scene's conventions)."""
    sph = np.asarray(sph)
    live = sph[3] > 0.0
    j = sph.shape[1]
    while j > 1 and np.all(sph[:, j - 1] == sph[:, 0]):
        j -= 1
    live[j:] = False
    return live


def live_sphere_count(sph: np.ndarray) -> int:
    return int(live_mask(sph).sum())


def shortlists_for(sph: np.ndarray, cam, config, local_spp: int,
                   block_lo: int = 0, n_blocks: int | None = None,
                   attr: np.ndarray | None = None):
    """Single-sourced gate + build for phase-split shortlists.

    Returns NumPy ``(sl, meta, slattr)`` when the split should run,
    ``(None, None, None)`` when it shouldn't, and raises when
    ``pallas_primary="split"`` is forced on an unsupported configuration — so
    every front-end (PallasRenderer, ProgressiveRenderer, the sharded step)
    agrees on the contract. Callers convert to device arrays and cache.

    ``attr``: the kernel's combined (N_ATTR, S) attribute table (pass the
    SPHERES-ONLY table — no triangle columns). When given and no block
    overflows, ``slattr`` holds per-block shortlist-aligned copies so the
    kernel's bounce-0 attribute gather runs over ~32 columns instead of S.
    """
    from .megakernel import MAX_SPLIT_SPP

    supported = config.level != 0 and 1 <= local_spp <= MAX_SPLIT_SPP
    if config.pallas_primary == "off" or not supported:
        if config.pallas_primary == "split":
            raise ValueError(
                "pallas_primary='split' needs a raytraced level and a "
                f"per-device samples_per_pixel (here {local_spp}) of at most "
                f"{MAX_SPLIT_SPP}")
        return None, None, None
    sl, meta = build_block_shortlists(sph, cam, config, block_lo=block_lo,
                                      n_blocks=n_blocks)
    if (config.pallas_primary == "auto"
            and not split_worthwhile(sl, meta, sph, local_spp)):
        return None, None, None
    slattr = None if attr is None else shortlist_attr_tables(sl, meta, attr)
    return sl, meta, slattr


def device_shortlists_for(pscene, cam, config, local_spp: int):
    """``shortlists_for`` on a prepared :class:`PallasScene`, device-ready.

    The one place the single-chip front-ends (PallasRenderer,
    AdaptiveRenderer, ProgressiveRenderer) share the slattr contract: the
    local attribute tables are only built for sphere-only scenes (triangle
    columns would misalign the combined index space), and every non-None
    result is converted to a device array. Returns ``(sl, slmeta, slattr)``
    with Nones wherever the gate declined. (The sharded step keeps its own
    call — it pads the block grid to the mesh and skips slattr by design.)
    """
    import jax.numpy as jnp

    attr = np.asarray(pscene.attr) if pscene.tri.shape[1] == 0 else None
    sl, slmeta, slattr = shortlists_for(np.asarray(pscene.sph), cam, config,
                                        local_spp, attr=attr)
    if sl is not None:
        sl, slmeta = jnp.asarray(sl), jnp.asarray(slmeta)
    if slattr is not None:
        slattr = jnp.asarray(slattr)
    return sl, slmeta, slattr


def shortlist_attr_tables(sl: np.ndarray, meta: np.ndarray,
                          attr: np.ndarray):
    """Per-block attribute tables aligned with the shortlists (column j =
    the global attr column of shortlist entry j, same bf16 hi/lo rows →
    bit-identical gathered values). ``None`` when any block overflowed (those
    blocks full-walk and need the global table)."""
    if (meta[:, 0] > 0.0).any():
        return None
    n_blocks, _, k_cap = sl.shape
    k_pad = max(32, -(-k_cap // 32) * 32)
    out = np.zeros((n_blocks, attr.shape[0], k_pad), attr.dtype)
    live = sl[:, 3, :] > np.float32(-1e29)          # (B, K)
    idx = sl[:, 4, :].astype(np.int64)              # padding rows carry 0
    # One fancy-index gather for every (block, slot) pair — the per-block
    # Python loop was the edit path's second-largest host term (dead slots
    # gather column 0, then zero out).
    out[:, :, :k_cap] = np.where(live[:, None, :],
                                 attr[:, idx].transpose(1, 0, 2), 0.0)
    return out


def split_worthwhile(sl: np.ndarray, meta: np.ndarray, sph: np.ndarray,
                     spp: int) -> bool:
    """Should "auto" mode use the phase split for these shortlists?

    The split pays fixed costs dominated by the phase-B restart fetch, whose
    per-iteration price scales with spp (one-hot over spp-1 state slots); it
    earns them back by shrinking bounce-0 work and running bounce 0 at full
    occupancy. Measured decision surface (v5e): a 4-sphere scene at 16 spp ran
    5% SLOWER split (fetch ≫ trivial walk) but 21% FASTER at 4 spp / 8 bounces
    (cheap fetch, occupancy win). So: split when the shortlists genuinely cull
    (mean ≤ half the live spheres) OR the fetch is cheap (spp ≤ 4); never when
    most blocks overflowed. ``pallas_primary="split"`` bypasses this gate.
    """
    overflow = meta[:, 0] > 0.0
    kept = ~overflow
    if overflow.mean() > 0.5 or not kept.any():
        return False
    if spp <= 4:
        return True
    counts = (sl[:, 3, :] > np.float32(-1e29)).sum(axis=1)
    mean_count = float(counts[kept].mean())
    return mean_count * 2.0 <= live_sphere_count(sph)


def build_block_shortlists(sph: np.ndarray, cam, config,
                           block_lo: int = 0, n_blocks: int | None = None):
    """Per-block primary shortlists.

    ``sph``: the kernel sphere table, (4, S) float32 rows cx, cy, cz, r²
    (morton-sorted, padding lanes duplicate sphere 0 — exact trailing
    duplicates of column 0 are dropped here: a duplicate ties sphere 0's t
    bit-exactly and loses the strict-< test, so removing it never changes the
    winner). ``cam``: a concrete CameraState. Returns ``(sl, meta)``:

    - ``sl``  (n_blocks, 5, K) f32 — front-to-back sphere rows; padding
      entries use the empty-scene convention (origin, r² = -1e30 ⇒ disc < 0).
    - ``meta`` (n_blocks, 1 + K//SL_CHUNK) f32 — [full_flag, chunk t_lo …];
      chunks past the end carry +inf so the kernel's early-out loop never
      enters them. full_flag = 1 ⇒ the block overflowed SL_MAX and the kernel
      must use the full grouped walk for it.
    """
    from .megakernel import BLOCK_H, BLOCK_W, block_grid

    sph = np.asarray(sph, np.float32)
    cx, cy, cz, r2 = sph

    # Trailing padding duplicates of sphere 0 (prepare_pallas_scene) — drop.
    live = live_mask(sph)

    pos = np.array([float(cam.position.x), float(cam.position.y),
                    float(cam.position.z)], np.float64)
    fwd = np.array([float(cam.direction.x), float(cam.direction.y),
                    float(cam.direction.z)], np.float64)
    up = np.array([float(cam.up.x), float(cam.up.y), float(cam.up.z)],
                  np.float64)
    right = np.cross(fwd, up)                    # wgsl:149
    # The frustum-plane tests below are scale-invariant (plane normals are
    # unit-normalized from the raw corner directions, which are exact for the
    # raw basis), but the behind-lens / defocus tests project oc onto FWD and
    # compare against world-unit margins — those need a unit axis, or a
    # non-unit hand-built camera basis (camera_state validation is
    # deliberately scale-invariant) silently shrinks the margin by 1/|fwd|.
    fwd_u = fwd / np.linalg.norm(fwd)
    scale = float(np.tan(float(cam.fov) * 0.5))
    aspect = float(cam.aspect)
    w, h = config.width, config.height

    r = np.sqrt(np.maximum(r2, 0.0).astype(np.float64))
    centers = np.stack([cx, cy, cz], axis=1).astype(np.float64)
    oc = centers - pos                           # (S, 3)
    lens_r = 0.0
    r_eff = r.copy()
    if config.defocus and float(cam.aperture) > 0.0:
        lens_r = 0.5 * float(cam.aperture)
        focus = max(float(cam.focus_distance), 1e-6)
        d_fwd = oc @ fwd_u
        t_par = np.maximum((d_fwd + r) / focus, 1.0)
        r_eff = r + lens_r * t_par

    nbx, nby = block_grid(config)
    if n_blocks is None:
        n_blocks = nbx * nby - block_lo

    w_px = h * aspect                            # raygen jitter denominators
    jx, jy = 0.5 / w_px, 0.5 / h

    # The kernel traces in f32; these planes/bounds are f64. A distance-scaled
    # safety margin keeps borderline f32 hits (tangent discriminants, long-ray
    # lateral drift ~ dist·2⁻²⁰) strictly inside every conservative test.
    dist = np.linalg.norm(oc, axis=1)
    fp_eps = 1e-4 + 1e-5 * dist

    # Distance lower bound (d is unit-normalized in raygen, so t = distance).
    t_lo = np.maximum(dist - r - lens_r - fp_eps, 0.0)
    order_key = np.where(live, t_lo, np.inf)

    # Frustum math vectorized over blocks (the per-block Python loop was
    # 97 ms of a 1080p edit frame — BENCH_EDIT_r03); per-block work below is
    # membership extraction + front-to-back sort only.
    b_ids = block_lo + np.arange(n_blocks)
    bx, by = b_ids % nbx, b_ids // nbx
    x0, y0 = bx * BLOCK_W, by * BLOCK_H
    nx_lo = (2.0 * (x0 + 0.5) / w - 1.0) - jx              # (B,)
    nx_hi = (2.0 * (x0 + BLOCK_W - 0.5) / w - 1.0) + jx
    ny_hi = (1.0 - 2.0 * (y0 + 0.5) / h) + jy
    ny_lo = (1.0 - 2.0 * (y0 + BLOCK_H - 0.5) / h) - jy

    def dirn(nx, ny):                                      # (B, 3)
        return (fwd[None, :] + right[None, :] * (nx * aspect * scale)[:, None]
                + up[None, :] * (ny * scale)[:, None])

    c00, c10 = dirn(nx_lo, ny_lo), dirn(nx_hi, ny_lo)
    c01, c11 = dirn(nx_lo, ny_hi), dirn(nx_hi, ny_hi)
    dc = dirn(0.5 * (nx_lo + nx_hi), 0.5 * (ny_lo + ny_hi))
    planes = np.stack([np.cross(pa, pb) for pa, pb in
                       ((c00, c01), (c10, c11), (c00, c10), (c01, c11))],
                      axis=1)                              # (B, 4, 3)
    flip = np.einsum("bpk,bk->bp", planes, dc) < 0.0
    planes = np.where(flip[:, :, None], -planes, planes)
    planes /= np.linalg.norm(planes, axis=2, keepdims=True)
    margin = r_eff + lens_r + fp_eps                       # (S,)
    proj = np.einsum("bpk,sk->bps", planes, oc)            # (B, 4, S)
    inside = ((proj >= -margin[None, None, :]).all(axis=1)
              & ((oc @ fwd_u) >= -margin)[None, :]         # behind the lens
              & live[None, :])                             # (B, S)

    counts = np.zeros(n_blocks, np.int64)
    members = []
    for k in range(n_blocks):
        idx = np.nonzero(inside[k])[0]
        idx = idx[np.argsort(order_key[idx], kind="stable")]
        counts[k] = idx.size
        members.append(idx)

    k_cap = shortlist_capacity(counts)
    n_chunks = k_cap // SL_CHUNK
    sl = np.zeros((n_blocks, N_SL_ROWS, k_cap), np.float32)
    sl[:, 3, :] = np.float32(-1e30)              # inert padding: disc < 0 always
    meta = np.zeros((n_blocks, 1 + n_chunks), np.float32)
    meta[:, 1:] = np.inf
    for k, idx in enumerate(members):
        if idx.size > k_cap:
            meta[k, 0] = 1.0                     # overflow: full walk
            continue
        m = idx.size
        sl[k, 0, :m] = cx[idx]
        sl[k, 1, :m] = cy[idx]
        sl[k, 2, :m] = cz[idx]
        sl[k, 3, :m] = r2[idx]
        sl[k, 4, :m] = idx.astype(np.float32)
        used = -(-m // SL_CHUNK)
        if used:
            meta[k, 1:1 + used] = t_lo[idx[::SL_CHUNK][:used]].astype(np.float32)
    return sl, meta
