"""Pallas path-tracing megakernel — the TPU twin of the reference's fragment shader.

The reference runs the whole path tracer as one GPU megakernel, one thread per pixel
(raytrace.wgsl:93-224). This is the TPU-native equivalent: one Pallas kernel instance
per *tile* of ``TILE_SUB × 128`` pixels, with the entire scene resident in VMEM and
the sample and bounce loops fused inside the kernel — so the only HBM traffic per
frame is the final per-pixel color/depth write. (The XLA wavefront in
``engine.renderer`` round-trips multi-GB [rays × spheres] intermediates through HBM
every bounce; this kernel is the fix.)

Design notes (constraints/costs measured on TPU v5e by probing + ablation):

- The sphere loop streams one sphere at a time (scalars from SMEM) against
  register-resident (TILE_SUB, 128) ray tiles. Dense [rays × spheres] pair
  blocks were 4.7× SLOWER: each 512 KB intermediate exceeds the vector register
  file, so every elementwise op streamed megabytes through the VMEM stack
  (the kernel was memory-bound and completely insensitive to arithmetic
  changes; 2× tile size hit Mosaic's 16 MB scoped-vmem limit outright).
  No per-lane gathers and no dynamic VMEM indexing anywhere (neither lowers).
  The loop is scalar/vector co-bottlenecked: slicing the tile into (8, 128)
  rows for finer culling quadrupled SMEM scalar traffic and ran 1.44× slower.
- **Persistent sampling**: a lane whose path ends immediately starts its
  pixel's next sample inside the same while loop, instead of idling masked
  until the slowest path of every sample finishes — lockstep occupancy ~74%
  vs ~50% for the classic spp×(bounces+1) loop (1.28× frame time). The
  classic loop is kept behind ``persistent=False`` for A/B.
- The nearest-hit carry stores q = a·t (a = |d|² > 0 preserves ordering), the
  sphere table stores radius², and padding lanes duplicate sphere 0 (a
  duplicate ties bit-exactly and loses the strict t < best test) — together
  the per-sphere test is ~23 vector ops, which runs at VPU speed-of-light
  for the effective test count.
- Winning-sphere attributes are fetched with **one-hot MXU matmuls**: all
  attributes (centers + materials, each split bf16 hi/lo for f32 accuracy — the
  MXU truncates inputs to bf16) live in ONE combined table, one matmul per ray
  sublane-row against an (S, 128) one-hot (no sublane↔lane relayouts).
- Mosaic's builtin log/cos/sin lower very slowly (~36 ns/ray·bounce for two
  Box–Muller ball samples — more than the entire 512-sphere intersection), so
  the default RNG is the **hardware PRNG** (``pltpu.prng_*``) with fast-math
  (bit-trick) Box–Muller sampling. ``exact_rng=True`` switches to the
  counter-based PCG streams + exact Box–Muller shared with the XLA renderer and
  the NumPy oracle — bit-comparable, used by interpret-mode tests.
- Shading, sky, and the exact-RNG path reuse the same jnp building blocks as the
  XLA renderer (core.rng, kernels.shade, kernels.composite).
- **Phase-split sampling** (round 2, default ≤ MAX_SPLIT_SPP): bounce 0 of
  every sample runs first as a fully coherent pass against host-built
  per-block frustum shortlists (kernels/pallas/primary.py — ~7 of 512 spheres
  per 64×64 block on the bench scene), with continuing-path state parked in
  VMEM scratch; bounces ≥ 1 then run the persistent loop, restarting dead
  lanes from their pixel's next stored sample via a static one-hot slot fetch
  (measured ≈ free — VMEM streaming overlaps the walk). Frame split at the
  headline: bounce-0 pass 47 ms of 331 ms. With bounce 0 removed, the
  remaining traffic is pure bounce soup, where the per-lane candidate walk
  beats brute at 512 padded spheres (+14%) — hence the phase-split-aware
  ``auto`` crossover in ``_use_candidate_walk``.
- The per-sphere test is VECTOR-ISSUE-bound (~2 ops/cycle; 0.0092 ns/pair ≈
  speed-of-light for its ~20 ops): SMEM scalar delivery is free, sqrt is
  ~25-30% of the test with no cheaper exact substitute, and ``fast_disc``
  (sqrt(disc<0)=NaN fails both accept compares — bit-identical) shaves the
  explicit disc ≥ 0 test. Straggler-lane work in the candidate walk is
  irreducible at tile lockstep (seeding/capping both measured negative —
  CLAUDE.md has the full round-2b wall list).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import rng
from ...core.constants import INF, T_MIN
from ...core.types import CameraState, RenderConfig, SceneBuffers
from ...core.vec import Vec3
from ...engine import slots
from ..composite import background_gradient, linear_to_gamma
from ..intersect import HitInfo, MaterialLanes
from ..shade import scatter

TILE_SUB = 32          # sublanes per tile
TILE = TILE_SUB * 128  # rays per kernel instance
BLOCK_W = 64           # pixel-block width;  BLOCK_W*BLOCK_H == TILE
BLOCK_H = 64           # pixel-block height
assert BLOCK_W * BLOCK_H == TILE, "pixel blocks must tile exactly onto rays"
SPHERE_CHUNK = 128     # sphere-table capacity granularity (lane multiple)
SUPER = 8              # groups per supergroup (two-level culling, big scenes)

# Phase-split stored-state fields (one (TILE_SUB, 128) plane per sample slot):
# post-bounce-0 ray origin/direction, throughput color, accumulated radiance,
# first-hit depth, alive weight, true sample id (redirect compaction reorders
# slots, so the id rides along for RNG stream keying and next-slot arithmetic).
# ST_W and (on non-emissive scenes) ST_RAD* are LOGICAL only — _st_layout
# decides what's physically parked; the rest is derived (see its docstring).
N_ST = 15
(ST_OX, ST_OY, ST_OZ, ST_DX, ST_DY, ST_DZ, ST_RCX, ST_RCY, ST_RCZ,
 ST_RADX, ST_RADY, ST_RADZ, ST_FD, ST_W, ST_SID) = range(N_ST)


# Accumulate first-hit depth in PHASE A (see _st_layout docstring): drops the
# ST_FD plane from the parked state AND removes ``fd`` + the per-half
# ``dsums`` tuple (fuse arrays!) from the phase-B while-carry — at fuse 4
# that is 5 fewer carried (TILE_SUB, 128) arrays round-tripping VMEM per
# iteration (the radiance-drop analog measured +2.2% for 4 arrays). False
# keeps the round-3 parked-depth path as the A/B arm. Colors bit-exact
# between arms; depth to f32-sum-order ulps. Hardware A/B (DEPTHA_AB_r04,
# paired interleaved): headline +2.7% (408.6 vs 397.8 Mrays/s), dense +1.7%
# (30.4 vs 29.9) — ships True; shipped non-emissive layout is 10 planes.
DEPTH_IN_A = True


def _st_layout(has_emissive: bool):
    """Physically-stored parked-state fields (round 4 compaction — the scratch
    footprint AND the restart fetch's per-slot select chain both scale with
    this count, 15 → 13/10):

    - ST_W is never stored: phase A parks ``sid = cont ? slot : n_slots``, so
      aliveness is ``sid < n_slots`` both before and after the redirect
      compaction (whose dead-tail default is also sid = n_slots).
    - ST_RAD* is stored only when the scene has emissive materials: a
      CONTINUING lane's radiance only grows via ray_color·emissive
      (bounce_core) — a miss adds the background and dies the same step —
      so on non-emissive scenes every parked-live slot's radiance is
      exactly 0.0 and reads/fetches return a constant zero instead.
      (The _DEBUG_DOUBLE_GATHER timing probe violates this at 1e-30 by
      design — its images are documented as perturbed.)
    - ST_FD (DEPTH_IN_A, round 4): first-hit depth is written ONLY at
      bounce 0 (bounce_core's ``b_vec == 0`` guard) and phase B restarts
      parked samples at b_lane = 1, so a sample's depth is FINAL when
      phase A parks it. Phase A therefore accumulates depth for every
      ACTIVE sample (died or parked) and the field needs neither a plane,
      a fetch select, nor a while-carry slot — and the per-half ``dsums``
      accumulators leave the phase-B carry entirely (they close over the
      loop). Colors are bit-exact vs the parked path; the depth SUM
      reorders (strict sample order, the oracle's order) so depth matches
      to f32-sum ulps only.

    The ST_W/ST_RAD cuts are bit-exact; tests/test_fuse.py pins forced-True
    vs computed layouts on a non-emissive scene and DEPTH_IN_A arms."""
    fields = [ST_OX, ST_OY, ST_OZ, ST_DX, ST_DY, ST_DZ,
              ST_RCX, ST_RCY, ST_RCZ]
    if has_emissive:
        fields += [ST_RADX, ST_RADY, ST_RADZ]
    if not DEPTH_IN_A:
        fields += [ST_FD]
    fields += [ST_SID]
    return tuple(fields)


def scene_has_emissive(scene: SceneBuffers) -> bool:
    """Host-side static probe: does ANY material in the table emit? Drives the
    parked-state layout (_st_layout) — conservative (table-wide, not just
    referenced materials). Must be called on concrete buffers, not tracers."""
    mt = scene.materials
    return bool(np.any(np.asarray(mt.emissive_r))
                or np.any(np.asarray(mt.emissive_g))
                or np.any(np.asarray(mt.emissive_b)))
MAX_SPLIT_SPP = 32     # phase-split spp gate (state scratch must fit VMEM)
MAX_FUSE_PLANES = 704  # fuse·spp·len(_st_layout) cap — scratch is planes ×
                       # 16 KiB; 704 (= 64 slots × the then-compact 11-plane
                       # layout, 11.3 MB) compiled and won on hardware
                       # (SLOTS_AB_r04: headline fuse 4 +0.9% paired); the
                       # DEPTH_IN_A 10-plane ship point uses 640 of it at the
                       # headline; emissive scenes' 13-plane layout falls
                       # back to fewer slots automatically
# Pixel-blocks fused per kernel instance in phase-split mode (tile-tail
# pooling): the round-4 direct counters (TITER_r04, SPEED_OF_LIGHT §11) show
# phase B runs at 61% (headline) / 41.5% (dense 4 spp) lockstep occupancy —
# exhausted-sample lanes idle while the tile's straggler lane finishes.
# Fusing F blocks into one instance gives every lane F pixels' samples
# (slots h·spp+s), so the while-loop tail is paid once per F blocks and the
# straggler of per-lane SUMS replaces the sum of per-block stragglers
# (classic variance pooling). Values: 1 (off) | 2 | 4 | 8 | "auto" (largest
# power of two with fuse·spp·planes ≤ MAX_FUSE_PLANES; indivisible tile
# counts pad the grid with cropped tail blocks). Bit-identical on the
# exact-RNG path (draws stay keyed by
# (pixel, sample); per-pixel accumulation order is unchanged); the hw-PRNG
# stream reseeds per fused tile (no bit contract there). Hardware A/B
# (FUSE_AB_r04.json, paired): headline fuse=2 +0.8% (402.4 vs 399.3 Mrays/s),
# dense fuse=2 +6.6% / fuse=4 +15.3% (31.6 vs 27.4) — ships "auto", which
# stays at the MEASURED points: no fusion under 128 padded spheres (config-1
# smoke: fuse=8 on the 2-sphere 256²/4spp scene ran 38.2 ms vs 30.8 unfused
# — tiny per-iteration cost makes the slot-scaled fetch chain a net loss).
# Round-5 (DENSEFUSE in FLAT_AB_r05 family, under the FLAT walk): fuse 8
# WINS the dense low-spp point — 40.95 vs 39.67 Mrays/s (+3.2%, paired;
# fuse 2 36.44) at 5,000 spheres / 4 spp, including its 6.7% grid padding.
# "auto" opens 8 only at that measured regime (spp ≤ 4 AND ≥2048 padded
# spheres); 16-spp configs stay plane-budget-capped at 4 regardless.
PHASE_FUSE = "auto"


def _resolve_fuse(n_tiles: int, spp: int, phase_split: bool,
                  n_spheres_padded: int = 1 << 30, n_st: int = N_ST) -> int:
    if not phase_split:
        return 1
    want = PHASE_FUSE
    auto = want == "auto"
    if auto:
        if n_spheres_padded < 128:
            want = 1
        elif spp <= 4 and n_spheres_padded >= 2048:
            want = 8      # the round-5 measured dense point
        else:
            want = 4
    want = int(want)
    f = 1
    while f < want and f < 8 and (f * 2) * spp * n_st <= MAX_FUSE_PLANES:
        # Indivisible tile counts PAD the grid (render_tiles crops the tail):
        # a padded block costs one tile's phase A (all lanes masked, phase B
        # exits immediately), so "auto" caps the waste at ~8% of real blocks
        # (12× — the round-5 dense fuse-8 win carried 6.7% padding, so the
        # old 16× guard was too strict); an explicit PHASE_FUSE accepts
        # whatever padding it implies.
        if auto and ((-n_tiles) % (f * 2)) * 12 > n_tiles:
            break
        f *= 2
    return f
# Bounce iterations per phase-B while-loop step. The outer persistent loop
# carries 13 (TILE_SUB, 128) arrays; every while iteration round-trips that
# carry through VMEM and pays a cross-lane cond reduce (the same mechanism
# the walk-prefix unroll exploits — exp_round3f). The body is exactly
# idempotent on all-dead lanes (masked updates, zero harvest, no-op fetch),
# so J>1 only adds a harmless partial pass at each tile's end. Round-4 ladder
# (PHASEBJ_AB_r04.json, paired, PRE-fusion): J=3 +1.1% over J=2; J=4 −0.5%.
# Re-tuned under fuse 4 + the compact layout (RETUNE_AB_r04 + RETUNE2_AB_r04,
# two independent paired interleaved batteries): J=2 beats J=3 by +4.5% and
# +9.3% — fusion multiplies the per-pass cost (F uniform-row blocks and an
# F-wide accumulator tuple per body copy), so the wasted tail passes overtake
# the saved carry round-trips one step earlier; a drift-matched fresh-process
# pair agreed (J=2 390.7 vs J=3 345.0 Mrays/s). REMASK (8,) lost both confirm
# arms — (5,) stays.
# Round-5 retune under the FLAT walk (RETUNE_r05.json): at the headline the
# flat body is much shorter than nested (4 candidate steps + masked finish),
# so deeper unrolls pay again — J=4 beat J=2 in TWO independent paired
# batteries (+2.0%, +1.8%); J=1 −5.7%. Dense J2≈J3 (tie) — the dense body
# finishes ~1 segment/iteration already and more copies just grow the
# program. "auto" = 4 under the flat headline scale, 2 everywhere else.
PHASEB_UNROLL = "auto"


def _phaseb_unroll(flat_active: bool, n_spheres_padded: int) -> int:
    if PHASEB_UNROLL == "auto":
        return 4 if (flat_active and n_spheres_padded < 2048) else 2
    return max(int(PHASEB_UNROLL), 1)
# FLATTENED phase-B walk (round 5 — the "new program family" for dense
# scenes, VERDICT r4 item 2): instead of nesting the candidate walk's own
# while loop inside each persistent-loop iteration — where every lane waits
# for the tile's walk STRAGGLER before any lane may scatter/restart — the
# outer loop runs FLAT_WALK_STEPS candidate steps per iteration and lanes
# whose walk just exhausted immediately finish their segment (scatter,
# harvest, restart, fresh mask) in the same iteration, masked per lane.
# Per-segment walk cost drops from the tile MAX of entered groups to the
# MEAN (dense kd replay: straggler 14.6 vs mean 3.10 — §7), in exchange for
# paying the segment-fixed machinery (fetch/gather/draws/scatter/harvest +
# a mask build) once per ITERATION instead of once per segment. Measured on
# hardware (FLAT_AB_r05) the trade pays at BOTH scales: at FLAT_WALK_STEPS=4
# the mean segment needs <1 iteration, so the fixed machinery runs LESS
# often per segment than nested — dense +36%, headline +34% (575 Mrays/s,
# above the nested family's 545 ceiling). Candidates-walk + no-triangles
# only; value-identical to the nested scheduling (same per-lane visit order
# and test arithmetic via _CandidateWalk; mid-walk re-masks are value-
# neutral by construction). True | False | "auto" (on wherever legal).
PHASEB_FLAT = "auto"
# Candidate steps per outer iteration. Real-TPU ladder (FLAT_AB_r05.json,
# dense 5000-sphere 4 spp): nested 30.8 -> flat1 34.5 -> flat2 38.5 -> flat3
# 40.7; second battery flat3 38.5 -> flat4 41.9 (optimum) -> flat6 38.7
# (overshoot waste past the 3.10-step mean walk). steps=4 ships.
FLAT_WALK_STEPS = 4
FLAT_REMASK = False   # per-iteration best-q re-mask of WALKING lanes, fused
                      # into the fresh-mask build (see body_once_flat).
                      # Measured ~tied with steps-only at the dense optimum
                      # (flat2r 41.74 / flat3r 41.35 vs flat4 41.85,
                      # FLAT_AB_r05) - kept as an A/B knob, not shipped.
FLAT_STEP_MERGE = False  # merge the FLAT_WALK_STEPS per-iteration candidate
                         # steps into ONE wide MXU gather per chunk
                         # (_CandidateWalk.step_multi — bit-identical by the
                         # lex-min argument). Default OFF pending a paired
                         # hardware A/B; same streamed bytes, fewer matmul
                         # issues + no matmul→reduce dependency between steps.


def _use_flat_walk(n_spheres_padded: int, use_candidates: bool,
                   n_tris_padded: int) -> bool:
    if not use_candidates or n_tris_padded:
        return False
    if PHASEB_FLAT == "auto":
        # Round-5 hardware batteries: flat wins EVERYWHERE the candidates
        # walk runs. Dense 5000-sphere: nested 30.8 -> flat4 41.9 Mrays/s
        # (+36%). Headline 508-sphere: nested 430.2 -> flat4 575.1 (+34%,
        # above the round-4 nested-family ceiling of 545 — the "63-slot
        # fetch makes flat lose at 16 spp" prediction was WRONG: iterations
        # per segment drop below 1 at steps=4, so the per-iteration fixed
        # machinery amortizes BETTER than nested, not worse). FLAT_AB_r05.
        return True
    return bool(PHASEB_FLAT)
SL_WALK_ALL_MAX = 0    # shortlists up to this size skip the chunked early-out
                       # (measured: walk-all was 2.5% SLOWER than the chunked
                       # early-out even at k_cap=24 — the per-chunk consensus
                       # reduce earns its keep; kept as a testable path)
_DEBUG_STATIC_FETCH = False   # timing probe only (wrong images): see fetch()
# Timing probe (images CORRECT, counter repurposed): count LOOP ITERATIONS
# instead of live segments in the rays_traced output — every lane adds 1.0
# each pass through a trace-loop body, so rays_traced == tile_iters · TILE.
# With a paired normal run this yields exact per-tile-iteration cost and
# occupancy (live segments / lane-iterations). exp_round4_titer.py.
COUNT_ITERS = False
# Phase-A cost-decomposition ablations (timing probes ONLY — wrong images;
# run at bounces=0 so phase B never sees the perturbed state). Subset of:
#   "no_compact"   skip the redirect-compaction pass
#   "no_st"        skip parking the per-sample state in VMEM scratch
#   "no_scatter"   skip scatter draws + scatter math (rays pass through)
#   "no_jitter"    fixed 0.5/0.5 pixel jitter (skips the RNG jitter draws)
#   "no_intersect" every ray misses (skips the shortlist walk)
#   "no_harvest"   skip the gamma/accumulate step
_DEBUG_PHASEA = frozenset()
# Value-identical candidate: python-unroll the phase-A sample loop the way the
# walk prefix is unrolled (exp_round3f mechanism — the fori_loop round-trips
# the 5-array accumulator carry through VMEM each sample and pays the loop
# bookkeeping; an unrolled body keeps the accumulators register-resident).
PHASEA_UNROLL = False

# Combined attribute table rows (one-hot gather): centers hi/lo, materials hi/lo.
_C_HI, _C_LO = 0, 3            # cx, cy, cz
_M_HI, _M_LO = 6, 16           # base rgb, metallic, rough, ior, trans, emissive rgb
N_MAT = 10
N_ATTR = 32                    # padded to a sublane multiple

# Camera/scalar uniform slots (SMEM row vector).
(C_POS_X, C_POS_Y, C_POS_Z, C_DIR_X, C_DIR_Y, C_DIR_Z, C_UP_X, C_UP_Y, C_UP_Z,
 C_RIGHT_X, C_RIGHT_Y, C_RIGHT_Z, C_SCALE, C_ASPECT, C_NEAR, C_FAR,
 C_WIDTH, C_HEIGHT, C_NPIX, C_APERTURE, C_FOCUS) = range(21)
N_CAM = 24


class ExactRngProvider:
    """Counter-based PCG streams — bit-comparable with the XLA renderer/oracle."""

    def __init__(self, pixel_index, sample_idx, frame_seed):
        self.stream = rng.stream_init(pixel_index.astype(jnp.uint32),
                                      sample_idx.astype(jnp.uint32), frame_seed)

    def jitter(self):
        return (rng.draw(self.stream, np.uint32(slots.JITTER_U)),
                rng.draw(self.stream, np.uint32(slots.JITTER_V)))

    def lens(self):
        return (rng.draw(self.stream, np.uint32(slots.LENS_U)),
                rng.draw(self.stream, np.uint32(slots.LENS_V)))

    def scatter_draws(self, bounce):
        base = jnp.uint32(slots.RAYGEN_DRAWS) + (
            bounce.astype(jnp.uint32) * np.uint32(slots.DRAWS_PER_BOUNCE))
        u_metal = rng.draw(self.stream, base + np.uint32(slots.S_METAL))
        u_trans = rng.draw(self.stream, base + np.uint32(slots.S_TRANS))
        u_reflect = rng.draw(self.stream, base + np.uint32(slots.S_REFLECT))
        ball1 = self._ball(base, slots.S_BALL1)
        ball2 = self._ball(base, slots.S_BALL2)
        return u_metal, u_trans, u_reflect, ball1, ball2

    def _ball(self, base, first):
        us = [rng.draw(self.stream, base + np.uint32(first + k)) for k in range(5)]
        return rng.unit_ball_from_uniforms(*us)


# ---------------------------------------------------------------------------
# Fast math: Mosaic's builtin log/exp/sin/cos lower to very slow sequences
# (measured: two Box–Muller balls cost more than a 512-sphere intersection), so
# the fast-RNG path uses classic bit-trick approximations (~1e-4 relative error,
# far below Monte-Carlo noise). Formulas are the widely-known "fastapprox" ones.
# ---------------------------------------------------------------------------

def _fast_log2(x):
    """log2(x) for x > 0, ~1e-4 abs error.

    Bit patterns of positive finite floats fit in int32, and Mosaic has no
    uint32→float32 cast, so the reinterpretation goes through int32.
    """
    vx = pltpu.bitcast(x, jnp.int32).astype(jnp.float32)
    mx = pltpu.bitcast((pltpu.bitcast(x, jnp.int32) & np.int32(0x007FFFFF))
                       | np.int32(0x3F000000), jnp.float32)
    y = vx * np.float32(1.1920928955078125e-7)
    return (y - np.float32(124.22551499) - np.float32(1.498030302) * mx
            - np.float32(1.72587999) / (np.float32(0.3520887068) + mx))


def _fast_pow2(p):
    """2**p, ~1e-4 relative error, p in a sane range.

    NOTE: the fractional part must come from truncation toward zero (not floor)
    for the offset trick to keep z in [0, 2) at negative p.
    """
    offset = jnp.where(p < 0.0, 1.0, 0.0)
    trunc = jnp.where(p < 0.0, -jnp.floor(-p), jnp.floor(p))
    z = p - trunc + offset
    v = ((np.float32(1 << 23))
         * (p + np.float32(121.2740575)
            + np.float32(27.7280233) / (np.float32(4.84252568) - z)
            - np.float32(1.49012907) * z))
    # Exponent-biased value is < 2^31 for any sane p → int32 is safe (and Mosaic
    # lacks f32↔u32 casts).
    return pltpu.bitcast(v.astype(jnp.int32), jnp.float32)


def _fast_sinpi(x):
    """sin(pi*x) for x in [-1, 1], ~0.1% error (parabola + refinement)."""
    y = np.float32(4.0) * x * (np.float32(1.0) - jnp.abs(x))
    return np.float32(0.225) * (y * jnp.abs(y) - y) + y


def _fast_sin2pi(t):
    """sin(2*pi*t) for t in [0, 1)."""
    x = np.float32(2.0) * t - np.float32(1.0)          # [-1, 1)
    return -_fast_sinpi(x)


def _fast_cos2pi(t):
    tq = t + np.float32(0.25)
    tq = tq - jnp.floor(tq)
    return _fast_sin2pi(tq)


_LN2 = np.float32(0.6931471805599453)


def _fast_ball(u1, u2, u3, u4, u5) -> Vec3:
    """Uniform point in the unit ball from 5 uniforms — same construction as
    rng.unit_ball_from_uniforms (Gaussian direction via Box–Muller + cube-root
    radius) but with fast-math transcendentals."""
    l1 = _fast_log2(jnp.maximum(u1, 1e-9)) * _LN2
    l3 = _fast_log2(jnp.maximum(u3, 1e-9)) * _LN2
    r1 = jnp.sqrt(-2.0 * l1)
    r3 = jnp.sqrt(-2.0 * l3)
    gx = r1 * _fast_cos2pi(u2)
    gy = r1 * _fast_sin2pi(u2)
    gz = r3 * _fast_cos2pi(u4)
    inv_len = jax.lax.rsqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-20))
    radius = _fast_pow2(_fast_log2(jnp.maximum(u5, 1e-30))
                        * np.float32(1.0 / 3.0))
    s = inv_len * radius
    return Vec3(gx * s, gy * s, gz * s)


def _fast_ball_zphi(uz, uphi, ur) -> Vec3:
    """Uniform point in the unit ball from 3 uniforms: Archimedes cylinder
    sampling (z uniform in [-1,1), azimuth uniform) for the direction — an
    EXACTLY uniform sphere direction, unlike the fast-math-Gaussian route —
    and the usual cube-root radius. Vs ``_fast_ball``: two fewer uniform rows
    and the per-ball transcendental bill drops from 3×log2 + 2×sqrt + rsqrt +
    3×trig to 1×log2 + 1×sqrt + 2×trig (per-row generation dominates the hw
    provider, so the row cut is the bigger half)."""
    z = np.float32(2.0) * uz - np.float32(1.0)
    s = jnp.sqrt(jnp.maximum(np.float32(1.0) - z * z, 0.0))
    x = s * _fast_cos2pi(uphi)
    y = s * _fast_sin2pi(uphi)
    radius = _fast_pow2(_fast_log2(jnp.maximum(ur, 1e-30))
                        * np.float32(1.0 / 3.0))
    return Vec3(x * radius, y * radius, z * radius)


# Compact hw scatter draws: generate 9 random rows per bounce instead of 13 by
# recycling the 9 low bits each 23-bit-mantissa uniform discards. The 8 ball
# uniforms' spares pair into four 18-bit uniforms (u_metal, u_trans and the two
# ball radii — all far above Monte-Carlo noise resolution); u_reflect (the
# Schlick compare) keeps a full 23-bit row. Per-row generation cost dominates
# the provider (bulk generation measured no cheaper per word, round 1), so
# fewer rows is the only lever; the repack is ~6 vector ops per value.
# Distribution-preserving only (different stream) — the hw path has no
# bit-compat contract. Knob (module-level, like REMASK_SCHEDULE) for the
# hardware A/B in scripts/exp_round4_tfix.py.
HW_DRAWS_COMPACT = True

# Round-4 session-2: z/phi balls cut the bounce budget 9 → 6 rows (ball
# directions need 2 full rows each instead of 4, and their exactly-uniform
# construction is also cheaper per ball — see _fast_ball_zphi). Layout:
# rows 0-3 = z1, phi1, z2, phi2; row 4 = u_reflect (full 23-bit Schlick
# compare); row 5 = u_metal; spares (0,1)→r1, (2,3)→r2, (4,5)→u_trans.
# Same contract as HW_DRAWS_COMPACT: hw-only, distribution-preserving.
# Measured +0.6% headline paired (ZPHI_AB_r04.json: 399.3 vs 396.8 Mrays/s)
# with the on-hw distribution sanity inside the same battery.
HW_DRAWS_ZPHI = True


class HwRngProvider:
    """TPU hardware PRNG: stateful per-core generator, seeded per (frame, tile,
    sample).

    Per-uniform generation cost dominates (bulk generation measured no cheaper
    per word), so the budget is 9 uniform rows per bounce (HW_DRAWS_COMPACT;
    13 — the exact path's count — with the knob off), with ball samples via
    fast-math Box–Muller; HW_DRAWS_ZPHI drops to 6 rows with exactly-uniform
    z/phi ball directions. All of a bounce's bits come from a single
    ``prng_random_bits`` call.
    """

    SCATTER_DRAWS = 3 + 2 * 5   # branch tests + 2 five-uniform balls

    def __init__(self, tile_id, sample_idx, frame_seed):
        mixed = (frame_seed
                 ^ (tile_id.astype(jnp.uint32) * np.uint32(0x9E3779B9))
                 ^ (sample_idx.astype(jnp.uint32) * np.uint32(0x85EBCA6B)))
        pltpu.prng_seed(mixed.astype(jnp.int32))

    @staticmethod
    def _raw_block(n_rows):
        """(n_rows·TILE_SUB, 128) random int32 rows from one bit generation.

        All integer work stays in SIGNED int32 — unsigned vector ops are
        pathological in this Mosaic version (scalarized / compile hangs).
        """
        return pltpu.bitcast(
            pltpu.prng_random_bits((n_rows * TILE_SUB, 128)), jnp.int32)

    @staticmethod
    def _mant_uniform(bits):
        """[0,1) uniform from the top 23 bits of each int32 lane."""
        mant = (jax.lax.shift_right_logical(bits, np.int32(9))
                | np.int32(0x3F800000))
        return pltpu.bitcast(mant, jnp.float32) - 1.0

    @classmethod
    def _uniform_block(cls, n_draws):
        return cls._mant_uniform(cls._raw_block(n_draws))

    def jitter(self):
        u = self._uniform_block(2)
        return u[0:TILE_SUB], u[TILE_SUB:2 * TILE_SUB]

    def lens(self):
        u = self._uniform_block(2)
        return u[0:TILE_SUB], u[TILE_SUB:2 * TILE_SUB]

    def scatter_draws(self, bounce):
        del bounce  # stateful generator; draw order alone defines the stream
        if not HW_DRAWS_COMPACT:
            u = self._uniform_block(self.SCATTER_DRAWS)
            part = lambda k: u[k * TILE_SUB:(k + 1) * TILE_SUB]
            ball1 = _fast_ball(part(3), part(4), part(5), part(6), part(7))
            ball2 = _fast_ball(part(8), part(9), part(10), part(11), part(12))
            return part(0), part(1), part(2), ball1, ball2
        if HW_DRAWS_ZPHI:
            bits = self._raw_block(6)
            u = self._mant_uniform(bits)
            part = lambda k: u[k * TILE_SUB:(k + 1) * TILE_SUB]
            spare = lambda k: (bits[k * TILE_SUB:(k + 1) * TILE_SUB]
                               & np.int32(0x1FF))

            def u18(ka, kb):
                v = jax.lax.shift_left(spare(ka), np.int32(9)) | spare(kb)
                mant = jax.lax.shift_left(v, np.int32(5)) | np.int32(0x3F800000)
                return pltpu.bitcast(mant, jnp.float32) - 1.0

            ball1 = _fast_ball_zphi(part(0), part(1), u18(0, 1))
            ball2 = _fast_ball_zphi(part(2), part(3), u18(2, 3))
            return part(5), u18(4, 5), part(4), ball1, ball2
        bits = self._raw_block(9)
        u = self._mant_uniform(bits)
        part = lambda k: u[k * TILE_SUB:(k + 1) * TILE_SUB]
        spare = lambda k: (bits[k * TILE_SUB:(k + 1) * TILE_SUB]
                           & np.int32(0x1FF))

        def u18(ka, kb):
            v = jax.lax.shift_left(spare(ka), np.int32(9)) | spare(kb)
            mant = jax.lax.shift_left(v, np.int32(5)) | np.int32(0x3F800000)
            return pltpu.bitcast(mant, jnp.float32) - 1.0

        ball1 = _fast_ball(part(0), part(1), part(2), part(3), u18(0, 1))
        ball2 = _fast_ball(part(4), part(5), part(6), part(7), u18(2, 3))
        return u18(4, 5), u18(6, 7), part(8), ball1, ball2


GROUP = 32   # spheres per cullable group (morton-ordered at scene prep)


def _use_candidate_walk(config: RenderConfig, n_spheres_padded: int,
                        phase_split: bool = False) -> bool:
    """Static dispatch between the two megakernel sphere walks. The candidate
    walk adapts its group size so its i32 bitmask fits any scene; ``auto``
    keeps the tile-unanimous grouped walk where it is the measured winner and
    switches to the candidate walk where per-lane culling beats brute force.

    Measured crossover (v5e): WITHOUT the phase split the walks are at parity
    at ~500 spheres (bounce-0 segments are coherent enough that brute + tile
    culling keeps up), so auto switches above 1024. WITH the split, phase B is
    pure bounce-soup and per-lane masks win already at 512 padded spheres
    (+14% at the headline scene; parity at 128), so the threshold drops."""
    if config.pallas_intersect == "candidates":
        return True
    if config.pallas_intersect == "auto":
        return n_spheres_padded >= (512 if phase_split else 1025)
    return False


def _intersect_grouped(origin: Vec3, direction: Vec3, sph_ref, gaabb_ref,
                       active, n_spheres: int, unroll: int = GROUP,
                       fast_disc: bool = False):
    """Scalar-loop intersection with per-tile group culling.

    One sphere at a time streams as SMEM scalars (the one place dynamic scalar
    indexing lowers; dynamic VMEM scalar reads crash this Mosaic) against
    register-resident (TILE_SUB, 128) ray tiles — ~23 vector ops per sphere
    with all temps in vector registers. Value-equivalent to
    kernels.intersect.intersect_spheres (near root only, nearest wins), but
    the comparisons run in q = a·t space (q > a·T_MIN, strict q < best), so
    1-ulp borderline hits can resolve differently from the t-space XLA path;
    padding lanes are sphere-0 duplicates that lose every strict-< tie (see
    prepare_pallas_scene), not zero-radius entries.

    Spheres are pre-sorted (scene prep) into GROUP-sized morton-ordered groups
    with precomputed AABBs (``gaabb_ref``: SMEM (6, n_groups) = min xyz, max
    xyz; inverted boxes mark padding groups). Before walking a group's spheres
    the whole tile slab-tests the group box against its current best hits; a
    group no live ray can improve in is skipped with a scalar branch — the
    tile-level analog of BVH traversal, with zero divergence inside the VPU.
    """
    a = direction.dot(direction)
    inv_a = 1.0 / a
    ox, oy, oz = origin.x, origin.y, origin.z
    dx, dy, dz = direction.x, direction.y, direction.z
    idx = 1.0 / dx
    idy = 1.0 / dy
    idz = 1.0 / dz
    active_f = jnp.where(active, 1.0, 0.0)
    q_min = a * T_MIN           # the loop compares q = a·t (same ordering,
                                # a > 0) to avoid two muls per sphere

    def one_sphere(s, best_q, best_i):
        cx = sph_ref[0, s]
        cy = sph_ref[1, s]
        cz = sph_ref[2, s]
        r2 = sph_ref[3, s]  # radius² — sign-free (negative radii / hollow-
        ocx = cx - ox       # glass are legal; hit_sphere only squares r,
        ocy = cy - oy       # wgsl:375). No validity test: padding lanes
        ocz = cz - oz       # duplicate sphere 0 and lose every strict-< tie.
        h = dx * ocx + dy * ocy + dz * ocz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = h * h - a * cc
        if fast_disc:
            # sqrt(disc < 0) = NaN fails BOTH accept compares (IEEE), exactly
            # like the explicit disc ≥ 0 test — 3 fewer vector ops, same set.
            q = h - jnp.sqrt(disc)
            better = (q > q_min) & (q < best_q)
        else:
            q = h - jnp.sqrt(jnp.maximum(disc, 0.0))
            better = ((disc >= 0.0) & (q > q_min) & (q < best_q))
        best_q = jnp.where(better, q, best_q)
        best_i = jnp.where(better, s, best_i)
        return best_q, best_i

    n_groups = n_spheres // GROUP

    def any_box_useful(col, best_q):
        """Can any live ray improve its hit inside AABB column ``col`` of
        gaabb_ref? (slab test, wgsl:387-398)"""
        tx1 = (gaabb_ref[0, col] - ox) * idx
        tx2 = (gaabb_ref[3, col] - ox) * idx
        ty1 = (gaabb_ref[1, col] - oy) * idy
        ty2 = (gaabb_ref[4, col] - oy) * idy
        tz1 = (gaabb_ref[2, col] - oz) * idz
        tz2 = (gaabb_ref[5, col] - oz) * idz
        t_near = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                         jnp.minimum(ty1, ty2)),
                             jnp.minimum(tz1, tz2))
        t_far = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                        jnp.maximum(ty1, ty2)),
                            jnp.maximum(tz1, tz2))
        useful = ((t_far >= t_near) & (t_far > 0.0)
                  # The carry is q = a·t, so the box-entry-beats-current-hit
                  # test rescales t_near by a (a > 0 preserves the ordering).
                  & (a * t_near < best_q))
        return jnp.max(jnp.where(useful, active_f, 0.0)) > 0.0

    def group_body(g, carry):
        best_q, best_i = carry

        def walk(carry):
            bt, bi = carry

            def body(k, c2):
                b2t, b2i = c2
                for j in range(unroll):
                    b2t, b2i = one_sphere(g * GROUP + k * unroll + j, b2t, b2i)
                return b2t, b2i

            return jax.lax.fori_loop(0, GROUP // unroll, body, (bt, bi))

        return jax.lax.cond(any_box_useful(g, best_q), walk, lambda c: c,
                            (best_q, best_i))

    init = (jnp.full((TILE_SUB, 128), INF, jnp.float32),
            jnp.full((TILE_SUB, 128), -1, jnp.int32))
    assert n_spheres % GROUP == 0 and GROUP % unroll == 0
    if n_groups >= 4 * SUPER:
        # Two-level walk for big scenes: supergroup AABBs (columns
        # n_groups + gs of gaabb_ref, built by prepare_pallas_scene) gate a
        # span of SUPER groups with one slab test, so a coherent tile skips
        # whole morton neighborhoods instead of one group at a time.
        n_super = -(-n_groups // SUPER)

        def super_body(gs, carry):
            best_q, _ = carry

            def walk_span(c):
                lo = gs * SUPER
                hi = jnp.minimum(lo + SUPER, n_groups)
                return jax.lax.fori_loop(lo, hi, group_body, c)

            return jax.lax.cond(any_box_useful(n_groups + gs, best_q),
                                walk_span, lambda c: c, carry)

        best_q, best_i = jax.lax.fori_loop(0, n_super, super_body, init)
    else:
        best_q, best_i = jax.lax.fori_loop(0, n_groups, group_body, init)
    best_t = jnp.where(best_q >= INF, INF, best_q * inv_a)
    return best_t, best_i


def _intersect_shortlist(origin: Vec3, direction: Vec3, sl_ref, meta_ref,
                         row, in_image, k_cap: int, fast_disc: bool = False):
    """Bounce-0 intersection against this block's host-built primary shortlist
    (kernels.pallas.primary) — the phase-split twin of ``_intersect_grouped``.

    The shortlist is front-to-back sorted and chunked by SL_CHUNK; the walk
    stops at the first chunk whose conservative entry distance no live ray's
    current best hit can beat (chunk t_lo is non-decreasing, so nothing later
    can help either). Per-sphere arithmetic is identical to
    ``_intersect_grouped.one_sphere`` (q = a·t carry, strict < tie-keeping);
    the 5th shortlist row carries the GLOBAL sphere index so attribute
    gathering is unchanged. Off-image lanes start at best_q = 0: they can
    never accept a hit (q > q_min > 0) and never vote a chunk useful, so edge
    blocks still early-out.

    Returns (t, global index, LOCAL shortlist slot) — the slot (‑1 on miss)
    feeds the shortlist-local attribute gather when every block fits.
    """
    from .primary import SL_CHUNK

    a = direction.dot(direction)
    inv_a = 1.0 / a
    ox, oy, oz = origin.x, origin.y, origin.z
    dx, dy, dz = direction.x, direction.y, direction.z
    q_min = a * T_MIN
    n_chunks = k_cap // SL_CHUNK

    def one_sphere(s, best_q, best_i, best_s):
        # sl_ref holds 8 tiles' (5·k_cap) rows (Mosaic wants SMEM block
        # sublane dims divisible by 8); ``row`` picks this tile's.
        cx = sl_ref[row, s]
        cy = sl_ref[row, k_cap + s]
        cz = sl_ref[row, 2 * k_cap + s]
        r2 = sl_ref[row, 3 * k_cap + s]
        gi = sl_ref[row, 4 * k_cap + s].astype(jnp.int32)
        ocx = cx - ox
        ocy = cy - oy
        ocz = cz - oz
        h = dx * ocx + dy * ocy + dz * ocz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = h * h - a * cc
        if fast_disc:       # NaN(disc<0) fails both compares — same accept set
            q = h - jnp.sqrt(disc)
            ok = q > q_min
        else:
            q = h - jnp.sqrt(jnp.maximum(disc, 0.0))
            ok = (disc >= 0.0) & (q > q_min)
        # The full walks visit in ascending table index, where strict < keeps
        # the LOWEST index among bit-equal q ties; the shortlist is re-sorted
        # front-to-back, so the index tie-break must be explicit to stay
        # value-identical (q == NaN/INF cases all fail both arms; a no-hit
        # best_i of -1 can never win the equality arm since gi >= 0).
        better = ok & ((q < best_q) | ((q == best_q) & (gi < best_i)))
        best_q = jnp.where(better, q, best_q)
        best_i = jnp.where(better, gi, best_i)
        best_s = jnp.where(better, s, best_s)
        return best_q, best_i, best_s

    init_q = jnp.where(in_image, INF, 0.0).astype(jnp.float32)
    init_i = jnp.full((TILE_SUB, 128), -1, jnp.int32)
    init_s = jnp.full((TILE_SUB, 128), -1, jnp.int32)
    if k_cap <= SL_WALK_ALL_MAX:
        # Tiny shortlist: the chunked early-out's per-chunk cross-lane reduce +
        # branch costs about what it saves — walk everything unconditionally.
        best_q, best_i, best_s = init_q, init_i, init_s
        for s in range(k_cap):
            best_q, best_i, best_s = one_sphere(s, best_q, best_i, best_s)
    else:
        def cond(carry):
            c, best_q, _, _ = carry
            t_lo = meta_ref[row, 1 + jnp.minimum(c, n_chunks - 1)]
            useful = a * t_lo < best_q
            return (c < n_chunks) & (jnp.max(jnp.where(useful, 1.0, 0.0)) > 0.0)

        def body(carry):
            c, best_q, best_i, best_s = carry
            for j in range(SL_CHUNK):
                best_q, best_i, best_s = one_sphere(
                    c * SL_CHUNK + j, best_q, best_i, best_s)
            return c + 1, best_q, best_i, best_s

        _, best_q, best_i, best_s = jax.lax.while_loop(
            cond, body, (jnp.int32(0), init_q, init_i, init_s))
    best_t = jnp.where(best_q >= INF, INF, best_q * inv_a)
    return best_t, best_i, best_s


# Bit masks for the lowest-set-bit → index extraction (i32; bit 31 unused, so
# each mask WORD holds 31 group bits and stays positive).
_LSB_PATTERNS = tuple(np.int32(p - (1 << 32) if p >= 1 << 31 else p) for p in
                      (0xAAAAAAAA, 0xCCCCCCCC, 0xF0F0F0F0, 0xFF00FF00,
                       0x7FFF0000))
# Per-lane candidate masks are N i32 words of 31 group bits each (word g//31,
# bit g%31). The AUTO group-size rule targets TWO words (62 groups — measured
# best at reference scale, round 3); an explicit pallas_cand_size may go as
# fine as MAX_CAND_WORDS words before the table builder refuses. Extra words
# cost ~2 vector ops each in the word-select/clear chains per walk step, and
# the mask build/remask cost scales with the GROUP COUNT — worthwhile only
# when finer groups cut gathered-sphere bytes materially (replay, dense
# 5,000-sphere scene: straggler 1402 spheres @ gc96 → 1024 @ gc48 → 819 @
# gc32; see scripts/exp_group_ab.py for the hardware verdict).
MAX_CAND_GROUPS = 62
MAX_CAND_WORDS = 6
CAND_UNIT = 16   # the AUTO rule's group-size quantum (explicit sizes may be
                 # any multiple of 8 — the finest gather-chunk sublane count)


def _cand_chunk(gc: int) -> int:
    """Gather-chunk size (spheres per one-hot matmul block) for candidate
    group size ``gc``: full GROUP blocks when aligned, else the largest of
    16/8 dividing gc. The chunk is the sphere-sublane dim of the per-step
    register tile, so the tree-reduce needs it to be a power of two."""
    if gc % GROUP == 0:
        return GROUP
    return CAND_UNIT if gc % CAND_UNIT == 0 else 8


def _lsb_index(lsb):
    """Index of the single set bit of ``lsb`` (i32, bits 0..30): 5-step binary
    test — Mosaic-safe (int32 only; no u32↔f32 casts, no count ops)."""
    idx = jnp.zeros(lsb.shape, jnp.int32)
    for k, pat in enumerate(_LSB_PATTERNS):
        idx = idx | jnp.where((lsb & pat) != 0, jnp.int32(1 << k), 0)
    return idx


# Popularity-thresholded pre-brute: groups whose candidate bit is set on more
# than this fraction of the tile's lanes are tested tile-wide via the SMEM
# scalar stream (0.0092 ns/pair) BEFORE the per-lane walk, with their bits
# explicitly cleared — so the straggler lane's walk shrinks by every popular
# group. Clearing is the load-bearing difference from the round-2 "seed by
# bruting group 0" negative (−3%): seeding pruned best_q but left the bits
# set (a group entered ahead of best stays entered — t_near ≈ 0 on the
# ground), so no walk step was saved. MEASURED NEGATIVE as a default
# (exp_round3b: −26% at the headline, −25% at the dense 5000-sphere scene at
# every threshold tried — the n_cand cross-lane popularity reductions plus
# per-group conds cost ≈ 6 µs/tile-iteration, more than the cleared walk
# steps return). Kept as a probe switch; 0.0 disables.
POP_BRUTE_FRAC = 0.0

# Unconditionally brute the first N candidate groups tile-wide (SMEM scalar
# stream) and CLEAR their bits before the walk. Group 0 is the quarantine
# group (ground + oversized spheres, morton-sorted first): nearly every soup
# lane wants it (t_near ≈ 0 on the ground), so clearing it shaves ~1 step
# from every lane including the straggler, at brute cost with zero
# popularity-counting machinery. MEASURED ≈ NEUTRAL at the headline
# (exp_round3c: within noise of ref) and NOT ray-identical on real TPUs —
# interpret-mode images are bit-identical, but on hardware the scalar-stream
# test contracts fma differently from the MXU-gathered test, and the ulp
# flips shift path structure (+2.4% segments) — the same hw-ulp class as
# exact_rng (see PallasRenderer docstring). Keep 0 unless probing.
BRUTE_FIRST_GROUPS = 0

# UNROLL the first K walk steps ahead of the while loop, re-masking against
# the tightened best_q at each schedule point; the while loop only finishes
# straggler tails. Measured (exp_round3c/d/e/f, v5e, ray-identical): K=2
# +5.5%, K=4 +9.5%, K=5..8 plateau ≈ +13% over the pure while loop at the
# headline; K=10/12 regress (typical tiles finish in ≤8 steps — further
# unrolled steps run as harmless-retest waste). The isolation probe
# (_REMASK_REBUILD=False at K=8: 332.4 vs 332.5 Mrays/s) shows the win is
# almost entirely the UNROLLING — unrolled steps keep the 4-array carry
# register-resident and skip the per-iteration cond reduce, where each while
# iteration round-trips the carry through VMEM — the re-mask slab pass
# (~1 µs) is ~free and kept for principled tail pruning (it helps slightly
# on the dense 5000-sphere scene's longer straggler tails). Multi-point
# schedules measured slightly worse than one deep point at BOTH scales
# (round 3 headline; round 4 dense (5,10) −3%). "auto" (the default)
# resolves per compiled scene size in _remask_schedule: big scenes' straggler
# lanes walk ~15 entered groups (vs ~6 at reference scale) and K=10 measured
# +2.3% there (exp_round4_dense.py: 30.5 vs 29.8 Mrays/s paired; K=14 −7%).
# () disables. Any explicit tuple is used as-is (probe scripts, conftest).
REMASK_SCHEDULE = "auto"


def _remask_schedule(n_spheres_padded: int):
    if REMASK_SCHEDULE == "auto":
        return (10,) if n_spheres_padded >= 2048 else (5,)
    return REMASK_SCHEDULE
_REMASK_REBUILD = True   # probe: False = unroll the steps but skip the
                         # rebuild, isolating unroll-vs-remask contributions


class _CandidateWalk:
    """The candidate-group walk's composable pieces, parametrized by explicit
    per-lane ray state — ONE source for the mask build and the walk step, so
    the classic per-segment scheduling (``_intersect_candidates``) and the
    flattened phase-B loop (``PHASEB_FLAT``) are bit-identical by
    construction. Derived per-ray scalars (a, 1/d, q_min) recompute per call;
    within one traced loop body XLA CSEs the duplicates, and across the flat
    loop's iterations o/d change anyway.

    Candidate-group geometry (must mirror prepare_pallas_scene): gc spheres
    per group in chunk-major blocks (chunk = _cand_chunk(gc): GROUP when
    32-aligned, else 16 or 8); unless gc == GROUP (base boxes reused), the
    group AABBs live in extra gaabb columns after [groups | supergroups]."""

    def __init__(self, sph_ref, grp_table, gaabb_ref, n_spheres: int,
                 fast_disc: bool = False):
        self.sph_ref = sph_ref
        self.grp_table = grp_table
        self.gaabb_ref = gaabb_ref
        self.n_spheres = n_spheres
        self.fast_disc = fast_disc
        gc = grp_table.shape[0] // 4
        self.gc = gc
        self.chunk = _cand_chunk(gc)
        self.n_chunks = gc // self.chunk
        n32 = n_spheres // GROUP
        self.n_cand = -(-n_spheres // gc)
        assert self.n_cand <= 31 * MAX_CAND_WORDS
        self.n_words = -(-self.n_cand // 31)
        if gc == GROUP:
            self.cand_off = 0
        else:
            n_super = -(-n32 // SUPER) if n32 >= 4 * SUPER else 0
            self.cand_off = n32 + n_super
        g_pad = grp_table.shape[1] // 3
        # Group ids repeated for the hi|mid|lo column blocks (static concat —
        # no vector modulo, which Mosaic lowers poorly).
        iota_g = jax.lax.broadcasted_iota(jnp.int32, (g_pad, 128), 0)
        self.iota_g3 = jnp.concatenate([iota_g, iota_g, iota_g], axis=0)
        self.iota_k = jax.lax.broadcasted_iota(jnp.int32, (self.chunk, 128), 0)

    def build(self, origin: Vec3, direction: Vec3, best_q, active,
              keep_ties=False):
        """Per-lane candidate bitmasks (slab test per group AABB): ``n_words``
        i32 words per lane, group g in word g//31 bit g%31 (bit 31 of each
        word stays clear so the values remain positive). Bit g set iff group
        g's AABB is entered ahead of the lane's current best hit (a·t_near
        rescale as in _intersect_grouped). ``keep_ties`` (the mid-walk
        re-mask) prunes only strictly-later groups, so an exact
        a·t_near == best_q fp coincidence can never drop a sphere that could
        still win a lower-index q tie. Cross-arithmetic caveat: the slab
        t_near and the quadratic hit q are computed differently, so in the
        measure-zero case where a sphere's hit point lies exactly on its own
        group-box face (the sphere defines that bound AND the ray grazes it)
        an ulp flip could still prune an equal-q lower-index winner —
        REMASK_SCHEDULE bit-identity assumes slab-t(face) ≥ quad-q(hit)/a at
        the shared point, which holds for interior hits by construction
        (boxes are +0-inflated unions of sphere extents, so t_near ≤ t_hit
        geometrically; only exact-graze rounding can invert it)."""
        gaabb_ref = self.gaabb_ref
        a = direction.dot(direction)
        ox, oy, oz = origin.x, origin.y, origin.z
        idx = 1.0 / direction.x
        idy = 1.0 / direction.y
        idz = 1.0 / direction.z
        masks = [jnp.zeros((TILE_SUB, 128), jnp.int32)
                 for _ in range(self.n_words)]
        for g in range(self.n_cand):
            col = self.cand_off + g
            tx1 = (gaabb_ref[0, col] - ox) * idx
            tx2 = (gaabb_ref[3, col] - ox) * idx
            ty1 = (gaabb_ref[1, col] - oy) * idy
            ty2 = (gaabb_ref[4, col] - oy) * idy
            tz1 = (gaabb_ref[2, col] - oz) * idz
            tz2 = (gaabb_ref[5, col] - oz) * idz
            t_near = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                             jnp.minimum(ty1, ty2)),
                                 jnp.minimum(tz1, tz2))
            t_far = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                            jnp.maximum(ty1, ty2)),
                                jnp.maximum(tz1, tz2))
            near_q = a * t_near
            if isinstance(keep_ties, bool):
                ahead = ((near_q <= best_q) if keep_ties
                         else (near_q < best_q))
            else:   # per-lane: strict for fresh-mask lanes, ties for re-mask
                ahead = (near_q < best_q) | (keep_ties & (near_q == best_q))
            useful = (t_far >= t_near) & (t_far > 0.0) & ahead
            bit = jnp.where(useful, jnp.int32(1 << (g % 31)), 0)
            masks[g // 31] = masks[g // 31] | bit
        return tuple(jnp.where(active, m, 0) for m in masks)

    def exhausted(self, masks):
        """Per-lane: no candidate bits left (the walk is done)."""
        live = masks[0]
        for m in masks[1:]:
            live = live | m
        return live == 0

    def step(self, origin: Vec3, direction: Vec3, masks, bq, bi):
        """One candidate step for every lane: extract each lane's lowest-set
        group id tile-wide (word 0 first — ascending group order keeps the
        brute walk's index-ordered tie-keeping), gather ALL rows' candidate
        groups with a single batched matmul (32 per-row matmuls measured 6×
        slower: per-issue overhead + per-row (128,128) accumulator streaming
        dominated), then test per row against register-resident (chunk, 128)
        slices."""
        grp_table = self.grp_table
        chunk, n_chunks, gc = self.chunk, self.n_chunks, self.gc
        n_words = self.n_words
        a = direction.dot(direction)
        ox, oy, oz = origin.x, origin.y, origin.z
        dx, dy, dz = direction.x, direction.y, direction.z
        q_min = a * T_MIN
        fast_disc = self.fast_disc
        # First non-empty word wins (ascending group order keeps the brute
        # walk's index-ordered tie-keeping); ``off`` tracks its 31·i base.
        word = masks[0]
        off = jnp.zeros((TILE_SUB, 128), jnp.int32)
        for i in range(1, n_words):
            nxt = word == 0
            word = jnp.where(nxt, masks[i], word)
            off = jnp.where(nxt, jnp.int32(31 * i), off)
        lsb = word & (-word)
        # Exhausted lanes (all words 0) land on group 0 — a harmless re-test
        # (every sphere lies inside its group box, so the lane either
        # reproduces its old q and loses the strict < tie, or rejects again).
        g_lane = _lsb_index(lsb) + jnp.where(word == 0, 0, off)
        onehot = jnp.concatenate(
            [(self.iota_g3 == g_lane[r:r + 1, :]).astype(jnp.bfloat16)
             for r in range(TILE_SUB)], axis=1)               # (3·g_pad, T·128)

        rows_q = [bq[r:r + 1, :] for r in range(TILE_SUB)]
        rows_i = [bi[r:r + 1, :] for r in range(TILE_SUB)]
        # One matmul per chunk of the candidate group (chunk-major table
        # rows), reusing the step's one-hot — keeps the accumulator at
        # (4·chunk, T·128) regardless of gc. All rows are tested
        # unconditionally: a per-row lax.cond captures the accumulator as a
        # branch operand and round-trips it through VMEM 32× per step
        # (measured 5×).
        rows_per_chunk = 4 * chunk
        for c in range(n_chunks):
            acc = jnp.dot(
                grp_table[c * rows_per_chunk:(c + 1) * rows_per_chunk, :],
                onehot, preferred_element_type=jnp.float32)   # (4·chunk, T·128)
            for r in range(TILE_SUB):
                sl = slice(r * 128, (r + 1) * 128)
                cx = acc[0 * chunk:1 * chunk, sl]
                cy = acc[1 * chunk:2 * chunk, sl]
                cz = acc[2 * chunk:3 * chunk, sl]
                r2 = acc[3 * chunk:4 * chunk, sl]
                # Same test arithmetic as _intersect_grouped.one_sphere, with
                # the row's ray data broadcast over the chunk sublane-spheres.
                ocx = cx - ox[r:r + 1, :]
                ocy = cy - oy[r:r + 1, :]
                ocz = cz - oz[r:r + 1, :]
                h = (dx[r:r + 1, :] * ocx + dy[r:r + 1, :] * ocy
                     + dz[r:r + 1, :] * ocz)
                cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
                disc = h * h - a[r:r + 1, :] * cc
                if fast_disc:   # NaN(disc<0) > q_min is false — same reject
                    q = h - jnp.sqrt(disc)
                    ok = q > q_min[r:r + 1, :]
                else:
                    q = h - jnp.sqrt(jnp.maximum(disc, 0.0))
                    ok = (disc >= 0.0) & (q > q_min[r:r + 1, :])
                qv = jnp.where(ok, q, INF)
                iv = (g_lane[r:r + 1, :] * gc + (c * chunk)
                      + self.iota_k)                          # (chunk, 128)
                # Tree-reduce over the sphere sublanes; strict < keeps the
                # lower-k (earlier) sphere on ties, and ascending chunk order
                # keeps earlier chunks, matching the brute walk's order.
                w = chunk
                while w > 1:
                    w //= 2
                    take = qv[w:2 * w] < qv[:w]
                    qv = jnp.where(take, qv[w:2 * w], qv[:w])
                    iv = jnp.where(take, iv[w:2 * w], iv[:w])
                # Explicit lower-index tie-break: the pre-brute may have
                # visited HIGHER-index groups already, so ascending visit
                # order alone no longer implies index-ordered tie-keeping.
                better = (qv < rows_q[r]) | ((qv == rows_q[r])
                                             & (iv < rows_i[r]))
                rows_q[r] = jnp.where(better, qv, rows_q[r])
                rows_i[r] = jnp.where(better, iv, rows_i[r])
        # Rebuild tile arrays by concatenation (dynamic_update_slice has no
        # Mosaic lowering on this jax version); clearing the consumed bit is a
        # tile-wide no-op on exhausted lanes (0 & -1 == 0). Word i clears its
        # lsb iff every lower word is empty (i.e. it was the selected word).
        # NOTE: re-ANDing a fresh best-q-pruned mask here was measured 13%
        # SLOWER (494 vs 436 ms at 1080p/16spp) — the per-step slab
        # recompute's SMEM scalar traffic exceeds what pruning saves, because
        # the while loop is bound by the straggler LANE's candidate count,
        # which pruning rarely shortens.
        new_masks = [masks[0] & (masks[0] - 1)]
        lower_zero = masks[0] == 0
        for i in range(1, n_words):
            new_masks.append(jnp.where(lower_zero,
                                       masks[i] & (masks[i] - 1), masks[i]))
            lower_zero = lower_zero & (masks[i] == 0)
        return (tuple(new_masks), jnp.concatenate(rows_q, axis=0),
                jnp.concatenate(rows_i, axis=0))

    def step_multi(self, origin: Vec3, direction: Vec3, masks, bq, bi,
                   n_steps: int):
        """``n_steps`` candidate steps for every lane with ONE MXU gather
        per chunk instead of ``n_steps``: the walk's visit ORDER is a pure
        function of the masks (mask evolution never reads q — lsb-pop per
        step), so all n group ids per lane are extracted up front, their
        one-hots concatenated along the lane axis, and each chunk's n
        gathers become a single (4·chunk, 3·g_pad)×(3·g_pad, n·T·128)
        matmul. Bit-identical to ``n_steps`` chained ``step`` calls
        (pinned in tests/test_flat_walk.py): the carried (q, i) is the
        LEXICOGRAPHIC MIN over the visit set — the explicit lower-index
        tie-break makes every compare order-independent, the within-chunk
        tree-reduce keeps the lower-k sublane on q ties, and fast_disc's
        NaN q rejects before the compare — so merging steps cannot change
        the winner. Total acc/one-hot bytes are unchanged; the win, if
        any, is issue overhead: one weights-load + wide-N matmul per chunk
        and one mask-word select pass per step without interleaved
        matmul/reduce dependencies."""
        grp_table = self.grp_table
        chunk, n_chunks, gc = self.chunk, self.n_chunks, self.gc
        n_words = self.n_words
        a = direction.dot(direction)
        ox, oy, oz = origin.x, origin.y, origin.z
        dx, dy, dz = direction.x, direction.y, direction.z
        q_min = a * T_MIN
        fast_disc = self.fast_disc
        g_lanes = []
        for _ in range(max(n_steps, 1)):
            word = masks[0]
            off = jnp.zeros((TILE_SUB, 128), jnp.int32)
            for i in range(1, n_words):
                nxt = word == 0
                word = jnp.where(nxt, masks[i], word)
                off = jnp.where(nxt, jnp.int32(31 * i), off)
            lsb = word & (-word)
            g_lanes.append(_lsb_index(lsb)
                           + jnp.where(word == 0, 0, off))
            new_masks = [masks[0] & (masks[0] - 1)]
            lower_zero = masks[0] == 0
            for i in range(1, n_words):
                new_masks.append(jnp.where(lower_zero,
                                           masks[i] & (masks[i] - 1),
                                           masks[i]))
                lower_zero = lower_zero & (masks[i] == 0)
            masks = tuple(new_masks)
        onehot = jnp.concatenate(
            [(self.iota_g3 == g[r:r + 1, :]).astype(jnp.bfloat16)
             for g in g_lanes for r in range(TILE_SUB)],
            axis=1)                                # (3·g_pad, n·T·128)
        rows_q = [bq[r:r + 1, :] for r in range(TILE_SUB)]
        rows_i = [bi[r:r + 1, :] for r in range(TILE_SUB)]
        rows_per_chunk = 4 * chunk
        for c in range(n_chunks):
            acc = jnp.dot(
                grp_table[c * rows_per_chunk:(c + 1) * rows_per_chunk, :],
                onehot, preferred_element_type=jnp.float32)
            for j in range(max(n_steps, 1)):
                for r in range(TILE_SUB):
                    sl = slice((j * TILE_SUB + r) * 128,
                               (j * TILE_SUB + r + 1) * 128)
                    cx = acc[0 * chunk:1 * chunk, sl]
                    cy = acc[1 * chunk:2 * chunk, sl]
                    cz = acc[2 * chunk:3 * chunk, sl]
                    r2 = acc[3 * chunk:4 * chunk, sl]
                    ocx = cx - ox[r:r + 1, :]
                    ocy = cy - oy[r:r + 1, :]
                    ocz = cz - oz[r:r + 1, :]
                    h = (dx[r:r + 1, :] * ocx + dy[r:r + 1, :] * ocy
                         + dz[r:r + 1, :] * ocz)
                    cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
                    disc = h * h - a[r:r + 1, :] * cc
                    if fast_disc:
                        q = h - jnp.sqrt(disc)
                        ok = q > q_min[r:r + 1, :]
                    else:
                        q = h - jnp.sqrt(jnp.maximum(disc, 0.0))
                        ok = (disc >= 0.0) & (q > q_min[r:r + 1, :])
                    qv = jnp.where(ok, q, INF)
                    iv = (g_lanes[j][r:r + 1, :] * gc + (c * chunk)
                          + self.iota_k)
                    w = chunk
                    while w > 1:
                        w //= 2
                        take = qv[w:2 * w] < qv[:w]
                        qv = jnp.where(take, qv[w:2 * w], qv[:w])
                        iv = jnp.where(take, iv[w:2 * w], iv[:w])
                    better = (qv < rows_q[r]) | ((qv == rows_q[r])
                                                 & (iv < rows_i[r]))
                    rows_q[r] = jnp.where(better, qv, rows_q[r])
                    rows_i[r] = jnp.where(better, iv, rows_i[r])
        return (masks, jnp.concatenate(rows_q, axis=0),
                jnp.concatenate(rows_i, axis=0))


def _intersect_candidates(origin: Vec3, direction: Vec3, sph_ref, grp_table,
                          gaabb_ref, active, n_spheres: int,
                          fast_disc: bool = False):
    """Per-lane candidate-group walk — the sublinear alternative to
    ``_intersect_grouped`` (capability twin of the reference's per-thread BVH
    traversal, raytrace.wgsl:313-346, re-shaped for the VPU/MXU).

    Every lane slab-tests all group AABBs once and packs the hits into an i32
    bitmask, then walks ONLY its own candidate groups: per tile sublane-row and
    candidate step, the lane's group id selects a one-hot column and one MXU
    matmul gathers that group's GROUP-sphere block (exact f32 via a bf16
    hi/mid/lo split summed by the matmul's f32 accumulator) as (GROUP, 128)
    register tiles — spheres on sublanes × the row's 128 rays on lanes. The
    sphere test itself is the same arithmetic as ``_intersect_grouped`` (q-space
    carry, strict-< tie-keeping with ascending visit order), so results are
    value-identical; only the visit SET differs, and the slab test is
    conservative (a hittable sphere's group box is always entered).

    Effective tests drop from n_spheres to ~(mean groups entered)·gc per
    segment even for bounce-incoherent rays, where tile-unanimous culling
    saves nothing (measured ~5%).
    """
    walk = _CandidateWalk(sph_ref, grp_table, gaabb_ref, n_spheres,
                          fast_disc=fast_disc)
    a = direction.dot(direction)
    inv_a = 1.0 / a
    ox, oy, oz = origin.x, origin.y, origin.z
    dx, dy, dz = direction.x, direction.y, direction.z
    q_min = a * T_MIN
    gc, n_cand, n_words = walk.gc, walk.n_cand, walk.n_words

    def build_mask(best_q, keep_ties=False):
        return walk.build(origin, direction, best_q, active,
                          keep_ties=keep_ties)

    masks = build_mask(jnp.full((TILE_SUB, 128), INF, jnp.float32))

    best_q = jnp.full((TILE_SUB, 128), INF, jnp.float32)
    best_i = jnp.full((TILE_SUB, 128), -1, jnp.int32)

    # ---- pre-brute stages ------------------------------------------------
    # Visit order is no longer globally index-ascending once some groups run
    # first, so BOTH paths break exact-q ties with an explicit
    # lower-global-index arm (same device arithmetic → identical q bits →
    # value-identical results; ties are real only for duplicate geometry).
    def one_sphere_tb(s, bq, bi):
        """SMEM scalar-stream sphere test (== _intersect_grouped's) with
        the explicit index tie-break."""
        cx = sph_ref[0, s]
        cy = sph_ref[1, s]
        cz = sph_ref[2, s]
        r2 = sph_ref[3, s]
        ocx = cx - ox
        ocy = cy - oy
        ocz = cz - oz
        h = dx * ocx + dy * ocy + dz * ocz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = h * h - a * cc
        if fast_disc:
            q = h - jnp.sqrt(disc)
            ok = q > q_min
        else:
            q = h - jnp.sqrt(jnp.maximum(disc, 0.0))
            ok = (disc >= 0.0) & (q > q_min)
        better = ok & ((q < bq) | ((q == bq) & (s < bi)))
        return jnp.where(better, q, bq), jnp.where(better, s, bi)

    def brute_group(g):
        def run(c):
            bq, bi = c
            for k in range(gc):
                s = g * gc + k
                if s < n_spheres:   # tail groups pad past the SMEM table
                    bq, bi = one_sphere_tb(s, bq, bi)
            return bq, bi
        return run

    def clear_bit(masks, g, clear):
        return tuple(m & clear if i == g // 31 else m
                     for i, m in enumerate(masks))

    if BRUTE_FIRST_GROUPS > 0:
        # Unconditional: the leading (quarantine) groups are wanted by nearly
        # every lane; bruting them via the scalar stream and CLEARING their
        # bits shortens every lane's walk, straggler included.
        for g in range(min(BRUTE_FIRST_GROUPS, n_cand)):
            best_q, best_i = brute_group(g)((best_q, best_i))
            masks = clear_bit(masks, g, np.int32(~(1 << (g % 31))))

    if POP_BRUTE_FRAC > 0.0:
        thresh = np.float32(POP_BRUTE_FRAC * TILE)
        for g in range(BRUTE_FIRST_GROUPS, n_cand):
            bit = np.int32(1 << (g % 31))
            pop = jnp.sum(jnp.where((masks[g // 31] & bit) != 0, 1.0, 0.0))
            do = pop > thresh
            # Tiny cond carry (the two result arrays) — the allowed pattern.
            best_q, best_i = jax.lax.cond(do, brute_group(g), lambda c: c,
                                          (best_q, best_i))
            # EXPLICITLY clear the bruted group's bit on every lane — pruning
            # via best_q alone never clears it (entered-ahead-of-best stays
            # true, e.g. t_near ≈ 0 on the ground), which is why the round-2
            # seeding probe saved no walk steps.
            clear = jnp.where(do, np.int32(~(1 << (g % 31))), np.int32(-1))
            masks = clear_bit(masks, g, clear)

    def walk_cond(carry):
        live = carry[0][0]
        for m in carry[0][1:]:
            live = live | m
        return jnp.max(live) > 0

    def walk_body(carry):
        masks, bq, bi = carry
        return walk.step(origin, direction, masks, bq, bi)

    carry = (masks, best_q, best_i)
    steps_done = 0
    for r_at in _remask_schedule(n_spheres):
        # Unrolled steps up to each schedule point, then an unconditional
        # re-mask against the tightened best_q — hoisted OUT of the while
        # loop so no operands round-trip VMEM per iteration (the round-2
        # per-step re-mask wall). Groups no surviving lane can improve in
        # drop out before the while loop, whose trip count the straggler
        # lane bounds.
        for _ in range(r_at - steps_done):
            carry = walk_body(carry)
        steps_done = r_at
        if _REMASK_REBUILD:
            ms, bq, bi = carry
            fresh = build_mask(bq, keep_ties=True)
            carry = (tuple(m & f for m, f in zip(ms, fresh)), bq, bi)
    _, best_q, best_i = jax.lax.while_loop(walk_cond, walk_body, carry)
    best_t = jnp.where(best_q >= INF, INF, best_q * inv_a)
    if _DEBUG_DOUBLE_MASKBUILD:
        # Second slab build against an INF-valued but structurally distinct
        # best_q (ox·1e-38 ≈ 0 at runtime, so every compare matches the real
        # build's); the i32 word sum folds into best_t at 1e-30 (≤ ~1e-20
        # perturbation — below any tie that isn't already measure-zero).
        m2 = build_mask(jnp.full((TILE_SUB, 128), INF, jnp.float32)
                        + ox * 1e-38)
        extra = m2[0].astype(jnp.float32)
        for m in m2[1:]:
            extra = extra + m.astype(jnp.float32)
        best_t = best_t + extra * 1e-30
    return best_t, best_i


def _intersect_triangles_scalar(origin: Vec3, direction: Vec3, tri_ref,
                                n_tris: int, index_offset: int, best_t, best_i,
                                unroll: int = 4):
    """Brute scalar loop over triangles (Möller–Trumbore), same
    register-resident style as the sphere loop. ``tri_ref``: SMEM (10, T) rows =
    ax..cz, valid(>0). Winner indices are offset past the sphere table so the
    combined attribute gather resolves them."""
    ox, oy, oz = origin.x, origin.y, origin.z
    dx, dy, dz = direction.x, direction.y, direction.z

    def one_tri(s, best_t, best_i):
        ax_, ay_, az_ = tri_ref[0, s], tri_ref[1, s], tri_ref[2, s]
        e1x = tri_ref[3, s] - ax_
        e1y = tri_ref[4, s] - ay_
        e1z = tri_ref[5, s] - az_
        e2x = tri_ref[6, s] - ax_
        e2y = tri_ref[7, s] - ay_
        e2z = tri_ref[8, s] - az_
        valid = tri_ref[9, s]
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = px * e1x + py * e1y + pz * e1z
        inv_det = 1.0 / det
        tx = ox - ax_
        ty = oy - ay_
        tz = oz - az_
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        better = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0)
                  & (u + v <= 1.0) & (t > T_MIN) & (valid > 0.0) & (t < best_t))
        best_t = jnp.where(better, t, best_t)
        best_i = jnp.where(better, s + index_offset, best_i)
        return best_t, best_i

    def body(k, carry):
        bt, bi = carry
        for j in range(unroll):
            bt, bi = one_tri(k * unroll + j, bt, bi)
        return bt, bi

    assert n_tris % unroll == 0
    return jax.lax.fori_loop(0, n_tris // unroll, body, (best_t, best_i))


GATHER_BATCHED = False   # A/B probe: one concat one-hot + one matmul instead
                         # of TILE_SUB per-row matmuls (bit-identical outputs)
_DEBUG_DOUBLE_GATHER = False   # timing ablation: run a second, CSE-proof
                               # attribute gather per bounce and fold it in at
                               # 1e-30 weight — the frame-time delta IS the
                               # gather cost (path structure unchanged)
_DEBUG_DOUBLE_DRAWS = False    # timing ablation: a second, CSE-proof
                               # scatter_draws per bounce folded in at 1e-30
                               # (prices the RNG rows; images/trip counts
                               # unchanged at timing precision)
_DEBUG_DOUBLE_FETCH = False    # timing ablation: a second, CSE-proof restart
                               # fetch per phase-B iteration folded into the
                               # counter at 1e-30 — unlike _DEBUG_STATIC_FETCH
                               # this keeps images and trip counts EXACT (the
                               # §15 confound), so the paired frame-time delta
                               # IS the fetch chain's cost
# Round-5 probes: direct double-cost terms for the 70% of t_B that round 4
# priced only by subtraction (VERDICT r4 item 1). All fold at 1e-30 weight
# with 1e-30-perturbed inputs (structurally distinct HLO — XLA CSE is
# syntactic — while every compare/trip count stays identical at runtime).
_DEBUG_DOUBLE_WALK = False      # second FULL candidate walk per phase-B
                                # bounce (mask build + unrolled steps + while
                                # loop); phase-B only (gated on the default
                                # intersect path)
_DEBUG_DOUBLE_MASKBUILD = False # second candidate-mask slab build per
                                # intersect call (the walk's fixed prologue;
                                # walk steps ≈ dwalk − 2·dmask at the shipped
                                # REMASK_SCHEDULE, which rebuilds once)
_DEBUG_DOUBLE_SCATTER = False   # second shade.scatter per bounce (all three
                                # material branches dense: normalize/refract/
                                # Schlick chain) — both phases
_DEBUG_DOUBLE_HARVEST = False   # second dying-lane harvest (gamma + per-half
                                # routing selects) per phase-B iteration
_DEBUG_DOUBLE_RAYGEN = False    # second primary-ray build per phase-A sample
                                # (NDC + basis + normalize, jitter math
                                # included via a lane-varying synthetic
                                # jitter; no extra RNG draws — the hw PRNG is
                                # stateful, so re-drawing would shift streams)
_DEBUG_DOUBLE_STEP = False      # FLAT walk only: a second FLAT_WALK_STEPS
                                # chain of cwalk.step per iteration, re-run
                                # from the iteration's ORIGINAL walk state
                                # with origin +1e-30 (identical compares and
                                # visit order; results folded at 1e-30).
                                # Prices the candidate-step share of t_iter.
# _DEBUG_DOUBLE_FETCH / _DEBUG_DOUBLE_HARVEST / _DEBUG_DOUBLE_MASKBUILD also
# hook body_once_flat (round 5): same CSE-proof constructions as the nested
# body, so one battery script serves both families.
# Round-5 phase-A attribution probes (VERDICT r4 item 4: the 45 ms "floor"
# was an all-ablated aggregate; these price its named terms DIRECTLY):
_DEBUG_DOUBLE_SLWALK = False    # second primary-shortlist walk per phase-A
                                # sample (origin +1e-30: every slab/sphere
                                # compare and early-out trip count matches)
_DEBUG_DOUBLE_SLGATHER = False  # second shortlist-local attribute gather
                                # (s_loc−1 one-hot defeats CSE, same op count)
_DEBUG_DOUBLE_HITMATH = False   # second post-intersect geometry chain
                                # (position, normal normalize, front-face dot,
                                # sky gradient, emissive add), inputs +1e-30


def _gather_attrs(best_i, attr_table, n_spheres_padded: int):
    """Winning-primitive attributes for every ray via one-hot MXU matmuls.

    ``attr_table`` is the combined (N_ATTR, S+T) bf16 table (centers/normals
    hi/lo + materials hi/lo). One (S, 128) one-hot + one matmul per ray
    sublane-row (TILE_SUB matmuls per bounce; the one-hot builds, not the
    matmuls, dominate the cost). Returns ``(center_or_normal: Vec3, mats: list
    of N_MAT arrays)`` in f32, all (TILE_SUB, 128); miss lanes (best_i < 0)
    come back zero.
    """
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (n_spheres_padded, 128), 0)
    if GATHER_BATCHED:
        onehot = jnp.concatenate(
            [(iota_s == best_i[r:r + 1, :]).astype(jnp.bfloat16)
             for r in range(TILE_SUB)], axis=1)                 # (S, T·128)
        acc = jnp.dot(attr_table, onehot,
                      preferred_element_type=jnp.float32)       # (N_ATTR, T·128)

        def assemble(row):
            return jnp.concatenate(
                [acc[row:row + 1, r * 128:(r + 1) * 128]
                 for r in range(TILE_SUB)], axis=0)             # (T, 128)
    else:
        outs = []
        for r in range(TILE_SUB):
            onehot = (iota_s == best_i[r:r + 1, :]).astype(jnp.bfloat16)  # (S, 128)
            outs.append(jnp.dot(attr_table, onehot,
                                preferred_element_type=jnp.float32))  # (N_ATTR, 128)

        def assemble(row):
            return jnp.concatenate([outs[r][row:row + 1, :]
                                    for r in range(TILE_SUB)], axis=0)  # (T, 128)

    center = Vec3(*(assemble(_C_HI + k) + assemble(_C_LO + k) for k in range(3)))
    mats = [assemble(_M_HI + k) + assemble(_M_LO + k) for k in range(N_MAT)]
    return center, mats


def _render_kernel(cam_ref, seed_ref, sph_ref, gaabb_ref, tri_ref, attr_ref,
                   grp_ref, out_r_ref, out_g_ref, out_b_ref, out_depth_ref,
                   out_seg_ref, *, config: RenderConfig, n_spheres_padded: int,
                   n_tris_padded: int, exact_rng: bool, persistent: bool = True,
                   normalize: bool = True, fuse: int = 1,
                   has_emissive: bool = True, n_tiles_local=None, sl_ref=None,
                   slmeta_ref=None, slattr_ref=None, st_ref=None,
                   sppmap_ref=None):
    assert fuse == 1 or st_ref is not None, "block fusion is phase-split only"
    tile_id = pl.program_id(0)

    # ---- per-tile pixel coordinates -------------------------------------------
    # Each tile is a SQUARE 64×64 pixel block (TILE = 4096): a row-strip tile
    # would span 2+ full image rows, giving its rays a panoramic frustum that
    # defeats group culling; a square block's primary rays share ~3° of FOV and
    # skip most of the scene. Block tiles are ordered (by, bx) row-major over a
    # padded block grid; outputs get un-shuffled back to scanline order outside
    # the kernel (unshuffle_blocks).
    # seed_ref row: [frame_seed, block_offset, sample_offset, nbx] — offsets are
    # nonzero when this kernel renders one shard of a multi-chip frame.
    block_offset = seed_ref[0, 1].astype(jnp.int32)
    sample_offset = seed_ref[0, 2]
    nbx = seed_ref[0, 3].astype(jnp.int32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (TILE_SUB, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_SUB, 128), 1)
    # With block fusion (fuse > 1, phase-split only) one kernel instance
    # renders ``fuse`` consecutive pixel blocks; half h's geometry lives at
    # index h of the per-half lists below. fuse == 1 reduces to the original
    # single-block program.
    block = block_offset + tile_id * fuse
    r = sub * 128 + lane                       # 0..4095 within the block
    width_f = cam_ref[0, C_WIDTH]
    width_i = width_f.astype(jnp.int32)
    height_i = cam_ref[0, C_HEIGHT].astype(jnp.int32)

    def _geom(blk, loc):
        gpx = (blk % nbx) * BLOCK_W + (r % BLOCK_W)
        gpy = (blk // nbx) * BLOCK_H + (r // BLOCK_W)
        gin = (gpx < width_i) & (gpy < height_i)
        if n_tiles_local is not None:
            # Fused-grid padding: a padded tail half is beyond this call's
            # local block range. On the sharded path its global coordinates
            # alias the NEXT shard's in-image blocks, so without this mask the
            # half would trace real samples whose segments land in the fused
            # instance's row-0 segment count (which survives the [:n_tiles]
            # crop) — overcounting rays_traced after the psum. Masking by the
            # LOCAL index deactivates the half entirely (and skips its wasted
            # recompute); real halves are untouched (lanes are independent).
            gin = gin & (loc < n_tiles_local)
        # RNG streams stay keyed by the ROW-MAJOR pixel id so images are
        # identical to the XLA renderer regardless of tile shape.
        gpix = gpy * width_i + gpx
        gu = (gpx.astype(jnp.float32) + 0.5) / width_f
        gv = (gpy.astype(jnp.float32) + 0.5) / cam_ref[0, C_HEIGHT]
        return gpx, gpy, gin, gpix, gu, gv

    halves = [_geom(block + h, tile_id * fuse + h) for h in range(fuse)]
    px, py, in_image, pixel_index, u, v = halves[0]

    cam_pos = Vec3(cam_ref[0, C_POS_X], cam_ref[0, C_POS_Y], cam_ref[0, C_POS_Z])
    cam_dir = Vec3(cam_ref[0, C_DIR_X], cam_ref[0, C_DIR_Y], cam_ref[0, C_DIR_Z])
    cam_up = Vec3(cam_ref[0, C_UP_X], cam_ref[0, C_UP_Y], cam_ref[0, C_UP_Z])
    cam_right = Vec3(cam_ref[0, C_RIGHT_X], cam_ref[0, C_RIGHT_Y],
                     cam_ref[0, C_RIGHT_Z])
    scale = cam_ref[0, C_SCALE]
    aspect = cam_ref[0, C_ASPECT]
    far = cam_ref[0, C_FAR]
    fallback_far = far + 10.0 if config.level == 1 else far - 1.0
    frame_seed = seed_ref[0, 0]

    attr_table = attr_ref[:]
    use_candidates = _use_candidate_walk(config, n_spheres_padded,
                                         phase_split=st_ref is not None)
    grp_table = grp_ref[:] if use_candidates else None

    spp = config.samples_per_pixel
    # Adaptive sampling (extension): per-lane sample targets ≤ spp — a lane
    # simply stops once its pixel's target is reached, which the persistent
    # loop supports for free. Without a map, ``target`` is the static spp.
    target = (jnp.minimum(sppmap_ref[0], spp) if sppmap_ref is not None
              else spp)

    def make_provider(sample_vec, pix=None):
        """sample_vec: per-lane sample index (i32 scalar or (TILE_SUB,128))."""
        if exact_rng:
            return ExactRngProvider(pixel_index if pix is None else pix,
                                    sample_vec.astype(jnp.uint32) + sample_offset,
                                    frame_seed)
        return hw_provider

    def raygen(provider, u=None, v=None, jitter=None):
        """Jittered primary ray (random_ray_from_uv, wgsl:139-156).
        ``jitter`` overrides the provider draw (the double-raygen probe must
        not re-draw: the hw PRNG is stateful)."""
        if u is None:
            u, v = halves[0][4], halves[0][5]
        if jitter is not None:
            ju, jv = jitter
        elif "no_jitter" in _DEBUG_PHASEA:  # timing probe: centered rays
            ju = jv = jnp.float32(0.5)
        else:
            ju, jv = provider.jitter()
        h_px = cam_ref[0, C_HEIGHT]
        w_px = h_px * aspect
        ndc_x = (u * 2.0 - 1.0) + (ju - 0.5) / w_px
        ndc_y = (1.0 - v * 2.0) + (jv - 0.5) / h_px
        d = (cam_dir + cam_right.scale(ndc_x * aspect * scale)
             + cam_up.scale(ndc_y * scale)).normalize()
        o = Vec3(jnp.broadcast_to(cam_pos.x, d.x.shape),
                 jnp.broadcast_to(cam_pos.y, d.y.shape),
                 jnp.broadcast_to(cam_pos.z, d.z.shape))
        if config.defocus:
            lu, lv = provider.lens()
            lens_r = cam_ref[0, C_APERTURE] * 0.5
            rr = lens_r * jnp.sqrt(lu)
            if exact_rng:
                # Bit-comparable with kernels.raygen (jnp trig); the fast path
                # keeps the ~0.1%-error approximations.
                theta = (2.0 * jnp.pi) * lv
                lx = rr * jnp.cos(theta)
                ly = rr * jnp.sin(theta)
            else:
                lx = rr * _fast_cos2pi(lv)
                ly = rr * _fast_sin2pi(lv)
            focal = o + d.scale(cam_ref[0, C_FOCUS])
            o = o + cam_right.scale(lx) + cam_up.scale(ly)
            d = (focal - o).normalize()
        return o, d

    fast_disc = getattr(config, "pallas_fast_disc", False)

    def intersect_full(o, d, active):
        if use_candidates:
            return _intersect_candidates(o, d, sph_ref, grp_table, gaabb_ref,
                                         active, n_spheres_padded,
                                         fast_disc=fast_disc)
        return _intersect_grouped(o, d, sph_ref, gaabb_ref, active,
                                  n_spheres_padded, fast_disc=fast_disc)

    def bounce_core(o, d, active, b_vec, provider, ray_color, radiance,
                    first_depth, intersect_fn=None, slattr_h=0,
                    hit_result=None):
        """One path segment for every lane: intersect, sky/emissive radiance,
        scatter. Returns the post-segment ray state plus hit/continue masks.
        ``b_vec`` may be a scalar (classic per-sample loop) or per-lane.
        ``intersect_fn`` may return a third value — the LOCAL shortlist slot
        — in which case attributes gather from the per-block shortlist attr
        table (bit-identical rows, a ~16× narrower one-hot). ``hit_result``
        short-circuits the intersection entirely with a precomputed (t, idx)
        — the flattened phase-B loop runs the walk OUTSIDE this function and
        injects its result, reusing the post-intersect program verbatim."""
        if hit_result is not None:
            res = hit_result
        elif "no_intersect" in _DEBUG_PHASEA:  # timing probe: all rays miss
            res = (jnp.full_like(o.x, INF), jnp.zeros_like(o.x, jnp.int32))
        else:
            res = (intersect_fn or intersect_full)(o, d, active)
        t, idx = res[0], res[1]
        s_loc = res[2] if len(res) == 3 else None
        if (_DEBUG_DOUBLE_SLWALK and intersect_fn is not None
                and hit_result is None):
            # Second primary-shortlist walk from a 1e-30-shifted origin (below
            # f32 resolution at scene scale: identical compares, early-out
            # trips, and overflow-cond arm). Masks INF out of the fold.
            eps3 = Vec3.full((), 1e-30, 1e-30, 1e-30)
            res2 = intersect_fn(o + eps3, d, active)
            t2w, i2w = res2[0], res2[1]
            radiance = radiance + Vec3(jnp.where(t2w >= INF, 0.0, t2w),
                                       i2w.astype(jnp.float32),
                                       jnp.zeros_like(t2w)).scale(1e-30)
        if _DEBUG_DOUBLE_WALK and intersect_fn is None and hit_result is None:
            # Second full walk from a 1e-30-shifted origin: every slab/sphere
            # compare resolves identically (the shift is below f32 resolution
            # at scene scale), so masks and trip counts match the first
            # walk's; the fold masks INF (= f32::MAX — 1e-30·MAX is NOT
            # small) out of t2.
            eps3 = Vec3.full((), 1e-30, 1e-30, 1e-30)
            t2, i2 = intersect_full(o + eps3, d, active)[:2]
            radiance = radiance + Vec3(jnp.where(t2 >= INF, 0.0, t2),
                                       i2.astype(jnp.float32),
                                       jnp.zeros_like(t2)).scale(1e-30)
        if n_tris_padded:
            t, idx = _intersect_triangles_scalar(
                o, d, tri_ref, n_tris_padded, n_spheres_padded, t, idx)
        miss = t >= INF
        first_depth = jnp.where((b_vec == 0) & active, t, first_depth)
        radiance = Vec3.where(active & miss,
                              radiance + ray_color * background_gradient(d),
                              radiance)
        active_hit = active & ~miss

        if s_loc is not None and not n_tris_padded:
            # Shortlist-local gather: same bf16 hi/lo rows for the winner's
            # GLOBAL column, selected by its local slot — exact, and the
            # one-hot build runs over k_pad (≈32) columns instead of S+T.
            center, mats = _gather_attrs(s_loc, slattr_ref[slattr_h],
                                         slattr_ref.shape[-1])
            if _DEBUG_DOUBLE_SLGATHER:
                c2, m2 = _gather_attrs(jnp.maximum(s_loc - 1, 0),
                                       slattr_ref[slattr_h],
                                       slattr_ref.shape[-1])
                radiance = radiance + Vec3(c2.x + m2[0], c2.y + m2[1],
                                           c2.z + m2[2]).scale(1e-30)
        else:
            center, mats = _gather_attrs(idx, attr_table,
                                         n_spheres_padded + n_tris_padded)
        if _DEBUG_DOUBLE_GATHER:
            # Perturbed index defeats CSE; 1e-30 weight leaves images and
            # control flow untouched at timing precision.
            c2, m2 = _gather_attrs(jnp.maximum(idx - 1, 0), attr_table,
                                   n_spheres_padded + n_tris_padded)
            radiance = radiance + Vec3(c2.x + m2[0], c2.y + m2[1],
                                       c2.z + m2[2]).scale(1e-30)
        safe_t = jnp.where(miss, 0.0, t)
        position = o + d.scale(safe_t)
        # Rows 0-2 of the attr table hold the sphere CENTER for spheres and
        # the precomputed unit NORMAL for triangles.
        sphere_normal = (position - center).normalize()
        if n_tris_padded:
            is_tri = idx >= n_spheres_padded
            normal = Vec3.where(is_tri, center, sphere_normal)
        else:
            normal = sphere_normal
        normal = Vec3.where(miss, Vec3.full((), 0.0, 1.0, 0.0), normal)
        hit = HitInfo(t=t, miss=miss, position=position, normal=normal,
                      material_id=idx, front_face=d.dot(normal) < 0.0)
        mat = MaterialLanes(
            base_color=Vec3(mats[0], mats[1], mats[2]),
            metallic=mats[3], roughness=mats[4], ior=mats[5],
            specular_transmission=mats[6],
            emissive=Vec3(mats[7], mats[8], mats[9]),
        )
        radiance = Vec3.where(active_hit,
                              radiance + ray_color * mat.emissive, radiance)
        if _DEBUG_DOUBLE_HITMATH and not n_tris_padded:
            # Duplicate the post-intersect geometry/bookkeeping chain with
            # every float input +1e-30 (add, not scale — XLA folds ×1.0 but
            # never add-of-nonzero): position fma, normal normalize, miss
            # select, front-face dot, sky gradient + its radiance merge,
            # emissive merge, first-depth select. Compares may flip on
            # razor-edge lanes; no loop trips depend on them.
            ep = jnp.float32(1e-30)
            ep3 = Vec3.full((), 1e-30, 1e-30, 1e-30)
            st2 = jnp.where(miss, ep, t + ep)
            pos2 = (o + ep3) + d.scale(st2)
            sn2 = (pos2 - (center + ep3)).normalize()
            nrm2 = Vec3.where(miss, Vec3.full((), 0.0, 1.0, 0.0), sn2)
            ff2 = (d + ep3).dot(nrm2) < 0.0
            bg2 = background_gradient(d + ep3)
            sky2 = Vec3.where(active & miss,
                              (ray_color + ep3) + (ray_color + ep3) * bg2,
                              ray_color + ep3)
            em2 = Vec3.where(active_hit,
                             (ray_color + ep3) * (mat.emissive + ep3),
                             ray_color)
            fd2 = jnp.where((b_vec == 0) & active, t + ep, first_depth + ep)
            radiance = radiance + Vec3(
                sky2.x + nrm2.x + jnp.where(ff2, ep, 0.0),
                em2.y + pos2.y, fd2 + sky2.z).scale(1e-30)

        if "no_scatter" in _DEBUG_PHASEA:  # timing probe: rays pass through
            o = Vec3.where(active_hit, hit.position, o)
            return o, d, ray_color, radiance, first_depth, active_hit

        u_metal, u_trans, u_reflect, ball1, ball2 = provider.scatter_draws(b_vec)
        if _DEBUG_DOUBLE_DRAWS:
            # b_vec + 7 shifts the stream (defeats CSE); 1e-30 weight leaves
            # images and control flow untouched at timing precision.
            um2, ut2, ur2, b1_2, b2_2 = provider.scatter_draws(b_vec + 7)
            radiance = radiance + Vec3(um2 + b1_2.x, ut2 + b2_2.y,
                                       ur2 + b1_2.z).scale(1e-30)
        sc = scatter(d, hit, mat, u_metal, u_trans, u_reflect, ball1, ball2,
                     diffuse_mode=config.diffuse_sampling)
        if _DEBUG_DOUBLE_SCATTER:
            # Second scatter with EVERY float input shifted by 1e-30 (adds,
            # not ×(1+ε) — XLA folds mul-by-1.0 but never add-of-nonzero), so
            # the whole normalize/refract/Schlick chain duplicates without a
            # single CSE-able node while every branch compare matches. The
            # direction fold masks by active_hit exactly as the real consumer
            # does — inactive lanes' scatter math can be NaN (parked d = 0 →
            # rsqrt(0)·0), in the real program and in the double.
            ep = jnp.float32(1e-30)
            ep3 = Vec3.full((), 1e-30, 1e-30, 1e-30)
            hit2 = HitInfo(t=hit.t, miss=hit.miss, position=hit.position,
                           normal=hit.normal + ep3,
                           material_id=hit.material_id,
                           front_face=hit.front_face)
            mat2 = MaterialLanes(base_color=mat.base_color + ep3,
                                 metallic=mat.metallic + ep,
                                 roughness=mat.roughness + ep,
                                 ior=mat.ior + ep,
                                 specular_transmission=(
                                     mat.specular_transmission + ep),
                                 emissive=mat.emissive)
            sc2 = scatter(d + ep3, hit2, mat2, u_metal + ep, u_trans + ep,
                          u_reflect + ep, ball1 + ep3, ball2 + ep3,
                          diffuse_mode=config.diffuse_sampling)
            f2 = Vec3.where(active_hit, sc2.direction,
                            Vec3.full((), 0.0, 0.0, 0.0))
            radiance = radiance + Vec3(
                f2.x + sc2.attenuation.x, f2.y + sc2.attenuation.y,
                f2.z + sc2.attenuation.z
                + jnp.where(sc2.absorbed, 1.0, 0.0)).scale(1e-30)

        cont = active_hit & ~sc.absorbed
        ray_color = Vec3.where(cont, ray_color * sc.attenuation, ray_color)
        o = Vec3.where(active_hit, hit.position, o)
        d = Vec3.where(active_hit, sc.direction, d)
        return o, d, ray_color, radiance, first_depth, cont

    n = (TILE_SUB, 128)
    zero2 = jnp.zeros(n, jnp.float32)

    if not exact_rng:
        hw_provider = HwRngProvider(block, sample_offset, frame_seed)

    if st_ref is not None:
        # ---- phase-split sampling -------------------------------------------
        # Bounce 0 of EVERY sample is traced first in a fully coherent pass
        # against this block's host-built primary shortlist (~7 of 512 spheres
        # on the bench scene — kernels/pallas/primary.py), with continuing-path
        # state parked in VMEM scratch; bounces ≥ 1 then run the persistent
        # loop, restarting dead lanes from their pixel's next stored sample via
        # a static one-hot slot fetch (~2% of one loop iteration's op budget —
        # per-lane dynamic indexing has no Mosaic lowering, selects do).
        # Draws stay keyed by (pixel, sample, slot), so exact-RNG images agree
        # with the classic and persistent loops to fma-contraction ulps.
        spp_s = config.samples_per_pixel
        n_slots = fuse * spp_s          # parked slots: half h's sample s at
                                        # slot h·spp+s (fuse == 1: slot = s)
        n_slots_f = jnp.float32(n_slots)
        stored = _st_layout(has_emissive)   # physical parked-state fields
        phys = {f: i for i, f in enumerate(stored)}
        k_cap = sl_ref.shape[-1] // 5   # primary.N_SL_ROWS
        # Row within the 8-tile SMEM block: fused halves use consecutive rows
        # (fuse | 8, so all of a tile's rows land in one 8-row group).
        sl_row0 = jax.lax.rem(tile_id * fuse, 8)

        def make_intersect_primary(h):
            sl_row = sl_row0 + h
            in_img_h = halves[h][2]

            def intersect_primary(o, d, active):
                if slattr_ref is not None:
                    # The host only ships the local attr tables when NO block
                    # overflowed (and the scene has no triangles), so the
                    # overflow cond disappears entirely on this path.
                    return _intersect_shortlist(o, d, sl_ref, slmeta_ref,
                                                sl_row, active & in_img_h,
                                                k_cap, fast_disc=fast_disc)
                # Per-block overflow flag → full walk (tile-uniform scalar
                # branch; the carried operands are just the two result
                # arrays).
                return jax.lax.cond(
                    slmeta_ref[sl_row, 0] > 0.0,
                    lambda: intersect_full(o, d, active),
                    lambda: _intersect_shortlist(o, d, sl_ref, slmeta_ref,
                                                 sl_row, active & in_img_h,
                                                 k_cap,
                                                 fast_disc=fast_disc)[:2])

            return intersect_primary

        def st_write(s, f, val):
            p = phys[f]
            st_ref[pl.ds(s, 1), pl.ds(p * TILE_SUB, TILE_SUB), :] = (
                val[None, :, :])

        def st_read(k, f):  # static k; un-stored radiance planes read as 0
            if f not in phys:
                assert f in (ST_RADX, ST_RADY, ST_RADZ)
                return zero2
            p = phys[f]
            return st_ref[k, p * TILE_SUB:(p + 1) * TILE_SUB, :]

        def harvest_color(died, rad, cr, cg, cb):
            g = linear_to_gamma(rad)
            cr = cr + jnp.where(died, g.x, 0.0)
            cg = cg + jnp.where(died, g.y, 0.0)
            cb = cb + jnp.where(died, g.z, 0.0)
            return cr, cg, cb

        def harvest_depth(mask, fd, dsum):
            depth_fin = jnp.where(fd >= INF, fallback_far, fd)
            return dsum + jnp.where(mask, depth_fin, 0.0)

        def make_phase_a(h):
            _, _, in_img_h, pix_h, u_h, v_h = halves[h]
            target_h = (jnp.minimum(sppmap_ref[h], spp)
                        if sppmap_ref is not None else spp)
            ip_h = make_intersect_primary(h)

            def phase_a(s, acc):
                # ``s`` is a traced i32 scalar under fori_loop, a static
                # python int under PHASEA_UNROLL (static slot ⇒ static
                # st_write slices).
                s_arr = jnp.int32(s)
                slot = s + h * spp_s
                cr, cg, cb, dsum, segsum = acc
                act = in_img_h & (s_arr < target_h)
                provider = make_provider(s_arr, pix=pix_h)
                o, d = raygen(provider, u_h, v_h)
                if _DEBUG_DOUBLE_RAYGEN and not config.defocus:
                    # Full second ray build (NDC + basis combine + normalize)
                    # off perturbed uv and a lane-varying synthetic jitter
                    # (keeps the (j−0.5)/w divide chain alive; no provider
                    # draw — defocus would force one, hence the gate).
                    _, d2 = raygen(provider, u_h + 1e-30, v_h + 1e-30,
                                   jitter=(u_h * 1e-30 + 0.5,
                                           v_h * 1e-30 + 0.5))
                    cr = cr + (d2.x + d2.y + d2.z) * 1e-30
                o, d, rc, rad, fd, cont = bounce_core(
                    o, d, act, s_arr * 0, provider,
                    Vec3.full(n, 1.0, 1.0, 1.0), Vec3.full(n, 0.0, 0.0, 0.0),
                    jnp.full(n, INF, jnp.float32), intersect_fn=ip_h,
                    slattr_h=h)
                if config.bounces < 1:
                    cont = cont & False
                died = act & ~cont
                if "no_harvest" not in _DEBUG_PHASEA:
                    cr, cg, cb = harvest_color(died, rad, cr, cg, cb)
                    # DEPTH_IN_A: fd is FINAL after bounce 0 (phase B restarts
                    # at b_lane = 1), so every active sample's depth — parked
                    # or died — accumulates here, in strict sample order.
                    dsum = harvest_depth(act if DEPTH_IN_A else died,
                                         fd, dsum)
                segsum = segsum + (1.0 if COUNT_ITERS
                                   else jnp.where(act, 1.0, 0.0))
                if "no_st" in _DEBUG_PHASEA:  # timing probe: skip parking
                    return cr, cg, cb, dsum, segsum
                park = [(ST_OX, o.x), (ST_OY, o.y), (ST_OZ, o.z),
                        (ST_DX, d.x), (ST_DY, d.y), (ST_DZ, d.z),
                        (ST_RCX, rc.x), (ST_RCY, rc.y), (ST_RCZ, rc.z)]
                if has_emissive:
                    park += [(ST_RADX, rad.x), (ST_RADY, rad.y),
                             (ST_RADZ, rad.z)]
                # Aliveness rides the sid (no ST_W plane): dead slots park
                # sid = n_slots, so alive ⟺ sid < n_slots before AND after
                # compaction (whose dead-tail default is also n_slots).
                if ST_FD in phys:
                    park += [(ST_FD, fd)]
                park += [(ST_SID, jnp.where(
                             cont,
                             (s_arr + h * spp_s).astype(jnp.float32),
                             n_slots_f))]
                for f, val in park:
                    st_write(slot, f, val)
                return cr, cg, cb, dsum, segsum

            return phase_a

        crs, cgs, cbs, dsums = [], [], [], []
        segsum = zero2
        for h in range(fuse):
            pa = make_phase_a(h)
            acc0 = (zero2, zero2, zero2, zero2, segsum)
            if PHASEA_UNROLL:
                acc = acc0
                for s in range(spp_s):
                    acc = pa(s, acc)
            else:
                acc = jax.lax.fori_loop(0, spp_s, pa, acc0)
            cr, cg, cb, dsum, segsum = acc
            crs.append(cr)
            cgs.append(cg)
            cbs.append(cb)
            dsums.append(dsum)

        # Redirect compaction: slot s comes to hold the state of the first
        # ALIVE slot ≥ s (with its true sample id), so phase B's "next sample"
        # is always slot (consumed sid + 1) — no per-lane scanning.
        if "no_compact" not in _DEBUG_PHASEA:
            cur = {f: jnp.zeros(n, jnp.float32) for f in stored}
            cur[ST_SID] = jnp.full(n, n_slots, jnp.float32)
            for s in reversed(range(n_slots)):
                slot = {f: st_read(s, f) for f in stored}
                alive = slot[ST_SID] < n_slots_f
                cur = {f: jnp.where(alive, slot[f], cur[f]) for f in stored}
                for f in stored:
                    p = phys[f]
                    st_ref[s, p * TILE_SUB:(p + 1) * TILE_SUB, :] = cur[f]

        if config.bounces >= 1:
            def fetch(slot_vec):
                # Un-stored fields stay at their defaults: radiance planes are
                # zero for every parked-live slot (see _st_layout), ST_W is
                # derived by callers as sid < n_slots.
                out = [jnp.zeros(n, jnp.float32) for _ in range(N_ST)]
                out[ST_SID] = jnp.full(n, n_slots, jnp.float32)
                if _DEBUG_STATIC_FETCH:
                    # Timing probe (WRONG images, identical trip counts):
                    # sid stays one-hot so control flow is unchanged; the
                    # payload fields read one static slot.
                    for k in range(1, n_slots):
                        m = slot_vec == k
                        out[ST_SID] = jnp.where(m, st_read(k, ST_SID),
                                                out[ST_SID])
                    for f in stored:
                        if f != ST_SID:
                            out[f] = st_read(min(1, n_slots - 1), f)
                    return out
                for k in range(1, n_slots):
                    m = slot_vec == k
                    for f in stored:
                        out[f] = jnp.where(m, st_read(k, f), out[f])
                return out

            def cond(carry):
                # carry[0] is sid_f; alive ⟺ sid < n_slots (no w array).
                return jnp.min(carry[0]) < n_slots_f

            def make_provider_b(slot_vec):
                """Phase-B provider from the lane's parked SLOT id: with
                fusion the exact-RNG stream re-derives (pixel, sample) from
                (half, slot − half·spp) so draws stay keyed exactly as the
                unfused program's (bit-identical images)."""
                if fuse == 1 or not exact_rng:
                    return make_provider(slot_vec)
                pix = halves[0][3]
                samp = slot_vec
                for h in range(1, fuse):
                    m = slot_vec >= h * spp_s
                    pix = jnp.where(m, halves[h][3], pix)
                    samp = jnp.where(m, slot_vec - h * spp_s, samp)
                return make_provider(samp, pix=pix)

            # Carry layout (conditional fields mirror the parked-state cuts):
            #   sid_f, b_lane, o, d, rc, [rad if has_emissive],
            #   [fd if parked], crs, cgs, cbs, [dsums if parked], segsum,
            #   [*masks, bq, bi if PHASEB_FLAT] (the flattened walk's state).
            # ``parked`` ⟺ ST_FD in phys (DEPTH_IN_A=False legacy path).
            carry_fd = ST_FD in phys
            flat_active = _use_flat_walk(n_spheres_padded, use_candidates,
                                         n_tris_padded)
            cwalk = (_CandidateWalk(sph_ref, grp_table, gaabb_ref,
                                    n_spheres_padded, fast_disc=fast_disc)
                     if flat_active else None)

            def route_harvest(died, sid_f, rad, fd, crs, cgs, cbs, dsums):
                """Accumulate a dying lane's radiance (and legacy parked
                depth) into its slot's half — shared by the nested and
                flattened bodies."""
                if fuse == 1:
                    cr0, cg0, cb0 = harvest_color(died, rad, crs[0],
                                                  cgs[0], cbs[0])
                    crs, cgs, cbs = (cr0,), (cg0,), (cb0,)
                    if carry_fd:
                        dsums = (harvest_depth(died, fd, dsums[0]),)
                    return crs, cgs, cbs, dsums
                # Route the dying lane's radiance to its slot's half.
                g = linear_to_gamma(rad)
                if carry_fd:
                    depth_fin = jnp.where(fd >= INF, fallback_far, fd)
                ncr, ncg, ncb, nds = [], [], [], []
                for h in range(fuse):
                    m = (died & (sid_f >= float(h * spp_s))
                         & (sid_f < float((h + 1) * spp_s)))
                    ncr.append(crs[h] + jnp.where(m, g.x, 0.0))
                    ncg.append(cgs[h] + jnp.where(m, g.y, 0.0))
                    ncb.append(cbs[h] + jnp.where(m, g.z, 0.0))
                    if carry_fd:
                        nds.append(dsums[h] + jnp.where(m, depth_fin, 0.0))
                return (tuple(ncr), tuple(ncg), tuple(ncb),
                        tuple(nds) if carry_fd else dsums)

            def pack_carry(sid_f, b_lane, o, d, rc, rad, fd,
                           crs, cgs, cbs, dsums, segsum, walk=()):
                t = (sid_f, b_lane, o, d, rc)
                if has_emissive:
                    t += (rad,)
                if carry_fd:
                    t += (fd,)
                t += (crs, cgs, cbs)
                if carry_fd:
                    t += (dsums,)
                return t + (segsum,) + tuple(walk)

            def unpack_carry(carry):
                it = iter(carry)
                sid_f, b_lane, o, d, rc = (next(it) for _ in range(5))
                # The w plane is derived (alive ⟺ sid < n_slots) and, on
                # non-emissive scenes, the radiance carry is dropped: every
                # live lane's radiance is exactly 0.0 between iterations
                # (_st_layout docstring); a dead lane's stale radiance was
                # never read again anyway (harvest needs ``active``, which
                # never resurrects). With DEPTH_IN_A, fd and the per-half
                # dsums leave the carry too — depth was fully accumulated in
                # phase A, so bounce_core gets a zero dummy (its fd output is
                # unused and DCE'd; phase B never sees b_vec == 0).
                rad = next(it) if has_emissive else Vec3(zero2, zero2, zero2)
                fd = next(it) if carry_fd else zero2
                crs, cgs, cbs = (next(it) for _ in range(3))
                dsums = next(it) if carry_fd else None
                return (sid_f, b_lane, o, d, rc, rad, fd,
                        crs, cgs, cbs, dsums, next(it), tuple(it))

            def body_once(carry):
                (sid_f, b_lane, o, d, rc, rad, fd,
                 crs, cgs, cbs, dsums, segsum, walk_st) = unpack_carry(carry)
                active = sid_f < n_slots_f
                provider = make_provider_b(sid_f.astype(jnp.int32))
                o, d, rc, rad, fd, cont = bounce_core(
                    o, d, active, b_lane, provider, rc, rad, fd)
                cont = cont & (b_lane < config.bounces)
                died = active & ~cont
                crs, cgs, cbs, dsums = route_harvest(died, sid_f, rad, fd,
                                                     crs, cgs, cbs, dsums)
                segsum = segsum + (1.0 if COUNT_ITERS
                                   else jnp.where(active, 1.0, 0.0))
                if _DEBUG_DOUBLE_HARVEST:
                    # Second harvest: gamma (3 sqrt) + the per-half routing
                    # masks and selects, off perturbed inputs (rad + 1e-30;
                    # sid_f + 0.25 — sids are integer-valued, the half bounds
                    # are integers, so every >=/< compare matches exactly).
                    ep3 = Vec3.full((), 1e-30, 1e-30, 1e-30)
                    g2 = linear_to_gamma(rad + ep3)
                    ex = jnp.zeros_like(segsum)
                    sid_p = sid_f + 0.25
                    for h in range(fuse):
                        m2 = (died & (sid_p >= float(h * spp_s))
                              & (sid_p < float((h + 1) * spp_s)))
                        ex = (ex + jnp.where(m2, g2.x, 0.0)
                              + jnp.where(m2, g2.y, 0.0)
                              + jnp.where(m2, g2.z, 0.0))
                    segsum = segsum + ex * 1e-30
                nxt = fetch(sid_f.astype(jnp.int32) + 1)
                if _DEBUG_DOUBLE_FETCH:
                    # +2 (clamped) defeats CSE; summing every fetched plane
                    # into the carried counter at 1e-30 defeats DCE while
                    # leaving counts/images exact at timing precision.
                    x2 = fetch(jnp.minimum(sid_f.astype(jnp.int32) + 2,
                                           jnp.int32(n_slots)))
                    extra = x2[stored[0]]
                    for f in stored[1:]:
                        extra = extra + x2[f]
                    segsum = segsum + extra * 1e-30
                take = died & (nxt[ST_SID] < n_slots_f)
                o = Vec3.where(take, Vec3(nxt[ST_OX], nxt[ST_OY], nxt[ST_OZ]),
                               o)
                d = Vec3.where(take, Vec3(nxt[ST_DX], nxt[ST_DY], nxt[ST_DZ]),
                               d)
                rc = Vec3.where(take,
                                Vec3(nxt[ST_RCX], nxt[ST_RCY], nxt[ST_RCZ]),
                                rc)
                if carry_fd:
                    fd = jnp.where(take, nxt[ST_FD], fd)
                sid_f = jnp.where(died, nxt[ST_SID], sid_f)
                b_lane = jnp.where(cont, b_lane + 1, 1)
                if has_emissive:
                    rad = Vec3.where(
                        take, Vec3(nxt[ST_RADX], nxt[ST_RADY], nxt[ST_RADZ]),
                        rad)
                return pack_carry(sid_f, b_lane, o, d, rc, rad, fd,
                                  crs, cgs, cbs, dsums, segsum, walk_st)

            def body_once_flat(carry):
                """One FLAT iteration: FLAT_WALK_STEPS candidate steps for
                every lane, then the full segment-finish program (sky/hit
                radiance, scatter, harvest, restart fetch, fresh mask) masked
                to lanes whose walk just exhausted. Walking lanes pass
                through the finish section untouched (their ``fin`` mask is
                false everywhere it writes). Value-identical to the nested
                scheduling: same per-lane visit order, same test arithmetic
                (_CandidateWalk), and mid-walk re-masks only ever prune
                groups that cannot change the winner."""
                (sid_f, b_lane, o, d, rc, rad, fd,
                 crs, cgs, cbs, dsums, segsum, walk_st) = unpack_carry(carry)
                masks = walk_st[:cwalk.n_words]
                bq = walk_st[cwalk.n_words]
                bi = walk_st[cwalk.n_words + 1]
                active = sid_f < n_slots_f
                if FLAT_STEP_MERGE and max(FLAT_WALK_STEPS, 1) > 1:
                    masks, bq, bi = cwalk.step_multi(
                        o, d, masks, bq, bi, FLAT_WALK_STEPS)
                else:
                    for _ in range(max(FLAT_WALK_STEPS, 1)):
                        masks, bq, bi = cwalk.step(o, d, masks, bq, bi)
                if _DEBUG_DOUBLE_STEP:
                    # Second step chain from the iteration's ORIGINAL state
                    # (walk_st) with origin +1e-30: same group visit order,
                    # same compares, independent dataflow (CSE-proof).
                    eps3 = Vec3.full((), 1e-30, 1e-30, 1e-30)
                    m2 = walk_st[:cwalk.n_words]
                    q2 = walk_st[cwalk.n_words]
                    i2 = walk_st[cwalk.n_words + 1]
                    for _ in range(max(FLAT_WALK_STEPS, 1)):
                        m2, q2, i2 = cwalk.step(o + eps3, d, m2, q2, i2)
                    segsum = segsum + (jnp.where(q2 >= INF, 0.0, q2)
                                       + i2.astype(jnp.float32)) * 1e-30
                fin = active & cwalk.exhausted(masks)
                inv_a = 1.0 / d.dot(d)
                t_best = jnp.where(bq >= INF, INF, bq * inv_a)
                provider = make_provider_b(sid_f.astype(jnp.int32))
                o, d, rc, rad, fd, cont = bounce_core(
                    o, d, fin, b_lane, provider, rc, rad, fd,
                    hit_result=(t_best, bi))
                cont = cont & (b_lane < config.bounces)
                died = fin & ~cont
                crs, cgs, cbs, dsums = route_harvest(died, sid_f, rad, fd,
                                                     crs, cgs, cbs, dsums)
                # A segment counts when it COMPLETES (same totals as the
                # nested body's count-while-active); COUNT_ITERS counts flat
                # iterations — the per-iteration probe semantics.
                segsum = segsum + (1.0 if COUNT_ITERS
                                   else jnp.where(fin, 1.0, 0.0))
                if _DEBUG_DOUBLE_HARVEST:
                    # Same construction as the nested body's probe.
                    ep3 = Vec3.full((), 1e-30, 1e-30, 1e-30)
                    g2 = linear_to_gamma(rad + ep3)
                    ex = jnp.zeros_like(segsum)
                    sid_p = sid_f + 0.25
                    for h in range(fuse):
                        m2 = (died & (sid_p >= float(h * spp_s))
                              & (sid_p < float((h + 1) * spp_s)))
                        ex = (ex + jnp.where(m2, g2.x, 0.0)
                              + jnp.where(m2, g2.y, 0.0)
                              + jnp.where(m2, g2.z, 0.0))
                    segsum = segsum + ex * 1e-30
                nxt = fetch(sid_f.astype(jnp.int32) + 1)
                if _DEBUG_DOUBLE_FETCH:
                    # Same construction as the nested body's probe.
                    x2 = fetch(jnp.minimum(sid_f.astype(jnp.int32) + 2,
                                           jnp.int32(n_slots)))
                    extra = x2[stored[0]]
                    for fpl in stored[1:]:
                        extra = extra + x2[fpl]
                    segsum = segsum + extra * 1e-30
                take = died & (nxt[ST_SID] < n_slots_f)
                o = Vec3.where(take, Vec3(nxt[ST_OX], nxt[ST_OY], nxt[ST_OZ]),
                               o)
                d = Vec3.where(take, Vec3(nxt[ST_DX], nxt[ST_DY], nxt[ST_DZ]),
                               d)
                rc = Vec3.where(take,
                                Vec3(nxt[ST_RCX], nxt[ST_RCY], nxt[ST_RCZ]),
                                rc)
                if carry_fd:
                    fd = jnp.where(take, nxt[ST_FD], fd)
                sid_f = jnp.where(died, nxt[ST_SID], sid_f)
                # Walking lanes keep their bounce counter; finished lanes
                # either advance it (scattered) or restart at 1 (new sample).
                b_lane = jnp.where(cont, b_lane + 1,
                                   jnp.where(died, 1, b_lane))
                if has_emissive:
                    rad = Vec3.where(
                        take, Vec3(nxt[ST_RADX], nxt[ST_RADY], nxt[ST_RADZ]),
                        rad)
                # Fresh masks for every lane starting a new segment — the
                # scattered ray or the restarted sample's parked ray. Lanes
                # that died with no next sample keep their exhausted masks
                # (all-zero) and idle through the loop's tail.
                need_new = cont | take
                bq = jnp.where(need_new, jnp.float32(INF), bq)
                bi = jnp.where(need_new, jnp.int32(-1), bi)
                if FLAT_REMASK:
                    # Per-iteration re-mask: the SAME build call serves fresh
                    # lanes (strict <, bq = INF) and WALKING lanes (ties kept,
                    # masks ANDed — prunes groups the tightened best-q proves
                    # can't win). The nested walk's per-step re-mask wall
                    # (round 2: −13%) does not apply here: there is no
                    # straggler lockstep — pruning shortens every lane's own
                    # remaining walk, and the build is already paid for the
                    # fresh lanes each iteration. Value-identical by the
                    # keep-ties argument (build docstring).
                    walking = active & ~fin
                    fresh = cwalk.build(o, d, bq, need_new | walking,
                                        keep_ties=~need_new)
                    masks = tuple(jnp.where(need_new, f, m & f)
                                  for f, m in zip(fresh, masks))
                else:
                    fresh = cwalk.build(o, d, jnp.full(n, INF, jnp.float32),
                                        need_new)
                    masks = tuple(jnp.where(need_new, f, m)
                                  for f, m in zip(fresh, masks))
                if _DEBUG_DOUBLE_MASKBUILD:
                    # Second per-iteration fresh-mask build, origin +1e-30
                    # (same construction as the nested probe).
                    epsb = Vec3.full((), 1e-30, 1e-30, 1e-30)
                    f2 = cwalk.build(o + epsb, d,
                                     jnp.full(n, INF, jnp.float32), need_new)
                    extra = f2[0].astype(jnp.float32)
                    for m in f2[1:]:
                        extra = extra + m.astype(jnp.float32)
                    segsum = segsum + extra * 1e-30
                return pack_carry(sid_f, b_lane, o, d, rc, rad, fd,
                                  crs, cgs, cbs, dsums, segsum,
                                  masks + (bq, bi))

            one_iter = body_once_flat if flat_active else body_once
            unroll_j = _phaseb_unroll(flat_active, n_spheres_padded)

            def body(carry):
                for _ in range(unroll_j):
                    carry = one_iter(carry)
                return carry

            st0 = {f: st_read(0, f) for f in stored}
            o0 = Vec3(st0[ST_OX], st0[ST_OY], st0[ST_OZ])
            d0 = Vec3(st0[ST_DX], st0[ST_DY], st0[ST_DZ])
            walk0 = ()
            if flat_active:
                m0 = cwalk.build(o0, d0, jnp.full(n, INF, jnp.float32),
                                 st0[ST_SID] < n_slots_f)
                walk0 = m0 + (jnp.full(n, INF, jnp.float32),
                              jnp.full(n, -1, jnp.int32))
            init = pack_carry(
                st0[ST_SID], jnp.ones(n, jnp.int32), o0, d0,
                Vec3(st0[ST_RCX], st0[ST_RCY], st0[ST_RCZ]),
                (Vec3(st0[ST_RADX], st0[ST_RADY], st0[ST_RADZ])
                 if has_emissive else None),
                st0[ST_FD] if carry_fd else None,
                tuple(crs), tuple(cgs), tuple(cbs),
                tuple(dsums) if carry_fd else None, segsum, walk0)
            out = jax.lax.while_loop(cond, body, init)
            (_, _, _, _, _, _, _,
             ocrs, ocgs, ocbs, odsums, segsum, _) = unpack_carry(out)
            crs, cgs, cbs = list(ocrs), list(ocgs), list(ocbs)
            if carry_fd:
                dsums = list(odsums)
            # else: dsums stays the phase-A-accumulated per-half list.
    elif persistent:
        # ---- persistent sampling: a lane whose path ends immediately starts
        # its pixel's next sample, so tiles stay near-full occupancy instead of
        # idling masked until the slowest path of every sample finishes.
        # Lockstep iterations drop from spp*(bounces+1) to ~total path length
        # plus a small straggler tail. Draw streams stay keyed by
        # (pixel, sample, slot); exact-RNG images agree with the per-sample
        # loop to fma-contraction ulps (the two loop shapes compile with
        # different fusion, so agreement is ulp-level, not bitwise).
        if sppmap_ref is None:
            def cond(carry):
                return jnp.min(carry[0]) < spp
        else:
            def cond(carry):
                alive = carry[0] < target
                return jnp.max(jnp.where(alive, 1.0, 0.0)) > 0.0

        def body_once(carry):
            (s_lane, b_lane, o, d, ray_color, radiance, first_depth,
             cr, cg, cb, dsum, segsum) = carry
            active = s_lane < target
            provider = make_provider(s_lane)
            o, d, ray_color, radiance, first_depth, cont = bounce_core(
                o, d, active, b_lane, provider, ray_color, radiance,
                first_depth)
            cont = cont & (b_lane < config.bounces)
            died = active & ~cont

            # Harvest finished samples (gamma is per-sample: wgsl:226-228).
            g = linear_to_gamma(radiance)
            cr = cr + jnp.where(died, g.x, 0.0)
            cg = cg + jnp.where(died, g.y, 0.0)
            cb = cb + jnp.where(died, g.z, 0.0)
            depth_fin = jnp.where(first_depth >= INF, fallback_far, first_depth)
            dsum = dsum + jnp.where(died, depth_fin, 0.0)
            segsum = segsum + (1.0 if COUNT_ITERS
                               else jnp.where(active, 1.0, 0.0))

            # Restart dead lanes on their next sample.
            s_lane = s_lane + jnp.where(died, 1, 0)
            need = died & (s_lane < target)
            o2, d2 = raygen(make_provider(s_lane))
            o = Vec3.where(need, o2, o)
            d = Vec3.where(need, d2, d)
            one3 = Vec3.full((), 1.0, 1.0, 1.0)
            ray_color = Vec3.where(died, one3, ray_color)
            radiance = Vec3.where(died, Vec3.full((), 0.0, 0.0, 0.0), radiance)
            first_depth = jnp.where(died, INF, first_depth)
            # Every non-continuing lane restarts at bounce 0 (inactive lanes'
            # b_lane is never read and is reset here too).
            b_lane = jnp.where(cont, b_lane + 1, 0)
            return (s_lane, b_lane, o, d, ray_color, radiance, first_depth,
                    cr, cg, cb, dsum, segsum)

        def body(carry):
            # Idempotent on finished lanes — see PHASEB_UNROLL.
            for _ in range(_phaseb_unroll(False, n_spheres_padded)):
                carry = body_once(carry)
            return carry

        s0 = jnp.where(in_image, 0, spp).astype(jnp.int32)
        o0, d0 = raygen(make_provider(s0))
        init = (s0, jnp.zeros(n, jnp.int32), o0, d0,
                Vec3.full(n, 1.0, 1.0, 1.0), Vec3.full(n, 0.0, 0.0, 0.0),
                jnp.full(n, INF, jnp.float32),
                zero2, zero2, zero2, zero2, zero2)
        (_, _, _, _, _, _, _, cr, cg, cb, dsum, segsum) = (
            jax.lax.while_loop(cond, body, init))
    else:
        # ---- classic per-sample loop (kept as a fallback/AB switch) ---------
        def trace_one_sample(sample_idx):
            """One sample for every ray in the tile (wgsl raytrace(), :174-224)."""
            provider = make_provider(sample_idx)
            o, d = raygen(provider)

            # The active mask is carried as f32: Mosaic's while-loop lowering
            # is unreliable for i1 vector carries.
            def cond(carry):
                b, _, _, _, _, active_f, _, _ = carry
                return (b <= config.bounces) & (jnp.max(active_f) > 0.0)

            def body(carry):
                b, o, d, ray_color, radiance, active_f, first_depth, segs = carry
                active = active_f > 0.0
                o, d, ray_color, radiance, first_depth, cont = bounce_core(
                    o, d, active, b, provider, ray_color, radiance, first_depth)
                segs = segs + (1.0 if COUNT_ITERS
                               else jnp.where(active, 1.0, 0.0))
                return (b + 1, o, d, ray_color, radiance,
                        jnp.where(cont, 1.0, 0.0), first_depth, segs)

            init = (jnp.int32(0), o, d,
                    Vec3.full(n, 1.0, 1.0, 1.0), Vec3.full(n, 0.0, 0.0, 0.0),
                    jnp.where(in_image & (sample_idx < target), 1.0, 0.0),
                    jnp.full(n, INF, jnp.float32),
                    jnp.zeros(n, jnp.float32))
            (_, _, _, _, radiance, active_f, first_depth, segs) = (
                jax.lax.while_loop(cond, body, init))

            depth = jnp.where(first_depth >= INF, fallback_far, first_depth)
            return linear_to_gamma(radiance), depth, segs

        def sample_body(i, acc):
            acr, acg, acb, adsum, asegsum = acc
            color, depth, segs = trace_one_sample(i)
            return (acr + color.x, acg + color.y, acb + color.z, adsum + depth,
                    asegsum + segs)

        cr, cg, cb, dsum, segsum = jax.lax.fori_loop(
            0, config.samples_per_pixel, sample_body,
            (zero2, zero2, zero2, zero2, zero2))

    inv_spp = (np.float32(1.0 / config.samples_per_pixel) if normalize
               else np.float32(1.0))
    if st_ref is None:
        crs, cgs, cbs, dsums = [cr], [cg], [cb], [dsum]
    for h in range(fuse):
        out_r_ref[h] = crs[h] * inv_spp
        out_g_ref[h] = cgs[h] * inv_spp
        out_b_ref[h] = cbs[h] * inv_spp
        out_depth_ref[h] = dsums[h] * inv_spp
    out_seg_ref[0] = segsum
    for h in range(1, fuse):
        out_seg_ref[h] = zero2


class PallasScene(NamedTuple):
    """Kernel-ready scene: sphere scalar rows (SMEM) + bf16x2 attribute table +
    cullable group AABBs (spheres morton-sorted, oversized spheres quarantined
    in the always-tested leading groups) + optional triangle rows.

    The attribute table covers the combined primitive index space [spheres |
    triangles]; rows 0-2(+lo 3-5) hold sphere centers / triangle unit normals.
    """

    sph: jnp.ndarray      # (4, S) f32: cx, cy, cz, radius² (padding lanes
                          # duplicate sphere 0; -1e30 r² in empty scenes)
    attr: jnp.ndarray     # (N_ATTR, S+T) bf16: [c|n hi(3), c|n lo(3), m_hi, m_lo]
    gaabb: jnp.ndarray    # (6, n_groups [+ n_super]) f32: AABB min/max xyz
                          # — supergroup columns appended for big scenes
    tri: jnp.ndarray      # (10, T) f32: ax..cz, valid — T=0 row dim if no meshes
    grp: jnp.ndarray      # (4*GROUP, 3*g_pad) bf16 group-gather table: rows =
                          # [cx|cy|cz|r²]·sphere-in-group, cols = hi|mid|lo
                          # splits per group (exact f32 when matmul-summed)


def _morton_key(x, y, z, radius, valid):
    """Sort key: padding last, oversized spheres first (their AABBs would poison
    any group's bound), the rest in 3×10-bit morton order."""
    mins = jnp.stack([jnp.min(jnp.where(valid, v, jnp.inf))
                      for v in (x, y, z)])
    maxs = jnp.stack([jnp.max(jnp.where(valid, v, -jnp.inf))
                      for v in (x, y, z)])
    extent = jnp.maximum(jnp.max(maxs - mins), 1e-6)

    def spread(v, lo):
        q = jnp.clip((v - lo) / extent * 1023.0, 0.0, 1023.0).astype(jnp.int32)
        q = (q | (q << 16)) & 0x030000FF
        q = (q | (q << 8)) & 0x0300F00F
        q = (q | (q << 4)) & 0x030C30C3
        q = (q | (q << 2)) & 0x09249249
        return q

    morton = (spread(x, mins[0]) | (spread(y, mins[1]) << 1)
              | (spread(z, mins[2]) << 2))
    big = radius > 0.25 * extent
    key = jnp.where(big, morton - (1 << 30), morton)
    return jnp.where(valid, key, jnp.int32(2**31 - 1))


def pscene_cache_key(scene: SceneBuffers):
    """(key, leaves) identifying everything ``prepare_pallas_scene`` bakes into
    the table: spheres AND materials AND triangles, plus the kd split rule
    (grouping.KD_RULE shapes the prepared permutation, so a live rule flip —
    perf batteries monkeypatch it — must miss EVERY prepared-scene cache, not
    just PallasRenderer's; see ADVICE round 3). Morton configs over-invalidate
    on a rule flip, which is harmless. Callers must keep ``leaves`` alive
    alongside the key — id() values are only unique among live objects."""
    from . import grouping
    leaves = jax.tree.leaves((scene.spheres, scene.materials, scene.triangles))
    return (tuple(id(x) for x in leaves), grouping.KD_RULE), leaves


def _auto_cand_size(s: int) -> int:
    """Candidate-group size for ``s`` padded spheres: the smallest CAND_UNIT
    multiple keeping the group count within the two-word mask. Measured
    (exp_round3/3b, v5e): 16-sphere groups beat 32 at the headline scene by
    ~10% (half the per-step one-hot accumulator bytes — the walk's measured
    bottleneck — at a slightly higher straggler step count); at 5,120
    spheres (group size 96 vs the round-2 192) the two are within noise on
    both the dense and sparse 5,000-sphere scenes (pair-count-bound). One
    known trade: WITHOUT the phase split (spp > 32) 16 is ~3% slower than 32
    at the headline (coherent bounce-0 in the soup favors fewer steps) —
    set pallas_cand_size=32 explicitly for that corner."""
    return CAND_UNIT * (-(-(s // CAND_UNIT) // MAX_CAND_GROUPS))


def prepare_pallas_scene(scene: SceneBuffers, cand_size: int = 0,
                         order=None) -> PallasScene:
    """Resolve material indirection to a dense per-primitive table and split
    bf16x2.

    ``cand_size``: candidate-walk group size in spheres (a CAND_UNIT multiple;
    0 = the :func:`_auto_cand_size` rule). Static — it shapes the gather
    table layout the kernel compiles against.

    ``order``: optional sphere-table permutation (the host-computed kd cluster
    order from kernels.pallas.grouping — the shipping default via
    jitted_prepare; it cuts slab-entered groups ~2x on dense scenes). None
    falls back to the in-jit morton argsort. Group/candidate AABBs are unions
    over consecutive runs of this order, so it is purely a culling-quality
    knob: hit results are value-identical for any permutation (each sphere is
    tested with identical arithmetic whenever its group is entered, and a
    sphere's own group always passes the slab test).

    Runs once per scene revision (jit-cached by shapes); the reference re-uploads
    equivalent tables every frame (extract.rs:334-336) — here they persist.
    """
    sp = scene.spheres
    mt = scene.materials

    if order is None:
        order = jnp.argsort(_morton_key(sp.cx, sp.cy, sp.cz, sp.radius,
                                        sp.valid))
    sp = type(sp)(*(leaf[order] for leaf in sp))

    mid = jnp.clip(sp.material_id, 0, mt.capacity - 1)
    # Padding lanes duplicate sphere 0 EVERYWHERE — geometry (sph below),
    # center, and material — so even if a duplicate ever wins a borderline
    # fp tie (e.g. group 0 falsely slab-culled by a NaN from an axis-aligned
    # ray on a box face), shading is exactly sphere 0's shading, not garbage.
    mid = jnp.where(sp.valid, mid, mid[0])
    radius = jnp.where(sp.valid, jnp.abs(sp.radius), 0.0)
    center = jnp.stack([jnp.where(sp.valid, c, jnp.where(sp.valid[0], c[0], 0.0))
                        for c in (sp.cx, sp.cy, sp.cz)], axis=0)

    def mat_rows(ids):
        return jnp.stack([
            mt.base_r[ids], mt.base_g[ids], mt.base_b[ids],
            mt.metallic[ids], mt.roughness[ids], mt.ior[ids],
            mt.specular_transmission[ids],
            mt.emissive_r[ids], mt.emissive_g[ids], mt.emissive_b[ids],
        ], axis=0)

    mat = mat_rows(mid)

    tr = scene.triangles
    if tr is not None:
        a = Vec3(tr.ax, tr.ay, tr.az)
        b = Vec3(tr.bx, tr.by, tr.bz)
        c = Vec3(tr.cx, tr.cy, tr.cz)
        tri_normal = (b - a).cross(c - a).normalize()
        tri_normal = Vec3.where(tr.valid, tri_normal,
                                Vec3.full((), 0.0, 1.0, 0.0))
        tmid = jnp.clip(tr.material_id, 0, mt.capacity - 1)
        center = jnp.concatenate(
            [center, jnp.stack([tri_normal.x, tri_normal.y, tri_normal.z], 0)],
            axis=1)
        mat = jnp.concatenate([mat, mat_rows(tmid)], axis=1)
        tri = jnp.stack([tr.ax, tr.ay, tr.az, tr.bx, tr.by, tr.bz,
                         tr.cx, tr.cy, tr.cz,
                         jnp.where(tr.valid, 1.0, 0.0)], axis=0)
    else:
        tri = jnp.zeros((10, 0), jnp.float32)

    def hi_lo(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    c_hi, c_lo = hi_lo(center)
    m_hi, m_lo = hi_lo(mat)
    attr = jnp.concatenate([c_hi, c_lo, m_hi, m_lo], axis=0)
    pad = N_ATTR - attr.shape[0]
    if pad:
        attr = jnp.concatenate(
            [attr, jnp.zeros((pad, attr.shape[1]), jnp.bfloat16)], axis=0)
    # Padding lanes duplicate sphere 0 (first after the morton sort, live
    # whenever the scene is non-empty): a duplicate's hit ties the real
    # sphere's t bit-exactly and the strict t < best_t test keeps the earlier
    # (real) index, so padding needs no per-sphere validity check in the hot
    # loop. Empty scenes park padding at the origin with r² = -1e30, making
    # disc < 0 by an unroundable margin.
    r2 = radius * radius
    pad_r2 = jnp.where(sp.valid[0], r2[0], jnp.float32(-1e30))
    pad_c = [jnp.where(sp.valid[0], c[0], 0.0) for c in (sp.cx, sp.cy, sp.cz)]
    sph = jnp.stack([jnp.where(sp.valid, sp.cx, pad_c[0]),
                     jnp.where(sp.valid, sp.cy, pad_c[1]),
                     jnp.where(sp.valid, sp.cz, pad_c[2]),
                     jnp.where(sp.valid, r2, pad_r2)], axis=0)

    # Conservative per-group AABBs over the sorted order: center ± |radius|.
    # Padding lanes (radius 0) get inverted bounds so all-padding groups can
    # never pass the slab test.
    s = sph.shape[1]
    n_groups = s // GROUP
    live = radius > 0.0
    mins = jnp.stack([jnp.where(live, c - radius, jnp.inf)
                      for c in (sp.cx, sp.cy, sp.cz)])
    maxs = jnp.stack([jnp.where(live, c + radius, -jnp.inf)
                      for c in (sp.cx, sp.cy, sp.cz)])
    gmin = jnp.min(mins.reshape(3, n_groups, GROUP), axis=2)
    gmax = jnp.max(maxs.reshape(3, n_groups, GROUP), axis=2)
    # Replace infinities (all-padding groups) with an inverted unit box.
    empty = ~jnp.isfinite(gmin[0])
    gmin_f = jnp.where(empty[None, :], 1.0, gmin)
    gmax_f = jnp.where(empty[None, :], -1.0, gmax)
    gaabb = jnp.concatenate([gmin_f, gmax_f], axis=0)
    if n_groups >= 4 * SUPER:
        # Supergroup AABBs for the kernel's two-level walk: min/max over
        # SUPER-group spans, appended as extra columns (the kernel addresses
        # supergroup gs at column n_groups + gs). Built from the pre-fill
        # (inf/-inf) group bounds so empty spans invert too.
        n_super = -(-n_groups // SUPER)
        pad_g = n_super * SUPER - n_groups
        if pad_g:
            gmin = jnp.concatenate(
                [gmin, jnp.full((3, pad_g), jnp.inf)], axis=1)
            gmax = jnp.concatenate(
                [gmax, jnp.full((3, pad_g), -jnp.inf)], axis=1)
        smin = jnp.min(gmin.reshape(3, n_super, SUPER), axis=2)
        smax = jnp.max(gmax.reshape(3, n_super, SUPER), axis=2)
        sempty = ~jnp.isfinite(smin[0])
        smin = jnp.where(sempty[None, :], 1.0, smin)
        smax = jnp.where(sempty[None, :], -1.0, smax)
        gaabb = jnp.concatenate(
            [jnp.concatenate([gmin_f, smin], axis=1),
             jnp.concatenate([gmax_f, smax], axis=1)], axis=0)

    # ---- candidate-walk tables ------------------------------------------------
    # Candidate groups are ``gc`` spheres (a CAND_UNIT multiple; the auto rule
    # keeps the per-lane two-word bitmask within MAX_CAND_GROUPS for ANY scene
    # size); their gather table is CHUNK-MAJOR — rows [chunk c][attr a][k] =
    # c·4·chunk + a·chunk + k — so the kernel gathers and tests one
    # chunk-sphere register block at a time (a full (4·gc, N) f32 accumulator
    # would blow VMEM at gc ≥ 256). Each group's column is split hi/mid/lo bf16
    # so the one-hot matmul's f32 accumulator reconstructs f32 values EXACTLY
    # (3×8 mantissa bits ≥ f32's 24; every partial sum of the three addends is
    # representable, so accumulation order doesn't matter).
    gc = cand_size or _auto_cand_size(s)
    if gc % 8:
        raise ValueError(f"pallas_cand_size={gc} must be a multiple of 8")
    n_cand = -(-s // gc)
    if n_cand > 31 * MAX_CAND_WORDS:
        raise ValueError(
            f"pallas_cand_size={gc} needs {n_cand} candidate groups for "
            f"{s} padded spheres — the per-lane mask holds at most "
            f"{31 * MAX_CAND_WORDS} ({MAX_CAND_WORDS} words)")
    chunk = _cand_chunk(gc)
    s_c = n_cand * gc
    # Tail padding duplicates sphere 0 (sph column 0 — carries the empty-scene
    # conventions too). A duplicate can only be hit when sphere 0 is, which
    # always sets candidate bit 0, and ascending visit order + strict < then
    # keeps the real index.
    sph_c = (sph if s_c == s else
             jnp.concatenate([sph, jnp.tile(sph[:, :1], (1, s_c - s))], axis=1))
    g_pad = max(8, -(-n_cand // 8) * 8)
    t = sph_c.reshape(4, n_cand, gc // chunk, chunk)       # [a, g, c, k]
    blk = t.transpose(2, 0, 3, 1).reshape(4 * gc, n_cand)  # chunk-major rows
    if g_pad > n_cand:
        blk = jnp.concatenate(
            [blk, jnp.zeros((4 * gc, g_pad - n_cand), jnp.float32)], axis=1)
    hi = blk.astype(jnp.bfloat16)
    res = blk - hi.astype(jnp.float32)
    mid = res.astype(jnp.bfloat16)
    lo = (res - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    grp = jnp.concatenate([hi, mid, lo], axis=1)

    if gc != GROUP:
        # Candidate-group AABBs (directly over the sphere-level pre-fill
        # inf/-inf bounds, so all-padding groups invert) appended as extra
        # gaabb columns after [groups | supergroups]. (gc == GROUP reuses the
        # base group columns at offset 0 instead.)
        pad_s = s_c - s
        cmin = (jnp.concatenate([mins, jnp.full((3, pad_s), jnp.inf)], axis=1)
                if pad_s else mins)
        cmax = (jnp.concatenate([maxs, jnp.full((3, pad_s), -jnp.inf)], axis=1)
                if pad_s else maxs)
        cmin = jnp.min(cmin.reshape(3, n_cand, gc), axis=2)
        cmax = jnp.max(cmax.reshape(3, n_cand, gc), axis=2)
        cempty = ~jnp.isfinite(cmin[0])
        cmin = jnp.where(cempty[None, :], 1.0, cmin)
        cmax = jnp.where(cempty[None, :], -1.0, cmax)
        gaabb = jnp.concatenate(
            [jnp.concatenate([gaabb[:3], cmin], axis=1),
             jnp.concatenate([gaabb[3:], cmax], axis=1)], axis=0)
    return PallasScene(sph=sph, attr=attr, gaabb=gaabb, tri=tri, grp=grp)


@functools.lru_cache(maxsize=8)
def jitted_prepare(cand_size: int = 0, grouping: str = "kd"):
    """The shared prepare_pallas_scene wrapper — one cache entry per
    (candidate-group size, grouping) for every front-end (PallasRenderer,
    AdaptiveRenderer, the sharded step).

    ``grouping="kd"`` computes the host-side kd cluster permutation
    (kernels.pallas.grouping) and feeds it to the jitted core as an array
    argument; ``"morton"`` keeps the in-jit morton argsort."""
    inner = jax.jit(functools.partial(prepare_pallas_scene,
                                      cand_size=cand_size))
    if grouping == "morton":
        return inner

    from .grouping import cached_order

    def prep(scene):
        return inner(scene, order=cached_order(scene, cand_size))

    return prep


def _pack_camera(cam: CameraState, config: RenderConfig):
    right = cam.direction.cross(cam.up)   # wgsl:149
    vals = jnp.zeros((1, N_CAM), jnp.float32)
    entries = {
        C_POS_X: cam.position.x, C_POS_Y: cam.position.y, C_POS_Z: cam.position.z,
        C_DIR_X: cam.direction.x, C_DIR_Y: cam.direction.y, C_DIR_Z: cam.direction.z,
        C_UP_X: cam.up.x, C_UP_Y: cam.up.y, C_UP_Z: cam.up.z,
        C_RIGHT_X: right.x, C_RIGHT_Y: right.y, C_RIGHT_Z: right.z,
        C_SCALE: jnp.tan(cam.fov * 0.5), C_ASPECT: cam.aspect,
        C_NEAR: cam.near, C_FAR: cam.far,
        C_WIDTH: jnp.float32(config.width), C_HEIGHT: jnp.float32(config.height),
        C_NPIX: jnp.float32(config.n_pixels),
        C_APERTURE: cam.aperture, C_FOCUS: cam.focus_distance,
    }
    for k, val in entries.items():
        vals = vals.at[0, k].set(jnp.asarray(val, jnp.float32))
    return vals


def block_grid(config: RenderConfig):
    """(nbx, nby): the BLOCK_W×BLOCK_H pixel-block grid covering the frame."""
    return -(-config.width // BLOCK_W), -(-config.height // BLOCK_H)


def unshuffle_blocks(flat, config: RenderConfig):
    """Block-ordered kernel output → row-major [H*W] pixels."""
    nbx, nby = block_grid(config)
    img = flat[:nbx * nby * TILE].reshape(nby, nbx, BLOCK_H, BLOCK_W)
    img = img.transpose(0, 2, 1, 3).reshape(nby * BLOCK_H, nbx * BLOCK_W)
    return img[:config.height, :config.width].reshape(-1)


def shuffle_blocks(flat, config: RenderConfig, fill=0):
    """Row-major [H*W] per-pixel values → the kernel's BLOCK order
    (n_tiles, TILE_SUB, 128) — the inverse of :func:`unshuffle_blocks`
    (off-image padding lanes get ``fill``)."""
    nbx, nby = block_grid(config)
    h, w = config.height, config.width
    img = jnp.asarray(flat).reshape(h, w)
    img = jnp.pad(img, ((0, nby * BLOCK_H - h), (0, nbx * BLOCK_W - w)),
                  constant_values=fill)
    img = img.reshape(nby, BLOCK_H, nbx, BLOCK_W).transpose(0, 2, 1, 3)
    return img.reshape(nbx * nby, TILE_SUB, 128)


def render_tiles(pscene: PallasScene, cam: CameraState, config: RenderConfig,
                 frame_seed, exact_rng: bool = False, block_offset=0,
                 sample_offset=0, n_blocks_local=None, normalize: bool = True,
                 persistent: bool = True, sl=None, slmeta=None, slattr=None,
                 spp_map=None, has_emissive: bool = True):
    """Run the megakernel over the frame (or one shard of it when
    ``block_offset``/``n_blocks_local``/``sample_offset`` describe a slice of a
    multi-chip frame). Returns (r, g, b, depth) as flat BLOCK-ORDERED arrays
    (pass through :func:`unshuffle_blocks`) plus the traced-segment count (f32
    scalar); with ``normalize=False`` color/depth come back as sample SUMS for a
    cross-device psum.

    ``sl``/``slmeta``: optional per-block primary shortlists (built by
    kernels.pallas.primary, one row per LOCAL tile) — when given (and
    ``persistent``), the kernel runs in phase-split mode: a coherent bounce-0
    pass over every sample against the shortlist, then the persistent loop for
    bounces ≥ 1 restarting from VMEM-parked sample states.

    ``spp_map``: optional per-lane sample targets, BLOCK-ordered
    (n_tiles, TILE_SUB, 128) i32 (see :func:`shuffle_blocks`) — each pixel
    traces min(map, spp) samples (adaptive sampling extension); color/depth
    outputs are SUMS over the traced samples, so pass ``normalize=False`` and
    divide by the actual counts outside."""
    nbx, nby = block_grid(config)
    n_tiles = n_blocks_local if n_blocks_local is not None else nbx * nby
    s = pscene.sph.shape[1]
    n_tris = pscene.tri.shape[1]
    assert s % SPHERE_CHUNK == 0
    phase_split = sl is not None and persistent
    if phase_split:
        assert config.samples_per_pixel <= MAX_SPLIT_SPP
        assert sl.shape[0] == n_tiles and slmeta.shape[0] == n_tiles, \
            "shortlists must cover exactly the local tile range"

    cam_row = _pack_camera(cam, config)
    seed = jnp.stack([jnp.asarray(frame_seed, jnp.uint32),
                      jnp.asarray(block_offset, jnp.uint32),
                      jnp.asarray(sample_offset, jnp.uint32),
                      jnp.uint32(nbx)]).reshape(1, 4)

    # Block fusion (tile-tail pooling, PHASE_FUSE knob): one kernel instance
    # renders ``fuse`` consecutive blocks; the grid shrinks and every
    # per-tile spec grows a fused leading dim.
    fuse = _resolve_fuse(n_tiles, config.samples_per_pixel, phase_split, s,
                         len(_st_layout(has_emissive)))
    # Indivisible tile counts pad the grid: padded tail blocks are masked
    # inactive INSIDE the kernel by their local index (``n_tiles_local``
    # below) — necessary on the sharded path, where a padded half's global
    # coordinates alias the next shard's in-image blocks and its traced
    # segments would otherwise inflate the fused instance's row-0 segment
    # count (which survives the crop). Padded output rows are cropped before
    # the return.
    n_tiles_pad = -(-n_tiles // fuse) * fuse
    grid = (n_tiles_pad // fuse,)
    # Off-TPU (tests, CPU dev) the kernel runs in the Pallas interpreter, which
    # executes the same program with XLA ops — slow but exact. The hardware PRNG
    # has no interpreter lowering, so the exact-RNG path is forced there.
    interpret = jax.default_backend() != "tpu"
    if interpret:
        exact_rng = True
    assert isinstance(has_emissive, bool)  # static — shapes the parked layout
    base_kernel = functools.partial(
        _render_kernel, config=config, n_spheres_padded=s,
        n_tris_padded=n_tris, exact_rng=exact_rng,
        persistent=persistent, normalize=normalize, fuse=fuse,
        has_emissive=has_emissive,
        n_tiles_local=n_tiles if n_tiles_pad != n_tiles else None)
    tile_spec = pl.BlockSpec((fuse, TILE_SUB, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, N_CAM), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((4, s), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((6, pscene.gaabb.shape[1]), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((10, max(n_tris, 1)), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        full((N_ATTR, s + n_tris)),
        full(pscene.grp.shape),
    ]
    scratch_shapes = []
    extra_names = []
    extra_args = []
    if phase_split:
        # Mosaic wants SMEM block sublane dims divisible by 8, so shortlists
        # ride in 8-tile row groups (index_map i // 8, kernel reads row i % 8).
        sl2d = jnp.asarray(sl, jnp.float32).reshape(sl.shape[0], -1)
        slmeta2d = jnp.asarray(slmeta, jnp.float32)
        pad_rows = (-n_tiles) % 8
        if pad_rows:
            sl2d = jnp.concatenate(
                [sl2d, jnp.zeros((pad_rows, sl2d.shape[1]), jnp.float32)])
            slmeta2d = jnp.concatenate(
                [slmeta2d,
                 jnp.zeros((pad_rows, slmeta2d.shape[1]), jnp.float32)])
        # Fused tiles read ``fuse`` consecutive rows of the 8-row group
        # (fuse | 8, so i // (8 // fuse) delivers the right group).
        in_specs += [
            pl.BlockSpec((8, sl2d.shape[1]), lambda i: (i // (8 // fuse), 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, slmeta2d.shape[1]),
                         lambda i: (i // (8 // fuse), 0),
                         memory_space=pltpu.SMEM),
        ]
        scratch_shapes = [pltpu.VMEM(
            (fuse * config.samples_per_pixel,
             len(_st_layout(has_emissive)) * TILE_SUB, 128),
            jnp.float32)]
        extra_names += ["sl_ref", "slmeta_ref"]
        extra_args += [sl2d, slmeta2d]
        if slattr is not None:
            assert slattr.shape[0] == n_tiles and pscene.tri.shape[1] == 0
            slattr = jnp.asarray(slattr, jnp.bfloat16)
            if n_tiles_pad != n_tiles:
                slattr = jnp.concatenate(
                    [slattr, jnp.zeros((n_tiles_pad - n_tiles,)
                                       + slattr.shape[1:], slattr.dtype)])
            in_specs += [pl.BlockSpec((fuse,) + slattr.shape[1:],
                                      lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)]
            extra_names += ["slattr_ref"]
            extra_args += [slattr]
    if spp_map is not None:
        assert spp_map.shape[0] == n_tiles, \
            "spp_map must cover exactly the local tile range"
        spp_map = jnp.asarray(spp_map, jnp.int32)
        if n_tiles_pad != n_tiles:
            spp_map = jnp.concatenate(
                [spp_map, jnp.zeros((n_tiles_pad - n_tiles,)
                                    + spp_map.shape[1:], spp_map.dtype)])
        in_specs += [tile_spec]
        extra_names += ["sppmap_ref"]
        extra_args += [spp_map]

    if extra_names:
        n_extra = len(extra_names)

        def kernel(*refs):
            ins, extras = refs[:7], refs[7:7 + n_extra]
            outs = refs[7 + n_extra:7 + n_extra + 5]
            scratch = refs[7 + n_extra + 5:]
            kw = dict(zip(extra_names, extras))
            if scratch:
                kw["st_ref"] = scratch[0]
            base_kernel(*ins, *outs, **kw)
    else:
        kernel = base_kernel
    outs_fn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[tile_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles_pad, TILE_SUB, 128), jnp.float32),
        ] * 5,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )
    tri_in = (pscene.tri if n_tris
              else jnp.zeros((10, 1), jnp.float32))
    args = [cam_row, seed, pscene.sph, pscene.gaabb, tri_in, pscene.attr,
            pscene.grp]
    args += extra_args
    outs = outs_fn(*args)
    r, g, b, depth, segs = outs
    if n_tiles_pad != n_tiles:
        # Crop the padded tail blocks (and their segment counts — padded
        # blocks either trace nothing or re-trace another shard's blocks).
        r, g, b, depth, segs = (x[:n_tiles] for x in (r, g, b, depth, segs))
    flat = lambda x: x.reshape(n_tiles * TILE)
    return flat(r), flat(g), flat(b), flat(depth), jnp.sum(segs)
