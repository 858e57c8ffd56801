"""Shipped perf knobs are value-identical program transformations.

The suite runs with the CHEAP knob settings (conftest: no walk-prefix unroll,
no phase-B/phase-A unrolling) because the unrolled programs are 2-16x larger
and XLA-CPU compile time is superlinear in program size. This file is the
suite's coverage of the SHIPPED settings: one render with every shipped knob
active (candidates walk forced so REMASK_SCHEDULE applies, phase split on so
PHASEA_UNROLL/PHASEB_UNROLL apply) asserted bit-identical against the cheap
baseline. Any knob that changes a single image bit fails here.
"""

import numpy as np

from conftest import CHEAP_KNOBS, SHIPPED_KNOBS

from bevyray_tpu import RenderConfig, rtiow
from bevyray_tpu.engine.pallas_renderer import PallasRenderer
from bevyray_tpu.kernels.pallas import megakernel as mk


def _render(world, knobs, chunk):
    old = {k: getattr(mk, k) for k in knobs}
    for k, v in knobs.items():
        setattr(mk, k, v)
    try:
        scene = world.extract(with_bvh=False)
        cam = world.camera_state(aspect=1.0)
        # Distinct sphere_chunk => distinct compiled program per arm (padding
        # is value-inert), so the second arm cannot ride the first's cache.
        cfg = RenderConfig(width=64, height=64, samples_per_pixel=4, bounces=3,
                          level=3, pallas_intersect="candidates",
                          pallas_primary="split", sphere_chunk=chunk)
        return PallasRenderer(cfg, exact_rng=True).render(scene, cam, seed=9)
    finally:
        for k, v in old.items():
            setattr(mk, k, v)


def test_shipped_knobs_bit_identical_to_cheap_suite_knobs():
    world = rtiow.final_scene(seed=5, grid=4)
    cheap = _render(world, CHEAP_KNOBS, chunk=128)
    ship = _render(world, SHIPPED_KNOBS, chunk=132)
    assert float(ship.rays_traced) == float(cheap.rays_traced)
    np.testing.assert_array_equal(np.asarray(ship.image),
                                  np.asarray(cheap.image))
    np.testing.assert_array_equal(np.asarray(ship.rt_depth),
                                  np.asarray(cheap.rt_depth))


def test_phase_a_ablation_knobs_still_compile():
    """The _DEBUG_PHASEA timing probes (scripts/exp_round3h.py) are dead code
    in production; this smoke test keeps them buildable so the next perf
    session's battery doesn't start from a bit-rotted kernel. All knobs at
    once, bounces=0 (the battery's configuration), tiny frame — output values
    are intentionally wrong and only sanity-checked for shape/finiteness."""
    world = rtiow.final_scene(seed=5, grid=3)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)

    def render(ablate, unroll, chunk):
        old = mk._DEBUG_PHASEA, mk.PHASEA_UNROLL
        mk._DEBUG_PHASEA = frozenset(ablate)
        mk.PHASEA_UNROLL = unroll
        try:
            cfg = RenderConfig(width=32, height=32, samples_per_pixel=2,
                               bounces=0, level=3, pallas_primary="split",
                               sphere_chunk=chunk)
            f = PallasRenderer(cfg, exact_rng=True).render(scene, cam, seed=3)
        finally:
            mk._DEBUG_PHASEA, mk.PHASEA_UNROLL = old
        img = np.asarray(f.image)
        assert img.shape == (32, 32, 3) and np.isfinite(img).all()

    render({"no_compact", "no_st", "no_scatter", "no_jitter", "no_intersect",
            "no_harvest"}, unroll=False, chunk=136)
    # PHASEA_UNROLL measured -1.8% and ships False, so this is the only thing
    # keeping its static-slot st_write/compaction path buildable (state
    # parking must be ACTIVE here — that is the path the unroll changes).
    render((), unroll=True, chunk=140)


def test_double_cost_probe_knobs_image_identical():
    """_DEBUG_DOUBLE_FETCH / _DEBUG_DOUBLE_DRAWS (scripts/exp_round4_tb.py)
    price t_B components by ADDING a CSE-proof second copy of one component
    per iteration — valid only if images and trip counts stay effectively
    identical (the SPEED_OF_LIGHT §15 lesson: a probe that perturbs control
    flow prices the wrong thing). The fetch arm folds into the ray counter
    only (bit-identical image); the draws arm folds 1e-30-weighted uniforms
    into radiance (≤1e-12 after gamma on an exactly-0 pixel)."""
    world = rtiow.final_scene(seed=5, grid=4)
    ref = _render(world, CHEAP_KNOBS, chunk=188)
    dfetch = _render(world, dict(CHEAP_KNOBS, _DEBUG_DOUBLE_FETCH=True),
                     chunk=192)
    ddraws = _render(world, dict(CHEAP_KNOBS, _DEBUG_DOUBLE_DRAWS=True),
                     chunk=196)
    assert float(dfetch.rays_traced) == float(ref.rays_traced)
    np.testing.assert_array_equal(np.asarray(dfetch.image),
                                  np.asarray(ref.image))
    assert float(ddraws.rays_traced) == float(ref.rays_traced)
    np.testing.assert_allclose(np.asarray(ddraws.image),
                               np.asarray(ref.image), atol=1e-12)


def test_pre_brute_probe_knobs_bit_identical():
    """BRUTE_FIRST_GROUPS / POP_BRUTE_FRAC ship 0/0.0 (measured negatives,
    kept as probe switches) — pin that their default-off code paths stay
    value-identical through mask-machinery refactors (the multi-word mask
    generalization rewired their bit-clearing), so a future perf battery
    doesn't probe against a silently broken arm."""
    world = rtiow.final_scene(seed=5, grid=4)
    ref = _render(world, CHEAP_KNOBS, chunk=176)
    brute = _render(world, dict(CHEAP_KNOBS, BRUTE_FIRST_GROUPS=1), chunk=180)
    pop = _render(world, dict(CHEAP_KNOBS, POP_BRUTE_FRAC=0.5), chunk=184)
    for got, name in ((brute, "BRUTE_FIRST_GROUPS=1"), (pop, "POP_BRUTE=0.5")):
        assert float(got.rays_traced) == float(ref.rays_traced), name
        np.testing.assert_array_equal(np.asarray(got.image),
                                      np.asarray(ref.image), err_msg=name)
