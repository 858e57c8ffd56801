"""Flattened phase-B walk (megakernel.PHASEB_FLAT) — the round-5 dense-scene
program family.

Contract under test: interleaving candidate-walk steps with per-lane segment
finishes (scatter/harvest/restart in the same outer iteration a lane's walk
exhausts) is VALUE-IDENTICAL to the nested scheduling — same per-lane visit
order, same test arithmetic (_CandidateWalk is the single source), identical
images AND traced-segment totals on the exact-RNG path. Mid-walk re-masks on
the nested arm only prune groups that cannot change the winner, so arms with
REMASK_SCHEDULE on must also match bit-for-bit.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevyray_tpu import RenderConfig, rtiow
from bevyray_tpu.kernels.pallas import megakernel
from bevyray_tpu.kernels.pallas.megakernel import (prepare_pallas_scene,
                                                   render_tiles,
                                                   unshuffle_blocks)
from bevyray_tpu.kernels.pallas.primary import shortlists_for


def _flat_vs_nested(monkeypatch, cfg_kwargs, cand_size, seed=11,
                    nested_remask=(), flat_steps=1, grid=8,
                    flat_remask=False, flat_merge=False):
    """Render the same frame with PHASEB_FLAT True/False via direct
    render_tiles jits (module knobs bake into traces; fresh jit per arm)."""
    world = rtiow.final_scene(seed=42, grid=grid)
    scene = world.extract(with_bvh=False)
    cfg = RenderConfig(**cfg_kwargs, pallas_intersect="candidates",
                       pallas_cand_size=cand_size, pallas_primary="split")
    cam = world.camera_state(aspect=cfg.width / cfg.height)
    pscene = megakernel.jitted_prepare(cand_size)(scene)
    sl, meta, _ = shortlists_for(np.asarray(pscene.sph), cam, cfg,
                                 cfg.samples_per_pixel)
    assert sl is not None

    outs = []
    for flat in (False, True):
        monkeypatch.setattr(megakernel, "PHASEB_FLAT", flat)
        monkeypatch.setattr(megakernel, "FLAT_WALK_STEPS", flat_steps)
        monkeypatch.setattr(megakernel, "FLAT_REMASK", flat and flat_remask)
        monkeypatch.setattr(megakernel, "FLAT_STEP_MERGE",
                            flat and flat_merge)
        monkeypatch.setattr(megakernel, "REMASK_SCHEDULE",
                            () if flat else nested_remask)
        f = jax.jit(functools.partial(render_tiles, config=cfg,
                                      exact_rng=True))
        r, g, b, d, segs = f(pscene, cam, frame_seed=jnp.uint32(seed),
                             sl=jnp.asarray(sl), slmeta=jnp.asarray(meta))
        img = np.stack([np.asarray(unshuffle_blocks(x, cfg))
                        for x in (r, g, b, d)], -1)
        outs.append((img, float(segs)))
    return outs


def test_flat_walk_bit_identical(monkeypatch):
    cfg = dict(width=96, height=64, samples_per_pixel=4, bounces=4, level=3)
    (img_n, segs_n), (img_f, segs_f) = _flat_vs_nested(monkeypatch, cfg,
                                                       cand_size=8)
    assert segs_n == segs_f
    np.testing.assert_array_equal(img_n, img_f)


def test_flat_walk_matches_nested_with_remask(monkeypatch):
    # The nested arm keeps its shipped mid-walk re-mask (value-neutral by
    # construction) — flat must still match bit-for-bit.
    cfg = dict(width=96, height=64, samples_per_pixel=2, bounces=3, level=3)
    (img_n, segs_n), (img_f, segs_f) = _flat_vs_nested(
        monkeypatch, cfg, cand_size=16, nested_remask=(2,))
    assert segs_n == segs_f
    np.testing.assert_array_equal(img_n, img_f)


def test_flat_walk_remask_bit_identical(monkeypatch):
    # FLAT_REMASK prunes walking lanes' masks by their tightened best-q every
    # iteration (ties kept) — it may only ever remove guaranteed losers.
    cfg = dict(width=96, height=64, samples_per_pixel=4, bounces=4, level=3)
    (img_n, segs_n), (img_f, segs_f) = _flat_vs_nested(
        monkeypatch, cfg, cand_size=8, flat_steps=2, flat_remask=True)
    assert segs_n == segs_f
    np.testing.assert_array_equal(img_n, img_f)


def test_flat_walk_multi_step(monkeypatch):
    # FLAT_WALK_STEPS > 1 (several candidate steps per outer iteration) only
    # changes scheduling, never values.
    cfg = dict(width=96, height=64, samples_per_pixel=2, bounces=3, level=3)
    (img_n, segs_n), (img_f, segs_f) = _flat_vs_nested(
        monkeypatch, cfg, cand_size=8, flat_steps=3)
    assert segs_n == segs_f
    np.testing.assert_array_equal(img_n, img_f)


def test_flat_step_merge_bit_identical(monkeypatch):
    # FLAT_STEP_MERGE folds the iteration's FLAT_WALK_STEPS one-hot gathers
    # into one wide matmul per chunk (_CandidateWalk.step_multi). The carried
    # (q, i) is the lexicographic min over the visit set, so the merge is
    # order-independent — images and segment totals must match the NESTED
    # walk bit-for-bit (and hence, via test_flat_walk_multi_step, the
    # unmerged flat walk too).
    cfg = dict(width=96, height=64, samples_per_pixel=2, bounces=3, level=3)
    (img_n, segs_n), (img_f, segs_f) = _flat_vs_nested(
        monkeypatch, cfg, cand_size=8, flat_steps=3, flat_merge=True)
    assert segs_n == segs_f
    np.testing.assert_array_equal(img_n, img_f)


def test_flat_step_merge_multiword(monkeypatch):
    # Same contract at a candidate size that forces >1 mask words and >1
    # gather chunks, with the shipped steps=4.
    cfg = dict(width=96, height=64, samples_per_pixel=2, bounces=3, level=3)
    (img_n, segs_n), (img_f, segs_f) = _flat_vs_nested(
        monkeypatch, cfg, cand_size=16, flat_steps=4, flat_merge=True)
    assert segs_n == segs_f
    np.testing.assert_array_equal(img_n, img_f)


def test_flat_walk_sharded_matches_single_device(monkeypatch):
    # The flat loop inside shard_map (sp pixel rows, dp samples) must
    # reproduce the single-device flat render exactly (exact-RNG interpret).
    from bevyray_tpu.engine.pallas_renderer import PallasRenderer
    from bevyray_tpu.parallel.sharding import (make_mesh,
                                               render_frame_sharded_pallas)

    monkeypatch.setattr(megakernel, "PHASEB_FLAT", True)
    world = rtiow.final_scene(seed=42, grid=6)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    cfg = RenderConfig(width=128, height=128, samples_per_pixel=2, bounces=3,
                       level=3, pallas_intersect="candidates",
                       pallas_cand_size=8)
    want = PallasRenderer(cfg).render(scene, cam, seed=5)
    got = render_frame_sharded_pallas(make_mesh(2, 2, 1), scene, cam, cfg,
                                      frame_seed=5)
    np.testing.assert_allclose(np.asarray(got.image), np.asarray(want.image),
                               atol=1e-6)
    assert float(got.rays_traced) == float(want.rays_traced)


def test_flat_gate():
    f = megakernel._use_flat_walk
    # auto: on wherever the candidates walk runs — flat won at BOTH scales on
    # hardware (FLAT_AB_r05: dense +36%, headline +34%).
    assert megakernel.PHASEB_FLAT == "auto"
    assert f(2048, True, 0)
    assert f(512, True, 0)          # headline scale flattens too (round 5)
    assert not f(4096, False, 0)    # grouped walk can't flatten
    assert not f(4096, True, 12)    # scalar triangle loop per iter would lose
