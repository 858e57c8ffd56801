"""Edge-aware à-trous denoiser (engine/denoise.py) — extension beyond the
reference; must reduce Monte-Carlo noise without crossing depth edges, and be
a strict no-op at its default (0 iterations)."""

import numpy as np

from bevyray_tpu import RenderConfig, Renderer, rtiow
from bevyray_tpu.engine.denoise import atrous_denoise


def _renders(spp_lo=2, spp_hi=64, size=64):
    world = rtiow.material_test_scene()
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    lo = Renderer(RenderConfig(width=size, height=size, samples_per_pixel=spp_lo,
                               bounces=4, level=3)).render(scene, cam, seed=3)
    hi = Renderer(RenderConfig(width=size, height=size, samples_per_pixel=spp_hi,
                               bounces=4, level=3)).render(scene, cam, seed=9)
    return lo, hi


def test_zero_iterations_is_identity():
    lo, _ = _renders(spp_hi=2)
    out = atrous_denoise(lo.image, lo.rt_depth, iterations=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(lo.image))


def test_denoise_reduces_error_vs_converged_reference():
    lo, hi = _renders()
    ref = np.asarray(hi.image)
    raw = np.asarray(lo.image)
    den = np.asarray(atrous_denoise(lo.image, lo.rt_depth, iterations=3))
    mse_raw = float(np.mean((raw - ref) ** 2))
    mse_den = float(np.mean((den - ref) ** 2))
    assert mse_den < 0.5 * mse_raw, (mse_raw, mse_den)


def test_depth_edges_survive():
    # Synthetic: two flat color regions split by a depth discontinuity plus
    # heavy noise — the filter must flatten the noise while keeping the step.
    rng = np.random.default_rng(0)
    h = w = 64
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2] = 0.2
    img[:, w // 2:] = 0.8
    noisy = img + rng.normal(0, 0.1, img.shape).astype(np.float32)
    depth = np.full((h, w), 5.0, np.float32)
    depth[:, w // 2:] = 50.0
    out = np.asarray(atrous_denoise(noisy, depth, iterations=3,
                                    sigma_color=10.0, sigma_depth=0.5))
    # noise flattened within regions…
    assert out[:, : w // 2 - 8].std() < 0.25 * noisy[:, : w // 2 - 8].std()
    # …but the cross-edge step preserved (sigma_color is huge, so only the
    # depth guide can be responsible).
    left = out[:, w // 2 - 2].mean()
    right = out[:, w // 2 + 1].mean()
    assert right - left > 0.5


def test_cli_denoise_flag(tmp_path):
    from bevyray_tpu.app.cli import main
    out = tmp_path / "d.png"
    rc = main(["render", "--scene", "material", "--width", "48", "--height",
               "48", "--spp", "2", "--backend", "brute", "--denoise", "2",
               "--out", str(out)])
    assert rc == 0 and out.exists()
