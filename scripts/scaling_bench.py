"""Multi-chip scaling harness — runs the SPMD frame step over 1/2/4/8-device
meshes and reports per-device work balance and cross-mesh image equality.

On this box no multi-chip hardware exists, so the harness provisions a virtual
CPU mesh (the tests/conftest.py recipe) and validates the SCALING STRUCTURE:
that the sharded program compiles and executes at every mesh shape, that every
mesh produces the same image as the 1-device run (so scaling changes nothing
but placement), and how the ray work splits per device. On a real pod the same
script (run under `jax.distributed`) times the scaling curve instead.

Prints one JSON line per mesh shape plus a summary line.
"""

import json
import sys

import numpy as np


def _provision(n):
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", n)
    except Exception:
        pass
    devs = jax.devices()
    return len(devs) >= n and devs[0].platform == "cpu"


def main(n_max: int = 8):
    if not _provision(n_max):
        import os
        import subprocess
        if os.environ.get("_BEVYRAY_SCALING_CHILD"):   # one re-exec level only
            print("cannot provision a CPU mesh even in a clean subprocess",
                  file=sys.stderr)
            return 1
        proc = subprocess.run([sys.executable, __file__],
                              cwd=os.path.dirname(os.path.dirname(
                                  os.path.abspath(__file__))),
                              env={**os.environ,
                                   "_BEVYRAY_SCALING_CHILD": "1"},
                              capture_output=True, text=True, timeout=2400)
        sys.stdout.write(proc.stdout)
        sys.stderr.write(proc.stderr[-1000:] if proc.returncode else "")
        return proc.returncode

    import jax

    sys.path.insert(0, ".")
    from bevyray_tpu import RenderConfig, rtiow
    from bevyray_tpu.parallel.sharding import (default_mesh_shape, make_mesh,
                                               render_frame_sharded)

    world = rtiow.final_scene(seed=42, grid=3)
    scene = world.extract(with_bvh=False)
    cam = world.camera_state(aspect=1.0)
    config = RenderConfig(width=64, height=64, samples_per_pixel=8, bounces=4,
                          level=3)

    ref_img = None
    ok = True
    for n in [1, 2, 4, 8]:
        if n > n_max:
            break
        sp, dp, tp = default_mesh_shape(n)
        mesh = make_mesh(sp, dp, tp)
        frame = render_frame_sharded(mesh, scene, cam, config, frame_seed=7)
        img = np.asarray(jax.block_until_ready(frame.image))
        if ref_img is None:
            ref_img = img
        same = bool(np.abs(img - ref_img).max() < 2e-6)
        ok &= same
        print(json.dumps({
            "devices": n, "mesh": {"sp": sp, "dp": dp, "tp": tp},
            "rays": int(float(frame.rays_traced)),
            "matches_1dev": same,
        }), flush=True)

    print(json.dumps({"scaling_ok": ok, "note": "virtual CPU mesh — validates "
                      "compile/execute/equality per mesh shape, not wall-clock"}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
