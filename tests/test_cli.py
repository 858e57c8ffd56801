"""CLI smoke tests: render/accumulate/bench through the argparse front-end."""

import json
import os

import numpy as np

from bevyray_tpu.app.cli import main


def test_cli_render(tmp_path, capsys):
    out = str(tmp_path / "x.png")
    rc = main(["render", "--scene", "material", "--width", "32", "--height", "24",
               "--spp", "1", "--bounces", "2", "--out", out])
    assert rc == 0
    assert os.path.getsize(out) > 100
    assert "Mrays/s" in capsys.readouterr().out


def test_cli_accumulate(tmp_path, capsys):
    out = str(tmp_path / "acc.png")
    rc = main(["accumulate", "--scene", "simple", "--width", "16", "--height", "16",
               "--spp", "1", "--bounces", "2", "--passes", "2", "--out", out])
    assert rc == 0
    assert "accumulated 2 spp" in capsys.readouterr().out


def test_cli_bench_json(capsys):
    rc = main(["bench", "--scene", "simple", "--width", "16", "--height", "16",
               "--spp", "1", "--bounces", "1", "--frames", "2"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert {"metric", "value", "unit", "p50_frame_ms"} <= set(rec)
    assert rec["value"] > 0


def test_cli_render_pallas_backend(tmp_path):
    out = str(tmp_path / "p.png")
    rc = main(["render", "--scene", "material", "--width", "16", "--height", "16",
               "--spp", "1", "--bounces", "2", "--backend", "pallas", "--out", out])
    assert rc == 0
    assert os.path.getsize(out) > 100
