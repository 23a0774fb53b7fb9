"""CLI entry points end-to-end (SURVEY.md C1/L6): render, flythrough,
view (HTML + APNG), tiled render — tiny scenes on the oracle/CPU path.
"""

import numpy as np

from hmrt_tpu.cli.render import main as render_main
from hmrt_tpu.cli.view import main as view_main
from hmrt_tpu.io.image import read_png


def test_render_cli_png(tmp_path):
    out = str(tmp_path / "r.png")
    rc = render_main(["--size", "64", "--width", "48", "--height", "32",
                      "--shadows", "--fog", "-o", out])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (32, 48, 3)
    assert img.max() > 0


def test_render_cli_aux(tmp_path):
    out = str(tmp_path / "r.png")
    rc = render_main(["--size", "64", "--width", "32", "--height", "24",
                      "--aux", "-o", out])
    assert rc == 0
    depth = np.load(str(tmp_path / "r_depth.npy"))
    assert depth.shape == (24, 32)
    assert read_png(str(tmp_path / "r_normal.png")).shape == (24, 32, 3)


def test_render_cli_tiled(tmp_path):
    out = str(tmp_path / "t.png")
    rc = render_main(["--size", "80", "--width", "32", "--height", "24",
                      "--tile", "48", "-o", out])
    assert rc == 0
    assert read_png(out).shape == (24, 32, 3)


def test_flythrough_and_view_cli(tmp_path):
    stack = str(tmp_path / "fly.npy")
    rc = render_main(["--size", "64", "--width", "32", "--height", "24",
                      "--flythrough", "3", "-o", stack])
    assert rc == 0
    frames = np.load(stack)
    assert frames.shape == (3, 24, 32, 3)

    html = str(tmp_path / "fly.html")
    assert view_main([stack, "-o", html]) == 0
    text = open(html).read()
    assert "data:image/png;base64," in text

    apng = str(tmp_path / "fly.apng")
    assert view_main([stack, "-o", apng]) == 0
    data = open(apng, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n" and b"acTL" in data
