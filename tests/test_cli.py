"""CLI surface tests: flag parsing and tiny end-to-end runs through main()."""

import json
import os

import numpy as np
import pytest

from style_transfer_tpu.cli import build_parser, main
from style_transfer_tpu.utils import imgio


@pytest.fixture()
def images(tmp_path):
    r = np.random.RandomState(0)
    content = str(tmp_path / "content.png")
    style = str(tmp_path / "style.png")
    imgio.save_image(r.rand(40, 32, 3).astype(np.float32), content)
    imgio.save_image(r.rand(32, 40, 3).astype(np.float32), style)
    return content, style


FAST = [
    "--size", "32", "--min-scale", "32", "--iterations", "4", "--chunk-size", "2",
    "--content-layers", "conv2_2", "--style-layers", "conv1_1", "conv2_1",
    "--random-weights", "--unfused", "--devices", "0", "--print-every", "100",
]


def test_parser_defaults():
    args = build_parser().parse_args(["c.png", "s.png"])
    assert args.size == 512 and args.min_scale == 256
    assert args.iterations == [500]
    assert args.optimizer == "adam"
    assert args.style_layers == ["conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"]
    assert args.content_layers == ["conv4_2"]
    assert args.output == "out.png"


def test_parser_multi_style():
    args = build_parser().parse_args(
        ["c.png", "s1.png", "s2.png", "--style-blend-weights", "0.7", "0.3"]
    )
    assert args.styles == ["s1.png", "s2.png"]
    assert args.style_blend_weights == [0.7, 0.3]


def test_cli_end_to_end(tmp_path, images):
    content, style = images
    out = str(tmp_path / "result.png")
    metrics = str(tmp_path / "metrics.json")
    rc = main([content, style, "-o", out, "--metrics-out", metrics] + FAST)
    assert rc == 0
    assert os.path.exists(out)
    result = imgio.load_image(out)
    assert result.shape == (32, 26, 3)  # 40x32 -> long side 32, even-rounded
    with open(metrics) as f:
        data = json.load(f)
    assert data["records"] and "its_per_sec" in data["records"][0]


def test_cli_requires_weights(tmp_path, images, capsys):
    content, style = images
    rc = main([content, style, "-o", str(tmp_path / "o.png"), "--size", "32"])
    assert rc == 2
    assert "weights" in capsys.readouterr().err


def test_cli_init_from_image_path(tmp_path, images):
    content, style = images
    rc = main([content, style, "-o", str(tmp_path / "o.png"), "--init", style] + FAST)
    assert rc == 0


def test_cli_snapshots(tmp_path, images):
    content, style = images
    out = str(tmp_path / "snap.png")
    rc = main([content, style, "-o", out, "--snapshot-every", "2"] + FAST)
    assert rc == 0
    assert os.path.exists(str(tmp_path / "snap_snapshot.png"))


def test_cli_lbfgs_and_convergence_flags(tmp_path, images):
    content, style = images
    rc = main(
        [content, style, "-o", str(tmp_path / "o.png"), "--optimizer", "lbfgs",
         "--stop-tol", "1.0", "--stop-patience", "1"] + FAST
    )
    assert rc == 0


def test_config_toml_defaults_and_override(tmp_path, images):
    content, style = images
    cfgfile = tmp_path / "run.toml"
    cfgfile.write_text(
        'size = 32\nmin-scale = 32\niterations = [4]\nchunk-size = 2\n'
        'content-layers = ["conv2_2"]\nstyle-layers = ["conv1_1"]\n'
        'random-weights = true\nunfused = true\ndevices = 0\n'
    )
    out = str(tmp_path / "o.png")
    rc = main([content, style, "-o", out, "--config", str(cfgfile)])
    assert rc == 0 and os.path.exists(out)
    # CLI flag overrides config value
    rc = main([content, style, "-o", out, "--config", str(cfgfile), "--iterations", "2"])
    assert rc == 0


def test_config_toml_rejects_unknown_key(tmp_path, images):
    content, style = images
    cfgfile = tmp_path / "bad.toml"
    cfgfile.write_text("sizee = 32\n")
    with pytest.raises(SystemExit, match="unknown config key"):
        main([content, style, "--config", str(cfgfile)])


def test_shipped_configs_parse(images):
    import glob

    content, style = images
    parser = build_parser()
    parser.add_argument("--config", default=None)
    from style_transfer_tpu.cli import load_config_defaults

    files = glob.glob("configs/*.toml")
    assert len(files) == 5
    for f in files:
        load_config_defaults(build_parser(), f)  # raises on any unknown key


def test_list_layers_and_version(capsys):
    import pytest

    from style_transfer_tpu.cli import build_parser

    with pytest.raises(SystemExit) as e:
        build_parser().parse_args(["--list-layers"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "vgg19: conv1_1" in out and "vgg16:" in out and "conv5_4" in out

    with pytest.raises(SystemExit) as e:
        build_parser().parse_args(["--version"])
    assert e.value.code == 0


def test_cli_metrics_out(tmp_path, content_style_paths=None):
    import json

    import numpy as np

    from style_transfer_tpu.cli import main
    from style_transfer_tpu.utils.imgio import save_image

    r = np.random.RandomState(0)
    c, s = str(tmp_path / "c.png"), str(tmp_path / "s.png")
    save_image(r.rand(32, 32, 3).astype(np.float32), c)
    save_image(r.rand(32, 32, 3).astype(np.float32), s)
    out = str(tmp_path / "o.png")
    metrics = str(tmp_path / "m.json")
    rc = main([c, s, "-o", out, "--size", "32", "--min-scale", "32",
               "--iterations", "4", "--chunk-size", "2", "--random-weights",
               "--style-layers", "conv1_1", "conv2_1",
               "--metrics-out", metrics, "--debug-checks"])
    assert rc == 0
    with open(metrics) as f:
        rec = json.load(f)
    assert rec["records"] and "its_per_sec" in rec["records"][0]
    assert rec["summary"]["final_loss"] > 0


def test_cli_profile_dir(tmp_path):
    import glob

    import numpy as np

    from style_transfer_tpu.cli import main
    from style_transfer_tpu.utils.imgio import save_image

    r = np.random.RandomState(0)
    c, s = str(tmp_path / "c.png"), str(tmp_path / "s.png")
    save_image(r.rand(32, 32, 3).astype(np.float32), c)
    save_image(r.rand(32, 32, 3).astype(np.float32), s)
    prof = str(tmp_path / "trace")
    rc = main([c, s, "-o", str(tmp_path / "o.png"), "--size", "32",
               "--min-scale", "32", "--iterations", "2", "--chunk-size", "2",
               "--random-weights", "--style-layers", "conv1_1",
               "--profile-dir", prof])
    assert rc == 0
    assert glob.glob(prof + "/plugins/profile/*/*.xplane.pb"), "no trace captured"


def test_cli_checkpoint_every(tmp_path, images):
    content, style = images
    ckdir = tmp_path / "ck"
    rc = main(
        [content, style, "-o", str(tmp_path / "o.png"),
         "--checkpoint-dir", str(ckdir), "--checkpoint-every", "2"] + FAST
    )
    assert rc == 0
    steps = sorted(
        int(p.name.split("_")[1]) for p in ckdir.iterdir() if p.name.startswith("step_")
    )
    # FAST runs 4 iterations; every=2 crosses the 2 and 4 boundaries.
    assert steps == [2, 4]


def test_example_script_runs(tmp_path, monkeypatch):
    """examples/stylize.py is user-facing documentation — keep it runnable
    straight from a checkout (run in-process to share the session's jit
    caches; a fresh subprocess pays minutes of cold CPU compiles)."""
    import importlib.util
    import sys

    import numpy as np
    from PIL import Image

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = np.random.RandomState(0)
    content = tmp_path / "c.png"
    style = tmp_path / "s.png"
    out = tmp_path / "o.png"
    Image.fromarray((r.rand(48, 40, 3) * 255).astype("uint8")).save(content)
    Image.fromarray((r.rand(40, 40, 3) * 255).astype("uint8")).save(style)

    spec = importlib.util.spec_from_file_location(
        "example_stylize", os.path.join(root, "examples", "stylize.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", [
        "stylize.py", str(content), str(style), "-o", str(out),
        "--size", "48", "--iterations", "6",
    ])
    assert mod.main() == 0
    assert out.exists() and Image.open(out).size[0] > 0
