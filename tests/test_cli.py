"""CLI tests: flag parity, job planning, directory mode, error handling."""

import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from rife_tpu.cli import (
    guess_format,
    main,
    parse_jobs,
    plan_directory_jobs,
)


def write_frames(d: Path, n=4, h=32, w=32):
    rng = np.random.default_rng(0)
    base = rng.integers(50, 200, (h, w, 3)).astype(np.uint8)
    for i in range(n):
        img = np.clip(base.astype(int) + 12 * i, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(d / f"{i:03d}.png")


def test_parse_jobs():
    assert parse_jobs("1:2:2") == (1, [2], 2)
    assert parse_jobs("2:2,4,4:3") == (2, [2, 4, 4], 3)
    with pytest.raises(ValueError):
        parse_jobs("1:2")


def test_guess_format():
    assert guess_format("out.png", "%08d.png") == ("%08d", "png")
    assert guess_format("out.WEBP", "%08d.png") == ("%08d", "webp")
    assert guess_format("out.jpeg", "%08d.png") == ("%08d", "jpg")
    with pytest.raises(ValueError):
        guess_format("out.tiff", "%08d.png")
    # directory output keeps the -f format; bare-extension -f works
    assert guess_format(os.getcwd(), "webp") == ("%08d", "webp")
    assert guess_format(os.getcwd(), "%06d.jpg") == ("%06d", "jpg")


def test_plan_directory_jobs(tmp_path):
    write_frames(tmp_path, n=4)
    out = tmp_path / "out"
    out.mkdir()
    jobs = plan_directory_jobs(str(tmp_path), str(out), 0, "%08d", "png")
    assert len(jobs) == 8  # default numframe = 2N
    # i*scale semantics: even outputs are copies (t=0), odd are midpoints
    assert jobs[0][3] == 0.0 and jobs[1][3] == 0.5
    assert jobs[0][0].endswith("000.png") and jobs[0][1].endswith("001.png")
    # clamping at the end: last frame maps to (count-2, count-1, t=1)
    jobs3 = plan_directory_jobs(str(tmp_path), str(out), 9, "%08d", "png")
    assert jobs3[-1][3] == 1.0
    assert jobs3[-1][0].endswith("002.png") and jobs3[-1][1].endswith("003.png")
    assert jobs[0][2].endswith("00000001.png")  # ffmpeg: names start at 1


def test_cli_single_pair(tmp_path):
    write_frames(tmp_path, n=2)
    out = tmp_path / "mid.png"
    rc = main(["-0", str(tmp_path / "000.png"), "-1", str(tmp_path / "001.png"),
               "-o", str(out), "-m", "rife-v4.6", "-s", "0.25", "-g", "-1"])
    assert rc == 0
    img = np.asarray(Image.open(out))
    assert img.shape == (32, 32, 3)


def test_cli_directory_mode(tmp_path):
    ind = tmp_path / "in"
    outd = tmp_path / "out"
    ind.mkdir(), outd.mkdir()
    write_frames(ind, n=3)
    rc = main(["-i", str(ind), "-o", str(outd), "-m", "rife-v4.6",
               "-n", "6", "-g", "-1"])
    assert rc == 0
    names = sorted(os.listdir(outd))
    assert names == [f"{i:08d}.png" for i in range(1, 7)]
    # frame 1 is a copy of input frame 0 (t=0 shortcut)
    np.testing.assert_array_equal(
        np.asarray(Image.open(outd / "00000001.png")),
        np.asarray(Image.open(ind / "000.png")),
    )


def test_cli_validation_errors(tmp_path):
    write_frames(tmp_path, n=2)
    a, b = str(tmp_path / "000.png"), str(tmp_path / "001.png")
    # missing output
    assert main(["-0", a, "-1", b]) == 255
    # bad timestep
    assert main(["-0", a, "-1", b, "-o", str(tmp_path / "o.png"), "-s", "1.5"]) == 255
    # custom timestep on non-v4 model
    assert main(["-0", a, "-1", b, "-o", str(tmp_path / "o.png"),
                 "-m", "rife-v2.3", "-s", "0.3"]) == 255
    # custom numframe on non-v4 model
    assert main(["-i", str(tmp_path), "-o", str(tmp_path), "-m", "rife-v2.3",
                 "-n", "7"]) == 255
    # bad extension
    assert main(["-0", a, "-1", b, "-o", str(tmp_path / "o.tiff")]) == 255
    # unknown model type
    assert main(["-0", a, "-1", b, "-o", str(tmp_path / "o.png"),
                 "-m", "unknown-model"]) == 255
    # bad -j
    assert main(["-0", a, "-1", b, "-o", str(tmp_path / "o.png"),
                 "-j", "0:1:1"]) == 255


def test_cli_multihost_ranks_produce_disjoint_complete_outputs(tmp_path, monkeypatch):
    """Multi-host directory mode: two ranks (RIFE_TPU_RANK/WORLD) must write
    disjoint subsets whose union is the full output set (SURVEY.md §5 static
    file-range partitioning — no inter-host communication)."""
    ind = tmp_path / "in"
    ind.mkdir()
    write_frames(ind, n=3)
    argv_base = ["-i", str(ind), "-m", "rife-v4.6", "-n", "6", "-g", "-1"]
    written = {}
    monkeypatch.setenv("RIFE_TPU_WORLD", "2")
    for rank in (0, 1):
        outd = tmp_path / f"out{rank}"
        outd.mkdir()
        monkeypatch.setenv("RIFE_TPU_RANK", str(rank))
        assert main(argv_base + ["-o", str(outd)]) == 0
        written[rank] = set(os.listdir(outd))
    assert written[0] and written[1]
    assert written[0].isdisjoint(written[1])
    assert written[0] | written[1] == {f"{i:08d}.png" for i in range(1, 7)}


def test_cli_mesh_mode_matches_single_device(tmp_path):
    """-g all (ONE mesh-sharded session, batch axis over every chip) must
    produce byte-identical frames to a single-device run. On the test env's
    8-device virtual CPU mesh both paths run f32, so equality is exact."""
    ind = tmp_path / "in"
    ind.mkdir()
    write_frames(ind, n=3)
    outs = {}
    for tag, gflag in (("single", "-1"), ("mesh", "all")):
        outd = tmp_path / tag
        outd.mkdir()
        rc = main(["-i", str(ind), "-o", str(outd), "-m", "rife-v4.6",
                   "-n", "6", "-g", gflag])
        assert rc == 0
        outs[tag] = {
            n: np.asarray(Image.open(outd / n)) for n in sorted(os.listdir(outd))
        }
    assert outs["single"].keys() == outs["mesh"].keys()
    for name in outs["single"]:
        np.testing.assert_array_equal(outs["single"][name], outs["mesh"][name])


def test_cli_sniffs_family_from_resolved_path(tmp_path):
    """-m pointing at a dir whose LEAF name isn't a rife name must still
    sniff from the full path (cli and loader agree; VERDICT weak #7)."""
    import shutil

    src = Path("/root/reference/models/rife-v4.6")
    dst = tmp_path / "rife-v4-stuff" / "m"
    dst.mkdir(parents=True)
    shutil.copy(src / "flownet.param", dst / "flownet.param")
    write_frames(tmp_path, n=2)
    out = tmp_path / "mid.png"
    rc = main(["-0", str(tmp_path / "000.png"), "-1", str(tmp_path / "001.png"),
               "-o", str(out), "-m", str(dst), "-g", "-1"])
    assert rc == 0 and out.exists()


def test_cli_multiframe_single_pair(tmp_path):
    """Extension: -0/-1 + directory output + -n N produces N frames at
    evenly spaced timesteps (v4 only)."""
    write_frames(tmp_path, n=2)
    outd = tmp_path / "out"
    outd.mkdir()
    rc = main(["-0", str(tmp_path / "000.png"), "-1", str(tmp_path / "001.png"),
               "-o", str(outd), "-n", "3", "-m", "rife-v4.6", "-g", "-1"])
    assert rc == 0
    names = sorted(os.listdir(outd))
    assert names == [f"{i:08d}.png" for i in range(1, 4)]
    imgs = [np.asarray(Image.open(outd / n)).astype(int) for n in names]
    assert not np.array_equal(imgs[0], imgs[1])
    assert not np.array_equal(imgs[1], imgs[2])
    # non-v4 models reject it
    rc = main(["-0", str(tmp_path / "000.png"), "-1", str(tmp_path / "001.png"),
               "-o", str(outd), "-n", "3", "-m", "rife-v2.3", "-g", "-1"])
    assert rc == 255
