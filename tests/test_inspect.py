"""cli inspect: bounded artifact identification for every deployable
file the framework produces/consumes — no device backend touched (the
stablehlo case parses only the envelope header, never deserializing
the compiled program)."""

import contextlib
import io
import json
import struct

import numpy as np

from camradepth_tpu import cli


def _run(argv):
    buf, err = io.StringIO(), io.StringIO()
    with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(err):
        rc = cli.main(argv)
    return rc, buf.getvalue(), err.getvalue()


def _fake_artifact(path, header):
    hdr = json.dumps(header).encode()
    path.write_bytes(b"CRDSHLO1" + struct.pack("<Q", len(hdr)) + hdr
                     + b"\x00" * 100)


def test_inspect_stablehlo_header_only(tmp_path):
    art = tmp_path / "m.stablehlo"
    _fake_artifact(art, {
        "format": "camradepth-stablehlo", "version": 1,
        "batch_size": 8, "img_size": [416, 800], "input_channels": 7,
        "decode_depth": True, "variant": "base", "tpu_decoder": False,
        "max_depth": 100.0, "platforms": ["cpu", "tpu"],
        "artifact_dtype": "bfloat16",
    })
    rc, out, _ = _run(["inspect", str(art)])
    assert rc == 0
    info = json.loads(out)
    assert info["type"] == "stablehlo-artifact"
    assert info["header"]["batch_size"] == 8
    assert info["compiled_blob_bytes"] == 100  # parsed, not executed


def test_inspect_orbax_run_dir(tmp_path):
    from camradepth_tpu.utils import checkpoint as ck

    state = {"params": {"w": np.ones((3, 3), np.float32)}}
    ck.save_checkpoint(tmp_path, state, epoch=0, eval_loss=0.75)
    ck.save_checkpoint(tmp_path, state, epoch=1, eval_loss=0.5)
    rc, out, _ = _run(["inspect", str(tmp_path)])
    assert rc == 0
    info = json.loads(out)
    assert info["type"] == "orbax-run-dir"
    assert len(info["checkpoints"]) == 2
    assert {c["epoch"] for c in info["checkpoints"]} == {1, 2}
    assert "epoch_2" in info["latest"]
    assert all(c["bytes"] > 0 for c in info["checkpoints"])


def test_inspect_pth(tmp_path):
    import torch

    p = tmp_path / "w.pth"
    torch.save({"state_dict": {"a": torch.zeros(4, 2),
                               "b": torch.zeros(3)},
                "lr": 6e-5}, p)
    rc, out, _ = _run(["inspect", str(p)])
    assert rc == 0
    info = json.loads(out)
    assert info["type"] == "reference-pth"
    assert info["tensors"] == 2
    assert info["params"] == 11
    assert info["extra_keys"] == ["lr"]
    # a BARE state dict (no wrapper) must not spray tensor names into
    # extra_keys
    bare = tmp_path / "bare.pth"
    torch.save({"a": torch.zeros(2), "b": torch.zeros(2)}, bare)
    rc, out, _ = _run(["inspect", str(bare)])
    assert rc == 0
    info = json.loads(out)
    assert info["tensors"] == 2 and info["extra_keys"] == []


def test_inspect_split_table(tmp_path):
    rows = np.array([[f"{i:05d}_{s}" for s in
                      ("im.jpg", "im_next.jpg", "gt.npy", "msk.npy",
                       "radar.npy", "uv.npy", "vel.npy")]
                     for i in range(3)])
    p = tmp_path / "split.npy"
    np.save(p, rows)
    rc, out, _ = _run(["inspect", str(p)])
    assert rc == 0
    info = json.loads(out)
    assert info["type"] == "split-table"
    assert info["shape"] == [3, 7]
    assert info["first_row"][0] == "00000_im.jpg"


def test_inspect_run_dir_with_preempt_save(tmp_path):
    """A graceful-shutdown save shows up in the listing with its step
    (no val loss — it holds a partial epoch) and wins `latest` over a
    regular save of the same completed-epoch count."""
    from camradepth_tpu.utils import checkpoint as ck

    state = {"params": {"w": np.ones((3, 3), np.float32)}}
    ck.save_checkpoint(tmp_path, state, epoch=0, eval_loss=0.75)
    pre = tmp_path / "ckpt_preempt_epoch_1_step_42"
    pre.mkdir()
    (pre / "blob").write_bytes(b"x" * 16)
    rc, out, _ = _run(["inspect", str(tmp_path)])
    assert rc == 0
    info = json.loads(out)
    assert info["type"] == "orbax-run-dir"
    by_name = {c["name"]: c for c in info["checkpoints"]}
    entry = by_name["ckpt_preempt_epoch_1_step_42"]
    assert entry["preempt"] and entry["step"] == 42 and entry["epoch"] == 1
    assert "eval_loss" not in entry
    assert info["latest"].endswith("ckpt_preempt_epoch_1_step_42")

    # inspecting the preempt ckpt dir DIRECTLY also works
    rc, out, _ = _run(["inspect", str(pre)])
    assert rc == 0
    info = json.loads(out)
    assert [c["name"] for c in info["checkpoints"]] == [
        "ckpt_preempt_epoch_1_step_42"
    ]


def test_inspect_errors(tmp_path):
    rc, _, err = _run(["inspect", str(tmp_path / "missing.pth")])
    assert rc == 2 and "does not exist" in err
    junk = tmp_path / "junk.bin"
    junk.write_bytes(b"nope")
    rc, _, err = _run(["inspect", str(junk)])
    assert rc == 2 and "unrecognized" in err
    rc, _, err = _run(["inspect", str(tmp_path)])  # empty dir
    assert rc == 2 and "no ckpt_epoch_" in err
