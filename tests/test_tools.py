"""Offline tools: TFRecord converter round-trip, stats, compression, plots."""

import json
import os
import pickle
import struct

import numpy as np

from fluid_llm_tpu.tools.convert_mgn import convert_split, iter_tfrecords, parse_example
from fluid_llm_tpu.tools.dataset_io import compress_file, decompress_file, integrity_check
from fluid_llm_tpu.tools.ds_stats import Welford, compute_dataset_stats


# -- protobuf/TFRecord writers used only by this test ------------------------


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        out += bytes([b | (0x80 if n else 0)])
        if not n:
            return out


def _len_delim(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def encode_example(features: dict[str, list[bytes]]) -> bytes:
    feats = b""
    for key, values in features.items():
        bytes_list = b"".join(_len_delim(1, v) for v in values)
        feature = _len_delim(1, bytes_list)  # Feature.bytes_list
        entry = _len_delim(1, key.encode()) + _len_delim(2, feature)
        feats += _len_delim(1, entry)  # Features.feature map entry
    return _len_delim(1, feats)  # Example.features


def write_tfrecord(path: str, records: list[bytes]):
    with open(path, "wb") as f:
        for rec in records:
            f.write(struct.pack("<Q", len(rec)))
            f.write(b"\x00" * 4)  # crc (unchecked by the reader)
            f.write(rec)
            f.write(b"\x00" * 4)


def test_tfrecord_converter_round_trip(tmp_path, rng):
    T, N, F = 4, 7, 5
    meta = {
        "trajectory_length": T,
        "field_names": ["velocity", "mesh_pos", "cells", "node_type", "pressure"],
        "features": {
            "velocity": {"dtype": "float32", "type": "dynamic", "shape": [T, N, 2]},
            "pressure": {"dtype": "float32", "type": "dynamic", "shape": [T, N, 1]},
            "mesh_pos": {"dtype": "float32", "type": "static", "shape": [1, N, 2]},
            "cells": {"dtype": "int32", "type": "static", "shape": [1, F, 3]},
            "node_type": {"dtype": "int32", "type": "static", "shape": [1, N, 1]},
        },
    }
    vel = rng.normal(size=(T, N, 2)).astype(np.float32)
    press = rng.normal(size=(T, N, 1)).astype(np.float32)
    pos = rng.normal(size=(1, N, 2)).astype(np.float32)
    cells = rng.integers(0, N, size=(1, F, 3)).astype(np.int32)
    ntype = rng.integers(0, 7, size=(1, N, 1)).astype(np.int32)

    example = encode_example(
        {
            "velocity": [vel.tobytes()],
            "pressure": [press.tobytes()],
            "mesh_pos": [pos.tobytes()],
            "cells": [cells.tobytes()],
            "node_type": [ntype.tobytes()],
        }
    )
    ds_dir = tmp_path / "raw"
    ds_dir.mkdir()
    (ds_dir / "meta.json").write_text(json.dumps(meta))
    write_tfrecord(str(ds_dir / "train.tfrecord"), [example, example])

    # low-level parse
    recs = list(iter_tfrecords(str(ds_dir / "train.tfrecord")))
    assert len(recs) == 2
    parsed = parse_example(recs[0])
    assert set(parsed) == set(meta["features"])

    out_dir = tmp_path / "pkl"
    n = convert_split(str(ds_dir), "train", str(out_dir))
    assert n == 2
    with open(out_dir / "save_0.pkl", "rb") as f:
        saved = pickle.load(f)
    np.testing.assert_array_equal(saved["velocity"], vel)
    np.testing.assert_array_equal(saved["mesh_pos"], pos[0])
    assert saved["cells"].dtype == np.int16  # int16 narrowing
    np.testing.assert_array_equal(saved["cells"], cells[0])


def test_welford_matches_numpy(rng):
    w = Welford()
    chunks = [rng.normal(size=(100,)) * 3 + 1 for _ in range(5)]
    for c in chunks:
        w.update(c)
    allv = np.concatenate(chunks)
    np.testing.assert_allclose(w.mean, allv.mean(), rtol=1e-10)
    np.testing.assert_allclose(w.std, allv.std(), rtol=1e-10)


def test_dataset_stats_runs():
    from fluid_llm_tpu.data.synthetic import SyntheticCylinderDataset

    ds = SyntheticCylinderDataset(n_trajectories=2, resolution=32, max_steps=50)
    stats = compute_dataset_stats(ds, n_samples=1)
    assert set(stats) == {0, 1, 2}
    assert stats[0]["state_std"] > 0


def test_compress_and_integrity(tmp_path):
    p = tmp_path / "a.pkl"
    with open(p, "wb") as f:
        pickle.dump({"x": 1}, f)
    xz = compress_file(str(p))
    os.remove(p)
    back = decompress_file(xz)
    with open(back, "rb") as f:
        assert pickle.load(f) == {"x": 1}
    (tmp_path / "bad.pkl").write_bytes(b"not a pickle")
    bad = integrity_check(str(tmp_path))
    assert len(bad) == 1 and bad[0].endswith("bad.pkl")


def test_plotting_smoke(tmp_path, rng):
    from fluid_llm_tpu.data.synthetic import make_cylinder_mesh
    from fluid_llm_tpu.tools.plotting import assemble_grid, plot_field, plot_mesh, plot_patches

    pos, faces = make_cylinder_mesh(0, 10, 6)
    plot_mesh(pos, faces, rng.normal(size=len(pos)), str(tmp_path / "mesh.png"))
    plot_patches(rng.normal(size=(6, 8, 8)), (3, 2), str(tmp_path / "patches.png"))
    plot_field(rng.normal(size=(40, 12)), str(tmp_path / "field.png"))
    assemble_grid(
        [[str(tmp_path / "field.png")] * 2] * 2,
        str(tmp_path / "grid.png"),
        row_labels=["a", "b"], col_labels=["t0", "t1"],
    )
    for f in ["mesh.png", "patches.png", "field.png", "grid.png"]:
        assert (tmp_path / f).stat().st_size > 0


def test_kernel_fallback_strict_and_logging(monkeypatch, caplog):
    """kernel_fallback: logs once by default, raises under strict mode."""
    import logging

    from fluid_llm_tpu import utils

    utils._fallback_warned.clear()
    monkeypatch.delenv("FLUID_STRICT_KERNELS", raising=False)
    with caplog.at_level(logging.WARNING, logger="fluid_llm_tpu.kernels"):
        utils.kernel_fallback("test-site", RuntimeError("boom"))
        utils.kernel_fallback("test-site", RuntimeError("boom"))
    assert sum("test-site" in r.message for r in caplog.records) == 1

    monkeypatch.setenv("FLUID_STRICT_KERNELS", "1")
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="boom"):
        utils.kernel_fallback("other-site", RuntimeError("boom"))


def test_config_yaml_surface():
    """The typed Config parses the shipped YAMLs (same key surface as the
    reference's configs/training1.yaml) and rejects typos loudly."""
    import pytest

    from fluid_llm_tpu.config import Config

    cfg = Config.from_yaml("configs/training1.yaml")
    assert cfg.llm_backbone == "facebook/opt-125m"
    assert cfg.lora_config.r == 16 and cfg.lora_config.use_dora
    assert cfg.patch_size == (16, 16) and cfg.resolution == 238
    assert cfg.loss_weighting == [0.1, 10] and cfg.pressure_weight == 0.1

    moe = Config.from_yaml("configs/moe_cylinder.yaml")
    assert moe.moe.experts == 4 and moe.moe.top_k == 2

    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write("llm_backbone: gpt2\nlerning_rate: 1e-3\n")
    with pytest.raises(ValueError, match="lerning_rate"):
        Config.from_yaml(f.name)
