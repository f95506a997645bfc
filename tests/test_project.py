"""Persistence layer tests: migrations, workspace upsert, blob streams."""

import numpy as np
import pytest

from mixlab_tpu import protocol as p
from mixlab_tpu.engine.project import (
    STREAM_BLOB_SIZE,
    ProjectBase,
    ProjectHandle,
    open_or_create,
)
from mixlab_tpu.protocol import InputId, OutputId


def test_migrations_idempotent(tmp_path):
    path = tmp_path / "test.mixlab"
    base = ProjectBase(path)
    base.close()
    base2 = ProjectBase(path)  # reopen: migrations already applied
    row = base2.query_one("SELECT version FROM schema_migrations")
    assert row[0] == 20200805
    base2.close()


def test_workspace_upsert_roundtrip(tmp_path):
    base = ProjectBase(tmp_path / "w.mixlab")
    assert base.read_workspace() is None
    base.write_workspace({"module_seq": 3, "modules": {}})
    base.write_workspace({"module_seq": 4, "modules": {}})
    assert base.read_workspace()["module_seq"] == 4
    # single row (upsert at rowid 1)
    assert base.query_one("SELECT COUNT(*) FROM workspace")[0] == 1
    base.close()


def test_blob_stream_chunking_and_seek(tmp_path):
    base = ProjectBase(tmp_path / "b.mixlab")
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, STREAM_BLOB_SIZE * 2 + 12345, dtype=np.uint8).tobytes()
    w = base.create_stream()
    # write in odd-sized pieces to exercise buffering
    for i in range(0, len(data), 700_001):
        w.write(data[i : i + 700_001])
    sid = w.finalize()

    # three blob rows: 1MiB, 1MiB, tail
    rows = base.query_all(
        "SELECT offset, LENGTH(data) FROM blobs WHERE stream_id = ? ORDER BY offset",
        (sid,),
    )
    assert [r[0] for r in rows] == [0, STREAM_BLOB_SIZE, 2 * STREAM_BLOB_SIZE]
    assert rows[-1][1] == 12345

    r = base.open_stream(sid)
    assert r.size == len(data)
    assert r.read(100) == data[:100]
    r.seek(STREAM_BLOB_SIZE - 50)
    assert r.read(100) == data[STREAM_BLOB_SIZE - 50 : STREAM_BLOB_SIZE + 50]
    r.seek(-10, 2)
    assert r.read() == data[-10:]
    base.close()


def test_project_handle_engine_persistence(tmp_path):
    path = tmp_path / "proj.mixlab"
    proj = open_or_create(path)
    sid, _, _ = proj.engine.connect_session()
    proj.engine.client_update(
        sid,
        p.WorkspaceMessage(1, p.CreateModule(
            p.ModuleParams("Oscillator", p.OscillatorParams(123.0, p.Waveform.SAW)),
            p.WindowGeometry(),
        )),
    )
    proj.close()

    # reopen: module restored
    proj2 = open_or_create(path)
    _, state, _ = proj2.engine.connect_session()
    assert len(state.modules) == 1
    mid, params = state.modules[0]
    assert params.kind == "Oscillator"
    assert params.params.freq == 123.0
    proj2.close()


def test_media_library(tmp_path):
    proj = open_or_create(tmp_path / "m.mixlab")
    media_id = proj.upload_media("song.wav", "audio/wav", [b"abc", b"def"])
    lib = proj.base.media_library()
    assert len(lib.items) == 1
    assert lib.items[0].name == "song.wav"
    assert lib.items[0].size == 6
    r = proj.base.open_media(media_id)
    assert r.read() == b"abcdef"
    proj.close()
