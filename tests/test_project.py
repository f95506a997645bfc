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


def test_reference_migration_version_ids():
    """Version identifiers match the reference's migration set
    (src/db/mod.rs:28-60): a project file created by the reference opens
    here without re-running its migrations."""
    from mixlab_tpu.engine.project import MIGRATIONS

    assert [v for v, _ in sorted(MIGRATIONS)] == [0, 20200804, 20200805]


def test_upgrade_from_20200804_preserves_media(tmp_path):
    """A v20200804 project (media/streams/blobs, no workspace table — the
    reference's first schema) upgrades in place: the workspace table is
    added, the version advances, and existing media bytes survive."""
    import sqlite3

    from mixlab_tpu.engine.project import ProjectBase

    path = tmp_path / "old.mixlab"
    conn = sqlite3.connect(str(path))
    conn.executescript(
        """
        CREATE TABLE schema_migrations (version INTEGER NOT NULL);
        INSERT INTO schema_migrations (version) VALUES (20200804);
        CREATE TABLE media (
            id INTEGER PRIMARY KEY NOT NULL, name TEXT NOT NULL,
            kind TEXT NOT NULL, stream_id INTEGER NOT NULL,
            FOREIGN KEY (stream_id) REFERENCES streams (id));
        CREATE TABLE streams (
            id INTEGER PRIMARY KEY NOT NULL, size INTEGER NOT NULL,
            CONSTRAINT non_negative_size CHECK (size >= 0));
        CREATE TABLE blobs (
            stream_id INTEGER NOT NULL, offset INTEGER NOT NULL,
            data BLOB NOT NULL,
            FOREIGN KEY (stream_id) REFERENCES streams (id),
            CONSTRAINT non_negative_offset CHECK (offset >= 0));
        CREATE UNIQUE INDEX blob_sequence_idx ON blobs (stream_id, offset);
        INSERT INTO streams (id, size) VALUES (1, 9);
        INSERT INTO blobs (stream_id, offset, data) VALUES (1, 0, x'48656c6c6f204f6c64');
        INSERT INTO media (id, name, kind, stream_id)
            VALUES (1, 'legacy.wav', 'audio/wav', 1);
        """
    )
    conn.commit()
    conn.close()

    base = ProjectBase(path)
    # version advanced, workspace table exists and is usable
    row = base.query_one("SELECT version FROM schema_migrations")
    assert row[0] == 20200805
    assert base.read_workspace() is None
    base.write_workspace({"modules": []})
    assert base.read_workspace() == {"modules": []}
    # legacy media intact
    lib = base.media_library()
    assert lib.items[0].name == "legacy.wav" and lib.items[0].size == 9
    rs = base.open_media(lib.items[0].id)
    assert rs.read() == b"Hello Old"
    base.close()


def test_future_version_left_untouched(tmp_path):
    """A project from a NEWER build (version beyond our migration set)
    must not be downgraded or have migrations re-run."""
    import sqlite3

    from mixlab_tpu.engine.project import ProjectBase

    path = tmp_path / "future.mixlab"
    conn = sqlite3.connect(str(path))
    conn.executescript(
        """
        CREATE TABLE schema_migrations (version INTEGER NOT NULL);
        INSERT INTO schema_migrations (version) VALUES (99990101);
        CREATE TABLE workspace (serialized TEXT NOT NULL);
        INSERT INTO workspace (serialized) VALUES ('{"modules": [1]}');
        """
    )
    conn.commit()
    conn.close()

    base = ProjectBase(path)
    assert base.query_one("SELECT version FROM schema_migrations")[0] == 99990101
    assert base.read_workspace() == {"modules": [1]}
    base.close()


def test_empty_file_bootstraps_full_schema(tmp_path):
    """A zero-byte file (touch foo.mixlab) bootstraps the full schema."""
    from mixlab_tpu.engine.project import ProjectBase

    path = tmp_path / "blank.mixlab"
    path.touch()
    base = ProjectBase(path)
    assert base.query_one("SELECT version FROM schema_migrations")[0] == 20200805
    names = {r[0] for r in base.query_all(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    assert {"schema_migrations", "media", "streams", "blobs",
            "workspace"} <= names
    base.close()


def test_closed_base_raises_typed_error(tmp_path):
    """Post-close DB access fails with ProjectClosedError, not sqlite3
    ProgrammingError — media decode threads treat it as end-of-stream."""
    import pytest

    from mixlab_tpu.engine.project import ProjectBase, ProjectClosedError

    base = ProjectBase(tmp_path / "t.mixlab")
    ws = base.create_stream()
    ws.write(b"x" * 100)
    sid = ws.finalize()
    rs = base.open_stream(sid)
    base.close()
    with pytest.raises(ProjectClosedError):
        base.query_one("SELECT 1")
    with pytest.raises(ProjectClosedError):
        base.read_workspace()
    with pytest.raises(ProjectClosedError):
        rs.read(10)  # the exact race from a decode thread
    with pytest.raises(ProjectClosedError):
        base.write_workspace({})


def test_media_decode_thread_survives_project_close(tmp_path):
    """Closing the project while a MediaPlayer decode thread is live must not
    raise in the thread (the round-2 PytestUnhandledThreadExceptionWarning)."""
    import threading
    import time

    import numpy as np

    from mixlab_tpu.engine.media_player import MediaPlayer
    from mixlab_tpu.engine.config import EngineConfig
    from mixlab_tpu.engine.feeds import MediaSourceFeed
    from mixlab_tpu.engine.project import ProjectBase
    from mixlab_tpu.io_host.wav import write_wav

    cfg = EngineConfig()
    base = ProjectBase(tmp_path / "t.mixlab")
    pcm = (np.sin(np.linspace(0, 100, 44100 * 2)).reshape(-1, 2) * 0.2)
    wav_path = tmp_path / "t.wav"
    write_wav(wav_path, 44100, pcm)
    wstream = base.create_stream()
    wstream.write(wav_path.read_bytes())
    sid = wstream.finalize()

    feed = MediaSourceFeed(cfg)
    player = MediaPlayer(base.open_stream(sid), feed, cfg)
    player.start()
    # let the decode loop get going, then close the DB out from under it
    deadline = time.monotonic() + 5.0
    while feed.queue.empty() and time.monotonic() < deadline:
        time.sleep(0.01)
    base.close()
    # drain so a blocked push can't hide the read path
    for _ in range(50):
        feed.fill_tick(cfg.samples_per_tick)
        time.sleep(0.005)
    player.stop()
    player.join(timeout=5.0)
    assert not player.is_alive()
