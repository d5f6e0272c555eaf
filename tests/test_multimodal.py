"""Multimodal plumbing: binary metadata is JVM-side truth, the decode
stages preserve the real kernels' shapes, and frame sampling expands
1→many deterministically."""

import hashlib

from joint_entity_and_relation_extraction_spark.operators import (
    multimodal as MM)

from conftest import SF0001


def test_binary_metadata_matches_python_hashes(spark):
    rows = MM.binary_metadata(spark, SF0001).limit(50).collect()
    blobs = {r.url: bytes(r.html) for r in
             MM.web_pages(spark, SF0001).limit(50).collect()}
    assert rows
    for r in rows:
        if r.url in blobs:
            b = blobs[r.url]
            assert r.n_bytes == len(b)
            assert r.sha256 == hashlib.sha256(b).hexdigest()


def test_frame_sample_deterministic_and_bounded(spark):
    a = MM.frame_sample(spark, SF0001, max_frames=6).collect()
    b = MM.frame_sample(spark, SF0001, max_frames=6).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    by_url: dict = {}
    for r in a:
        by_url.setdefault(r.url, []).append(r)
    for url, rs in by_url.items():
        n_frames = rs[0].n_frames
        assert 1 <= len(rs) <= 6
        assert len(rs) == min(6, n_frames) or len(rs) == len(
            {r.frame_idx for r in rs})  # dedup of collided indices only
        idxs = sorted(r.frame_idx for r in rs)
        assert idxs[0] == 0                      # first frame included
        assert all(0 <= i < n_frames for i in idxs)
        assert all(r.t_ms >= 0 for r in rs)
        assert len({r.frame_sha for r in rs}) == len(rs)  # per-frame ids


def test_real_decode_slots_are_honest_stubs():
    import numpy as np  # noqa: F401

    import pytest

    with pytest.raises(NotImplementedError):
        MM.decode_image_real(b"xx")
    with pytest.raises(NotImplementedError):
        MM.probe_video_real(b"xx")


def test_audio_windows_deterministic_and_bounded(spark):
    a = MM.audio_windows(spark, SF0001, win_ms=1000, max_windows=6).collect()
    b = MM.audio_windows(spark, SF0001, win_ms=1000, max_windows=6).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    by_url: dict = {}
    for r in a:
        by_url.setdefault(r.url, []).append(r)
    for url, rs in by_url.items():
        total = rs[0].n_windows
        assert 1 <= len(rs) <= 6
        idxs = sorted(r.win_idx for r in rs)
        assert idxs[0] == 0                      # first window included
        assert all(0 <= i < total for i in idxs)
        assert all(r.t_ms == r.win_idx * 1000 for r in rs)
        assert all(r.sample_rate in (8000, 16000, 22050, 44100) for r in rs)
        assert len({r.win_sha for r in rs}) == len(rs)  # per-window ids


def test_audio_probe_slot_is_honest_stub():
    import pytest

    with pytest.raises(NotImplementedError):
        MM.probe_audio_real(b"xx")
