"""Multimodal plumbing: binary payload schema, stubbed decode, grouped stats."""

import pytest

from rkts_migration_ray.stages import multimodal


@pytest.fixture(scope="module")
def media_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("media")
    return multimodal.ensure_media_fixture(str(root), n_rows=60)


def test_decode_header(media_path):
    df = multimodal.decode_media_ds(media_path).to_pandas()
    assert len(df) == 60
    assert (df["width"] >= 16).all() and (df["width"] < 512).all()
    assert (df["height"] >= 16).all() and (df["height"] < 512).all()
    assert (df["n_bytes"] > 12).all()
    assert df["payload_sha"].str.len().eq(16).all()
    assert set(df["kind"]) == set(multimodal.KINDS)


def test_decode_deterministic(media_path):
    a = multimodal.decode_media_ds(media_path).to_pandas().sort_values("media_id")
    b = multimodal.decode_media_ds(media_path).to_pandas().sort_values("media_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_real_codec_is_gated():
    with pytest.raises(NotImplementedError):
        multimodal._decode_payload(b"GRFT" + b"\x00" * 20, use_real_codec=True)


def test_media_stats(media_path):
    df = multimodal.media_stats_ds(media_path).to_pandas()
    assert set(df["kind"]) == set(multimodal.KINDS)
    assert int(df["n_media"].sum()) == 60
