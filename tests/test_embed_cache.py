"""
Cross-process text-embedding disk cache (riffusion_tpu/embed_cache.py):
store round-trip, key sensitivity, corrupt-entry recovery, and the pipeline
wiring (a second pipeline instance must serve its boot prompts from disk,
bit-identically, without touching the text encoder).
"""

import numpy as np
import pytest

from riffusion_tpu import embed_cache


@pytest.fixture
def cache_dir(tmp_path, monkeypatch):
    d = tmp_path / "embeds"
    monkeypatch.setenv("RIFFUSION_TPU_EMBED_CACHE_DIR", str(d))
    monkeypatch.delenv("RIFFUSION_TPU_NO_EMBED_CACHE", raising=False)
    return d


def test_roundtrip_preserves_value_and_dtype(cache_dir):
    import ml_dtypes

    for dtype in (np.float32, ml_dtypes.bfloat16):
        value = np.arange(12, dtype=np.float32).reshape(1, 3, 4).astype(dtype)
        key = embed_cache.entry_key("ckpt", dtype, "plain", "funk bassline")
        assert embed_cache.get(key) is None
        embed_cache.put(key, value)
        out = embed_cache.get(key)
        assert out is not None and out.dtype == value.dtype
        np.testing.assert_array_equal(
            out.astype(np.float32), value.astype(np.float32)
        )


def test_key_sensitivity(cache_dir):
    base = embed_cache.entry_key("ckpt", np.float32, "plain", "jazz piano")
    assert embed_cache.entry_key("ckpt2", np.float32, "plain", "jazz piano") != base
    assert embed_cache.entry_key("ckpt", np.float32, "weighted", "jazz piano") != base
    assert embed_cache.entry_key("ckpt", np.float32, "plain", "jazz  piano") != base
    import ml_dtypes

    assert embed_cache.entry_key("ckpt", ml_dtypes.bfloat16, "plain", "jazz piano") != base


def test_corrupt_entry_is_dropped_not_fatal(cache_dir):
    key = embed_cache.entry_key("ckpt", np.float32, "plain", "x")
    embed_cache.put(key, np.ones((1, 2, 3), np.float32))
    path = cache_dir / (key + ".npz")
    path.write_bytes(b"not an npz")
    assert embed_cache.get(key) is None  # soft miss
    assert not path.exists()  # corrupt entry removed
    embed_cache.put(key, np.ones((1, 2, 3), np.float32))
    assert embed_cache.get(key) is not None


def test_disabled_by_env(cache_dir, monkeypatch):
    monkeypatch.setenv("RIFFUSION_TPU_NO_EMBED_CACHE", "1")
    key = embed_cache.entry_key("ckpt", np.float32, "plain", "x")
    embed_cache.put(key, np.ones((1, 2, 3), np.float32))
    assert embed_cache.get(key) is None
    assert not list(cache_dir.glob("*.npz")) if cache_dir.exists() else True


def test_pipeline_second_instance_hits_disk(cache_dir, monkeypatch):
    """A fresh pipeline (fresh lru caches, same checkpoint) must get its
    embeddings from disk — verified by bit-equality AND by breaking the
    text encoder before the second lookup."""
    from riffusion_tpu.riffusion_pipeline import RiffusionPipeline

    pipe = RiffusionPipeline.load_checkpoint("random:tiny", device="cpu")
    assert pipe.bundle.checkpoint_id.startswith("random:tiny")
    first = np.asarray(pipe.embed_text_weighted("funky synth"))
    assert list(cache_dir.glob("*.npz")), "cold compute must write the cache"

    pipe2 = RiffusionPipeline.load_checkpoint("random:tiny", device="cpu")
    # If the disk path misses, this raises — compute() can't run.
    monkeypatch.setattr(
        pipe2, "_encode_77", lambda *a, **k: pytest.fail("disk cache missed")
    )
    second = np.asarray(pipe2.embed_text_weighted("funky synth"))
    np.testing.assert_array_equal(first, second)
