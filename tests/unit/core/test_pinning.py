"""ResourceManager pinning: the mixed-workload serving policy."""

import pytest

from audio_rag_tpu.core.exceptions import ResourceError
from audio_rag_tpu.resources.manager import ResourceManager


class FakeModel:
    def __init__(self):
        self.unloaded = False

    def unload(self):
        self.unloaded = True


def test_pinned_models_survive_eviction():
    rm = ResourceManager(max_hbm_gb=10.0)
    emb, asr = FakeModel(), FakeModel()
    rm.pin("embeddings")
    rm.register_model("embeddings", 3.0, emb)
    rm.register_model("asr", 6.0, asr)
    # needs 7 GB: must evict asr (6.0, unpinned), never embeddings
    rm.ensure_hbm(7.0, for_model="generation")
    assert not emb.unloaded
    assert asr.unloaded
    assert rm.eviction_count == 1


def test_only_pinned_left_fails_loudly():
    rm = ResourceManager(max_hbm_gb=10.0)
    emb = FakeModel()
    rm.pin("embeddings")
    rm.register_model("embeddings", 6.0, emb)
    with pytest.raises(ResourceError):
        rm.ensure_hbm(8.0, for_model="generation")
    assert not emb.unloaded


def test_pin_applies_to_future_registrations():
    """A pinned name stays pinned across unload/reload cycles."""
    rm = ResourceManager(max_hbm_gb=10.0)
    rm.pin("embeddings")
    emb = FakeModel()
    rm.register_model("embeddings", 3.0, emb)
    rm.unregister("embeddings")
    emb2 = FakeModel()
    rm.register_model("embeddings", 3.0, emb2)
    assert rm.status()["models"]["embeddings"]["pinned"]
    rm.pin("embeddings", pinned=False)
    assert not rm.status()["models"]["embeddings"]["pinned"]


def test_idle_eviction_skips_pinned():
    rm = ResourceManager(max_hbm_gb=10.0)
    emb = FakeModel()
    rm.pin("embeddings")
    rm.register_model("embeddings", 3.0, emb)
    rm._models["embeddings"].last_used = 0.0  # long idle
    assert rm.evict_idle(1.0) == []
    assert not emb.unloaded
