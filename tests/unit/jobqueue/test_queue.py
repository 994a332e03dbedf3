import pytest

from audio_rag_tpu.jobqueue.config import QueueConfig, StorageConfig
from audio_rag_tpu.jobqueue.exceptions import (
    DuplicateJobError,
    InvalidAudioError,
    InvalidTenantError,
    JobAlreadyTerminalError,
    JobNotFoundError,
    QueueFullError,
)
from audio_rag_tpu.jobqueue.job import (
    IngestJob,
    JobResult,
    JobStage,
    JobStatus,
    Priority,
)
from audio_rag_tpu.jobqueue.queue import AudioRAGQueue
from audio_rag_tpu.jobqueue.store import JobStore
from audio_rag_tpu.jobqueue.validation import (
    AudioValidator,
    TenantValidator,
)


@pytest.fixture
def wav(tmp_path):
    p = tmp_path / "a.wav"
    p.write_bytes(b"RIFF" + b"\x00" * 1000)
    return str(p)


@pytest.fixture
def queue():
    cfg = QueueConfig(storage=StorageConfig(db_path=":memory:"))
    return AudioRAGQueue(cfg, store=JobStore(":memory:"))


class TestEnqueue:
    def test_enqueue_and_status(self, queue, wav):
        job = IngestJob("tenant1", wav)
        jid = queue.enqueue(job)
        st = queue.get_status(jid)
        assert st["status"] == "queued"
        assert st["queue"] == "normal"
        assert st["progress"] == 0.0

    def test_priority_routing(self, queue, wav):
        j = IngestJob("tenant1", wav, priority=Priority.CRITICAL)
        queue.enqueue(j)
        assert queue.get_status(j.job_id)["queue"] == "high"

    def test_duplicate_rejected(self, queue, wav):
        j1 = IngestJob("tenant1", wav)
        queue.enqueue(j1)
        j2 = IngestJob("tenant1", wav)
        with pytest.raises(DuplicateJobError) as ei:
            queue.enqueue(j2)
        assert ei.value.existing_job_id == j1.job_id

    def test_queue_full(self, wav):
        cfg = QueueConfig(storage=StorageConfig(db_path=":memory:"))
        cfg.queues[1].max_depth = 2
        q = AudioRAGQueue(cfg, store=JobStore(":memory:"))
        for i in range(2):
            q.enqueue(IngestJob(f"tenant{i}", wav,
                                idempotency_key=f"k{i}"))
        with pytest.raises(QueueFullError):
            q.enqueue(IngestJob("tenant9", wav, idempotency_key="k9"))

    def test_validation_bad_tenant(self, queue, wav):
        with pytest.raises(InvalidTenantError):
            queue.enqueue(IngestJob("BAD TENANT!", wav))

    def test_validation_bad_audio(self, queue, tmp_path):
        p = tmp_path / "a.xyz"
        p.write_bytes(b"x")
        with pytest.raises(InvalidAudioError):
            queue.enqueue(IngestJob("tenant1", str(p)))

    def test_skip_validation(self, queue):
        jid = queue.enqueue(
            IngestJob("tenant1", "/nonexistent.wav"), validate=False
        )
        assert queue.get_status(jid)["status"] == "queued"


class TestLifecycle:
    def test_cancel(self, queue, wav):
        jid = queue.enqueue(IngestJob("tenant1", wav))
        assert queue.cancel(jid)
        assert queue.get_status(jid)["status"] == "cancelled"
        with pytest.raises(JobAlreadyTerminalError):
            queue.cancel(jid)

    def test_not_found(self, queue):
        with pytest.raises(JobNotFoundError):
            queue.get_status("nope")
        with pytest.raises(JobNotFoundError):
            queue.cancel("nope")

    def test_result_storage(self, queue, wav):
        jid = queue.enqueue(IngestJob("tenant1", wav))
        assert queue.get_result(jid) is None
        queue.store.put_result(
            JobResult(jid, JobStatus.COMPLETED, num_chunks=3), ttl_s=60
        )
        res = queue.get_result(jid)
        assert res.num_chunks == 3

    def test_stats(self, queue, wav):
        queue.enqueue(IngestJob("tenant1", wav))
        stats = queue.get_queue_stats()
        assert stats["queues"]["normal"]["depth"] == 1
        assert stats["queues"]["normal"]["utilization"] > 0


class TestStore:
    def test_claim_order_priority_then_fifo(self, wav):
        store = JobStore(":memory:")
        j_low = IngestJob("t", wav, priority=Priority.LOW,
                          idempotency_key="a")
        j_high = IngestJob("t", wav, priority=Priority.HIGH,
                           idempotency_key="b")
        j_norm = IngestJob("t", wav, priority=Priority.NORMAL,
                           idempotency_key="c")
        store.insert_job(j_low, "low")
        store.insert_job(j_high, "high")
        store.insert_job(j_norm, "normal")
        claimed = store.claim_next("w")
        assert claimed.job_id == j_high.job_id  # highest priority first
        assert store.get_job_row(j_high.job_id)["status"] == "running"
        assert store.claim_next("w").job_id == j_norm.job_id
        assert store.claim_next("w").job_id == j_low.job_id

    def test_claim_returns_none_when_empty(self):
        assert JobStore(":memory:").claim_next("w") is None

    def test_idempotency_ttl(self, wav):
        store = JobStore(":memory:")
        store.put_idempotency("k", "j1", ttl_s=-1)  # already expired
        assert store.check_idempotency("k") is None
        store.put_idempotency("k", "j1", ttl_s=60)
        assert store.check_idempotency("k") == "j1"

    def test_rate_limit_window(self):
        store = JobStore(":memory:")
        for i in range(5):
            n = store.rate_limit_count("user1", window_s=60)
        assert n == 5
        assert store.rate_limit_count("user2", window_s=60) == 1

    def test_heartbeats(self):
        store = JobStore(":memory:")
        store.heartbeat("w1", {"jobs": 3})
        live = store.live_workers(ttl_s=60)
        assert "w1" in live and live["w1"]["jobs"] == 3
        store.remove_worker("w1")
        assert store.live_workers() == {}


class TestValidators:
    def test_tenant_strict(self):
        v = TenantValidator(strict=True)
        v.validate("audio_rag_mit_cs_ml101_fall24")
        with pytest.raises(InvalidTenantError):
            v.validate("simple_tenant")
        info = TenantValidator.parse("audio_rag_mit_cs_ml101_fall24")
        assert info.university == "mit"
        assert TenantValidator.build("mit", "cs", "ml101", "fall24") == \
            "audio_rag_mit_cs_ml101_fall24"

    def test_audio_size_limit(self, tmp_path):
        v = AudioValidator(max_bytes=10)
        p = tmp_path / "big.wav"
        p.write_bytes(b"\x00" * 100)
        with pytest.raises(InvalidAudioError, match="too large"):
            v.validate(p)

    def test_audio_empty(self, tmp_path):
        p = tmp_path / "e.wav"
        p.write_bytes(b"")
        with pytest.raises(InvalidAudioError, match="empty"):
            AudioValidator().validate(p)

    def test_bad_header_is_warn_only(self, tmp_path):
        # ID3 junk with .mp3 ext: duration probe fails but validation passes
        p = tmp_path / "x.mp3"
        p.write_bytes(b"ID3" + b"\x00" * 100)
        AudioValidator().validate(p)  # no raise
