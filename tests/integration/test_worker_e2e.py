"""Worker end-to-end: enqueue → claim → process with fake backends →
result + checkpoints; cancellation and resume paths."""

import numpy as np
import pytest

from audio_rag_tpu.audio.io import write_wav
from audio_rag_tpu.config.schema import AudioRAGConfig
from audio_rag_tpu.jobqueue.config import QueueConfig, StorageConfig
from audio_rag_tpu.jobqueue.job import IngestJob, JobStage, JobStatus
from audio_rag_tpu.jobqueue.queue import AudioRAGQueue
from audio_rag_tpu.jobqueue.store import JobStore
from audio_rag_tpu.jobqueue.worker import TPUWorker, process_ingest_job
from audio_rag_tpu.pipeline.orchestrator import AudioRAG


def fake_rag():
    return AudioRAG(AudioRAGConfig(**{
        "asr": {"backend": "fake"},
        "diarization": {"backend": "fake"},
        "embedding": {"backend": "fake"},
        "retrieval": {"backend": "tpu", "capacity_step": 128},
        "reranking": {"backend": "none"},
        "generation": {"backend": "none"},
    }))


@pytest.fixture
def wav(tmp_path):
    sr = 16000
    audio = 0.1 * np.random.default_rng(0).standard_normal(sr * 10)
    p = tmp_path / "a.wav"
    write_wav(p, audio.astype(np.float32), sr)
    return str(p)


@pytest.fixture
def env(wav):
    store = JobStore(":memory:")
    cfg = QueueConfig(storage=StorageConfig(db_path=":memory:"))
    cfg.worker.preload_models = False
    queue = AudioRAGQueue(cfg, store=store)
    return store, cfg, queue


class TestWorkerE2E:
    def test_full_job_lifecycle(self, env, wav):
        store, cfg, queue = env
        jid = queue.enqueue(IngestJob("tenant1", wav))

        worker = TPUWorker(cfg, store=store, rag_factory=fake_rag)
        assert worker.run_once() is True
        assert worker.run_once() is False  # queue drained

        st = queue.get_status(jid)
        assert st["status"] == "completed"
        assert st["progress"] == 1.0
        res = queue.get_result(jid)
        assert res.status is JobStatus.COMPLETED
        assert res.num_chunks > 0
        # checkpoint cleared after success
        assert store.get_checkpoint(jid) is None

    def test_failed_job_records_error(self, env):
        store, cfg, queue = env
        jid = queue.enqueue(
            IngestJob("tenant1", "/missing.wav"), validate=False
        )
        worker = TPUWorker(cfg, store=store, rag_factory=fake_rag)
        worker.run_once()
        st = queue.get_status(jid)
        assert st["status"] == "failed"
        assert "AudioProcessingError" in st["error"]
        res = queue.get_result(jid)
        assert res.status is JobStatus.FAILED

    def test_cancellation_respected_mid_job(self, env, wav):
        store, cfg, queue = env
        jid = queue.enqueue(IngestJob("tenant1", wav))
        rag = fake_rag()
        job = store.claim_next("w1")
        # cancel once running: the progress hook observes it at the next stage
        store.set_status(jid, JobStatus.CANCELLED)
        result = process_ingest_job(job, store, rag, cfg)
        assert result.status is JobStatus.CANCELLED

    def test_resume_from_checkpoint(self, env, wav):
        """A job with a persisted 'chunked' checkpoint skips ASR entirely."""
        store, cfg, queue = env
        jid = queue.enqueue(IngestJob("tenant1", wav))
        job = store.claim_next("w1")

        from audio_rag_tpu.jobqueue.job import JobCheckpoint

        chunks = [
            {"text": "resumed chunk", "start": 0.0, "end": 5.0,
             "speaker": "S0", "chunk_id": "ck1", "metadata": {}},
        ]
        store.put_checkpoint(
            JobCheckpoint(job_id=jid, stage=JobStage.EMBEDDING,
                          data={"ckpt_stage": "chunked", "chunks": chunks}),
            ttl_s=60,
        )

        class ExplodingASR:
            def transcribe_with_words(self, *a, **k):
                raise AssertionError("ASR must not run on resume")

        rag = fake_rag()
        rag.ingestion._asr = ExplodingASR()
        result = process_ingest_job(job, store, rag, cfg)
        assert result.status is JobStatus.COMPLETED
        assert result.num_chunks == 1
        # the resumed chunk landed in the store
        out = rag.query("resumed chunk", search_type="dense", rerank=False)
        assert out.results and out.results[0].chunk_id == "ck1"

    def test_config_overrides_applied_and_restored(self, env, wav):
        """Per-job config overrides steer the pipeline, then restore
        (reference queue/worker.py:361-365 semantics)."""
        store, cfg, queue = env
        jid = queue.enqueue(IngestJob(
            "tenant1", wav,
            config_overrides={"chunking.max_tokens": 77,
                              "retrieval": {"collection_name": "override"}},
        ))
        rag = fake_rag()
        before = rag.config.chunking.max_tokens
        job = store.claim_next("w1")
        from audio_rag_tpu.jobqueue.worker import process_ingest_job

        seen = {}
        orig_ingest = rag.ingestion.ingest

        def spy(*a, **k):
            seen["max_tokens"] = rag.config.chunking.max_tokens
            seen["collection_name"] = rag.config.retrieval.collection_name
            return orig_ingest(*a, **k)

        rag.ingestion.ingest = spy
        result = process_ingest_job(job, store, rag, cfg)
        assert result.status is JobStatus.COMPLETED
        assert seen["max_tokens"] == 77  # applied during the job
        assert seen["collection_name"] == "override"
        assert rag.config.chunking.max_tokens == before  # restored after

    def test_heartbeat_registered(self, env, wav):
        store, cfg, queue = env
        worker = TPUWorker(cfg, store=store, rag_factory=fake_rag)
        store.heartbeat(worker.worker_id, {"jobs_processed": 0})
        assert worker.worker_id in store.live_workers()


def fake_rag_contextual():
    return AudioRAG(AudioRAGConfig(**{
        "asr": {"backend": "fake"},
        "diarization": {"backend": "fake"},
        "embedding": {"backend": "fake"},
        "retrieval": {"backend": "tpu", "capacity_step": 128},
        "reranking": {"backend": "none"},
        "generation": {"backend": "fake"},
        "contextual": {"enabled": True},
    }))


class TestBatchClaim:
    """worker.batch_claim > 1: compatible queued jobs run as ONE
    stage-grouped ingest (model swaps per batch); incompatible claims
    still process, failures fall back per job."""

    def _enqueue_n(self, queue, tmp_path, n, collection=None, seed0=10):
        jids = []
        sr = 16000
        for i in range(n):
            p = tmp_path / f"b{i}.wav"
            write_wav(p, (0.1 * np.random.default_rng(seed0 + i)
                          .standard_normal(sr * 8)).astype(np.float32), sr)
            jids.append(queue.enqueue(
                IngestJob(f"tenant{i}", str(p), collection=collection)))
        return jids

    def test_batch_completes_all_jobs(self, env, tmp_path):
        store, cfg, queue = env
        cfg.worker.batch_claim = 4
        jids = self._enqueue_n(queue, tmp_path, 3)
        worker = TPUWorker(cfg, store=store, rag_factory=fake_rag_contextual)
        assert worker.run_once() is True
        assert worker.jobs_processed == 3
        for i, jid in enumerate(jids):
            res = queue.get_result(jid)
            assert res.status is JobStatus.COMPLETED
            assert res.num_chunks > 0
        # per-job tenant metadata survived the batched path
        rag = worker._rag
        out = rag.query("word0", rerank=False)
        tenants = {r.metadata.get("tenant_id") for r in out.results}
        assert tenants <= {"tenant0", "tenant1", "tenant2"}

    def test_incompatible_collections_split(self, env, tmp_path):
        store, cfg, queue = env
        cfg.worker.batch_claim = 4
        a = self._enqueue_n(queue, tmp_path, 2, collection="colA")
        b = self._enqueue_n(queue, tmp_path, 1, collection="colB",
                            seed0=50)
        worker = TPUWorker(cfg, store=store, rag_factory=fake_rag_contextual)
        assert worker.run_once() is True
        for jid in a + b:
            assert queue.get_result(jid).status is JobStatus.COMPLETED

    def test_poison_file_falls_back_per_job(self, env, tmp_path):
        store, cfg, queue = env
        cfg.worker.batch_claim = 4
        good = self._enqueue_n(queue, tmp_path, 2)
        bad = queue.enqueue(
            IngestJob("tenantX", "/missing.wav"), validate=False)
        worker = TPUWorker(cfg, store=store, rag_factory=fake_rag_contextual)
        worker.run_once()
        # drain anything left (the poison job may batch first or last)
        while worker.run_once():
            pass
        for jid in good:
            assert queue.get_result(jid).status is JobStatus.COMPLETED
        assert queue.get_result(bad).status is JobStatus.FAILED

    def test_batch_claim_1_unchanged(self, env, tmp_path):
        store, cfg, queue = env
        assert cfg.worker.batch_claim == 1
        jids = self._enqueue_n(queue, tmp_path, 2)
        worker = TPUWorker(cfg, store=store, rag_factory=fake_rag_contextual)
        assert worker.run_once() is True
        assert worker.jobs_processed == 1  # one job per run_once
        while worker.run_once():
            pass
        for jid in jids:
            assert queue.get_result(jid).status is JobStatus.COMPLETED
