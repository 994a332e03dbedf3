import pytest

from audio_rag_tpu.jobqueue.job import (
    STAGE_ORDER,
    IngestJob,
    JobCheckpoint,
    JobResult,
    JobStage,
    JobStatus,
    Priority,
    calculate_progress,
    get_next_stage,
)


class TestPriority:
    def test_ordering(self):
        assert Priority.CRITICAL > Priority.HIGH > Priority.NORMAL > Priority.LOW

    def test_from_name(self):
        assert Priority.from_name("high") is Priority.HIGH


class TestStages:
    def test_order_complete(self):
        assert len(STAGE_ORDER) == 9
        assert STAGE_ORDER[0] is JobStage.VALIDATING
        assert STAGE_ORDER[-1] is JobStage.FINALIZING

    def test_next_stage(self):
        assert get_next_stage(JobStage.VALIDATING) is JobStage.TRANSCRIBING
        assert get_next_stage(JobStage.FINALIZING) is None

    def test_progress(self):
        assert calculate_progress(None) == 0.0
        assert calculate_progress(JobStage.FINALIZING) == 1.0
        assert 0 < calculate_progress(JobStage.CHUNKING) < 1
        assert calculate_progress("embedding") == calculate_progress(
            JobStage.EMBEDDING
        )


class TestJobStatus:
    def test_terminal(self):
        assert JobStatus.COMPLETED.is_terminal
        assert JobStatus.FAILED.is_terminal
        assert JobStatus.CANCELLED.is_terminal
        assert not JobStatus.RUNNING.is_terminal


class TestIngestJob:
    def test_json_roundtrip(self, tmp_path):
        p = tmp_path / "a.wav"
        p.write_bytes(b"RIFF" + b"\x00" * 64)
        job = IngestJob(
            tenant_id="t1", audio_path=str(p), priority=Priority.HIGH,
            metadata={"k": "v"},
        )
        back = IngestJob.from_json(job.to_json())
        assert back.job_id == job.job_id
        assert back.priority is Priority.HIGH
        assert back.idempotency_key == job.idempotency_key
        assert back.metadata == {"k": "v"}

    def test_idempotency_key_content_based(self, tmp_path):
        a = tmp_path / "a.wav"
        b = tmp_path / "b.wav"
        a.write_bytes(b"SAME CONTENT")
        b.write_bytes(b"SAME CONTENT")
        ja = IngestJob(tenant_id="t1", audio_path=str(a))
        jb = IngestJob(tenant_id="t1", audio_path=str(b))
        assert ja.idempotency_key == jb.idempotency_key
        jc = IngestJob(tenant_id="t2", audio_path=str(a))
        assert jc.idempotency_key != ja.idempotency_key

    def test_priority_coercion(self, tmp_path):
        p = tmp_path / "a.wav"
        p.write_bytes(b"x")
        assert IngestJob("t", str(p), priority="critical").priority \
            is Priority.CRITICAL
        assert IngestJob("t", str(p), priority=0).priority is Priority.LOW


class TestResultsAndCheckpoints:
    def test_result_roundtrip(self):
        r = JobResult("j1", JobStatus.COMPLETED, num_chunks=5,
                      metrics={"embed": 1.5})
        back = JobResult.from_json(r.to_json())
        assert back.status is JobStatus.COMPLETED
        assert back.metrics["embed"] == 1.5

    def test_checkpoint_roundtrip(self):
        c = JobCheckpoint("j1", JobStage.EMBEDDING,
                          {"chunks": [{"text": "x"}]})
        back = JobCheckpoint.from_json(c.to_json())
        assert back.stage is JobStage.EMBEDDING
        assert back.data["chunks"][0]["text"] == "x"
