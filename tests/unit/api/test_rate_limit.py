"""Rate limiting: sliding window enforcement, headers, fail-open."""

import asyncio

import pytest

from audio_rag_tpu.api.config import APIConfig, RateLimitTier
from audio_rag_tpu.api.deps import authenticate, check_rate_limit
from audio_rag_tpu.api.http import HTTPError, Request
from audio_rag_tpu.jobqueue.store import JobStore


def make_request(key="k1"):
    return Request(method="POST", path="/api/v1/query", query={},
                   headers={"x-api-key": key})


@pytest.fixture
def config():
    cfg = APIConfig()
    cfg.api_keys = {"k1": {"tenant_id": "t1", "tier": "tiny"}}
    cfg.tiers["tiny"] = RateLimitTier(query_per_minute=2,
                                      ingest_per_hour=1,
                                      status_per_minute=100)
    return cfg


class TestRateLimit:
    def test_limit_enforced_with_headers(self, config):
        store = JobStore(":memory:")
        for i in range(2):
            req = make_request()
            authenticate(req, config)
            check_rate_limit(req, config, "query", store)
            assert req.context["rate_headers"]["x-ratelimit-limit"] == "2"
        req = make_request()
        authenticate(req, config)
        with pytest.raises(HTTPError) as ei:
            check_rate_limit(req, config, "query", store)
        assert ei.value.status == 429
        assert "retry-after" in ei.value.headers

    def test_separate_operations_independent(self, config):
        store = JobStore(":memory:")
        req = make_request()
        authenticate(req, config)
        check_rate_limit(req, config, "ingest", store)  # 1/1 used
        # query budget untouched
        check_rate_limit(req, config, "query", store)

    def test_fail_open_on_store_error(self, config):
        class BrokenStore:
            def rate_limit_count(self, *a):
                raise RuntimeError("db gone")

        req = make_request()
        authenticate(req, config)
        check_rate_limit(req, config, "query", BrokenStore())  # no raise

    def test_auth_errors(self, config):
        req = Request(method="GET", path="/", query={}, headers={})
        with pytest.raises(HTTPError) as ei:
            authenticate(req, config)
        assert ei.value.status == 401
        req = make_request("wrong")
        with pytest.raises(HTTPError) as ei:
            authenticate(req, config)
        assert ei.value.status == 403
