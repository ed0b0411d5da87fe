"""ApiEmbedder default urllib transport: full encode/decode/retry path
against a fake opener — zero network, mirroring src/api_embed.rs's
batched POST + bearer auth + bounded-retry loop."""

import io
import json

import pytest

from memvid_spark.functions.embed import ApiEmbedder, http_transport


class _FakeResponse:
    def __init__(self, payload: dict):
        self._data = json.dumps(payload).encode("utf-8")

    def read(self):
        return self._data

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _echo_opener(seen):
    """Fake urlopen: records the request, answers with one 2-d vector
    per input (value = text length, so order is checkable)."""

    def opener(req, timeout=None):
        body = json.loads(req.data.decode("utf-8"))
        seen.append((req.full_url, dict(req.headers), body, timeout))
        return _FakeResponse(
            {"data": [{"embedding": [float(len(t)), 1.0]} for t in body["input"]]}
        )

    return opener


class TestTransport:
    def test_request_shape_and_response_order(self):
        seen = []
        t = http_transport(
            "https://api.example.test/v1/embeddings",
            api_key="sk-test",
            model="embed-v1",
            opener=_echo_opener(seen),
        )
        out = t(["ab", "defg", ""])
        assert out == [[2.0, 1.0], [4.0, 1.0], [0.0, 1.0]]
        url, headers, body, timeout = seen[0]
        assert url == "https://api.example.test/v1/embeddings"
        assert headers["Authorization"] == "Bearer sk-test"
        assert headers["Content-type"] == "application/json"
        assert body == {"input": ["ab", "defg", ""], "model": "embed-v1"}
        assert timeout == 30.0

    def test_retry_then_success_with_backoff(self):
        calls, sleeps = [], []

        def flaky(req, timeout=None):
            calls.append(1)
            if len(calls) < 3:
                raise OSError("connection reset")
            return _FakeResponse({"data": [{"embedding": [1.0]}]})

        t = http_transport(
            "http://x", opener=flaky, sleep=sleeps.append, backoff_s=0.5
        )
        assert t(["a"]) == [[1.0]]
        assert len(calls) == 3
        assert sleeps == [0.5, 1.0]  # exponential

    def test_exhausted_retries_surface_cause(self):
        def dead(req, timeout=None):
            raise OSError("refused")

        t = http_transport("http://x", opener=dead, sleep=lambda s: None)
        with pytest.raises(RuntimeError, match="after 3 attempts") as ei:
            t(["a"])
        assert isinstance(ei.value.__cause__, OSError)

    def test_count_mismatch_rejected(self):
        def wrong(req, timeout=None):
            return _FakeResponse({"data": [{"embedding": [1.0]}]})

        t = http_transport("http://x", opener=wrong, sleep=lambda s: None)
        with pytest.raises(RuntimeError):  # mismatch retried then surfaced
            t(["a", "b"])


class TestApiEmbedderWiring:
    def test_endpoint_builds_default_transport(self):
        e = ApiEmbedder(dim=2, endpoint="http://api.local/embed")
        assert e.transport is not None

    def test_no_endpoint_no_transport_still_raises(self, spark):
        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(NotImplementedError):
            ApiEmbedder().embed_df(docs)

    def test_embed_query_via_fake_opener(self):
        seen = []
        e = ApiEmbedder(
            dim=2,
            transport=http_transport("http://x", opener=_echo_opener(seen)),
        )
        assert e.embed_query("hello") == [5.0, 1.0]
