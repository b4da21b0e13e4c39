"""HTTP server end-to-end on the tiny model."""

import asyncio
import json
import urllib.request

import pytest

from effort_tpu.config import BucketConfig, tiny_test_model
from effort_tpu.models.transformer import init_random_weights
from effort_tpu.models.generate import Engine
from effort_tpu.serving.server import EffortServer


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_test_model()
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8))
    return Engine(w, cfg, impl="jnp", pad_to=8)


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=120) as r:
        return r.status, json.loads(r.read())


def test_server_endpoints(engine):
    async def run():
        srv = EffortServer(engine, port=18089)
        await srv.start()
        loop = asyncio.get_event_loop()
        try:
            st, body = await loop.run_in_executor(
                None, _get, 18089, "/health")
            assert st == 200 and body["status"] == "ok"

            st, body = await loop.run_in_executor(
                None, _get, 18089, "/q?query=hello&effort=60&numtokens=4")
            assert st == 200
            assert "reply" in body and body["effort"] == 0.6

            st, body = await loop.run_in_executor(
                None, _get, 18089, "/q?tokids=1,5,9&effort=100")
            assert st == 200 and len(body["predictions"]) == 3

            st, body = await loop.run_in_executor(
                None, _get, 18089, "/stats")
            assert body["requests"] >= 3
        finally:
            await srv.stop()
    asyncio.run(run())


def test_batch_server_concurrent_requests():
    from effort_tpu.serving.server import make_batch_server
    cfg = tiny_test_model(max_seq_len=64)
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8))

    async def run():
        srv = make_batch_server(w, cfg, batch_size=2, pad_to=8,
                                port=18090)
        await srv.start()
        loop = asyncio.get_event_loop()
        try:
            # three concurrent generations through 2 slots
            tasks = [
                loop.run_in_executor(
                    None, _get, 18090,
                    f"/q?query=h{i}&effort=100&numtokens=4")
                for i in range(3)
            ]
            results = await asyncio.gather(*tasks)
            for st, body in results:
                assert st == 200
                assert len(body["token_ids"]) >= 1

            # eval path still works in batch mode
            st, body = await loop.run_in_executor(
                None, _get, 18090, "/q?tokids=1,5,9&effort=100")
            assert st == 200 and len(body["predictions"]) == 3
        finally:
            await srv.stop()
    asyncio.run(run())


def test_batch_server_streaming():
    """stream=1 in batching mode: one SSE data event per token, then an
    event: done carrying the full result."""
    from effort_tpu.serving.server import make_batch_server
    cfg = tiny_test_model(max_seq_len=64)
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8))

    def _get_raw(port, path):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=120) as r:
            return r.status, r.headers.get("content-type"), \
                r.read().decode()

    async def run():
        srv = make_batch_server(w, cfg, batch_size=2, pad_to=8, port=18091)
        await srv.start()
        loop = asyncio.get_event_loop()
        try:
            st, ctype, body = await loop.run_in_executor(
                None, _get_raw, 18091,
                "/q?query=hi&effort=100&numtokens=5&stream=1")
            assert st == 200 and ctype == "text/event-stream"
            events = [e for e in body.split("\n\n") if e.strip()]
            data = [json.loads(e.split("data: ", 1)[1])
                    for e in events if e.startswith("data: ")]
            done = [e for e in events if e.startswith("event: done")]
            assert len(done) == 1
            final = json.loads(done[0].split("data: ", 1)[1])
            assert [d["token"] for d in data] == final["token_ids"]
            assert len(data) >= 2          # actually streamed per-token
        finally:
            await srv.stop()
    asyncio.run(run())


def test_batch_server_rejects_sampling_params():
    from effort_tpu.serving.server import make_batch_server
    import urllib.error
    cfg = tiny_test_model(max_seq_len=64)
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8))

    async def run():
        srv = make_batch_server(w, cfg, batch_size=2, pad_to=8, port=18092)
        await srv.start()
        loop = asyncio.get_event_loop()

        def _get_status(path):
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:18092{path}", timeout=60) as r:
                    return r.status
            except urllib.error.HTTPError as e:
                return e.code
        try:
            st = await loop.run_in_executor(
                None, _get_status,
                "/q?query=hi&numtokens=2&temperature=0.9")
            assert st == 400
        finally:
            await srv.stop()
    asyncio.run(run())


def test_openai_completions_endpoint():
    from effort_tpu.serving.server import make_batch_server
    cfg = tiny_test_model(max_seq_len=64)
    w = init_random_weights(cfg, BucketConfig(bucket_size=4, chunk_rows=8))

    def _post(port, path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            headers={"content-type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read().decode()

    async def run():
        srv = make_batch_server(w, cfg, batch_size=2, pad_to=8,
                                port=18098)
        await srv.start()
        loop = asyncio.get_event_loop()
        try:
            st, body = await loop.run_in_executor(
                None, _post, 18098, "/v1/completions",
                {"prompt": "hello", "max_tokens": 4, "effort": 0.5})
            assert st == 200
            obj = json.loads(body)
            assert obj["object"] == "text_completion"
            assert obj["choices"][0]["finish_reason"] == "length"

            st, body = await loop.run_in_executor(
                None, _post, 18098, "/v1/completions",
                {"prompt": "hello", "max_tokens": 4, "stream": True})
            assert st == 200
            assert body.strip().endswith("data: [DONE]")
            assert body.count('"text_completion"') >= 4
        finally:
            await srv.stop()
    asyncio.run(run())
