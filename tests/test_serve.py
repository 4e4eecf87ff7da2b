"""Dynamic-batching inference server (ofasys_tpu/serve.py): concurrent
submits group into batched hub.inference dispatches, answers match direct
single-record inference exactly, and the stdlib HTTP endpoint works."""

import http.client
import json
import threading

import jax
import numpy as np
import pytest

from ofasys_tpu import GeneralistModel, ModalityType, OFASys
from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.preprocessor.general import GeneralPreprocess
from ofasys_tpu.serve import InferenceServer, serve_http

TPL = "[TEXT:src] -> [TEXT:tgt]"


@pytest.fixture(scope="module")
def hub():
    d = Dictionary()
    for i in range(60):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)
    m = GeneralistModel(arch="tiny")
    m.cfg.encoder.layers = m.cfg.decoder.layers = 2
    m.cfg.dropout = 0.0
    # preprocessors FIRST (byte fallback grows the dict), model init after —
    # OFASys raises on the reversed order (vocab/embedding mismatch)
    gp = GeneralPreprocess(d, active=["text"])
    m.initialize(d, active_adaptors=("text",))
    # random-init params: decode output is arbitrary but deterministic,
    # which is all batching equivalence needs
    ist = gp(__import__("ofasys_tpu").Instruction(TPL, split="test").format(src="a b"))
    sample = gp.collate([ist])
    params = m.init_params(jax.random.PRNGKey(0), sample["net_input"]["slots"])
    return OFASys(m, params, d, gp)


def test_batched_answers_match_direct_inference(hub):
    datas = [{"src": f"word{i % 4} thing{i % 3}"} for i in range(10)]
    direct = [
        hub.inference(TPL, dd, beam_size=2, max_len_b=6) for dd in datas
    ]
    srv = InferenceServer(hub, max_batch=8, max_wait_ms=200.0)
    futs = [
        srv.submit(TPL, dd, beam_size=2, max_len_b=6) for dd in datas
    ]
    outs = [f.result(timeout=300) for f in futs]
    srv.close()
    for o, ref in zip(outs, direct):
        np.testing.assert_array_equal(np.asarray(o.tokens), np.asarray(ref.tokens))
        assert np.isfinite(o.score)
    st = srv.stats()
    assert st["requests"] == 10
    # grouping actually happened: far fewer dispatches than requests
    assert st["batches"] < 10
    assert st["mean_batch_occupancy"] > 1.0
    assert st["p50_latency_ms"] is not None


def test_mixed_templates_and_options_still_resolve(hub):
    srv = InferenceServer(hub, max_batch=4, max_wait_ms=20.0)
    futs = []
    for i in range(6):
        # alternate generation options -> two distinct dispatch keys
        kw = {"beam_size": 1, "max_len_b": 4} if i % 2 else {"beam_size": 2, "max_len_b": 6}
        futs.append(srv.submit(TPL, {"src": f"x{i}"}, **kw))
    outs = [f.result(timeout=300) for f in futs]
    srv.close()
    assert all(o is not None for o in outs)


def test_close_drains_pending(hub):
    srv = InferenceServer(hub, max_batch=4, max_wait_ms=5.0)
    futs = [srv.submit(TPL, {"src": f"y{i}"}, beam_size=1, max_len_b=4) for i in range(3)]
    srv.close()
    for f in futs:
        assert f.result(timeout=60) is not None


def test_error_propagates_to_future(hub):
    srv = InferenceServer(hub, max_batch=2, max_wait_ms=1.0)
    # missing source-slot value -> preprocessing raises inside the dispatcher
    fut = srv.submit(TPL, {"wrong_column": "x"}, beam_size=1, max_len_b=4)
    with pytest.raises(ValueError, match="missing value for source slot"):
        fut.result(timeout=120)
    srv.close()


def test_vocab_growth_after_init_raises():
    """Building preprocessors AFTER model.initialize grows the dict past the
    embedding; OFASys must refuse loudly (silently it's NaN logits via
    out-of-range gathers)."""
    d = Dictionary()
    m = GeneralistModel(arch="tiny")
    m.cfg.encoder.layers = m.cfg.decoder.layers = 1
    m.initialize(d, active_adaptors=("text",))
    gp = GeneralPreprocess(d, active=["text"])  # byte fallback grows d
    with pytest.raises(ValueError, match="initialized for a .*vocabulary"):
        OFASys(m, {}, d, gp)


def test_http_endpoint(hub):
    srv = InferenceServer(hub, max_batch=4, max_wait_ms=5.0)
    httpd = serve_http(srv, host="127.0.0.1", port=0, block=False)
    port = httpd.server_address[1]
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        body = json.dumps({
            "instruction": TPL, "data": {"src": "hello there"},
            "options": {"beam_size": 1, "max_len_b": 4},
        })
        conn.request("POST", "/v1/generate", body=body,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        payload = json.loads(resp.read())
        assert "output" in payload and "text" in payload["output"]

        conn.request("GET", "/v1/stats")
        resp = conn.getresponse()
        assert resp.status == 200
        assert json.loads(resp.read())["requests"] >= 1
    finally:
        httpd.shutdown()
        srv.close()


def test_server_over_sharded_hub(hub):
    """Dynamic batching composes with tensor-parallel sharded serving:
    a server over hub.shard()'d params answers identically to the
    single-device hub (shard_tree returns a new tree, so the module
    fixture's params stay untouched)."""
    from ofasys_tpu.configure.configs import ParallelConfig

    datas = [{"src": f"word{i % 3} item{i % 2}"} for i in range(6)]
    direct = [hub.inference(TPL, dd, beam_size=2, max_len_b=6) for dd in datas]

    shub = OFASys(hub.model, hub.params, hub.global_dict, hub.general_preprocess)
    shub.shard(ParallelConfig(data=1, tensor=8))
    srv = InferenceServer(shub, max_batch=4, max_wait_ms=200.0)
    futs = [srv.submit(TPL, dd, beam_size=2, max_len_b=6) for dd in datas]
    outs = [f.result(timeout=300) for f in futs]
    srv.close()
    for o, ref in zip(outs, direct):
        np.testing.assert_array_equal(np.asarray(o.tokens), np.asarray(ref.tokens))
