"""BatchingFrontend: dynamic request coalescing over the serving engine.

Stub-service tests (fast tier — nothing compiles): batching behavior,
latency bound, error propagation, shutdown semantics.
"""

import threading
import time

import numpy as np
import pytest

from blindshadowremoval_tpu.eval.serving import BatchingFrontend


class _StubService:
    """Implements the frontend's service protocol (preprocess / stage /
    forward_staged); records per-forward batch sizes."""

    batch_size = 4

    def __init__(self, delay: float = 0.0, fail: bool = False,
                 preprocess_fail_on: int = -1):
        self.calls = []
        self.delay = delay
        self.fail = fail
        self.preprocess_fail_on = preprocess_fail_on
        self._preprocessed = 0
        self.gate = threading.Event()   # set() to let forwards proceed
        self.gate.set()

    def preprocess(self, image, landmarks):
        i = self._preprocessed
        self._preprocessed += 1
        if i == self.preprocess_fail_on:
            raise ValueError(f"bad request {i}")
        return {"img": image, "idx": i}

    def stage(self, chunk):
        return tuple(v["idx"] for v in chunk)

    def forward_staged(self, staged, chunk):
        self.gate.wait(timeout=2.0)
        if self.fail:
            raise RuntimeError("device fell over")
        if self.delay:
            time.sleep(self.delay)
        self.calls.append(len(chunk))
        return [{"pred": np.float32(i)} for i in staged]


def _img():
    return np.zeros((4, 4, 3), np.float32), np.zeros((68, 2), np.float32)


def test_coalesces_up_to_max_batch():
    svc = _StubService()
    svc.gate.clear()                    # hold the device call...
    fe = BatchingFrontend(svc, max_delay_ms=250.0)
    futs = [fe.submit(*_img()) for _ in range(8)]
    svc.gate.set()                      # ...so all 8 queue before dispatch
    for f in futs:
        assert "pred" in f.result(timeout=10.0)
    fe.close()
    # 8 requests at max_batch 4: exactly 2 full batches once the first
    # dispatch saw a full queue
    assert svc.calls == [4, 4]
    assert fe.batches_dispatched == 2 and fe.requests_served == 8


def test_partial_batch_dispatches_at_deadline():
    svc = _StubService()
    fe = BatchingFrontend(svc, max_delay_ms=30.0)
    t0 = time.monotonic()
    fut = fe.submit(*_img())
    assert "pred" in fut.result(timeout=10.0)
    elapsed = time.monotonic() - t0
    fe.close()
    assert svc.calls == [1]             # lone request still served...
    assert elapsed < 5.0                # ...after ~the delay bound, not never


def test_service_error_reaches_every_future():
    svc = _StubService(fail=True)
    fe = BatchingFrontend(svc, max_delay_ms=10.0)
    futs = [fe.submit(*_img()) for _ in range(3)]
    for f in futs:
        with pytest.raises(RuntimeError, match="device fell over"):
            f.result(timeout=10.0)
    fe.close()


def test_close_flush_serves_queued_then_rejects():
    svc = _StubService()
    fe = BatchingFrontend(svc, max_delay_ms=5.0)
    futs = [fe.submit(*_img()) for _ in range(5)]
    fe.close()                          # flush=True default
    assert all("pred" in f.result(timeout=10.0) for f in futs)
    with pytest.raises(RuntimeError, match="closed"):
        fe.submit(*_img())


def test_close_noflush_cancels_pending():
    svc = _StubService()
    svc.gate.clear()                    # wedge the dispatcher's forward
    fe = BatchingFrontend(svc, max_delay_ms=5.0)
    # fill the whole depth-1 pipeline (forward 4 + staged slot 4 + a
    # batch held by the blocked collector 4) and leave more in the
    # submit queue — those are the cancellable ones
    futs = [fe.submit(*_img()) for _ in range(20)]
    time.sleep(0.4)                     # let the pipeline back up
    fe.close(flush=False)
    svc.gate.set()
    done = sum(1 for f in futs if f.cancelled())
    assert done >= 1                    # queued-but-undispatched cancelled
    fe.close()                          # idempotent


def test_context_manager():
    svc = _StubService()
    with BatchingFrontend(svc, max_delay_ms=5.0) as fe:
        assert "pred" in fe.submit(*_img()).result(timeout=10.0)
    with pytest.raises(RuntimeError):
        fe.submit(*_img())


def test_bad_request_fails_only_its_own_future():
    """A preprocess failure (malformed input) poisons ONLY that request;
    batchmates still get results."""
    svc = _StubService(preprocess_fail_on=1)
    svc.gate.clear()
    fe = BatchingFrontend(svc, max_delay_ms=250.0)
    futs = [fe.submit(*_img()) for _ in range(4)]
    svc.gate.set()
    with pytest.raises(ValueError, match="bad request 1"):
        futs[1].result(timeout=10.0)
    for i in (0, 2, 3):
        assert "pred" in futs[i].result(timeout=10.0)
    fe.close()
    assert svc.calls == [3]             # the 3 survivors, one batch
