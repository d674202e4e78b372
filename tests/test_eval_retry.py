"""Eval self-retry on transient backend errors (round-4 postmortem: five
2-minute evals died on FAILED_PRECONDITION-class tunnel stalls and only got
a second chance from a round-long queue script; the eval entry point itself
now retries once and never leaves an empty results dir behind)."""

import os

import pytest

from pathtracker_tpu.eval.test_model import (
    _is_transient_backend_error, _prune_empty_results_dir,
    evaluate_model_with_retry)


class _FakeXlaError(RuntimeError):
    pass


def test_transient_classification():
    assert _is_transient_backend_error(
        _FakeXlaError("FAILED_PRECONDITION: device pool grant is stale"))
    assert _is_transient_backend_error(
        _FakeXlaError("DEADLINE_EXCEEDED: tunnel RPC timed out"))
    assert _is_transient_backend_error(_FakeXlaError("UNAVAILABLE: socket"))
    # Real bugs must NOT be retried.
    assert not _is_transient_backend_error(ValueError("bad shape (2, 3)"))
    assert not _is_transient_backend_error(
        _FakeXlaError("INVALID_ARGUMENT: dot dimension mismatch"))


def test_retry_recovers_from_one_transient_failure(tmp_path):
    calls = []

    def flaky(results_folder, args, prep_gifs=3, dist=14, speed=1, length=64):
        calls.append((dist, speed, length))
        if len(calls) == 1:
            raise _FakeXlaError("FAILED_PRECONDITION: stale grant")
        return 0.68, 0.59

    out = evaluate_model_with_retry(
        str(tmp_path / "r"), args=None, dist=5, speed=2, length=32,
        backoff_s=0.0, _eval_fn=flaky)
    assert out == (0.68, 0.59)
    assert calls == [(5, 2, 32), (5, 2, 32)]


def test_retry_gives_up_after_budget_and_prunes_empty_dir(tmp_path):
    rf = tmp_path / "results" / "doomed"

    def always_fails(results_folder, args, **kw):
        os.makedirs(results_folder, exist_ok=True)  # what evaluate_model does
        raise _FakeXlaError("FAILED_PRECONDITION: still wedged")

    with pytest.raises(_FakeXlaError):
        evaluate_model_with_retry(str(rf), args=None, retries=1,
                                  backoff_s=0.0, _eval_fn=always_fails)
    # Two attempts happened, then the empty dir was pruned before re-raise.
    assert not rf.exists()


def test_non_transient_error_propagates_immediately(tmp_path):
    calls = []

    def buggy(results_folder, args, **kw):
        calls.append(1)
        raise ValueError("genuine bug")

    with pytest.raises(ValueError):
        evaluate_model_with_retry(str(tmp_path / "r"), args=None,
                                  backoff_s=0.0, _eval_fn=buggy)
    assert len(calls) == 1


def test_prune_keeps_nonempty_dir(tmp_path):
    d = tmp_path / "keep"
    d.mkdir()
    (d / "test_perf_dist_14_speed_1_length_64.npz").write_bytes(b"x")
    _prune_empty_results_dir(str(d))
    assert d.exists()
