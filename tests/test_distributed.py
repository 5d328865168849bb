"""Multi-host failure policy (utils/distributed.py), driven with mocks.

SURVEY.md §5's promised behaviors: init retries with backoff, fail-fast
process exit on step-loop exceptions, and hung-step watchdog. Real pod
behavior can't run single-host; the contracts (retry counts, exit codes,
deadline firing) can.
"""

import time

import pytest

from flash_attention_tpu.utils.distributed import (
    DistributedInitError,
    StepWatchdog,
    fail_fast,
    initialize_distributed,
)


def test_init_retries_then_succeeds(monkeypatch):
    calls = []

    def flaky(**kwargs):
        calls.append(kwargs)
        if len(calls) < 3:
            raise RuntimeError("coordinator not up yet")

    monkeypatch.setattr(time, "sleep", lambda s: None)
    initialize_distributed(
        coordinator_address="host:1234", num_processes=4, process_id=1,
        init_retries=3, retry_delay_s=0.0, _initialize_fn=flaky,
    )
    assert len(calls) == 3
    assert calls[0]["coordinator_address"] == "host:1234"
    assert calls[0]["num_processes"] == 4
    assert calls[0]["process_id"] == 1


def test_init_exhausts_retries(monkeypatch):
    monkeypatch.setattr(time, "sleep", lambda s: None)

    def always_fails(**kwargs):
        raise RuntimeError("bad address")

    with pytest.raises(DistributedInitError, match="after 2 attempts"):
        initialize_distributed(
            coordinator_address="nowhere:1", init_retries=2,
            retry_delay_s=0.0, _initialize_fn=always_fails,
        )


def test_init_validates_device_count():
    import jax

    with pytest.raises(DistributedInitError, match="local devices"):
        initialize_distributed(
            expected_local_devices=jax.local_device_count() + 7,
            _initialize_fn=lambda **kw: None,
        )


def test_fail_fast_exits_on_exception():
    codes = []
    with fail_fast("unit test", _exit_fn=codes.append):
        raise ValueError("boom")
    assert codes == [1]


def test_fail_fast_interrupt_code():
    codes = []
    with fail_fast("unit test", _exit_fn=codes.append):
        raise KeyboardInterrupt()
    assert codes == [130]


def test_fail_fast_clean_block_no_exit():
    codes = []
    with fail_fast("unit test", _exit_fn=codes.append):
        pass
    assert codes == []


def test_watchdog_fires_on_hung_step():
    codes = []
    wd = StepWatchdog(deadline_s=0.2, poll_s=0.05, _exit_fn=codes.append)
    try:
        with wd.step():
            deadline = time.monotonic() + 2.0
            while not wd.fired and time.monotonic() < deadline:
                time.sleep(0.02)
    finally:
        wd.close()
    assert wd.fired and codes == [2]


def test_watchdog_quiet_on_fast_steps():
    codes = []
    wd = StepWatchdog(deadline_s=0.5, poll_s=0.05, _exit_fn=codes.append)
    try:
        for _ in range(5):
            with wd.step():
                time.sleep(0.01)
        time.sleep(0.2)  # disarmed between steps: must not fire
    finally:
        wd.close()
    assert not wd.fired and codes == []


def test_fail_fast_lets_system_exit_through():
    """sys.exit is an intentional shutdown, not a failure: it must unwind
    normally instead of becoming a FATAL hard-exit(1)."""
    codes = []
    with pytest.raises(SystemExit) as ei:
        with fail_fast("unit test", _exit_fn=codes.append):
            raise SystemExit(0)
    assert ei.value.code == 0
    assert codes == []


def test_init_rejects_zero_retries():
    with pytest.raises(ValueError, match="init_retries"):
        initialize_distributed(init_retries=0)
