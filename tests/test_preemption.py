"""Preemption guard: signal -> cooperative stop -> save -> requeue."""

import os
import signal

from adafocus_tpu.train.preemption import PreemptionGuard


def test_signal_sets_flag_and_finalize_saves():
    guard = PreemptionGuard.install(signals=(signal.SIGUSR1,))
    assert not guard.should_stop
    os.kill(os.getpid(), signal.SIGUSR1)
    assert guard.should_stop and guard.preempted

    saved = []
    guard.requeue_cmd = "true"  # no-op command instead of scontrol
    guard.finalize(lambda: saved.append(1))
    assert saved == [1]


def test_finalize_noop_without_signal():
    guard = PreemptionGuard(requeue_cmd="false")
    called = []
    guard.finalize(lambda: called.append(1))
    assert called == []
