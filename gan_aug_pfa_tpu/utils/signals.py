"""Preemption-safe training: SIGTERM/SIGINT → finish the epoch, save, exit.

TPU pods and spot/preemptible VMs are reclaimed with SIGTERM and a short
grace window.  The reference loses everything since its last periodic
``.pth`` and cannot resume anyway (SURVEY.md §5.3: every run restarts at
epoch 1).  Here the training pipelines install a ``GracefulShutdown``
guard around their epoch loops: the FIRST signal only sets a flag, the
loop notices it at the next epoch boundary, writes the full resume state
(params + optimizer + scheduler + epoch), and returns cleanly — so a
``--resume`` relaunch continues where the preemption hit.  A SECOND
signal falls through to the previous handler (ctrl-C twice still kills).
"""

from __future__ import annotations

import signal


class GracefulShutdown:
    """Context manager: latch SIGTERM/SIGINT into a `requested` flag.

    Only usable from the main thread (CPython delivers signals there);
    entered from any other thread it is a no-op that never triggers,
    so library callers embedded in servers stay safe.
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self._signals = tuple(signals)
        self._previous = {}
        self.requested = False
        self.signum = None

    def _handle(self, signum, frame):
        if self.requested:
            # Second signal: defer to the original disposition.
            prev = self._previous.get(signum)
            if callable(prev):
                prev(signum, frame)
                return
            if prev == signal.SIG_DFL:
                signal.signal(signum, signal.SIG_DFL)
                signal.raise_signal(signum)
                return
            return  # SIG_IGN
        self.requested = True
        self.signum = signum
        print(
            f"\nReceived signal {signal.Signals(signum).name}: finishing "
            "the current epoch, saving resume state, then exiting. "
            "Signal again to stop immediately."
        )

    def __enter__(self):
        try:
            for s in self._signals:
                self._previous[s] = signal.signal(s, self._handle)
        except ValueError:  # not the main thread — stay inert
            self._previous = {}
        return self

    def __exit__(self, *exc):
        for s, prev in self._previous.items():
            signal.signal(s, prev)
        self._previous = {}
        return False
