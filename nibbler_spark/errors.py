"""Engine error types.

Mirrors the reference's error surface: the validation sentinel
(``ErrValidation``, /root/reference/nibbler.go:16) and the
closed-queue-after-fatal-stop contract
(/root/reference/nibbler_test.go:96-97: a send on the closed channel
panics; here it raises :class:`NibblerStoppedError`).
"""

from __future__ import annotations


class NibblerError(Exception):
    """Base class for all nibbler-spark errors."""


class NibblerValidationError(NibblerError, ValueError):
    """Invalid configuration (reference: ErrValidation, nibbler.go:16,62-68)."""


class NibblerStoppedError(NibblerError, RuntimeError):
    """Send attempted after the nibbler stopped fatally.

    Reference contract: after a fatal stop the queue is closed and a
    producer send panics (nibbler.go:131-135, nibbler_test.go:96-97).
    """


class NibblerFatalError(NibblerError):
    """A processor failure with resume_after_err=False — the micro-batcher
    stops (reference: break + queue close, nibbler.go:131-135,142-144).

    Carries the original processor error as ``__cause__``/``error``.
    """

    def __init__(self, error: BaseException):
        self.error = error
        super().__init__(f"nibbler stopped: {error!r}")


class Panic(BaseException):
    """Python analogue of a Go panic with an arbitrary (non-error) value
    (reference: nibbler.go:90-93 wraps non-error panic values). Raise
    ``Panic(value)`` from a processor to exercise the conversion path."""

    def __init__(self, value: object):
        self.value = value
        super().__init__(value)


class BatchPanicError(NibblerError):
    """A non-Exception raise (e.g. KeyboardInterrupt-like BaseException or a
    plain object thrown via ``raise``) converted to an error, mirroring the
    reference's panic-to-error conversion (nibbler.go:81-96)."""

    def __init__(self, value: object):
        self.value = value
        super().__init__(f"panic: {value!r}")
