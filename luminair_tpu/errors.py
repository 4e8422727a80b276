"""Error types (reference: crates/utils/src/lib.rs LuminairError/TraceError)."""


class LuminairError(Exception):
    """Base error for the proving stack."""


class EmptyTraceError(LuminairError):
    """A component trace table had no rows (TraceError::EmptyTrace)."""


class MainTraceEvalGenError(LuminairError):
    pass


class InteractionTraceEvalGenError(LuminairError):
    pass


class ProverError(LuminairError):
    pass


class StwoVerifierError(LuminairError):
    """Low-level STARK verification failed."""


class InvalidLogUpError(LuminairError):
    """Global LogUp sum != 0."""


class SerializationError(LuminairError):
    pass
