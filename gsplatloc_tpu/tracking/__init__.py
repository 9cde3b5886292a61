from .runner import SequenceRunner, SequenceResult  # noqa: F401
