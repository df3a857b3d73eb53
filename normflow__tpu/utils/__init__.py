"""Utilities: profiling/tracing hooks (new surface vs the reference,
which has none -- SURVEY.md §5)."""

from .profiling import trace, profile_fn, Timer

__all__ = ["trace", "profile_fn", "Timer"]
