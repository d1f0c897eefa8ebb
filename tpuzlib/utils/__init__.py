"""Observability utilities: stage telemetry and profiler hooks."""

from .trace import get_telemetry, profile, telemetry_enabled, timed_stage

__all__ = ["get_telemetry", "profile", "telemetry_enabled", "timed_stage"]
