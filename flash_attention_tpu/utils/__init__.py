"""Test-input generation, diff checking, and benchmark timing utilities."""
